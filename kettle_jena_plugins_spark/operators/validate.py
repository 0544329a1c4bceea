"""Event validation + dead-letter split.

Reference analogue: the SHACL step routes constraint-violating rows to a
separate error hop with an error count and concatenated messages
(JenaShaclStep.java:76-83, ValidationResult.java:25-55), and the null/missing
field policies IGNORE/WARN/ERROR (ActionIfNull.java:25-28,
ActionIfNoSuchField.java:25-28, applied JenaGroupMergeStep.java:479-515).

Spark-first: one pass computes a `violations` array column from cheap built-in
predicates (JVM-side, codegen); the stream is then split by
``size(violations)`` into (ok, dead-letter). The constraint set — the
"shapes graph" loaded once in the reference (JenaShaclStep.java:59-71) —
is a plain broadcast-able python spec here.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import VALID_OPS


class Policy(str, Enum):
    """IGNORE / WARN / ERROR — mirrors ActionIfNull / ActionIfNoSuchField
    (ActionIfNull.java:25-28)."""

    IGNORE = "IGNORE"
    WARN = "WARN"
    ERROR = "ERROR"


@dataclass(frozen=True)
class PathShape:
    """Structural constraint on a (possibly nested) path — the engine's
    analogue of a SHACL property shape with sh:path + sh:minCount /
    sh:maxCount (the reference validates whole models against shape graphs
    with nested property shapes: JenaShaclStepIT.java:58-81, ODRL-shape.ttl).

    `path` is a dotted path into the row ("doc.t_meta.t_prov.t_lsn"),
    resolved through nested structs. Cardinality is schema-aware: an array
    path counts its elements (sh:minCount/maxCount over values); a scalar
    path counts 0 (null) or 1, so min_count=1 means "required"."""

    path: str
    min_count: int = 1
    max_count: int | None = None


@dataclass(frozen=True)
class ValidationSpec:
    """The expected-event contract (the engine's 'shapes graph').

    `constraints` makes the rule set user-extensible, like the reference's
    runtime-loaded shapes file (JenaShaclStep.java:59-71): each entry is
    (reason, SQL predicate) where a TRUE predicate flags a violation —
    plain strings, so a spec can live in config/pipeline files and ship to
    executors as part of the plan (compiled via F.expr, still built-ins)."""

    require_keys: tuple[str, ...] = ("conv_id", "turn_idx")
    require_ts: bool = True
    valid_ops: tuple[str, ...] = VALID_OPS
    null_key_policy: Policy = Policy.ERROR  # ERROR → dead-letter the row
    # the op-envelope gate: None = auto (checked iff an `op` column exists,
    # so shape validation runs over non-event frames); True = REQUIRED
    # (missing column is an analysis error — use for CDC event streams
    # where a dropped/renamed op must not silently disable the gate);
    # False = never checked
    require_op: bool | None = None
    # e.g. (("neg_turn", "turn_idx < 0"), ("long_text", "length(text) > 1e6"))
    constraints: tuple[tuple[str, str], ...] = ()
    # structural shapes over nested paths (SHACL property-shape analogue)
    shapes: tuple[PathShape, ...] = ()
    # sh:or analogue: each group demands ≥1 of its paths non-null
    any_of: tuple[tuple[str, ...], ...] = ()


def _violation_checks(
    spec: ValidationSpec, columns: list[str] | None = None
) -> list[tuple[str, Column]]:
    checks: list[tuple[str, Column]] = []
    for k in spec.require_keys:
        checks.append((f"null_key:{k}", F.col(k).isNull()))
    if spec.require_ts:
        checks.append(("null_ts", F.col("ts").isNull()))
    check_op = (
        spec.require_op
        if spec.require_op is not None
        else (columns is None or "op" in columns)
    )
    if check_op:
        checks.append(
            (
                "bad_op",
                ~F.col("op").isin(list(spec.valid_ops))
                | F.col("op").isNull(),
            )
        )
    for reason, predicate in spec.constraints:
        # null-safe: a predicate evaluating to NULL is not a violation
        checks.append((reason, F.coalesce(F.expr(predicate), F.lit(False))))
    return checks


def _resolve_path_type(schema: T.StructType, path: str) -> T.DataType:
    """Walk a dotted path through nested structs; raises if any segment is
    missing (a shape over an absent path is a config error, like the
    reference's unresolvable sh:path)."""
    dt: T.DataType = schema
    for part in path.split("."):
        if not isinstance(dt, T.StructType) or part not in dt.fieldNames():
            raise ValueError(f"shape path {path!r}: no field {part!r}")
        dt = dt[part].dataType
    return dt


def _shape_checks(
    schema: T.StructType, spec: ValidationSpec
) -> list[tuple[str, Column]]:
    """Compile PathShape/any_of into (reason, violation-predicate) pairs —
    pure built-in expressions (null-checks / size), so structural
    validation rides the same single codegen pass as the flat checks."""
    checks: list[tuple[str, Column]] = []
    for sh in spec.shapes:
        dt = _resolve_path_type(schema, sh.path)
        if isinstance(dt, T.ArrayType):
            count = F.coalesce(F.size(F.col(sh.path)), F.lit(0))
        else:
            count = F.when(F.col(sh.path).isNotNull(), F.lit(1)).otherwise(
                F.lit(0)
            )
        if sh.min_count > 0:
            checks.append((f"min_count:{sh.path}", count < sh.min_count))
        if sh.max_count is not None:
            checks.append((f"max_count:{sh.path}", count > sh.max_count))
    for group in spec.any_of:
        # "present" uses the same count semantics as PathShape: an empty
        # array contributes zero values, so it does NOT satisfy the group
        all_absent = F.lit(True)
        for p in group:
            dt = _resolve_path_type(schema, p)  # config errors surface here
            if isinstance(dt, T.ArrayType):
                present = F.coalesce(F.size(F.col(p)), F.lit(0)) > 0
            else:
                present = F.col(p).isNotNull()
            all_absent = all_absent & ~present
        checks.append((f"any_of:{'|'.join(group)}", all_absent))
    return checks


def with_violations(events: DataFrame, spec: ValidationSpec | None = None) -> DataFrame:
    """Append a `violations: array<string>` column (empty = conforming row)."""
    spec = spec or ValidationSpec()
    checks = _violation_checks(spec, events.columns) + _shape_checks(
        events.schema, spec
    )
    arr = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks])
    )
    return events.withColumn("violations", arr)


def validate_split(
    events: DataFrame, spec: ValidationSpec | None = None
) -> tuple[DataFrame, DataFrame]:
    """→ (ok, dead_letter). dead_letter keeps the row plus `violations` and a
    concatenated `error_msg` (the reference's error-count + messages,
    JenaShaclStep.java:78)."""
    flagged = with_violations(events, spec)
    ok = flagged.filter(F.size("violations") == 0).drop("violations")
    dead = flagged.filter(F.size("violations") > 0).withColumn(
        "error_msg", F.concat_ws(";", F.col("violations"))
    )
    return ok, dead


def dead_letter_stats(events: DataFrame, spec: ValidationSpec | None = None) -> DataFrame:
    """Per-violation-reason counts (batch metrics / WARN accounting)."""
    flagged = with_violations(events, spec)
    return (
        flagged.select(F.explode("violations").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )
