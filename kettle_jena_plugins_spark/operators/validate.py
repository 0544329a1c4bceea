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

from ..model import VALID_OPS


class Policy(str, Enum):
    """IGNORE / WARN / ERROR — mirrors ActionIfNull / ActionIfNoSuchField
    (ActionIfNull.java:25-28)."""

    IGNORE = "IGNORE"
    WARN = "WARN"
    ERROR = "ERROR"


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
    # e.g. (("neg_turn", "turn_idx < 0"), ("long_text", "length(text) > 1e6"))
    constraints: tuple[tuple[str, str], ...] = ()


def _violation_checks(spec: ValidationSpec) -> list[tuple[str, Column]]:
    checks: list[tuple[str, Column]] = []
    for k in spec.require_keys:
        checks.append((f"null_key:{k}", F.col(k).isNull()))
    if spec.require_ts:
        checks.append(("null_ts", F.col("ts").isNull()))
    checks.append(
        ("bad_op", ~F.col("op").isin(list(spec.valid_ops)) | F.col("op").isNull())
    )
    for reason, predicate in spec.constraints:
        # null-safe: a predicate evaluating to NULL is not a violation
        checks.append((reason, F.coalesce(F.expr(predicate), F.lit(False))))
    return checks


def with_violations(events: DataFrame, spec: ValidationSpec | None = None) -> DataFrame:
    """Append a `violations: array<string>` column (empty = conforming row)."""
    spec = spec or ValidationSpec()
    checks = _violation_checks(spec)
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
