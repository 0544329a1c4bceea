"""Per-row construct operator — build a typed "document" value per row.

Reference: JenaModelStep (model/JenaModelStep.java:58-557) constructs one RDF
graph per row: subject URI from a field (:211-229), one statement per
DbToJenaMapping (fieldName, property name, type, language, skip,
actionIfNull — JenaModelStepMeta.java:110-135), recursive blank-node
substructures (a mapping whose field is the blank-node marker points at a
BlankNodeMapping carrying its own DbToJenaMappings, applied recursively to a
fresh blank node — JenaModelStep.java:347-376, recursive call :372; mapping
metadata JenaModelStepMeta.java:241-261), and appends the graph as a new
column, optionally dropping consumed source columns (prepareOutputRow
:187-208).

Spark-first: the per-row graph becomes (a) a nested struct column (the typed
document; blank-node substructures → nested StructType) and (b) a
deterministic canonical serialization string — properties in sorted order,
substructures bracketed and flattened depth-first — which is this engine's
analogue of graph isomorphism equality (EndToEndIT.java:74 isIsomorphicWith
compares graphs independent of statement order; a canonically-ordered
serialization gives the same order-independence). All built-ins:
struct/concat/concat_ws (nulls skip like ActionIfNull=IGNORE dropping the
statement).

ActionIfNull (JenaModelStep.java:316-331):
  IGNORE — drop the statement (null vanishes from canon and struct);
  WARN   — drop the statement AND count it in the `construct_null_warnings`
           observation (the engine's metrics analogue of logBasic :325);
  ERROR  — fail the job at execution time (closeAndThrow :329 per row →
           F.raise_error inside the expression).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.qnames import expand_qname
from .validate import Policy


@dataclass(frozen=True)
class PropertyMapping:
    """Analogue of DbToJenaMapping (JenaModelStepMeta.java:110-135).

    A mapping with `children` is a blank-node substructure (the reference's
    BLANK_NODE_FIELD_NAME field + BlankNodeMapping indirection,
    JenaModelStepMeta.java:241-261): `field` is unused, the children are
    applied recursively and attached under `property`. Children may
    themselves carry children (arbitrary nesting depth, as in the
    reference's recursive addResourceProperties).

    `datatype`/`lang` mirror DbToJenaMapping's rdfType/language
    (JenaModelStepMeta.java:110-135, applied JenaModelStep.java:333-345,
    typed literal created :385-392): a typed mapping renders its statement
    value as the full literal term (`"lex"^^<dt>` / `"lex"@lang`, lexical
    form ECHAR-escaped) in BOTH the doc struct field and the canonical
    string, so datatype/language fidelity survives a construct →
    group-merge → serialize chain (the serializer consumes these via
    StatementSpec(prerendered=True)). A value that fails the datatype's
    lexical/range gate becomes null and routes through `if_null` like a
    null source field."""

    field: str | None  # source column; None for blank-node substructures
    property: str  # property name, may be a QName
    skip: bool = False  # JenaModelStep.java:294-296
    if_null: Policy = Policy.IGNORE  # drop / warn+drop / raise on null
    children: tuple["PropertyMapping", ...] = dc_field(default=())
    datatype: str | None = None  # XSD local name (typed_literals.CONVERTERS)
    lang: str | None = None  # language tag → rdf:langString

    def __post_init__(self):
        if self.datatype and self.lang:
            raise ValueError(
                f"PropertyMapping {self.property!r}: datatype and lang are "
                "exclusive (a literal is typed OR language-tagged, "
                "JenaModelStep.java:333-345)"
            )
        if self.children and (self.datatype or self.lang):
            raise ValueError(
                f"PropertyMapping {self.property!r}: a blank-node "
                "substructure cannot carry datatype/lang"
            )


def _build(
    mappings: Sequence[PropertyMapping],
    namespaces: dict[str, str] | None,
    subject: Column,
) -> tuple[list[Column], list[Column], list[Column]]:
    """Recursive core: returns (statement columns for the canonical string,
    struct field columns, null-warn indicator columns) for one mapping level,
    in sorted expanded-property order (canonical = order-independent)."""
    stmt_cols: list[Column] = []
    struct_fields: list[Column] = []
    warn_cols: list[Column] = []
    for mp in sorted(mappings, key=lambda m: expand_qname(m.property, namespaces)):
        if mp.skip:
            continue
        prop = expand_qname(mp.property, namespaces)
        alias = mp.property.replace(":", "_")
        if mp.children:
            # blank-node substructure: always attached (the reference skips
            # the null check for blank nodes, JenaModelStep.java:316), its
            # children recursively resolved against the same row
            c_stmts, c_fields, c_warns = _build(mp.children, namespaces, subject)
            canon_child = F.concat(
                F.lit(prop + "=["),
                F.concat_ws("; ", *c_stmts),
                F.lit("]"),
            )
            stmt_cols.append(canon_child)
            struct_fields.append(F.struct(*c_fields).alias(alias))
            warn_cols.extend(c_warns)
            continue
        if mp.datatype or mp.lang:
            # typed/language-tagged mapping: render the FULL literal term
            # (escaped lexical form + ^^<dt> / @lang) so the type survives
            # downstream merge/serialize steps; gate failures → null,
            # routed by if_null below exactly like a null source
            from .serialize import StatementSpec, object_term

            val = object_term(
                StatementSpec(mp.field, datatype=mp.datatype, lang=mp.lang)
            )
        else:
            val = F.col(mp.field).cast("string")
        if mp.if_null is Policy.ERROR:
            # per-row closeAndThrow (JenaModelStep.java:329) → expression-
            # level failure at execution time
            val = F.when(
                val.isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"Could not write property: {prop} for resource: "
                        ),
                        subject,
                        F.lit(f", row field: {mp.field} is null!"),
                    )
                ),
            ).otherwise(val)
        elif mp.if_null is Policy.WARN:
            warn_cols.append(
                F.when(val.isNull(), F.lit(1)).otherwise(F.lit(0))
            )
        # property=value statement; null value → statement dropped
        # (IGNORE and WARN both drop; WARN additionally counts)
        stmt_cols.append(
            F.when(val.isNotNull(), F.concat(F.lit(prop + "="), val))
        )
        # typed mappings carry the rendered term into the struct too —
        # that's what keeps datatype/lang through group-merge/serialize
        struct_fields.append(
            (val if (mp.datatype or mp.lang) else F.col(mp.field)).alias(alias)
        )
    return stmt_cols, struct_fields, warn_cols


def _consumed_fields(mappings: Sequence[PropertyMapping]) -> set[str]:
    out: set[str] = set()
    for mp in mappings:
        if mp.skip:
            continue
        if mp.children:
            out |= _consumed_fields(mp.children)
        elif mp.field is not None:
            out.add(mp.field)
    return out


def construct_doc(
    df: DataFrame,
    uri_prefix: str,
    uri_fields: Sequence[str],
    mappings: Sequence[PropertyMapping],
    target_col: str = "doc",
    namespaces: dict[str, str] | None = None,
    remove_mapped: bool = False,
    observe_warnings: bool = False,
) -> DataFrame:
    """Adds `target_col` struct(subject, statements — nested structs for
    blank-node substructures) and `{target_col}_canon` — the canonical
    string serialization (substructures flattened depth-first in sorted
    property order).

    observe_warnings=True attaches a `construct_null_warnings` observation
    counting statements dropped under ActionIfNull=WARN — readable from the
    batch's QueryExecution listener or `df.observe` semantics."""
    subject = F.concat(
        F.lit(uri_prefix),
        F.concat_ws("/", *[F.col(f).cast("string") for f in uri_fields]),
    )
    stmt_cols, struct_fields, warn_cols = _build(mappings, namespaces, subject)
    doc = F.struct(subject.alias("subject"), *struct_fields)
    # canonical form: subject + statements in sorted property order
    canon = F.concat(
        F.lit("<"), subject, F.lit("> "), F.concat_ws("; ", *stmt_cols)
    )
    out = df.withColumn(target_col, doc).withColumn(f"{target_col}_canon", canon)
    if observe_warnings:
        # no WARN mappings → still attach a zero metric when the caller gave
        # an Observation, or Observation.get would block forever
        total = warn_cols[0] if warn_cols else F.lit(0)
        for w in warn_cols[1:]:
            total = total + w
        agg = F.sum(total).alias("n_warn")
        from pyspark.sql import Observation

        if isinstance(observe_warnings, Observation):
            out = out.observe(observe_warnings, agg)
        elif warn_cols:
            out = out.observe("construct_null_warnings", agg)
    if remove_mapped:
        out = out.drop(*_consumed_fields(mappings))
    return out
