"""Per-row construct operator — build a typed "document" value per row.

Reference: JenaModelStep (model/JenaModelStep.java:58-557) constructs one RDF
graph per row: subject URI from a field (:211-229), one statement per
DbToJenaMapping (fieldName, property name, type, language, skip,
actionIfNull — JenaModelStepMeta.java:110-135), recursive blank-node
substructures (:347-376), and appends the graph as a new column, optionally
dropping consumed source columns (prepareOutputRow :187-208).

Spark-first: the per-row graph becomes (a) a nested struct column (the typed
document) and (b) a deterministic canonical serialization string — sorted
property=value pairs — which is this engine's analogue of graph isomorphism
equality (EndToEndIT.java:74 isIsomorphicWith compares graphs independent of
statement order; a canonically-ordered serialization gives the same
order-independence). All built-ins: struct/concat/concat_ws (nulls skip like
ActionIfNull=IGNORE dropping the statement).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.qnames import expand_qname
from .validate import Policy


@dataclass(frozen=True)
class PropertyMapping:
    """Analogue of DbToJenaMapping (JenaModelStepMeta.java:110-135)."""

    field: str  # source column
    property: str  # property name, may be a QName
    skip: bool = False  # JenaModelStep.java:294-296
    if_null: Policy = Policy.IGNORE  # drop the statement when null


def construct_doc(
    df: DataFrame,
    uri_prefix: str,
    uri_fields: Sequence[str],
    mappings: Sequence[PropertyMapping],
    target_col: str = "doc",
    namespaces: dict[str, str] | None = None,
    remove_mapped: bool = False,
) -> DataFrame:
    """Adds `target_col` struct(subject, statements) and
    `{target_col}_canon` — the canonical string serialization."""
    subject = F.concat(
        F.lit(uri_prefix),
        F.concat_ws("/", *[F.col(f).cast("string") for f in uri_fields]),
    )
    stmt_cols: list[Column] = []
    struct_fields: list[Column] = []
    for mp in sorted(mappings, key=lambda m: expand_qname(m.property, namespaces)):
        if mp.skip:
            continue
        prop = expand_qname(mp.property, namespaces)
        val = F.col(mp.field).cast("string")
        # property=value statement; null value → statement dropped
        # (ActionIfNull.IGNORE, JenaModelStep.java:316-331)
        stmt_cols.append(
            F.when(val.isNotNull(), F.concat(F.lit(prop + "="), val))
        )
        struct_fields.append(F.col(mp.field).alias(mp.property.replace(":", "_")))
    doc = F.struct(subject.alias("subject"), *struct_fields)
    # canonical form: subject + statements in sorted property order
    canon = F.concat(
        F.lit("<"), subject, F.lit("> "), F.concat_ws("; ", *stmt_cols)
    )
    out = df.withColumn(target_col, doc).withColumn(f"{target_col}_canon", canon)
    if remove_mapped:
        out = out.drop(*{m.field for m in mappings if not m.skip})
    return out
