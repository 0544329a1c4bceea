"""Combine operator — horizontal merge of columns within a row.

Reference: JenaCombineStep (combine/JenaCombineStep.java:44-340) unions N
graph columns of one row into one, with per-column IGNORE/WARN/ERROR policies
for missing/null values (getModels :217-277) and optional removal of consumed
columns (willRemoveFields :204-215).

Spark-first: for scalar payloads the union-of-partial-values is
``coalesce`` in declared column order (first non-null wins — the CDC
partial-update merge); for set-valued columns it is ``array_union``/
``map_concat``. Missing-column policy is resolved at plan time (schema is
static per batch): IGNORE → null literal, WARN → null + warning counter
name, ERROR → raise before execution (the reference throws per row;
Catalyst lets us fail fast at analysis).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .validate import Policy


class MissingColumnError(ValueError):
    pass


def combine_columns(
    df: DataFrame,
    source_cols: Sequence[str],
    target_col: str,
    if_missing: Policy = Policy.ERROR,
    remove_sources: bool = True,
    set_valued: bool = False,
) -> DataFrame:
    """First-non-null (scalar) or set-union (array) combine of source_cols
    into target_col, in declared order (head column first — the reference's
    mutate-first-model head semantics, JenaCombineStep.java:279-339)."""
    cols = []
    for c in source_cols:
        if c in df.columns:
            cols.append(F.col(c))
        elif if_missing is Policy.ERROR:
            raise MissingColumnError(f"column {c} not in input (policy ERROR)")
        # IGNORE / WARN: skip (WARN accounting is the caller's metrics hook)
    if not cols:
        combined = F.lit(None)
    elif set_valued:
        combined = cols[0]
        for c in cols[1:]:
            combined = F.array_union(combined, c)
    else:
        combined = F.coalesce(*cols) if len(cols) > 1 else cols[0]
    out = df.withColumn(target_col, combined)
    if remove_sources:
        out = out.drop(*[c for c in source_cols if c != target_col])
    return out
