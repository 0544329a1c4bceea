"""Group-and-merge operator with the reference's OtherFieldAction policy set.

Reference: JenaGroupMergeStep (groupmerge/JenaGroupMergeStep.java:49-516) —
a sort-based streaming group-by over *consecutive* rows: merge columns are
RDF-model-unioned per group (mergeRowIntoGroup :219-264), non-key non-merge
columns resolved by OtherFieldAction ∈ {DROP, USE_FIRST, USE_LAST, SET_NULL,
NULL_IF_DIFFERENT} (OtherFieldAction.java:31-56).

Spark-first re-expression: a shuffled hash aggregation — the consecutive-rows
contract disappears (Spark groups by key, sorted input not required), and
USE_FIRST/USE_LAST get a *declared* total order instead of arrival order.
Model-union becomes set-union of values (Model.add dedups statements —
JenaGroupMergeStep.java:323): sorted distinct arrays.

All policies compile to built-in aggregates (JVM, map-side partial agg);
no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class OtherFieldAction(str, Enum):
    """Mirror of OtherFieldAction.java:31-56."""

    DROP = "DROP"
    USE_FIRST = "USE_FIRST"
    USE_LAST = "USE_LAST"
    SET_NULL = "SET_NULL"
    NULL_IF_DIFFERENT = "NULL_IF_DIFFERENT"


def _policy_agg(col: str, action: OtherFieldAction, ord_col: Column) -> Column | None:
    c = F.col(col)
    if action is OtherFieldAction.DROP:
        return None
    if action is OtherFieldAction.USE_FIRST:
        return F.min_by(c, ord_col).alias(col)
    if action is OtherFieldAction.USE_LAST:
        return F.max_by(c, ord_col).alias(col)
    if action is OtherFieldAction.SET_NULL:
        # typed null: max(col) forces the right type, then nulled
        return F.when(F.lit(False), F.max(c)).alias(col)
    if action is OtherFieldAction.NULL_IF_DIFFERENT:
        # null-safe distinct count (reference null-safe equality,
        # JenaGroupMergeStep.java:395-403): nulls count as one extra value
        n_distinct = F.count_distinct(c) + F.max(
            F.when(c.isNull(), 1).otherwise(0)
        )
        return F.when(n_distinct == 1, F.min(c)).alias(col)
    raise ValueError(action)


def group_merge(
    df: DataFrame,
    group_keys: Sequence[str],
    merge_cols: Sequence[str] = (),
    other_actions: dict[str, OtherFieldAction] | None = None,
    order: Sequence[str] = ("ts", "lsn"),
    default_action: OtherFieldAction = OtherFieldAction.DROP,
) -> DataFrame:
    """One output row per group (flush-per-group, JenaGroupMergeStep.java:66-69).

    merge_cols    → set-union semantics: sorted distinct array `<col>_merged`
                    (nulls dropped, as Model.add of a null mapping is skipped)
    other_actions → per-column OtherFieldAction; unlisted non-key non-merge
                    columns get `default_action`.
    """
    other_actions = dict(other_actions or {})
    ord_col = F.struct(*[F.col(c) for c in order])
    aggs: list[Column] = []
    for col in merge_cols:
        aggs.append(
            F.array_sort(F.array_distinct(F.collect_list(F.col(col)))).alias(
                f"{col}_merged"
            )
        )
    for col in df.columns:
        if col in group_keys or col in merge_cols or col in order:
            continue
        action = other_actions.get(col, default_action)
        agg = _policy_agg(col, action, ord_col)
        if agg is not None:
            aggs.append(agg)
    if not aggs:  # everything dropped → one row per key
        return df.select(*[F.col(k) for k in group_keys]).distinct()
    return df.groupBy(*[F.col(k) for k in group_keys]).agg(*aggs)
