"""Incremental view maintenance: keep a downstream per-conversation
aggregate in sync with the lake from the NET key changelog
(`ParquetLakeTarget.changes_between`) instead of recomputing it.

This is the consumption pattern the changelog exists for (the Iceberg
changelog-scan analogue): a 100-TB rollup refresh costs O(keys touched
since the last refresh), never O(table). The contract query proves the
core IVM identity — incremental(v1→v2) == recompute(v2) — under the
value-hash oracle, which recomputes from scratch in SQL.

Retraction model: a changed key contributes −(its v1 row) if it was live
at v1 (read the OLD snapshot semi-joined to changed keys — bucket-pruned,
O(changed keys)) and +(its v2 row) if live at v2 (the changelog row
itself carries the new payload for I/U). Inserts retract nothing,
deletes add nothing; conversations whose turn count reaches 0 drop out
of the rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count


def conv_rollup(state: DataFrame, conv_col: str = "conv_id") -> DataFrame:
    """The maintained aggregate: per conversation, live turn count and
    whitespace-token total. ONE hash agg (map-side combine)."""
    return state.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )


def incremental_conv_rollup(
    prev_rollup: DataFrame,
    changes: DataFrame,
    old_state: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    op_col: str = "_change_op",
) -> DataFrame:
    """prev_rollup (the aggregate at v1) + net changelog (v1→v2) +
    old snapshot → the aggregate at v2, touching only changed keys.

    Plan shape: changed-key semi-join against the old snapshot (the only
    read of v1 data, O(changed keys)), two conv-level delta aggs, one
    full-outer merge with the previous rollup. No pass over unchanged
    keys — the whole point."""
    keys = [conv_col, turn_col]
    changed_keys = changes.select(*keys).dropDuplicates(keys)
    # retract: v1 contributions of keys that were live at v1
    retract = (
        old_state.join(changed_keys, keys)
        .groupBy(conv_col)
        .agg(
            (-F.count(F.lit(1))).alias("d_turns"),
            (-F.coalesce(F.sum(token_count(F.col("text"))), F.lit(0))).alias(
                "d_tokens"
            ),
        )
    )
    # add: v2 contributions of keys live at v2 (changelog carries them)
    add = (
        changes.filter(F.col(op_col) != "D")
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("d_turns"),
            F.coalesce(F.sum(token_count(F.col("text"))), F.lit(0)).alias(
                "d_tokens"
            ),
        )
    )
    delta = (
        retract.unionByName(add)
        .groupBy(conv_col)
        .agg(
            F.sum("d_turns").alias("d_turns"),
            F.sum("d_tokens").alias("d_tokens"),
        )
    )
    merged = prev_rollup.join(delta, conv_col, "full_outer").select(
        F.col(conv_col),
        (
            F.coalesce(F.col("n_turns"), F.lit(0))
            + F.coalesce(F.col("d_turns"), F.lit(0))
        ).alias("n_turns"),
        (
            F.coalesce(F.col("n_tokens"), F.lit(0))
            + F.coalesce(F.col("d_tokens"), F.lit(0))
        ).alias("n_tokens"),
    )
    return merged.filter(F.col("n_turns") > 0)
