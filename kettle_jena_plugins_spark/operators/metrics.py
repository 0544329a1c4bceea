"""Changelog observability: out-of-order / lateness accounting.

The north rule requires per-partition lineage + metrics ("events applied,
late events, merge row counts") — streaming/apply.py carries those through
``observe``; this module is the BOUNDED profiling counterpart: quantify how
disordered a WAL actually is, per key shard, before choosing watermarks and
salting. An event is "late" when it carries an event time smaller than the
maximum event time already seen at its position in the WAL (lsn order) within
its shard — the exact population a streaming watermark of depth d would drop
if d were smaller than the observed lateness.

Scale design: one shuffle on the shard key + an in-partition sort (running
``max`` window over lsn order), then a hash aggregation that reuses the same
partitioning (no second shuffle — Catalyst sees the child distribution).
No global sort: lateness is always measured within a shard, which is also
how the streaming path consumes the WAL (per-partition watermarks,
targets/parquet_lake.py bucket LSN watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lag_metrics(
    changes: DataFrame,
    shard_key: str = "conv_id",
    ts_col: str = "ts",
    lsn_col: str = "lsn",
) -> DataFrame:
    """→ one row per shard: n_events, n_late, max_lateness_us, p_late.

    max_lateness_us is the largest (running-max ts − event ts) over the
    shard's WAL order — the minimum watermark delay that would lose nothing.
    """
    w = (
        Window.partitionBy(shard_key)
        .orderBy(F.col(lsn_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    high = F.max(F.unix_micros(F.col(ts_col))).over(w)
    late_us = F.greatest(
        F.coalesce(high - F.unix_micros(F.col(ts_col)), F.lit(0)), F.lit(0)
    )
    tagged = changes.select(
        F.col(shard_key), late_us.alias("__late_us")
    )
    return tagged.groupBy(shard_key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("__late_us") > 0).cast("long")).alias("n_late"),
        F.max("__late_us").alias("max_lateness_us"),
        F.round(
            F.sum((F.col("__late_us") > 0).cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("p_late"),
    )


def wal_profile(
    changes: DataFrame,
    ts_col: str = "ts",
    conv_col: str = "conv_id",
    op_col: str = "op",
    lsn_col: str = "lsn",
) -> DataFrame:
    """Time-bucketed WAL throughput/shape profile: per event-time hour,
    event and per-op counts, distinct conversations touched, and the max
    LSN (the resume point a consumer at that hour would record). The ops
    dashboard a CDC pipeline owner reads to size batches and spot op-mix
    shifts (e.g. a delete storm). ONE hash agg on date_trunc — map-side
    combine collapses each task to its hours before the shuffle."""
    hour = F.date_trunc("hour", F.col(ts_col))
    return changes.groupBy(hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col(op_col) == "I").cast("long")).alias("n_inserts"),
        F.sum((F.col(op_col) == "U").cast("long")).alias("n_updates"),
        F.sum((F.col(op_col) == "D").cast("long")).alias("n_deletes"),
        F.countDistinct(F.col(conv_col)).alias("n_convs"),
        F.max(F.col(lsn_col)).alias("max_lsn"),
    )


def churn_stats(
    changes: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    op_col: str = "op",
) -> DataFrame:
    """Per-conversation write amplification: delivered events vs distinct
    keys touched (churn = events/key — how many times the average turn was
    rewritten) plus the delete count. Sizes the LWW reduction's payoff per
    key shard (churn ≈ the factor by which post-reduce rows shrink) and
    flags pathologically rewritten conversations. ONE hash agg."""
    return changes.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.col(turn_col)).alias("n_keys"),
        F.round(
            F.count(F.lit(1)) / F.countDistinct(F.col(turn_col)), 4
        ).alias("churn"),
        F.sum((F.col(op_col) == "D").cast("long")).alias("n_deletes"),
    )


def update_delta_stats(
    changes: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    ts_col: str = "ts",
    lsn_col: str = "lsn",
) -> DataFrame:
    """How much does each update actually change? Per conversation:
    Levenshtein distance between consecutive text versions of the same key
    in (ts, lsn) order — mean/max edit size plus the pair count. Separates
    "updates are full rewrites" (CDC carrying new documents) from "updates
    are small edits" (delta encoding / MOR compaction pays off). Pairs
    with a NULL side (deletes) are excluded. One key-partitioned window
    (lag) + one conv-keyed agg; distances are integers, so the mean is
    exact on any engine."""
    w = Window.partitionBy(conv_col, turn_col).orderBy(
        F.col(ts_col), F.col(lsn_col)
    )
    prev = F.lag(F.col(text_col)).over(w)
    delta = F.when(
        prev.isNotNull() & F.col(text_col).isNotNull(),
        F.levenshtein(prev, F.col(text_col)),
    )
    tagged = changes.select(F.col(conv_col), delta.alias("__d"))
    return (
        tagged.groupBy(conv_col)
        .agg(
            F.count(F.col("__d")).alias("n_pairs"),
            F.round(F.avg(F.col("__d")), 4).alias("avg_delta"),
            F.max(F.col("__d")).alias("max_delta"),
        )
        .filter(F.col("n_pairs") > 0)
    )


def event_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): consecutive events of the
    same user closer than ``gap_minutes`` belong to one session; a larger
    gap starts the next. The bounded-data counterpart of
    streaming/sessionize.py's applyInPandasWithState operator — same
    session semantics, but expressed as ONE user-partitioned window pass
    (lag → boundary flag → running sum = session index) + ONE hash agg,
    so Catalyst reuses the partitioning and nothing touches Python.
    Durations are integer microseconds end-to-end (no float drift).

    Returns (user_id, session_idx, n_events, start_ts, end_ts,
    duration_us) with session_idx numbered 1.. per user in time order."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    # parquet event logs often carry TIMESTAMP_NTZ; unix_micros requires
    # TIMESTAMP — the cast reads NTZ as session-zone (UTC) wall time
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    boundary = F.when(
        prev.isNull() | ((us - prev) > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tagged = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.sum(boundary).over(run).alias("session_idx"),
    )
    return tagged.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
    )
