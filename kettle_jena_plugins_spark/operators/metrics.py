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
