"""Rate-source change stream — a live synthetic binlog with no WAL files.

The file source (streaming/apply.run_stream) is the production path
(binlog shipping drops segment files); the rate source gives a self-driving
stream for soak tests and demos: `rate` emits (timestamp, value) rows at a
fixed rate, and the same pure-column derivation as sources/changes.py turns
them into CHANGE_EVENT_SCHEMA rows — deterministic payload per `value`, so
any replay of the same value range converges to the same table state
through the LWW sink."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changes import N_CONVS, TURNS_PER_CONV


def rate_change_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    n_convs: int = N_CONVS,
    turns_per_conv: int = TURNS_PER_CONV,
) -> DataFrame:
    """Unbounded change-event stream: lsn = rate value (monotone), ts = rate
    timestamp (event time = arrival here), payload a pure function of lsn."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    eid = F.col("value")
    op = (
        F.when(eid % 10 == 0, F.lit("D"))
        .when(eid % 10 <= 3, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    return src.select(
        op.alias("op"),
        eid.cast("long").alias("lsn"),
        F.col("timestamp").alias("ts"),
        F.concat(
            F.lit("c"), F.pmod(F.xxhash64(eid), F.lit(n_convs)).cast("string")
        ).alias("conv_id"),
        (eid % turns_per_conv).cast("int").alias("turn_idx"),
        F.when(eid % 3 == 0, F.lit("user"))
        .when(eid % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
        .alias("role"),
        F.when(eid % 10 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("tok"),
                F.pmod(F.xxhash64(eid, F.lit(1)), F.lit(50_000)).cast("string"),
                F.lit(" e"),
                eid.cast("string"),
            )
        )
        .alias("text"),
        F.when(eid % 4 == 0, F.lit("tool_x"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
    )
