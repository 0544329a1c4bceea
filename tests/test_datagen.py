"""Generator determinism: identical rows at different parallelism, knob
behavior (skew, duplicates, schema change)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kettle_jena_plugins_spark.datagen import gen_change_events


def test_partitioning_independent(spark):
    a = gen_change_events(spark, 2000, parallelism=1)
    b = gen_change_events(spark, 2000, parallelism=16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_duplicates_replay_verbatim(spark):
    df = gen_change_events(spark, 1000, dup_frac=0.5)
    assert df.count() == 1500
    # every duplicated lsn appears with exactly one distinct payload
    dup_payloads = (
        df.groupBy("lsn")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.struct("op", "ts", "conv_id", "text")).alias("d"),
        )
        .filter(F.col("n") > 1)
    )
    assert dup_payloads.count() > 0
    assert dup_payloads.filter(F.col("d") > 1).count() == 0


def test_hot_key_skew(spark):
    df = gen_change_events(spark, 5000, hot_frac=0.5, n_hot=2, n_convs=1000)
    top = (
        df.groupBy("conv_id").count().orderBy(F.desc("count")).limit(2).collect()
    )
    assert sum(r["count"] for r in top) > 5000 * 0.4


def test_schema_change_knob(spark):
    df = gen_change_events(spark, 1000, evolve_at=500)
    assert "tool_meta" in df.columns
    assert df.filter((F.col("lsn") < 500) & F.col("tool_meta").isNotNull()).count() == 0
    assert df.filter((F.col("lsn") >= 500) & F.col("tool_meta").isNotNull()).count() > 0


def test_ooo_fraction(spark):
    df = gen_change_events(spark, 2000, ooo_frac=0.3)
    # ts seconds == lsn for in-order rows; out-of-order rows lag behind
    lag = df.filter(F.unix_timestamp("ts") - 1_767_225_600 < F.col("lsn"))
    assert 0.2 < lag.count() / 2000 < 0.4
