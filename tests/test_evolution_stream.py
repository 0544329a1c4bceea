"""Mid-stream schema evolution through the streaming wrapper: a v2 WAL
segment (new tool_meta column + turn_idx widened int32→int64) arrives after
v1 batches; the engine ALTERs the target before the merge and old rows read
as null tool_meta (FIXTURES.md §2 evolution variant)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from kettle_jena_plugins_spark.model import CHANGE_EVENT_SCHEMA, CHANGE_EVENT_SCHEMA_V2
from kettle_jena_plugins_spark.plans.evolution import (
    IncompatibleSchemaChange,
    evolved_schema,
)
from kettle_jena_plugins_spark.streaming.apply import CDCConfig, run_stream
from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget

T0 = dt.datetime(2026, 1, 1)


def test_stream_restart_with_evolved_schema(spark, tmp_path):
    wal = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")
    tgt = ParquetLakeTarget(spark, str(tmp_path / "tbl"), n_buckets=2, mode="mor")
    tgt.create()
    cfg = CDCConfig(normalize=False)

    v1 = spark.createDataFrame(
        [("I", 1, T0, "a", 0, "user", "hello", None)], CHANGE_EVENT_SCHEMA
    )
    v1.coalesce(1).write.mode("append").parquet(wal)
    run_stream(spark, wal, tgt, ckpt, cfg)
    assert "tool_meta" not in [f.name for f in tgt.schema().fields]

    time.sleep(1.1)
    v2 = spark.createDataFrame(
        [("I", 2, T0 + dt.timedelta(seconds=1), "a", 2**40, "user", "wide",
          None, '{"m":2}')],
        CHANGE_EVENT_SCHEMA_V2,
    )
    wal2 = str(tmp_path / "wal2")
    v2.coalesce(1).write.mode("append").parquet(wal2)
    # restart the stream against the evolved WAL (new source schema, fresh
    # checkpoint lineage — the old one is bound to the v1 schema)
    run_stream(
        spark, wal2, tgt, str(tmp_path / "ckpt2"), cfg,
        schema=CHANGE_EVENT_SCHEMA_V2,
    )
    fields = {f.name: f.dataType.simpleString() for f in tgt.schema().fields}
    assert fields["tool_meta"] == "string"
    assert fields["turn_idx"] == "bigint"
    rows = {(r["conv_id"], r["turn_idx"]): r for r in tgt.read().collect()}
    assert rows[("a", 0)]["tool_meta"] is None
    assert rows[("a", 2**40)]["tool_meta"] == '{"m":2}'


def test_incompatible_change_rejected():
    from pyspark.sql import types as T

    tgt = T.StructType([T.StructField("text", T.StringType())])
    bad = T.StructType([T.StructField("text", T.LongType())])
    try:
        evolved_schema(tgt, bad)
        raise AssertionError("expected IncompatibleSchemaChange")
    except IncompatibleSchemaChange:
        pass


def test_narrowing_resolves_to_wider(spark):
    """A late producer still sending int32 turn_idx after widening must NOT
    narrow the target back (wider-type resolution)."""
    from pyspark.sql import types as T

    wide = T.StructType([T.StructField("turn_idx", T.LongType())])
    narrow_batch = T.StructType([T.StructField("turn_idx", T.IntegerType())])
    assert evolved_schema(wide, narrow_batch) is None  # no DDL, stays long