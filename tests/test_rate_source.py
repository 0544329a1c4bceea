"""Rate-source live stream: schema matches the change-event contract and
the stream applies cleanly through the full CDC sink."""

from __future__ import annotations

import time

from kettle_jena_plugins_spark.model import CHANGE_EVENT_SCHEMA
from kettle_jena_plugins_spark.sources.rate import rate_change_stream
from kettle_jena_plugins_spark.streaming.apply import CDCConfig, apply_batch
from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget


def test_rate_stream_schema_and_apply(spark, tmp_path):
    stream = rate_change_stream(spark, rows_per_second=2000)
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in CHANGE_EVENT_SCHEMA.fields
    ]
    tgt = ParquetLakeTarget(spark, str(tmp_path / "tbl"), n_buckets=4)
    tgt.create()
    applied = []

    def sink(df, bid):
        res = apply_batch(tgt, df, bid, CDCConfig(normalize=False))
        applied.append(res.events_in)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and sum(applied) == 0:
        time.sleep(1)
    q.stop()
    q.awaitTermination()
    assert sum(applied) > 0, "rate stream delivered no events in 60s"
    assert tgt.read().count() > 0
    # deterministic payloads: same lsn always carries the same text
    rows = {r["turn_idx"]: r["text"] for r in tgt.read().limit(5).collect()}
    assert all(t is None or t.startswith("tok") for t in rows.values())
