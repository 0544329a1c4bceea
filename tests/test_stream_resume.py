"""Structured Streaming wrapper: availableNow drain, checkpoint resume,
replay-to-convergence (north rule: a killed job resumes and replays to
byte-identical final table state)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.operators.lww import lww_state
from kettle_jena_plugins_spark.sources.changes import change_events
from kettle_jena_plugins_spark.streaming.apply import CDCConfig, run_stream
from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget

SF = "/root/testdata/sf0.001"


def full_state(t):
    rows = t.read().collect()
    return sorted(tuple(r) for r in rows)


@pytest.fixture()
def ch(spark):
    df = change_events(spark, SF).cache()
    yield df
    df.unpersist()


def test_stream_drain_resume_converges(spark, tmp_path, ch):
    wal = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")
    tgt = ParquetLakeTarget(spark, str(tmp_path / "tbl"), n_buckets=4)
    tgt.create()
    cfg = CDCConfig(normalize=False, metrics_path=str(tmp_path / "m.jsonl"))

    # WAL files land over time; first two segments, drain, then two more
    for i in range(2):
        ch.filter(F.col("lsn") % 4 == i).coalesce(1).write.mode("append").parquet(wal)
    run_stream(spark, wal, tgt, ckpt, cfg, max_files_per_trigger=1)
    mid_batches = tgt.last_committed_batch()
    assert mid_batches >= 0

    time.sleep(1.1)  # distinct mod-times so the file source sees new files
    for i in range(2, 4):
        ch.filter(F.col("lsn") % 4 == i).coalesce(1).write.mode("append").parquet(wal)
    run_stream(spark, wal, tgt, ckpt, cfg, max_files_per_trigger=1)
    assert tgt.last_committed_batch() > mid_batches

    # resumed incremental replay == one-shot LWW over the whole log
    want = sorted(
        tuple(r)
        for r in lww_state(ch)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )
    assert full_state(tgt) == want

    # re-running with the same checkpoint and no new files is a no-op
    v = tgt.manifest()["version"]
    run_stream(spark, wal, tgt, ckpt, cfg, max_files_per_trigger=1)
    assert tgt.manifest()["version"] == v
    assert full_state(tgt) == want


def test_stream_envelopes_drain_resume_converges(spark, tmp_path, ch):
    """Streaming ingest of raw wire-format JSON lines (wal2json here —
    bit-exact round trip incl. microsecond ts): drain, land more files,
    resume from the same checkpoint, and converge to the one-shot LWW
    state — the envelope front door inherits the parquet WAL's
    checkpoint/replay semantics."""
    from kettle_jena_plugins_spark.sources.wal2json import to_wal2json

    env = str(tmp_path / "env")
    ckpt = str(tmp_path / "ckpt")
    tgt = ParquetLakeTarget(spark, str(tmp_path / "tbl"), n_buckets=4)
    tgt.create()
    cfg = CDCConfig(normalize=False)

    halves = [ch.filter(F.col("lsn") % 2 == i) for i in range(2)]
    to_wal2json(halves[0]).coalesce(1).write.mode("append").text(env)
    run_stream(spark, env, tgt, ckpt, cfg, max_files_per_trigger=1,
               envelope_dialect="wal2json", source_table="transcripts")
    mid_batches = tgt.last_committed_batch()
    assert mid_batches >= 0

    time.sleep(1.1)  # distinct mod-times so the file source sees new files
    to_wal2json(halves[1]).coalesce(1).write.mode("append").text(env)
    run_stream(spark, env, tgt, ckpt, cfg, max_files_per_trigger=1,
               envelope_dialect="wal2json", source_table="transcripts")
    assert tgt.last_committed_batch() > mid_batches

    want = sorted(
        tuple(r)
        for r in lww_state(ch)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    )
    assert full_state(tgt) == want


def test_fresh_checkpoint_replay_is_idempotent(spark, tmp_path, ch):
    """Losing the checkpoint and replaying the whole WAL from scratch must
    converge to the same state (MERGE is LWW-guarded, not blind upsert)."""
    wal = str(tmp_path / "wal")
    ch.coalesce(2).write.parquet(wal)
    tgt = ParquetLakeTarget(spark, str(tmp_path / "tbl"), n_buckets=4)
    tgt.create()
    cfg = CDCConfig(normalize=False)
    run_stream(spark, wal, tgt, str(tmp_path / "ckpt1"), cfg)
    s1 = full_state(tgt)
    # checkpoint lost → full replay through a new checkpoint
    run_stream(spark, wal, tgt, str(tmp_path / "ckpt2"), cfg)
    assert full_state(tgt) == s1
