"""Downstream incremental consumption: feeding a table's net changelog
(changes_between) into a SECOND lake target must converge the replica to the
source's exact state — the CDC chain (binlog → table A → changelog → table
B). Plus a seeded randomized replay: random batch boundaries, duplicated
redelivery, and batch re-application must all converge to the one-shot LWW
state (exactly-once under chaos)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kettle_jena_plugins_spark.datagen import gen_change_events
from kettle_jena_plugins_spark.model import MERGE_KEYS
from kettle_jena_plugins_spark.operators.lww import lww_state
from kettle_jena_plugins_spark.streaming.apply import CDCConfig, apply_batch
from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget


def table_state(df):
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    return sorted(
        tuple(str(r[c]) for c in cols)
        for r in df.select(*cols).collect()
    )


def test_changelog_cascade_converges_replica(spark, tmp_path):
    ev = gen_change_events(spark, 6000, n_convs=80, dup_frac=0.05, ooo_frac=0.2)
    src = ParquetLakeTarget(spark, str(tmp_path / "src"), n_buckets=4)
    src.create()
    v_prev = src.manifest()["version"]
    bounds = [0, 2000, 4000, 6000]
    deltas = []
    for i in range(3):
        b = ev.filter(
            (F.col("lsn") >= bounds[i]) & (F.col("lsn") < bounds[i + 1])
        )
        apply_batch(src, b, i, CDCConfig(normalize=False))
        v_now = src.manifest()["version"]
        deltas.append((v_prev, v_now))
        v_prev = v_now

    dst = ParquetLakeTarget(spark, str(tmp_path / "dst"), n_buckets=2)
    dst.create()
    for i, (va, vb) in enumerate(deltas):
        delta = src.changes_between(va, vb).select(
            *MERGE_KEYS,
            "role",
            "text",
            "tool",
            "ts",
            F.col("_change_op").alias("op"),
            F.col("_lsn").alias("lsn"),
        )
        apply_batch(dst, delta, i, CDCConfig(normalize=False))

    assert table_state(src.read()) == table_state(dst.read())
    # and both equal the one-shot LWW of the raw log
    assert table_state(src.read()) == table_state(lww_state(ev))


def test_changelog_envelope_fanout_cascade(spark, tmp_path):
    """Changelog fan-OUT through a wire dialect: lake A's net changelog
    rendered as wal2json envelopes (the `run changes --emit-dialect`
    path), parsed back by a downstream consumer and applied to lake B —
    B converges to A's exact state. Proves the engine can sit in the
    MIDDLE of a CDC chain (emit), not just at its end (ingest);
    wal2json is the bit-exact dialect (microsecond ts + full lsn), so
    convergence is equality, not coarsened."""
    from kettle_jena_plugins_spark.sources.envelopes import (
        parse_envelope,
        render_envelope,
    )

    ev = gen_change_events(spark, 4000, n_convs=60, dup_frac=0.05,
                           ooo_frac=0.2)
    src = ParquetLakeTarget(spark, str(tmp_path / "src"), n_buckets=4)
    src.create()
    v_prev = src.manifest()["version"]
    deltas = []
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 4000)]):
        b = ev.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        apply_batch(src, b, i, CDCConfig(normalize=False))
        v_now = src.manifest()["version"]
        deltas.append((v_prev, v_now))
        v_prev = v_now

    dst = ParquetLakeTarget(spark, str(tmp_path / "dst"), n_buckets=2)
    dst.create()
    for i, (va, vb) in enumerate(deltas):
        env = render_envelope(src.changelog_as_events(va, vb), "wal2json")
        delta = parse_envelope(env, "wal2json", table="transcripts")
        apply_batch(dst, delta, i, CDCConfig(normalize=False))

    assert table_state(src.read()) == table_state(dst.read())
    assert table_state(src.read()) == table_state(lww_state(ev))


def test_sparse_changelog_mongo_cascade(spark, tmp_path):
    """The fully-sparse CDC chain: lake A's net changelog emitted as
    MINIMAL mongo $set/$unset patches (changelog_as_events sparse_col —
    only the cells whose value changed between snapshots), parsed back
    by a downstream consumer and applied through ITS cell-level merge —
    lake B converges to A's exact state. The mask itself is pinned:
    U rows carry only changed cells, I rows all, D rows none."""
    from kettle_jena_plugins_spark.sources.envelopes import (
        parse_envelope,
        render_envelope,
    )

    ev = gen_change_events(spark, 4000, n_convs=60, dup_frac=0.05,
                           ooo_frac=0.2)
    src = ParquetLakeTarget(spark, str(tmp_path / "src"), n_buckets=4)
    src.create()
    v_prev = src.manifest()["version"]
    deltas = []
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 4000)]):
        b = ev.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        apply_batch(src, b, i, CDCConfig(normalize=False))
        v_now = src.manifest()["version"]
        deltas.append((v_prev, v_now))
        v_prev = v_now

    # mask semantics on the second delta (first is all-inserts)
    va, vb = deltas[1]
    sparse = src.changelog_as_events(va, vb, sparse_col="set_cols")
    for r in sparse.collect():
        if r["op"] == "I":
            assert sorted(r["set_cols"]) == ["role", "text", "tool"]
        elif r["op"] == "D":
            assert r["set_cols"] == []
        else:
            assert r["set_cols"], "U row with an empty change mask"

    dst = ParquetLakeTarget(spark, str(tmp_path / "dst"), n_buckets=2)
    dst.create()
    cfg = CDCConfig(normalize=False, partial_set_col="set_cols")
    for i, (va, vb) in enumerate(deltas):
        env = render_envelope(
            src.changelog_as_events(va, vb, sparse_col="set_cols"), "mongo"
        )
        delta = parse_envelope(env, "mongo", table="transcripts")
        apply_batch(dst, delta, i, cfg)

    assert table_state(src.read()) == table_state(dst.read())
    assert table_state(src.read()) == table_state(lww_state(ev))


def test_randomized_replay_converges(spark, tmp_path):
    """Seeded chaos: random batch boundaries, every batch re-applied a
    random number of times (same id → idempotent skip), plus a whole-log
    replay under a NEW stream lineage — final state must equal the one-shot
    LWW reduction every time."""
    rng = random.Random(1234)
    n = 5000
    ev = gen_change_events(spark, n, n_convs=60, dup_frac=0.1, ooo_frac=0.3)
    expected = table_state(lww_state(ev))

    cuts = sorted(rng.sample(range(1, n), 3))
    bounds = [0, *cuts, n]
    tgt = ParquetLakeTarget(spark, str(tmp_path / "tbl"), n_buckets=4)
    tgt.create()
    for i in range(len(bounds) - 1):
        b = ev.filter(
            (F.col("lsn") >= bounds[i]) & (F.col("lsn") < bounds[i + 1])
        )
        for _ in range(rng.randint(1, 3)):  # crash-retry redelivery
            apply_batch(tgt, b, i, CDCConfig(normalize=False), stream_id="s1")
    assert table_state(tgt.read()) == expected

    # lost checkpoint: full replay under a fresh lineage must also converge
    for i in range(len(bounds) - 1):
        b = ev.filter(
            (F.col("lsn") >= bounds[i]) & (F.col("lsn") < bounds[i + 1])
        )
        apply_batch(tgt, b, i, CDCConfig(normalize=False), stream_id="s2")
    assert table_state(tgt.read()) == expected
