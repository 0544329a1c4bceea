"""Snapshot time travel, net changelog between snapshots, and snapshot
expiry on the parquet lake target — the Iceberg history/incremental-read
analogues over the versioned-manifest layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget


def ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, op string, lsn long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


B0 = [
    ("c1", 0, "user", "hello", None, "2026-01-01 00:00:00", "I", 1),
    ("c1", 1, "assistant", "hi", None, "2026-01-01 00:00:01", "I", 2),
    ("c2", 0, "user", "x", None, "2026-01-01 00:00:02", "I", 3),
]
B1 = [
    ("c1", 1, "assistant", "hi there", None, "2026-01-01 00:01:00", "U", 4),
    ("c2", 0, None, None, None, "2026-01-01 00:01:01", "D", 5),
    ("c3", 0, "user", "new", None, "2026-01-01 00:01:02", "I", 6),
]
B2 = [
    ("c2", 0, "user", "back", None, "2026-01-01 00:02:00", "I", 7),
]


def make(spark, tmp_path, mode="mor"):
    tgt = ParquetLakeTarget(spark, str(tmp_path / "tbl"), n_buckets=4, mode=mode)
    tgt.create()
    versions = []
    for i, b in enumerate((B0, B1, B2)):
        tgt.merge_batch(ev(spark, b), i)
        versions.append(tgt.manifest()["version"])
    return tgt, versions


def state(df):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in df.select("conv_id", "turn_idx", "text").collect()
    }


def test_time_travel_reads_each_snapshot(spark, tmp_path):
    tgt, versions = make(spark, tmp_path)
    v0, v1, v2 = versions
    assert state(tgt.read(version=v0)) == {
        ("c1", 0): "hello", ("c1", 1): "hi", ("c2", 0): "x",
    }
    assert state(tgt.read(version=v1)) == {
        ("c1", 0): "hello", ("c1", 1): "hi there", ("c3", 0): "new",
    }
    assert state(tgt.read(version=v2)) == state(tgt.read())
    assert state(tgt.read())[("c2", 0)] == "back"
    assert tgt.snapshots()[0] == 0  # create() commit retained too


def test_changes_between_classifies_net_ops(spark, tmp_path):
    tgt, versions = make(spark, tmp_path)
    v0, v1, v2 = versions
    ch = {
        (r["conv_id"], r["turn_idx"]): (r["_change_op"], r["text"])
        for r in tgt.changes_between(v0, v1).collect()
    }
    assert ch == {
        ("c1", 1): ("U", "hi there"),
        ("c2", 0): ("D", None),
        ("c3", 0): ("I", "new"),
    }
    # delete-then-reinsert across the whole range nets to an update-or-insert
    ch2 = {
        (r["conv_id"], r["turn_idx"]): r["_change_op"]
        for r in tgt.changes_between(v0, v2).collect()
    }
    assert ch2[("c2", 0)] == "U"  # was live at v0, live again at v2
    ch3 = {
        (r["conv_id"], r["turn_idx"]): r["_change_op"]
        for r in tgt.changes_between(v1, v2).collect()
    }
    assert ch3 == {("c2", 0): "I"}  # tombstoned at v1 → re-inserted


def test_changes_between_empty_when_same(spark, tmp_path):
    tgt, versions = make(spark, tmp_path)
    assert tgt.changes_between(versions[2], versions[2]).count() == 0


def test_expire_snapshots_keeps_current_readable(spark, tmp_path):
    tgt, versions = make(spark, tmp_path, mode="cow")  # cow leaves old groups
    before = state(tgt.read())
    res = tgt.expire_snapshots(keep_last=1)
    assert res["removed_manifests"] > 0
    # cow rewrote buckets each batch → expiry reclaims old file groups
    assert res["removed_files"] > 0
    assert state(tgt.read()) == before
    with pytest.raises(ValueError, match="does not exist"):
        tgt.read(version=versions[0]).collect()
    # a further merge after expiry still works
    tgt.merge_batch(
        ev(spark, [("c9", 0, "user", "post-expire", None,
                    "2026-01-01 00:03:00", "I", 9)]),
        3,
    )
    assert state(tgt.read())[("c9", 0)] == "post-expire"


def test_expire_snapshots_path_spelling_safe(spark, tmp_path):
    """A differently-spelled (but same) table root must not make live files
    look unreferenced; a genuinely moved table must refuse to delete."""
    import os

    tgt, _versions = make(spark, tmp_path, mode="cow")
    before = state(tgt.read())
    os.makedirs(str(tmp_path / "x"))
    respelled = ParquetLakeTarget(
        spark, str(tmp_path / "x" / ".." / "tbl"), n_buckets=4, mode="cow"
    )
    respelled.expire_snapshots(keep_last=1)
    assert state(tgt.read()) == before

    # moved table: manifests reference the old location → refuse
    import shutil

    moved_root = str(tmp_path / "moved")
    shutil.copytree(str(tmp_path / "tbl"), moved_root)
    moved = ParquetLakeTarget(spark, moved_root, n_buckets=4, mode="cow")
    with pytest.raises(RuntimeError, match="refusing to delete"):
        moved.expire_snapshots(keep_last=1)


def test_mode_adopted_from_manifest(spark, tmp_path):
    t1 = ParquetLakeTarget(spark, str(tmp_path / "m"), n_buckets=2, mode="mor")
    t1.create()
    reopened = ParquetLakeTarget(spark, str(tmp_path / "m"), mode=None)
    assert reopened.mode == "mor"
    fresh = ParquetLakeTarget(spark, str(tmp_path / "nope"), mode=None)
    assert fresh.mode == "cow"
