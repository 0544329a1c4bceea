"""Parameterized policy matrix for group_merge — the engine mirror of the
reference's exhaustive CsvSource tables (JenaGroupMergeStepTest.java:55-830:
OtherFieldAction × null/missing × continuation paths)."""

from __future__ import annotations

import datetime as dt

import pytest

from kettle_jena_plugins_spark.operators.groupmerge import (
    OtherFieldAction,
    group_merge,
)

T0 = dt.datetime(2026, 1, 1)


def df_from(spark, rows):
    return spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), lsn, v) for k, s, lsn, v in rows],
        "k string, ts timestamp, lsn long, v string",
    )


def one(spark, rows, action):
    df = df_from(spark, rows)
    out = group_merge(
        df, ["k"], other_actions={"v": action}, order=("ts", "lsn")
    ).collect()
    return {r["k"]: r["v"] for r in out}


BASE = [("g", 1, 1, "a"), ("g", 2, 2, "b"), ("g", 3, 3, "c")]


@pytest.mark.parametrize(
    "action,expected",
    [
        (OtherFieldAction.USE_FIRST, "a"),
        (OtherFieldAction.USE_LAST, "c"),
        (OtherFieldAction.SET_NULL, None),
        (OtherFieldAction.NULL_IF_DIFFERENT, None),
    ],
)
def test_action_multi_value_group(spark, action, expected):
    assert one(spark, BASE, action)["g"] == expected


@pytest.mark.parametrize(
    "action",
    [
        OtherFieldAction.USE_FIRST,
        OtherFieldAction.USE_LAST,
        OtherFieldAction.NULL_IF_DIFFERENT,
    ],
)
def test_action_uniform_group_keeps_value(spark, action):
    rows = [("g", 1, 1, "same"), ("g", 2, 2, "same")]
    assert one(spark, rows, action)["g"] == "same"


def test_null_if_different_null_safe(spark):
    # null vs value → different (reference null-safe equality,
    # JenaGroupMergeStep.java:395-403)
    rows = [("g", 1, 1, None), ("g", 2, 2, "x")]
    assert one(spark, rows, OtherFieldAction.NULL_IF_DIFFERENT)["g"] is None
    # all-null group → uniform → null
    rows = [("h", 1, 1, None), ("h", 2, 2, None)]
    assert one(spark, rows, OtherFieldAction.NULL_IF_DIFFERENT)["h"] is None


def test_use_first_out_of_order_input(spark):
    # declared (ts, lsn) order, NOT arrival order — the semantics fix over
    # the reference's consecutive-rows contract (README.md:27-28)
    rows = [("g", 3, 3, "late"), ("g", 1, 1, "first"), ("g", 2, 2, "mid")]
    assert one(spark, rows, OtherFieldAction.USE_FIRST)["g"] == "first"


def test_drop_removes_column(spark):
    df = df_from(spark, BASE)
    out = group_merge(df, ["k"], other_actions={"v": OtherFieldAction.DROP})
    assert "v" not in out.columns


def test_merge_cols_set_union(spark):
    # Model.add dedups statements (JenaGroupMergeStep.java:323) → sorted
    # distinct array; nulls dropped
    rows = [("g", 1, 1, "b"), ("g", 2, 2, "a"), ("g", 3, 3, "b"), ("g", 4, 4, None)]
    df = df_from(spark, rows)
    out = group_merge(df, ["k"], merge_cols=["v"]).collect()
    assert out[0]["v_merged"] == ["a", "b"]


def test_multiple_groups_one_row_each(spark):
    rows = [("g1", 1, 1, "a"), ("g2", 1, 2, "b"), ("g1", 2, 3, "c")]
    out = one(spark, rows, OtherFieldAction.USE_LAST)
    assert out == {"g1": "c", "g2": "b"}
