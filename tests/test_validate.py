"""Validation split: built-in constraint set + user-extensible predicates
(the reference's runtime-loaded shapes graph, JenaShaclStep.java:59-71)."""

from __future__ import annotations

from kettle_jena_plugins_spark.operators.validate import (
    ValidationSpec,
    dead_letter_stats,
    validate_split,
)


def events(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "user", "hi", None, "2026-01-01 00:00:00", "I", 1),
            (None, 1, "user", "x", None, "2026-01-01 00:00:00", "I", 2),
            ("c1", -3, "user", "neg", None, "2026-01-01 00:00:00", "U", 3),
            ("c1", 2, "user", "", None, "2026-01-01 00:00:00", "Z", 4),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, op string, lsn long",
    )


def test_custom_constraints_flag_rows(spark):
    spec = ValidationSpec(
        constraints=(
            ("neg_turn", "turn_idx < 0"),
            ("empty_text", "op <> 'D' AND length(text) = 0"),
        )
    )
    ok, dead = validate_split(events(spark), spec)
    assert ok.count() == 1
    reasons = {r["error_msg"] for r in dead.collect()}
    assert "neg_turn" in reasons
    # one row violates two rules: custom + bad_op, both reported
    assert any("bad_op" in r and "empty_text" in r for r in reasons)
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(events(spark), spec).collect()
    }
    assert stats == {
        "null_key:conv_id": 1,
        "bad_op": 1,
        "neg_turn": 1,
        "empty_text": 1,
    }


def test_null_predicate_is_not_a_violation(spark):
    # text IS NULL makes length(text)=0 evaluate to NULL → not flagged
    df = spark.createDataFrame(
        [("c1", 0, "user", None, None, "2026-01-01 00:00:00", "D", 1)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, op string, lsn long",
    )
    spec = ValidationSpec(constraints=(("empty_text", "length(text) = 0"),))
    ok, dead = validate_split(df, spec)
    assert ok.count() == 1 and dead.count() == 0
