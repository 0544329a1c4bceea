"""Validation split: built-in constraint set + user-extensible predicates
(the reference's runtime-loaded shapes graph, JenaShaclStep.java:59-71) +
structural PathShape constraints over nested structs (the nested
property-shape analogue, JenaShaclStepIT.java:58-81)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.operators.validate import (
    PathShape,
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


def nested(spark):
    """Rows with a nested doc struct + an array column, for PathShapes."""
    base = events(spark)
    return base.select(
        "*",
        F.struct(
            F.struct(
                F.col("tool").alias("t_tool"),
                F.struct(F.col("lsn").alias("t_lsn")).alias("t_prov"),
            ).alias("t_meta"),
            F.col("text").alias("t_text"),
        ).alias("doc"),
        F.when(F.col("text") != "", F.split("text", ",")).alias("words"),
    )


def test_path_shapes_nested_required_and_cardinality(spark):
    spec = ValidationSpec(
        require_keys=(),
        require_ts=False,
        shapes=(
            PathShape("doc.t_meta.t_prov.t_lsn"),  # always present → 0
            PathShape("doc.t_meta.t_tool"),  # tool always null → all rows
            PathShape("words", min_count=1, max_count=1),
        ),
        any_of=(("doc.t_text", "doc.t_meta.t_tool"),),
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(nested(spark), spec).collect()
    }
    # bad_op fires for 'Z'; tool null in all 4 rows; the ""-text row has a
    # null words array (count 0 < 1); no text is ever null alongside tool →
    # any_of never fires; doubly-nested lsn always present
    assert stats == {
        "bad_op": 1,
        "min_count:doc.t_meta.t_tool": 4,
        "min_count:words": 1,
    }
    assert "min_count:doc.t_meta.t_prov.t_lsn" not in stats
    assert not any(k.startswith("any_of") for k in stats)


def test_any_of_group_fires_when_all_null(spark):
    df = nested(spark).withColumn(
        "doc",
        F.when(F.col("turn_idx") == 0, F.col("doc")).otherwise(
            F.col("doc").withField("t_text", F.lit(None).cast("string"))
        ),
    )
    spec = ValidationSpec(
        require_keys=(),
        require_ts=False,
        any_of=(("doc.t_text", "doc.t_meta.t_tool"),),
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    # every row except turn 0 has both t_text and t_tool null
    assert stats["any_of:doc.t_text|doc.t_meta.t_tool"] == 3


def test_require_op_modes(spark):
    """require_op=True makes a missing op column an error (a dropped or
    renamed op must not silently disable the envelope gate); None (auto)
    skips it for non-event frames; False always skips."""
    no_op = nested(spark).drop("op")
    # auto: skipped without error
    ok, dead = validate_split(
        no_op, ValidationSpec(require_keys=(), require_ts=False)
    )
    assert ok.count() + dead.count() == 4
    # required: analysis error surfaces
    with pytest.raises(Exception, match="op"):
        validate_split(
            no_op,
            ValidationSpec(require_keys=(), require_ts=False, require_op=True),
        )[1].count()
    # False on an event frame: bad 'Z' op row is NOT flagged
    ok2, dead2 = validate_split(
        events(spark),
        ValidationSpec(require_keys=(), require_ts=False, require_op=False),
    )
    assert dead2.count() == 0


def test_any_of_empty_array_counts_as_absent(spark):
    """any_of uses PathShape's count semantics: an empty array offers zero
    values, so it cannot satisfy the group."""
    df = spark.createDataFrame(
        [(1, None, ["w"]), (2, None, []), (3, "x", [])],
        "i int, t string, words array<string>",
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, any_of=(("t", "words"),)
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    assert stats == {"any_of:t|words": 1}  # only row 2


def test_shape_over_missing_path_is_config_error(spark):
    spec = ValidationSpec(shapes=(PathShape("doc.nope.deeper"),))
    with pytest.raises(ValueError, match="no field 'nope'"):
        validate_split(nested(spark), spec)


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
