"""Gopher-style quality rules + tile-hash span dedup — edge cases the
synthetic corpus never exercises (multiline bullets/ellipses, symbol
spam, looped text, empty docs) and plan-shape guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from kettle_jena_plugins_spark.operators.dedup import span_dup_stats, token_tiles
from kettle_jena_plugins_spark.operators.quality import (
    QualityRules,
    quality_filter,
)


def _rules_df(spark):
    good = "the cat sat on the mat and then the dog sat on the rug with it"
    return spark.createDataFrame(
        [
            (1, good),
            (2, "word " * 4),                       # 4 tokens: too few
            (3, "# # … " * 20 + good),              # symbol spam
            (4, "\n".join("- item %d is here" % i for i in range(10))),
            (5, "\n".join(["the start of the story and more..."] * 4)),
            (6, ("spam ham " * 30) + "the end is that of it"),  # looped
            (7, "12 34 56 78 90 11 22 33 44 55 66"),  # no alpha words
            (8, ""),
        ],
        "doc_id long, text string",
    )


def test_quality_rules_fire(spark):
    out = {
        r["doc_id"]: r
        for r in quality_filter(_rules_df(spark)).collect()
    }
    assert out[1]["keep"] and out[1]["fail_reasons"] == []
    assert "too_few_tokens" in out[2]["fail_reasons"]
    assert "symbol_ratio" in out[3]["fail_reasons"]
    assert "bullet_lines" in out[4]["fail_reasons"]
    assert "ellipsis_lines" in out[5]["fail_reasons"]
    assert "repetition" in out[6]["fail_reasons"]
    assert out[6]["rep2"] > 0.5
    assert "alpha_frac" in out[7]["fail_reasons"]
    # empty doc: zeroed signals fall below the alpha/word-length floors too
    assert out[8]["n_tokens"] == 0 and out[8]["mean_word_len"] == 0.0
    assert set(out[8]["fail_reasons"]) == {
        "too_few_tokens", "word_len_band", "alpha_frac", "stopwords"
    }
    assert not out[8]["keep"]


def test_quality_rules_configurable(spark):
    df = _rules_df(spark).filter(F.col("doc_id") == 2)
    lax = QualityRules(min_tokens=1, min_stopword_hits=0, max_rep2=1.0)
    row = quality_filter(df, rules=lax).collect()[0]
    assert row["keep"], row["fail_reasons"]


def test_quality_filter_is_narrow(spark):
    plan = (
        quality_filter(_rules_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_token_tiles_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["tiles"]
        for r in df.select(
            "doc_id", token_tiles("text", 3).alias("tiles")
        ).collect()
    }
    assert out[1] == ["a b c", "d e f"]  # only full tiles, stride = t
    assert out[2] == [] and out[3] == []


def test_span_dup_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),   # tiles: abcd efgh ijkl
            (2, "a b c d x y z w"),           # shares tile abcd with 1
            (3, "p q r"),                     # shorter than t: 0 tiles
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tiles"], r["dup_tiles"], r["dup_frac"])
        for r in span_dup_stats(df, t=4).collect()
    }
    assert out[1] == (3, 1, 0.333333)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (0, 0, 0.0)  # still present in the output


def test_span_dup_within_doc_repeat(spark):
    # the same tile repeated INSIDE one doc counts as duplicated text
    df = spark.createDataFrame(
        [(1, "a b c d a b c d")], "doc_id long, text string"
    )
    row = span_dup_stats(df, t=4).collect()[0]
    assert (row["n_tiles"], row["dup_tiles"]) == (2, 2)
