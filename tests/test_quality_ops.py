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


# ----------------------------------------------------- tool-usage profile


def test_agent_tool_stats_runs(spark):
    from kettle_jena_plugins_spark.operators.transcripts import (
        agent_tool_stats,
    )

    rows = [
        # c1: tools at turns 1,2,3 (run of 3) and 5 — collected out of order
        ("c1", 3, "grep"), ("c1", 0, None), ("c1", 1, "grep"),
        ("c1", 2, "sed"), ("c1", 4, None), ("c1", 5, "awk"),
        # c2: no tools at all
        ("c2", 0, None), ("c2", 1, None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    out = {r["conv_id"]: r for r in agent_tool_stats(df).collect()}
    c1 = out["c1"]
    assert (c1["n_turns"], c1["n_tool_turns"], c1["n_tools"]) == (6, 4, 3)
    assert c1["max_tool_run"] == 3 and c1["tool_frac"] == 0.666667
    c2 = out["c2"]
    assert (c2["n_tool_turns"], c2["n_tools"], c2["max_tool_run"]) == (0, 0, 0)
    assert c2["tool_frac"] == 0.0


def test_agent_tool_stats_single_shuffle(spark):
    from kettle_jena_plugins_spark.operators.transcripts import (
        agent_tool_stats,
    )

    df = spark.createDataFrame(
        [("c1", 0, None)], "conv_id string, turn_idx int, tool string"
    )
    plan = (
        agent_tool_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1 and "Window" not in plan


# ----------------------------------------------------- incremental dedup


def test_dedup_against_index_directional(spark):
    from kettle_jena_plugins_spark.operators.dedup import dedup_against_index

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    idx = spark.createDataFrame(
        [(1, base), (2, "completely different words live in this text body"),
         (3, base + " tail")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(101, base), (102, "nothing shared with any index document here")],
        "doc_id long, text string",
    )
    out = dedup_against_index(new, idx, threshold=0.5).collect()
    got = {(r["new_doc_id"], r["index_doc_id"]) for r in out}
    assert (101, 1) in got                      # exact copy found
    assert all(n >= 100 and i < 100 for n, i in got)  # strictly directional
    assert not any(n == 102 for n, _ in got)    # novel doc untouched


def test_dedup_against_index_broadcasts_new_side(spark):
    from kettle_jena_plugins_spark.operators.dedup import dedup_against_index

    idx = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    new = spark.createDataFrame([(9, "a b c d e f")], "doc_id long, text string")
    plan = (
        dedup_against_index(new, idx)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------- template detection


def test_templated_turn_stats(spark):
    from kettle_jena_plugins_spark.operators.transcripts import (
        templated_turn_stats,
    )

    hello = "Hello! How can I help?"
    rows = [
        # the canned greeting appears in 3 conversations -> templated
        ("c1", "assistant", hello), ("c2", "assistant", hello),
        ("c3", "assistant", "  hello! how can i help?  "),  # normalizes equal
        # same text under a DIFFERENT role is a different template key
        ("c1", "user", hello),
        # below threshold: only 2 occurrences
        ("c1", "user", "thanks"), ("c2", "user", "thanks"),
        # null text never counts as templated but rides n_turns
        ("c3", "user", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, text string")
    out = {r["conv_id"]: r for r in templated_turn_stats(df).collect()}
    assert (out["c1"]["n_turns"], out["c1"]["n_templated"]) == (3, 1)
    assert (out["c2"]["n_turns"], out["c2"]["n_templated"]) == (2, 1)
    assert (out["c3"]["n_turns"], out["c3"]["n_templated"]) == (2, 1)
    assert out["c3"]["templated_frac"] == 0.5


def test_saved_index_matches_inline(spark, tmp_path):
    from kettle_jena_plugins_spark.operators.dedup import (
        build_dedup_index,
        dedup_against_index,
        dedup_against_saved_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    idx = spark.createDataFrame(
        [(1, base), (2, "completely different words live in this text body"),
         (3, base + " tail")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(101, base), (102, "nothing shared with any index document here")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "dedup_index")
    build_dedup_index(idx, p)
    inline = sorted(
        tuple(r) for r in dedup_against_index(new, idx, threshold=0.5).collect()
    )
    saved = sorted(
        tuple(r)
        for r in dedup_against_saved_index(
            spark, new, p, threshold=0.5
        ).collect()
    )
    assert inline == saved and len(saved) >= 1


def test_corpus_ngram_counts(spark):
    from kettle_jena_plugins_spark.operators.text import corpus_ngram_counts

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c d"), (3, "x y")],
        "doc_id long, text string",
    )
    out = [(r["gram"], r["cnt"]) for r in corpus_ngram_counts(df, top=3).collect()]
    # "a b c" appears 3x (twice in doc1 via overlap? no - stride 1: doc1
    # trigrams = [abc, bca, cab, abc]; doc2 = [abc, bcd]) -> abc x3
    assert out[0] == ("a b c", 3)
    assert out[1][1] == 1 and out[1][0] < out[2][0]  # tie broken by gram asc


def test_span_dup_single_tile_pass(spark):
    # regression: the groupBy+join-back formulation re-ran the tokenize +
    # explode chain per join side; the window-count plan must hold ONE
    from kettle_jena_plugins_spark.operators.dedup import span_dup_stats

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = (
        span_dup_stats(df, t=2)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Generate") == 1


def test_corpus_ngrams_no_global_sort(spark):
    # top-k must be TakeOrdered over the agg output, not a global sort
    from kettle_jena_plugins_spark.operators.text import corpus_ngram_counts

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = (
        corpus_ngram_counts(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_index_append_lifecycle(spark, tmp_path):
    # probe -> accept -> append -> the NEXT batch dedups against the keeper
    from kettle_jena_plugins_spark.operators.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        dedup_against_saved_index,
    )

    t1 = "the quick brown fox jumps over the lazy dog again and again ok"
    t2 = "an entirely novel document with its own particular set of words"
    idx = spark.createDataFrame([(1, t1)], "doc_id long, text string")
    p = str(tmp_path / "idx")
    build_dedup_index(idx, p)

    batch1 = spark.createDataFrame([(101, t2)], "doc_id long, text string")
    assert dedup_against_saved_index(spark, batch1, p, threshold=0.5).count() == 0
    append_to_dedup_index(batch1, p)  # accepted -> joins the index

    batch2 = spark.createDataFrame(
        [(201, t2), (202, "still nothing like anything indexed before now")],
        "doc_id long, text string",
    )
    hits = dedup_against_saved_index(spark, batch2, p, threshold=0.5).collect()
    assert {(r["new_doc_id"], r["index_doc_id"]) for r in hits} == {(201, 101)}


# ------------------------------------------------------- hot-bucket guard

def _boilerplate_corpus(spark, n_boiler: int):
    """n_boiler docs sharing one verbatim boilerplate string (the
    degenerate LSH bucket a crawl corpus produces) + one genuine
    near-dup pair of distinct text."""
    boiler = "all rights reserved contact us privacy policy terms of use"
    pair = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(n_boiler)]
    rows += [(1000, pair), (1001, pair)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_bucket_guard_bounds_candidates(spark):
    """One boilerplate mega-bucket must NOT go |bucket|²: with the cap,
    candidate count is bounded by the genuine pair; uncapped it explodes
    quadratically; hot_buckets surfaces exactly what was dropped."""
    from kettle_jena_plugins_spark.operators.dedup import (
        hot_buckets,
        minhash_candidates,
    )

    df = _boilerplate_corpus(spark, 50)
    capped = minhash_candidates(df, max_bucket=10).collect()
    # only the genuine near-dup pair survives candidate generation
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(1000, 1001)}
    # uncapped: 50·49/2 boilerplate pairs + the genuine pair
    assert minhash_candidates(df, max_bucket=None).count() == 1225 + 1
    # drop accounting: identical texts share every band bucket → one
    # over-cap bucket per band, each of width 50
    hot = hot_buckets(df, max_bucket=10).collect()
    assert len(hot) == 3 and all(r["width"] == 50 for r in hot)
    assert sorted(r["band"] for r in hot) == [0, 1, 2]


def test_incremental_probe_inherits_hot_bucket_guard(spark, tmp_path):
    """The directional ingest path (inline AND saved-index form) caps
    total probed-bucket width without reshuffling the index: a batch doc
    hitting the boilerplate bucket yields no candidates; a batch doc
    duplicating a normal index doc still matches."""
    from kettle_jena_plugins_spark.operators.dedup import (
        build_dedup_index,
        dedup_against_index,
        dedup_against_saved_index,
    )

    boiler = "all rights reserved contact us privacy policy terms of use"
    uniq = "an entirely original sentence about migrating storks in autumn"
    index = spark.createDataFrame(
        [(i, boiler) for i in range(30)] + [(500, uniq)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(2000, boiler), (2001, uniq)], "doc_id long, text string"
    )
    want = {(2001, 500)}
    got = dedup_against_index(batch, index, max_bucket=20)
    assert {(r["new_doc_id"], r["index_doc_id"]) for r in got.collect()} == want
    # uncapped, the boilerplate batch doc pairs with all 30 index copies
    uncapped = dedup_against_index(batch, index, max_bucket=None)
    assert uncapped.count() == 30 + 1
    # persisted-index path inherits the same guard
    path = str(tmp_path / "dedup_idx")
    build_dedup_index(index, path)
    saved = dedup_against_saved_index(spark, batch, path, max_bucket=20)
    assert {(r["new_doc_id"], r["index_doc_id"]) for r in saved.collect()} == want
    saved_uncapped = dedup_against_saved_index(
        spark, batch, path, max_bucket=None
    )
    assert saved_uncapped.count() == 30 + 1


def test_saved_index_widths_sum_across_appends(spark, tmp_path):
    """The persisted widths side table makes the probe-time guard
    O(distinct buckets) instead of a second pass over index rows, and
    appends write PARTIAL counts that probes SUM: a bucket that crosses
    the cap only after an append must stop matching."""
    from kettle_jena_plugins_spark.operators.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        dedup_against_saved_index,
    )

    boiler = "all rights reserved contact us privacy policy terms of use"
    index = spark.createDataFrame(
        [(i, boiler) for i in range(15)], "doc_id long, text string"
    )
    path = str(tmp_path / "widx")
    build_dedup_index(index, path)
    # widths side table exists and counts the build
    w = spark.read.parquet(f"{path}/widths")
    assert {r["w"] for r in w.collect()} == {15}
    batch = spark.createDataFrame([(9000, boiler)], "doc_id long, text string")
    # 15 index + 1 batch = 16 ≤ 20: the boilerplate still matches
    assert dedup_against_saved_index(spark, batch, path, max_bucket=20).count() == 15
    # append 10 more copies → widths rows are PARTIAL (15 + 10)
    more = spark.createDataFrame(
        [(100 + i, boiler) for i in range(10)], "doc_id long, text string"
    )
    append_to_dedup_index(more, path)
    per_bucket = (
        spark.read.parquet(f"{path}/widths")
        .groupBy("band", "bucket")
        .sum("w")
        .collect()
    )
    assert {r["sum(w)"] for r in per_bucket} == {25}
    # summed width 25 + 1 > 20 → the guard now drops the bucket
    assert dedup_against_saved_index(spark, batch, path, max_bucket=20).count() == 0
    # and uncapped still sees all 25 copies
    assert (
        dedup_against_saved_index(spark, batch, path, max_bucket=None).count()
        == 25
    )


def test_compact_dedup_index_preserves_probe(spark, tmp_path, capsys):
    """Compaction rewrites partial width rows as one summed row per
    bucket — probe results are identical before and after; the CLI
    `index compact` action drives it."""
    import json as _json

    from kettle_jena_plugins_spark.operators.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        dedup_against_saved_index,
    )
    from kettle_jena_plugins_spark.run import main

    boiler = "all rights reserved contact us privacy policy terms of use"
    uniq = "an entirely original sentence about migrating storks in autumn"
    path = str(tmp_path / "cidx")
    build_dedup_index(
        spark.createDataFrame(
            [(i, boiler) for i in range(15)] + [(500, uniq)],
            "doc_id long, text string",
        ),
        path,
    )
    append_to_dedup_index(
        spark.createDataFrame(
            [(100 + i, boiler) for i in range(10)],
            "doc_id long, text string",
        ),
        path,
    )
    batch = spark.createDataFrame(
        [(9000, boiler), (9001, uniq)], "doc_id long, text string"
    )

    def probe_set(cap):
        return {
            (r["new_doc_id"], r["index_doc_id"])
            for r in dedup_against_saved_index(
                spark, batch, path, max_bucket=cap
            ).collect()
        }

    before_capped = probe_set(20)
    before_open = probe_set(None)
    n_rows_before = spark.read.parquet(f"{path}/widths").count()
    rc = main(["index", "compact", "--index", path])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["width_rows"] < n_rows_before  # partials folded
    w = spark.read.parquet(f"{path}/widths")
    assert w.count() == w.select("band", "bucket").distinct().count()
    assert probe_set(20) == before_capped
    assert probe_set(None) == before_open
