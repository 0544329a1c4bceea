"""Edge semantics of the curation operators (decontamination, stratified
sampling) beyond what the value-hash oracle shows: short-document guards,
within-doc n-gram dedup, broadcast/narrow plan shapes, determinism under
repartitioning, rate-1.0 / absent-stratum policy edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from kettle_jena_plugins_spark.operators.decontam import (
    contamination,
    word_ngrams,
)
from kettle_jena_plugins_spark.operators.sampling import (
    rate_threshold,
    stratified_sample,
    stratified_sample_exact,
)


def _docs(spark, rows, cols="doc_id long, text string"):
    return spark.createDataFrame(rows, cols)


# ------------------------------------------------------------- decontam


def test_word_ngrams_short_doc_and_dedup(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),          # 4 tokens < n=5 -> empty
            (2, "a b c d e"),        # exactly n -> 1 gram
            (3, "x y x y x y x y x y"),  # repeated gram -> distinct
            (4, "   "),              # blank -> empty
        ],
    ).select("doc_id", word_ngrams(F.col("text"), 5).alias("g"))
    out = {r["doc_id"]: r["g"] for r in df.collect()}
    assert out[1] == []
    assert out[2] == ["a b c d e"]
    assert sorted(out[3]) == ["x y x y x", "y x y x y"]
    assert out[4] == []


def test_contamination_counts_and_threshold(spark):
    docs = _docs(
        spark,
        [
            (1, "one two three four five six"),  # shares 2 distinct 5-grams
            (2, "totally different words here now"),
            (3, "one two three four five"),      # shares 1
        ],
    )
    bench = _docs(
        spark,
        [(100, "one two three four five six")],
        "bench_id long, text string",
    )
    out = {
        (r["doc_id"], r["bench_id"]): r
        for r in contamination(docs, bench, n=5).collect()
    }
    assert set(out) == {(1, 100), (3, 100)}
    assert out[(1, 100)]["n_overlap"] == 2
    assert out[(1, 100)]["n_doc_ngrams"] == 2
    assert out[(3, 100)]["n_overlap"] == 1
    # min_overlap filters the single-gram pair
    out2 = contamination(docs, bench, n=5, min_overlap=2).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in out2] == [(1, 100)]


def test_contamination_case_insensitive(spark):
    docs = _docs(spark, [(1, "One Two THREE four five")])
    bench = _docs(
        spark, [(9, "one two three four five")], "bench_id long, text string"
    )
    assert contamination(docs, bench, n=5).count() == 1


def test_contamination_broadcasts_bench_not_corpus(spark):
    docs = _docs(spark, [(1, "a b c d e")])
    bench = _docs(spark, [(9, "a b c d e")], "bench_id long, text string")
    plan = (
        contamination(docs, bench, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus side must not shuffle-join


# ------------------------------------------------------------- sampling


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(1.0) == "g"  # sorts above all hex: keeps everything
    assert rate_threshold(0.5) == "80000000"
    assert rate_threshold(0.25) == "40000000"


def _corpus(spark):
    rows = [(i, ["en", "de", "zz"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_rates_and_default_drop(spark):
    df = _corpus(spark)
    out = stratified_sample(df, {"en": 1.0, "de": 0.3}, seed="s0")
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] == 100  # rate 1.0 keeps the whole stratum
    assert 10 <= by_lang.get("de", 0) <= 55  # ~30 expected, binomial spread
    assert "zz" not in by_lang  # absent stratum -> default_rate 0.0


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in stratified_sample(df, {"de": 0.4}).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), {"de": 0.4}).collect()
    }
    assert a == b and a  # same selection regardless of layout


def test_stratified_sample_is_narrow(spark):
    df = _corpus(spark)
    plan = (
        stratified_sample(df, {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure filter: zero shuffles


def test_stratified_sample_seed_changes_selection(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in stratified_sample(df, {"en": 0.5}, seed="s0").collect()}
    b = {r["doc_id"] for r in stratified_sample(df, {"en": 0.5}, seed="s1").collect()}
    assert a != b


def test_stratified_sample_exact_quotas(spark):
    df = _corpus(spark)
    out = stratified_sample_exact(df, {"en": 7, "de": 500}, seed="s0")
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] == 7  # exact quota
    assert by_lang["de"] == 100  # quota above population keeps all
    assert "zz" not in by_lang  # absent stratum dropped
    ranks = [r["sample_rank"] for r in out.filter(F.col("lang") == "en").collect()]
    assert sorted(ranks) == list(range(1, 8))


def test_stratified_sample_exact_subset_of_rate_path(spark):
    # the exact path ranks by the same md5 key the rate path thresholds on:
    # the first k selected by quota are always a subset of a generous rate cut
    df = _corpus(spark)
    exact = {
        r["doc_id"]
        for r in stratified_sample_exact(df, {"en": 5}, seed="s0").collect()
    }
    rate = {
        r["doc_id"]
        for r in stratified_sample(df, {"en": 0.5}, seed="s0").collect()
    }
    # 5 of 100 at rate 0.5: overwhelmingly within the kept half, and ordering
    # agreement is what we really assert: the 5 lowest md5 keys
    keyed = sorted(
        (r["doc_id"] for r in df.filter(F.col("lang") == "en").collect()),
        key=lambda d: __import__("hashlib").md5(f"s0{d}".encode()).hexdigest()[:8],
    )
    assert exact == set(keyed[:5])
    assert set(keyed[:5]) <= rate or len(rate) < 5  # consistency, not luck


# ------------------------------------------------------------- packing


def test_pack_sequences_windows_and_straddle(spark):
    from kettle_jena_plugins_spark.operators.packing import pack_sequences

    # one shard (n_shards=1); token counts 3,4,5 against budget 6:
    # starts 0,3,7 -> bins 0,0,1; doc 2 straddles (offset 3 + 4 > 6)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=6, n_shards=1).collect()
    }
    assert (out[1]["bin_idx"], out[1]["bin_offset"], out[1]["straddles"]) == (0, 0, False)
    assert (out[2]["bin_idx"], out[2]["bin_offset"], out[2]["straddles"]) == (0, 3, True)
    # exact fit is NOT a straddle: offset 1 + 5 = 6 == budget
    assert (out[3]["bin_idx"], out[3]["bin_offset"], out[3]["straddles"]) == (1, 1, False)


def test_pack_sequences_shards_independent(spark):
    from kettle_jena_plugins_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * 10) for i in range(20)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget=25, n_shards=4)
    rows = out.collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    # each shard's stream restarts at offset 0
    firsts = {
        r["shard"]: (r["bin_idx"], r["bin_offset"])
        for r in rows
        if r["doc_id"] < 4
    }
    assert all(v == (0, 0) for v in firsts.values())


def test_pack_sequences_empty_doc(spark):
    from kettle_jena_plugins_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "   "), (3, "c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, 100, 1).collect()}
    assert out[2]["n_tokens"] == 0 and not out[2]["straddles"]
    assert out[3]["bin_offset"] == 2  # empty doc consumed no budget


# ------------------------------------------------------------- lint


def test_lint_transcripts_report(spark):
    from kettle_jena_plugins_spark.operators.transcripts import lint_transcripts

    state = spark.createDataFrame(
        [
            # c1: dense, alternating, clean
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello"),
            # c2: gap (0,2), double-assistant, one blank
            ("c2", 0, "user", "q"),
            ("c2", 2, "assistant", ""),
            ("c2", 3, "assistant", "a2"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {r["conv_id"]: r for r in lint_transcripts(state).collect()}
    c1, c2 = out["c1"], out["c2"]
    assert not c1["has_gaps"] and c1["n_empty"] == 0 and c1["n_role_repeats"] == 0
    assert (c1["first_role"], c1["last_role"]) == ("user", "assistant")
    assert c2["has_gaps"] and c2["max_turn_idx"] == 3 and c2["n_turns"] == 3
    assert c2["n_empty"] == 1
    assert c2["n_role_repeats"] == 1
    assert (c2["first_role"], c2["last_role"]) == ("user", "assistant")


def test_lint_single_turn_and_null_text(spark):
    from kettle_jena_plugins_spark.operators.transcripts import lint_transcripts

    state = spark.createDataFrame(
        [("c1", 0, "user", None)],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = lint_transcripts(state).collect()[0]
    assert r["n_turns"] == 1 and not r["has_gaps"]
    assert r["n_empty"] == 1 and r["n_role_repeats"] == 0
    assert r["first_role"] == r["last_role"] == "user"


def test_lint_single_shuffle(spark):
    from kettle_jena_plugins_spark.operators.transcripts import lint_transcripts

    state = spark.createDataFrame(
        [("c1", 0, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    plan = (
        lint_transcripts(state)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1 and "Window" not in plan


# ------------------------------------------------------------- repetition


def test_repetition_ratio_values(spark):
    from kettle_jena_plugins_spark.operators.text import repetition_ratio

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab,ba,ab,ba,ab -> 2/5 distinct
            (2, "all words are unique here"),
            (3, "x"),                # shorter than n -> 0.0
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["r2"], r["r3"])
        for r in docs.select(
            "doc_id",
            repetition_ratio(F.col("text"), 2).alias("r2"),
            repetition_ratio(F.col("text"), 3).alias("r3"),
        ).collect()
    }
    assert out[1][0] == 0.6  # 1 - 2/5
    assert out[2] == (0.0, 0.0)
    assert out[3] == (0.0, 0.0)
    assert out[4] == (0.0, 0.0)
    # trigrams of doc1: aba,bab,aba,bab -> 1 - 2/4
    assert out[1][1] == 0.5


def test_repetition_ratio_is_narrow(spark):
    from kettle_jena_plugins_spark.operators.text import repetition_ratio

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        docs.select(repetition_ratio(F.col("text")).alias("r"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------- mixture / order / tfidf


def test_mixture_sample_rate_cap_and_zero_weight(spark):
    """A stratum too small to fill its share keeps EVERYTHING (rate caps at
    1.0); zero-weight strata are dropped entirely; rates derive from the
    corpus's own counts."""
    from kettle_jena_plugins_spark.operators.sampling import mixture_sample

    rows = [(i, "big" if i < 400 else "tiny") for i in range(420)]
    df = _docs(spark, rows, "doc_id long, lang string")
    out = mixture_sample(
        df, weights={"big": 0.5, "tiny": 0.5}, budget=100, stratum_col="lang"
    )
    got = out.collect()
    tiny = [r for r in got if r["lang"] == "tiny"]
    big = [r for r in got if r["lang"] == "big"]
    assert len(tiny) == 20  # 100*0.5/20 = 2.5 -> capped at 1.0, all kept
    assert all(r["rate"] == 1.0 for r in tiny)
    # big stratum sampled at 100*0.5/400 = 0.125: binomial around 50
    assert 20 < len(big) < 90
    assert all(r["rate"] == 0.125 for r in big)
    # zero-weight stratum vanishes
    none = mixture_sample(df, weights={"big": 1.0}, budget=50).filter(
        F.col("lang") == "tiny"
    )
    assert none.count() == 0


def test_mixture_sample_deterministic(spark):
    from kettle_jena_plugins_spark.operators.sampling import mixture_sample

    df = _docs(
        spark, [(i, "a" if i % 2 else "b") for i in range(200)],
        "doc_id long, lang string",
    )
    a = {r["doc_id"] for r in mixture_sample(df, {"a": 0.5, "b": 0.5}, 80).collect()}
    b = {r["doc_id"] for r in
         mixture_sample(df.repartition(7), {"a": 0.5, "b": 0.5}, 80).collect()}
    assert a == b  # pure function of (seed, key): partition-invariant


def test_training_order_is_a_permutation(spark):
    """Every row appears exactly once; positions are contiguous 1..n within
    each shard; the permutation is a pure function of (seed, key)."""
    from kettle_jena_plugins_spark.operators.sampling import training_order

    df = _docs(spark, [(i, f"t{i}") for i in range(300)])
    out = training_order(df, n_shards=4, seed="e1").collect()
    assert len(out) == 300
    assert {r["doc_id"] for r in out} == set(range(300))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic under repartitioning
    again = training_order(df.repartition(11), n_shards=4, seed="e1").collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }
    # a different seed (epoch) produces a different order
    other = training_order(df, n_shards=4, seed="e2").collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in other} != {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }


def test_tfidf_semantics(spark):
    """A term present in every doc scores 0; a unique term outranks common
    ones; ties break by term ascending; short tokens are dropped."""
    from kettle_jena_plugins_spark.operators.text import tfidf_topk

    df = _docs(
        spark,
        [
            (1, "common words appear here zebra"),
            (2, "common words appear here"),
            (3, "common words appear here"),
            (4, "common az"),  # 'az' shorter than min_len -> dropped
        ],
    )
    out = tfidf_topk(df, k=5)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    # 'common' is in all 4 docs -> ln(4/4) = 0
    assert rows[(1, "common")]["tfidf"] == 0.0
    # doc 1's top term is its unique 'zebra'
    top1 = [r for r in out.filter(F.col("doc_id") == 1).collect() if r["rank"] == 1]
    assert top1[0]["term"] == "zebra"
    # 'az' never tokenized
    assert not [k for k in rows if k[1] == "az"]
    # doc 4 keeps only 'common'
    assert [k[1] for k in rows if k[0] == 4] == ["common"]


def test_importance_sample_rate_extremes_and_determinism(spark):
    from kettle_jena_plugins_spark.operators.sampling import importance_sample

    df = _docs(
        spark, [(i, 0.0 if i % 2 else 1.0) for i in range(100)],
        "doc_id long, rate double",
    )
    kept = importance_sample(df, "rate").collect()
    # rate 1.0 keeps everything (u < 1 always), rate 0.0 drops everything
    assert {r["doc_id"] for r in kept} == {i for i in range(100) if i % 2 == 0}
    again = {r["doc_id"] for r in
             importance_sample(df.repartition(9), "rate").collect()}
    assert again == {r["doc_id"] for r in kept}


def test_importance_sample_tracks_rate(spark):
    """At a mid rate the kept fraction lands near the rate (binomial)."""
    from kettle_jena_plugins_spark.operators.sampling import importance_sample

    df = _docs(
        spark, [(i, 0.3) for i in range(2000)], "doc_id long, rate double"
    )
    n = importance_sample(df, "rate").count()
    assert 450 < n < 750, n


def test_corpus_stats_exact_matches_python(spark):
    from kettle_jena_plugins_spark.operators.text import corpus_stats

    texts = [("a", "x" * n) for n in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)]
    df = _docs(
        spark,
        [(i, lang, t) for i, (lang, t) in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    row = corpus_stats(df).collect()[0]
    assert row["n_docs"] == 10
    assert row["mean_chars"] == 5.5
    assert row["p50_chars"] == 5.5  # linear interpolation between 5 and 6
    assert row["p95_chars"] == 9.55  # R-7: 1 + 0.95*9 = 9.55 -> between 9,10
    # approx variant stays within the digest tolerance of exact
    arow = corpus_stats(df, exact=False).collect()[0]
    assert abs(arow["p50_chars"] - 5.5) <= 1.0
    assert abs(arow["p95_chars"] - 9.55) <= 1.0


def test_unigram_nll_orders_common_vs_rare(spark):
    """A doc of corpus-common tokens scores lower nll than a doc of rare
    ones; values match the hand-computed unigram cross-entropy."""
    import math

    from kettle_jena_plugins_spark.operators.text import unigram_nll

    df = _docs(
        spark,
        [
            (1, "common common common"),
            (2, "common common common"),
            (3, "rare"),
            (4, "   "),  # zero tokens -> absent from output
        ],
    )
    out = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    assert set(out) == {1, 2, 3}
    total = 7  # 6x common + 1x rare
    assert out[1]["nll"] == round(-math.log(6 / total), 4)
    assert out[3]["nll"] == round(-math.log(1 / total), 4)
    assert out[3]["nll"] > out[1]["nll"]
    assert out[1]["n_lm_tokens"] == 3 and out[3]["n_lm_tokens"] == 1


def test_vocab_encode_ids_and_oov(spark):
    from kettle_jena_plugins_spark.operators.text import (
        build_vocab,
        encode_tokens,
    )

    df = _docs(
        spark,
        [
            (1, "aa bb aa cc"),
            (2, "bb aa"),
            (3, "zz aa"),  # zz falls outside a size-2 vocab -> OOV 0
            (4, ""),       # zero tokens -> absent
        ],
    )
    vocab = build_vocab(df, size=2)
    v = {r["term"]: r["id"] for r in vocab.collect()}
    # aa (4 hits) -> id 1, bb (2 hits) -> id 2; cc/zz excluded
    assert v == {"aa": 1, "bb": 2}
    enc = {r["doc_id"]: r for r in encode_tokens(df, vocab).collect()}
    assert set(enc) == {1, 2, 3}
    assert list(enc[1]["ids"]) == [1, 2, 1, 0]  # order preserved, cc -> OOV
    assert list(enc[2]["ids"]) == [2, 1]
    assert list(enc[3]["ids"]) == [0, 1]
    assert enc[1]["n_tokens"] == 4


def test_new_text_ops_plan_shapes(spark):
    """TF-IDF / NLL / encode must keep their scale shapes: corpus-count and
    vocab sides broadcast, no global Sort (order reassembled in-agg), and
    no cartesian product over the corpus."""
    from kettle_jena_plugins_spark.operators.text import (
        build_vocab,
        encode_tokens,
        tfidf_topk,
        unigram_nll,
    )

    df = _docs(spark, [(i, f"w{i % 7} common text row") for i in range(50)])
    tfidf_plan = tfidf_topk(df)._jdf.queryExecution().executedPlan().toString()
    # the single-row corpus count joins via broadcast NLJ, never shuffles
    assert "BroadcastNestedLoopJoin" in tfidf_plan
    nll_plan = unigram_nll(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in nll_plan
    enc = encode_tokens(df, build_vocab(df, size=5))
    enc_plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in enc_plan  # vocab side broadcast
    # token order comes from sort_array INSIDE the agg — no Sort operator
    # over the exploded corpus (window/global sorts would appear as 'Sort')
    assert "SortMergeJoin" not in enc_plan
