"""Training-data ops: ANN recall vs brute force, simhash near-dup pairs,
rolling fingerprint cross-check, multimodal plumbing shapes."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def embeds(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ann_recall_vs_brute_force(spark):
    from kettle_jena_plugins_spark.operators.similarity import (
        ann_topk,
        brute_force_topk,
    )

    em = embeds(spark).cache()
    q = em.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(em, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk(em, q, dim=64, k=5, n_planes=3, n_tables=6).collect()
    }
    em.unpersist()
    recall = len(exact & approx) / len(exact)
    # even on unclustered (near-random) vectors, 6-table OR-amplified LSH
    # recovers most true neighbors
    assert recall > 0.5, f"ANN recall too low: {recall}"
    assert all(qid in {a for a, _ in approx} for qid, _ in exact)


def test_ivf_recall_vs_brute_force(spark):
    from kettle_jena_plugins_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    em = embeds(spark).cache()
    q = em.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(em, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(em, q, k=5, n_centroids=8, nprobe=4).collect()
    }
    em.unpersist()
    recall = len(exact & approx) / len(exact)
    # probing half the cells of an 8-cell index recovers most true neighbors
    # even on near-random vectors
    assert recall > 0.5, f"IVF recall too low: {recall}"


def test_ivf_centroids_deterministic(spark):
    from kettle_jena_plugins_spark.operators.similarity import ivf_centroids

    em = embeds(spark)
    c1 = ivf_centroids(em, n_centroids=4, n_iters=1)
    c2 = ivf_centroids(em.repartition(7), n_centroids=4, n_iters=1)
    assert len(c1) == 4
    for a, b in zip(c1, c2):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))


def test_near_dup_blocked_matches_exact_and_never_collects(spark, monkeypatch):
    """The blocked all-pairs path must equal the per-pair expression path
    (including off-diagonal block pairs in either id order) and must never
    pull the corpus to the driver (the scale-safety contract)."""
    from pyspark.sql import DataFrame

    from kettle_jena_plugins_spark.operators.similarity import (
        near_dup_pairs,
        near_dup_pairs_blocked,
    )

    em = embeds(spark)
    exact = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in near_dup_pairs(em, threshold=0.3).collect()
    }

    def no_collect(self, *a, **k):
        raise AssertionError("blocked near-dup path collected to the driver")

    monkeypatch.setattr(DataFrame, "toPandas", no_collect)
    blocked_df = near_dup_pairs_blocked(em, threshold=0.3, n_blocks=4)
    blocked = {
        (r["id_a"], r["id_b"], r["cos"]) for r in blocked_df.collect()
    }
    assert blocked == exact


def test_near_dup_lsh_gated_subset_of_exact(spark):
    """The gated path must emit a SUBSET of the exact pairs (no false
    positives — exact verify) with reasonable recall."""
    from kettle_jena_plugins_spark.operators.similarity import (
        near_dup_pairs,
        near_dup_pairs_lsh_gated,
    )

    em = embeds(spark)
    exact = {
        (r["id_a"], r["id_b"]) for r in near_dup_pairs(em, threshold=0.3).collect()
    }
    gated = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs_lsh_gated(
            em, dim=64, threshold=0.3, n_planes=4, n_tables=8
        ).collect()
    }
    assert gated <= exact
    assert len(gated) / max(len(exact), 1) > 0.5


def test_near_dup_vectorized_empty_corpus(spark):
    from kettle_jena_plugins_spark.operators.similarity import (
        near_dup_pairs_vectorized,
    )

    empty = embeds(spark).filter(F.col("vec_id") < 0)
    assert near_dup_pairs_vectorized(empty).count() == 0


def test_simhash_pairs_finds_near_dups(spark):
    from kettle_jena_plugins_spark.operators.dedup import simhash_pairs

    d = docs(spark).select("doc_id", "text")
    # inject a near-duplicate: one doc with one word changed
    base = d.filter(F.col("doc_id") == 7).select(
        F.lit(9999).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    pairs = simhash_pairs(d.unionByName(base), max_hamming=6).collect()
    assert any({p["id_a"], p["id_b"]} == {7, 9999} for p in pairs)


def test_simhash_matches_hashlib_reference(spark):
    from kettle_jena_plugins_spark.operators.dedup import simhash60

    rows = docs(spark).limit(5).select("doc_id", "text").collect()
    got = {
        r["doc_id"]: r["sh"]
        for r in docs(spark)
        .limit(5)
        .select("doc_id", simhash60(F.col("text")).alias("sh"))
        .collect()
    }

    def ref(t):
        counts = [0] * 60
        for tok in t.split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for j in range(60):
                counts[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(60) if counts[j] > 0)

    for r in rows:
        assert got[r["doc_id"]] == ref(r["text"])


def test_rolling_fingerprint_matches_reference(spark):
    from kettle_jena_plugins_spark.operators.text import rolling_fingerprint

    rows = docs(spark).limit(5).select("doc_id", "text").collect()
    got = {
        r["doc_id"]: r["fp"]
        for r in docs(spark)
        .limit(5)
        .select("doc_id", rolling_fingerprint(F.col("text")).alias("fp"))
        .collect()
    }
    MOD, BASE = (1 << 61) - 1, 257
    for r in rows:
        h = 0
        for byt in r["text"].encode("utf-8"):
            h = (h * BASE + byt) % MOD
        assert got[r["doc_id"]] == h


def test_rolling_fingerprint_edge_cases(spark):
    """Vectorized path edge cases: null → null, empty → 0, multi-byte
    UTF-8 and long strings match the scalar Horner reference."""
    from kettle_jena_plugins_spark.operators.text import rolling_fingerprint

    vals = [None, "", "a", "héllo wörld ☃", "x" * 5000]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, t string")
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", rolling_fingerprint(F.col("t")).alias("fp")).collect()
    }
    MOD, BASE = (1 << 61) - 1, 257
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] is None
            continue
        h = 0
        for byt in v.encode("utf-8"):
            h = (h * BASE + byt) % MOD
        assert got[i] == h


def test_content_chunk_bounds_matches_scalar_reference(spark):
    """Content-defined chunking: the prefix-difference window hashes must
    equal the scalar per-window Horner hash, and boundary selection must
    match, incl. nulls / short / empty texts."""
    from kettle_jena_plugins_spark.operators.text import content_chunk_bounds

    k, bmask = 4, 15
    MOD0, BASE0 = (1 << 61) - 1, 257

    def whash(s):
        h = 0
        for b in s.encode("utf-8"):
            h = (h * BASE0 + b) % MOD0
        return h

    # brute-force a 4-letter window that IS a boundary, so at least one
    # row deterministically produces one
    import itertools

    magic = next(
        "".join(c)
        for c in itertools.product("abcdefghijklmnopqrstuvwxyz", repeat=4)
        if whash("".join(c)) & bmask == 0
    )
    vals = [None, "", "abc", f"xx{magic}yy", "héllo wörld ☃ " * 25]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, t string"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select(
            "i", content_chunk_bounds(k, bmask)(F.col("t")).alias("b")
        ).collect()
    }
    MOD, BASE = (1 << 61) - 1, 257
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] is None
            continue
        bs = v.encode("utf-8")
        want = []
        for s in range(len(bs) - k + 1):
            h = 0
            for b in bs[s : s + k]:
                h = (h * BASE + b) % MOD
            if h & bmask == 0:
                want.append(s + k)
        assert got[i] == want, f"row {i}"
    # the crafted row deterministically has its boundary at end position 6
    assert 6 in got[3]


def test_connected_components_chains_and_islands(spark):
    """Cluster resolution: a 5-node chain (labels must propagate multiple
    rounds), a triangle, an isolated pair — each collapses to its min id."""
    from kettle_jena_plugins_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            # chain 10-11-12-13-14 declared worst-case (high→low)
            (14, 13), (13, 12), (12, 11), (11, 10),
            (20, 21), (21, 22), (20, 22),  # triangle
            (30, 31),  # island pair
        ],
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_fingerprint_length_skew_bucketing(spark):
    """A long outlier among short rows routes through its own length
    bucket (no O(rows × outlier_len) padding) and both stay bit-exact."""
    from kettle_jena_plugins_spark.operators.text import (
        content_chunk_bounds,
        rolling_fingerprint,
    )

    # genuinely aperiodic (any short-period string has only period-many
    # distinct windows, which can all miss the boundary mask)
    long = "".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(3200)
    )  # 102,400 pseudo-random hex chars
    vals = ["short text"] * 20 + [long]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, t string"
    ).coalesce(1)  # one batch: short rows + outlier together
    rows = df.select(
        "i",
        rolling_fingerprint(F.col("t")).alias("fp"),
        content_chunk_bounds(8, 63)(F.col("t")).alias("b"),
    ).collect()
    got = {r["i"]: r for r in rows}
    MOD = (1 << 61) - 1
    for i in (0, 20):
        h = 0
        for byt in vals[i].encode("utf-8"):
            h = (h * 257 + byt) % MOD
        assert got[i]["fp"] == h
    assert len(got[20]["b"]) > 100  # ~100k bytes / mask 64 → many bounds
    assert got[0]["b"] == got[1]["b"]  # identical short rows agree


def test_multimodal_plumbing(spark):
    from kettle_jena_plugins_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        extract_features,
        frame_sample,
        media_repartition,
        synthesize_media_from_documents,
    )

    media = synthesize_media_from_documents(docs(spark))
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert all(len(r["feature"]) == 8 for r in rows)
    by_id = {r["media_id"]: r for r in rows}
    src = {r["media_id"]: r for r in media.collect()}
    some = next(iter(by_id))
    assert by_id[some]["n_bytes"] == len(src[some]["payload"])
    # images are single-frame; video/audio frames derived from bytes
    assert all(r["n_frames"] == 1 for r in rows if r["kind"] == "image")
    fs = frame_sample(media, every_n=3)
    assert fs.columns == ["media_id", "kind", "frame_idx"]
    assert fs.count() >= media.count()
    # the meta-sidecar path must agree with the probe path when the sidecar
    # carries the frame count — and it never touches the payload column
    import json as _json

    with_meta = media.withColumn(
        "meta",
        F.to_json(
            F.struct(
                F.when(F.col("kind") == "image", F.lit(1))
                .otherwise(1 + F.octet_length("payload") % 7)
                .alias("n_frames")
            )
        ),
    )
    fs_meta = frame_sample(with_meta, every_n=3, use_meta=True)
    assert sorted(map(tuple, fs_meta.collect())) == sorted(
        map(tuple, fs.collect())
    )
    assert media_repartition(media, target_bytes=10_000).rdd.getNumPartitions() >= 2


def test_frame_sample_meta_path_prunes_payload(spark, tmp_path):
    """With the frame count in the parquet sidecar, the meta path's scan
    must not read the payload column at all (column pruning)."""
    from kettle_jena_plugins_spark.operators.multimodal import (
        frame_sample,
        synthesize_media_from_documents,
    )

    media = synthesize_media_from_documents(docs(spark)).withColumn(
        "meta",
        F.to_json(
            F.struct(
                F.when(F.col("kind") == "image", F.lit(1))
                .otherwise(1 + F.octet_length("payload") % 7)
                .alias("n_frames")
            )
        ),
    )
    path = str(tmp_path / "media")
    media.write.parquet(path)
    stored = spark.read.parquet(path)
    fs_meta = frame_sample(stored, every_n=3, use_meta=True)
    plan = fs_meta._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "payload" not in read_schema
    fs_probe = frame_sample(stored, every_n=3)
    assert sorted(map(tuple, fs_meta.collect())) == sorted(
        map(tuple, fs_probe.collect())
    )


def test_exact_dedup_groups(spark):
    from kettle_jena_plugins_spark.operators.dedup import exact_dedup

    d = docs(spark).select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        # whitespace-variant duplicates must normalize together
        F.concat(F.lit("  "), F.col("text"), F.lit("\t")).alias("text"),
    )
    out = exact_dedup(d.unionByName(dup))
    assert out.filter(F.col("n_dups") == 2).count() == 10
    keeps = out.filter(F.col("n_dups") == 2).select("keep_id").collect()
    assert all(r["keep_id"] < 10 for r in keeps)  # keeps the lowest id


def test_ann_multiprobe_improves_recall(spark):
    """Query-side multi-probe must recover strictly more (or equal) true
    neighbors than single-probe at the same table count, and never hurt."""
    from kettle_jena_plugins_spark.operators.similarity import (
        ann_topk,
        brute_force_topk,
    )

    em = embeds(spark).cache()
    q = em.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(em, q, k=5).collect()
    }
    base = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk(em, q, dim=64, k=5, n_planes=4, n_tables=2).collect()
    }
    probed = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk(
            em, q, dim=64, k=5, n_planes=4, n_tables=2, probe_bits=2
        ).collect()
    }
    em.unpersist()
    r_base = len(exact & base) / len(exact)
    r_probe = len(exact & probed) / len(exact)
    assert r_probe >= r_base
    # at only 2 tables the probes must add real recall on random vectors
    assert r_probe > r_base + 0.05, (r_base, r_probe)


def test_pq_encode_zero_shuffle_and_code_range(spark):
    """PQ encoding must be a pure narrow map (codebooks are literals — no
    join, no Exchange in the plan) emitting m codes in [0, ksub)."""
    from kettle_jena_plugins_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    em = embeds(spark)
    books = pq_codebooks(em, m=8, ksub=8, n_iters=0, seed_hash="md5")
    assert len(books) == 8 and all(len(b) == 8 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # dsub = 64/8
    codes = pq_encode(em, books)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = codes.collect()
    assert all(len(r["code"]) == 8 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["code"])


def test_pq_codebooks_deterministic_and_refinable(spark):
    from kettle_jena_plugins_spark.operators.similarity import pq_codebooks

    em = embeds(spark).cache()
    a = pq_codebooks(em, m=4, ksub=4, n_iters=0, seed_hash="md5")
    b = pq_codebooks(em, m=4, ksub=4, n_iters=0, seed_hash="md5")
    assert a == b  # parallelism-independent seeding
    refined = pq_codebooks(em, m=4, ksub=4, n_iters=1, seed_hash="md5")
    em.unpersist()
    assert refined != a  # Lloyd iteration actually moved the centroids
    assert len(refined) == 4 and all(len(bk) == 4 for bk in refined)


def test_pq_adc_lossless_when_corpus_is_codebook(spark):
    """When every corpus vector IS a seed vector (corpus size == ksub),
    encoding is lossless and the ADC distance equals the exact squared-L2
    distance — the strongest end-to-end check of codebook construction,
    encoding, distance tables, and the fold order."""
    from kettle_jena_plugins_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    em = embeds(spark).limit(8).cache()
    books = pq_codebooks(em, m=8, ksub=8, n_iters=0, seed_hash="md5")
    codes = {r["vec_id"]: list(r["code"]) for r in pq_encode(em, books).collect()}
    vecs = {r["vec_id"]: list(r["embedding"]) for r in em.collect()}
    # every vector decodes back to itself
    for vid, code in codes.items():
        decoded = [x for j, c in enumerate(code) for x in books[j][c]]
        assert decoded == pytest.approx(vecs[vid], abs=1e-12)
    got = pq_adc_topk(em, em, books, k=7).collect()
    em.unpersist()
    for r in got:
        q, n = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        exact = sum((a - b) ** 2 for a, b in zip(q, n))
        assert r["adist"] == pytest.approx(exact, abs=1e-3)


def test_pq_adc_recall_on_clustered_vectors(spark):
    """On clustered data (the realistic embedding shape), the ADC shortlist
    must recover the true same-cluster L2 neighbors. Pure-random vectors are
    PQ's worst case (distances concentrate, 24-bit codes cannot separate
    them) — cluster structure is what PQ exploits."""
    import random as pyrandom

    from kettle_jena_plugins_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
    )

    rng = pyrandom.Random(7)
    dim, n_clusters, per = 64, 8, 15
    centers = [
        [rng.gauss(0, 1.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0, 0.08) for x in c]))
    em = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = em.filter(F.col("vec_id") < 8)  # one query per cluster
    books = pq_codebooks(em, m=8, ksub=8, n_iters=1)
    got = pq_adc_topk(em, q, books, k=10).collect()
    em.unpersist()
    hits = sum(
        1 for r in got if r["neighbor_id"] % n_clusters == r["query_id"] % n_clusters
    )
    # 10 shortlisted per query x 8 queries; >=80% must be true cluster-mates
    assert hits / len(got) >= 0.8, hits / len(got)


def test_quantize_int8_roundtrip_and_plan(spark):
    """Codes bounded to [-127,127]; dequantized error <= scale/2 per
    component; zero vectors round-trip exactly; no Exchange in the plan."""
    from kettle_jena_plugins_spark.operators.similarity import quantize_int8

    rows = [
        (1, [0.5, -1.27, 0.001, 1.27]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-2.54, 2.54, 1.27, -0.01]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantize_int8(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["vec_id"]: r for r in out.collect()}
    assert got[2]["scale"] == 0.0 and list(got[2]["codes"]) == [0, 0, 0, 0]
    for vid, vec in [(1, rows[0][1]), (3, rows[2][1])]:
        scale = max(abs(x) for x in vec) / 127.0
        codes = got[vid]["codes"]
        assert all(-127 <= c <= 127 for c in codes)
        for x, c in zip(vec, codes):
            assert abs(c * scale - x) <= scale / 2 + 1e-12


def test_pq_rerank_recovers_exact_order_within_shortlist(spark):
    """Re-ranked results must equal the exact-L2 ranking restricted to the
    ADC shortlist — and on clustered data, match the true global top-k."""
    import random as pyrandom

    from kettle_jena_plugins_spark.operators.similarity import (
        pq_codebooks,
        pq_rerank_topk,
    )

    rng = pyrandom.Random(11)
    dim, n_clusters, per = 64, 8, 15
    centers = [[rng.gauss(0, 1.0) for _ in range(dim)] for _ in range(n_clusters)]
    rows = [
        (i, [x + rng.gauss(0, 0.05) for x in centers[i % n_clusters]])
        for i in range(n_clusters * per)
    ]
    em = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = em.filter(F.col("vec_id") < 4)
    books = pq_codebooks(em, m=8, ksub=8, n_iters=1)
    got = pq_rerank_topk(em, q, books, k=5, shortlist=30).collect()
    em.unpersist()
    vecs = dict(rows)
    for r in got:
        exact = sum((a - b) ** 2 for a, b in
                    zip(vecs[r["query_id"]], vecs[r["neighbor_id"]]))
        assert abs(r["d2"] - exact) < 1e-3  # re-rank distances are exact
        # with tight clusters every re-ranked hit is a true cluster-mate
        assert r["neighbor_id"] % n_clusters == r["query_id"] % n_clusters
    # ranks are 1..5 per query, distances non-decreasing in rank
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        assert all(a["d2"] <= b["d2"] for a, b in zip(rs, rs[1:]))


def test_fuzzy_pairs_typos_and_blocking(spark):
    """Single-character typos pair up at their true edit distance; pairs
    differing in the blocking prefix are (by design) not proposed; far
    strings never verify."""
    from kettle_jena_plugins_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumped"),   # dist 2 (s -> ed)
            (3, "the quick brown cat jumps"),    # dist 3 from #1 -> out
            (4, "The  Quick brown fox jumps"),   # normalizes to #1 -> dist 0
            (5, "xhe quick brown fox jumps"),    # dist 1 BUT prefix differs
            (6, "something entirely different"),
        ],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_pairs(df, max_dist=2).collect()}
    assert got[(1, 2)] == 2
    assert got[(1, 4)] == 0
    assert got[(2, 4)] == 2
    assert (1, 3) not in got          # distance 3 > max_dist
    assert (1, 5) not in got          # blocking recall miss, documented
    assert not any(6 in k for k in got)


def test_knn_label_eval_on_clustered_labels(spark):
    """With tight labeled clusters, kNN majority recovers the true label;
    vote counts are bounded by k and ties break deterministically."""
    import random as pyrandom

    from kettle_jena_plugins_spark.operators.similarity import knn_label_eval

    rng = pyrandom.Random(5)
    dim, n_labels, per = 16, 4, 10
    centers = [[rng.gauss(0, 1.0) for _ in range(dim)] for _ in range(n_labels)]
    rows = [
        (i, [x + rng.gauss(0, 0.05) for x in centers[i % n_labels]],
         f"L{i % n_labels}")
        for i in range(n_labels * per)
    ]
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).cache()
    out = knn_label_eval(em, em.filter(F.col("vec_id") < 4), k=5).collect()
    em.unpersist()
    assert len(out) == 4
    for r in out:
        assert r["correct"] is True
        assert r["pred_label"] == r["true_label"]
        assert 1 <= r["n_votes"] <= 5


def test_ivfpq_recall_on_clustered_vectors(spark):
    """On clustered data (the realistic embedding shape — pure-random
    vectors are PQ's worst case) the IVF-gated ADC top-k must recover true
    cluster-mates at the same bar as the ungated ADC scan, while reading
    only nprobe cells per query."""
    import random as pyrandom

    from kettle_jena_plugins_spark.operators.similarity import ivfpq_topk

    rng = pyrandom.Random(7)
    dim, n_clusters, per = 64, 8, 15
    centers = [
        [rng.gauss(0, 1.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0, 0.08) for x in c]))
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    q = em.filter(F.col("vec_id") < 8)  # one query per cluster
    got = ivfpq_topk(
        em, q, k=10, n_centroids=8, nprobe=2, m=8, ksub=8, n_iters=1
    ).collect()
    em.unpersist()
    hits = sum(
        1
        for r in got
        if r["neighbor_id"] % n_clusters == r["query_id"] % n_clusters
    )
    # 10 per query x 8 queries through a 2-of-8-cell gate: >=80% must be
    # true cluster-mates (matching the ungated ADC bar)
    assert hits / len(got) >= 0.8, hits / len(got)


def test_ivfpq_equals_ungated_adc_when_probing_every_cell(spark):
    """Gating invariant: with nprobe == n_centroids the IVF gate admits the
    whole corpus, so IVF-PQ must reproduce pq_adc_topk exactly (same
    codebooks, same ADC distances, same ranking)."""
    from kettle_jena_plugins_spark.operators.similarity import (
        ivfpq_topk,
        pq_adc_topk,
        pq_codebooks,
    )

    em = embeds(spark).cache()
    q = em.filter(F.col("vec_id") % 20 == 0)
    books = pq_codebooks(em, m=8, ksub=8, n_iters=0, seed_hash="md5")
    ungated = {
        (r["query_id"], r["neighbor_id"], r["adist"], r["rank"])
        for r in pq_adc_topk(em, q, books, k=5).collect()
    }
    gated = {
        (r["query_id"], r["neighbor_id"], r["adist"], r["rank"])
        for r in ivfpq_topk(
            em, q, k=5, n_centroids=4, nprobe=4, codebooks=books,
            seed_hash="md5",
        ).collect()
    }
    em.unpersist()
    assert gated == ungated


def test_connected_components_diameter_worst_case(spark):
    """Diameter-shaped worst case: one long path (min label travels one
    hop per round — the slowest shape min-propagation admits) plus an
    island; every node must still land on the path's minimum."""
    from kettle_jena_plugins_spark.operators.dedup import (
        connected_components,
    )

    n = 40  # diameter 39 < max_iter=50
    path = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(
        path + [(1000, 1001)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert all(got[i] == 0 for i in range(n))
    assert got[1000] == got[1001] == 1000


def test_lloyd_refinement_avoids_catalyst_hof(spark, monkeypatch):
    """VERDICT-r3 item 5 contract: the Lloyd-refined path must score
    assignments in numpy (mapInPandas), never through the per-element
    Catalyst higher-order expressions (~70µs/pair) — monkeypatching the
    HOF builders to explode proves they are no longer on the refined
    path."""
    import kettle_jena_plugins_spark.operators.similarity as sim

    def boom(*a, **k):
        raise AssertionError("Catalyst HOF scoring used in refined path")

    monkeypatch.setattr(sim, "_centroid_scores", boom)
    cent = sim.ivf_centroids(embeds(spark), n_centroids=4, n_iters=2)
    assert len(cent) == 4 and len(cent[0]) == 64

    monkeypatch.setattr(sim, "_pq_code_expr", boom)
    monkeypatch.setattr(sim, "_sub_sq_l2", boom)
    books = sim.pq_codebooks(embeds(spark), m=8, ksub=4, n_iters=2)
    assert len(books) == 8 and len(books[0]) == 4


def test_ivfpq_rerank_recovers_exact_order(spark):
    """Gated shortlist + exact re-rank: within the shortlist the ranking
    must be exact squared-L2 (monotone d2 per query, true cluster-mates
    first on clustered data)."""
    import random as pyrandom

    from kettle_jena_plugins_spark.operators.similarity import (
        ivfpq_rerank_topk,
    )

    rng = pyrandom.Random(11)
    dim, n_clusters, per = 64, 8, 15
    centers = [
        [rng.gauss(0, 1.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0, 0.08) for x in c]))
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    q = em.filter(F.col("vec_id") < 4)
    got = ivfpq_rerank_topk(
        em, q, k=5, shortlist=20, n_centroids=8, nprobe=2, n_iters=1
    ).collect()
    em.unpersist()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["d2"]))
    for qid, lst in by_q.items():
        lst.sort()
        assert [r for r, _ in lst] == list(range(1, len(lst) + 1))
        d2s = [d for _, d in lst]
        assert d2s == sorted(d2s)  # exact distances, monotone in rank
    hits = sum(
        1
        for r in got
        if r["neighbor_id"] % n_clusters == r["query_id"] % n_clusters
    )
    assert hits / len(got) >= 0.8


def test_ann_index_lifecycle_build_probe_append(spark, tmp_path):
    """Persisted IVF-PQ index: build → probe must equal the in-memory
    gated scan with the same quantizers; append folds new vectors in
    without re-encoding history; the probe scan is pruned to the probed
    cells."""
    from kettle_jena_plugins_spark.operators.similarity import (
        ann_index_topk,
        append_to_ann_index,
        build_ann_index,
        ivfpq_topk,
    )

    em = embeds(spark).cache()
    path = str(tmp_path / "annidx")
    build_ann_index(
        em, path, n_centroids=8, m=8, ksub=8, n_iters=0, seed_hash="md5"
    )
    q = em.filter(F.col("vec_id") % 20 == 0)
    from_index = {
        (r["query_id"], r["neighbor_id"], r["adist"], r["rank"])
        for r in ann_index_topk(q, path, k=5, nprobe=4).collect()
    }
    in_memory = {
        (r["query_id"], r["neighbor_id"], r["adist"], r["rank"])
        for r in ivfpq_topk(
            em, q, k=5, n_centroids=8, nprobe=4, n_iters=0, seed_hash="md5"
        ).collect()
    }
    assert from_index == in_memory

    # append: shifted copies of the first 3 vectors become new neighbors
    new = em.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    append_to_ann_index(new, path)
    after = ann_index_topk(q, path, k=5, nprobe=8).collect()
    ids = {r["neighbor_id"] for r in after}
    assert any(i >= 100000 for i in ids)  # appended rows are probe-visible

    # cell pruning: the probed-cid filter reaches the scan
    plan = (
        ann_index_topk(q, path, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # static partition pruning reaches the code scan (verified plan shape:
    # `PartitionFilters: [cid#N IN (...)]` + ReadSchema without the
    # full-precision vector column)
    assert "PartitionFilters: [cid#" in plan and " IN (" in plan
    assert "embedding" not in plan.split("FileScan parquet")[1][:400]

    # dimension guard: a batch/query whose vectors don't match the
    # persisted codebooks' dim must raise, not silently corrupt ADC
    # distances (meta.json persists dim = m * dsub at build time)
    import json

    with open(f"{path}/meta.json") as f:
        assert json.load(f)["dim"] == 64
    wrong = em.filter(F.col("vec_id") < 2).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.slice("embedding", 1, 7).alias("embedding"),
    )
    with pytest.raises(ValueError, match="dim"):
        append_to_ann_index(wrong, path)
    with pytest.raises(ValueError, match="dim"):
        ann_index_topk(wrong, path, k=2, nprobe=2)
    em.unpersist()


def test_near_dup_vectorized_collect_guard(spark):
    """The small-corpus fast path must refuse to driver-collect an
    oversized corpus (scale-safe default is the blocked path)."""
    from kettle_jena_plugins_spark.operators.similarity import (
        near_dup_pairs_vectorized,
    )

    em = embeds(spark)
    with pytest.raises(ValueError, match="max_collect_rows"):
        near_dup_pairs_vectorized(em, max_collect_rows=10)
    # within the limit the path still works
    assert (
        near_dup_pairs_vectorized(
            em.limit(20), threshold=0.5, max_collect_rows=100
        ).count()
        >= 0
    )
