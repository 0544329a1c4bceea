"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. All built-ins
  (zip_with + aggregate in double precision) — JVM-side, no Python.
- LSH-bucketed ANN (random hyperplanes): the scale path. Planes are derived
  from md5 (portable & deterministic); vectors sharing a hyperplane sign
  bucket are the only candidates — candidate count is bucket-bounded, not
  O(n_query · n_corpus).

At 100 TB the brute-force path is a cross-join only over a broadcast query
set (queries ≪ corpus); the ANN path shuffles on bucket id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query (query_id, neighbor_id, cos, rank).

    The query side is broadcast (small); ranking uses the ROUNDED cosine with
    id tie-break so results are reproducible across engines/float orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2norm(F.col(vec_col)).alias("cn"),
    )
    # norms are computed once per vector pre-join (not per pair): identical
    # float values, 1/3 of the per-pair aggregate work
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
            round_dp,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_label_eval(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN label evaluation — the harness side of similarity search: each
    query is classified by the majority label of its exact top-k cosine
    neighbors (ties → smallest label), compared to its own label. The
    standard embedding-quality probe (are same-label points mutual
    neighbors?) run before trusting an index for retrieval curation.

    Plan shape: brute_force_topk's broadcast cross-score (queries ≪
    corpus), a broadcast label join, one (query, label) vote agg, one
    per-query argmax window over ≤ k·|queries| vote rows. Returns
    (query_id, pred_label, n_votes, true_label, correct)."""
    topk = brute_force_topk(corpus, queries, k, id_col, vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nl")
    )
    votes = (
        topk.join(F.broadcast(labels), "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("nl")
    )
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("nl").alias("pred_label"), "n_votes")
    )
    truth = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        "pred_label",
        "n_votes",
        "true_label",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).
    Exact O(n²) formulation — at scale, gate through lsh_buckets first."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2norm(F.col(vec_col)).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2norm(F.col(vec_col)).alias("nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
            round_dp,
        ).alias("cos"),
    ).filter(F.col("cos") >= threshold)


def _round_half_up(x, dp: int):
    """HALF_UP rounding on the sign-adjusted value — matches Spark's F.round
    (BigDecimal HALF_UP) and DuckDB's round; numpy's np.round is
    half-to-even, which diverges at exact tie values."""
    import numpy as np

    scale = 10.0 ** dp
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def near_dup_pairs_vectorized(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
    max_collect_rows: int = 1_000_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via Arrow-batched numpy matmul:
    the corpus matrix (normalized, float64) is broadcast to executors; each
    Arrow batch computes batch × corpusᵀ with BLAS and emits only pairs with
    id_a < id_b and rounded cos ≥ threshold. ~100× the throughput of the
    per-pair expression path (Catalyst higher-order functions are
    interpreted per element).

    SMALL-CORPUS fast path: collects the whole corpus to the driver
    (n·dim·8 bytes must fit driver + executor memory). The scale-safe
    default for unknown corpus sizes is near_dup_pairs_blocked — same exact
    result, no driver collect, bounded task memory. To keep an unknown
    corpus from silently reaching the driver collect, corpora over
    ``max_collect_rows`` (default 1M ≈ tens of MB at typical dims) raise —
    pass a higher limit only when the driver is provisioned for it."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    n = df.count()
    if n > max_collect_rows:
        raise ValueError(
            f"near_dup_pairs_vectorized collects the corpus to the driver "
            f"({n} rows > max_collect_rows={max_collect_rows}); use "
            "near_dup_pairs_blocked (exact, no collect) or raise the limit "
            "explicitly"
        )
    pdf = df.select(id_col, vec_col).toPandas()
    if pdf.empty:
        return spark.createDataFrame([], "id_a long, id_b long, cos double")
    ids = pdf[id_col].to_numpy()
    m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, m))

    def score(batches):
        ids_c, mc = bc.value
        for batch in batches:
            if batch.empty:
                continue
            v = np.vstack(batch[vec_col].to_numpy()).astype("float64")
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            s = _round_half_up(v @ mc.T, round_dp)
            aid = batch[id_col].to_numpy()
            keep = (s >= threshold) & (aid[:, None] < ids_c[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": aid[ai], "id_b": ids_c[bj], "cos": s[ai, bj]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        score, schema="id_a long, id_b long, cos double"
    )


def near_dup_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine near-dup, scale-safe: the corpus is hashed into
    n_blocks blocks; every unordered block pair (i ≤ j) becomes one
    grouped-apply task that matmuls block_i × block_jᵀ in numpy and keeps
    pairs with id_a < id_b and rounded cos ≥ threshold. Identical output to
    near_dup_pairs / near_dup_pairs_vectorized.

    Scale shape: nothing is collected to the driver and nothing is broadcast
    O(corpus); each row is shuffled ~n_blocks+1 times (once per partner
    block) and task memory is 2·(n/n_blocks)·dim·8 bytes — pick
    n_blocks ≈ n·dim·8 / (500 MB) so two blocks fit an executor core. The
    O(n²) multiply is inherent to exact all-pairs; for approximate gating at
    much larger n, bucket with lsh_buckets_np first and exact-score only
    candidates (the ann_topk pattern)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    src = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
    # one row per (block-pair, side): side 0 carries block bi, side 1 block
    # bj — a union instead of a cogroup of two self-join branches (same one
    # shuffle, no ambiguous-self-join lineage)
    sides = spark.createDataFrame(
        [
            (i * n_blocks + j, b, s)
            for i in range(n_blocks)
            for j in range(i, n_blocks)
            for b, s in ((i, 0), (j, 1))
        ],
        "pid int, blk_m int, side int",
    )
    tagged = src.join(
        F.broadcast(sides), F.col("blk") == F.col("blk_m")
    ).select("pid", "side", "id", "v")

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["side"] == 0]
        rpdf = pdf[pdf["side"] == 1]
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        la = np.vstack(lpdf["v"].to_numpy()).astype("float64")
        ra = np.vstack(rpdf["v"].to_numpy()).astype("float64")
        la /= np.linalg.norm(la, axis=1, keepdims=True)
        ra /= np.linalg.norm(ra, axis=1, keepdims=True)
        s = _round_half_up(la @ ra.T, round_dp)
        lid = lpdf["id"].to_numpy()
        rid = rpdf["id"].to_numpy()
        (pid,) = key
        diagonal = (pid // n_blocks) == (pid % n_blocks)
        if diagonal:
            # left == right: each unordered pair appears twice — keep the
            # lid < rid orientation only
            keep = (s >= threshold) & (lid[:, None] < rid[None, :])
        else:
            # disjoint blocks: each unordered pair appears exactly once,
            # in arbitrary id order — keep all, orient below
            keep = s >= threshold
        ai, bj = np.nonzero(keep)
        return pd.DataFrame(
            {
                "id_a": np.minimum(lid[ai], rid[bj]),
                "id_b": np.maximum(lid[ai], rid[bj]),
                "cos": s[ai, bj],
            }
        )

    return tagged.groupby("pid").applyInPandas(
        score, schema="id_a long, id_b long, cos double"
    )


def near_dup_pairs_lsh_gated(
    df: DataFrame,
    dim: int,
    threshold: float = 0.98,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """APPROXIMATE near-dup pairs: hyperplane-LSH proposes (pairs sharing a
    bucket in ANY of n_tables tables), exact rounded cosine verifies — the
    propose-then-verify pattern (minhash_candidates → jaccard_verify) on
    embeddings. Recall < 1 by design (pairs colliding in no table are
    missed); candidates are bucket-bounded so cost scales with near-dup
    density instead of n². Deterministic md5-derived planes → the DuckDB
    oracle reproduces the exact candidate set and scores."""
    b = lsh_buckets_np(df, dim, n_planes, n_tables, id_col, vec_col)
    b2 = (
        b.withColumnRenamed("id", "id_b")
        .withColumnRenamed("table", "t2")
        .withColumnRenamed("bucket", "k2")
    )
    cand = (
        b.join(
            b2,
            (F.col("table") == F.col("t2"))
            & (F.col("bucket") == F.col("k2"))
            & (F.col("id") < F.col("id_b")),
        )
        .select(F.col("id").alias("id_a"), "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2norm(F.col(vec_col)).alias("na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2norm(F.col(vec_col)).alias("nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                round_dp,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _plane_weight(p: int, d: int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1): md5-derived,
    computed driver-side into a plain float literal (planes are constants —
    emitting md5/conv expression trees made Catalyst fold thousands of
    nodes per query; a literal is free)."""
    import hashlib

    h = int(hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[:8], 16)
    return F.lit((h % 20011) / 10005.5 - 1.0)


def lsh_bucket(
    vec_col: Column, dim: int, n_planes: int = 12, table: int = 0
) -> Column:
    """Sign-bit bucket id from n_planes deterministic hyperplanes (plane set
    disjoint per hash table — OR-amplification across tables)."""
    bits = []
    for p in range(n_planes):
        d_ = dot(
            vec_col,
            F.array(*[_plane_weight(table * 1000 + p, d) for d in range(dim)]),
        )
        bits.append(F.when(d_ >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_buckets(
    vec_col: Column, dim: int, n_planes: int, n_tables: int
) -> Column:
    """array of (table, bucket) structs — one bucket per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(vec_col, dim, n_planes, table=t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def _centroid_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<s,cid>> of cosine(vec, centroid) — centroids are
    driver-side float literals (tiny: n_centroids × dim), so assignment is a
    narrow map over the scan: NO join, NO shuffle, broadcast-free."""
    import math

    scored = []
    for cid, c in enumerate(centroids):
        lit_vec = F.array(*[F.lit(float(x)) for x in c])
        norm = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        scored.append(
            F.struct(
                (dot(vec, lit_vec) / (l2norm(vec) * F.lit(norm))).alias("s"),
                F.lit(cid).alias("cid"),
            )
        )
    return F.array(*scored)


def seed_rows(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_hash: str = "xxhash64",
) -> list:
    """The k corpus rows with smallest hash(id) — the shared deterministic
    seed set for ivf_centroids AND pq_codebooks (both select a prefix of
    the same hash ordering, so one corpus scan seeds both quantizers:
    collect max(n_centroids, ksub) rows once and pass the list in)."""
    h = (
        F.md5(F.col("i").cast("string").cast("binary"))
        if seed_hash == "md5"
        else F.xxhash64(F.col("i"))
    )
    return (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("h", h)
        .orderBy("h", "i")
        .limit(k)
        .collect()
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_hash: str = "xxhash64",
    seeds: list | None = None,
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seeds = the n_centroids corpus
    vectors with smallest hash(id) (stable at any parallelism), refined
    by Lloyd iterations expressed as DataFrame aggs (posexplode → per-(cid,
    dim) avg) — the only full-corpus pass per iteration is one groupBy.

    seed_hash="md5" ranks seeds by the md5 hex of the id string — portable
    to engines without Spark's xxhash64 (the DuckDB oracle reproduces the
    exact seed set this way); "xxhash64" is the cheaper default. Pass a
    precollected ``seeds`` list (seed_rows) to share the seed scan with
    pq_codebooks."""
    if seeds is None:
        seeds = seed_rows(corpus, n_centroids, id_col, vec_col, seed_hash)
    if len(seeds) < n_centroids:
        raise ValueError(
            f"need {n_centroids} seed rows, got {len(seeds)}"
        )
    cent = [[float(x) for x in r["v"]] for r in seeds[:n_centroids]]
    if n_iters <= 0:
        return cent
    # Lloyd refinement, numpy-vectorized (VERDICT r3: the Catalyst-HOF
    # assignment costs ~70µs/pair and won't survive 100×): each iteration
    # is ONE mapInPandas pass doing a batch matmul assignment + per-batch
    # partial (sum, count) per cell — k·P tiny partial rows reach the
    # driver, never vectors. The corpus projection is cached across
    # iterations. Means are parallelism-stable to FP-addition rounding
    # (partial-sum order follows partitioning); seeds are exactly stable.
    import numpy as np
    import pandas as pd

    vecs = corpus.select(F.col(vec_col).alias("v")).cache()
    try:
        for _ in range(n_iters):
            C = np.asarray(cent, dtype=np.float64)  # (k, dim)
            Cn = np.linalg.norm(C, axis=1)
            Cn[Cn == 0.0] = 1.0
            k, dim = C.shape

            def partials(it, C=C, Cn=Cn, k=k, dim=dim):
                for pdf in it:
                    if not len(pdf):
                        continue
                    V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                    Vn = np.linalg.norm(V, axis=1, keepdims=True)
                    Vn[Vn == 0.0] = 1.0
                    sims = (V @ C.T) / (Vn * Cn)
                    # ties to the LARGEST cid (array_max over struct<s,cid>
                    # parity with the HOF formulation)
                    cid = k - 1 - np.argmax(sims[:, ::-1], axis=1)
                    sums = np.zeros((k, dim))
                    np.add.at(sums, cid, V)
                    cnt = np.bincount(cid, minlength=k)
                    nz = np.flatnonzero(cnt)
                    yield pd.DataFrame(
                        {
                            "cid": nz.astype("int32"),
                            "cnt": cnt[nz].astype("int64"),
                            "s": list(sums[nz]),
                        }
                    )

            rows = vecs.mapInPandas(
                partials, schema="cid int, cnt long, s array<double>"
            ).collect()
            sums = np.zeros((k, dim))
            cnts = np.zeros(k, dtype=np.int64)
            for r in rows:
                sums[r["cid"]] += np.asarray(r["s"])
                cnts[r["cid"]] += r["cnt"]
            for c in range(k):
                if cnts[c]:
                    cent[c] = [float(x) for x in sums[c] / cnts[c]]
    finally:
        vecs.unpersist()
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are binned to their nearest
    coarse centroid (narrow map — centroid literals, no shuffle); each query
    probes its nprobe nearest cells and brute-forces only those candidates.
    Candidate volume ≈ corpus · nprobe / n_centroids. Pass a precomputed
    `centroids` list to reuse the index across query batches."""
    cent = centroids or ivf_centroids(
        corpus, n_centroids, n_iters, id_col, vec_col
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2norm(F.col(vec_col)).alias("cn"),
        F.array_max(_centroid_scores(F.col(vec_col), cent))["cid"].alias("cid"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2norm(F.col(vec_col)).alias("qn"),
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(
                        F.array_sort(_centroid_scores(F.col(vec_col), cent))
                    ),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    )
    cand = (
        c.join(F.broadcast(q), on="cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv", "qn", "cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
            ).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """The full compressed-index recipe: ADC over PQ codes produces a
    ``shortlist`` of candidates per query (scanning only m-byte codes),
    then ONLY those shortlist·|queries| rows re-join their full-precision
    vectors for an exact squared-L2 re-rank. At 100 TB this is the plan
    that makes PQ usable end to end — the expensive vector column is read
    for shortlist·queries rows instead of the whole corpus, and the
    re-rank join is broadcast on the (tiny) candidate set's query side."""
    cand = pq_adc_topk(
        corpus, queries, codebooks, k=shortlist, id_col=id_col,
        vec_col=vec_col, codes=codes,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cv"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(d2, 4).alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127,
    code = round(x / scale) ∈ [-127, 127] — a 4× embedding-store shrink
    (8× vs float64) with ~0.4% worst-case per-component error, the standard
    compression stage before shipping an embedding corpus to an ANN
    service. Zero-vector rows get scale 0 and all-zero codes (exactly
    recoverable). Pure narrow map: no shuffle, no UDF, whole-stage
    codegen; composable with pq_encode (PQ for search, int8 for exact
    re-rank storage)."""
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(xd(x)))
    ) / F.lit(127.0)
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.round(scale, 6).alias("scale"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(xd(x) / safe).cast("int"),
        ).alias("codes"),
    )


def _plane_matrix(dim: int, n_planes: int, n_tables: int):
    """(n_tables, n_planes, dim) float64 numpy matrix of the deterministic
    md5-derived hyperplanes — identical values to _plane_weight."""
    import hashlib

    import numpy as np

    w = np.empty((n_tables, n_planes, dim), dtype="float64")
    for t in range(n_tables):
        for p in range(n_planes):
            for d_ in range(dim):
                h = int(
                    hashlib.md5(
                        f"plane:{t * 1000 + p}:{d_}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                w[t, p, d_] = (h % 20011) / 10005.5 - 1.0
    return w


def lsh_buckets_np(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) via one vectorized numpy matmul per Arrow batch —
    the plane matrix is broadcast. Replaces the pure-expression formulation,
    whose n_tables×n_planes×dim literal tree cost ~8 s of one-time Janino
    codegen per session and evaluated the dot products interpreted."""
    import numpy as np
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(
        _plane_matrix(dim, n_planes, n_tables)
    )
    weights = (1 << np.arange(n_planes)).astype("int64")

    def assign(batches):
        w = bc.value
        for b in batches:
            if not len(b):  # empty Arrow batch: vstack would raise
                continue
            v = np.vstack(b[vec_col].to_numpy()).astype("float64")
            signs = np.einsum("nd,tpd->ntp", v, w) >= 0  # (n, tables, planes)
            buckets = (signs * weights).sum(axis=2)  # (n, tables)
            n = len(b)
            yield pd.DataFrame(
                {
                    "id": np.repeat(b[id_col].to_numpy(), n_tables),
                    "table": np.tile(np.arange(n_tables), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema="id long, table int, bucket long"
    )


def lsh_buckets_np_multiprobe(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    probe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe bucket assignment (query side): besides the base bucket,
    emit per table the buckets reached by flipping each of the
    `probe_bits` LOWEST-MARGIN hyperplane signs — the planes the vector
    sits closest to are the likeliest to disagree with a true neighbor's
    signs. Raises recall without adding hash tables (each extra table costs
    a full corpus index copy; extra probes cost only query-side candidate
    lookups)."""
    import numpy as np
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(
        _plane_matrix(dim, n_planes, n_tables)
    )
    weights = (1 << np.arange(n_planes)).astype("int64")

    n_probe = min(probe_bits, n_planes)

    def assign(batches):
        w = bc.value
        for b in batches:
            if not len(b):  # empty Arrow batch: vstack would raise
                continue
            v = np.vstack(b[vec_col].to_numpy()).astype("float64")
            margins = np.einsum("nd,tpd->ntp", v, w)  # (n, tables, planes)
            base = ((margins >= 0) * weights).sum(axis=2)  # (n, tables)
            n = len(b)
            # lowest-|margin| planes first; flip masks for the n_probe
            # nearest planes per (row, table) — all array ops, no row loop
            order = np.argsort(np.abs(margins), axis=2)[:, :, :n_probe]
            flips = np.int64(1) << order.astype("int64")  # (n, T, P)
            allb = np.concatenate(
                [base[:, :, None], base[:, :, None] ^ flips], axis=2
            )  # (n, T, P+1): base bucket then its probes
            yield pd.DataFrame(
                {
                    "id": np.repeat(
                        b[id_col].to_numpy(), n_tables * (n_probe + 1)
                    ),
                    "table": np.tile(
                        np.repeat(np.arange(n_tables), n_probe + 1), n
                    ),
                    "bucket": allb.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema="id long, table int, bucket long"
    )


def _sub_sq_l2(sub: Column, centroid: list[float]) -> Column:
    """Squared L2 distance of a subvector column to a literal sub-centroid —
    left-fold in double (same fold order as the DuckDB oracle's
    list_reduce, so distances are bit-identical across engines)."""
    lit_vec = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            sub,
            lit_vec,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 8,
    n_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_hash: str = "md5",
    seeds: list | None = None,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: the vector space is
    split into ``m`` contiguous subspaces; each subspace gets ``ksub``
    sub-centroids. Seeds are the subvectors of the ksub corpus vectors with
    smallest hash(id) — the same stable-at-any-parallelism seeding scheme as
    ivf_centroids, and with seed_hash="md5" + n_iters=0 the DuckDB oracle
    reproduces the codebooks exactly (list_slice over the same seed rows).

    n_iters > 0 Lloyd-refines every subspace in ONE corpus pass per
    iteration: codes for all m subspaces are computed in a single narrow
    map, then one groupBy((j, cid, pos)) avg updates every sub-centroid —
    cost is independent of m beyond the agg width.

    Returns codebooks[j][c] = the c-th sub-centroid of subspace j.
    Pass a precollected ``seeds`` list (seed_rows; a longer list's prefix
    is used) to share the seed scan with ivf_centroids.
    """
    if seeds is None:
        seeds = seed_rows(corpus, ksub, id_col, vec_col, seed_hash)
    if len(seeds) < ksub:
        raise ValueError(f"need {ksub} seed rows, got {len(seeds)}")
    seeds = seeds[:ksub]
    dim = len(seeds[0]["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = [
        [
            [float(x) for x in r["v"][j * dsub : (j + 1) * dsub]]
            for r in seeds
        ]
        for j in range(m)
    ]
    if n_iters <= 0:
        return books
    # Lloyd refinement, numpy-vectorized (same rationale as ivf_centroids:
    # the Catalyst-HOF encode + double posexplode won't survive 100×): one
    # mapInPandas pass per iteration computes every subspace's assignment
    # as a batch distance matrix and emits per-batch partial (sum, count)
    # per (subspace, sub-centroid) — m·ksub·P tiny rows to the driver.
    import numpy as np
    import pandas as pd

    vecs = corpus.select(F.col(vec_col).alias("v")).cache()
    try:
        for _ in range(n_iters):
            B = np.asarray(books, dtype=np.float64)  # (m, ksub, dsub)

            def partials(it, B=B, m=m, ksub=ksub, dsub=dsub):
                for pdf in it:
                    if not len(pdf):
                        continue
                    V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                    out_j, out_c, out_n, out_s = [], [], [], []
                    for j in range(m):
                        S = V[:, j * dsub : (j + 1) * dsub]  # (n, dsub)
                        # ||s - c||² for all sub-centroids; argmin ties to
                        # the SMALLEST c (array_min struct<d,c> parity)
                        d2 = (
                            (S * S).sum(1)[:, None]
                            - 2.0 * S @ B[j].T
                            + (B[j] * B[j]).sum(1)[None, :]
                        )
                        cid = np.argmin(d2, axis=1)
                        sums = np.zeros((ksub, dsub))
                        np.add.at(sums, cid, S)
                        cnt = np.bincount(cid, minlength=ksub)
                        nz = np.flatnonzero(cnt)
                        out_j.append(np.full(len(nz), j, dtype="int32"))
                        out_c.append(nz.astype("int32"))
                        out_n.append(cnt[nz].astype("int64"))
                        out_s.extend(list(sums[nz]))
                    yield pd.DataFrame(
                        {
                            "j": np.concatenate(out_j),
                            "c": np.concatenate(out_c),
                            "cnt": np.concatenate(out_n),
                            "s": out_s,
                        }
                    )

            rows = vecs.mapInPandas(
                partials, schema="j int, c int, cnt long, s array<double>"
            ).collect()
            sums = np.zeros((m, ksub, dsub))
            cnts = np.zeros((m, ksub), dtype=np.int64)
            for r in rows:
                sums[r["j"], r["c"]] += np.asarray(r["s"])
                cnts[r["j"], r["c"]] += r["cnt"]
            for j in range(m):
                for c in range(ksub):
                    if cnts[j, c]:
                        books[j][c] = [
                            float(x) for x in sums[j, c] / cnts[j, c]
                        ]
    finally:
        vecs.unpersist()
    return books


def _pq_code_expr(
    vec: Column, j: int, dsub: int, book: list[list[float]]
) -> Column:
    """Nearest sub-centroid id for subspace j: array_min over
    struct<d,c> — min distance, ties to the smallest centroid id."""
    sub = F.slice(vec, j * dsub + 1, dsub)
    scored = F.array(
        *[
            F.struct(_sub_sq_l2(sub, c).alias("d"), F.lit(ci).alias("c"))
            for ci, c in enumerate(book)
        ]
    )
    return F.array_min(scored)["c"]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code: array<int>) — each vector compressed to m sub-centroid
    ids (m bytes at ksub ≤ 256 instead of dim × 4 floats; at dim=64/m=8
    that's a 32× shrink). A pure narrow map over the scan: codebooks are
    tiny driver-side literals, so encoding needs NO join, NO shuffle, and
    the full-precision vector column is pruned right after the projection —
    at 100 TB the PQ index build is one scan-shaped pass writing m bytes
    per vector."""
    dsub = len(codebooks[0][0])
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.array(
            *[
                _pq_code_expr(F.col(vec_col), j, dsub, book)
                for j, book in enumerate(codebooks)
            ]
        ).alias("code"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes: each
    query precomputes its distance table dtab[j][c] = ||q_sub_j - cb[j][c]||²
    (m × ksub doubles, built BELOW the broadcast exchange so it is
    materialized once per query, never re-expanded per candidate — the
    projection-collapse trap of CLAUDE.md); each corpus CODE row then costs
    only m table lookups + a left-fold sum. The full-precision corpus
    vectors are never read: the scan is the m-byte code column, which is
    the whole point of PQ at 100 TB — approximate distances over a
    32×-smaller index, exactness recoverable by re-ranking the top
    candidates against true vectors (tests measure recall).

    Pass ``codes`` (from pq_encode, possibly persisted) to reuse an index
    across query batches.
    """
    dsub = len(codebooks[0][0])
    cd = codes if codes is not None else pq_encode(corpus, codebooks, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.array(
            *[
                F.array(
                    *[
                        _sub_sq_l2(
                            F.slice(F.col(vec_col), j * dsub + 1, dsub), c
                        )
                        for c in book
                    ]
                )
                for j, book in enumerate(codebooks)
            ]
        ).alias("dtab"),
    )
    adist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("dtab"),
                F.col("code"),
                lambda t, c: F.element_at(t, c + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return (
        cd.withColumnRenamed("vec_id", "neighbor_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adist.alias("adist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 8,
    n_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
    seed_hash: str = "xxhash64",
) -> DataFrame:
    """IVF-PQ: the 100-TB ANN recipe — IVF cell routing GATES the PQ ADC
    scan, so each query's asymmetric-distance pass touches only its nprobe
    cells' codes (≈ corpus · nprobe / n_centroids rows of m bytes each)
    instead of the whole corpus (pq_adc_topk's one inherent weakness).

    Index build is one scan-shaped narrow map: cell id (centroid literals,
    no join) + m-byte PQ code per vector, full-precision vectors pruned
    immediately. Queries build their m×ksub distance table once BELOW the
    broadcast exchange (never re-expanded per candidate — the
    projection-collapse trap), probe their nprobe nearest cells, and the
    cell equi-join + table-lookup fold ranks candidates. Pass precomputed
    ``centroids`` / ``codebooks`` / ``codes`` to reuse a persisted index
    across query batches; exactness is recoverable by re-ranking the top
    shortlist against true vectors (pq_rerank_topk's pattern)."""
    shared = (
        seed_rows(corpus, max(n_centroids, ksub), id_col, vec_col, seed_hash)
        if centroids is None and codebooks is None
        else None
    )
    cent = centroids or ivf_centroids(
        corpus, n_centroids, n_iters, id_col, vec_col, seed_hash,
        seeds=shared,
    )
    books = codebooks or pq_codebooks(
        corpus, m, ksub, n_iters, id_col, vec_col, seed_hash, seeds=shared
    )
    dsub = len(books[0][0])
    cd = codes
    if cd is None:
        cd = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.array_max(_centroid_scores(F.col(vec_col), cent))["cid"].alias(
                "cid"
            ),
            F.array(
                *[
                    _pq_code_expr(F.col(vec_col), j, dsub, book)
                    for j, book in enumerate(books)
                ]
            ).alias("code"),
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.array(
            *[
                F.array(
                    *[
                        _sub_sq_l2(
                            F.slice(F.col(vec_col), j * dsub + 1, dsub), c
                        )
                        for c in book
                    ]
                )
                for j, book in enumerate(books)
            ]
        ).alias("dtab"),
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(
                        F.array_sort(_centroid_scores(F.col(vec_col), cent))
                    ),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    )
    adist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("dtab"),
                F.col("code"),
                lambda t, c: F.element_at(t, c + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return (
        cd.join(F.broadcast(q), on="cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adist.alias("adist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 8,
    n_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
    seed_hash: str = "xxhash64",
) -> DataFrame:
    """The complete 100-TB ANN pipeline: IVF-gated ADC produces a
    ``shortlist`` per query from nprobe cells' m-byte codes, then ONLY
    shortlist·|queries| rows re-join their full-precision vectors for an
    exact squared-L2 re-rank (broadcast on the tiny query side). Composes
    ivfpq_topk's gated scan with pq_rerank_topk's re-rank stage: the
    vector column is read for the shortlist rows, never the corpus."""
    cand = ivfpq_topk(
        corpus,
        queries,
        k=shortlist,
        n_centroids=n_centroids,
        nprobe=nprobe,
        m=m,
        ksub=ksub,
        n_iters=n_iters,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
        codebooks=codebooks,
        codes=codes,
        seed_hash=seed_hash,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cv"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(d2, 4).alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def build_ann_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 8,
    ksub: int = 8,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_hash: str = "xxhash64",
) -> None:
    """Persist the IVF-PQ index that ``ann_index_topk`` probes —
    the build-once/probe-often lifecycle a per-ingest retrieval gate
    needs at 100 TB (mirrors dedup.build_dedup_index):

      * ``{path}/codes`` — (vec_id, code) parquet PARTITIONED BY cid, so
        a probe restricted to nprobe cells prunes files at the scan;
      * ``{path}/meta.json`` — centroids, codebooks and build params, so
        probes and appends encode with EXACTLY the quantizers the index
        was built with (a silent mismatch would corrupt distances).

    The build is one scan-shaped pass: Lloyd-refined quantizers (numpy
    mapInPandas path), then a narrow cell-id+code projection writing m
    bytes per vector."""
    import json
    import os

    shared = seed_rows(
        corpus, max(n_centroids, ksub), id_col, vec_col, seed_hash
    )
    cent = ivf_centroids(
        corpus, n_centroids, n_iters, id_col, vec_col, seed_hash,
        seeds=shared,
    )
    books = pq_codebooks(
        corpus, m, ksub, n_iters, id_col, vec_col, seed_hash, seeds=shared
    )
    dsub = len(books[0][0])
    codes = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.array_max(_centroid_scores(F.col(vec_col), cent))["cid"].alias(
            "cid"
        ),
        F.array(
            *[
                _pq_code_expr(F.col(vec_col), j, dsub, book)
                for j, book in enumerate(books)
            ]
        ).alias("code"),
    )
    codes.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/codes")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "n_centroids": n_centroids,
                "m": m,
                "ksub": ksub,
                "dim": m * dsub,
                "centroids": cent,
                "codebooks": books,
            },
            f,
        )


def _check_ann_dim(df: DataFrame, vec_col: str, meta: dict, path: str) -> None:
    """Raise if a batch/query vector dimension doesn't match the persisted
    quantizers — a silent mismatch yields null/garbage ADC distances (the
    codebooks slice the vector at the INDEX's dsub). One 1-row probe job;
    negligible against the encode/scan it guards. ``dim`` is persisted at
    build time and derived from the codebooks for pre-dim indexes."""
    dim = meta.get("dim") or meta["m"] * len(meta["codebooks"][0][0])
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is not None and row["d"] != dim:
        raise ValueError(
            f"vector dim {row['d']} != index dim {dim} "
            f"(index at {path} was built over {dim}-d vectors)"
        )


def append_to_ann_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fold new vectors into an existing ``build_ann_index`` layout: the
    batch is encoded with the PERSISTED quantizers (meta.json) and
    appended as new parquet files under its cells — O(batch) regardless
    of index size, history never re-encoded. (Centroids/codebooks drift
    as the corpus grows; rebuild on a cadence, not per batch.)"""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    _check_ann_dim(df, vec_col, meta, path)
    cent, books = meta["centroids"], meta["codebooks"]
    dsub = len(books[0][0])
    df.select(
        F.col(id_col).alias("vec_id"),
        F.array_max(_centroid_scores(F.col(vec_col), cent))["cid"].alias(
            "cid"
        ),
        F.array(
            *[
                _pq_code_expr(F.col(vec_col), j, dsub, book)
                for j, book in enumerate(books)
            ]
        ).alias("code"),
    ).write.mode("append").partitionBy("cid").parquet(f"{path}/codes")


def ann_index_topk(
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF-PQ index: queries build their distance
    tables and probe cells from the PERSISTED quantizers; the code scan
    is statically pruned to the probed cells (the probe cid set is tiny —
    ≤ |queries|·nprobe values — so collecting it buys parquet partition
    pruning: only nprobe/n_centroids of the index files are read)."""
    import json
    import os

    spark = queries.sparkSession
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    _check_ann_dim(queries, vec_col, meta, path)
    cent, books = meta["centroids"], meta["codebooks"]
    dsub = len(books[0][0])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.array(
            *[
                F.array(
                    *[
                        _sub_sq_l2(
                            F.slice(F.col(vec_col), j * dsub + 1, dsub), c
                        )
                        for c in book
                    ]
                )
                for j, book in enumerate(books)
            ]
        ).alias("dtab"),
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(
                        F.array_sort(_centroid_scores(F.col(vec_col), cent))
                    ),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    )
    probed = [r["cid"] for r in q.select("cid").distinct().collect()]
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cid").isin(probed)
    )
    adist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("dtab"),
                F.col("code"),
                lambda t, c: F.element_at(t, c + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(q), on="cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adist.alias("adist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    probe_bits: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH (OR-amplification):
    candidates share the query's bucket in ANY of n_tables hash tables; exact
    cosine + rank over the deduped candidate set. Recall/cost dial:
    more tables ↑recall ↑candidates; more planes ↓candidates ↓recall.
    Recall measured against brute_force_topk in tests.

    Bucket assignment is the numpy path (lsh_buckets_np); candidate ids then
    re-join their vectors (broadcast on the query side), so vectors never
    ride through the bucket explode. probe_bits > 0 turns on query-side
    multi-probe (lsh_buckets_np_multiprobe): recall of more tables at the
    index cost of fewer."""
    cb = lsh_buckets_np(corpus, dim, n_planes, n_tables, id_col, vec_col)
    qb = (
        lsh_buckets_np_multiprobe(
            queries, dim, n_planes, n_tables, probe_bits, id_col, vec_col
        )
        if probe_bits > 0
        else lsh_buckets_np(queries, dim, n_planes, n_tables, id_col, vec_col)
    )
    cand = (
        cb.join(
            F.broadcast(qb.withColumnRenamed("id", "query_id")),
            on=["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("id"))
        .select(F.col("query_id"), F.col("id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2norm(F.col(vec_col)).alias("cn"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2norm(F.col(vec_col)).alias("qn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
            ).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
