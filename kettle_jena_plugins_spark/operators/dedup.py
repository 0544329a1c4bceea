"""Deduplication operators for large-scale training-data pipelines.

Four families, all portable (hash base = md5, so the DuckDB oracle computes
identical values):

- exact:   hash-groupBy on normalized text (one shuffle, map-side combine)
- minhash: shingle → k min-hashes → band → bucket-join (LSH). The scale
  path: candidate generation is O(n·bands) rows through one shuffle instead
  of O(n²) pairs.
- ngram Jaccard: exact pairwise similarity over a shingle self-join —
  the verifier for minhash candidates (run on candidates only at scale).
- simhash: 60-bit majority fingerprint (near-dup by hamming distance),
  vectorized pandas UDF (Arrow) — no per-row Python.

At 100 TB: exact/minhash are shuffle-bound; both aggregate map-side first.
The banding join broadcasts nothing and self-joins on (band, bucket-hash),
whose cardinality is bounded by duplicate density, not n².
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ------------------------------------------------------------------ shingles

def shingles(col: str | Column, n: int = 5) -> Column:
    """Distinct character n-grams (sorted for determinism). Built-ins only."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.expr(
        f"transform(sequence(1, greatest(length({'' if not isinstance(col, str) else col}) - {n} + 1, 1)),"
        f" i -> substring({'' if not isinstance(col, str) else col}, i, {n}))"
    ) if isinstance(col, str) else None
    # column-object version via sql functions (works for any expression)
    if grams is None:
        raise ValueError("shingles() requires a column name string")
    return F.array_sort(F.array_distinct(grams))


# ------------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: (text_hash, keep_id = min id,
    n_dups). Hash-groupBy — single shuffle, partial agg map-side."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        df.select(F.md5(norm).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# ------------------------------------------------------------------ minhash

P_MINHASH = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def uh_consts(k: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash constants (a_i, b_i) for h_i(x) =
    (a_i·x + b_i) mod p — a_i ∈ [1, p), products bounded by 2^62 (exact in
    int64 on both Spark and DuckDB, so the oracle reproduces signatures
    bit-for-bit)."""
    return [
        (
            (1 + 2654435761 * (i + 1)) % P_MINHASH or 1,
            (40503 * (i + 7)) % P_MINHASH,
        )
        for i in range(k)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 12,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, m0..m{k-1}) — k min-hashes per document.

    Scale design: each shingle is md5-hashed ONCE into a 60-bit int; the k
    hash functions are integer affine maps of that base hash, and the k mins
    are ONE hash aggregation (map-side partial combine, whole-stage codegen).
    The earlier formulation (k md5s per shingle inside array_min∘transform)
    was both 12× the hashing and — worse — re-expanded by projection
    collapse into a full signature recompute per band on each self-join
    side."""
    ex = df.select(
        F.col(id_col).alias("id"),
        *carry_cols,
        F.explode(shingles(text_col, n)).alias("g"),
    )
    h = (
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
        % F.lit(P_MINHASH)
    ).alias("h")
    return (
        ex.select("id", *carry_cols, h)
        .groupBy("id")
        .agg(
            *[
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(P_MINHASH)).alias(
                    f"m{i}"
                )
                for i, (a, b) in enumerate(uh_consts(k))
            ],
            # carry_cols are per-id constants riding the same agg (no join)
            *[F.first(c).alias(c) for c in carry_cols],
        )
    )


def band_buckets(
    sigs: DataFrame,
    k: int = 12,
    bands: int = 3,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band, bucket): one LSH bucket per band; bucket key = the band's
    signature slice joined as a string. rows-per-band r = k/bands sets the
    similarity threshold curve t ≈ (1/bands)^(1/r)."""
    rows = k // bands
    return sigs.select(
        "id",
        *carry_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", *[F.col(f"m{b * rows + r}") for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", *carry_cols, "bb.band", "bb.bucket")


# hot-bucket guard default: a (band, bucket) wider than this is dropped
# from candidate generation. An LSH bucket this wide is not "duplicates to
# pair" — it is boilerplate (a shared header/footer/template string), and
# the self-join would materialize |bucket|²/2 candidate rows in ONE task
# before the verify stage could reject them: the lone quadratic exposure
# of the banded-LSH plan at 100-TB crawl corpora. 5 000 still allows
# ~12.5 M pairs from a single degenerate bucket — wide enough that no
# genuine near-dup cluster at any tested sf comes near it.
MAX_BUCKET_DEFAULT = 5_000


def _cap_buckets(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop rows of (band, bucket) groups wider than ``max_bucket`` via a
    broadcast ANTI-join against the hot-bucket list. The list is tiny by
    construction (each entry represents > max_bucket docs, so ≤ n/cap
    rows — a handful of boilerplate strings in practice), and the agg
    that builds it is map-side-combined on the same (band, bucket) keys
    the candidate self-join shuffles on. A window-count formulation was
    measured 4× slower here: the window + filter atop each join side
    defeated Spark's identical-subtree exchange reuse, re-running the
    whole signature pipeline per side. Use ``hot_buckets`` to surface
    what was dropped."""
    if max_bucket is None:
        return banded
    hot = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_w"))
        .filter(F.col("_w") > max_bucket)
        .select("band", "bucket")
    )
    return banded.join(F.broadcast(hot), ["band", "bucket"], "left_anti")


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 12,
    bands: int = 3,
    max_bucket: int | None = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) sharing ≥1 minhash band bucket.

    Self-join on (band, bucket) — never on raw text. The signature agg is a
    shuffle barrier, so AQE reuses one exchange for both join sides instead
    of recomputing shingle hashes. Default bands=3 (r=4) targets the ≈0.76
    similarity knee — matched to the ≥0.8 Jaccard verify threshold.

    ``max_bucket`` caps bucket width (see MAX_BUCKET_DEFAULT): a
    boilerplate mega-bucket otherwise makes one straggler task
    materialize |bucket|² pairs. Dropped buckets are themselves a signal
    the pipeline wants surfaced — run ``hot_buckets`` with the same
    parameters to report them. ``max_bucket=None`` disables the guard."""
    banded = _cap_buckets(
        band_buckets(minhash_signatures(df, text_col, id_col, n, k), k, bands),
        max_bucket,
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def hot_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 12,
    bands: int = 3,
    max_bucket: int | None = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """The drop accounting for ``minhash_candidates``'s hot-bucket guard:
    (band, bucket, width) for every (band, bucket) wider than
    ``max_bucket`` — the buckets candidate generation skipped. An
    oversized LSH bucket means a string shared verbatim by ``width``
    documents (boilerplate / template text), which a curation pipeline
    wants reported, not silently paired. One hash agg — same cost shape
    as the candidate path's width window."""
    banded = band_buckets(minhash_signatures(df, text_col, id_col, n, k), k, bands)
    return (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("width"))
        .filter(F.col("width") > (max_bucket if max_bucket is not None else 2**62))
    )


# ------------------------------------------------------------- ngram jaccard

def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs via shingle inverted index:
    explode distinct shingles → self-join on shingle → |∩| per pair →
    jaccard = |∩| / (|A| + |B| - |∩|). At scale, feed minhash candidates in
    as `df` instead of the full corpus."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("id", "n_sh", F.explode("sh").alias("g"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return inter.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard restricted to candidate pairs (id_a, id_b) — the
    scale path: MinHash-LSH proposes, this verifies. Two equi-joins on doc id
    bring each side's shingle set to the pair, then |∩| via array_intersect —
    NO shingle self-join, so cost is O(candidates · shingles/doc), bounded by
    duplicate density instead of Σ_g d_g² (hot shingles made the full
    inverted-index formulation quadratic: a 5-gram common to all n docs alone
    yields n² joined rows).

    Shingles are hashed to 60-bit ints before the joins (one md5 per
    shingle): the intersect compares longs instead of strings and the join
    ships far fewer bytes per document. A hash collision would miscount |∩|
    by 1 — negligible at 2^60, and the DuckDB oracle hashes identically so
    the comparison stays exact."""
    return jaccard_verify_hashed(
        hashed_shingles(df, text_col, id_col, n), candidates, threshold
    )


def hashed_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """(id, sh): each document's distinct n-gram set hashed to 60-bit ints
    (first 15 hex chars of md5 — oracle-portable). The persisted form of a
    dedup index's verify side."""
    hashed = F.transform(
        shingles(text_col, n),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    return df.select(F.col(id_col).alias("id"), hashed.alias("sh"))


def jaccard_verify_hashed(
    sh: DataFrame, candidates: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Scoring core over pre-hashed shingle sets (``hashed_shingles``
    layout) — shared by the inline and saved-index verify paths."""
    j = (
        candidates.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        ).join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        j.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------------- simhash

@pandas_udf(T.LongType())
def simhash60(texts: pd.Series) -> pd.Series:
    """60-bit simhash over whitespace tokens; per-token hash = first 15 hex
    chars of md5 (portable — the DuckDB oracle reproduces it bit-for-bit).
    Arrow-batched, and the bit-vote is numpy-vectorized: the only remaining
    per-token Python is the md5 call itself (fixed by oracle parity); the
    60×n_tokens vote loop runs as one (n_tokens, 60) matrix reduction."""
    import numpy as np

    jbits = np.arange(60, dtype=np.uint64)

    def sh(t):
        if t is None:
            return None
        toks = t.split()
        if not toks:
            return 0
        hs = np.fromiter(
            (
                int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                for tok in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        ones = ((hs[:, None] >> jbits) & 1).sum(axis=0)  # votes for bit=1
        # counts[j] > 0  ⇔  ones > n_tok - ones
        return int((((2 * ones > len(toks)).astype(np.uint64)) << jbits).sum())

    return texts.map(sh)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance. Candidate generation at
    scale: block on 4 × 15-bit segments (any pair within hamming ≤ 3 of 60
    bits shares ≥1 identical 15-bit segment — pigeonhole); here segments are
    the join key, then the exact hamming filter."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash60(F.col(text_col)).alias("sh")
    )
    segs = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftrightunsigned(F.col("sh"), s * 15)
                        .bitwiseAND(F.lit((1 << 15) - 1))
                        .alias("segval"),
                    )
                    for s in range(4)
                ]
            )
        ).alias("s"),
    ).select("id", "sh", "s.seg", "s.segval")
    a = segs.alias("a")
    b = segs.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.segval") == F.col("b.segval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate-cluster resolution — the step after pair generation in a
    dedup pipeline: connected components over the dup-pair graph, so each
    cluster keeps one canonical document (min id) and drops the rest.

    Iterative min-label propagation (the GraphX-style pattern): every
    round each node adopts the minimum label in its closed neighborhood;
    convergence takes ~graph-diameter rounds, which for near-dup clusters
    is tiny (dup groups are short chains, not long paths). Each round is
    one shuffle on the edge list; labels are localCheckpoint'ed per round
    to cut lineage growth. At 100 TB the edge list is candidate-bounded
    (LSH propose → verify), orders of magnitude smaller than the corpus —
    this loop runs on pairs, never on documents.

    Returns (doc_id, cluster_id) for every node that appears in a pair;
    cluster_id is the component's minimum doc id (the canonical keeper).
    """
    e = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    edges = (
        e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_label = F.least(
            labels["label"], F.coalesce(nbr["nbr_min"], labels["label"])
        )
        # convergence flag folded into the label projection: the old
        # formulation re-JOINED new vs old labels per round just to count
        # diffs (a second shuffle job per round); carrying `chg` through
        # the same checkpoint makes convergence detection a narrow scan of
        # the just-materialized blocks.
        new_labels = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                labels["node"],
                new_label.alias("label"),
                (new_label != labels["label"]).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = bool(new_labels.agg(F.max("chg")).first()[0])
        labels = new_labels.drop("chg")
        if not changed:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_against_index(
    new_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 12,
    bands: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """Ingest-time incremental dedup (the CDC-shaped dedup operator): flag
    documents in a NEW micro-batch that near-duplicate an EXISTING corpus
    index — dedup-on-ingest for a continuously growing training corpus,
    so each batch is checked against 100 TB of history without ever
    re-pairing the history with itself.

    Directional propose-then-verify: both sides get minhash band buckets
    (in production the index side is computed ONCE and persisted as a lake
    table keyed by (band, bucket) — ``build_dedup_index`` /
    ``dedup_against_saved_index``; only the new batch hashes per run);
    the join probes the index with the micro-batch-sized new side marked
    broadcast, so the index is never reshuffled per batch. Candidates are
    then exact-Jaccard verified (``jaccard_verify``) over the union of the
    two doc sets. Within-batch duplicates are NOT reported — compose with
    ``minhash_candidates`` on the new batch alone for that.

    The inline form hashes BOTH sides this call, so signatures are
    computed over one side-tagged union and split afterwards — the
    signature agg is a shuffle barrier, so AQE reuses a single exchange
    for both probe sides instead of running the shingle explode+agg
    twice (same trick as ``minhash_candidates``; measured ~2× on the
    dominant term).

    Returns (new_doc_id, index_doc_id, jaccard ≥ threshold). Requires the
    two id spaces to be disjoint."""
    tagged = new_df.select(
        id_col, text_col, F.lit(True).alias("__new")
    ).unionByName(
        index_df.select(id_col, text_col, F.lit(False).alias("__new"))
    )
    sigs = minhash_signatures(
        tagged, text_col, id_col, n, k, carry_cols=("__new",)
    )
    banded = band_buckets(sigs, k, bands, carry_cols=("__new",))
    idx_b = banded.filter(~F.col("__new"))
    new_b = banded.filter(F.col("__new"))
    cand = _probe_candidates(idx_b, new_b, max_bucket)
    both = new_df.select(id_col, text_col).unionByName(
        index_df.select(id_col, text_col)
    )
    return jaccard_verify(both, cand, text_col, id_col, n, threshold).select(
        F.col("id_a").alias("new_doc_id"),
        F.col("id_b").alias("index_doc_id"),
        "jaccard",
    )


def _probe_candidates(
    idx_b: DataFrame,
    new_b: DataFrame,
    max_bucket: int | None = MAX_BUCKET_DEFAULT,
    idx_widths: DataFrame | None = None,
) -> DataFrame:
    """Directional LSH propose shared by the inline and saved-index paths:
    probe the index buckets with the (broadcast) new-batch buckets —
    (id_a = new id, id_b = index id), distinct.

    The hot-bucket guard here caps TOTAL (index + batch) width per
    (band, bucket) — same semantics as ``minhash_candidates``'s cap over
    the union corpus — WITHOUT ever reshuffling the index: widths are
    counted only for PROBED buckets via a broadcast semi-join (buckets
    the batch doesn't touch produce no candidates anyway), and the
    resulting ok-bucket set (≤ |batch|·bands rows) rides the same
    broadcast as the batch side. With ``idx_widths`` (the persisted
    (band, bucket, w) side table a saved index maintains — possibly
    partial per-append rows, SUMmed here) the guard never touches index
    bucket rows at all: it reads the widths table, which is
    #distinct-buckets-sized, not #rows-sized. Without it, the fallback
    is one extra narrow pass over the index restricted to probed
    buckets, map-side-combined to a per-bucket count — linear, no
    shuffle of index rows."""
    if max_bucket is not None:
        new_w = new_b.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_wn")
        )
        source = idx_widths if idx_widths is not None else idx_b
        idx_w = (
            source.join(
                F.broadcast(new_w.select("band", "bucket")),
                ["band", "bucket"],
            )
            .groupBy("band", "bucket")
            .agg(
                (
                    F.sum("w") if idx_widths is not None else F.count(F.lit(1))
                ).alias("_wi")
            )
        )
        ok = (
            idx_w.join(new_w, ["band", "bucket"])
            .filter(F.col("_wi") + F.col("_wn") <= max_bucket)
            .select("band", "bucket")
        )
        new_b = new_b.join(F.broadcast(ok), ["band", "bucket"])
    return (
        idx_b.alias("i")
        .join(
            F.broadcast(new_b.alias("nb")),
            (F.col("i.band") == F.col("nb.band"))
            & (F.col("i.bucket") == F.col("nb.bucket")),
        )
        .select(F.col("nb.id").alias("id_a"), F.col("i.id").alias("id_b"))
        .distinct()
    )


def build_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 12,
    bands: int = 3,
) -> None:
    """Persist the corpus dedup index that ``dedup_against_saved_index``
    probes: ``{path}/buckets`` — (id, bucket) partitioned by band —
    ``{path}/shingles`` — (id, sh) hashed n-gram sets for the verify
    stage — ``{path}/widths`` — per-(band, bucket) row counts, so the
    hot-bucket guard at probe time reads a small side table instead of
    re-counting history (appends add partial counts; probes SUM) — and
    ``{path}/meta.json`` recording {n, k, bands} so probes
    hash their batch with the exact parameters the index was built with
    (a silent mismatch would return an empty candidate set). Built ONCE
    per corpus (or incrementally appended per accepted batch); after
    that, per-ingest batches never re-hash or re-shuffle history. Band
    partitioning lets a probe restricted to a band subset prune files at
    the scan."""
    import json
    import os

    sigs = minhash_signatures(df, text_col, id_col, n, k)
    _write_banded_with_widths(band_buckets(sigs, k, bands), path, "overwrite")
    hashed_shingles(df, text_col, id_col, n).write.mode("overwrite").parquet(
        f"{path}/shingles"
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"n": n, "k": k, "bands": bands}, f)


def _write_banded_with_widths(
    banded: DataFrame, path: str, mode: str
) -> None:
    """Write bucket rows AND their per-(band, bucket) counts — the widths
    side table the probe-time hot-bucket guard reads instead of
    re-counting history. Appends write PARTIAL counts for the batch only
    (probes SUM per bucket), so an append stays O(batch) regardless of
    index size. The banded frame is persisted across the two writes so
    the signature agg runs once."""
    banded = banded.persist()
    try:
        banded.write.mode(mode).partitionBy("band").parquet(
            f"{path}/buckets"
        )
        banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("w")
        ).write.mode(mode).partitionBy("band").parquet(f"{path}/widths")
    finally:
        banded.unpersist()


def append_to_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold an ACCEPTED batch into an existing index (``build_dedup_index``
    layout) — the per-ingest lifecycle is probe → keep/drop decision →
    append the keepers so the NEXT batch dedups against them too. The
    batch is hashed with the {n, k, bands} recorded in the index's
    meta.json; existing index files are untouched (append-only parquet
    writes), so the append costs O(batch) regardless of index size."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    n, k, bands = meta["n"], meta["k"], meta["bands"]
    sigs = minhash_signatures(df, text_col, id_col, n, k)
    _write_banded_with_widths(band_buckets(sigs, k, bands), path, "append")
    hashed_shingles(df, text_col, id_col, n).write.mode("append").parquet(
        f"{path}/shingles"
    )


def compact_dedup_index(spark, path: str) -> dict:
    """Maintenance for a ``build_dedup_index`` layout: rewrite the widths
    side table as ONE summed row per (band, bucket). Appends add partial
    rows (one parquet file each), and probes SUM them — so compaction
    changes no result, it only bounds the widths table's file and row
    count after many ingest cycles (run on the same cadence as lake
    compaction). Staged rewrite: new files land in ``widths_tmp`` and
    swap in only after the write commits."""
    import os
    import shutil

    w = (
        spark.read.parquet(f"{path}/widths")
        .groupBy("band", "bucket")
        .agg(F.sum("w").alias("w"))
    )
    tmp = f"{path}/widths_tmp"
    w.write.mode("overwrite").partitionBy("band").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(f"{path}/widths")
    os.rename(tmp, f"{path}/widths")
    return {"path": path, "width_rows": n}


def dedup_against_saved_index(
    spark,
    new_df: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_bucket: int | None = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """``dedup_against_index`` against a persisted index
    (``build_dedup_index`` layout): only the NEW batch is hashed this run —
    the index side is two parquet scans (buckets for propose, shingles for
    verify), so per-ingest cost is O(batch + candidates), independent of
    how much history the index holds. The batch is hashed with the {n, k,
    bands} recorded in the index's meta.json — they are build-time
    properties of the index, not probe options. Same output contract:
    (new_doc_id, index_doc_id, jaccard ≥ threshold)."""
    import json
    import os

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    n, k, bands = meta["n"], meta["k"], meta["bands"]
    idx_b = spark.read.parquet(f"{index_path}/buckets")
    new_b = band_buckets(
        minhash_signatures(new_df, text_col, id_col, n, k), k, bands
    )
    # hot-bucket guard reads the persisted widths side table when present
    # (bucket-count-sized, so the guard costs O(distinct buckets probed)
    # instead of a second pass over index rows); pre-widths indexes fall
    # back to counting bucket rows
    widths = None
    if os.path.isdir(f"{index_path}/widths"):
        widths = spark.read.parquet(f"{index_path}/widths")
    cand = _probe_candidates(idx_b, new_b, max_bucket, idx_widths=widths)
    # ids are expected to be disjoint; if a batch re-uses an index id the
    # batch's text wins (anti-join, broadcast by AQE — batch side is small)
    sh_new = hashed_shingles(new_df, text_col, id_col, n)
    sh = (
        spark.read.parquet(f"{index_path}/shingles")
        .join(sh_new.select("id"), "id", "left_anti")
        .unionByName(sh_new)
    )
    return jaccard_verify_hashed(sh, cand, threshold).select(
        F.col("id_a").alias("new_doc_id"),
        F.col("id_b").alias("index_doc_id"),
        "jaccard",
    )


def token_tiles(col: str | Column, t: int = 8) -> Column:
    """Non-overlapping t-token tiles (space-joined, lowercased); only FULL
    tiles — the trailing partial tile is dropped (it is almost always
    unique and would dilute duplicate counts). Docs shorter than t tokens
    yield an empty array.

    Built from the stride-1 n-gram stream (zip_with over shifted token
    arrays — split() evaluates once per row) by keeping every t-th gram
    via the (element, index) filter lambda, which references only its
    index — NOT the backing array — so there is no per-element
    re-expansion (CLAUDE.md projection-collapse trap; the obvious
    transform-over-tile-starts form re-tokenizes per tile)."""
    from .decontam import ngram_stream

    c = F.col(col) if isinstance(col, str) else col
    grams = ngram_stream(c, t)
    return F.filter(grams, lambda _, i: i % t == 0)


def span_dup_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", t: int = 8
) -> DataFrame:
    """Duplicated-span detection — the scalable approximation of
    suffix-array substring dedup ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022): hash non-overlapping
    t-token tiles, count each tile hash corpus-wide, and report per
    document how many of its tiles occur more than once anywhere.

    Plan shape at 100 TB: tile explode is narrow and runs ONCE — the
    corpus-wide count is a whole-partition window count over the tile
    hash (one shuffle on the fixed-width md5 key, no self-join, no second
    tokenize pass; a groupBy+join-back formulation re-ran the n-gram
    chain per side); the per-doc rollup is the only doc-keyed shuffle.
    Tile hashes are md5 (oracle-portable, CLAUDE.md).

    Returns (doc_id, n_tiles, dup_tiles, dup_frac) for EVERY input doc —
    docs shorter than t tokens report 0 tiles, 0.0 dup_frac."""
    from pyspark.sql import Window

    tiles = df.select(
        F.col(id_col), F.explode(token_tiles(F.col(text_col), t)).alias("tile")
    ).select(id_col, F.md5(F.col("tile")).alias("h"))
    cnt = F.count(F.lit(1)).over(Window.partitionBy("h"))
    per_doc = (
        tiles.withColumn("cnt", cnt)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_tiles"),
            F.sum((F.col("cnt") > 1).cast("int")).cast("int").alias("dup_tiles"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tiles", F.lit(0)).alias("n_tiles"),
            F.coalesce("dup_tiles", F.lit(0)).alias("dup_tiles"),
            F.round(
                F.coalesce(F.col("dup_tiles") / F.col("n_tiles"), F.lit(0.0)), 6
            ).alias("dup_frac"),
        )
    )


def fuzzy_pairs(
    df: DataFrame,
    max_dist: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix: int = 4,
    band: int = 16,
) -> DataFrame:
    """Typo-level near-match pairs by bounded edit distance — the fourth
    classic dedup primitive next to exact hash, MinHash-Jaccard, and
    SimHash: catches single-character corruptions (OCR noise, mojibake,
    truncated exports) that shingle-based similarity over-scores and
    exact hashing misses entirely.

    Propose-then-verify like the LSH family: candidates must share a
    blocking key (normalized ``prefix``-char head + length band of width
    ``band``) — a same-block self-join, never all-pairs — then verify
    with full Levenshtein ≤ max_dist after a length-difference pre-gate.
    Like LSH banding, blocking trades recall for cost (pairs differing in
    the first ``prefix`` chars, or straddling a band boundary, are not
    proposed); the verify stage keeps precision exact. At 100 TB the
    block key bounds candidates the way (band, bucket) does for MinHash.

    Returns (id_a, id_b, dist), id_a < id_b.
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    blocked = df.select(
        F.col(id_col).alias("id"),
        norm.alias("n"),
        F.substring(norm, 1, prefix).alias("bk_head"),
        F.floor(F.length(norm) / band).alias("bk_len"),
    )
    a = blocked.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"), "bk_head", "bk_len"
    )
    b = blocked.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"), "bk_head", "bk_len"
    )
    # banded DP: the threshold form costs O(len·max_dist) per pair instead
    # of O(len²) and returns -1 past the bound — values for KEPT pairs are
    # identical to the full distance (measured 14.4 s → 7.5 s at sf0.1;
    # the remainder is candidate-join volume, not distance compute)
    d = F.levenshtein(F.col("na"), F.col("nb"), max_dist)
    return (
        a.join(b, ["bk_head", "bk_len"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("na") - F.length("nb")) <= max_dist
        )
        .select("id_a", "id_b", d.alias("dist"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
