"""Text analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

Everything except the rolling-hash fingerprint is pure built-in SQL
expressions (JVM/codegen, oracle-checkable); the rolling hash is a
vectorized pandas UDF (the scale path for custom hashing).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

# tiny marker-word inventories per language (heuristic n-gram/stopword ID)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "es": r"\b(el|la|los|las|es|una|del|para|por|que)\b",
}


def token_count(col: Column) -> Column:
    """Whitespace tokens; empty/blank → 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: word-piece + digit + punctuation regex count
    (a deterministic stand-in for a tokenizer: counts maximal alnum runs of
    ≤4 chars plus punctuation marks)."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(r"[a-z0-9]{1,4}|[^a-z0-9\s]"), 0)
    )


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^.!?,;:]", ""))
    return F.round(n_punct / F.greatest(F.length(col), F.lit(1)), 6)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    hits = F.regexp_count(F.lower(col), F.lit(LANG_MARKERS[lang]))
    return F.round(hits / F.greatest(token_count(col), F.lit(1)), 6)


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Duplicate word-n-gram fraction in [0,1]: 1 − distinct/total n-grams
    (0 for docs shorter than n tokens). The Gopher-style within-document
    repetition signal — high values mean boilerplate/looped text that
    quality filters drop before training. Narrow, pure built-ins (split /
    slice / array_distinct), no UDF; composes into ``text_profile``-style
    projections and the DuckDB oracle replays it with list functions."""
    from .decontam import ngram_stream

    grams = ngram_stream(col, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - distinct / total, 6)
    )


def corpus_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    top: int = 20,
) -> DataFrame:
    """Corpus-wide boilerplate mining: the ``top`` most frequent word
    n-grams across all documents (duplicates within a doc count — that is
    the point), ties broken by gram text ascending so the result is
    deterministic. What the top grams name is what a boilerplate-stripping
    pass would target next.

    Scale: explode is narrow over the zip_with n-gram stream (one split
    per row); the count is ONE hash agg on the gram (map-side combine
    absorbs within-partition repeats); top-k is a TakeOrdered over the
    ~distinct-gram-sized agg output, not a global sort of the corpus."""
    from .decontam import ngram_stream

    return (
        df.select(F.explode(ngram_stream(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram"))
        .limit(top)
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    min_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF (tf × ln(N/df), ties broken by
    term ascending) — the corpus-statistics profile a curation pass uses for
    topic/keyword coverage. Tokens are lowercased [a-z0-9]+ runs of length
    ≥ min_len, so the tokenizer is portable to the DuckDB oracle verbatim.

    Scale shape: ONE term-count hash agg over the exploded token stream
    (map-side combine absorbs within-doc repeats), ONE document-frequency
    agg over its output (vocabulary-sized, not corpus-sized), a shuffle
    join back on term (AQE-sized; the df side is vocabulary-scale, which at
    100 TB is still ≪ corpus and skew-safe — hot terms are exactly the ones
    map-side combine already collapsed), and a per-doc window top-k over
    tf-rows only. The corpus-size scalar rides a broadcast single-row agg,
    never a driver collect."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda t: F.length(t) >= min_len,
    )
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def build_vocab(
    df: DataFrame,
    size: int = 1000,
    min_len: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: the ``size`` most frequent terms (ties → term
    ascending), assigned dense ids 1..size — id 0 is reserved for OOV.
    One corpus-frequency hash agg (map-side combine), a TakeOrdered top-k,
    and an id window over the SIZE-bounded survivors only (never the
    corpus), so the single-partition ranking window is O(size)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda t: F.length(t) >= min_len,
    )
    counts = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(size)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return counts.withColumn("id", F.row_number().over(w))


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Encode each document as its token-id array under ``vocab`` (from
    build_vocab; unknown terms → 0) — the tokenize-to-ids step between
    curation and sequence packing. Output: (doc_id, n_tokens, ids) with
    ids in original token order; zero-token docs are absent.

    Scale shape: posexplode → broadcast join against the size-bounded
    vocab → ONE per-doc hash agg that reassembles order inside the
    aggregation (sort_array over (pos, id) structs — no window sort).
    The corpus crosses the shuffle once, as (doc, pos, id) triples."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda t: F.length(t) >= min_len,
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "term"),
    )
    joined = exploded.join(
        F.broadcast(vocab.select("term", "id")), "term", "left"
    ).select(
        "doc_id", "pos", F.coalesce(F.col("id"), F.lit(0)).alias("tid")
    )
    agg = joined.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("pos"), F.col("tid")))
        ).alias("__pt"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.transform(F.col("__pt"), lambda t: t["tid"]).alias("ids"),
    )


def unigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's OWN
    unigram distribution — the perplexity-proxy quality signal (CCNet-style:
    docs whose tokens are improbable under the corpus LM are outliers;
    docs full of ultra-common boilerplate score near the corpus floor).
    Output: (doc_id, n_lm_tokens, nll); docs with zero tokens are absent
    (no LM evidence). nll = −Σ tf·ln(ctf/total) / Σ tf, folded in term
    order so the DuckDB oracle reproduces the double sum bit-for-bit.

    Scale shape: token-frequency agg (map-side combine), vocabulary-sized
    corpus-frequency agg over its output, term join back, then ONE per-doc
    hash agg; the corpus total rides a broadcast single-row agg. Identical
    topology to tfidf_topk — at 100 TB the corpus never shuffles twice."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda t: F.length(t) >= min_len,
    )
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cfreq = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = cfreq.agg(F.sum("ctf").alias("total"))
    contrib = F.col("tf") * F.log(
        F.col("ctf").cast("double") / F.col("total").cast("double")
    )
    agg = (
        tf.join(cfreq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("term"), contrib.alias("c")))
            ).alias("__tc"),
            F.sum("tf").alias("n_lm_tokens"),
        )
    )
    fold = F.aggregate(
        F.transform(F.col("__tc"), lambda t: t["c"]),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return agg.select(
        "doc_id",
        "n_lm_tokens",
        F.round(-fold / F.col("n_lm_tokens"), 4).alias("nll"),
    )


def corpus_stats(
    df: DataFrame,
    stratum_col: str = "lang",
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """Per-stratum corpus profile: doc count, token total, mean/median/p95
    character length — the shape report a mixing/packing plan reads before
    setting budgets (mixture_sample weights, pack_sequences seq_len).

    ``exact=True`` uses Spark's exact interpolated ``percentile`` (one
    grouped sort-agg; right for profile reports over a bounded stratum
    count, and value-identical to DuckDB's quantile_cont so the oracle can
    check it). At 100 TB with huge strata, flip ``exact=False`` for
    t-digest ``approx_percentile`` — same plan shape, one hash agg, no
    per-group sort, ±0.1% accuracy (not oracle-comparable, covered by the
    bounds test instead)."""
    ln = F.length(F.col(text_col))
    if exact:
        p50 = F.expr(f"percentile(length({text_col}), 0.5D)")
        p95 = F.expr(f"percentile(length({text_col}), 0.95D)")
    else:
        p50 = F.expr(f"approx_percentile(length({text_col}), 0.5D, 10000)")
        p95 = F.expr(f"approx_percentile(length({text_col}), 0.95D, 10000)")
    return df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("total_tokens"),
        F.round(F.avg(ln), 4).alias("mean_chars"),
        F.round(p50.cast("double"), 4).alias("p50_chars"),
        F.round(p95.cast("double"), 4).alias("p95_chars"),
    )


def quality_score(col: Column) -> Column:
    """Composite curation score in [0,1]: length band + stopword presence −
    punctuation excess. Deterministic, explainable, oracle-checkable."""
    n_tok = token_count(col)
    len_band = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(0.4)).otherwise(
        F.lit(0.0)
    )
    sw = F.least(stopword_ratio(col) * 2.0, F.lit(0.4))
    punct_pen = F.least(punct_ratio(col) * 2.0, F.lit(0.2))
    return F.round(len_band + sw + (F.lit(0.2) - punct_pen), 6)


def lang_scores(col: Column) -> dict[str, Column]:
    return {
        lang: F.regexp_count(F.lower(col), F.lit(pat))
        for lang, pat in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax language by marker-word hits; 'und' when no markers at all.
    Ties resolve in fixed language order (deterministic)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed fixed order so earlier languages win ties via later override
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


def text_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subwords"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
    )


# order-independent document fingerprint: md5 over the sorted distinct
# n-gram md5s — the set-of-shingles identity (portable to the oracle);
# uses dedup.shingles to keep one shingle definition
def shingle_fingerprint_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 4
) -> DataFrame:
    from .dedup import shingles

    sh = shingles(text_col, n)
    fp = F.md5(
        F.concat_ws(",", F.transform(sh, lambda s: F.md5(s)))
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def _length_groups(texts: "pd.Series"):
    """Shared batching core: UTF-8 encode the non-null rows, then bucket
    them by byte-length power of two so each group pads to ITS OWN max —
    padding overhead stays < 2× the group's real bytes and one long
    outlier among short rows can't inflate the whole batch's matrices
    to O(rows × outlier_len) (executor-OOM / anti-scale hazard).

    Returns (valid_mask, groups) where each group is
    (positions_in_valid_subset, lens_g, pad_g[n_g, maxlen_g])."""
    import numpy as np

    valid = texts.notna().to_numpy()
    enc = [t.encode("utf-8") for t in texts[valid]]
    if not enc:
        return valid, []
    lens = np.array([len(e) for e in enc], dtype="int64")
    buckets = np.where(lens > 0, np.ceil(np.log2(np.maximum(lens, 1))), -1)
    groups = []
    for b in np.unique(buckets):
        pos = np.nonzero(buckets == b)[0]
        lens_g = lens[pos]
        maxlen = int(lens_g.max())
        pad = np.zeros((len(pos), maxlen), dtype="uint64")
        if maxlen:
            blob = np.frombuffer(
                b"".join(enc[i] for i in pos), dtype=np.uint8
            ).astype("uint64")
            mask = np.arange(maxlen)[None, :] < lens_g[:, None]
            pad[mask] = blob  # row-major fill == concatenation order
        groups.append((pos, lens_g, pad))
    return valid, groups


def _horner_pass(pad, lens, keep_prefixes: bool):
    """Polynomial prefix hashes mod 2^61-1: one Horner step per byte
    POSITION over the group (32-bit limb multiply; the 2^61 overflow folds
    via the Mersenne identity 2^61 ≡ 1 — bit-for-bit the scalar
    h = (h*257 + byte) % M). keep_prefixes=True returns the full
    (n, maxlen+1) prefix matrix (positions past a row's length hold
    garbage the caller must mask); False returns only each row's final
    hash (O(n) memory)."""
    import numpy as np

    M = np.uint64((1 << 61) - 1)
    BASE = np.uint64(257)
    LOW32 = np.uint64(0xFFFFFFFF)
    LOW29 = np.uint64((1 << 29) - 1)

    n, maxlen = pad.shape
    P = np.zeros((n, maxlen + 1), dtype="uint64") if keep_prefixes else None
    h = np.zeros(n, dtype="uint64")
    for j in range(maxlen):
        hi, lo = h >> np.uint64(32), h & LOW32
        a = hi * BASE
        top = (a >> np.uint64(29)) + ((a & LOW29) << np.uint64(32))
        tot = top + lo * BASE + pad[:, j]
        tot = (tot >> np.uint64(61)) + (tot & M)
        tot = np.where(tot >= M, tot - M, tot)
        h = np.where(j < lens, tot, h)  # freeze each row at its length
        if P is not None:
            P[:, j + 1] = tot
    return h, P


def _mulmod_const(a, c: int):
    """(a * c) mod 2^61-1 for uint64 arrays a < M and constant c < M —
    31/30-bit limb products, each < 2^62, folded via 2^61 ≡ 1."""
    import numpy as np

    M = np.uint64((1 << 61) - 1)
    a1, a0 = a >> np.uint64(31), a & np.uint64((1 << 31) - 1)
    c1, c0 = np.uint64(c >> 31), np.uint64(c & ((1 << 31) - 1))

    def fold(x):
        x = (x >> np.uint64(61)) + (x & M)
        return np.where(x >= M, x - M, x)

    # a*c = a1c1·2^62 + (a1c0 + a0c1)·2^31 + a0c0; 2^62 ≡ 2
    t = fold(a1 * c1 * np.uint64(2))

    def shift31(x):  # x·2^31 mod M for x < 2^61
        return (x >> np.uint64(30)) + ((x & np.uint64((1 << 30) - 1)) << np.uint64(31))

    t = fold(t + fold(shift31(a1 * c0)))
    t = fold(t + fold(shift31(a0 * c1)))
    return fold(t + fold(a0 * c0))


def content_chunk_bounds(k: int = 8, boundary_mask: int = 63):
    """Content-defined chunk boundaries (Rabin/winnowing-style, the
    chunk-granularity dedup primitive for training pipelines): a boundary
    ends at 1-based byte position e when the k-gram polynomial hash of
    bytes [e-k, e) satisfies hash & boundary_mask == 0 (expected chunk ≈
    boundary_mask+1 bytes). Window hashes come from prefix differences —
    W[i] = P[i+k] - P[i]·257^k (mod 2^61-1) — so the whole batch is two
    matrix ops after the shared prefix pass; no per-row hashing.

    Returns a pandas UDF: text → array<int> of boundary end positions
    (null text → null; shorter than k bytes → empty array)."""
    import numpy as np

    M = (1 << 61) - 1
    bk = pow(257, k, M)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _bounds(texts: pd.Series) -> pd.Series:
        valid, groups = _length_groups(texts)
        out = pd.Series([None] * len(texts), index=texts.index, dtype="object")
        if not groups:
            return out
        res: list[list[int] | None] = [None] * int(valid.sum())
        for pos, lens_g, pad in groups:
            maxlen = pad.shape[1]
            if maxlen < k:
                for p in pos:
                    res[p] = []
                continue
            _, P = _horner_pass(pad, lens_g, keep_prefixes=True)
            # W[:, c] = hash of window starting at byte c (0-based)
            diff = P[:, k:] + np.uint64(M) - _mulmod_const(P[:, :-k], bk)
            diff = (diff >> np.uint64(61)) + (diff & np.uint64(M))
            W = np.where(diff >= M, diff - np.uint64(M), diff)
            ends = np.arange(k, maxlen + 1)  # 1-based end per column
            hit = (W & np.uint64(boundary_mask) == 0) & (
                ends[None, :] <= lens_g[:, None]
            )
            for gi, p in enumerate(pos):
                res[p] = [int(e) for e in ends[hit[gi]]]
        out[valid] = pd.Series(res, index=out.index[valid], dtype="object")
        return out

    return _bounds


@pandas_udf(T.LongType())
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash over UTF-8 bytes mod 2^61-1 (Mersenne prime),
    numpy-vectorized: one Horner step per byte POSITION over each
    length-bucketed row group (shared _length_groups/_horner_pass core),
    not per row; O(rows) memory (no prefix matrix). Bit-for-bit identical
    to the scalar h = (h*257 + byte) % M, which the DuckDB HUGEINT
    list_reduce oracle reproduces."""
    import numpy as np

    valid, groups = _length_groups(texts)
    res = pd.Series([None] * len(texts), index=texts.index, dtype="object")
    if groups:
        final = np.zeros(int(valid.sum()), dtype="uint64")
        for pos, lens_g, pad in groups:
            h, _ = _horner_pass(pad, lens_g, keep_prefixes=False)
            final[pos] = h
        res[valid] = pd.Series(
            final.astype("int64"), index=res.index[valid], dtype="object"
        )
    return res


# PII-style redaction patterns — chosen to mean the same thing in Java
# regex (Spark) and RE2 (DuckDB oracle): no lookaround, no backrefs
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_text(col: Column) -> Column:
    """Deterministic PII-style scrubbing for training corpora: emails,
    IPv4 addresses and international phone numbers collapse to typed
    placeholder tokens. Pure chained regexp_replace — JVM-side, codegen,
    no UDF; order matters (emails first, so their dotted domains aren't
    half-eaten by the IP pattern)."""
    out = col
    for _, pat, rep in REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def redaction_counts(col: Column) -> list[Column]:
    """Per-pattern match counts (redaction accounting for batch metrics)."""
    return [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in REDACT_PATTERNS
    ]
