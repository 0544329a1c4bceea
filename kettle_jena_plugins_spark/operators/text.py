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


@pandas_udf(T.LongType())
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash over UTF-8 bytes mod 2^61-1 (Mersenne prime),
    numpy-vectorized: one Horner step per BYTE POSITION over the whole batch
    (a (n_rows × max_len) byte matrix), not per row. h*257 would overflow
    uint64, so the multiply runs in 32-bit limbs and the 2^61 overflow folds
    via the Mersenne identity 2^61 ≡ 1 (mod M) — bit-for-bit identical to
    the scalar h = (h*257 + byte) % M, which the DuckDB HUGEINT
    list_reduce oracle reproduces."""
    import numpy as np

    M = np.uint64((1 << 61) - 1)
    BASE = np.uint64(257)
    LOW32 = np.uint64(0xFFFFFFFF)
    LOW29 = np.uint64((1 << 29) - 1)

    valid = texts.notna().to_numpy()
    enc = [t.encode("utf-8") for t in texts[valid]]
    out = np.zeros(len(texts), dtype="uint64")
    if enc:
        lens = np.array([len(e) for e in enc], dtype="int64")
        blob = np.frombuffer(b"".join(enc), dtype=np.uint8).astype("uint64")
        n, maxlen = len(enc), int(lens.max())
        # row-major masked fill == concatenation order
        mask = np.arange(maxlen)[None, :] < lens[:, None]
        pad = np.zeros((n, maxlen), dtype="uint64")
        pad[mask] = blob
        h = np.zeros(n, dtype="uint64")
        for j in range(maxlen):
            hi, lo = h >> np.uint64(32), h & LOW32
            a = hi * BASE  # < 2^38
            # a<<32 mod M: fold the bits above 2^61 (Mersenne: 2^61 ≡ 1)
            top = (a >> np.uint64(29)) + ((a & LOW29) << np.uint64(32))
            tot = top + lo * BASE + pad[:, j]  # < 2^62: uint64-safe
            tot = (tot >> np.uint64(61)) + (tot & M)
            tot = np.where(tot >= M, tot - M, tot)
            h = np.where(mask[:, j], tot, h)
        out[valid] = h
    res = pd.Series(out.astype("int64"), index=texts.index, dtype="object")
    res[~valid] = None
    return res
