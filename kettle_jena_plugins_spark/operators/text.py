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
    """Polynomial rolling hash over UTF-8 bytes mod 2^61-1 (vectorized pandas
    UDF — custom hashing that built-ins can't express; the scale path for
    content-defined chunking / winnowing)."""
    MOD = (1 << 61) - 1
    BASE = 257

    def rh(t):
        if t is None:
            return None
        h = 0
        for byt in t.encode("utf-8"):
            h = (h * BASE + byt) % MOD
        return h

    return texts.map(rh)
