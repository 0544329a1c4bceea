"""Benchmark decontamination: flag corpus documents that share word n-grams
with a (small) evaluation/benchmark set.

The standard training-data hygiene pass: before training on a crawled corpus,
remove documents that textually overlap held-out evaluation items, else eval
scores are contaminated. The reference has no such operator (it is a
row-level RDF toolkit); the engine carries it as a first-class curation step
alongside dedup (operators/dedup.py) because both consume the same
``documents`` shape and the same shingling discipline.

Semantics (the common n-gram collision rule, as in GPT-3/PaLM data cards):
- tokenize by whitespace on the lowercased text;
- form all contiguous n-grams (default n=5), DISTINCT within each document —
  overlap counts measure shared vocabulary of n-grams, not repetition;
- a (doc, bench) pair is reported when they share >= min_overlap n-grams.

Scale design:
- The benchmark side is SMALL by nature (eval suites are thousands of items
  vs billions of docs), so the n-gram join BROADCASTS the exploded bench
  n-grams: the corpus side is one narrow pass (tokenize -> n-gram ->
  explode) feeding a broadcast hash join + partial-aggregated count — the
  corpus is never shuffled, which is what makes this viable at 100 TB.
- Per-doc distinct n-grams via ``array_distinct`` BEFORE explode: the
  generator then emits each key once, bounding join fan-out by document
  length, not token frequency.
- ``bench_ngrams`` is reusable: compute once per eval suite, checkpoint it,
  and decontaminate every corpus shard against the same tiny table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Distinct, space-joined word n-grams of the lowercased text; documents
    shorter than n tokens yield an empty array (``sequence`` would count
    DOWN for start > stop — the guard is load-bearing)."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def bench_ngrams(bench: DataFrame, id_col: str = "bench_id",
                 text_col: str = "text", n: int = 5) -> DataFrame:
    """(bench_id, ngram) — the exploded benchmark n-gram table (tiny)."""
    return bench.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("ngram")
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """→ (doc_id, bench_id, n_overlap, n_doc_ngrams) for every contaminated
    pair: n_overlap distinct shared n-grams (>= min_overlap), n_doc_ngrams
    the document's distinct n-gram count (the denominator for any ratio
    policy the caller applies)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(F.col(text_col), n).alias("__grams"),
    ).select(
        "doc_id",
        F.size("__grams").alias("n_doc_ngrams"),
        F.explode("__grams").alias("ngram"),
    )
    b = bench_ngrams(bench, id_col=bench_id_col, text_col=text_col, n=n)
    hits = d.join(F.broadcast(b), "ngram")
    out = hits.groupBy("doc_id", F.col(bench_id_col), "n_doc_ngrams").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return out.filter(F.col("n_overlap") >= min_overlap).select(
        "doc_id", bench_id_col, "n_overlap", "n_doc_ngrams"
    )
