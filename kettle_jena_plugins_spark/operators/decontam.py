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


def ngram_stream(col: Column, n: int) -> Column:
    """ALL word n-grams (space-joined, lowercased) in document order,
    duplicates preserved; docs shorter than n tokens yield an empty array.

    Formulated as ``zip_with`` over n shifted copies of the token array so
    ``split()`` is evaluated once per ROW (argument position). The obvious
    transform-over-indices formulation references the token array inside
    the lambda BODY, and interpreted higher-order lambdas re-evaluate the
    body per ELEMENT — O(tokens²) splits per doc, the projection-collapse
    trap (CLAUDE.md; measured 10× on this operator). zip_with pads the
    shorter side with null and ``concat`` propagates it, so the trailing
    n−1 slots null out and ``array_compact`` trims them."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    g = toks
    for k in range(1, n):
        g = F.zip_with(
            g,
            F.slice(toks, k + 1, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_compact(g)


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Distinct, space-joined word n-grams of the lowercased text
    (first-occurrence order)."""
    return F.array_distinct(ngram_stream(col, n))


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
