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
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), round_dp).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
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
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), round_dp).alias("cos"),
    ).filter(F.col("cos") >= threshold)


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


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH (OR-amplification):
    candidates share the query's bucket in ANY of n_tables hash tables; exact
    cosine + rank over the deduped candidate set. Recall/cost dial:
    more tables ↑recall ↑candidates; more planes ↓candidates ↓recall.
    Recall measured against brute_force_topk in tests."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(lsh_buckets(F.col(vec_col), dim, n_planes, n_tables)).alias(
            "tb"
        ),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(lsh_buckets(F.col(vec_col), dim, n_planes, n_tables)).alias(
            "tb"
        ),
    )
    cand = (
        c.join(F.broadcast(q), on="tb")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
