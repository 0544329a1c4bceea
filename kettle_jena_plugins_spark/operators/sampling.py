"""Deterministic stratified sampling for corpus curation.

Training mixes are specified as per-stratum rates ("keep 30% of web text,
100% of books, 5% of lang=xx"): this module applies such a policy
deterministically, so re-running the pipeline (or resuming after failure)
selects the SAME rows — sampling decisions are a pure function of
(seed, key), never of partitioning, task retries, or row order. The
reference has no sampler; the engine needs one because curation feeds the
same documents table the dedup/profile family consumes.

Two formulations, chosen by what the policy fixes:

- ``stratified_sample`` (rate-exact, scale path): keep a row iff the first
  8 hex digits of md5(seed || key) fall below floor(rate * 16^8). ZERO
  shuffles — a narrow filter the scan can evaluate, trivially correct at any
  scale, and stable under resharding. The per-stratum rate arrives via a
  broadcast join of the (stratum, rate) policy table (small by nature).
  Sampled counts are Binomial(n_stratum, rate) — rate-exact, not count-exact.

- ``stratified_sample_exact`` (count-exact): rank rows within each stratum
  by the same md5 order and keep rank <= quota. Needs ONE shuffle on the
  stratum key plus an in-partition sort; strata are few and large, so this
  is the skew-prone path — use it when exact quotas are contractual
  (eval-set carving), the hash-rate path otherwise. (A 100-TB count-exact
  sample would instead two-phase it: sample at rate*(1+eps) narrowly, then
  rank only the survivors — compose `stratified_sample` + this.)

md5 (not xxhash64) so the DuckDB oracle reproduces the exact selection —
the engine's portable-hash policy (CLAUDE.md).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rate_threshold(rate: float) -> str:
    """rate in [0,1] → 8-hex-digit threshold string; a row is kept iff
    substr(md5(...),1,8) < threshold (string compare: hex is lexicographic)."""
    t = min(max(int(rate * 16**8), 0), 16**8)
    # 'g' sorts above every hex digit => rate 1.0 keeps everything
    return "g" if t >= 16**8 else format(t, "08x")


def sample_key(seed: str, key_col: Column) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), key_col.cast("string"))), 1, 8)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Rate-exact deterministic sample: narrow filter, no shuffle.

    ``rates`` maps stratum value → keep rate; strata absent from the policy
    get ``default_rate`` (0.0 = drop, the safe curation default).
    """
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(rate_threshold(rate))
        ).otherwise(thr)
    return df.filter(sample_key(seed, F.col(key_col)) < thr)


def mixture_sample(
    df: DataFrame,
    weights: Mapping[str, float],
    budget: int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Domain-mixture sampling: given target mixture ``weights`` (stratum →
    share of the training mix) and a document ``budget``, derive each
    stratum's keep-rate = min(1, budget·weight / n_stratum) from the
    corpus's OWN counts and apply it as a deterministic hash filter. This is
    the two-step a real mixing job runs: measure what you have, then sample
    each domain toward the mix you want (domains too small to fill their
    share keep everything — rate caps at 1).

    Scale shape: one tiny counts agg (O(#strata) rows) broadcast-joined
    back, then the same zero-shuffle md5-threshold filter as
    ``stratified_sample`` — rates never touch the driver, counts never
    re-shuffle the corpus. Adds ``n_stratum``/``rate`` columns so the sample
    is self-describing.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_stratum"))
    w_col: Column = F.lit(0.0)
    for value, wt in sorted(weights.items()):
        w_col = F.when(F.col(stratum_col) == value, F.lit(float(wt))).otherwise(
            w_col
        )
    rate = F.least(
        F.lit(1.0), F.lit(float(budget)) * w_col / F.col("n_stratum")
    )
    u = F.conv(sample_key(seed, F.col(key_col)), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    return (
        df.join(F.broadcast(counts), stratum_col)
        .withColumn("rate", F.round(rate, 6))
        .filter(u < rate)
    )


def training_order(
    df: DataFrame,
    n_shards: int = 8,
    seed: str = "s0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training order: every row gets a (shard, pos)
    coordinate from a seeded md5 permutation — the shuffled data order a
    training run consumes, reproducible across reruns/retries/partitionings
    because it is a pure function of (seed, key). Changing the seed reshuffles;
    changing nothing re-yields byte-identical order (epoch = seed suffix).

    Scale shape: shard assignment is a narrow hash map; within-shard
    positions need ONE shuffle on shard + an in-partition sort — no global
    sort, no single-reducer total order. Shards are hash-balanced, so at
    100 TB each sort is 1/n_shards of the corpus; downstream readers consume
    shard files independently in (shard, pos) order."""
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.substring(h, 9, 8), F.col(key_col)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
    )


def importance_sample(
    df: DataFrame,
    rate_col: str,
    key_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Continuous importance sampling: every row carries its OWN keep-rate
    in ``rate_col`` (a quality score, a domain prior, an upsampling factor
    clamped to [0,1]) and survives iff the seeded md5 uniform falls under
    it — quality-weighted corpus thinning as a pure narrow filter. Like
    the stratified/mixture samplers the decision is a function of
    (seed, key) only: retries, resharding and reruns keep identical rows.
    Zero shuffle; the rate expression fuses into the scan's codegen."""
    u = F.conv(sample_key(seed, F.col(key_col)), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    return df.filter(u < F.col(rate_col))


def stratified_sample_exact(
    df: DataFrame,
    quotas: Mapping[str, int],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Count-exact deterministic sample: md5-rank within stratum, keep the
    first ``quota`` rows. One shuffle; adds a ``sample_rank`` column.
    Strata absent from the policy are dropped."""
    q: Column = F.lit(0)
    for value, quota in sorted(quotas.items()):
        q = F.when(F.col(stratum_col) == value, F.lit(quota)).otherwise(q)
    w = Window.partitionBy(stratum_col).orderBy(
        sample_key(seed, F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= q)
    )
