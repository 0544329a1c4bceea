"""Deterministic synthetic change-event generator (the engine's own seeded
fixture factory, FIXTURES.md: "the engine's own generator must produce the
same shapes — seeded, no external data").

Every column is a pure function of the row id (via xxhash64(id, seed)), so:
- the same (n_events, seed, knobs) produce byte-identical rows at ANY
  parallelism / partition count (required for the two-cluster-size scaling
  benchmark to run on identical input), and
- no data is ever materialized on the driver (spark.range → select).

Knobs: hot-key skew (hot_frac of events land on n_hot conversations — the
salting stress), delete/update mix, out-of-order fraction (ts decoupled from
lsn), duplicate delivery fraction (ids past n_events replay an earlier
event verbatim), mid-stream schema change (tool_meta appears for
lsn >= evolve_at).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _h(seed: int, *cols: Column | int) -> Column:
    return F.xxhash64(*[c if isinstance(c, Column) else F.lit(c) for c in cols],
                      F.lit(seed))


def _u(seed: int, salt: int, id_col: Column) -> Column:
    """uniform [0,1) derived from id."""
    return (F.pmod(_h(seed, salt, id_col), F.lit(1_000_000)) / 1_000_000.0)


def gen_change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 10_000,
    turns_per_conv: int = 100,
    p_update: float = 0.30,
    p_delete: float = 0.10,
    hot_frac: float = 0.0,
    n_hot: int = 4,
    ooo_frac: float = 0.10,
    dup_frac: float = 0.0,
    evolve_at: int | None = None,
    seed: int = 42,
    parallelism: int | None = None,
) -> DataFrame:
    """→ change-event DataFrame (CHANGE_EVENT_SCHEMA [+ tool_meta if
    evolve_at is set]); row count = n_events * (1 + dup_frac)."""
    n_total = int(n_events * (1 + dup_frac))
    rng = spark.range(0, n_total, numPartitions=parallelism)
    # duplicate ids replay an earlier event: same lsn, same payload
    rid = F.col("id")
    orig = F.when(
        rid >= n_events, F.pmod(_h(seed, 1, rid), F.lit(n_events))
    ).otherwise(rid)
    df = rng.select(orig.alias("eid"))

    eid = F.col("eid")
    u_conv = _u(seed, 2, eid)
    u_hot = _u(seed, 3, eid)
    conv_idx = F.when(
        u_hot < hot_frac, F.pmod(_h(seed, 4, eid), F.lit(n_hot))
    ).otherwise(F.pmod(_h(seed, 5, eid), F.lit(n_convs)))
    u_op = _u(seed, 6, eid)
    op = (
        F.when(u_op < p_delete, F.lit("D"))
        .when(u_op < p_delete + p_update, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    # event time: monotone in lsn except an ooo_frac slice shifted backwards
    ooo = _u(seed, 7, eid) < ooo_frac
    jitter = F.pmod(_h(seed, 8, eid), F.lit(5_000))
    ts_sec = F.when(ooo, eid - jitter).otherwise(eid).cast("long")
    ts = F.timestamp_seconds(F.lit(1_767_225_600) + ts_sec)  # 2026-01-01 UTC

    role = (
        F.when(F.pmod(eid, F.lit(3)) == 0, F.lit("user"))
        .when(F.pmod(eid, F.lit(3)) == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    # deterministic pseudo-text: three hash words + the event ordinal
    text = F.when(
        op == "D", F.lit(None).cast("string")
    ).otherwise(
        F.concat_ws(
            " ",
            F.concat(F.lit("tok"), F.pmod(_h(seed, 9, eid), F.lit(50_000))),
            F.concat(F.lit("tok"), F.pmod(_h(seed, 10, eid), F.lit(50_000))),
            F.concat(F.lit("tok"), F.pmod(_h(seed, 11, eid), F.lit(50_000))),
            F.concat(F.lit("e"), eid),
        )
    )
    tool = F.when(
        F.pmod(eid, F.lit(5)) == 0,
        F.concat(F.lit("tool_"), F.pmod(_h(seed, 12, eid), F.lit(20))),
    ).otherwise(F.lit(None).cast("string"))

    cols = [
        op.alias("op"),
        eid.cast("long").alias("lsn"),
        ts.alias("ts"),
        F.concat(F.lit("conv-"), conv_idx.cast("string")).alias("conv_id"),
        F.pmod(_h(seed, 13, eid), F.lit(turns_per_conv)).cast("int").alias(
            "turn_idx"
        ),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
    ]
    if evolve_at is not None:
        cols.append(
            F.when(
                eid >= evolve_at,
                F.concat(F.lit('{"v":'), F.pmod(_h(seed, 14, eid), F.lit(100)),
                         F.lit("}")),
            ).alias("tool_meta")
        )
    return df.select(*cols)
