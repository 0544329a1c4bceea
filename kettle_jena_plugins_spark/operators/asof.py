"""Point-in-time (as-of) join: each fact row picks the most recent dimension
row at or before its event time, per key.

The CDC-consumer counterpart of ``scd2_history``: joining a fact/event stream
to a slowly-changing dimension "as of" each event's timestamp. The reference
has no as-of operator (Kettle users emulate it with a sorted Stream Lookup);
the engine provides it natively because transcripts pipelines constantly need
"conversation metadata as of this turn".

Scale design — the union-tag / sorted-carry formulation:
- The naive encoding is a range join (``f.key = d.key AND d.ts <= f.ts`` +
  a max-per-fact reduction): Catalyst can only nested-loop or explode that,
  O(|facts| x |dims per key|) — a scale killer.
- Instead, UNION the tagged dim rows into the fact stream, hash-partition by
  key, sort each partition once by (ts, is_dim DESC), and carry the latest
  dim payload forward with ``last(..., ignorenulls=True)`` over an unbounded
  preceding running frame. ONE shuffle + one sort, linear in rows — the same
  plan shape Flink's temporal join and DuckDB's ASOF physical operator use;
  here it is expressed with stock Catalyst window machinery (codegen'd, no
  Python). The DuckDB oracle runs its native ASOF JOIN — an independent
  algorithm — so the contract check is cross-implementation.
- Dim rows sort BEFORE fact rows at equal ts (is_dim DESC), making the match
  inclusive (dim.ts <= fact.ts), matching DuckDB ASOF's ``>=`` semantics.

Dims must be unique per (key, ts) — pre-reduce with LWW if the dimension is
itself a change stream (the contract query dedups by max lsn).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str | Sequence[str] = "conv_id",
    ts_col: str = "ts",
    dim_prefix: str = "dim_",
) -> DataFrame:
    """As-of LEFT join: facts + the latest dim row with dim.ts <= fact.ts.

    Every non-key dim column comes back prefixed with ``dim_prefix`` (the
    dim's own ts column as ``<prefix>ts``); facts with no preceding dim row
    keep nulls — a left join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    dim_payload = [c for c in dims.columns if c not in keys]
    fact_payload = [c for c in facts.columns if c not in keys]

    carried = F.struct(*[F.col(c) for c in dim_payload]).alias("__dim")
    d = dims.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_dim"),
        carried,
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_payload],
    )
    f = facts.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_dim"),
        F.lit(None).cast(d.schema["__dim"].dataType).alias("__dim"),
        *fact_payload,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = f.unionByName(d).withColumn(
        "__carried", F.last("__dim", ignorenulls=True).over(w)
    )
    return joined.filter(F.col("__is_dim") == 0).select(
        *keys,
        *fact_payload,
        *[
            F.col(f"__carried.{c}").alias(f"{dim_prefix}{c}")
            for c in dim_payload
        ],
    )
