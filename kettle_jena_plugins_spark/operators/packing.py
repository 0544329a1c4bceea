"""Sequence packing: assign documents to fixed token-budget training windows
(the concat-then-chunk layout LLM pretraining loaders use).

Documents are concatenated in a deterministic order and the token stream is
cut every ``budget`` tokens; a document belongs to the window its FIRST token
falls in (``bin_idx``), with its offset inside that window and a flag when it
straddles the cut (the loader's split-or-pad decision). This is pure integer
arithmetic over a running token total — no text is materialized.

Scale design: a single global concatenation order would need a global sort —
a scale-killer and pointless, since training shards are independent anyway.
So packing is per-shard: ``shard = doc_id % n_shards`` (deterministic and
oracle-portable), one shuffle on shard, one in-partition sort, then a
running-sum window. Shards are balanced by construction (modular id), each
carrying ~corpus/n_shards tokens; at 100 TB you raise n_shards to keep
per-task state flat — the plan shape never changes. The reference has no
packing step (its unit is the row); this is engine-need machinery for the
training-data side, like dedup/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, shard, bin_idx, bin_offset, n_tokens, straddles).

    - shard: doc_id % n_shards — the independent packing stream;
    - bin_idx: which budget-sized window the doc STARTS in (per shard);
    - bin_offset: token offset of the doc inside that window;
    - straddles: true when the doc crosses into the next window.

    Empty documents (0 tokens) still occupy a position (offset of the
    running stream) but can never straddle.
    """
    ntok = token_count(F.col(text_col))
    d = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        ntok.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    d = d.select(id_col, "shard", "n_tokens", start)
    return d.select(
        id_col,
        "shard",
        F.floor(F.col("__start") / budget).cast("long").alias("bin_idx"),
        (F.col("__start") % budget).alias("bin_offset"),
        "n_tokens",
        (
            (F.col("__start") % budget) + F.col("n_tokens") > F.lit(budget)
        ).alias("straddles"),
    )
