"""Transcript assembly: fold the per-turn table state back into one document
per conversation — the bridge from the CDC-maintained transcripts table to
the training-data side of the engine (dedup / profiling / curation all
consume documents).

Reference analogue: Group-and-Merge concatenates grouped rows into one model
per group (JenaGroupMergeStep.java:227-240); here the group is the
conversation and the "merge" is deterministic turn-ordered text assembly.

Scale design: ONE hash aggregation on conv_id. Turn order is restored
INSIDE the aggregation (collect struct(turn_idx, ...) → sort_array →
array_join), not via a window sort: hash agg gets map-side partial
aggregation, so only ~n_convs assembled groups cross the shuffle, and no
key-partition-wide sort is needed. Per-group memory is one conversation
(≤ turns_per_conv rows) — bounded regardless of corpus size. token totals
ride the same agg (no second pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count


def assemble_transcripts(
    state: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    lsn_col: str = "lsn",
    sep: str = "\n",
) -> DataFrame:
    """→ one row per conversation: doc (``role: text`` lines in turn order),
    n_turns, n_tokens (whitespace tokens over all turns), last_lsn (lineage:
    the newest event version folded into this document)."""
    line = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    turn = F.struct(F.col(turn_col).alias("i"), line.alias("line"))
    agg = state.groupBy(conv_col).agg(
        F.sort_array(F.collect_list(turn)).alias("__turns"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        F.max(F.col(lsn_col)).alias("last_lsn"),
    )
    doc = F.array_join(F.transform(F.col("__turns"), lambda t: t["line"]), sep)
    return agg.select(
        conv_col,
        doc.alias("doc"),
        "n_turns",
        "n_tokens",
        "last_lsn",
    )


def dedup_transcripts(
    state: DataFrame,
    conv_col: str = "conv_id",
    **assemble_kw,
) -> DataFrame:
    """Conversation-level exact dedup: assemble each conversation into its
    turn-ordered document, then normalized-hash groupBy — the CDC→curation
    bridge a transcript corpus runs per snapshot (identical conversations
    under different ids collapse to one training document). Keeps the
    lexicographically-smallest conv_id per group. Two hash aggs (assembly,
    dedup), both with map-side partials; nothing leaves the executors."""
    from .dedup import exact_dedup

    docs = assemble_transcripts(state, conv_col=conv_col, **assemble_kw)
    return exact_dedup(docs, text_col="doc", id_col=conv_col)


def lint_transcripts(
    state: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Structural quality report, one row per conversation — the
    transcript-shaped analogue of the SHACL dead-letter split
    (operators/validate.py): instead of rejecting rows, score whole
    conversations so curation can filter or repair them.

    Output per conv_id:
    - n_turns, max_turn_idx;
    - has_gaps: turn indices are not the dense prefix 0..n_turns-1
      (deleted or never-delivered turns);
    - n_empty: turns with null/blank text;
    - n_role_repeats: adjacent turns (in turn order) with the same role —
      broken user/assistant alternation;
    - first_role / last_role (turn order).

    Scale: one hash aggregation on conv_id; role adjacency is computed
    inside the agg from the collected (turn_idx, role) structs —
    per-conversation arrays are bounded by turns_per_conv, and no window
    sort/shuffle beyond the one agg (same discipline as
    ``assemble_transcripts``).
    """
    turn = F.struct(F.col(turn_col).alias("i"), F.col(role_col).alias("r"))
    empty = (
        F.col(text_col).isNull() | (F.length(F.trim(F.col(text_col))) == 0)
    ).cast("long")
    agg = state.groupBy(conv_col).agg(
        F.sort_array(F.collect_list(turn)).alias("__t"),
        F.count(F.lit(1)).alias("n_turns"),
        F.max(F.col(turn_col)).cast("long").alias("max_turn_idx"),
        F.sum(empty).alias("n_empty"),
    )
    roles = F.transform(F.col("__t"), lambda t: t["r"])
    repeats = F.size(
        F.filter(
            F.zip_with(
                roles,
                F.slice(roles, 2, F.greatest(F.size(roles) - 1, F.lit(1))),
                lambda a, b: a == b,
            ),
            lambda x: x,
        )
    ).cast("long")
    return agg.select(
        conv_col,
        "n_turns",
        "max_turn_idx",
        (F.col("max_turn_idx") != F.col("n_turns") - 1).alias("has_gaps"),
        "n_empty",
        repeats.alias("n_role_repeats"),
        F.element_at(roles, 1).alias("first_role"),
        F.element_at(roles, -1).alias("last_role"),
    )


def templated_turn_stats(
    state: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Cross-conversation template detection: a turn is *templated* when
    its normalized (role, text) occurs in ≥ ``min_count`` turns corpus-wide
    — canned greetings, repeated tool boilerplate, copy-pasted replies.
    Curation down-weights template-heavy conversations the same way
    span-level dedup down-weights duplicated documents.

    Scale: turns are keyed by ONE md5 over (role, normalized text) —
    counting and the join back both shuffle on that fixed-width key, never
    on raw text, and AQE reuses the count exchange; the conversation
    rollup is the only conv-keyed shuffle. Null-text turns are counted in
    n_turns but can never be templated.

    Returns (conv_id, n_turns, n_templated, templated_frac)."""
    # unit-separator delimiter prevents ("ab","c") / ("a","bc") collisions;
    # the oracle reproduces it as chr(31). concat (not concat_ws): a null
    # role must null the whole key exactly as SQL `||` does — concat_ws
    # would silently drop the field AND its separator, both diverging from
    # the oracle and colliding (null, "a\x1fb") with ("a", "b")
    key = F.md5(
        F.concat(
            F.col(role_col),
            F.lit("\x1f"),
            F.trim(F.lower(F.col(text_col))),
        )
    )
    turns = state.select(
        F.col(conv_col),
        F.when(F.col(text_col).isNotNull(), key).alias("k"),
    )
    counts = (
        turns.filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    templated = (F.col("cnt") >= min_count).cast("long")
    return (
        turns.join(counts, "k", "left")
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.coalesce(F.sum(templated), F.lit(0)).alias("n_templated"),
        )
        .select(
            conv_col,
            "n_turns",
            "n_templated",
            F.round(F.col("n_templated") / F.col("n_turns"), 6).alias(
                "templated_frac"
            ),
        )
    )


def agent_tool_stats(
    state: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation tool-usage profile for agent transcripts — how
    tool-call-heavy each conversation is and how deep its longest
    uninterrupted tool loop runs (a curation signal: degenerate agent
    loops show up as long max_tool_run, tool-free chat as tool_frac 0).

    Output per conv_id: n_turns, n_tool_turns (tool non-null),
    n_tools (distinct), tool_frac, max_tool_run (longest consecutive
    tool-turn run in turn order).

    Scale: ONE hash aggregation on conv_id (same discipline as
    ``lint_transcripts``); the run length folds over the collected,
    sorted (turn_idx, is_tool) structs with an ``aggregate`` lambda that
    touches only its accumulator/element — no window, no second shuffle;
    distinct tools via collect_set (bounded by the tool vocabulary, not
    the turn count). The oracle uses an independent gaps-and-islands
    window formulation."""
    is_tool = F.col(tool_col).isNotNull()
    turn = F.struct(F.col(turn_col).alias("i"), is_tool.alias("t"))
    agg = state.groupBy(conv_col).agg(
        F.sort_array(F.collect_list(turn)).alias("__t"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(is_tool.cast("long")).alias("n_tool_turns"),
        F.size(F.collect_set(F.col(tool_col))).alias("n_tools"),
    )
    flags = F.transform(F.col("__t"), lambda t: t["t"])
    step = lambda acc, x: F.struct(  # noqa: E731 — aggregate merge lambda
        F.when(x, acc["cur"] + 1).otherwise(F.lit(0)).alias("cur"),
        F.greatest(
            acc["best"], F.when(x, acc["cur"] + 1).otherwise(F.lit(0))
        ).alias("best"),
    )
    max_run = F.aggregate(
        flags,
        F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best")),
        step,
        lambda acc: acc["best"],
    )
    return agg.select(
        conv_col,
        "n_turns",
        "n_tool_turns",
        "n_tools",
        F.round(F.col("n_tool_turns") / F.col("n_turns"), 6).alias("tool_frac"),
        max_run.alias("max_tool_run"),
    )
