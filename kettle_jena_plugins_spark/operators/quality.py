"""Rule-based document quality filtering (Gopher-style) for training-data
curation: per-document structural signals plus an explainable keep/drop
decision with the list of failed rules.

The reference pipeline's SHACL validate step (JenaShaclStep.java) splits a
stream into pass/dead-letter with per-reason accounting; this operator is
the text-corpus analogue — every signal is a pure built-in SQL expression
(JVM/codegen, oracle-checkable), the decision is a conjunction of named
rules, and the failed-rule list rides along for dead-letter routing and
batch metrics. Thresholds follow the Gopher/MassiveText heuristics
(Rae et al. 2021, §A1.1) adapted to the corpus at hand.

All signals are narrow (no shuffle, no UDF): token/line arrays are built
once per row and every lambda references only its element/accumulator —
never the backing array — so interpreted higher-order evaluation stays
O(tokens) per document (see CLAUDE.md on projection collapse).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import LANG_MARKERS, repetition_ratio, token_count


@dataclass(frozen=True)
class QualityRules:
    """Thresholds for the named rules; a document is kept iff every rule
    passes. Defaults are Gopher-shaped but loosened for short documents."""

    min_tokens: int = 10
    max_tokens: int = 100_000
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 12.0
    max_symbol_ratio: float = 0.1     # '#' + ellipsis per token
    min_alpha_frac: float = 0.8       # tokens containing a letter
    max_bullet_frac: float = 0.9      # lines starting with a bullet
    max_ellipsis_frac: float = 0.3    # lines ending with an ellipsis
    max_rep2: float = 0.5             # duplicate word-bigram fraction
    min_stopword_hits: int = 2        # English marker-word occurrences


def quality_signals(col: Column) -> dict[str, Column]:
    """The raw per-document signals, name → Column (all doubles except
    n_tokens/stop_hits). Empty/blank text yields zeros throughout."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    n_tok = token_count(col)
    denom = F.greatest(n_tok, F.lit(1))

    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_word_len = F.round(total_chars / denom, 6)

    n_symbols = (
        F.regexp_count(col, F.lit(r"#"))
        + F.regexp_count(col, F.lit(r"\.\.\."))
        + F.regexp_count(col, F.lit("…"))
    )
    symbol_ratio = F.round(n_symbols / denom, 6)

    alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    alpha_frac = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.round(alpha / denom, 6)
    )

    lines = F.split(col, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullets = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    ellipses = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )

    return {
        "n_tokens": n_tok,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "alpha_frac": alpha_frac,
        "bullet_frac": F.round(bullets / n_lines, 6),
        "ellipsis_frac": F.round(ellipses / n_lines, 6),
        "rep2": repetition_ratio(col, 2),
        "stop_hits": F.regexp_count(F.lower(col), F.lit(LANG_MARKERS["en"])),
    }


def _failed_rules(s: dict[str, Column], r: QualityRules) -> list[tuple[str, Column]]:
    """(rule name, failure condition) in fixed order — the order is part of
    the contract (fail_reasons arrays compare positionally)."""
    return [
        ("too_few_tokens", s["n_tokens"] < r.min_tokens),
        ("too_many_tokens", s["n_tokens"] > r.max_tokens),
        (
            "word_len_band",
            (s["mean_word_len"] < r.min_mean_word_len)
            | (s["mean_word_len"] > r.max_mean_word_len),
        ),
        ("symbol_ratio", s["symbol_ratio"] > r.max_symbol_ratio),
        ("alpha_frac", s["alpha_frac"] < r.min_alpha_frac),
        ("bullet_lines", s["bullet_frac"] > r.max_bullet_frac),
        ("ellipsis_lines", s["ellipsis_frac"] > r.max_ellipsis_frac),
        ("repetition", s["rep2"] > r.max_rep2),
        ("stopwords", s["stop_hits"] < r.min_stopword_hits),
    ]


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rules: QualityRules = QualityRules(),
) -> DataFrame:
    """Per-document signals + keep flag + failed-rule names. One narrow
    projection — composes with dedup/sampling stages without a shuffle."""
    c = F.col(text_col)
    s = quality_signals(c)
    failed = _failed_rules(s, rules)
    fail_reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in failed])
    )
    return df.select(
        F.col(id_col),
        *[v.alias(k) for k, v in s.items() if k != "stop_hits"],
        fail_reasons.alias("fail_reasons"),
        (F.size(fail_reasons) == 0).alias("keep"),
    )
