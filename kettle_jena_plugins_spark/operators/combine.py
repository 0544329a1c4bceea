"""Combine operator — horizontal merge of columns within a row.

Reference: JenaCombineStep (combine/JenaCombineStep.java:44-340) unions N
graph columns of one row into one, with PER-COLUMN IGNORE/WARN/ERROR
policies for missing columns (actionIfNoSuchField) and null values
(actionIfNull) — getModels :217-277 — and optional removal of consumed
columns (willRemoveFields :204-215).

Spark-first: for scalar payloads the union-of-partial-values is
``coalesce`` in declared column order (first non-null wins — the CDC
partial-update merge); for set-valued columns it is ``array_union``/
``map_concat``. Policy resolution:
  missing column — resolved at plan time (schema is static per batch):
    IGNORE → skip; WARN → skip + per-row warn count (the reference logs
    once per row, :241); ERROR → raise before execution (the reference
    throws per row; Catalyst lets us fail fast at analysis).
  null value — resolved per row: IGNORE → coalesce skips it; WARN →
    coalesce skips it AND the row increments the warn observation
    (logBasic :259); ERROR → F.raise_error at execution (:264).
WARN counts surface through an attachable Observation
(`combine_warnings`, column `n_warn`) — the engine's metrics analogue of
the reference's log stream.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .validate import Policy


class MissingColumnError(ValueError):
    pass


@dataclass(frozen=True)
class CombineField:
    """Per-column policy holder — the reference's ConstrainedField
    (fieldName, actionIfNoSuchField, actionIfNull)."""

    name: str
    if_missing: Policy = Policy.ERROR
    if_null: Policy = Policy.IGNORE


def combine_columns(
    df: DataFrame,
    source_cols: Sequence[str | CombineField],
    target_col: str,
    if_missing: Policy = Policy.ERROR,
    remove_sources: bool = True,
    set_valued: bool = False,
    observe_warnings=None,
) -> DataFrame:
    """First-non-null (scalar) or set-union (array) combine of source_cols
    into target_col, in declared order (head column first — the reference's
    mutate-first-model head semantics, JenaCombineStep.java:279-339).

    source_cols entries may be plain names (using the `if_missing` default
    and null-IGNORE) or CombineField for per-column policies. Pass an
    Observation (or True) as observe_warnings to count WARN hits."""
    fields = [
        c if isinstance(c, CombineField) else CombineField(c, if_missing)
        for c in source_cols
    ]
    cols: list[Column] = []
    warn_cols: list[Column] = []
    for cf in fields:
        if cf.name not in df.columns:
            if cf.if_missing is Policy.ERROR:
                raise MissingColumnError(
                    f"column {cf.name} not in input (policy ERROR)"
                )
            if cf.if_missing is Policy.WARN:
                # the reference logs the absent column once per row (:241)
                warn_cols.append(F.lit(1))
            continue  # IGNORE / WARN: column skipped
        if cf.if_null is Policy.WARN:
            warn_cols.append(
                F.when(F.col(cf.name).isNull(), F.lit(1)).otherwise(F.lit(0))
            )
        cols.append(F.col(cf.name))
    if not cols:
        combined = F.lit(None)
    elif set_valued:
        combined = cols[0]
        for c in cols[1:]:
            combined = F.array_union(combined, c)
    else:
        combined = F.coalesce(*cols) if len(cols) > 1 else cols[0]
    # null-ERROR must fire for ANY null in an ERROR column (the reference's
    # getModels throws per row, :264) — a raise embedded in the coalesce
    # would be skipped whenever an earlier column already supplied the
    # value, so guard the final expression instead. Wrapped in reverse so
    # the FIRST declared ERROR column's message wins (reference iteration
    # order).
    for cf in reversed([f for f in fields if f.name in df.columns]):
        if cf.if_null is Policy.ERROR:
            combined = F.when(
                F.col(cf.name).isNull(),
                F.raise_error(
                    F.lit(
                        f"Could not combine model, field: {cf.name}, "
                        "value is null!"
                    )
                ),
            ).otherwise(combined)
    out = df.withColumn(target_col, combined)
    if observe_warnings:
        # no WARN columns → still attach a zero metric when the caller gave
        # an Observation, or Observation.get would block forever
        total = warn_cols[0] if warn_cols else F.lit(0)
        for w in warn_cols[1:]:
            total = total + w
        agg = F.sum(total).alias("n_warn")
        from pyspark.sql import Observation

        if isinstance(observe_warnings, Observation):
            out = out.observe(observe_warnings, agg)
        elif warn_cols:
            out = out.observe("combine_warnings", agg)
    if remove_sources:
        out = out.drop(*[cf.name for cf in fields if cf.name != target_col])
    return out
