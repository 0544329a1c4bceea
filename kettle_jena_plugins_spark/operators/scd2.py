"""SCD Type-2 history: validity intervals from a change log.

Where ``lww_state`` (operators/lww.py) keeps only the final winner per key,
this operator keeps EVERY version as a row with a validity interval — the
standard "slowly changing dimension type 2" shape a warehouse consumer of the
CDC stream expects (valid_from / valid_to / is_current). The reference's
Group-and-Merge collapses groups to one row (JenaGroupMergeStep.java:227-240);
SCD2 is the engine-side complement that *preserves* the group's history under
the same declared total order (ts, lsn).

Semantics:
- every non-delete event opens a version valid from its own (ts, lsn);
- the NEXT event for the same key — of any op, including D — closes it
  (valid_to_* = that event's order columns, exclusive bound);
- delete events close their predecessor but emit no version row;
- ``is_current`` marks versions with no successor (an open interval).

Scale design: one shuffle on the merge key + an in-partition sort (the
window). Unlike LWW this cannot pre-aggregate map-side — history needs every
row — so the shuffle carries all events; that is inherent to the output, not
an implementation choice. Hot-key skew is bounded by per-conversation event
counts (turns_per_conv × update rate), not corpus size, so key partitions
stay small at 100 TB; AQE skew-split covers pathological logs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..model import LWW_ORDER, MERGE_KEYS


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str] = MERGE_KEYS,
    order: Sequence[str] = LWW_ORDER,
) -> DataFrame:
    """→ one row per non-delete event with its validity interval.

    Output: input columns (ts/lsn are the interval OPEN bound) plus, per
    order column ``c``, ``valid_to_<c>`` (the closing event's value, null
    while open) and ``is_current``.

    Requires a well-formed log: (ts, lsn) unique per key (duplicate
    redelivery must be deduplicated upstream, e.g. ``dropDuplicates`` on
    keys+order — otherwise replayed events create zero-length versions).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order], F.col("op"))
    out = changes
    for c in order:
        out = out.withColumn(f"valid_to_{c}", F.lead(c).over(w))
    closer = f"valid_to_{order[-1]}"
    out = out.withColumn(
        "is_current", F.col(closer).isNull() & (F.col("op") != F.lit("D"))
    )
    return out.filter(F.col("op") != "D")
