"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState`` (Arrow-batched per-key state, event-time timeout).

The reference's only cross-row state is one open group flushed on key change
or end-of-input (JenaGroupMergeStepData.java:48, flush
JenaGroupMergeStep.java:66-69) — correct only for sorted bounded input. The
engine's unbounded analogue: a conversation's "session" closes when its
event-time goes quiet for `gap` relative to the watermark, emitting ONE
summary row per session and clearing the state (bounded by live
conversations, evicted on timeout).

This is the engine's example of the custom-stateful-operator surface; the
CDC apply itself deliberately avoids per-key streaming state (LWW + MERGE
converge without it, SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, n_events long, first_ts timestamp, last_ts timestamp, "
    "max_lsn long"
)
# state carries epoch-millis longs (portable across Arrow state encoding)
STATE_SCHEMA = "n long, first_ms long, last_ms long, max_lsn long"

_MS = 1_000


def _session_fn(gap_ms: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_ms, last_ms, max_lsn = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_events": [n],
                    "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                    "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                    "max_lsn": [max_lsn],
                }
            )
            return
        n, first_ms, last_ms, max_lsn = (
            state.get if state.exists else (0, None, None, None)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            n += len(pdf)
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
            batch_max_lsn = int(pdf["lsn"].max())
            max_lsn = (
                batch_max_lsn if max_lsn is None else max(max_lsn, batch_max_lsn)
            )
        if n:
            state.update((n, first_ms, last_ms, max_lsn))
            # close the session when the watermark passes last event + gap
            state.setTimeoutTimestamp(last_ms + gap_ms)

    return fn


_UNIT_MS = {
    "ms": 1, "millisecond": 1, "milliseconds": 1,
    "s": _MS, "sec": _MS, "secs": _MS, "second": _MS, "seconds": _MS,
    "m": 60 * _MS, "min": 60 * _MS, "mins": 60 * _MS,
    "minute": 60 * _MS, "minutes": 60 * _MS,
    "h": 3600 * _MS, "hour": 3600 * _MS, "hours": 3600 * _MS,
    "d": 86400 * _MS, "day": 86400 * _MS, "days": 86400 * _MS,
}


def _parse_gap_ms(gap: str) -> int:
    """Spark-style interval string → ms; supports multi-part forms like
    '1 hour 30 minutes'. Raises a descriptive ValueError on bad input."""
    parts = gap.strip().lower().split()
    if not parts or len(parts) % 2:
        raise ValueError(
            f"invalid gap {gap!r}: expected '<n> <unit>' pairs, e.g. "
            "'90 seconds' or '1 hour 30 minutes'"
        )
    total = 0
    for n, unit in zip(parts[::2], parts[1::2]):
        if unit not in _UNIT_MS:
            raise ValueError(
                f"invalid gap unit {unit!r} in {gap!r}: accepted units are "
                f"{sorted(_UNIT_MS)}"
            )
        try:
            total += int(n) * _UNIT_MS[unit]
        except ValueError:
            raise ValueError(
                f"invalid gap amount {n!r} in {gap!r}: expected an integer"
            ) from None
    if total <= 0:
        raise ValueError(f"gap must be positive, got {gap!r}")
    return total


def sessionize(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "0 seconds",
    key_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One output row per closed conversation session. A session closes when
    no event for `gap` of EVENT time (watermark-driven, late-data-safe).
    Sessions still open at end-of-stream are not emitted (their state
    persists in the checkpoint and closes on a later run — resume-safe)."""
    gap_ms = _parse_gap_ms(gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
