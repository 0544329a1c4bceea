"""Stateful sessionization (applyInPandasWithState): per-conversation
sessions close on event-time gaps, survive across micro-batches, and leave
still-open sessions unemitted (resume-safe state)."""

from __future__ import annotations

import datetime as dt

import pytest

from kettle_jena_plugins_spark.streaming.sessionize import sessionize
from tests.test_stream_watermark import SCHEMA, T0, _write_segment


def _drain_sessions(spark, wal, gap="2 minutes"):
    out: list = []
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(wal)
    )
    q = (
        sessionize(stream, gap=gap)
        .writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_session_closes_on_event_time_gap(spark, tmp_path):
    wal = str(tmp_path / "wal")
    s, m = dt.timedelta(seconds=1), dt.timedelta(minutes=1)
    # batch 1: conv a has 3 events tightly spaced; conv b has 1
    _write_segment(
        spark,
        wal,
        [
            ("I", 1, T0 + 1 * s, "a", 0),
            ("U", 2, T0 + 30 * s, "a", 0),
            ("I", 3, T0 + 45 * s, "a", 1),
            ("I", 4, T0 + 50 * s, "b", 0),
        ],
    )
    # batch 2: only conv b speaks, far in the future → watermark jumps past
    # a's last_ts + gap → a's session closes; b stays open
    _write_segment(spark, wal, [("I", 9, T0 + 30 * m, "b", 1)])
    # batch 3: advance watermark again so the timeout (registered vs the
    # batch-2 watermark) actually fires
    _write_segment(spark, wal, [("I", 10, T0 + 60 * m, "b", 2)])

    sessions = {r["conv_id"]: r for r in _drain_sessions(spark, wal)}
    assert "a" in sessions, f"conversation a never closed: {sessions}"
    a = sessions["a"]
    assert a["n_events"] == 3
    assert a["first_ts"] == T0 + 1 * s
    assert a["last_ts"] == T0 + 45 * s
    assert a["max_lsn"] == 3
    # b's last events are at the stream head — still open, not emitted
    assert "b" not in sessions or sessions["b"]["n_events"] == 1


def test_session_state_accumulates_across_batches(spark, tmp_path):
    wal = str(tmp_path / "wal")
    s, m = dt.timedelta(seconds=1), dt.timedelta(minutes=1)
    # conv a speaks in two consecutive batches within the gap → ONE session
    _write_segment(spark, wal, [("I", 1, T0 + 1 * s, "a", 0)])
    _write_segment(spark, wal, [("U", 2, T0 + 60 * s, "a", 0)])
    _write_segment(spark, wal, [("I", 9, T0 + 30 * m, "z", 0)])
    _write_segment(spark, wal, [("I", 10, T0 + 60 * m, "z", 1)])
    sessions = [r for r in _drain_sessions(spark, wal) if r["conv_id"] == "a"]
    assert len(sessions) == 1, sessions
    assert sessions[0]["n_events"] == 2
    assert sessions[0]["max_lsn"] == 2


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
