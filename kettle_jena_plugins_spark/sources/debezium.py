"""Debezium-style changelog envelope source.

Real WAL tails rarely arrive as clean typed columns: the de-facto wire format
is the Debezium JSON envelope (``payload.before`` / ``payload.after`` /
``payload.op`` c|r|u|d / ``payload.source.lsn`` / ``payload.ts_ms``,
microsecond commit time in ``payload.source.ts_us`` since Debezium 2.x).
This module parses that envelope into the engine's canonical
CHANGE_EVENT_SCHEMA so everything downstream (LWW, SCD2, MERGE sinks) is
format-agnostic — the engine analogue of the reference accepting whatever
rows the Kettle injector step feeds it (JenaGroupMergeStepIT.java:64).

Scale design: ``from_json`` with an explicit schema is a single narrow,
whole-stage-codegen'd projection — no shuffle, no Python, schema-pruned (the
parser materializes only the fields the plan reads). At 10^10 events this is
the right shape: parsing cost is per-row CPU inside the scan stage.

``to_debezium_json`` is the deterministic fixture renderer (the engine's own
seeded-fixture policy, FIXTURES.md): the contract query round-trips the
derived change stream through the envelope and must land byte-identical
final state against the plain-columns oracle — proving the parser, the op
mapping, and the microsecond timestamp path all preserve LWW order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# row image carried in before/after (the transcripts table shape,
# BASELINE.json input_hint) — shared across dialects via model.py
from ..model import PAYLOAD_SCHEMA as _ROW_SCHEMA


def _value_schema(row_schema: T.StructType) -> T.StructType:
    """Envelope schema for a given row-image shape (schema evolution:
    pass an extended row schema — e.g. model.CHANGE_EVENT_SCHEMA_V2's
    payload with ``tool_meta`` — and the new columns parse instead of
    being silently dropped by the fixed from_json schema)."""
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("before", row_schema, True),
                        T.StructField("after", row_schema, True),
                        T.StructField("op", T.StringType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField(
                            "source",
                            T.StructType(
                                [
                                    T.StructField(
                                        "lsn", T.LongType(), True
                                    ),
                                    T.StructField(
                                        "ts_us", T.LongType(), True
                                    ),
                                ]
                            ),
                            True,
                        ),
                    ]
                ),
                True,
            )
        ]
    )


DEBEZIUM_VALUE_SCHEMA = _value_schema(_ROW_SCHEMA)

_OP_IN = {"c": "I", "r": "I", "u": "U", "d": "D"}


def parse_debezium(
    raw: DataFrame,
    value_col: str = "value",
    payload_schema: T.StructType | None = None,
) -> DataFrame:
    """JSON envelope strings → canonical change events.

    - op: c (create) and r (snapshot read) → I, u → U, d → D;
      unknown ops become null and should be routed to the dead-letter
      split (operators/validate.py) by the caller.
    - row image: ``after`` for upserts, ``before`` for deletes.
    - ts: ``source.ts_us`` (microseconds) when present, else ``ts_ms`` —
      microsecond precision matters because ts leads the LWW total order.
    - Kafka tombstones (null value) are dropped: the D event itself carries
      the deletion; the tombstone is a compaction hint, not an event.
    - ``payload_schema`` overrides the row-image shape for mid-stream
      schema evolution (added columns, widened types): from_json drops
      fields its schema doesn't name, so an evolved producer's new
      column NEEDS the extended schema to reach the lake's ALTER path
      (plans/evolution.py).
    """
    rs = payload_schema or _ROW_SCHEMA
    p = F.from_json(F.col(value_col), _value_schema(rs))["payload"]
    op_col: Column = F.lit(None).cast("string")
    for k, v in _OP_IN.items():
        op_col = F.when(p["op"] == k, F.lit(v)).otherwise(op_col)
    row = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    ts_us = F.coalesce(p["source"]["ts_us"], p["ts_ms"] * F.lit(1000))
    return raw.filter(F.col(value_col).isNotNull()).select(
        op_col.alias("op"),
        p["source"]["lsn"].alias("lsn"),
        F.timestamp_micros(ts_us).alias("ts"),
        *[row[f.name].alias(f.name) for f in rs.fields],
    )


def to_debezium_json(changes: DataFrame, value_col: str = "value") -> DataFrame:
    """Canonical change events → one-column DataFrame of envelope JSON strings
    (deterministic fixture renderer; inverse of ``parse_debezium``).
    The row image is inferred from the input's columns (everything
    beyond op/lsn/ts), so evolved streams render their new columns."""
    payload = [c for c in changes.columns if c not in ("op", "lsn", "ts")]
    image = F.struct(*payload)
    is_del = F.col("op") == "D"
    payload = F.struct(
        F.when(is_del, image).alias("before"),
        F.when(~is_del, image).alias("after"),
        F.when(is_del, F.lit("d"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        F.floor(F.unix_micros("ts") / 1000).cast("long").alias("ts_ms"),
        F.struct(
            F.col("lsn").alias("lsn"), F.unix_micros("ts").alias("ts_us")
        ).alias("source"),
    ).alias("payload")
    return changes.select(F.to_json(F.struct(payload)).alias(value_col))
