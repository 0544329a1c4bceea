"""Maxwell's-daemon changelog envelope source — the second de-facto MySQL
CDC wire format next to Debezium (sources/debezium.py).

Maxwell emits one flat JSON object per row change:
``{"database": ..., "table": ..., "type": "insert|update|delete|
bootstrap-insert", "ts": <seconds>, "xid": ..., "commit": true,
"position": "master.000006:800911", "data": {row}, "old": {changed cols}}``

Differences from Debezium that matter to this engine:

- ``ts`` is SECOND-granularity commit time (Debezium carries ts_us).
  LWW order is (ts, lsn), so intra-second ordering falls entirely to the
  lsn tiebreak — which is CORRECT for MySQL: the binlog position IS the
  commit total order; the timestamp is informational. A Maxwell-fed
  pipeline therefore converges on binlog order within each second
  (tests verify against a reference reducer over the coarsened order).
- there is no numeric LSN; ``position`` is "file:offset". The engine
  derives a monotone lsn = file_number·2⁴⁰ + offset (binlog offsets are
  < 2³², files rotate upward — the composite preserves total order
  across file rotations).
- ``data`` always carries the FULL row image (deletes included) and
  ``old`` only the changed columns' previous values, so the row image is
  ``data`` for every op (Debezium needs before/after selection).

Scale design mirrors debezium.py: ``from_json`` with an explicit schema
is one narrow whole-stage-codegen projection in the scan stage — no
shuffle, no Python. ``to_maxwell_json`` is the deterministic fixture
renderer (FIXTURES.md policy) used by the round-trip contract query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# full row image (the transcripts table shape, BASELINE.json
# input_hint) — shared across dialects via model.py
from ..model import PAYLOAD_SCHEMA as _ROW_SCHEMA

def _value_schema(row_schema: T.StructType) -> T.StructType:
    """Envelope schema for a given row-image shape (schema evolution:
    an extended row schema lets an evolved producer's new columns parse
    instead of being silently dropped by from_json)."""
    return T.StructType(
        [
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("xid", T.LongType(), True),
            T.StructField("commit", T.BooleanType(), True),
            T.StructField("position", T.StringType(), True),
            T.StructField("data", row_schema, True),
            T.StructField("old", row_schema, True),
        ]
    )


MAXWELL_VALUE_SCHEMA = _value_schema(_ROW_SCHEMA)

_OP_IN = {"insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D"}

# binlog offsets are < 2^32; a 40-bit offset field keeps the composite
# monotone across file rotations with headroom
_FILE_SHIFT = 1 << 40


def _position_to_lsn(position: Column) -> Column:
    """"master.000006:800911" → 6·2⁴⁰ + 800911 (monotone across files)."""
    file_num = F.regexp_extract(position, r"\.(\d+):", 1).cast("long")
    offset = F.regexp_extract(position, r":(\d+)$", 1).cast("long")
    return file_num * F.lit(_FILE_SHIFT) + offset


def parse_maxwell(
    raw: DataFrame,
    value_col: str = "value",
    table: str | None = None,
    payload_schema: T.StructType | None = None,
) -> DataFrame:
    """Maxwell JSON envelope strings → canonical change events.

    - type: insert / bootstrap-insert → I, update → U, delete → D;
      unknown types become null ops for the dead-letter split.
    - Maxwell streams every table of the database on one topic: pass
      ``table`` to keep only the target table's rows (scan-stage filter).
    - ``commit: false`` rows (mid-transaction fragments when Maxwell runs
      with transaction buffering off) are still events — MySQL applies
      them atomically at commit, but their binlog positions already order
      them correctly, so they pass through.
    """
    # parse ONCE into a struct column, then filter/project from it — a
    # second from_json in a separate Filter operator would not be CSE'd
    # with the projection's parse, JSON-decoding every row twice
    rs = payload_schema or _ROW_SCHEMA
    out = raw.filter(F.col(value_col).isNotNull()).select(
        F.from_json(F.col(value_col), _value_schema(rs)).alias("_env")
    )
    p = F.col("_env")
    op_col: Column = F.lit(None).cast("string")
    for k, v in _OP_IN.items():
        op_col = F.when(p["type"] == k, F.lit(v)).otherwise(op_col)
    if table is not None:
        # null-safe: a malformed envelope (null table) must reach the
        # dead-letter split as a null-op row, not vanish in this filter
        out = out.filter(p["table"].isNull() | (p["table"] == table))
    return out.select(
        op_col.alias("op"),
        _position_to_lsn(p["position"]).alias("lsn"),
        F.timestamp_seconds(p["ts"]).alias("ts"),
        *[p["data"][f.name].alias(f.name) for f in rs.fields],
    )


def to_maxwell_json(
    changes: DataFrame,
    value_col: str = "value",
    database: str = "app",
    table: str = "transcripts",
) -> DataFrame:
    """Canonical change events → Maxwell envelope JSON strings
    (deterministic fixture renderer; inverse of ``parse_maxwell`` up to
    Maxwell's second-granularity ts — the round-trip contract query's
    oracle coarsens identically)."""
    # shiftrightunsigned, not double division: lsn / 2^40 in double is
    # only exact below 2^53, and a composite lsn from a high binlog file
    # number exceeds that — the shift is exact for the full long range
    pos = F.format_string(
        "master.%06d:%d",
        F.shiftrightunsigned(F.col("lsn"), 40),
        F.pmod(F.col("lsn"), F.lit(_FILE_SHIFT)).cast("long"),
    )
    envelope = F.struct(
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.when(F.col("op") == "D", F.lit("delete"))
        .when(F.col("op") == "U", F.lit("update"))
        .otherwise(F.lit("insert"))
        .alias("type"),
        F.floor(F.unix_micros("ts") / 1_000_000).cast("long").alias("ts"),
        F.col("lsn").alias("xid"),
        F.lit(True).alias("commit"),
        pos.alias("position"),
        # row image inferred from the input's columns, so evolved
        # streams render their new columns
        F.struct(
            *[c for c in changes.columns if c not in ("op", "lsn", "ts")]
        ).alias("data"),
    )
    return changes.select(F.to_json(envelope).alias(value_col))
