"""wal2json changelog envelope source — the de-facto Postgres
logical-decoding JSON wire format (format-version 2), the third dialect
next to Debezium (sources/debezium.py) and Maxwell (sources/maxwell.py).

wal2json v2 emits ONE JSON object per change (plus transaction framing):
``{"action":"I|U|D|B|C|T|M","schema":"public","table":"transcripts",
"columns":[{"name":...,"type":...,"value":...}],"identity":[...],
"lsn":"0/16B2D88","timestamp":"2026-01-01 12:00:00.123456+00"}``

Differences from the other two dialects that matter to this engine:

- the row image is POSITIONAL-SCHEMA-FREE: ``columns`` is an array of
  ``{name, type, value}`` objects (values in native JSON types), not a
  fixed struct. The parser rebuilds the typed row with
  ``map_from_entries`` + per-column casts — one narrow projection, no
  Python. A missing/absent ``value`` key reads as SQL NULL (wal2json
  emits ``"value":null``; ``from_json`` maps both spellings to null).
- ``action``: I/U carry the new row in ``columns``; D carries the old
  row in ``identity`` (the FULL image under ``REPLICA IDENTITY FULL``,
  which this engine requires for delete payloads — same contract as
  Debezium's ``before``). B/C are transaction framing (no table row) and
  are dropped — Postgres commit order is already total in the LSN.
  T (truncate) / M (message) become null ops for the dead-letter split.
- ``lsn`` is the textual XLogRecPtr ``"X/Y"`` (two 32-bit hex halves):
  numeric lsn = hi·2³² + lo, exact over the full 64-bit range via
  string-to-long conversion and shifts (never double math).
- ``timestamp`` is microsecond text with a ``+00`` offset; the session
  runs UTC (session.py pins spark.sql.session.timeZone) so parse and
  render invert exactly and LWW's (ts, lsn) order is preserved at full
  microsecond precision (unlike Maxwell's second-granularity ts).

Non-goal: wal2json format-version 1 (whole transactions grouped under a
``change`` array with positional columnnames/columnvalues and only a
transaction-level ``nextlsn``) — it carries no per-change LSN, so
mapping it onto this engine's (ts, lsn) LWW total order would require
inventing intra-transaction positions; v2 (one change per message,
``include-lsn``) is the streaming-friendly configuration and the one
this source speaks.

Scale design mirrors debezium.py: one ``from_json`` with an explicit
schema in the scan stage (parse ONCE into a struct, filter and project
from the parsed column — maxwell.py's CSE lesson), whole-stage codegen,
no shuffle. ``to_wal2json`` is the deterministic fixture renderer
(FIXTURES.md policy) used by the round-trip contract query; it renders
each column entry with ``to_json`` so string escaping and native JSON
number typing are authentic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# {name, type, value} column entries; value is StringType on purpose:
# from_json folds ANY atomic JSON token (string, number, bool) to its
# text when the target field is string, so heterogeneous native-typed
# values survive one fixed schema and the casts happen per named column
_ENTRY = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("value", T.StringType(), True),
        ]
    )
)

WAL2JSON_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("columns", _ENTRY, True),
        T.StructField("identity", _ENTRY, True),
        T.StructField("lsn", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
    ]
)

_TX_FRAMING = ("B", "C")  # begin/commit — framing, not row changes

# default projected row shape (the transcripts table, BASELINE.json
# input_hint) — shared across dialects via model.py; evolution passes
# an extended schema via payload_schema
from ..model import PAYLOAD_SCHEMA as _DEFAULT_ROW

# Spark simpleString → Postgres type name for the renderer's entries
_PG_TYPES = {
    "int": "integer",
    "smallint": "smallint",
    "bigint": "bigint",
    "double": "double precision",
    "float": "real",
    "boolean": "boolean",
    "timestamp": "timestamp with time zone",
}

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _lsn_to_long(lsn: Column) -> Column:
    """'0/16B2D88' → hi·2³² + lo, exact for the full 64-bit XLogRecPtr."""
    parts = F.split(lsn, "/")
    hi = F.conv(parts[0], 16, 10).cast("long")
    lo = F.conv(parts[1], 16, 10).cast("long")
    return F.shiftleft(hi, 32) + lo


def parse_wal2json(
    raw: DataFrame,
    value_col: str = "value",
    table: str | None = None,
    payload_schema: T.StructType | None = None,
    set_cols_col: str | None = None,
) -> DataFrame:
    """wal2json v2 envelope strings → canonical change events.

    - action I → I, U → U, D → D; B/C framing rows are dropped; anything
      else (T truncate, M message) becomes a null op for the dead-letter
      split (operators/validate.py) by the caller.
    - row image: ``columns`` for I/U, ``identity`` for D (REPLICA
      IDENTITY FULL gives the full old row — the engine's delete
      contract, like Debezium's ``before``).
    - pass ``table`` to keep only the target table's rows (a logical
      slot streams every table of the database).
    - ``payload_schema`` overrides the projected row shape for
      mid-stream schema evolution; the column-array image is already
      positional-free, so an extended schema just adds projections +
      casts — the envelope schema itself never changes.
    - ``set_cols_col``: also emit the envelope's column NAMES as an
      array under this name — wal2json's column array is naturally
      sparse without REPLICA IDENTITY FULL (TOASTed/unchanged columns
      are omitted), and the name list is exactly the set-columns mask
      the cell-level merge consumes (operators/lww.py
      lww_reduce_partial; CDCConfig.partial_set_col). Key/order names
      in the list are harmless — the cell reduce only consults it for
      payload columns.
    """
    out = raw.filter(F.col(value_col).isNotNull()).select(
        F.from_json(F.col(value_col), WAL2JSON_VALUE_SCHEMA).alias("_env")
    )
    p = F.col("_env")
    # null-safe: a malformed envelope (null action) is NOT framing — it
    # must reach the dead-letter split as a null op, not vanish here
    out = out.filter(
        ~F.coalesce(p["action"].isin(*_TX_FRAMING), F.lit(False))
    )
    if table is not None:
        # null-safe like the framing filter above: a malformed envelope
        # (null table) must reach the dead-letter split, not vanish
        out = out.filter(p["table"].isNull() | (p["table"] == table))
    op_col: Column = (
        F.when(p["action"].isin("I", "U", "D"), p["action"])
        .otherwise(F.lit(None))
        .cast("string")
    )
    entries = F.when(p["action"] == "D", p["identity"]).otherwise(
        p["columns"]
    )
    row = F.map_from_entries(
        F.transform(
            entries,
            lambda c: F.struct(c["name"].alias("key"), c["value"].alias("value")),
        )
    )
    ts = F.to_timestamp(
        F.regexp_replace(p["timestamp"], r"\+00(:00)?$", ""), _TS_FMT
    )
    rs = payload_schema or _DEFAULT_ROW
    extra = (
        [F.transform(entries, lambda c: c["name"]).alias(set_cols_col)]
        if set_cols_col is not None
        else []
    )
    return out.select(
        op_col.alias("op"),
        _lsn_to_long(p["lsn"]).alias("lsn"),
        ts.alias("ts"),
        *[
            row[f.name].cast(f.dataType).alias(f.name)
            for f in rs.fields
        ],
        *extra,
    )


def _entry_json(name: str, pg_type: str, value: Column) -> Column:
    """One {"name":...,"type":...,"value":...} object as a JSON string.
    to_json supplies authentic escaping and native JSON typing (integer
    columns render unquoted); wal2json spells SQL NULL as "value":null."""
    obj = F.to_json(
        F.struct(
            F.lit(name).alias("name"),
            F.lit(pg_type).alias("type"),
            value.alias("value"),
        )
    )
    # to_json omits null fields; wal2json writes them explicitly
    return F.when(
        value.isNull(),
        F.lit(f'{{"name":"{name}","type":"{pg_type}","value":null}}'),
    ).otherwise(obj)


def to_wal2json(
    changes: DataFrame,
    value_col: str = "value",
    schema: str = "public",
    table: str = "transcripts",
) -> DataFrame:
    """Canonical change events → wal2json v2 envelope strings
    (deterministic fixture renderer; exact inverse of ``parse_wal2json``
    — microsecond ts and 64-bit lsn both survive the trip)."""
    lsn_txt = F.format_string(
        "%X/%X",
        F.shiftrightunsigned(F.col("lsn"), 32),
        F.col("lsn").bitwiseAND(F.lit(0xFFFFFFFF)),
    )
    # seconds via date_format (UTC session), fraction rendered exactly
    ts_txt = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.format_string(
            ".%06d+00", F.pmod(F.unix_micros("ts"), F.lit(1_000_000))
        ),
    )
    # row image inferred from the input's columns (evolved streams
    # render their new columns); pg type names derive from Spark types
    payload = [
        f for f in changes.schema.fields if f.name not in ("op", "lsn", "ts")
    ]
    row_json = F.concat(
        F.lit("["),
        F.concat_ws(
            ",",
            *[
                _entry_json(
                    f.name,
                    _PG_TYPES.get(f.dataType.simpleString(), "text"),
                    F.col(f.name),
                )
                for f in payload
            ],
        ),
        F.lit("]"),
    )
    body = F.when(
        F.col("op") == "D", F.format_string('"identity":%s', row_json)
    ).otherwise(F.format_string('"columns":%s', row_json))
    envelope = F.format_string(
        '{"action":"%s","schema":"%s","table":"%s",%s,"lsn":"%s",'
        '"timestamp":"%s"}',
        F.col("op"),
        F.lit(schema),
        F.lit(table),
        body,
        lsn_txt,
        ts_txt,
    )
    return changes.select(envelope.alias(value_col))
