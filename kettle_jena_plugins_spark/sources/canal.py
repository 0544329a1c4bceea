"""Alibaba Canal flat-message envelope source — the fourth CDC wire
dialect next to Debezium (sources/debezium.py), Maxwell
(sources/maxwell.py) and wal2json (sources/wal2json.py).

Canal tails the MySQL binlog and (in its common ``flatMessage=true``
Kafka/RocketMQ configuration) emits one JSON object per binlog
STATEMENT, with an ARRAY of row images::

    {"id": 7, "database": "app", "table": "transcripts",
     "pkNames": ["conv_id","turn_idx"], "isDdl": false,
     "type": "INSERT|UPDATE|DELETE", "es": 1589373515000,
     "ts": 1589373515477, "sql": "",
     "sqlType": {"conv_id": 12, ...}, "mysqlType": {"conv_id": "varchar(64)", ...},
     "data": [{row}, {row}, ...], "old": [{changed cols}, ...]}

Differences from the other dialects that matter to this engine:

- **Multi-row messages.** ``data`` carries every row a statement touched,
  in statement order. The engine flattens with ``posexplode`` — one
  narrow generator in the scan stage, no shuffle.
- **Every value is a JSON string.** Canal stringifies row values
  (``"turn_idx": "3"``, NULL → JSON null), so the row image is decoded
  as ``map<string,string>`` and numeric columns are cast back — the
  mysqlType/sqlType side maps describe the source types but the
  engine's target schema (BASELINE.json input_hint) is authoritative.
- **No binlog position in the envelope.** Unlike Maxwell's
  ``file:offset`` there is nothing positional per row; the monotone
  facts are the message ``id`` (canal's per-instance batch counter,
  assigned in binlog order) and the row's index inside ``data``. The
  engine derives ``lsn = id·2²⁰ + pos`` — total order across messages
  and within a statement, with 1M-row statement headroom. ``es``
  (binlog execute time) is MILLISECOND granularity, so LWW order is
  (ms-coarsened ts, derived lsn) — the lsn tiebreak carries
  intra-millisecond ordering exactly as in the Maxwell case (binlog
  order IS MySQL's commit order; ts is informational).
- ``data`` carries the FULL image for every op (deletes included);
  ``old`` holds only changed columns' previous values and is not needed
  for LWW apply.
- DDL messages (``isDdl: true`` — type CREATE/ALTER/ERASE/QUERY) carry
  no row images and are dropped at the scan; unknown DML types become
  null ops for the dead-letter split (operators/validate.py).

Scale design mirrors the other dialect modules: one ``from_json`` with
an explicit schema + one ``posexplode`` is a single whole-stage-codegen
projection in the scan stage — no shuffle, no Python. ``to_canal_json``
is the deterministic fixture renderer (FIXTURES.md policy) used by the
round-trip contract query; it emits one row per message with
``id = lsn`` so the composite derivation is exactly invertible
(``lsn >> 20``) — the multi-row array path is covered by handcrafted
fixtures in tests/test_cdc_consumers.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ROW_MAP = T.MapType(T.StringType(), T.StringType())

CANAL_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("pkNames", T.ArrayType(T.StringType()), True),
        T.StructField("isDdl", T.BooleanType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("es", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("sql", T.StringType(), True),
        T.StructField(
            "sqlType", T.MapType(T.StringType(), T.IntegerType()), True
        ),
        T.StructField(
            "mysqlType", T.MapType(T.StringType(), T.StringType()), True
        ),
        T.StructField("data", T.ArrayType(_ROW_MAP), True),
        T.StructField("old", T.ArrayType(_ROW_MAP), True),
    ]
)

# 2^20 rows of statement headroom keeps the (id, pos) composite monotone;
# canal batches are bounded far below this (canal.instance.memory limits)
_ROW_SHIFT = 1 << 20

_OP_IN = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}


def parse_canal(
    raw: DataFrame,
    value_col: str = "value",
    table: str | None = None,
    payload_schema: T.StructType | None = None,
) -> DataFrame:
    """Canal flat-message JSON strings → canonical change events.

    - type: INSERT → I, UPDATE → U, DELETE → D; unknown DML types become
      null ops for the dead-letter split.
    - ``isDdl: true`` messages are dropped (no row image to apply; the
      schema-evolution path detects added columns from the data itself,
      plans/evolution.py).
    - Canal streams every table of the instance on one topic: pass
      ``table`` to keep only the target table's rows (scan-stage filter).
    - Each element of ``data`` becomes one event; ``lsn = id·2²⁰ + pos``
      (see module docstring), ``ts = timestamp_millis(es)``.
    - ``payload_schema`` overrides the projected row shape for
      mid-stream schema evolution; the map image is already
      positional-free, so an extended schema just adds projections +
      casts — the envelope schema itself never changes.
    """
    # parse ONCE into a struct column, then filter/project from it (the
    # Maxwell lesson: a second from_json in a Filter is not CSE'd)
    out = raw.filter(F.col(value_col).isNotNull()).select(
        F.from_json(F.col(value_col), CANAL_VALUE_SCHEMA).alias("_env")
    )
    p = F.col("_env")
    out = out.filter(~F.coalesce(p["isDdl"], F.lit(False)))
    if table is not None:
        # null-safe: a malformed envelope (null table) must reach the
        # dead-letter split as a null-op row, not vanish in this filter
        out = out.filter(p["table"].isNull() | (p["table"] == table))
    op_col: Column = F.lit(None).cast("string")
    for k, v in _OP_IN.items():
        op_col = F.when(p["type"] == k, F.lit(v)).otherwise(op_col)
    # posexplode_OUTER: a malformed line (from_json → null struct) or a
    # non-DDL message with no/empty `data` still emits one null-image
    # row — null op / null keys route to the dead-letter split instead
    # of silently disappearing (the wal2json null-safety contract)
    exploded = out.select(
        op_col.alias("op"),
        p["id"].alias("_id"),
        p["es"].alias("_es"),
        F.posexplode_outer(p["data"]).alias("_pos", "_row"),
    )
    r = F.col("_row")
    rs = payload_schema or _DEFAULT_ROW
    return exploded.select(
        F.col("op"),
        (F.col("_id") * F.lit(_ROW_SHIFT) + F.col("_pos")).alias("lsn"),
        F.timestamp_millis(F.col("_es")).alias("ts"),
        *[r[f.name].cast(f.dataType).alias(f.name) for f in rs.fields],
    )


# default projected row shape (the transcripts table, BASELINE.json
# input_hint) — shared across dialects via model.py; evolution passes
# an extended schema via payload_schema
from ..model import PAYLOAD_SCHEMA as _DEFAULT_ROW

# Spark simpleString → (java.sql.Types code, mysql type name) for the
# renderer's sqlType/mysqlType side maps (parse never reads them — the
# engine's target schema is authoritative)
_JDBC_TYPES = {
    "int": (4, "int(11)"),
    "smallint": (5, "smallint(6)"),
    "bigint": (-5, "bigint(20)"),
    "double": (8, "double"),
    "float": (7, "float"),
    "boolean": (-7, "tinyint(1)"),
    "timestamp": (93, "datetime(6)"),
}
_JDBC_DEFAULT = (12, "varchar(255)")  # VARCHAR


def _literal_map(d: dict, value_type: str) -> Column:
    pairs = []
    for k, v in d.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v).cast(value_type))
    return F.create_map(*pairs)


def to_canal_json(
    changes: DataFrame,
    value_col: str = "value",
    database: str = "app",
    table: str = "transcripts",
) -> DataFrame:
    """Canonical change events → Canal flat-message JSON strings
    (deterministic fixture renderer; inverse of ``parse_canal`` up to
    Canal's millisecond ``es`` — the round-trip contract query's oracle
    coarsens identically). One row per message with ``id = lsn``, so the
    derived composite is exactly ``lsn << 20`` and the original value is
    recovered by ``shiftrightunsigned(lsn, 20)``."""
    # row image inferred from the input's columns (evolved streams
    # render their new columns); canal stringifies every value
    payload = [
        f for f in changes.schema.fields if f.name not in ("op", "lsn", "ts")
    ]
    map_pairs: list[Column] = []
    sql_types: dict[str, int] = {}
    mysql_types: dict[str, str] = {}
    for f in payload:
        map_pairs.append(F.lit(f.name))
        map_pairs.append(F.col(f.name).cast("string"))
        jt, mt = _JDBC_TYPES.get(f.dataType.simpleString(), _JDBC_DEFAULT)
        sql_types[f.name] = jt
        mysql_types[f.name] = mt
    row_map = F.create_map(*map_pairs)
    # exact integer division — unix_micros exceeds 2^53 headroom concerns
    # under double division (the Maxwell lesson at maxwell.py:124)
    es = F.expr("CAST(unix_micros(ts) div 1000 AS LONG)")
    envelope = F.struct(
        F.col("lsn").alias("id"),
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.array(F.lit("conv_id"), F.lit("turn_idx")).alias("pkNames"),
        F.lit(False).alias("isDdl"),
        F.when(F.col("op") == "D", F.lit("DELETE"))
        .when(F.col("op") == "U", F.lit("UPDATE"))
        .otherwise(F.lit("INSERT"))
        .alias("type"),
        es.alias("es"),
        es.alias("ts"),
        F.lit("").alias("sql"),
        _literal_map(sql_types, "int").alias("sqlType"),
        _literal_map(mysql_types, "string").alias("mysqlType"),
        F.array(row_map).alias("data"),
        F.lit(None).cast(T.ArrayType(_ROW_MAP)).alias("old"),
    )
    return changes.select(F.to_json(envelope).alias(value_col))
