"""Data model: schemas for the transcripts target table and the change stream.

Reference analogue: the Kettle row = ``Object[]`` + ``RowMetaInterface``
(JenaModelStep.java:80,88) becomes a DataFrame with a strict StructType.
The target ("transcripts") schema is fixed by BASELINE.json input_hint; the
change-event schema adds the binlog/WAL envelope (op, lsn) — the analogue of
the reference's injected row stream (JenaGroupMergeStepIT.java:64).
"""

from __future__ import annotations

from pyspark.sql import types as T

# merge key: the analogue of the reference group key
# (JenaGroupMergeStep.getGroupFields, JenaGroupMergeStep.java:421-446)
MERGE_KEYS = ("conv_id", "turn_idx")

# total LWW order (OtherFieldAction.USE_LAST with a *declared* order instead of
# the reference's implicit arrival order — OtherFieldAction.java:46)
LWW_ORDER = ("ts", "lsn")

PAYLOAD_COLS = ("role", "text", "tool")

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # I / U / D
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
    ]
)

# the row-image shape shared by every envelope dialect parser/renderer
# (sources/*.py) — the payload slice of CHANGE_EVENT_SCHEMA, defined
# once so the dialects cannot drift apart
PAYLOAD_SCHEMA = T.StructType(list(CHANGE_EVENT_SCHEMA.fields[3:]))

# mid-stream schema-evolution variant (FIXTURES.md §2): adds tool_meta and
# widens turn_idx int32→int64
CHANGE_EVENT_SCHEMA_V2 = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.LongType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("tool_meta", T.StringType(), True),
    ]
)

VALID_OPS = ("I", "U", "D")
