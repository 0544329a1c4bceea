"""Change-event source: derive a deterministic binlog/WAL-style stream from the
driver-provided ``events`` parquet table.

The reference's "source" is an injected row stream
(TransTestFactory.INJECTOR_STEPNAME, JenaGroupMergeStepIT.java:64); our
analogue is a deterministic pure-column mapping of the driver's events table
into the CHANGE_EVENT_SCHEMA — no randomness, no driver-side loops, so the
same rows appear at every scale factor and in DuckDB for the oracle.

Derivation (identical semantics in the DuckDB oracle below):
- lsn       = event_id                        (monotone WAL sequence)
- op        = D if event_id%10==0, U if event_id%10 in (1,2,3), else I
- conv_id   = 'c' || (user_id % n_convs)      (many events per conversation;
                                               user_id is skewed in the data)
- turn_idx  = event_id % turns_per_conv
- role      = cycle(user, assistant, tool) over event_id
- text      = event_type || ':' || props      (null for deletes)
- tool      = event_type when event_id%4==0 else null
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CONVS = 400
TURNS_PER_CONV = 50


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Spark 4 infers parquet isAdjustedToUTC=false as TIMESTAMP_NTZ; the
    # engine's event-time type is TimestampType (session tz = UTC)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def derive_change_events(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → change stream."""
    eid = F.col("event_id")
    op = (
        F.when(eid % 10 == 0, F.lit("D"))
        .when(eid % 10 <= 3, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    return events.select(
        op.alias("op"),
        eid.cast("long").alias("lsn"),
        F.col("ts"),
        F.concat(F.lit("c"), (F.col("user_id") % N_CONVS).cast("string")).alias(
            "conv_id"
        ),
        (eid % TURNS_PER_CONV).cast("int").alias("turn_idx"),
        F.when(eid % 3 == 0, F.lit("user"))
        .when(eid % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
        .alias("role"),
        F.when(eid % 10 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.col("event_type"), F.lit(":"), F.col("props")))
        .alias("text"),
        F.when(eid % 4 == 0, F.col("event_type"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
    )


def change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_change_events(read_events(spark, sf_dir))


# DuckDB oracle view body — semantically identical to derive_change_events.
# (DuckDB pre-registers `events` as a view over the same parquet file.)
CHANGES_ORACLE_CTE = f"""
changes AS (
    SELECT
        CASE WHEN event_id % 10 = 0 THEN 'D'
             WHEN event_id % 10 <= 3 THEN 'U'
             ELSE 'I' END                                   AS op,
        CAST(event_id AS BIGINT)                            AS lsn,
        ts,
        'c' || CAST(user_id % {N_CONVS} AS VARCHAR)         AS conv_id,
        CAST(event_id % {TURNS_PER_CONV} AS INT)            AS turn_idx,
        CASE WHEN event_id % 3 = 0 THEN 'user'
             WHEN event_id % 3 = 1 THEN 'assistant'
             ELSE 'tool' END                                AS role,
        CASE WHEN event_id % 10 = 0 THEN NULL
             ELSE event_type || ':' || props END            AS text,
        CASE WHEN event_id % 4 = 0 THEN event_type
             ELSE NULL END                                  AS tool
    FROM events
)
"""


def promote_json_payload(
    df: DataFrame,
    fields: dict[str, tuple[str, str]],
    json_col: str = "props",
) -> DataFrame:
    """Schema-on-read payload promotion: pull typed columns out of a JSON
    payload column at scan time — the step a CDC consumer runs when the
    WAL carries a semi-structured envelope (Debezium `after`, app-level
    props blobs). ``fields`` maps new column name → (JSONPath, cast type).
    Pure narrow projection (get_json_object fuses into the scan's
    codegen); malformed/missing paths yield null, to be routed by the
    usual null policies. At 100 TB this beats a UDF-side json.loads by
    the whole Python round trip."""
    out = df
    for name, (path, dtype) in fields.items():
        out = out.withColumn(
            name, F.get_json_object(F.col(json_col), path).cast(dtype)
        )
    return out
