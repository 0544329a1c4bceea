"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one implemented operator from SURVEY.md §2,
paired with a DuckDB-dialect oracle in ``oracle_sql()`` computing the same
result over the same parquet tables. Column names/aliases match exactly on
both sides (the driver hash-compares values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.model import MERGE_KEYS
from kettle_jena_plugins_spark.operators.lww import lww_reduce, lww_state
from kettle_jena_plugins_spark.operators.validate import dead_letter_stats
from kettle_jena_plugins_spark.sources.changes import (
    CHANGES_ORACLE_CTE,
    change_events,
)

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the change stream from events and compute the final
    transcripts table state via last-writer-wins over (ts, lsn)."""
    return q_cdc_lww_state(spark, SF0001)


# ---------------------------------------------------------------------------
# query implementations (spark side)
# ---------------------------------------------------------------------------

def q_cdc_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = change_events(spark, sf_dir)
    return lww_state(ch).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.col("lsn").alias("last_lsn"),
    )


def q_cdc_lww_state_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result through the salted two-phase skew path — proves salting
    does not change LWW semantics (north rule hard-part (d))."""
    ch = change_events(spark, sf_dir)
    return lww_state(ch, salted=True).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.col("lsn").alias("last_lsn"),
    )


def q_cdc_final_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-op reduction per key (del_reinsert fixture shape): how many keys
    end in I/U/D — the pre-MERGE cardinality guarantee (one source row per
    target key)."""
    ch = change_events(spark, sf_dir)
    return (
        lww_reduce(ch)
        .groupBy("op")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def q_validate_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-split analogue: inject deterministic violations (null key / bad
    op) into the stream, then count dead-letter rows per reason."""
    ch = change_events(spark, sf_dir)
    dirty = ch.withColumn(
        "conv_id",
        F.when(F.col("lsn") % 97 == 0, F.lit(None)).otherwise(F.col("conv_id")),
    ).withColumn(
        "op", F.when(F.col("lsn") % 101 == 0, F.lit("X")).otherwise(F.col("op"))
    )
    return dead_letter_stats(dirty)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_lww_state": q_cdc_lww_state,
    "cdc_lww_state_salted": q_cdc_lww_state_salted,
    "cdc_final_op_counts": q_cdc_final_op_counts,
    "validate_dead_letter": q_validate_dead_letter,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_LWW_RANKED = f"""
WITH {CHANGES_ORACLE_CTE},
ranked AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY conv_id, turn_idx
               ORDER BY ts DESC, lsn DESC, op DESC
           ) AS rn
    FROM changes
)
"""

ORACLES: dict[str, str] = {
    "cdc_lww_state": _LWW_RANKED
    + """
SELECT conv_id, turn_idx, role, text, tool, lsn AS last_lsn
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
    "cdc_lww_state_salted": _LWW_RANKED
    + """
SELECT conv_id, turn_idx, role, text, tool, lsn AS last_lsn
FROM ranked WHERE rn = 1 AND op <> 'D'
""",
    "cdc_final_op_counts": _LWW_RANKED
    + """
SELECT op, COUNT(*) AS n_keys FROM ranked WHERE rn = 1 GROUP BY op
""",
    "validate_dead_letter": f"""
WITH {CHANGES_ORACLE_CTE},
dirty AS (
    SELECT CASE WHEN lsn % 101 = 0 THEN 'X' ELSE op END AS op,
           lsn, ts,
           CASE WHEN lsn % 97 = 0 THEN NULL ELSE conv_id END AS conv_id,
           turn_idx, role, text, tool
    FROM changes
),
reasons AS (
    SELECT 'null_key:conv_id' AS reason FROM dirty WHERE conv_id IS NULL
    UNION ALL
    SELECT 'null_key:turn_idx' FROM dirty WHERE turn_idx IS NULL
    UNION ALL
    SELECT 'null_ts' FROM dirty WHERE ts IS NULL
    UNION ALL
    SELECT 'bad_op' FROM dirty WHERE op IS NULL OR op NOT IN ('I','U','D')
)
SELECT reason, COUNT(*) AS n FROM reasons GROUP BY reason
""",
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)


# sanity: merge keys referenced above stay in sync with the model
assert MERGE_KEYS == ("conv_id", "turn_idx")
