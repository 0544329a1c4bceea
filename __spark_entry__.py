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


def q_group_merge_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-and-Merge over whole conversations: USE_FIRST / USE_LAST /
    NULL_IF_DIFFERENT policies + set-union merge of text values (the RDF
    model-union analogue), reference JenaGroupMergeStep + OtherFieldAction."""
    from kettle_jena_plugins_spark.operators.groupmerge import (
        OtherFieldAction,
        group_merge,
    )

    ch = change_events(spark, sf_dir).withColumn("last_text", F.col("text"))
    gm = group_merge(
        ch,
        group_keys=["conv_id"],
        merge_cols=["text"],
        other_actions={
            "role": OtherFieldAction.USE_FIRST,
            "last_text": OtherFieldAction.USE_LAST,
            "tool": OtherFieldAction.NULL_IF_DIFFERENT,
            "op": OtherFieldAction.DROP,
            "turn_idx": OtherFieldAction.DROP,
        },
    )
    return gm.select(
        "conv_id",
        F.col("role").alias("first_role"),
        F.col("last_text"),
        F.col("tool").alias("tool_nid"),
        F.when(
            F.size("text_merged") > 0, F.concat_ws("|", F.col("text_merged"))
        ).alias("texts_merged"),
    )


def q_combine_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combine operator: first-non-null horizontal merge (tool ⊕ role) —
    reference JenaCombineStep column-union semantics."""
    from kettle_jena_plugins_spark.operators.combine import combine_columns

    ch = change_events(spark, sf_dir)
    combined = combine_columns(
        ch, ["tool", "role"], "effective_tool", remove_sources=False
    )
    return combined.groupBy("effective_tool").agg(F.count(F.lit(1)).alias("n"))


def q_construct_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row construct: canonical sorted-property serialization of the
    per-turn document — reference JenaModelStep row→graph with QName
    expansion; canonical order replaces graph-isomorphism equality."""
    from kettle_jena_plugins_spark.operators.construct import (
        PropertyMapping,
        construct_doc,
    )

    ch = change_events(spark, sf_dir)
    ns = {"t": "http://example.org/transcript#"}
    out = construct_doc(
        ch,
        uri_prefix="ex:conv/",
        uri_fields=["conv_id", "turn_idx"],
        mappings=[
            PropertyMapping("role", "t:role"),
            PropertyMapping("text", "t:text"),
            PropertyMapping("tool", "t:tool"),
            PropertyMapping("op", "t:op", skip=True),  # skip-flag coverage
        ],
        namespaces=ns,
    )
    return out.select("lsn", "doc_canon")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "group_merge_policies": q_group_merge_policies,
    "combine_coalesce": q_combine_coalesce,
    "construct_doc": q_construct_doc,
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

_NS_T = "http://example.org/transcript#"

ORACLES: dict[str, str] = {
    "group_merge_policies": f"""
WITH {CHANGES_ORACLE_CTE},
ranked AS (
    SELECT conv_id, role, text,
           row_number() OVER (PARTITION BY conv_id ORDER BY ts, lsn, op) AS rn_a,
           row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, lsn DESC, op DESC) AS rn_d
    FROM changes
),
aggs AS (
    SELECT conv_id,
           CASE WHEN COUNT(DISTINCT tool)
                     + MAX(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) = 1
                THEN MIN(tool) END AS tool_nid,
           string_agg(DISTINCT text, '|' ORDER BY text) AS texts_merged
    FROM changes GROUP BY conv_id
)
SELECT a.conv_id,
       f.role AS first_role,
       l.text AS last_text,
       a.tool_nid,
       a.texts_merged
FROM aggs a
JOIN (SELECT conv_id, role FROM ranked WHERE rn_a = 1) f USING (conv_id)
JOIN (SELECT conv_id, text FROM ranked WHERE rn_d = 1) l USING (conv_id)
""",
    "combine_coalesce": f"""
WITH {CHANGES_ORACLE_CTE}
SELECT COALESCE(tool, role) AS effective_tool, COUNT(*) AS n
FROM changes GROUP BY COALESCE(tool, role)
""",
    "construct_doc": f"""
WITH {CHANGES_ORACLE_CTE}
SELECT lsn,
       '<ex:conv/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) || '> ' ||
       concat_ws('; ',
           CASE WHEN role IS NOT NULL THEN '{_NS_T}role=' || role END,
           CASE WHEN text IS NOT NULL THEN '{_NS_T}text=' || text END,
           CASE WHEN tool IS NOT NULL THEN '{_NS_T}tool=' || tool END
       ) AS doc_canon
FROM changes
""",
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
