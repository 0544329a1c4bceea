"""Mimic the driver's Spark-vs-DuckDB comparison: row count, column names,
order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm_cell(r[i]) for i in idx) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name=""):
    srows = spark_df.collect()
    scols = spark_df.columns
    rel = con.sql(sql)
    ocols = rel.columns
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    s = _norm_rows(scols, [[r[c] for c in scols] for r in srows])
    o = _norm_rows(ocols, orows)
    mism = [i for i, (a, b) in enumerate(zip(s, o)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} value mismatches; first: spark={s[mism[0]]} "
        f"oracle={o[mism[0]]}"
    )
