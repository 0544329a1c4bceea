"""Run every queries() entry against its DuckDB oracle at sf0.001 — the same
comparison the driver performs at sf0.01 (CORRECTNESS gate).

KJP_ORACLE_SF_DIR overrides the scale factor (e.g.
`KJP_ORACLE_SF_DIR=/root/testdata/sf0.1 pytest tests/test_entry_oracle.py`)
to catch scale-dependent edges: hash-bucket collisions, explode volumes,
AQE plan flips. Round 3 ran the full contract green at sf0.001, sf0.01
AND sf0.1."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import assert_matches_oracle, duckdb_conn

SF_DIR = os.environ.get("KJP_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


ALL_QUERIES = {**entry_mod.queries(), **entry_mod.extra_queries()}
ALL_ORACLES = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}


@pytest.mark.parametrize("name", sorted(ALL_QUERIES.keys()))
def test_query_matches_oracle(spark, con, name):
    q = ALL_QUERIES[name]
    sql = ALL_ORACLES.get(name)
    if sql is None:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_matches_oracle(q(spark, SF_DIR), con, sql, name=name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "last_lsn"}
