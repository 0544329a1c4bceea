"""Substitution dispatch (RdfPropertyNameSourceTest parity), typed literals
(convertSqlValueToRdf parity), serializer formats."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.functions.substitution import (
    UnresolvedVariable,
    resolve_value,
    source_kind,
    substitute_variables,
)
from kettle_jena_plugins_spark.functions.typed_literals import to_typed_literal


def test_source_kind_dispatch():
    # mirror of RdfPropertyNameSourceTest.java:34-35 literal/field/variable
    assert source_kind("#{myField}") == "field"
    assert source_kind("${MY_VAR}") == "variable"
    assert source_kind("rdf:type") == "literal"
    assert source_kind("#{unclosed") == "literal"


def test_substitute_variables():
    assert substitute_variables("${A}/x/${B}", {"A": "1", "B": "2"}) == "1/x/2"
    with pytest.raises(UnresolvedVariable):
        substitute_variables("${MISSING}", {})


def test_resolve_value_field_and_literal(spark):
    df = spark.createDataFrame([("v1", 7)], "name string, n int")
    out = df.select(
        resolve_value("#{name}").alias("f"),
        resolve_value("${ENV}", {"ENV": "prod"}).alias("v"),
        resolve_value("plain").alias("l"),
    ).collect()[0]
    assert (out["f"], out["v"], out["l"]) == ("v1", "prod", "plain")


def test_typed_literals(spark):
    df = spark.createDataFrame(
        [(1, "hi", True, 3.5, dt.datetime(2026, 1, 2, 3, 4, 5), b"\x0f\xa0")],
        "i long, s string, b boolean, d double, t timestamp, bin binary",
    )
    row = df.select(
        to_typed_literal(F.col("i"), "integer").alias("i"),
        to_typed_literal(F.col("s"), "string").alias("s"),
        to_typed_literal(F.col("s"), "string", language="en").alias("lang"),
        to_typed_literal(F.col("b"), "boolean").alias("b"),
        to_typed_literal(F.col("d"), "double").alias("d"),
        to_typed_literal(F.col("t"), "dateTime").alias("t"),
        to_typed_literal(F.col("bin"), "hexBinary").alias("x"),
    ).collect()[0]
    X = "http://www.w3.org/2001/XMLSchema#"
    assert row["i"] == f'"1"^^<{X}integer>'
    assert row["s"] == f'"hi"^^<{X}string>'
    assert row["lang"] == '"hi"@en'
    assert row["b"] == f'"true"^^<{X}boolean>'
    assert row["d"] == f'"3.5"^^<{X}double>'
    assert row["t"] == f'"2026-01-02T03:04:05Z"^^<{X}dateTime>'
    assert row["x"] == f'"0fa0"^^<{X}hexBinary>'


def test_invalid_datetime_is_null(spark):
    df = spark.createDataFrame([("not-a-date",)], "t string")
    row = df.select(to_typed_literal(F.col("t"), "dateTime").alias("t")).collect()[0]
    assert row["t"] is None  # lexical gate → null → ActionIfNull routing


def test_serializer_formats(spark, tmp_path):
    from kettle_jena_plugins_spark.operators.serialize import serialize_docs

    df = spark.createDataFrame(
        [("ex:1", "alice", None), ("ex:2", "bob", "smith")],
        "subject string, name string, surname string",
    )
    wall = serialize_docs(
        df, str(tmp_path / "nt"), fmt="ntriples",
        statements={"http://xmlns.com/foaf/0.1/name": "name",
                    "http://xmlns.com/foaf/0.1/surname": "surname"},
        single_file=True,
    )
    assert wall >= 0
    lines = sorted(
        r["value"] for r in spark.read.text(str(tmp_path / "nt")).collect()
    )
    assert lines == [
        '<ex:1> <http://xmlns.com/foaf/0.1/name> "alice" .',
        '<ex:2> <http://xmlns.com/foaf/0.1/name> "bob" .',
        '<ex:2> <http://xmlns.com/foaf/0.1/surname> "smith" .',
    ]
    serialize_docs(df, str(tmp_path / "pq"), fmt="parquet")
    assert spark.read.parquet(str(tmp_path / "pq")).count() == 2
