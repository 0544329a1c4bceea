"""Typed-literal vocabulary (Rdf11.java:35-77): canonical lexical forms,
range gates on the integer family, lexical gates on durations / language /
Name-family — malformed values yield null (routed by ActionIfNull)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.functions.typed_literals import (
    CONVERTERS,
    XSD,
    to_typed_literal,
)

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def one(spark, value, dtype, sql_type="string"):
    df = spark.createDataFrame([(value,)], f"v {sql_type}")
    return df.select(to_typed_literal(F.col("v"), dtype).alias("o")).first()["o"]


@pytest.mark.parametrize(
    "value,sql_type,dtype,lex",
    [
        (42, "long", "byte", "42"),
        (1000, "long", "short", "1000"),
        (3000000000, "long", "unsignedInt", "3000000000"),
        (0, "long", "nonNegativeInteger", "0"),
        (-5, "long", "negativeInteger", "-5"),
        (0, "long", "nonPositiveInteger", "0"),
        (255, "long", "unsignedByte", "255"),
        ("P1Y2M", "string", "yearMonthDuration", "P1Y2M"),
        ("P3DT4H5M6S", "string", "dayTimeDuration", "P3DT4H5M6S"),
        ("-P1Y2M3DT4H", "string", "duration", "-P1Y2M3DT4H"),
        ("en-US", "string", "language", "en-US"),
        ("http://x.org/a#b", "string", "anyURI", "http://x.org/a#b"),
        ("tok-1.2", "string", "NMTOKEN", "tok-1.2"),
        ("ns:local", "string", "Name", "ns:local"),
        ("local-name", "string", "NCName", "local-name"),
    ],
)
def test_valid_lexical_forms(spark, value, sql_type, dtype, lex):
    assert one(spark, value, dtype, sql_type) == f'"{lex}"^^<{XSD}{dtype}>'


@pytest.mark.parametrize(
    "value,sql_type,dtype",
    [
        (128, "long", "byte"),  # range gates
        (-1, "long", "unsignedByte"),
        (70000, "long", "unsignedShort"),
        (-1, "long", "nonNegativeInteger"),
        (0, "long", "negativeInteger"),
        (1, "long", "nonPositiveInteger"),
        ("P", "string", "duration"),  # lexical gates
        ("P1D", "string", "yearMonthDuration"),
        ("P1Y", "string", "dayTimeDuration"),
        ("assistant9", "string", "language"),  # >8 letters+digit
        ("has space", "string", "anyURI"),
        ("bad token", "string", "NMTOKEN"),
        ("9name", "string", "Name"),
        ("ns:local", "string", "NCName"),  # colon not allowed in NCName
    ],
)
def test_gated_to_null(spark, value, sql_type, dtype):
    assert one(spark, value, dtype, sql_type) is None


def test_whitespace_facets(spark):
    v = "a\tb\n c"
    assert (
        one(spark, v, "normalizedString")
        == f'"a b  c"^^<{XSD}normalizedString>'
    )
    assert one(spark, v, "token") == f'"a b c"^^<{XSD}token>'


def test_calendar_fragments(spark):
    df = spark.createDataFrame(
        [("2026-03-07 08:09:10",)], "v string"
    ).select(F.col("v").cast("timestamp").alias("v"))

    def frag(dtype):
        return df.select(
            to_typed_literal(F.col("v"), dtype).alias("o")
        ).first()["o"]

    assert frag("time") == f'"08:09:10"^^<{XSD}time>'
    assert frag("gYear") == f'"2026"^^<{XSD}gYear>'
    assert frag("gMonth") == f'"--03"^^<{XSD}gMonth>'
    assert frag("gDay") == f'"---07"^^<{XSD}gDay>'
    assert frag("gYearMonth") == f'"2026-03"^^<{XSD}gYearMonth>'
    assert frag("gMonthDay") == f'"--03-07"^^<{XSD}gMonthDay>'
    assert (
        frag("dateTimeStamp")
        == f'"2026-03-07T08:09:10Z"^^<{XSD}dateTimeStamp>'
    )


def test_datetime_fixed_offset(spark):
    """Non-UTC offsets are representable: the same instant renders in a
    fixed zone offset (the engine's version of the reference's
    source-calendar preservation, JenaModelStep.java:477,497)."""
    from kettle_jena_plugins_spark.functions.typed_literals import xsd_datetime

    df = spark.createDataFrame([("2026-03-07 08:09:10",)], "v string").select(
        F.col("v").cast("timestamp").alias("v")
    )

    def at(offset):
        return df.select(xsd_datetime(F.col("v"), offset=offset).alias("o")).first()["o"]

    assert at("+05:30") == f'"2026-03-07T13:39:10+05:30"^^<{XSD}dateTime>'
    assert at("-02:00") == f'"2026-03-07T06:09:10-02:00"^^<{XSD}dateTime>'
    assert at(None) == f'"2026-03-07T08:09:10Z"^^<{XSD}dateTime>'
    with pytest.raises(ValueError, match="offset"):
        df.select(xsd_datetime(F.col("v"), offset="UTC+5"))
    # XSD bounds zone offsets to ±14:00, minutes < 60
    for bad in ("+99:00", "+14:30", "-05:75"):
        with pytest.raises(ValueError, match="XSD range"):
            df.select(xsd_datetime(F.col("v"), offset=bad))
    assert at("+14:00") == f'"2026-03-07T22:09:10+14:00"^^<{XSD}dateTime>'


def test_decimal_no_grouping_commas(spark):
    """xsd:decimal ≥1000 must not pick up grouping separators — a comma'd
    lexical form ('1,234.500000') is invalid RDF no parser accepts."""
    got = one(spark, 1234.5, "decimal", "double")
    assert got == f'"1234.500000"^^<{XSD}decimal>'
    assert "," not in got
    assert (
        one(spark, -9876543.21, "decimal", "double")
        == f'"-9876543.210000"^^<{XSD}decimal>'
    )


def test_rdf_namespace_types(spark):
    assert one(spark, "<p>x</p>", "HTML") == f'"<p>x</p>"^^<{RDF_NS}HTML>'
    assert (
        one(spark, "<x/>", "XMLLiteral") == f'"<x/>"^^<{RDF_NS}XMLLiteral>'
    )


def test_unsigned_long_beyond_long(spark):
    v = "18446744073709551615"
    assert (
        one(spark, v, "unsignedLong")
        == f'"{v}"^^<{XSD}unsignedLong>'
    )
    assert one(spark, "18446744073709551616", "unsignedLong") is None
    assert one(spark, "-1", "unsignedLong") is None


def test_vocabulary_covers_reference_table():
    """Every Rdf11.DATA_TYPES entry (Rdf11.java:35-77) has a converter."""
    ref = [
        "string", "boolean", "decimal", "integer", "double", "float",
        "date", "time", "dateTime", "dateTimeStamp", "gYear", "gMonth",
        "gDay", "gYearMonth", "gMonthDay", "duration", "yearMonthDuration",
        "dayTimeDuration", "byte", "short", "int", "long", "unsignedByte",
        "unsignedShort", "unsignedInt", "unsignedLong", "unsignedInteger",
        "nonNegativeInteger", "negativeInteger", "nonPositiveInteger",
        "hexBinary", "base64Binary", "anyURI", "language",
        "normalizeString", "token", "NMTOKEN", "Name", "NCName",
        "HTML", "XMLLiteral",
    ]
    missing = [t for t in ref if t not in CONVERTERS]
    assert not missing
