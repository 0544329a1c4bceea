"""Typed literal conversion — the engine's analogue of the reference's
SQL-value → XSD-typed-RDF-literal conversion (convertSqlValueToRdf,
JenaModelStep.java:439-533, type vocabulary Rdf11.java:35-77).

Produces canonical lexical forms `"lex"^^<datatype>` (or language-tagged
`"lex"@lang`, JenaModelStep.java:337-343) entirely with built-in expressions;
temporal lexical validation mirrors the reference's regex checks
(xsd:dateTime JenaModelStep.java:65, xsd:date :70) — invalid forms yield
null, to be routed by ActionIfNull policy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"

# the reference's lexical guards (JenaModelStep.java:65,70)
DATETIME_RE = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
DATE_RE = r"^\d{4}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$"


def _typed(lex: Column, dtype: str) -> Column:
    return F.when(
        lex.isNotNull(), F.concat(F.lit('"'), lex, F.lit(f'"^^<{XSD}{dtype}>'))
    )


def xsd_string(col: Column, language: str | None = None) -> Column:
    """Plain/typed/language-tagged string literal."""
    if language:
        return F.when(
            col.isNotNull(),
            F.concat(F.lit('"'), col.cast("string"), F.lit(f'"@{language}')),
        )
    return _typed(col.cast("string"), "string")


def xsd_boolean(col: Column) -> Column:
    return _typed(col.try_cast("boolean").cast("string"), "boolean")


def xsd_integer(col: Column) -> Column:
    return _typed(col.try_cast("long").cast("string"), "integer")


def xsd_decimal(col: Column, scale: int = 6) -> Column:
    return _typed(F.format_number(col.try_cast("double"), scale), "decimal")


def xsd_double(col: Column) -> Column:
    return _typed(col.try_cast("double").cast("string"), "double")


def xsd_datetime(col: Column) -> Column:
    """timestamp → canonical UTC dateTime; malformed lexical forms → null
    (the reference's regex gate, via try_to_timestamp under ANSI mode)."""
    ts = F.try_to_timestamp(col.cast("string"))
    lex = F.when(ts.isNotNull(), F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    return _typed(lex, "dateTime")


def xsd_date(col: Column) -> Column:
    d = col.try_cast("date")
    lex = F.when(d.isNotNull(), F.date_format(d, "yyyy-MM-dd"))
    return _typed(lex, "date")


def xsd_hex_binary(col: Column) -> Column:
    return _typed(F.lower(F.hex(col)), "hexBinary")


def xsd_base64_binary(col: Column) -> Column:
    return _typed(F.base64(col), "base64Binary")


CONVERTERS = {
    "string": xsd_string,
    "boolean": xsd_boolean,
    "integer": xsd_integer,
    "decimal": xsd_decimal,
    "double": xsd_double,
    "dateTime": xsd_datetime,
    "date": xsd_date,
    "hexBinary": xsd_hex_binary,
    "base64Binary": xsd_base64_binary,
}


def to_typed_literal(col: Column, dtype: str, **kw) -> Column:
    """Dispatch a column to its XSD literal form (Rdf11-style vocabulary)."""
    if dtype not in CONVERTERS:
        raise ValueError(f"unsupported datatype {dtype}")
    return CONVERTERS[dtype](col, **kw)
