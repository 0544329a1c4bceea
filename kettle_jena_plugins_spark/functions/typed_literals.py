"""Typed literal conversion — the engine's analogue of the reference's
SQL-value → XSD-typed-RDF-literal conversion (convertSqlValueToRdf,
JenaModelStep.java:439-533, type vocabulary Rdf11.java:35-77).

Produces canonical lexical forms `"lex"^^<datatype>` (or language-tagged
`"lex"@lang`, JenaModelStep.java:337-343) entirely with built-in expressions;
temporal lexical validation mirrors the reference's regex checks
(xsd:dateTime JenaModelStep.java:65, xsd:date :70) — invalid forms yield
null, to be routed by ActionIfNull policy. The CONVERTERS table covers the
full Rdf11.DATA_TYPES vocabulary (Rdf11.java:35-77): numerics with range
gates, the g* calendar fragments, the ISO-8601 duration family (lexical
gates), anyURI/language/token/Name-family string facets, and the rdf:HTML /
rdf:XMLLiteral pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

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
    # decimal cast (not format_number): grouping commas are invalid in an
    # xsd:decimal lexical form, and a parser would reject "1,234.50".
    # Magnitudes beyond decimal(38,scale) (≥1e32 at the default scale)
    # null out — the module's range-gate convention, routed by ActionIfNull
    # like every other gated type
    return _typed(col.try_cast(f"decimal(38,{scale})").cast("string"), "decimal")


def xsd_double(col: Column) -> Column:
    return _typed(col.try_cast("double").cast("string"), "double")


_OFFSET_RE = r"^[+-]\d{2}:\d{2}$"


def xsd_datetime(col: Column, offset: str | None = None) -> Column:
    """timestamp → canonical UTC dateTime; malformed lexical forms → null
    (the reference's regex gate, via try_to_timestamp under ANSI mode).

    `offset` ("+05:30" / "-02:00") renders the SAME instant in that fixed
    zone offset — the engine's (sane) version of the reference's
    source-calendar preservation (JenaModelStep.java:477,497 keeps the
    source calendar, badly, via Locale.UK): non-UTC offsets become
    representable while the instant semantics stay exact."""
    ts = F.try_to_timestamp(col.cast("string"))
    if offset is None:
        lex = F.when(
            ts.isNotNull(), F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
        )
        return _typed(lex, "dateTime")
    import re

    if not re.match(_OFFSET_RE, offset):
        raise ValueError(f"offset must look like +HH:MM, got {offset!r}")
    sign = 1 if offset[0] == "+" else -1
    hh, mm = int(offset[1:3]), int(offset[4:6])
    # XSD bounds zone offsets to ±14:00 with minutes < 60 — an
    # out-of-range offset would render an invalid lexical form
    if mm > 59 or hh > 14 or (hh == 14 and mm != 0):
        raise ValueError(f"offset out of XSD range (±14:00): {offset!r}")
    shifted = ts + F.expr(
        f"INTERVAL '{sign * (hh * 60 + mm)}' MINUTE"
    )
    lex = F.when(
        ts.isNotNull(),
        F.concat(
            F.date_format(shifted, "yyyy-MM-dd'T'HH:mm:ss"), F.lit(offset)
        ),
    )
    return _typed(lex, "dateTime")


def xsd_date(col: Column) -> Column:
    d = col.try_cast("date")
    lex = F.when(d.isNotNull(), F.date_format(d, "yyyy-MM-dd"))
    return _typed(lex, "date")


def xsd_hex_binary(col: Column) -> Column:
    return _typed(F.lower(F.hex(col)), "hexBinary")


def xsd_base64_binary(col: Column) -> Column:
    return _typed(F.base64(col), "base64Binary")


def xsd_float(col: Column) -> Column:
    return _typed(col.try_cast("float").cast("string"), "float")


def xsd_datetime_stamp(col: Column) -> Column:
    """dateTime with a REQUIRED timezone — the canonical form is already
    UTC-anchored ('Z'), so the lexical shape equals xsd_datetime's."""
    ts = F.try_to_timestamp(col.cast("string"))
    lex = F.when(ts.isNotNull(), F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    return _typed(lex, "dateTimeStamp")


def _from_ts_format(col: Column, fmt: str, dtype: str) -> Column:
    ts = F.try_to_timestamp(col.cast("string"))
    return _typed(F.when(ts.isNotNull(), F.date_format(ts, fmt)), dtype)


def xsd_time(col: Column) -> Column:
    return _from_ts_format(col, "HH:mm:ss", "time")


def xsd_gyear(col: Column) -> Column:
    return _from_ts_format(col, "yyyy", "gYear")


def xsd_gyearmonth(col: Column) -> Column:
    return _from_ts_format(col, "yyyy-MM", "gYearMonth")


def xsd_gmonth(col: Column) -> Column:
    return _from_ts_format(col, "'--'MM", "gMonth")


def xsd_gmonthday(col: Column) -> Column:
    return _from_ts_format(col, "'--'MM-dd", "gMonthDay")


def xsd_gday(col: Column) -> Column:
    return _from_ts_format(col, "'---'dd", "gDay")


# ISO-8601 lexical gates for the duration family (string input; malformed →
# null, the reference's regex-gate pattern at JenaModelStep.java:65,70)
_DURATION_RE = (
    r"^-?P(?=.)(\d+Y)?(\d+M)?(\d+D)?(T(?=.)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"
)
_YM_DURATION_RE = r"^-?P(?=.)(\d+Y)?(\d+M)?$"
_DT_DURATION_RE = r"^-?P(?=.)(\d+D)?(T(?=.)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"


def _gated(col: Column, regex: str, dtype: str, ns: str = XSD) -> Column:
    s = col.cast("string")
    lex = F.when(s.rlike(regex), s)
    return F.when(
        lex.isNotNull(), F.concat(F.lit('"'), lex, F.lit(f'"^^<{ns}{dtype}>'))
    )


def xsd_duration(col: Column) -> Column:
    return _gated(col, _DURATION_RE, "duration")


def xsd_year_month_duration(col: Column) -> Column:
    return _gated(col, _YM_DURATION_RE, "yearMonthDuration")


def xsd_day_time_duration(col: Column) -> Column:
    return _gated(col, _DT_DURATION_RE, "dayTimeDuration")


def _int_range(col: Column, dtype: str, lo: int | None, hi: int | None) -> Column:
    g = col.try_cast("long")
    cond = g.isNotNull()
    if lo is not None:
        cond = cond & (g >= lo)
    if hi is not None:
        cond = cond & (g <= hi)
    return _typed(F.when(cond, g.cast("string")), dtype)


def xsd_byte(col: Column) -> Column:
    return _int_range(col, "byte", -128, 127)


def xsd_short(col: Column) -> Column:
    return _int_range(col, "short", -32768, 32767)


def xsd_int(col: Column) -> Column:
    return _int_range(col, "int", -(2**31), 2**31 - 1)


def xsd_long(col: Column) -> Column:
    return _int_range(col, "long", None, None)


def xsd_unsigned_byte(col: Column) -> Column:
    return _int_range(col, "unsignedByte", 0, 255)


def xsd_unsigned_short(col: Column) -> Column:
    return _int_range(col, "unsignedShort", 0, 65535)


def xsd_unsigned_int(col: Column) -> Column:
    return _int_range(col, "unsignedInt", 0, 2**32 - 1)


def xsd_unsigned_long(col: Column) -> Column:
    # beyond long range: gate through decimal(20,0) (the max literal itself
    # exceeds int64, so it rides as a decimal literal too)
    g = col.try_cast("decimal(20,0)")
    u64_max = F.lit("18446744073709551615").cast("decimal(20,0)")
    lex = F.when(
        g.isNotNull() & (g >= 0) & (g <= u64_max), g.cast("decimal(20,0)").cast("string")
    )
    return _typed(lex, "unsignedLong")


def xsd_non_negative_integer(col: Column) -> Column:
    return _int_range(col, "nonNegativeInteger", 0, None)


def xsd_unsigned_integer(col: Column) -> Column:
    # in the reference's DATA_TYPES though not a W3C XSD builtin; same value
    # space as nonNegativeInteger
    return _int_range(col, "unsignedInteger", 0, None)


def xsd_negative_integer(col: Column) -> Column:
    return _int_range(col, "negativeInteger", None, -1)


def xsd_non_positive_integer(col: Column) -> Column:
    return _int_range(col, "nonPositiveInteger", None, 0)


def xsd_any_uri(col: Column) -> Column:
    # anyURI admits relative refs; the lexical gate rejects whitespace
    return _gated(col, r"^\S+$", "anyURI")


def xsd_language(col: Column) -> Column:
    return _gated(col, r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$", "language")


def xsd_normalized_string(col: Column) -> Column:
    # replace tab/newline/CR with spaces (XSD whitespace=replace facet)
    lex = F.regexp_replace(col.cast("string"), r"[\t\n\r]", " ")
    return _typed(lex, "normalizedString")


def xsd_token(col: Column) -> Column:
    # collapse internal whitespace runs + trim (whitespace=collapse facet)
    lex = F.trim(F.regexp_replace(col.cast("string"), r"\s+", " "))
    return _typed(lex, "token")


def xsd_nmtoken(col: Column) -> Column:
    return _gated(col, r"^[\w.:-]+$", "NMTOKEN")


def xsd_name(col: Column) -> Column:
    return _gated(col, r"^[A-Za-z_:][\w.:-]*$", "Name")


def xsd_ncname(col: Column) -> Column:
    return _gated(col, r"^[A-Za-z_][\w.-]*$", "NCName")


def rdf_html(col: Column) -> Column:
    s = col.cast("string")
    return F.when(
        s.isNotNull(), F.concat(F.lit('"'), s, F.lit(f'"^^<{RDF_NS}HTML>'))
    )


def rdf_xml_literal(col: Column) -> Column:
    s = col.cast("string")
    return F.when(
        s.isNotNull(),
        F.concat(F.lit('"'), s, F.lit(f'"^^<{RDF_NS}XMLLiteral>')),
    )


# full Rdf11.DATA_TYPES vocabulary (Rdf11.java:35-77); keys are the XSD
# local names (plus the reference's "normalizeString" spelling alias and the
# rdf: namespace pair)
CONVERTERS = {
    "string": xsd_string,
    "boolean": xsd_boolean,
    "decimal": xsd_decimal,
    "integer": xsd_integer,
    "double": xsd_double,
    "float": xsd_float,
    "date": xsd_date,
    "time": xsd_time,
    "dateTime": xsd_datetime,
    "dateTimeStamp": xsd_datetime_stamp,
    "gYear": xsd_gyear,
    "gMonth": xsd_gmonth,
    "gDay": xsd_gday,
    "gYearMonth": xsd_gyearmonth,
    "gMonthDay": xsd_gmonthday,
    "duration": xsd_duration,
    "yearMonthDuration": xsd_year_month_duration,
    "dayTimeDuration": xsd_day_time_duration,
    "byte": xsd_byte,
    "short": xsd_short,
    "int": xsd_int,
    "long": xsd_long,
    "unsignedByte": xsd_unsigned_byte,
    "unsignedShort": xsd_unsigned_short,
    "unsignedInt": xsd_unsigned_int,
    "unsignedLong": xsd_unsigned_long,
    "unsignedInteger": xsd_unsigned_integer,
    "nonNegativeInteger": xsd_non_negative_integer,
    "negativeInteger": xsd_negative_integer,
    "nonPositiveInteger": xsd_non_positive_integer,
    "hexBinary": xsd_hex_binary,
    "base64Binary": xsd_base64_binary,
    "anyURI": xsd_any_uri,
    "language": xsd_language,
    "normalizedString": xsd_normalized_string,
    "normalizeString": xsd_normalized_string,  # reference spelling
    "token": xsd_token,
    "NMTOKEN": xsd_nmtoken,
    "Name": xsd_name,
    "NCName": xsd_ncname,
    "HTML": rdf_html,
    "XMLLiteral": rdf_xml_literal,
}


def to_typed_literal(col: Column, dtype: str, **kw) -> Column:
    """Dispatch a column to its XSD literal form (Rdf11-style vocabulary)."""
    if dtype not in CONVERTERS:
        raise ValueError(f"unsupported datatype {dtype}")
    return CONVERTERS[dtype](col, **kw)
