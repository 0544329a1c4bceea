"""Vectorized text normalization (Arrow/pandas UDFs — no per-row Python).

Reference analogue: the per-row value conversion + UTF-8 decode inside the
Create-Jena-Model step (convertSqlValueToRdf, JenaModelStep.java:439-533) —
the engine's per-event payload normalization before merge. Purity matters:
byte-identical replay (north rule) requires these to be deterministic,
version-pinned functions of their input only.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# explicit DataType (not a DDL string): keeps module importable without an
# active SparkSession
@pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """NFC-normalize, strip control chars, collapse whitespace runs, trim.

    Pure & deterministic (unicodedata is version-pinned by the Python
    runtime shipped with the job).
    """
    import re

    ws = re.compile(r"\s+")
    ctl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")

    def norm(v):
        if v is None:
            return None
        v = unicodedata.normalize("NFC", v)
        v = ctl.sub("", v)
        return ws.sub(" ", v).strip()

    return s.map(norm)


def normalize_text_builtin(col: Column) -> Column:
    """JVM-side fallback covering the whitespace/trim part only (no NFC):
    used when a query needs an exact SQL oracle (DuckDB lacks NFC)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))
