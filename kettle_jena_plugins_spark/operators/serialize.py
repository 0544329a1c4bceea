"""Terminal serializer — the reference's Serialize-Jena-Model sink
(JenaSerializerStep.java:243-338): fold all rows' graphs into one output,
written once, in a choice of formats (Rdf11.java:79-86: TURTLE, N3,
N-TRIPLE, RDF/XML; default TURTLE), filename decorated with step/partition
number (:257-264), parent dirs created (:309-313), wall time logged (:96-102).

Engine mapping: the per-row canonical document lines (operators/construct.py)
are written ONCE per bounded run — formats map to line-oriented layouts:
  ntriples — one `<subj> <pred> "obj" .` line per statement (the N-TRIPLE path)
  canon    — one canonical doc line per row (isomorphism-stable)
  jsonl    — one JSON object per row
  parquet  — columnar (the lake-native form)
Partition decoration → Spark's natural part-file numbering; create-parents →
the filesystem writer's default; wall time → returned.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = ("ntriples", "canon", "jsonl", "parquet")


def ntriples_lines(
    docs: DataFrame,
    subject_col: str = "subject",
    statements: dict[str, str] | None = None,
) -> DataFrame:
    """One `<subj> <prop> "obj" .` line per non-null statement value — the
    N-TRIPLE serialization (Rdf11.java:81) as a pure column expression, so
    the write stays a narrow map over the scan (no shuffle, no UDF)."""
    stmts = statements or {}
    lines = [
        F.when(
            F.col(col).isNotNull(),
            F.concat(
                F.lit("<"), F.col(subject_col), F.lit(f"> <{prop}> "),
                F.lit('"'),
                F.regexp_replace(F.col(col).cast("string"), r'"', r'\\"'),
                F.lit('" .'),
            ),
        )
        for prop, col in stmts.items()
    ]
    return docs.select(F.explode(F.array_compact(F.array(*lines))).alias("value"))


def serialize_docs(
    docs: DataFrame,
    path: str,
    fmt: str = "ntriples",
    subject_col: str = "subject",
    statements: dict[str, str] | None = None,
    single_file: bool = False,
) -> float:
    """Write the document stream once; returns wall seconds (the reference
    logs serializer wall time, JenaSerializerStep.java:96-102).

    statements: {property_uri: value_column} — exploded to one triple line
    per non-null value for the ntriples format.
    """
    if fmt not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}")
    t0 = time.time()
    out = docs
    if single_file:
        out = out.coalesce(1)
    if fmt == "parquet":
        out.write.mode("overwrite").parquet(path)
    elif fmt == "jsonl":
        out.write.mode("overwrite").json(path)
    elif fmt == "canon":
        out.select(
            F.col(subject_col).cast("string").alias("value")
        ).write.mode("overwrite").text(path)
    else:  # ntriples
        ntriples_lines(out, subject_col, statements).write.mode(
            "overwrite"
        ).text(path)
    return time.time() - t0
