"""Serializer: ECHAR escaping, typed/language object terms, TURTLE header +
qname compaction, file formats — reference JenaSerializerStep.serializeModel
(JenaSerializerStep.java:243-338) and the Rdf11 format table (Rdf11.java:
79-86)."""

from __future__ import annotations

import glob

import pytest

from kettle_jena_plugins_spark.operators.serialize import (
    StatementSpec,
    ntriples_lines,
    serialize_docs,
    turtle_lines,
)

NS = "http://example.org/t#"


def df(spark, rows):
    return spark.createDataFrame(rows, "subject string, v string, n int")


def lines(d):
    return sorted(r["value"] for r in d.collect())


def test_full_escaping(spark):
    d = df(spark, [("s1", 'a"b\\c\nd\re\tf', 1)])
    out = lines(ntriples_lines(d, "subject", {f"{NS}v": "v"}))
    assert out == [f'<s1> <{NS}v> "a\\"b\\\\c\\nd\\re\\tf" .']


def test_typed_and_lang_terms(spark):
    d = df(spark, [("s1", "hi", 7)])
    out = lines(
        ntriples_lines(
            d,
            "subject",
            {
                f"{NS}plain": "v",
                f"{NS}tagged": StatementSpec("v", lang="en"),
                f"{NS}typed": StatementSpec("v", datatype="string"),
                f"{NS}num": StatementSpec("n", datatype="integer"),
            },
        )
    )
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert f'<s1> <{NS}plain> "hi" .' in out
    assert f'<s1> <{NS}tagged> "hi"@en .' in out
    assert f'<s1> <{NS}typed> "hi"^^<{xsd}string> .' in out
    assert f'<s1> <{NS}num> "7"^^<{xsd}integer> .' in out


def test_null_statement_dropped(spark):
    d = df(spark, [("s1", None, 1), ("s2", "x", None)])
    out = lines(
        ntriples_lines(
            d,
            "subject",
            {f"{NS}v": "v", f"{NS}n": StatementSpec("n", datatype="integer")},
        )
    )
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert out == [
        f'<s1> <{NS}n> "1"^^<{xsd}integer> .',
        f'<s2> <{NS}v> "x" .',
    ]


def test_datatype_and_lang_exclusive():
    with pytest.raises(ValueError, match="exclusive"):
        StatementSpec("v", datatype="string", lang="en")


def test_turtle_header_and_compaction(spark):
    d = df(spark, [("s1", "hi", 1)])
    out = lines(
        turtle_lines(
            d,
            "subject",
            {f"{NS}v": "v", "http://other.org/p": "v"},
            namespaces={"t": NS},
        )
    )
    assert f"@prefix t: <{NS}> ." in out
    assert '<s1> t:v "hi" .' in out  # registered ns → compacted
    assert '<s1> <http://other.org/p> "hi" .' in out  # unregistered → full


def test_serialize_docs_turtle(spark, tmp_path):
    d = df(spark, [("s1", "hi", 1), ("s2", "yo", 2)])
    path = str(tmp_path / "out.ttl")
    wall = serialize_docs(
        d,
        path,
        fmt="turtle",
        statements={f"{NS}v": "v"},
        namespaces={"t": NS},
        single_file=True,
    )
    assert wall >= 0
    (part,) = glob.glob(f"{path}/part-*")
    content = open(part).read().splitlines()
    assert set(content) == {
        f"@prefix t: <{NS}> .",
        '<s1> t:v "hi" .',
        '<s2> t:v "yo" .',
    }
    assert content[0].startswith("@prefix")  # header rides first in the union
