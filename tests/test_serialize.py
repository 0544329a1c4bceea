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


def test_rdfxml_rows_shape_and_escaping(spark):
    from kettle_jena_plugins_spark.operators.serialize import rdfxml_rows

    d = df(spark, [("s1", "a<b&c>d", 7), ("s2", None, None)])
    out = lines(
        rdfxml_rows(
            d,
            "subject",
            {
                f"{NS}v": StatementSpec("v", lang="en"),
                f"{NS}n": StatementSpec("n", datatype="integer"),
            },
            namespaces={"t": NS},
        )
    )
    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert '<?xml version="1.0" encoding="UTF-8"?>' in out
    assert f'<rdf:RDF xmlns:rdf="{rdf}" xmlns:t="{NS}">' in out
    assert "</rdf:RDF>" in out
    assert (
        '  <rdf:Description rdf:about="s1">'
        '<t:v xml:lang="en">a&lt;b&amp;c&gt;d</t:v>'
        f'<t:n rdf:datatype="{xsd}integer">7</t:n>'
        "</rdf:Description>" in out
    )
    # all-null subject still gets an (empty) description element
    assert '  <rdf:Description rdf:about="s2"></rdf:Description>' in out


def test_rdfxml_requires_namespaced_predicates(spark):
    from kettle_jena_plugins_spark.operators.serialize import rdfxml_rows

    d = df(spark, [("s1", "x", 1)])
    with pytest.raises(ValueError, match="registered namespace"):
        rdfxml_rows(d, "subject", {"http://other.org/p": "v"}, {"t": NS})


def test_serialize_docs_rdfxml_single_file_order(spark, tmp_path):
    d = df(spark, [("s1", "hi", 1)])
    path = str(tmp_path / "out.rdf")
    serialize_docs(
        d,
        path,
        fmt="rdfxml",
        statements={f"{NS}v": "v"},
        namespaces={"t": NS},
        single_file=True,
    )
    (part,) = glob.glob(f"{path}/part-*")
    content = open(part).read().splitlines()
    assert content[0].startswith("<?xml")
    assert content[1].startswith("<rdf:RDF")
    assert content[-1] == "</rdf:RDF>"
    assert any("rdf:Description" in line for line in content[2:-1])


def test_rdfxml_abbrev_collapse_is_semantically_verified(spark, tmp_path):
    """The documented flat≡ABBREV collapse, as a checked claim: for
    one-subject-per-row, literal-only documents (no rdf:type, no nested
    resources — nothing for abbreviation to abbreviate), the rdfxml output
    must (a) be well-formed XML, (b) contain only literal property
    elements, and (c) parse back to EXACTLY the triple set the ntriples
    serialization emits."""
    import xml.etree.ElementTree as ET

    RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    d = df(
        spark,
        [("s1", 'quote " and <angle>', 1), ("s2", None, 2), ("s3", "plain", 3)],
    )
    stmts = {
        f"{NS}v": StatementSpec("v"),
        f"{NS}n": StatementSpec("n", datatype="integer"),
        f"{NS}lbl": StatementSpec("v", lang="en"),
    }
    path = str(tmp_path / "out.rdf")
    # rdfxml-abbrev routes through the same writer (the collapse)
    serialize_docs(d, path, fmt="rdfxml-abbrev", statements=stmts, namespaces={"t": NS})
    (part,) = glob.glob(f"{path}/part-*")
    root = ET.parse(part).getroot()  # (a) well-formed

    xml_triples = set()
    for desc in root:
        assert desc.tag == f"{{{RDF_NS}}}Description"
        subj = desc.attrib[f"{{{RDF_NS}}}about"]
        for prop in desc:
            # (b) literal property elements only: no children, no
            # rdf:resource / rdf:nodeID (the shapes ABBREV would change)
            assert len(list(prop)) == 0
            assert f"{{{RDF_NS}}}resource" not in prop.attrib
            pred = prop.tag.replace("{", "").replace("}", "")
            dt = prop.attrib.get(f"{{{RDF_NS}}}datatype")
            lang = prop.attrib.get("{http://www.w3.org/XML/1998/namespace}lang")
            xml_triples.add((subj, pred, prop.text or "", dt, lang))

    nt_triples = set()
    for line in lines(ntriples_lines(d, "subject", stmts)):
        assert line.endswith(" .")
        s, rest = line[1:].split("> <", 1)
        p, obj = rest.split("> ", 1)
        obj = obj[:-2]  # strip " ."
        dt = lang = None
        if obj.endswith(">") and "^^<" in obj:
            obj, dt = obj.rsplit("^^<", 1)
            dt = dt[:-1]
        elif "\"@" in obj:
            obj, lang = obj.rsplit("@", 1)
        lex = obj[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        nt_triples.add((s, p, lex, dt, lang))

    assert xml_triples == nt_triples  # (c) same triple set


def test_filename_decoration(spark, tmp_path):
    """Decorated output filenames (JenaSerializerStep.java:256-300):
    base + stepnr + partnr + date + time fragments, in that order, before
    the format extension; collision guard when partnr is off."""
    import datetime
    import glob as g
    import os

    from kettle_jena_plugins_spark.operators.serialize import (
        FilenameDecoration,
        decorate_part_files,
        serialize_docs,
    )

    d = df(spark, [("s1", "a", 1), ("s2", "b", 2)]).repartition(2)
    path = str(tmp_path / "nt")
    serialize_docs(
        d,
        path,
        fmt="ntriples",
        statements={f"{NS}v": "v"},
        decorate=FilenameDecoration(
            base="graph", include_step_nr=True, step_nr=3
        ),
    )
    names = sorted(os.path.basename(p) for p in g.glob(f"{path}/graph*"))
    assert names == ["graph_3_0.nt", "graph_3_1.nt"]
    assert not g.glob(f"{path}/part-*")

    # date/time fragments, deterministic clock
    d.select("subject").coalesce(1).write.mode("overwrite").text(
        str(tmp_path / "raw")
    )
    out = decorate_part_files(
        str(tmp_path / "raw"),
        FilenameDecoration(
            base="o", include_date=True, include_time=True
        ),
        "turtle",
        now=datetime.datetime(2026, 3, 7, 8, 9, 10),
    )
    assert [os.path.basename(p) for p in out] == ["o_0_20260307_080910.ttl"]

    # two parts + no partition number → collision guard
    serialize_docs(
        d, str(tmp_path / "nt2"), fmt="ntriples", statements={f"{NS}v": "v"}
    )
    with pytest.raises(ValueError, match="collide"):
        decorate_part_files(
            str(tmp_path / "nt2"),
            FilenameDecoration(include_partition_nr=False),
            "ntriples",
        )


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


def test_typed_literal_lexical_escaping(spark):
    """token/HTML lexical forms pass user text through — quotes, backslashes
    and newlines must be ECHAR-escaped inside the typed literal."""
    d = df(spark, [("s1", 'to"k\\en\nx', 1)])
    out = lines(
        ntriples_lines(
            d,
            "subject",
            {
                f"{NS}tok": StatementSpec("v", datatype="token"),
                f"{NS}html": StatementSpec("v", datatype="HTML"),
            },
        )
    )
    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    # token collapses the newline to a space BEFORE escaping
    assert f'<s1> <{NS}tok> "to\\"k\\\\en x"^^<{xsd}token> .' in out
    # HTML keeps the raw text but escapes it
    assert f'<s1> <{NS}html> "to\\"k\\\\en\\nx"^^<{rdf}HTML> .' in out


def test_escaping_invariants_adversarial_corpus(spark):
    """Seeded adversarial corpus (quotes, backslashes, control chars, XML
    metachars, unicode) through all three line formats: every emitted line
    must be single-line, and N-Triples/Turtle literals must contain no raw
    quote/backslash outside the delimiters (parseability invariants)."""
    import random
    import re

    from kettle_jena_plugins_spark.operators.serialize import rdfxml_rows

    rng = random.Random(7)
    alphabet = list('abc"\\\n\r\t<>&\'é☃') + ["\\n", '""', "\\\\"]
    rows = [
        (f"s{i}", "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))), i)
        for i in range(200)
    ]
    d = df(spark, rows)
    nt = lines(ntriples_lines(d, "subject", {f"{NS}v": "v"}))
    tt = lines(turtle_lines(d, "subject", {f"{NS}v": "v"}, {"t": NS}))
    xml = lines(rdfxml_rows(d, "subject", {f"{NS}v": "v"}, {"t": NS}))
    for line in nt + tt + xml:
        assert "\n" not in line and "\r" not in line
    pat = re.compile(r'^<[^>]*> \S+ "((?:[^"\\]|\\.)*)" \.$')
    for line in nt:
        assert pat.match(line), f"unparseable N-Triples line: {line!r}"
    for line in tt:
        if line.startswith("@prefix"):
            continue
        assert pat.match(line), f"unparseable Turtle line: {line!r}"
    # XML body: raw < > & must not appear inside element content
    for line in xml:
        if "Description" not in line:
            continue
        for content in re.findall(r"<t:v>(.*?)</t:v>", line):
            assert "<" not in content and ">" not in content
            assert not re.search(r"&(?!(amp|lt|gt|quot|#10|#13);)", content)


def test_rdfxml_abbrev_typed_node_and_parsetype_resource(spark):
    """True ABBREV output (Rdf11.java:82-83 RDF/XML-ABBREV): rdf:type folds
    into the element name (typed node element), nested blank-node
    substructures elide their rdf:Description via rdf:parseType="Resource",
    and an all-null substructure drops entirely (ActionIfNull=IGNORE parity
    with construct.py's recursive children)."""
    import xml.etree.ElementTree as ET

    from kettle_jena_plugins_spark.operators.serialize import (
        rdfxml_abbrev_rows,
    )

    RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    d = df(spark, [("s1", "hello", 1), ("s2", None, 2)])
    out = rdfxml_abbrev_rows(
        d,
        subject_col="subject",
        type_uri=f"{NS}Thing",
        statements={
            f"{NS}v": StatementSpec("v"),
            f"{NS}meta": {
                # both children source the same nullable column: for s2 the
                # whole t:meta substructure must drop
                f"{NS}lbl": StatementSpec("v", lang="en"),
                f"{NS}inner": {f"{NS}n2": StatementSpec("v")},
            },
            f"{NS}prov": {f"{NS}n": StatementSpec("n", datatype="integer")},
        },
        namespaces={"t": NS},
    )
    xml = "\n".join(r["value"] for r in out.collect())
    root = ET.fromstring(xml)

    nodes = {n.attrib[f"{{{RDF_NS}}}about"]: n for n in root}
    assert set(nodes) == {"s1", "s2"}
    # typed node element: element NAME carries the type, no rdf:type child
    for n in nodes.values():
        assert n.tag == f"{{{NS}}}Thing"
        assert not any(c.tag == f"{{{RDF_NS}}}type" for c in n)

    s1 = nodes["s1"]
    props = {c.tag: c for c in s1}
    assert props[f"{{{NS}}}v"].text == "hello"
    meta = props[f"{{{NS}}}meta"]
    # parseType="Resource" elision: no inner rdf:Description element
    assert meta.attrib[f"{{{RDF_NS}}}parseType"] == "Resource"
    assert not any(c.tag == f"{{{RDF_NS}}}Description" for c in meta)
    lbl = meta.find(f"{{{NS}}}lbl")
    assert lbl.text == "hello"
    assert lbl.attrib["{http://www.w3.org/XML/1998/namespace}lang"] == "en"
    inner = meta.find(f"{{{NS}}}inner")
    assert inner.attrib[f"{{{RDF_NS}}}parseType"] == "Resource"
    assert inner.find(f"{{{NS}}}n2").text == "hello"
    prov = props[f"{{{NS}}}prov"]
    assert prov.find(f"{{{NS}}}n").text == "1"
    assert prov.find(f"{{{NS}}}n").attrib[
        f"{{{RDF_NS}}}datatype"
    ].endswith("integer")

    # s2: v is null -> t:v absent AND the whole t:meta subtree dropped,
    # while t:prov (non-null n) survives
    s2_tags = {c.tag for c in nodes["s2"]}
    assert s2_tags == {f"{{{NS}}}prov"}


def test_serialize_docs_rdfxml_abbrev_writes_distinct_layout(spark, tmp_path):
    """fmt="rdfxml-abbrev" through serialize_docs now routes to the
    abbreviated writer — same envelope, one part-file, parses clean."""
    import xml.etree.ElementTree as ET

    d = df(spark, [("s1", "x", 1)])
    path = str(tmp_path / "out.rdf")
    serialize_docs(
        d,
        path,
        fmt="rdfxml-abbrev",
        statements={f"{NS}meta": {f"{NS}v": StatementSpec("v")}},
        namespaces={"t": NS},
    )
    (part,) = glob.glob(f"{path}/part-*")
    root = ET.parse(part).getroot()
    meta = root[0][0]
    assert meta.tag == f"{{{NS}}}meta"
    assert "parseType" in list(meta.attrib)[0]


def test_rdfxml_abbrev_escaping_adversarial_corpus(spark):
    """The abbreviated writer shares the escaping invariants: adversarial
    values (quotes, backslashes, control chars, XML metachars, unicode)
    through typed node elements + nested parseType=Resource substructures
    must yield single-line rows that parse as XML and round-trip every
    non-null value exactly."""
    import random
    import xml.etree.ElementTree as ET

    from kettle_jena_plugins_spark.operators.serialize import (
        rdfxml_abbrev_rows,
    )

    rng = random.Random(13)
    alphabet = list('abc"\\\n\r\t<>&\'é☃') + ["\\n", '""', "\\\\"]
    rows = [
        (
            f"s{i}",
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(0, 12))
            ),
            i,
        )
        for i in range(200)
    ]
    d = df(spark, rows)
    out = rdfxml_abbrev_rows(
        d,
        subject_col="subject",
        type_uri=f"{NS}Thing",
        statements={f"{NS}meta": {f"{NS}v": StatementSpec("v")}},
        namespaces={"t": NS},
    )
    emitted = [r["value"] for r in out.collect()]
    for line in emitted:
        assert "\n" not in line and "\r" not in line
    root = ET.fromstring("\n".join(emitted))  # parses as one document
    got = {}
    for node in root:
        subj = node.attrib[
            "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}about"
        ]
        meta = node.find(f"{{{NS}}}meta")
        if meta is not None:
            got[subj] = meta.find(f"{{{NS}}}v").text or ""
    for subj, v, _ in rows:
        if v is None:
            assert subj not in got
        else:
            # numeric charrefs decode back to the raw newline/CR bytes
            assert got.get(subj, "") == v, subj


# ------------------------------------------------------ RDF collections

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _coll_df(spark):
    return spark.createDataFrame(
        [
            ("s1", ["a", "b", "c"]),
            ("s2", []),          # empty list → rdf:nil / ()
            ("s3", None),        # statement dropped
            ("s4", ["x", None, "y"]),  # null element compacted out
        ],
        "subject string, vals array<string>",
    )


def test_turtle_collection_syntax(spark):
    from kettle_jena_plugins_spark.operators.serialize import turtle_lines

    out = lines(
        turtle_lines(
            spark.createDataFrame(
                [("s1", ["a", 'q"uote', None])],
                "subject string, vals array<string>",
            ),
            "subject",
            {f"{NS}list": StatementSpec("vals", collection=True)},
            namespaces={"t": NS},
        )
    )
    # escaped elements, null compacted, one collection term
    assert f'<s1> t:list ( "a" "q\\"uote" ) .' in out
    d = _coll_df(spark)
    out = lines(
        turtle_lines(
            d,
            "subject",
            {f"{NS}list": StatementSpec("vals", collection=True)},
            namespaces={"t": NS},
        )
    )
    assert f'<s1> t:list ( "a" "b" "c" ) .' in out
    assert f"<s2> t:list () ." in out
    assert not any(o.startswith("<s3>") for o in out)
    assert f'<s4> t:list ( "x" "y" ) .' in out


def test_ntriples_collection_chain(spark):
    """first/rest chain on deterministic blank labels: chain is walkable
    from the head triple to rdf:nil and stable across runs."""
    d = _coll_df(spark)
    out = lines(
        ntriples_lines(
            d, "subject", {f"{NS}list": StatementSpec("vals", collection=True)}
        )
    )
    out2 = lines(
        ntriples_lines(
            d, "subject", {f"{NS}list": StatementSpec("vals", collection=True)}
        )
    )
    assert out == out2  # deterministic labels
    # s2: empty list → direct rdf:nil object, no chain nodes
    assert any(
        o.startswith("<s2>") and o.endswith(f"<{RDF_NS}nil> .") for o in out
    )
    # s3 dropped entirely
    assert not any("<s3>" in o or "s3" in o.split(" ")[0] for o in out)
    # s1: walk the chain — head points at label 0; 3 firsts; last rest=nil
    head = [o for o in out if o.startswith(f"<s1> <{NS}list> ")][0]
    lbl0 = head.split(" ")[2]
    assert lbl0.startswith("_:c")
    firsts = [o for o in out if f"<{RDF_NS}first>" in o and o.startswith("_:c")]
    s1_firsts = [o for o in firsts if o.startswith(lbl0[:-1])]
    assert len(s1_firsts) == 3
    assert f'{lbl0} <{RDF_NS}first> "a" .' in out
    rests = [o for o in out if o.startswith(lbl0[:-1]) and f"<{RDF_NS}rest>" in o]
    assert len(rests) == 3
    assert sum(1 for o in rests if o.endswith(f"<{RDF_NS}nil> .")) == 1
    # s4: null element compacted → 2-node chain
    assert any(o.endswith(f'<{RDF_NS}first> "x" .') for o in out)
    assert any(o.endswith(f'<{RDF_NS}first> "y" .') for o in out)


def test_rdfxml_abbrev_parsetype_collection(spark):
    from kettle_jena_plugins_spark.operators.serialize import (
        rdfxml_abbrev_rows,
        rdfxml_rows,
    )

    d = spark.createDataFrame(
        [
            ("s1", ["http://x.org/a", "http://x.org/b"]),
            ("s2", []),
        ],
        "subject string, refs array<string>",
    )
    ns = {"t": NS}
    out = lines(
        rdfxml_abbrev_rows(
            d,
            "subject",
            {f"{NS}refs": StatementSpec("refs", collection=True, items_iri=True)},
            namespaces=ns,
        )
    )
    body = [o for o in out if "rdf:about=\"s1\"" in o][0]
    assert (
        '<t:refs rdf:parseType="Collection">'
        '<rdf:Description rdf:about="http://x.org/a"/>'
        '<rdf:Description rdf:about="http://x.org/b"/>'
        "</t:refs>"
    ) in body
    empty = [o for o in out if "rdf:about=\"s2\"" in o][0]
    assert '<t:refs rdf:parseType="Collection"></t:refs>' in empty
    # literal-item lists have no RDF/XML form — loud, not silent
    with pytest.raises(ValueError, match="node elements"):
        rdfxml_abbrev_rows(
            d,
            "subject",
            {f"{NS}refs": StatementSpec("refs", collection=True)},
            namespaces=ns,
        ).collect()
    # flat writer: no collection shorthand at all
    with pytest.raises(ValueError, match="collection"):
        rdfxml_rows(
            d,
            "subject",
            {f"{NS}refs": StatementSpec("refs", collection=True, items_iri=True)},
            namespaces=ns,
        ).collect()


def test_collection_iri_items_in_ntriples_and_turtle(spark):
    from kettle_jena_plugins_spark.operators.serialize import turtle_lines

    d = spark.createDataFrame(
        [("s1", ["http://x.org/a", "http://x.org/b"])],
        "subject string, refs array<string>",
    )
    spec = StatementSpec("refs", collection=True, items_iri=True)
    nt = lines(ntriples_lines(d, "subject", {f"{NS}refs": spec}))
    assert any(o.endswith(f"<{RDF_NS}first> <http://x.org/a> .") for o in nt)
    tt = lines(turtle_lines(d, "subject", {f"{NS}refs": spec}, namespaces={"t": NS}))
    assert "<s1> t:refs ( <http://x.org/a> <http://x.org/b> ) ." in tt
