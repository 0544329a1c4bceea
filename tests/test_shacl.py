"""SHACL shapes-file loader: the runtime-loaded shapes-graph analogue
(JenaShaclStep.java:59-71; nested property shapes as in
JenaShaclStepIT.java:58-81 / ODRL-shape.ttl) compiled onto nested doc
columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from kettle_jena_plugins_spark.operators.shacl import shapes_from_ttl
from kettle_jena_plugins_spark.operators.validate import (
    PathShape,
    ValidationSpec,
    dead_letter_stats,
)

# mirrors the ODRL shape file's *structure* (targetClass shape, simple
# min/max property, sequence path, alternativePath, sh:node helper shape)
# over this engine's transcript vocabulary
SHAPES_TTL = """
@prefix t:  <http://example.org/transcript#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .

t:TurnShape
    a sh:NodeShape ;
    sh:targetClass t:Turn ;

    # there must always be text
    sh:property [
        sh:path t:text ;
        sh:minCount 1 ;
    ] ;

    # doubly-nested provenance lsn (sequence path)
    sh:property [
        sh:path ( t:meta t:prov t:lsn ) ;
        sh:minCount 1 ;
        sh:maxCount 1 ;
    ] ;

    # at least one of text / tool (alternative path)
    sh:property [
        sh:path [
            sh:alternativePath ( t:text t:metatool )
        ] ;
        sh:minCount 1 ;
    ] ;

    # any present meta substructure must carry a tool (nested node shape)
    sh:property [
        sh:path t:meta ;
        sh:node t:MetaShape ;
    ] .

t:MetaShape
    a sh:NodeShape ;
    sh:property [
        sh:path t:tool ;
        sh:minCount 1 ;
    ] .
"""


def test_compile_shapes_subset():
    shapes, any_of, constraints = shapes_from_ttl(SHAPES_TTL, root="doc")
    assert PathShape("doc.t_text", min_count=1, max_count=None) in shapes
    assert (
        PathShape("doc.t_meta.t_prov.t_lsn", min_count=1, max_count=1)
        in shapes
    )
    assert ("doc.t_text", "doc.t_metatool") in any_of
    assert constraints == (
        (
            "node:doc.t_meta.t_tool",
            "doc.t_meta IS NOT NULL AND doc.t_meta.t_tool IS NULL",
        ),
    )


def test_parser_robustness():
    """Valid-Turtle forms that must not derail the subset parser: '#'
    inside string literals (not a comment), statement terminator abutting
    the object ('t:Ref.' / 'sh:minCount 1.'), ignored vocabulary."""
    ttl = """
@prefix t:  <http://example.org/transcript#> .
@prefix sh: <http://www.w3.org/ns/shacl#> .

t:S a sh:NodeShape ;
    sh:targetClass t:Turn ;
    sh:property [
        sh:path t:text ;
        sh:message "see #4 for details" ;
        sh:minCount 1.
    ] ;
    sh:property [ sh:path t:meta ; sh:node t:Helper. ] .

t:Helper a sh:NodeShape ;
    sh:property [ sh:path t:tool ; sh:minCount 1 ; ] .
"""
    shapes, any_of, constraints = shapes_from_ttl(ttl, root="doc")
    assert PathShape("doc.t_text", min_count=1, max_count=None) in shapes
    # the helper stays a helper: no standalone t_tool shape, only the
    # inlined node constraint (the merged-subject misparse would promote it)
    assert not any(s.path.endswith("t_tool") for s in shapes)
    assert constraints == (
        (
            "node:doc.t_meta.t_tool",
            "doc.t_meta IS NOT NULL AND doc.t_meta.t_tool IS NULL",
        ),
    )


def test_helper_shape_emits_nothing_standalone():
    shapes, any_of, constraints = shapes_from_ttl(SHAPES_TTL)
    # MetaShape has no targetClass: its t_tool requirement appears ONLY as
    # the inlined node constraint, never as a standalone PathShape
    assert not any(s.path.endswith("t_tool") for s in shapes)


def test_shapes_ttl_validates_constructed_docs(spark):
    """End-to-end: shapes file → ValidationSpec → dead-letter stats over a
    constructed nested document, vacuous for absent meta nodes."""
    from kettle_jena_plugins_spark.operators.construct import (
        PropertyMapping,
        construct_doc,
    )

    ns = {"t": "http://example.org/transcript#"}
    df = spark.createDataFrame(
        [
            # (id, text, tool, lsn): r1 conforms fully
            ("r1", "hi", "bash", 1),
            ("r2", None, "grep", 2),  # text missing → min_count + not any_of
            ("r3", "yo", None, 3),  # meta present but tool null → node:
        ],
        "id string, text string, tool string, lsn long",
    )
    docs = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping("text", "t:text"),
            PropertyMapping("tool", "t:metatool"),
            PropertyMapping(
                None,
                "t:meta",
                children=(
                    PropertyMapping("tool", "t:tool"),
                    PropertyMapping(
                        None,
                        "t:prov",
                        children=(PropertyMapping("lsn", "t:lsn"),),
                    ),
                ),
            ),
        ],
        namespaces=ns,
    )
    shapes, any_of, constraints = shapes_from_ttl(SHAPES_TTL, root="doc")
    spec = ValidationSpec(
        require_keys=(),
        require_ts=False,
        shapes=shapes,
        any_of=any_of,
        constraints=constraints,
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(docs, spec).collect()
    }
    # r2: text null → min_count:doc.t_text; metatool (tool col) non-null so
    # the any_of group is satisfied by the alternative
    assert stats["min_count:doc.t_text"] == 1
    assert "any_of:doc.t_text|doc.t_metatool" not in stats
    # r3: meta exists, tool null → the inlined node-shape constraint
    assert stats["node:doc.t_meta.t_tool"] == 1
    # prov lsn always present
    assert not any("t_prov" in k for k in stats)
    # bad_op/null checks disabled via spec; only shape reasons remain
    assert set(stats) == {"min_count:doc.t_text", "node:doc.t_meta.t_tool"}


def test_datatype_and_pattern_compile_and_fire(spark):
    """sh:datatype / sh:pattern (JenaShaclStep.java:94-108 — Jena enforces
    the full vocabulary; this subset now covers the one-column lexical
    members): conforming values pass, non-conforming fire the
    datatype:/pattern: reasons; sh:flags "i" folds case."""
    ttl = """
    @prefix ex:  <http://example.org/x#> .
    @prefix sh:  <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:n ; sh:datatype xsd:integer ; ] ;
        sh:property [ sh:path ex:role ; sh:pattern "^(user|bot)$" ;
                      sh:flags "i" ; ] .
    """
    shapes, any_of, constraints = shapes_from_ttl(ttl)
    assert shapes == () and any_of == ()
    reasons = {r for r, _ in constraints}
    assert reasons == {"datatype:ex_n", "pattern:ex_role"}

    df = spark.createDataFrame(
        [("1", "user"), ("x", "USER"), ("-42", "admin"), (None, None)],
        "ex_n string, ex_role string",
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    # "x" fails integer; "admin" fails the (case-folded) pattern; nulls
    # are vacuous on both
    assert stats == {"datatype:ex_n": 1, "pattern:ex_role": 1}


def test_unsupported_vocabulary_is_loud():
    import pytest as _pytest

    from kettle_jena_plugins_spark.operators.shacl import (
        ShaclUnsupportedWarning,
    )

    ttl = """
    @prefix ex: <http://example.org/x#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:p ; sh:not [ sh:path ex:q ] ; sh:minCount 1 ;
                      sh:message "annotation only, no warning" ; ] .
    """
    with _pytest.warns(ShaclUnsupportedWarning, match="sh:not"):
        shapes, _, _ = shapes_from_ttl(ttl)
    # the enforceable part (minCount) still compiles
    assert [s.path for s in shapes] == ["ex_p"]
    with _pytest.raises(ValueError, match="sh:not"):
        shapes_from_ttl(ttl, strict=True)
    # unknown datatype lexical space warns too
    ttl2 = """
    @prefix ex: <http://example.org/x#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:p ; sh:datatype ex:weird ; ] .
    """
    with _pytest.warns(ShaclUnsupportedWarning, match="sh:datatype"):
        shapes_from_ttl(ttl2)


def test_length_range_in_hasvalue_constraints(spark):
    """The one-column constraint kinds beyond datatype/pattern:
    length band, numeric range, enumeration, required value — each fires
    on exactly its violating rows; hasValue fires on absence."""
    ttl = """
    @prefix ex:  <http://example.org/x#> .
    @prefix sh:  <http://www.w3.org/ns/shacl#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:name ; sh:minLength 2 ; sh:maxLength 5 ; ] ;
        sh:property [ sh:path ex:age ; sh:minInclusive 0 ;
                      sh:maxExclusive 150.5 ; ] ;
        sh:property [ sh:path ex:role ; sh:in ( "user" "bot" ) ; ] ;
        sh:property [ sh:path ex:kind ; sh:hasValue "turn" ; ] .
    """
    shapes, any_of, constraints = shapes_from_ttl(ttl)
    reasons = {r for r, _ in constraints}
    assert reasons == {
        "min_length:ex_name",
        "max_length:ex_name",
        "min_inclusive:ex_age",
        "max_exclusive:ex_age",
        "in:ex_role",
        "has_value:ex_kind",
    }
    df = spark.createDataFrame(
        [
            ("ok", 30.0, "user", "turn"),    # clean
            ("x", -1.0, "admin", "turn"),    # short name, neg age, bad role
            ("toolong", 150.5, "bot", None), # long name, at excl bound, no kind
            (None, None, None, "turn"),      # nulls vacuous except hasValue
        ],
        "ex_name string, ex_age double, ex_role string, ex_kind string",
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    assert stats == {
        "min_length:ex_name": 1,
        "max_length:ex_name": 1,
        "min_inclusive:ex_age": 1,
        "max_exclusive:ex_age": 1,
        "in:ex_role": 1,
        "has_value:ex_kind": 1,  # row 3's absent kind — hasValue fires on NULL
    }


def test_nodekind_and_class_constraints(spark):
    """sh:nodeKind over the engine's term rendering (struct = blank node,
    quoted full literal term or non-IRI scalar = literal, scheme-shaped
    scalar = IRI) and sh:class as an rdf:type equality check on the
    value node's substructure."""
    ttl = """
    @prefix ex:  <http://example.org/x#> .
    @prefix sh:  <http://www.w3.org/ns/shacl#> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:ref  ; sh:nodeKind sh:IRI ; ] ;
        sh:property [ sh:path ex:name ; sh:nodeKind sh:Literal ; ] ;
        sh:property [ sh:path ex:meta ; sh:nodeKind sh:BlankNode ; ] ;
        sh:property [ sh:path ex:meta ; sh:class ex:Tool ; ] .
    """
    shapes, any_of, constraints = shapes_from_ttl(ttl)
    reasons = {r for r, _ in constraints}
    assert reasons == {
        "node_kind:ex_ref",
        "node_kind:ex_name",
        "node_kind:ex_meta",
        "class:ex_meta",
    }
    df = spark.createDataFrame(
        [
            # clean: IRI-shaped ref, word literal, typed meta
            ("http://a.org/r1", "alice", "http://example.org/x#Tool"),
            # ref not IRI-shaped; name IS IRI-shaped (Literal violated)
            ("not an iri", "urn:x", "http://example.org/x#Tool"),
            # wrong class on meta; quoted literal term satisfies Literal
            ("mailto:a@b.c", '"42"^^<http://www.w3.org/2001/XMLSchema#int>',
             "http://example.org/x#Other"),
            # nulls vacuous everywhere
            (None, None, None),
        ],
        "ex_ref string, ex_name string, rdf_type string",
    ).withColumn(
        "ex_meta",
        F.when(
            F.col("rdf_type").isNotNull(), F.struct(F.col("rdf_type"))
        ),
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    # ex_meta is a struct → BlankNode never fires; class fires once
    assert stats == {
        "node_kind:ex_ref": 1,
        "node_kind:ex_name": 1,
        "class:ex_meta": 1,
    }


def test_named_shape_refs_in_or_and_not(spark):
    """sh:or / sh:not members may cite NAMED helper shapes (not just
    inline blank nodes): the reference resolves to the helper's value
    constraints with no ShaclUnsupportedWarning; a cyclic reference
    chain fails analysis loudly instead of recursing forever."""
    import warnings as _w

    import pytest

    from kettle_jena_plugins_spark.operators.shacl import (
        ShaclUnsupportedWarning,
    )

    ttl = """
    @prefix ex: <http://example.org/x#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:Digits a sh:NodeShape ; sh:pattern "^[0-9]+$" .
    ex:Word   a sh:NodeShape ; sh:pattern "^[a-z]+$" .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:v ; sh:or ( ex:Digits ex:Word ) ; ] ;
        sh:property [ sh:path ex:w ; sh:not ex:Digits ; ] .
    """
    with _w.catch_warnings():
        _w.simplefilter("error", ShaclUnsupportedWarning)
        _, _, constraints = shapes_from_ttl(ttl)
    reasons = {r for r, _ in constraints}
    assert reasons == {"or:ex_v", "not:ex_w"}
    df = spark.createDataFrame(
        [
            ("123", "abc"),   # v: digits member ok; w: not-digits ok
            ("abc", "55"),    # v: word member ok; w: digits → not fires
            ("a1", "x"),      # v: conforms to NEITHER member → or fires
            (None, None),     # vacuous
        ],
        "ex_v string, ex_w string",
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    assert stats == {"or:ex_v": 1, "not:ex_w": 1}

    # a referenced shape whose body nests FURTHER composition (sh:not
    # inside the member) is outside the one-level resolution contract:
    # it must fail loudly in strict mode, never silently under-validate
    # (and structurally cannot recurse — members compile value
    # constraints only, so an A→B→A chain is unreachable)
    nested = """
    @prefix ex: <http://example.org/x#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:A a sh:NodeShape ; sh:not ex:B .
    ex:B a sh:NodeShape ; sh:pattern "^[0-9]+$" .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:v ; sh:not ex:A ; ] .
    """
    with pytest.raises(ValueError, match="cannot enforce"):
        shapes_from_ttl(nested, strict=True)


def test_class_subsumption_via_subclassof(spark):
    """sh:class honors rdfs:subClassOf* declared in the shapes file
    (SHACL's real semantics — Jena deployments ship the ontology with
    the shapes graph): a value typed with a transitive descendant
    conforms; an unrelated type still violates; the closure compiles to
    one IN-list predicate, not a join."""
    ttl = """
    @prefix ex:   <http://example.org/x#> .
    @prefix sh:   <http://www.w3.org/ns/shacl#> .
    @prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    ex:Agreement rdfs:subClassOf ex:Policy .
    ex:Offer     rdfs:subClassOf ex:Agreement .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:meta ; sh:class ex:Policy ; ] .
    """
    _, _, constraints = shapes_from_ttl(ttl)
    assert len(constraints) == 1
    df = spark.createDataFrame(
        [
            ("http://example.org/x#Policy",),     # the class itself
            ("http://example.org/x#Agreement",),  # direct subclass
            ("http://example.org/x#Offer",),      # transitive subclass
            ("http://example.org/x#Other",),      # unrelated → violates
            (None,),                              # absent node → vacuous
        ],
        "rdf_type string",
    ).withColumn(
        "ex_meta",
        F.when(
            F.col("rdf_type").isNotNull(), F.struct(F.col("rdf_type"))
        ),
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    assert stats == {"class:ex_meta": 1}


def test_pattern_backslash_survives_sql_literal(spark):
    """A regex class like \\d must survive the trip through the Spark SQL
    string literal (backslash is an escape char there): both the strict
    Turtle form "^\\\\d+$" and the sloppy "^\\d+$" compile to the regex
    ^\\d+$ and actually fire — previously they silently became ^d+$ and
    the constraint stopped validating."""
    for ttl_pattern in ("^\\\\d+$", "^\\d+$"):
        ttl = f"""
        @prefix ex: <http://example.org/x#> .
        @prefix sh: <http://www.w3.org/ns/shacl#> .
        ex:S a sh:NodeShape ; sh:targetClass ex:T ;
            sh:property [ sh:path ex:n ; sh:pattern "{ttl_pattern}" ; ] .
        """
        _, _, constraints = shapes_from_ttl(ttl)
        df = spark.createDataFrame(
            [("123",), ("12x",), ("ddd",), (None,)], "ex_n string"
        )
        spec = ValidationSpec(
            require_keys=(), require_ts=False, constraints=constraints
        )
        stats = {
            r["reason"]: r["n"]
            for r in dead_letter_stats(df, spec).collect()
        }
        # "12x" and "ddd" both fail ^\d+$ ("ddd" passing would mean the
        # backslash was eaten and the regex degraded to ^d+$)
        assert stats == {"pattern:ex_n": 2}, ttl_pattern


def test_and_not_inline_shapes(spark):
    """sh:and = conjunction of inline one-column shapes; sh:not fires when
    the value exists and CONFORMS to the inner shape."""
    import pytest as _pytest

    from kettle_jena_plugins_spark.operators.shacl import (
        ShaclUnsupportedWarning,
    )

    ttl = """
    @prefix ex:  <http://example.org/x#> .
    @prefix sh:  <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:code ;
                      sh:and ( [ sh:datatype xsd:integer ; ]
                               [ sh:minLength 2 ; ] ) ; ] ;
        sh:property [ sh:path ex:name ;
                      sh:not [ sh:pattern "^tmp" ; ] ; ] .
    """
    _, _, constraints = shapes_from_ttl(ttl)
    reasons = sorted(r for r, _ in constraints)
    assert reasons == ["datatype:ex_code", "min_length:ex_code", "not:ex_name"]
    df = spark.createDataFrame(
        [
            ("12", "alice"),    # clean: integer, 2 chars, not tmp-prefixed
            ("7", "bob"),       # and: too short
            ("xx", "tmp_file"), # and: not integer; not: matches ^tmp
            (None, None),       # vacuous everywhere
        ],
        "ex_code string, ex_name string",
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    assert stats == {
        "datatype:ex_code": 1,
        "min_length:ex_code": 1,
        "not:ex_name": 1,
    }
    # structural keys inside an inline shape warn, never silently drop
    ttl_bad = """
    @prefix ex: <http://example.org/x#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:p ; sh:not [ sh:minCount 1 ; ] ; ] .
    """
    with _pytest.warns(ShaclUnsupportedWarning) as rec:
        shapes_from_ttl(ttl_bad)
    msgs = [str(w.message) for w in rec]
    assert any("sh:minCount inside" in m for m in msgs)
    # and the not-shape itself ends up uncompilable — also loud
    assert any("no compilable constraints" in m for m in msgs)


def test_not_hasvalue_semantics(spark):
    """sh:not [ sh:hasValue v ]: violation exactly when the value IS v
    (hasValue's fires-on-absence inner form must invert correctly)."""
    ttl = """
    @prefix ex: <http://example.org/x#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:kind ; sh:not [ sh:hasValue "spam" ; ] ; ] .
    """
    _, _, constraints = shapes_from_ttl(ttl)
    df = spark.createDataFrame(
        [("spam",), ("ham",), (None,)], "ex_kind string"
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    assert stats == {"not:ex_kind": 1}


def test_or_inline_shapes(spark):
    """sh:or: value must conform to ≥1 member shape — violation only when
    every member is violated."""
    ttl = """
    @prefix ex:  <http://example.org/x#> .
    @prefix sh:  <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:v ;
                      sh:or ( [ sh:datatype xsd:integer ; ]
                              [ sh:pattern "^n/a$" ; ] ) ; ] .
    """
    _, _, constraints = shapes_from_ttl(ttl)
    assert [r for r, _ in constraints] == ["or:ex_v"]
    df = spark.createDataFrame(
        [("42",), ("n/a",), ("oops",), (None,)], "ex_v string"
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    # only "oops" conforms to neither member; null is vacuous
    assert stats == {"or:ex_v": 1}


def test_qualified_cardinality_over_arrays(spark):
    """sh:qualifiedValueShape + qualifiedMin/MaxCount over an ARRAY path:
    counts elements conforming to the inline shape via a higher-order
    filter — no explode."""
    ttl = """
    @prefix ex:  <http://example.org/x#> .
    @prefix sh:  <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:tags ;
                      sh:qualifiedValueShape [ sh:pattern "^lang:" ; ] ;
                      sh:qualifiedMinCount 1 ;
                      sh:qualifiedMaxCount 2 ; ] .
    """
    _, _, constraints = shapes_from_ttl(ttl)
    assert sorted(r for r, _ in constraints) == [
        "qualified_max:ex_tags",
        "qualified_min:ex_tags",
    ]
    df = spark.createDataFrame(
        [
            (1, ["lang:en", "topic:x"]),              # 1 conforming: ok
            (2, ["topic:x", None]),                   # 0 conforming: min fires
            (3, ["lang:en", "lang:de", "lang:fr"]),   # 3: max fires
            (4, None),                                # absent: 0 → min fires
        ],
        "id long, ex_tags array<string>",
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False, constraints=constraints
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(df, spec).collect()
    }
    assert stats == {"qualified_min:ex_tags": 2, "qualified_max:ex_tags": 1}


def test_qualified_without_shape_warns():
    import pytest as _pytest

    from kettle_jena_plugins_spark.operators.shacl import (
        ShaclUnsupportedWarning,
    )

    ttl = """
    @prefix ex: <http://example.org/x#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:p ; sh:qualifiedMinCount 1 ; ] .
    """
    with _pytest.warns(ShaclUnsupportedWarning, match="qualifiedValueShape"):
        shapes_from_ttl(ttl)


def test_node_shape_lexical_constraints_inline(spark):
    """A helper shape referenced via sh:node contributes its VALUE
    constraints (datatype/pattern/…) under the parent path — not just its
    minCount children — including through nested sh:node references.
    Absent parents stay vacuous."""
    from kettle_jena_plugins_spark.operators.construct import (
        PropertyMapping,
        construct_doc,
    )

    ttl = """
    @prefix t:   <http://example.org/transcript#> .
    @prefix sh:  <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

    t:TurnShape a sh:NodeShape ; sh:targetClass t:Turn ;
        sh:property [ sh:path t:meta ; sh:node t:MetaShape ; ] .

    t:MetaShape a sh:NodeShape ;
        sh:property [ sh:path t:tool ; sh:minCount 1 ;
                      sh:pattern "^[a-z]+$" ; ] ;
        sh:property [ sh:path t:prov ; sh:node t:ProvShape ; ] .

    t:ProvShape a sh:NodeShape ;
        sh:property [ sh:path t:lsn ; sh:datatype xsd:integer ; ] .
    """
    shapes, any_of, constraints = shapes_from_ttl(ttl, root="doc")
    reasons = {r for r, _ in constraints}
    assert reasons == {
        "node:doc.t_meta.t_tool",
        "pattern:doc.t_meta.t_tool",
        "datatype:doc.t_meta.t_prov.t_lsn",
    }
    df = spark.createDataFrame(
        [
            ("r1", "bash", "7"),    # conforms
            ("r2", "Bash!", "7"),   # pattern fires
            ("r3", "grep", "x7"),   # nested datatype fires
            ("r4", None, None),     # minCount node: fires; lexical vacuous
        ],
        "id string, tool string, lsn string",
    )
    docs = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping(
                None,
                "t:meta",
                children=(
                    PropertyMapping("tool", "t:tool"),
                    PropertyMapping(
                        None,
                        "t:prov",
                        children=(PropertyMapping("lsn", "t:lsn"),),
                    ),
                ),
            ),
        ],
        namespaces={"t": "http://example.org/transcript#"},
    )
    spec = ValidationSpec(
        require_keys=(), require_ts=False,
        shapes=shapes, any_of=any_of, constraints=constraints,
    )
    stats = {
        r["reason"]: r["n"] for r in dead_letter_stats(docs, spec).collect()
    }
    assert stats == {
        "node:doc.t_meta.t_tool": 1,
        "pattern:doc.t_meta.t_tool": 1,
        "datatype:doc.t_meta.t_prov.t_lsn": 1,
    }


def test_node_shape_cycle_guard():
    """Mutually-referencing helper shapes must not hang the compiler."""
    ttl = """
    @prefix t:  <http://example.org/transcript#> .
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    t:A a sh:NodeShape ; sh:targetClass t:T ;
        sh:property [ sh:path t:x ; sh:node t:B ; ] .
    t:B a sh:NodeShape ;
        sh:property [ sh:path t:y ; sh:node t:C ; ] .
    t:C a sh:NodeShape ;
        sh:property [ sh:path t:y ; sh:node t:B ; ] .
    """
    shapes, any_of, constraints = shapes_from_ttl(ttl)
    # terminates; no lexical constraints to emit
    assert constraints == ()
