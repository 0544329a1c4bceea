"""Construct operator: recursive blank-node substructures, ActionIfNull
policies (IGNORE / WARN / ERROR), skip flags, consumed-column removal —
mirrors the reference's JenaModelStepIT policy matrix (JenaModelStepIT.java:
101-147) and the recursive addResourceProperties (JenaModelStep.java:
347-376)."""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kettle_jena_plugins_spark.operators.construct import (
    PropertyMapping,
    construct_doc,
)
from kettle_jena_plugins_spark.operators.validate import Policy

NS = {"t": "http://example.org/t#"}
P = "http://example.org/t#"


def rows(spark, data):
    return spark.createDataFrame(
        data, "id string, role string, tool string, note string"
    )


def test_nested_canon_depth_two(spark):
    df = rows(spark, [("r1", "user", "bash", "hi")])
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping("note", "t:note"),
            PropertyMapping(
                None,
                "t:meta",
                children=(
                    PropertyMapping("role", "t:role"),
                    PropertyMapping(
                        None,
                        "t:prov",
                        children=(PropertyMapping("tool", "t:tool"),),
                    ),
                ),
            ),
        ],
        namespaces=NS,
    )
    r = out.select("doc_canon").first()[0]
    # sorted property order at each level, substructures bracketed
    assert r == (
        f"<ex:r1> {P}meta=[{P}prov=[{P}tool=bash]; {P}role=user]; {P}note=hi"
    )


def test_nested_struct_schema_and_null_child_drops(spark):
    df = rows(spark, [("r1", "user", None, "hi")])
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping(
                None,
                "t:meta",
                children=(
                    PropertyMapping("role", "t:role"),
                    PropertyMapping("tool", "t:tool"),
                ),
            ),
        ],
        namespaces=NS,
    )
    row = out.first()
    # null child statement dropped from canon (IGNORE), struct keeps the
    # field (typed document), substructure itself always attached
    assert row["doc_canon"] == f"<ex:r1> {P}meta=[{P}role=user]"
    meta_type = dict(
        (f.name, f.dataType) for f in out.schema["doc"].dataType.fields
    )["t_meta"]
    assert isinstance(meta_type, T.StructType)
    assert [f.name for f in meta_type.fields] == ["t_role", "t_tool"]
    assert row["doc"]["t_meta"]["t_role"] == "user"
    assert row["doc"]["t_meta"]["t_tool"] is None


def test_skip_inside_children(spark):
    df = rows(spark, [("r1", "user", "bash", "hi")])
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping(
                None,
                "t:meta",
                children=(
                    PropertyMapping("role", "t:role"),
                    PropertyMapping("tool", "t:tool", skip=True),
                ),
            ),
        ],
        namespaces=NS,
    )
    assert out.first()["doc_canon"] == f"<ex:r1> {P}meta=[{P}role=user]"


def test_if_null_error_raises(spark):
    df = rows(spark, [("r1", None, "bash", "hi")])
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[PropertyMapping("role", "t:role", if_null=Policy.ERROR)],
        namespaces=NS,
    )
    with pytest.raises(Exception, match="row field: role is null"):
        out.collect()


def test_if_null_warn_counts(spark):
    df = rows(
        spark,
        [("r1", None, "bash", "hi"), ("r2", "user", None, None), ("r3", None, None, "x")],
    )
    obs = Observation()
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping("role", "t:role", if_null=Policy.WARN),
            PropertyMapping(
                None,
                "t:meta",
                children=(
                    PropertyMapping("tool", "t:tool", if_null=Policy.WARN),
                ),
            ),
            PropertyMapping("note", "t:note"),  # IGNORE: not counted
        ],
        namespaces=NS,
        observe_warnings=obs,
    )
    res = out.collect()
    # role null twice + tool null twice = 4 warned statements
    assert obs.get["n_warn"] == 4
    # WARN still drops the statement from canon, like IGNORE
    by_id = {r["id"]: r["doc_canon"] for r in res}
    assert by_id["r1"] == f"<ex:r1> {P}meta=[{P}tool=bash]; {P}note=hi"
    assert by_id["r3"] == f"<ex:r3> {P}meta=[]; {P}note=x"


def test_typed_mapping_renders_full_terms(spark):
    """datatype/lang on a mapping (DbToJenaMapping rdfType/language,
    JenaModelStepMeta.java:110-135) renders the full literal term into
    BOTH doc_canon and the struct field."""
    df = spark.createDataFrame(
        [("r1", "user", 7, 'say "hi"')], "id string, role string, n int, note string"
    )
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping("role", "t:role", lang="en"),
            PropertyMapping("n", "t:n", datatype="integer"),
            PropertyMapping("note", "t:note", datatype="string"),
        ],
        namespaces=NS,
    )
    row = out.first()
    xsd = "http://www.w3.org/2001/XMLSchema#"
    # ECHAR escaping applied to the lexical form (serialization-ready terms)
    assert row["doc_canon"] == (
        f'<ex:r1> {P}n="7"^^<{xsd}integer>; '
        f'{P}note="say \\"hi\\""^^<{xsd}string>; '
        f'{P}role="user"@en'
    )
    assert row["doc"]["t_n"] == f'"7"^^<{xsd}integer>'
    assert row["doc"]["t_role"] == '"user"@en'


def test_typed_mapping_gate_failure_routes_if_null(spark):
    """A value failing the datatype's lexical gate becomes null and follows
    ActionIfNull: IGNORE drops the statement; ERROR raises."""
    df = spark.createDataFrame([("r1", "not-a-number")], "id string, v string")
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[PropertyMapping("v", "t:v", datatype="integer")],
        namespaces=NS,
    )
    assert out.first()["doc_canon"] == "<ex:r1> "
    err = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping(
                "v", "t:v", datatype="integer", if_null=Policy.ERROR
            )
        ],
        namespaces=NS,
    )
    with pytest.raises(Exception, match="row field: v is null"):
        err.collect()


def test_typed_mapping_config_errors():
    with pytest.raises(ValueError, match="datatype and lang are exclusive"):
        PropertyMapping("v", "t:v", datatype="integer", lang="en")
    with pytest.raises(ValueError, match="cannot carry datatype/lang"):
        PropertyMapping(
            None,
            "t:meta",
            children=(PropertyMapping("v", "t:v"),),
            datatype="integer",
        )


def test_typed_construct_to_serialize_chain(spark):
    """construct(typed) → serializer via prerendered StatementSpec: the
    datatype survives the chain into the N-Triples line untouched."""
    from kettle_jena_plugins_spark.operators.serialize import (
        StatementSpec,
        ntriples_lines,
    )

    df = spark.createDataFrame([("r1", 7)], "id string, n int")
    docs = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[PropertyMapping("n", "t:n", datatype="integer")],
        namespaces=NS,
    ).select(F.col("doc.subject").alias("subject"), F.col("doc.t_n").alias("t_n"))
    lines = ntriples_lines(
        docs,
        statements={f"{P}n": StatementSpec("t_n", prerendered=True)},
    )
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert lines.first()["value"] == (
        f'<ex:r1> <{P}n> "7"^^<{xsd}integer> .'
    )


def test_remove_mapped_drops_nested_consumed(spark):
    df = rows(spark, [("r1", "user", "bash", "hi")])
    out = construct_doc(
        df,
        uri_prefix="ex:",
        uri_fields=["id"],
        mappings=[
            PropertyMapping("note", "t:note"),
            PropertyMapping(
                None,
                "t:meta",
                children=(PropertyMapping("tool", "t:tool"),),
            ),
        ],
        namespaces=NS,
        remove_mapped=True,
    )
    assert "note" not in out.columns and "tool" not in out.columns
    assert "role" in out.columns
