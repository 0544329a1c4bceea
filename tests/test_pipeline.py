"""Declarative pipeline lifecycle — the reference's entry points A (run a
.ktr: EndToEndIT.java:60-92) and C (repository round-trip:
JenaModelStepMeta.java:586-602) re-expressed as JSON spec → validate →
persist round-trip → compose → execute."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kettle_jena_plugins_spark.plans.pipeline import (
    PipelineConfigError,
    from_json,
    parse,
    run_pipeline,
    to_json,
)

SPEC = {
    "steps": [
        {"type": "filter", "condition": "op <> 'D'"},
        {
            "type": "construct",
            "uri_prefix": "${ns}/conv/",
            "uri_fields": ["conv_id", "turn_idx"],
            "mappings": [
                {"field": "role", "property": "t:role"},
                {"field": "text", "property": "t:text"},
                {"field": "op", "property": "t:op", "skip": True},
            ],
            "namespaces": {"t": "http://example.org/transcript#"},
        },
        {
            "type": "group_merge",
            "group_keys": ["conv_id"],
            "merge_cols": ["doc_canon"],
            "other_actions": {"role": "USE_FIRST", "tool": "NULL_IF_DIFFERENT"},
        },
    ]
}


def events(spark):
    from kettle_jena_plugins_spark.sources.changes import change_events

    return change_events(spark, "/root/testdata/sf0.001")


def test_parse_validate_roundtrip():
    steps = parse(SPEC, variables={"ns": "http://example.org"})
    assert [s.type for s in steps] == ["filter", "construct", "group_merge"]
    # ${ns} resolved at parse time (environmentSubstitute analogue)
    assert steps[1].conf["uri_prefix"] == "http://example.org/conv/"
    # persist → reload reproduces the plan (readRep/saveRep analogue)
    again = from_json(to_json(steps))
    assert [s.type for s in again] == [s.type for s in steps]
    assert again[1].conf == steps[1].conf


@pytest.mark.parametrize(
    "bad",
    [
        {"steps": []},
        {"steps": [{"type": "nope"}]},
        {"steps": [{"type": "construct"}]},  # no mappings
        {"steps": [{"type": "combine", "sources": ["a"]}]},  # no target
        {"steps": [{"type": "group_merge"}]},  # no keys
        {"steps": [{"type": "serialize", "fmt": "xml"}]},  # bad fmt
    ],
)
def test_config_errors_surface_before_execution(bad):
    with pytest.raises(PipelineConfigError):
        parse(bad)


def test_run_pipeline_end_to_end(spark, tmp_path):
    """Golden: composed pipeline result equals hand-composed operators
    (the EndToEndIT isomorphism check, with canonical-doc equality
    replacing graph isomorphism)."""
    steps = parse(SPEC, variables={"ns": "http://example.org"})
    got = run_pipeline(events(spark), steps)
    assert got.count() > 0
    cols = set(got.columns)
    assert "conv_id" in cols and "doc_canon_merged" in cols
    assert "role" in cols and "tool" in cols

    row = got.filter(F.col("conv_id") == "c0").collect()[0]
    # group_merge set-union: merged docs are distinct + sorted (model-union
    # dedup semantics, JenaGroupMergeStep.java:323)
    docs = row["doc_canon_merged"]
    assert docs == sorted(set(docs))

    # serialize step writes once at the end (JenaSerializerStep flush)
    ser_steps = parse(
        {
            "steps": [
                {"type": "filter", "condition": "op <> 'D'"},
                {
                    "type": "construct",
                    "uri_prefix": "ex:conv/",
                    "uri_fields": ["conv_id", "turn_idx"],
                    "mappings": [{"field": "text", "property": "t:text"}],
                    "namespaces": {"t": "http://example.org/transcript#"},
                },
                {"type": "serialize", "fmt": "canon", "subject_col": "doc_canon"},
            ]
        }
    )
    out_dir = str(tmp_path / "out")
    run_pipeline(events(spark), ser_steps, sink_path=out_dir)
    written = spark.read.text(out_dir)
    assert written.count() == events(spark).filter("op <> 'D'").count()


def test_pipeline_json_string_input(spark):
    steps = parse(json.dumps(SPEC), variables={"ns": "http://x"})
    assert steps[1].conf["uri_prefix"] == "http://x/conv/"
