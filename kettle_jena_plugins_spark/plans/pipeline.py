"""Declarative pipeline spec — the engine's analogue of the reference's
`.ktr` lifecycle (SURVEY.md §3):

- **Parse** (entry point A): a JSON spec → step config objects
  (`TransMeta`/`Meta.loadXML`, JenaModelStepMeta.java:407-493).
- **Validate**: config errors surface before execution (`check()` +
  getFields config validation, JenaModelStepMeta.java:608-610,
  JenaGroupMergeStepMeta.java:306-308).
- **Persist round-trip** (entry point C): `to_json`/`from_json` reproduce
  the spec exactly (`readRep`/`saveRep`, JenaModelStepMeta.java:586-602).
- **Execute**: steps compose left-to-right over a DataFrame; Catalyst
  analyzes/optimizes the whole composed plan (replacing Kettle's
  thread-per-step pump, one plan instead of row buffers).

Step vocabulary = the reference's five operators re-expressed Spark-first:
construct, combine, group_merge, validate_split, serialize (plus `select` /
`filter` utility steps the reference gets from neighbouring Kettle steps).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from ..functions.substitution import substitute_variables


class PipelineConfigError(ValueError):
    """Invalid step configuration — raised at parse/validate time, before
    any execution (the reference throws from getFields/check)."""


@dataclass
class Step:
    type: str
    conf: dict[str, Any] = field(default_factory=dict)


KNOWN_STEPS = (
    "construct",
    "combine",
    "group_merge",
    "validate_split",
    "serialize",
    "select",
    "filter",
)


def parse(spec: dict | str, variables: dict[str, str] | None = None) -> list[Step]:
    """JSON/dict spec → validated step list. String values in step configs
    get `${var}` substitution (environmentSubstitute analogue)."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    steps_raw = spec.get("steps")
    if not isinstance(steps_raw, list) or not steps_raw:
        raise PipelineConfigError("spec.steps must be a non-empty list")
    steps: list[Step] = []
    for i, s in enumerate(steps_raw):
        t = s.get("type")
        if t not in KNOWN_STEPS:
            raise PipelineConfigError(f"step {i}: unknown type {t!r}")
        conf = {
            k: substitute_variables(v, variables or {}) if isinstance(v, str) else v
            for k, v in s.items()
            if k != "type"
        }
        steps.append(Step(t, conf))
        _validate_step(i, Step(t, conf))
    return steps


def _validate_mapping(i: int, m: dict) -> None:
    if not isinstance(m, dict) or "property" not in m:
        raise PipelineConfigError(f"step {i}: mapping needs a property")
    if m.get("datatype") and m.get("lang"):
        raise PipelineConfigError(
            f"step {i}: mapping {m['property']!r} cannot set both "
            "datatype and lang"
        )
    if m.get("datatype"):
        from ..functions.typed_literals import CONVERTERS

        if m["datatype"] not in CONVERTERS:
            raise PipelineConfigError(
                f"step {i}: mapping {m['property']!r} has unknown "
                f"datatype {m['datatype']!r}"
            )
    if m.get("children"):
        # a blank-node substructure carries children INSTEAD of a field
        # (BLANK_NODE_FIELD_NAME indirection, JenaModelStepMeta.java:241-261)
        if m.get("field"):
            raise PipelineConfigError(
                f"step {i}: mapping {m['property']!r} cannot have both "
                "field and children"
            )
        if m.get("datatype") or m.get("lang"):
            raise PipelineConfigError(
                f"step {i}: substructure {m['property']!r} cannot carry "
                "datatype/lang"
            )
        for child in m["children"]:
            _validate_mapping(i, child)
    elif not m.get("field"):
        raise PipelineConfigError(
            f"step {i}: mapping {m['property']!r} requires a field"
        )


def _validate_step(i: int, s: Step) -> None:
    from ..operators.serialize import FORMATS

    c = s.conf
    if s.type == "construct":
        if not c.get("mappings"):
            raise PipelineConfigError(f"step {i}: construct requires mappings")
        for m in c["mappings"]:
            _validate_mapping(i, m)
    if s.type == "combine":
        # MutateFirstModel=NO without a target is a config error in the
        # reference (JenaCombineStep.java:77-80); here: target required
        if not c.get("target"):
            raise PipelineConfigError(f"step {i}: combine requires target")
        if not c.get("sources"):
            raise PipelineConfigError(f"step {i}: combine requires sources")
    if s.type == "group_merge" and not c.get("group_keys"):
        raise PipelineConfigError(f"step {i}: group_merge requires group_keys")
    if s.type == "serialize" and c.get("fmt", "ntriples") not in FORMATS:
        raise PipelineConfigError(f"step {i}: bad serialize fmt {c.get('fmt')!r}")
    if s.type == "serialize" and c.get("decorate"):
        import dataclasses

        from ..operators.serialize import FilenameDecoration

        allowed = {f.name for f in dataclasses.fields(FilenameDecoration)}
        unknown = sorted(set(c["decorate"]) - allowed)
        if unknown:
            raise PipelineConfigError(
                f"step {i}: unknown decorate key(s) {unknown} "
                f"(allowed: {sorted(allowed)})"
            )
    if s.type == "select" and not c.get("columns"):
        raise PipelineConfigError(f"step {i}: select requires columns")
    if s.type == "filter" and not c.get("condition"):
        raise PipelineConfigError(f"step {i}: filter requires condition")


def to_json(steps: list[Step]) -> str:
    """Persist the logical plan (saveRep analogue)."""
    return json.dumps(
        {"steps": [{"type": s.type, **s.conf} for s in steps]}, indent=1
    )


def from_json(txt: str) -> list[Step]:
    """Reload a persisted plan (readRep analogue)."""
    return parse(txt)


def run_pipeline_stream(
    spark,
    events_dir: str,
    steps: list[Step],
    checkpoint_dir: str,
    sink_path: str | None = None,
    schema=None,
    max_files_per_trigger: int | None = None,
):
    """Streaming execution of a declarative pipeline: tail a directory of
    event parquet files and run the SAME step list per micro-batch via
    foreachBatch (the reference pumps rows through its step graph; here
    each micro-batch flows through the composed Catalyst plan). A trailing
    serialize step writes per-batch outputs under
    `{sink_path}/batch={id}`; availableNow drains and stops, and rerunning
    with the same checkpoint resumes after the last committed offset."""
    from ..model import CHANGE_EVENT_SCHEMA

    reader = spark.readStream.schema(schema or CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)

    def _sink(df: DataFrame, batch_id: int) -> None:
        run_pipeline(
            df,
            steps,
            sink_path=(
                f"{sink_path}/batch={batch_id}" if sink_path else None
            ),
        )

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_pipeline(
    df: DataFrame, steps: list[Step], sink_path: str | None = None
) -> DataFrame:
    """Compose the steps over `df`. A trailing serialize step writes to
    `sink_path` (required then) and returns the written DataFrame."""
    from ..operators.combine import CombineField, combine_columns
    from ..operators.construct import PropertyMapping, construct_doc
    from ..operators.groupmerge import OtherFieldAction, group_merge
    from ..operators.serialize import (
        FilenameDecoration,
        StatementSpec,
        serialize_docs,
    )
    from ..operators.validate import (
        PathShape,
        Policy,
        ValidationSpec,
        validate_split,
    )

    def mapping(m: dict) -> PropertyMapping:
        return PropertyMapping(
            field=m.get("field"),
            property=m["property"],
            skip=m.get("skip", False),
            if_null=Policy[m.get("if_null", "IGNORE")],
            children=tuple(mapping(ch) for ch in m.get("children", ())),
            datatype=m.get("datatype"),
            lang=m.get("lang"),
        )

    def combine_field(src) -> CombineField | str:
        if isinstance(src, str):
            return src
        return CombineField(
            src["name"],
            if_missing=Policy[src.get("if_missing", "ERROR")],
            if_null=Policy[src.get("if_null", "IGNORE")],
        )

    def statement(v) -> StatementSpec | str:
        if isinstance(v, str):
            return v
        return StatementSpec(
            v["column"],
            datatype=v.get("datatype"),
            lang=v.get("lang"),
            prerendered=v.get("prerendered", False),
        )

    out = df
    for i, s in enumerate(steps):
        c = s.conf
        if s.type == "select":
            out = out.select(*c["columns"])
        elif s.type == "filter":
            out = out.filter(c["condition"])
        elif s.type == "construct":
            out = construct_doc(
                out,
                uri_prefix=c.get("uri_prefix", "ex:"),
                uri_fields=c.get("uri_fields", []),
                mappings=[mapping(m) for m in c["mappings"]],
                namespaces=c.get("namespaces", {}),
                remove_mapped=c.get("remove_mapped", False),
            )
        elif s.type == "combine":
            out = combine_columns(
                out,
                [combine_field(src) for src in c["sources"]],
                c["target"],
                remove_sources=c.get("remove_sources", True),
            )
        elif s.type == "group_merge":
            out = group_merge(
                out,
                group_keys=c["group_keys"],
                merge_cols=c.get("merge_cols", []),
                other_actions={
                    k: OtherFieldAction[v]
                    for k, v in c.get("other_actions", {}).items()
                },
            )
        elif s.type == "validate_split":
            ok, dead = validate_split(
                out,
                ValidationSpec(
                    require_keys=tuple(c.get("require_keys", ())),
                    require_ts=c.get("require_ts", False),
                    constraints=tuple(
                        (r, p) for r, p in c.get("constraints", ())
                    ),
                    shapes=tuple(
                        PathShape(
                            s["path"],
                            min_count=s.get("min_count", 1),
                            max_count=s.get("max_count"),
                        )
                        for s in c.get("shapes", ())
                    ),
                    any_of=tuple(tuple(g) for g in c.get("any_of", ())),
                ),
            )
            out = ok  # dead-letter routing handled by the caller's sink cfg
        elif s.type == "serialize":
            if sink_path is None:
                raise PipelineConfigError(f"step {i}: serialize needs sink_path")
            serialize_docs(
                out,
                sink_path,
                fmt=c.get("fmt", "ntriples"),
                subject_col=c.get("subject_col", "subject"),
                statements={
                    k: statement(v)
                    for k, v in (c.get("statements") or {}).items()
                }
                or None,
                namespaces=c.get("namespaces"),
                single_file=c.get("single_file", False),
                decorate=(
                    FilenameDecoration(**c["decorate"])
                    if c.get("decorate")
                    else None
                ),
            )
    return out
