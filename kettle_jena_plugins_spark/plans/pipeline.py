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


def _validate_step(i: int, s: Step) -> None:
    c = s.conf
    if s.type == "construct" and not c.get("mappings"):
        raise PipelineConfigError(f"step {i}: construct requires mappings")
    if s.type == "combine":
        # MutateFirstModel=NO without a target is a config error in the
        # reference (JenaCombineStep.java:77-80); here: target required
        if not c.get("target"):
            raise PipelineConfigError(f"step {i}: combine requires target")
        if not c.get("sources"):
            raise PipelineConfigError(f"step {i}: combine requires sources")
    if s.type == "group_merge" and not c.get("group_keys"):
        raise PipelineConfigError(f"step {i}: group_merge requires group_keys")
    if s.type == "serialize" and c.get("fmt", "ntriples") not in (
        "ntriples", "canon", "jsonl", "parquet",
    ):
        raise PipelineConfigError(f"step {i}: bad serialize fmt {c.get('fmt')!r}")
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


def run_pipeline(
    df: DataFrame, steps: list[Step], sink_path: str | None = None
) -> DataFrame:
    """Compose the steps over `df`. A trailing serialize step writes to
    `sink_path` (required then) and returns the written DataFrame."""
    from ..operators.combine import combine_columns
    from ..operators.construct import PropertyMapping, construct_doc
    from ..operators.groupmerge import OtherFieldAction, group_merge
    from ..operators.serialize import serialize_docs
    from ..operators.validate import ValidationSpec, validate_split

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
                mappings=[PropertyMapping(**m) for m in c["mappings"]],
                namespaces=c.get("namespaces", {}),
                remove_mapped=c.get("remove_mapped", False),
            )
        elif s.type == "combine":
            out = combine_columns(
                out,
                c["sources"],
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
                statements=c.get("statements"),
                single_file=c.get("single_file", False),
            )
    return out
