"""Per-batch schema evolution planning (the ALTER-before-MERGE driver).

Reference analogue: ActionIfNoSuchField IGNORE/WARN/ERROR
(ActionIfNoSuchField.java:25-28) — the reference tolerates *missing* fields at
runtime; the CDC engine inverts this into explicit schema-diffing: a batch
whose events carry new columns (e.g. `tool_meta`) or widened types
(turn_idx int32→int64) triggers DDL on the target BEFORE the merge plan is
analyzed (SURVEY.md §7 hard-part (c)). Incompatible changes (type narrowing,
type flips) are rejected → the batch dead-letters under policy ERROR.
"""

from __future__ import annotations

from pyspark.sql import types as T

# widenings we accept, mirroring Iceberg's allowed type promotions
_WIDENINGS: set[tuple[str, str]] = {
    ("integer", "long"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("float", "double"),
    ("date", "timestamp"),
    ("timestamp_ntz", "timestamp"),
}

# change-event envelope columns that never land in the target schema
ENVELOPE_COLS = ("op", "lsn")


class IncompatibleSchemaChange(ValueError):
    pass


def _wider(a: T.DataType, b: T.DataType) -> T.DataType:
    """Wider of two types, or raise."""
    if a == b:
        return a
    if (a.typeName(), b.typeName()) in _WIDENINGS:
        return b
    if (b.typeName(), a.typeName()) in _WIDENINGS:
        return a
    raise IncompatibleSchemaChange(
        f"incompatible type change {a.simpleString()} -> {b.simpleString()}"
    )


def evolved_schema(
    target_schema: T.StructType, batch_schema: T.StructType
) -> T.StructType | None:
    """Target schema after absorbing a batch's payload schema.

    Returns the new StructType if DDL is needed, None if no change.
    New payload columns append as nullable; width conflicts resolve to the
    wider type; narrowing/flips raise IncompatibleSchemaChange.
    """
    tgt = {f.name: f for f in target_schema.fields}
    out = list(target_schema.fields)
    changed = False
    for f in batch_schema.fields:
        if f.name in ENVELOPE_COLS:
            continue
        if f.name not in tgt:
            out.append(T.StructField(f.name, f.dataType, True))
            changed = True
            continue
        cur = tgt[f.name]
        wide = _wider(cur.dataType, f.dataType)
        if wide != cur.dataType:
            out[[x.name for x in out].index(f.name)] = T.StructField(
                f.name, wide, cur.nullable
            )
            changed = True
    return T.StructType(out) if changed else None
