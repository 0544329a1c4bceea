"""Value-source dispatch: literal vs ${variable} vs #{field}.

Reference: RdfPropertyNameSource (JenaModelStepMeta.java:165-182) dispatches a
configured string to LITERAL / VARIABLE (`${...}`, resolved from the Kettle
environment, JenaModelStep.java:134,211,431) / FIELD (`#{...}`, resolved from
the row at runtime). The engine maps VARIABLE → job conf (driver-side
substitution at plan time) and FIELD → F.col (Catalyst expression).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_FIELD_RE = re.compile(r"^#\{([^}]+)\}$")
_VAR_RE = re.compile(r"^\$\{([^}]+)\}$")


class UnresolvedVariable(KeyError):
    pass


def source_kind(spec: str) -> str:
    """→ 'field' | 'variable' | 'literal' (the reference's three sources)."""
    if _FIELD_RE.match(spec):
        return "field"
    if _VAR_RE.match(spec):
        return "variable"
    return "literal"


def substitute_variables(spec: str, variables: dict[str, str]) -> str:
    """Driver-side ${var} substitution (also inside larger strings, like the
    reference's environmentSubstitute). Unknown variable → error."""

    def repl(m: re.Match) -> str:
        name = m.group(1)
        if name not in variables:
            raise UnresolvedVariable(name)
        return variables[name]

    return re.sub(r"\$\{([^}]+)\}", repl, spec)


def resolve_value(spec: str, variables: dict[str, str] | None = None) -> Column:
    """Config string → Column: `#{field}` binds the row column, `${var}`
    substitutes then becomes a literal, anything else is a literal."""
    kind = source_kind(spec)
    if kind == "field":
        return F.col(_FIELD_RE.match(spec).group(1))
    resolved = substitute_variables(spec, variables or {})
    return F.lit(resolved)
