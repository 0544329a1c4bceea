"""QName / namespace utilities — pure functions + Spark column versions.

Reference: Util.isQName/parseQName (Util.java:178-253) and asUri
(JenaModelStep.java:535-557): identifiers come as `prefix:local`,
`{uri}local`, or a full URI; a namespace dictionary (prefix → URI,
JenaModelStepMeta.java:108, defaults rdf/rdfs/xsd :277-280) expands them.

The pure-python versions are property-tested (the reference's UtilTest
pattern); the column versions compile to built-ins over a broadcast literal
map — dictionary-encoded identifier expansion with no Python in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_NAMESPACES: dict[str, str] = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

_QNAME_RE = re.compile(r"^([A-Za-z_][\w.-]*):([\w.-]+)$")
_BRACED_RE = re.compile(r"^\{([^}]+)\}([\w.-]+)$")


def is_qname(s: str | None) -> bool:
    if not s:
        return False
    return bool(_QNAME_RE.match(s) or _BRACED_RE.match(s))


def parse_qname(s: str) -> tuple[str | None, str | None, str]:
    """→ (prefix, uri, local). `prefix:local` → (prefix, None, local);
    `{uri}local` → (None, uri, local); else treat as full URI/local."""
    m = _QNAME_RE.match(s)
    if m:
        return m.group(1), None, m.group(2)
    m = _BRACED_RE.match(s)
    if m:
        return None, m.group(1), m.group(2)
    return None, None, s


def expand_qname(s: str | None, namespaces: dict[str, str] | None = None) -> str | None:
    """prefix:local → <uri>local using the namespace dict; `{uri}local` →
    uri+local; unknown prefix / non-qname returned unchanged."""
    if s is None:
        return None
    ns = {**DEFAULT_NAMESPACES, **(namespaces or {})}
    prefix, uri, local = parse_qname(s)
    if prefix is not None and prefix in ns:
        return ns[prefix] + local
    if uri is not None:
        return uri + local
    return s


def expand_qname_col(
    col: Column, namespaces: dict[str, str] | None = None
) -> Column:
    """Column version: split on the first ':', look the prefix up in a literal
    map (broadcast to executors as part of the plan), concat — all built-ins."""
    ns = {**DEFAULT_NAMESPACES, **(namespaces or {})}
    kv = [x for k, v in ns.items() for x in (F.lit(k), F.lit(v))]
    ns_map = F.create_map(*kv)
    prefix = F.regexp_extract(col, r"^([A-Za-z_][\w.-]*):([\w.-]+)$", 1)
    local = F.regexp_extract(col, r"^([A-Za-z_][\w.-]*):([\w.-]+)$", 2)
    braced_uri = F.regexp_extract(col, r"^\{([^}]+)\}([\w.-]+)$", 1)
    braced_local = F.regexp_extract(col, r"^\{([^}]+)\}([\w.-]+)$", 2)
    expanded = ns_map[prefix]
    return (
        F.when((prefix != "") & expanded.isNotNull(), F.concat(expanded, local))
        .when(braced_uri != "", F.concat(braced_uri, braced_local))
        .otherwise(col)
    )
