"""SHACL shapes-graph loader — compile a Turtle shapes file into the
engine's structural-validation spec.

The reference loads an arbitrary SHACL shapes graph at runtime and
validates whole models against it (JenaShaclStep.java:59-71; shape file
with nested property shapes: JenaShaclStepIT.java:58-81, ODRL-shape.ttl).
This module is the engine's analogue: a pragmatic parser for the SHACL
subset those shapes exercise —

  - ``sh:NodeShape`` declarations; only shapes carrying ``sh:targetClass``
    emit constraints (helper shapes are reachable via ``sh:node`` only)
  - ``sh:property [ sh:path <p> ; sh:minCount n ; sh:maxCount n ]``
  - sequence paths ``sh:path ( p q r )`` → nested dotted paths
  - ``sh:path [ sh:alternativePath ( p q ) ]`` with minCount ≥ 1 →
    ``any_of`` group (sh:or-style alternative)
  - ``sh:node <OtherShape>`` → the referenced shape's required paths are
    inlined UNDER the property's path as null-safe SQL constraints
    (fires only when the parent value exists — SHACL conformance is
    vacuous for absent nodes)
  - ``sh:datatype <xsd:T>`` → a lexical-space check on the value's string
    form (reason ``datatype:<path>``); the supported XSD lexical spaces
    are the ones typed_literals converts
  - ``sh:pattern "re"`` (+ ``sh:flags "i"``) → an anchored-as-written
    regex check (reason ``pattern:<path>``)
  - ``sh:minLength`` / ``sh:maxLength`` → string-length band
  - ``sh:minInclusive`` / ``sh:maxInclusive`` / ``sh:minExclusive`` /
    ``sh:maxExclusive`` → numeric range (double comparison)
  - ``sh:in ( v... )`` → enumeration membership; ``sh:hasValue v`` →
    required value (fires on absence, per SHACL)
  - ``sh:nodeKind`` (all six values) → term-kind check over the engine's
    rendering: nested struct = blank node, quoted full literal term or
    non-IRI-shaped scalar = literal, scheme-shaped scalar = IRI
  - ``sh:class <C>`` → the value node's ``rdf:type`` child must be the
    expanded class URI or any ``rdfs:subClassOf*`` descendant declared in
    the same file (Jena deployments ship the ontology with the shapes
    graph; the closure compiles driver-side into one IN-list predicate);
    a path whose construct carries no rdf:type child fails analysis
    loudly rather than under-validating
  - ``sh:and ( [ … ] … )`` over inline one-column shapes → conjunction
    (each inline shape's constraints compile as if declared on the
    property directly)
  - ``sh:not [ … ]`` over an inline one-column shape → negation: fires
    when the value exists and CONFORMS to the inner shape (inner
    predicates OR-combined, reason ``not:<path>``)
  - ``sh:or ( [ … ] … )`` over inline one-column shapes → the value must
    conform to at least one member (reason ``or:<path>``; alternative
    VALUES — the alternativePath machinery disjoins paths)
  - ``sh:qualifiedValueShape [ … ]`` + ``sh:qualifiedMin/MaxCount`` over
    ARRAY paths → count of conforming elements via
    ``size(filter(arr, x -> conforms))`` — narrow higher-order
    expression, no explode (reasons ``qualified_min/max:<path>``)

compiled onto columns named by the same alias rule the construct operator
uses (``prefix:local`` → ``prefix_local``), so a shapes file written
against a constructed document validates it directly:

    shapes, any_of, constraints = shapes_from_ttl(ttl, root="doc")
    spec = ValidationSpec(shapes=shapes, any_of=any_of,
                          constraints=constraints, ...)

sh:and/or/not/qualifiedValueShape members may be inline blank nodes OR
references to NAMED helper shapes (resolved one level deep to their
value constraints). Remaining out-of-scope vocabulary (nested
composition and structural keys inside those members) is
NOT silently dropped: each occurrence raises a ``ShaclUnsupportedWarning``
(or ValueError with ``strict=True``) — the reference's Jena delegates to a
full SHACL engine (JenaShaclStep.java:94-108), so a shapes file using
vocabulary this subset cannot enforce must be visible to the operator.
"""

from __future__ import annotations

import re
import warnings

from .validate import PathShape

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"


class ShaclUnsupportedWarning(UserWarning):
    """A shapes file used SHACL vocabulary this subset cannot enforce."""


# XSD lexical spaces as anchored regexes (backslash-free: the expressions
# travel through Spark SQL string literals where backslashes are escape
# characters). '' = every string conforms (no check emitted).
_INT_RX = "^[+-]?[0-9]+$"
_DEC_RX = "^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)$"
_XSD_LEXICAL: dict[str, str] = {
    XSD + "string": "",
    XSD + "normalizedString": "",
    XSD + "token": "",
    XSD + "anyURI": "",
    XSD + "integer": _INT_RX,
    XSD + "long": _INT_RX,
    XSD + "int": _INT_RX,
    XSD + "short": _INT_RX,
    XSD + "byte": _INT_RX,
    XSD + "nonNegativeInteger": "^[+]?[0-9]+$",
    XSD + "decimal": _DEC_RX,
    XSD + "double": _DEC_RX + "|^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)[eE][+-]?[0-9]+$|^[+-]?INF$|^NaN$",
    XSD + "float": _DEC_RX + "|^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)[eE][+-]?[0-9]+$|^[+-]?INF$|^NaN$",
    XSD + "boolean": "^(true|false|0|1)$",
    XSD + "dateTime": "^-?[0-9]{4,}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}([.][0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$",
    XSD + "date": "^-?[0-9]{4,}-[0-9]{2}-[0-9]{2}(Z|[+-][0-9]{2}:[0-9]{2})?$",
    XSD + "time": "^[0-9]{2}:[0-9]{2}:[0-9]{2}([.][0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$",
    XSD + "gYear": "^-?[0-9]{4,}(Z|[+-][0-9]{2}:[0-9]{2})?$",
    XSD + "language": "^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$",
}

# property-shape keys the compiler understands; anything else warns/raises
_SUPPORTED_KEYS = frozenset(
    SH + k
    for k in (
        "path",
        "minCount",
        "maxCount",
        "node",
        "datatype",
        "pattern",
        "flags",
        "minLength",
        "maxLength",
        "minInclusive",
        "maxInclusive",
        "minExclusive",
        "maxExclusive",
        "in",
        "hasValue",
        "nodeKind",
        "class",
        "and",
        "not",
        "or",
        "qualifiedValueShape",
        "qualifiedMinCount",
        "qualifiedMaxCount",
    )
)

# keys an INLINE sub-shape (inside sh:and / sh:not) may carry: the
# one-column lexical/term constraint kinds only — structural keys
# (path/minCount/node/nested and/not) have no meaning there and warn
_INLINE_SHAPE_KEYS = frozenset(
    SH + k
    for k in (
        "datatype",
        "pattern",
        "flags",
        "minLength",
        "maxLength",
        "minInclusive",
        "maxInclusive",
        "minExclusive",
        "maxExclusive",
        "in",
        "hasValue",
        "nodeKind",
        "class",
    )
)

# IRI-shaped string: scheme ':' then no whitespace (RFC 3986 scheme,
# backslash-free so it survives the SQL string literal untouched)
_IRI_RX = "^[A-Za-z][A-Za-z0-9+.-]*:[^ ]*$"


def _node_kind_violation(dotted: str, kind: str) -> str | None:
    """sh:nodeKind → one-column violation predicate over this engine's
    term rendering: blank nodes are the construct's nested STRUCT columns
    (checked via typeof); typed/language-tagged literals render as full
    terms starting with '\"'; an unquoted scalar matching the IRI scheme
    shape is an IRI; everything else is a (plain) literal. Returns None
    for vocabulary outside the six sh:nodeKind values."""
    s = f"CAST({dotted} AS STRING)"
    is_blank = f"typeof({dotted}) LIKE 'struct%'"
    is_lit_term = f"{s} LIKE '\"%'"
    is_iri = (
        f"(NOT {is_blank} AND NOT {is_lit_term} AND {s} RLIKE '{_IRI_RX}')"
    )
    is_literal = (
        f"(NOT {is_blank} AND ({is_lit_term} OR NOT {s} RLIKE '{_IRI_RX}'))"
    )
    allowed = {
        SH + "IRI": is_iri,
        SH + "Literal": is_literal,
        SH + "BlankNode": is_blank,
        SH + "BlankNodeOrIRI": f"({is_blank} OR {is_iri})",
        SH + "BlankNodeOrLiteral": f"({is_blank} OR {is_literal})",
        SH + "IRIOrLiteral": f"(NOT {is_blank})",
    }.get(kind)
    if allowed is None:
        return None
    return f"{dotted} IS NOT NULL AND NOT {allowed}"
# pure annotations (no validation semantics) — ignored without warning
_ANNOTATION_KEYS = frozenset(
    SH + k for k in ("message", "name", "description", "severity", "order", "group")
)

_TOKEN = re.compile(
    r"""
    <[^>]*>            # <uri>
  | \"[^\"]*\"         # "string"
  | \[ | \] | \( | \)
  | ;\s | \.\s | \.$ | ;$
  | [^\s;\[\]()]+      # qname / number / 'a'
    """,
    re.VERBOSE,
)


def _strip_comments(ttl: str) -> str:
    out = []
    for line in ttl.splitlines():
        buf, in_uri, in_str = [], False, False
        for ch in line:
            if ch == '"':
                in_str = not in_str
            elif not in_str:
                if ch == "<":
                    in_uri = True
                elif ch == ">":
                    in_uri = False
                elif ch == "#" and not in_uri:
                    break
            buf.append(ch)
        out.append("".join(buf))
    return "\n".join(out)


def _tokenize(ttl: str) -> list[str]:
    txt = _strip_comments(ttl)
    toks = []
    for raw in _TOKEN.findall(txt + "\n"):
        t = raw.strip()
        if not t:
            continue
        # Turtle's statement terminator may abut the object ('t:Shape.'
        # or 'sh:minCount 1.'): a trailing '.' is never part of a qname
        # or integer in this subset, so split it back out as its own token
        if (
            len(t) > 1
            and t.endswith(".")
            and not t.startswith("<")
            and not t.startswith('"')
        ):
            toks.append(t[:-1])
            toks.append(".")
        else:
            toks.append(t)
    return toks


class _Parser:
    """Recursive-descent parser for the Turtle subset shapes files use:
    prefixed names, <uris>, integers, `a`, blank nodes `[...]`,
    collections `(...)`, predicate-object lists with `;`, statements with
    `.`. Produces: {subject: [(pred, obj), ...]} where obj is a str
    (expanded URI), int, list (collection), or dict (blank node)."""

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.subjects: dict[str, list[tuple[str, object]]] = {}

    def _peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expand(self, t: str) -> str:
        if t.startswith("<") and t.endswith(">"):
            return t[1:-1]
        if t == "a":
            return RDF_TYPE
        if ":" in t:
            p, local = t.split(":", 1)
            if p in self.prefixes:
                return self.prefixes[p] + local
        return t

    def parse(self) -> "_Parser":
        while self._peek() is not None:
            t = self._peek()
            if t in (".", ";"):
                self._next()
                continue
            if t == "@prefix":
                self._next()
                name = self._next().rstrip(":")
                uri = self._next()
                self.prefixes[name] = uri[1:-1]
                if self._peek() == ".":
                    self._next()
                continue
            subj = self._expand(self._next())
            self.subjects.setdefault(subj, []).extend(self._po_list("."))
        return self

    def _po_list(self, end: str) -> list[tuple[str, object]]:
        """predicate-object pairs until `end` ('.' or ']') is consumed."""
        pairs: list[tuple[str, object]] = []
        while True:
            t = self._peek()
            if t is None:
                return pairs
            if t == end:
                self._next()
                return pairs
            if t == ";" or (t == "." and end == "]"):
                # ';' separates pairs; a stray '.' inside a blank node
                # (hand-written 'sh:minCount 1.') is tolerated likewise
                self._next()
                continue
            pred = self._expand(self._next())
            pairs.append((pred, self._object()))
        return pairs

    def _object(self):
        t = self._peek()
        if t == "[":
            self._next()
            return dict_of(self._po_list("]"))
        if t == "(":
            self._next()
            items = []
            while self._peek() not in (")", None):
                items.append(self._object())
            if self._peek() == ")":
                self._next()
            return items
        t = self._next()
        if re.fullmatch(r"-?\d+", t):
            return int(t)
        if re.fullmatch(r"-?\d+\.\d+", t):
            return float(t)
        if t.startswith('"'):
            return _unescape_ttl(t[1:-1])
        return self._expand(t)


def _unescape_ttl(s: str) -> str:
    """Turtle string-escape decoding (ECHAR): \\\\ \\" \\n \\t \\r. A
    backslash before any other character is kept verbatim — lenient
    toward the common sloppy form ``sh:pattern "^\\d+$"`` (strict Turtle
    would demand ``"^\\\\d+$"``; both now yield the regex ``^\\d+$``)."""
    _ech = {"\\": "\\", '"': '"', "'": "'", "n": "\n", "t": "\t", "r": "\r"}
    return re.sub(
        r"\\(.)", lambda m: _ech.get(m.group(1), "\\" + m.group(1)), s
    )


def dict_of(pairs: list[tuple[str, object]]) -> dict:
    d: dict = {}
    for k, v in pairs:
        d.setdefault(k, []).append(v)
    return d


def _sql_str(v) -> str:
    """A value as a single-quoted SQL string literal (values compare on
    their string form — int 1 and column value 1 both render '1').
    Backslashes are doubled: Spark's default parser treats backslash as
    an escape character inside string literals, so an unescaped '\\d'
    would silently become 'd'."""
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def _local_segment(uri: str, prefixes: dict[str, str]) -> str:
    """URI → column segment, matching the construct alias rule
    (`prefix:local` → `prefix_local`); unprefixed URIs use the local name."""
    for p, u in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        if uri.startswith(u):
            return f"{p}_{uri[len(u):]}"
    return re.split(r"[#/]", uri)[-1]


def _join(root: str, segs: list[str]) -> str:
    return ".".join(([root] if root else []) + segs)


def shapes_from_ttl(
    ttl: str,
    root: str = "",
    path_map: dict[str, str] | None = None,
    strict: bool = False,
) -> tuple[
    tuple[PathShape, ...],
    tuple[tuple[str, ...], ...],
    tuple[tuple[str, str], ...],
]:
    """Compile a shapes file → (shapes, any_of, constraints) for
    ValidationSpec. `root` prefixes every path (e.g. "doc" for shapes
    over a constructed document column); `path_map` overrides the
    URI→segment rule per property URI. Unsupported SHACL vocabulary
    raises ShaclUnsupportedWarning, or ValueError when ``strict``."""
    p = _Parser(_tokenize(ttl)).parse()
    path_map = path_map or {}

    def unsupported(what: str, where: str) -> None:
        msg = (
            f"SHACL subset cannot enforce {what} (at {where}); the shape "
            "is NOT validated — the reference's full Jena engine would be"
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, ShaclUnsupportedWarning, stacklevel=3)

    def seg(uri: str) -> str:
        return path_map.get(uri, _local_segment(uri, p.prefixes))

    by_subject = {s: dict_of(po) for s, po in p.subjects.items()}
    node_shapes = {
        s: d
        for s, d in by_subject.items()
        if SH + "NodeShape" in d.get(RDF_TYPE, [])
    }

    # rdfs:subClassOf triples carried alongside the shapes (Jena
    # deployments ship the ontology with the shapes graph) widen
    # sh:class to SHACL's real semantics: a value node conforms when its
    # rdf:type is the class OR any rdfs:subClassOf* descendant. The
    # hierarchy is tiny and driver-side; the closure compiles into the
    # constraint's IN-list, so the executor-side check stays one
    # whole-stage-codegen predicate.
    _parents: dict[str, list[str]] = {}
    for _s, _d in by_subject.items():
        for _sup in _d.get(RDFS + "subClassOf", []):
            if isinstance(_sup, str):
                _parents.setdefault(_s, []).append(_sup)

    def class_closure(cls: str) -> list[str]:
        """{cls} ∪ its rdfs:subClassOf* descendants (cycle-safe)."""
        out, frontier = {cls}, [cls]
        while frontier:
            cur = frontier.pop()
            for sub, sups in _parents.items():
                if cur in sups and sub not in out:
                    out.add(sub)
                    frontier.append(sub)
        return sorted(out)

    shapes: list[PathShape] = []
    any_of: list[tuple[str, ...]] = []
    constraints: list[tuple[str, str]] = []

    def required_children(ref: str) -> list[str]:
        """Dotted child paths a referenced helper shape requires."""
        out = []
        for prop in node_shapes.get(ref, {}).get(SH + "property", []):
            path = prop.get(SH + "path", [None])[0]
            if prop.get(SH + "minCount", [0])[0] >= 1 and isinstance(
                path, str
            ):
                out.append(seg(path))
        return out

    def lexical_checks(
        prop: dict, dotted: str, sink: list | None = None
    ) -> None:
        """sh:datatype / sh:pattern → (reason, SQL predicate) constraints
        over the value's string form; fire only when the value exists
        (SHACL conformance is vacuous for absent values). ``sink``
        redirects the compiled (reason, predicate) pairs (used by sh:not,
        which must combine rather than emit them)."""
        sink = constraints if sink is None else sink
        datatype = prop.get(SH + "datatype", [None])[0]
        pattern = prop.get(SH + "pattern", [None])[0]
        flags = prop.get(SH + "flags", [None])[0]
        if isinstance(datatype, str):
            rx = _XSD_LEXICAL.get(datatype)
            if rx is None:
                unsupported(f"sh:datatype <{datatype}>", dotted)
            elif rx:
                sink.append(
                    (
                        f"datatype:{dotted}",
                        f"{dotted} IS NOT NULL AND NOT "
                        f"(CAST({dotted} AS STRING) RLIKE '{rx}')",
                    )
                )
        if isinstance(pattern, str):
            if flags and flags not in ("i",):
                unsupported(f"sh:flags {flags!r}", dotted)
            rx = ("(?i)" if flags == "i" else "") + pattern
            # double backslashes BEFORE quoting: the predicate travels
            # through a Spark SQL string literal where backslash escapes,
            # so a TTL pattern like ^\\d+$ would otherwise silently become
            # ^d+$ and the constraint would stop firing
            rx = rx.replace("\\", "\\\\").replace("'", "''")
            sink.append(
                (
                    f"pattern:{dotted}",
                    f"{dotted} IS NOT NULL AND NOT "
                    f"(CAST({dotted} AS STRING) RLIKE '{rx}')",
                )
            )
        # string-length band (sh:minLength / sh:maxLength)
        min_len = prop.get(SH + "minLength", [None])[0]
        max_len = prop.get(SH + "maxLength", [None])[0]
        if isinstance(min_len, int):
            sink.append(
                (
                    f"min_length:{dotted}",
                    f"{dotted} IS NOT NULL AND "
                    f"length(CAST({dotted} AS STRING)) < {min_len}",
                )
            )
        if isinstance(max_len, int):
            sink.append(
                (
                    f"max_length:{dotted}",
                    f"{dotted} IS NOT NULL AND "
                    f"length(CAST({dotted} AS STRING)) > {max_len}",
                )
            )
        # numeric range (sh:min/maxInclusive, sh:min/maxExclusive) — the
        # value is compared in double; a non-castable value is vacuous
        # here (pair with sh:datatype to also enforce the lexical space)
        for key, op_, name in (
            ("minInclusive", "<", "min_inclusive"),
            ("maxInclusive", ">", "max_inclusive"),
            ("minExclusive", "<=", "min_exclusive"),
            ("maxExclusive", ">=", "max_exclusive"),
        ):
            v = prop.get(SH + key, [None])[0]
            if isinstance(v, (int, float)):
                sink.append(
                    (
                        f"{name}:{dotted}",
                        f"{dotted} IS NOT NULL AND "
                        f"CAST({dotted} AS DOUBLE) {op_} {v}",
                    )
                )
        # enumeration (sh:in) and required value (sh:hasValue) — compared
        # on the string form of the value, matching SHACL's literal-equal
        # semantics for the plain-literal columns this engine carries.
        # hasValue deliberately fires on NULL: the value must be PRESENT.
        in_list = prop.get(SH + "in", [None])[0]
        if isinstance(in_list, list) and in_list:
            vals = ", ".join(_sql_str(x) for x in in_list)
            sink.append(
                (
                    f"in:{dotted}",
                    f"{dotted} IS NOT NULL AND "
                    f"CAST({dotted} AS STRING) NOT IN ({vals})",
                )
            )
        has_value = prop.get(SH + "hasValue", [None])[0]
        if has_value is not None:
            sink.append(
                (
                    f"has_value:{dotted}",
                    f"{dotted} IS NULL OR "
                    f"CAST({dotted} AS STRING) <> {_sql_str(has_value)}",
                )
            )
        # sh:nodeKind — IRI / Literal / BlankNode (+ the three unions)
        # over the engine's term rendering (see _node_kind_violation)
        node_kind = prop.get(SH + "nodeKind", [None])[0]
        if isinstance(node_kind, str):
            pred = _node_kind_violation(dotted, node_kind)
            if pred is None:
                unsupported(
                    f"sh:nodeKind <{node_kind}>", dotted
                )
            else:
                sink.append((f"node_kind:{dotted}", pred))
        # sh:class — the value node must carry rdf:type = the class OR
        # any rdfs:subClassOf* descendant declared in the shapes file
        # (class_closure above; SHACL's real subsumption semantics —
        # JenaShaclStep delegates to Jena's full validator which walks
        # the data graph; our relational carrying keeps the type ON the
        # node's struct and the ontology in the shapes graph). A class
        # constraint over a path without an rdf:type child fails
        # ANALYSIS loudly — never silently under-validates.
        sh_class = prop.get(SH + "class", [None])[0]
        if isinstance(sh_class, str):
            type_seg = seg(RDF_TYPE)
            allowed = class_closure(sh_class)
            if len(allowed) == 1:
                mismatch = (
                    f"CAST({dotted}.{type_seg} AS STRING) <> "
                    f"{_sql_str(sh_class)}"
                )
            else:
                vals = ", ".join(_sql_str(x) for x in allowed)
                mismatch = (
                    f"CAST({dotted}.{type_seg} AS STRING) NOT IN ({vals})"
                )
            sink.append(
                (
                    f"class:{dotted}",
                    f"{dotted} IS NOT NULL AND "
                    f"({dotted}.{type_seg} IS NULL OR {mismatch})",
                )
            )

    def emit(prop: dict) -> None:
        path = prop.get(SH + "path", [None])[0]
        min_c = prop.get(SH + "minCount", [None])[0]
        max_c = prop.get(SH + "maxCount", [None])[0]
        node_ref = prop.get(SH + "node", [None])[0]
        for key in prop:
            if (
                key.startswith(SH)
                and key not in _SUPPORTED_KEYS
                and key not in _ANNOTATION_KEYS
            ):
                unsupported(key.replace(SH, "sh:"), str(path))
        if isinstance(path, dict) and SH + "alternativePath" in path:
            for k in ("datatype", "pattern", "nodeKind", "class"):
                if SH + k in prop:
                    unsupported(
                        f"sh:{k} over sh:alternativePath", str(path)
                    )
            alts = [seg(u) for u in path[SH + "alternativePath"][0]]
            if min_c and min_c >= 1:
                any_of.append(tuple(_join(root, [a]) for a in alts))
            if node_ref:
                for a in alts:
                    base = _join(root, [a])
                    for child in required_children(node_ref):
                        constraints.append(
                            (
                                f"node:{base}.{child}",
                                f"{base} IS NOT NULL AND "
                                f"{base}.{child} IS NULL",
                            )
                        )
            return
        segs = (
            [seg(u) for u in path]
            if isinstance(path, list)
            else [seg(path)]
            if isinstance(path, str)
            else None
        )
        if segs is None:
            return
        dotted = _join(root, segs)
        if min_c is not None or max_c is not None:
            shapes.append(
                PathShape(dotted, min_count=min_c or 0, max_count=max_c)
            )
        lexical_checks(prop, dotted)

        def check_inline_keys(d: dict, where: str) -> None:
            for key in d:
                if (
                    key.startswith(SH)
                    and key not in _INLINE_SHAPE_KEYS
                    and key not in _ANNOTATION_KEYS
                ):
                    unsupported(
                        f"{key.replace(SH, 'sh:')} inside an inline "
                        "sh:and/sh:not shape", where
                    )

        def resolve_inline(sub):
            """An inline blank-node shape (dict) as-is, or a NAMED shape
            reference resolved to its declaration's predicate dict —
            sh:and/or/not/qualifiedValueShape members may cite
            ``ex:HelperShape``, whose value constraints (datatype /
            pattern / in / …) then compile exactly like an inline
            member. Structural vocabulary inside the resolved shape
            still warns via check_inline_keys. None = unresolvable."""
            if isinstance(sub, dict):
                return sub
            if isinstance(sub, str) and sub in by_subject:
                return by_subject[sub]
            return None

        def compile_resolved(sub, fn) -> bool:
            """Run ``fn(shape_dict)`` for an inline or resolved named
            member. Resolution is exactly ONE level deep by
            construction: members compile value constraints only
            (check_inline_keys warns on nested composition), so a
            cyclic A→B→A reference chain is structurally unreachable.
            False = unresolvable (caller emits its unsupported())."""
            d = resolve_inline(sub)
            if d is None:
                return False
            fn(d)
            return True

        # sh:and ( s1 s2 … ): conjunction of INLINE one-column shapes over
        # the same value nodes — each compiles exactly as if its
        # constraints were declared on the property directly (conjunction
        # = more constraints; SHACL's sh:and over property shapes)
        and_list = prop.get(SH + "and", [None])[0]
        if and_list is not None:
            subs = and_list if isinstance(and_list, list) else [and_list]
            for sub in subs:
                def _and_member(d, where=dotted):
                    check_inline_keys(d, where)
                    lexical_checks(d, where)

                if not compile_resolved(sub, _and_member):
                    unsupported(
                        "sh:and over an unresolvable shape reference",
                        dotted,
                    )
        # sh:not [ … ]: the value must NOT conform to the inner shape —
        # violation when the value EXISTS and none of the inner shape's
        # compiled violation predicates fire (i.e. it conforms). Inner
        # constraints compile into a local sink and are OR-combined, never
        # emitted standalone.
        not_shape = prop.get(SH + "not", [None])[0]
        if not_shape is not None:
            inner_sink: list[tuple[str, str]] = []

            def _not_member(d, where=dotted, sink=inner_sink):
                check_inline_keys(d, where)
                lexical_checks(d, where, sink=sink)

            if compile_resolved(not_shape, _not_member):
                if inner_sink:
                    inner = " OR ".join(
                        f"({pred})" for _, pred in inner_sink
                    )
                    constraints.append(
                        (
                            f"not:{dotted}",
                            f"{dotted} IS NOT NULL AND NOT ({inner})",
                        )
                    )
                else:
                    unsupported(
                        "sh:not with no compilable constraints", dotted
                    )
            else:
                unsupported(
                    "sh:not over an unresolvable shape reference", dotted
                )
        # sh:or ( s1 s2 … ) over inline one-column shapes: the value must
        # conform to AT LEAST ONE member — violation when it exists and
        # every member shape has ≥1 violation predicate firing (AND over
        # members of OR over that member's predicates). Distinct from the
        # alternativePath any_of machinery, which disjoins PATHS.
        or_list = prop.get(SH + "or", [None])[0]
        if or_list is not None:
            subs = or_list if isinstance(or_list, list) else [or_list]
            member_preds: list[str] = []
            compilable = True
            for sub in subs:
                tmp: list[tuple[str, str]] = []

                def _or_member(d, where=dotted, sink=tmp):
                    check_inline_keys(d, where)
                    lexical_checks(d, where, sink=sink)

                if compile_resolved(sub, _or_member):
                    if tmp:
                        member_preds.append(
                            "(" + " OR ".join(f"({p})" for _, p in tmp) + ")"
                        )
                    else:
                        compilable = False
                        unsupported(
                            "sh:or member with no compilable constraints",
                            dotted,
                        )
                else:
                    compilable = False
                    unsupported(
                        "sh:or over an unresolvable shape reference",
                        dotted,
                    )
            if compilable and member_preds:
                constraints.append(
                    (
                        f"or:{dotted}",
                        f"{dotted} IS NOT NULL AND "
                        + " AND ".join(member_preds),
                    )
                )
        # sh:qualifiedValueShape [ … ] + sh:qualifiedMin/MaxCount n:
        # count the value nodes conforming to the inline shape. In this
        # engine's relational carrying a multi-valued path is an ARRAY
        # column, so the count is size(filter(arr, x -> conforms(x))) —
        # a narrow higher-order expression, no explode, no shuffle. The
        # inner shape compiles against the lambda variable; null elements
        # never conform. A qualified constraint over a scalar path fails
        # ANALYSIS loudly (filter() needs an array), mirroring sh:class's
        # contract — never a silent under-validation. Per SHACL, an
        # absent path contributes 0 conforming values (minCount fires).
        qshape = prop.get(SH + "qualifiedValueShape", [None])[0]
        qmin = prop.get(SH + "qualifiedMinCount", [None])[0]
        qmax = prop.get(SH + "qualifiedMaxCount", [None])[0]
        if qshape is not None or qmin is not None or qmax is not None:
            tmp = []

            def _q_member(d, sink=tmp):
                check_inline_keys(d, dotted)
                lexical_checks(d, "x", sink=sink)

            resolved_q = qshape is not None and compile_resolved(
                qshape, _q_member
            )
            if not resolved_q:
                unsupported(
                    "sh:qualifiedMin/MaxCount without a resolvable "
                    "sh:qualifiedValueShape", dotted
                )
            else:
                if not tmp:
                    unsupported(
                        "sh:qualifiedValueShape with no compilable "
                        "constraints", dotted
                    )
                else:
                    viol = " OR ".join(f"({p})" for _, p in tmp)
                    count = (
                        f"size(filter({dotted}, "
                        f"x -> x IS NOT NULL AND NOT ({viol})))"
                    )
                    if isinstance(qmin, int):
                        constraints.append(
                            (
                                f"qualified_min:{dotted}",
                                f"coalesce({count}, 0) < {qmin}",
                            )
                        )
                    if isinstance(qmax, int):
                        constraints.append(
                            (
                                f"qualified_max:{dotted}",
                                f"coalesce({count}, 0) > {qmax}",
                            )
                        )
                    if qmin is None and qmax is None:
                        unsupported(
                            "sh:qualifiedValueShape without a "
                            "qualified count", dotted
                        )
        if node_ref:
            for child in required_children(node_ref):
                constraints.append(
                    (
                        f"node:{dotted}.{child}",
                        f"{dotted} IS NOT NULL AND {dotted}.{child} IS NULL",
                    )
                )
            inline_node_shape(node_ref, dotted, set())

    def inline_node_shape(ref: str, base: str, seen: set[str]) -> None:
        """Compile a referenced helper shape's VALUE constraints under the
        parent path: every lexical/term kind on a simple child path
        lands as a normal constraint on ``base.child`` (null-safe — the
        predicates fire only when the child exists, so absent parents
        stay vacuous, per SHACL). Nested ``sh:node`` references recurse
        (cycle-guarded); before round 5 only the minCount children were
        inlined and a helper shape's sh:datatype/sh:pattern silently
        under-validated."""
        if ref in seen:
            return
        seen.add(ref)
        for prop2 in node_shapes.get(ref, {}).get(SH + "property", []):
            if not isinstance(prop2, dict):
                continue
            path2 = prop2.get(SH + "path", [None])[0]
            if not isinstance(path2, str):
                continue
            for key in prop2:
                if (
                    key.startswith(SH)
                    and key not in _SUPPORTED_KEYS
                    and key not in _ANNOTATION_KEYS
                ):
                    unsupported(key.replace(SH, "sh:"), f"{base}.{seg(path2)}")
            lexical_checks(prop2, f"{base}.{seg(path2)}")
            ref2 = prop2.get(SH + "node", [None])[0]
            if isinstance(ref2, str) and ref2 in node_shapes:
                child2 = f"{base}.{seg(path2)}"
                for grand in required_children(ref2):
                    constraints.append(
                        (
                            f"node:{child2}.{grand}",
                            f"{child2} IS NOT NULL AND "
                            f"{child2}.{grand} IS NULL",
                        )
                    )
                inline_node_shape(ref2, child2, seen)

    for s, d in node_shapes.items():
        if SH + "targetClass" not in d:
            continue  # helper shape: reachable via sh:node only
        for prop in d.get(SH + "property", []):
            if isinstance(prop, dict):
                emit(prop)

    return tuple(shapes), tuple(any_of), tuple(constraints)
