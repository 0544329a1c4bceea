"""Terminal serializer — the reference's Serialize-Jena-Model sink
(JenaSerializerStep.java:243-338): fold all rows' graphs into one output,
written once, in a choice of formats (Rdf11.java:79-86: TURTLE, N3,
N-TRIPLE, RDF/XML; default TURTLE), filename decorated with step/partition
number (:257-264), parent dirs created (:309-313), wall time logged (:96-102).

Engine mapping: the per-row canonical document lines (operators/construct.py)
are written ONCE per bounded run — formats map to line-oriented layouts:
  ntriples — one `<subj> <pred> obj .` line per statement (N-TRIPLE,
             Rdf11.java:81); objects may be plain, typed (`"lex"^^<dt>`) or
             language-tagged (`"lex"@lang`) via StatementSpec, with full
             ECHAR escaping (backslash, quote, newline, CR, tab)
  turtle   — `@prefix` header + qname-compacted predicates (TURTLE,
             Rdf11.java:80 — the reference's default format)
  canon    — one canonical doc line per row (isomorphism-stable)
  jsonl    — one JSON object per row
  parquet  — columnar (the lake-native form)
Partition decoration → Spark's natural part-file numbering; create-parents →
the filesystem writer's default; wall time → returned. N3 is TURTLE-compatible
for the subset this engine emits (Jena treats N3 as TURTLE on write).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.qnames import DEFAULT_NAMESPACES
from ..functions.typed_literals import XSD, to_typed_literal

FORMATS = (
    "ntriples",
    "turtle",
    "rdfxml",
    "rdfxml-abbrev",
    "canon",
    "jsonl",
    "parquet",
)


@dataclass(frozen=True)
class StatementSpec:
    """Object-term spec for one predicate: a source column plus an optional
    XSD datatype (typed literal) or language tag (rdf:langString) — the
    serializer-side analogue of DbToJenaMapping's rdfType/language
    (JenaModelStepMeta.java:110-135). datatype and lang are exclusive."""

    column: str
    datatype: str | None = None  # XSD local name (typed_literals.CONVERTERS)
    lang: str | None = None
    # column already holds a FULL rendered literal term ("lex"^^<dt> /
    # "lex"@lang, escaped) — produced upstream by a typed PropertyMapping
    # (construct.py); emitted as-is, never re-escaped/re-quoted
    prerendered: bool = False
    # column is ArrayType: the value is an RDF COLLECTION (rdf:List) —
    # Jena's writers emit these for list-valued model structures, reachable
    # through the reference's TYPE_SERIALIZABLE model column even though
    # the plugin's mapping UI never creates them (JenaSerializerStep.java:
    # 243-338 serializes whatever the model holds). Rendering per format:
    # TURTLE `( e1 e2 )`; N-TRIPLES an rdf:first/rdf:rest chain on
    # deterministic blank labels; RDF/XML-ABBREV `rdf:parseType=
    # "Collection"` (IRI items only — RDF/XML collections can only hold
    # node elements, so literal-item lists raise there). Null elements are
    # compacted out; a null array drops the statement; an empty array is
    # rdf:nil / `()`. datatype/lang/prerendered apply element-wise.
    collection: bool = False
    # collection elements are IRIs (rendered <uri> / rdf:about items)
    # rather than literals; only meaningful with collection=True
    items_iri: bool = False

    def __post_init__(self):
        if self.datatype and self.lang:
            raise ValueError("StatementSpec: datatype and lang are exclusive")
        if self.prerendered and (self.datatype or self.lang):
            raise ValueError(
                "StatementSpec: prerendered terms already carry their "
                "datatype/lang — don't set both"
            )
        if self.items_iri and not self.collection:
            raise ValueError(
                "StatementSpec: items_iri applies to collections only"
            )
        if self.items_iri and (self.datatype or self.lang or self.prerendered):
            raise ValueError(
                "StatementSpec: IRI collection items take no "
                "datatype/lang/prerendered"
            )


@dataclass(frozen=True)
class FilenameDecoration:
    """Output-filename decoration — the reference's serializer builds its
    target filename from a base name plus optional step number, partition
    (copy) number, date and time fragments before the extension
    (JenaSerializerStep.java:256-300 buildFilename). Engine mapping: Spark
    writes part-files; decoration renames them post-commit, one name per
    partition file, with the same fragment order (stepnr, partnr, date,
    time)."""

    base: str = "output"
    include_step_nr: bool = False
    include_partition_nr: bool = True
    include_date: bool = False
    include_time: bool = False
    step_nr: int = 0


EXTENSIONS = {
    "ntriples": ".nt",
    "turtle": ".ttl",
    "rdfxml": ".rdf",
    "rdfxml-abbrev": ".rdf",
    "canon": ".txt",
    "jsonl": ".jsonl",
    "parquet": ".parquet",
}


def decorate_part_files(
    path: str, decoration: FilenameDecoration, fmt: str, now=None
) -> list[str]:
    """Rename the written part-files per the decoration spec; returns the
    new paths in partition order. Deterministic when `now` is supplied."""
    import datetime
    import glob as _glob
    import os

    parts = sorted(_glob.glob(os.path.join(path, "part-*")))
    if len(parts) > 1 and not decoration.include_partition_nr:
        raise ValueError(
            f"{len(parts)} part-files but include_partition_nr=False — "
            "names would collide (the reference appends the copy number "
            "for parallel step copies)"
        )
    now = now or datetime.datetime.now()
    out: list[str] = []
    for i, p in enumerate(parts):
        name = decoration.base
        if decoration.include_step_nr:
            name += f"_{decoration.step_nr}"
        if decoration.include_partition_nr:
            name += f"_{i}"
        if decoration.include_date:
            name += "_" + now.strftime("%Y%m%d")
        if decoration.include_time:
            name += "_" + now.strftime("%H%M%S")
        dst = os.path.join(path, name + EXTENSIONS.get(fmt, ".txt"))
        os.replace(p, dst)
        out.append(dst)
    return out


def escape_literal(col: Column) -> Column:
    """N-Triples/TURTLE ECHAR escaping: backslash first, then quote,
    newline, carriage return, tab (the reference delegates to Jena's
    writer, which escapes the same set)."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def object_term(spec: StatementSpec | str) -> Column:
    """Render one object term; null source → null (statement dropped).
    Collections have no single-term N-Triples form (they are first/rest
    chains) — callers dispatch those before coming here."""
    if isinstance(spec, str):
        spec = StatementSpec(spec)
    if spec.collection:
        raise ValueError(
            "object_term: collections render per-format "
            "(turtle_lines/ntriples_lines handle them)"
        )
    return _term_from(F.col(spec.column), spec)


def _element_term(e: Column, spec: StatementSpec) -> Column:
    """Render one collection ELEMENT as a term (datatype/lang/prerendered
    element-wise; items_iri → <uri>)."""
    if spec.items_iri:
        return F.when(
            e.isNotNull(), F.concat(F.lit("<"), e, F.lit(">"))
        )
    return _term_from(e, spec)


def _term_from(src: Column, spec: StatementSpec) -> Column:
    if spec.prerendered:
        return src
    if spec.lang:
        return F.when(
            src.isNotNull(),
            F.concat(
                F.lit('"'),
                escape_literal(src.cast("string")),
                F.lit(f'"@{spec.lang}'),
            ),
        )
    if spec.datatype is None or spec.datatype == "string":
        suffix = f'"^^<{XSD}string>' if spec.datatype == "string" else '"'
        return F.when(
            src.isNotNull(),
            F.concat(
                F.lit('"'), escape_literal(src.cast("string")), F.lit(suffix)
            ),
        )
    # non-string XSD types: slice the lexical form out of the rendered
    # literal and ECHAR-escape it — numeric/temporal canonical forms never
    # contain escapables (no-op), but token/normalizedString/anyURI and the
    # rdf: pair pass user text through (quotes, backslashes, newlines in
    # HTML/XMLLiteral would otherwise yield unparseable triples)
    from ..functions.typed_literals import RDF_NS

    dt_ns = RDF_NS if spec.datatype in ("HTML", "XMLLiteral") else XSD
    local = (
        "normalizedString" if spec.datatype == "normalizeString" else spec.datatype
    )
    suffix = f'"^^<{dt_ns}{local}>'
    rendered = to_typed_literal(src, spec.datatype)
    lex = rendered.substr(F.lit(2), F.length(rendered) - F.lit(len(suffix) + 1))
    return F.when(
        rendered.isNotNull(),
        F.concat(F.lit('"'), escape_literal(lex), F.lit(suffix)),
    )


def _turtle_collection(spec: StatementSpec) -> Column:
    """Turtle collection syntax `( e1 e2 … )`; empty list → `()` (rdf:nil),
    null array → null (statement dropped), null elements compacted out."""
    src = F.col(spec.column)
    arr = F.filter(src, lambda e: e.isNotNull())
    joined = F.concat_ws(" ", F.transform(arr, lambda e: _element_term(e, spec)))
    return (
        F.when(src.isNull(), F.lit(None).cast("string"))
        .when(F.size(arr) == 0, F.lit("()"))
        .otherwise(F.concat(F.lit("( "), joined, F.lit(" )")))
    )


def _ntriples_collection_lines(
    subject_col: str, prop: str, spec: StatementSpec
) -> Column:
    """N-Triples rendering of a collection statement: an rdf:first /
    rdf:rest chain on DETERMINISTIC blank labels (md5 of subject+predicate
    plus element index — stable across runs/partitions, no monotonically_
    increasing_id). Returns an array<string> of lines; a null source array
    collapses to a single null line the caller's array_compact drops."""
    from ..functions.typed_literals import RDF_NS

    src = F.col(spec.column)
    arr = F.filter(src, lambda e: e.isNotNull())
    n = F.size(arr)
    # full 128-bit digest: a truncated label would birthday-collide across
    # subjects at crawl scale (48 bits ≈ collisions from ~16M lists) and a
    # label collision MERGES two chains — corrupt output, not a slow path
    base = F.concat(
        F.lit("_:c"),
        F.md5(F.concat(F.col(subject_col), F.lit(prop))),
        F.lit("e"),
    )

    def lbl(j: Column) -> Column:
        return F.concat(base, j.cast("string"))

    subj = F.concat(F.lit("<"), F.col(subject_col), F.lit(f"> <{prop}> "))
    head = F.when(
        n == 0, F.concat(subj, F.lit(f"<{RDF_NS}nil> ."))
    ).otherwise(F.concat(subj, lbl(F.lit(0)), F.lit(" .")))
    firsts = F.transform(
        arr,
        lambda e, j: F.concat(
            lbl(j), F.lit(f" <{RDF_NS}first> "), _element_term(e, spec),
            F.lit(" ."),
        ),
    )
    rests = F.transform(
        arr,
        lambda e, j: F.concat(
            lbl(j),
            F.lit(f" <{RDF_NS}rest> "),
            F.when(j == n - 1, F.lit(f"<{RDF_NS}nil>")).otherwise(
                lbl(j + F.lit(1))
            ),
            F.lit(" ."),
        ),
    )
    return F.when(
        src.isNotNull(), F.concat(F.array(head), firsts, rests)
    ).otherwise(F.array(F.lit(None).cast("string")))


def ntriples_lines(
    docs: DataFrame,
    subject_col: str = "subject",
    statements: dict[str, StatementSpec | str] | None = None,
) -> DataFrame:
    """One `<subj> <prop> obj .` line per non-null statement value — the
    N-TRIPLE serialization (Rdf11.java:81) as a pure column expression, so
    the write stays a narrow map over the scan (no shuffle, no UDF).
    Collection specs contribute their whole rdf:first/rest chain."""
    stmts = statements or {}
    arrays = []
    for prop, spec in stmts.items():
        if isinstance(spec, str):
            spec = StatementSpec(spec)
        if spec.collection:
            arrays.append(_ntriples_collection_lines(subject_col, prop, spec))
            continue
        term = object_term(spec)
        arrays.append(
            F.array(
                F.when(
                    term.isNotNull(),
                    F.concat(
                        F.lit("<"), F.col(subject_col), F.lit(f"> <{prop}> "),
                        term, F.lit(" ."),
                    ),
                )
            )
        )
    return docs.select(
        F.explode(F.array_compact(F.concat(*arrays))).alias("value")
    )


def _compact(prop: str, ns: dict[str, str]) -> str:
    """URI → prefix:local when a registered namespace prefixes it (longest
    namespace wins); else the <uri> form."""
    best = None
    for p, u in ns.items():
        if prop.startswith(u) and (best is None or len(u) > len(ns[best])):
            local = prop[len(u):]
            if local and all(c not in local for c in "/#:"):
                best = p
    if best is None:
        return f"<{prop}>"
    return f"{best}:{prop[len(ns[best]):]}"


def turtle_lines(
    docs: DataFrame,
    subject_col: str = "subject",
    statements: dict[str, StatementSpec | str] | None = None,
    namespaces: dict[str, str] | None = None,
) -> DataFrame:
    """TURTLE serialization (Rdf11.java:80 — the reference's DEFAULT format,
    :86): `@prefix` header lines for the registered namespaces, then one
    qname-compacted triple line per non-null statement. Predicate compaction
    happens driver-side (predicates are plan-time constants), so the body
    stays a narrow map; the header is a tiny literal union."""
    ns = dict(sorted((namespaces if namespaces is not None else DEFAULT_NAMESPACES).items()))
    stmts = statements or {}
    lines = []
    for prop, spec in stmts.items():
        if isinstance(spec, str):
            spec = StatementSpec(spec)
        term = (
            _turtle_collection(spec) if spec.collection else object_term(spec)
        )
        lines.append(
            F.when(
                term.isNotNull(),
                F.concat(
                    F.lit("<"), F.col(subject_col),
                    F.lit(f"> {_compact(prop, ns)} "), term, F.lit(" ."),
                ),
            )
        )
    body = docs.select(
        F.explode(F.array_compact(F.array(*lines))).alias("value")
    )
    header = docs.sparkSession.createDataFrame(
        [(f"@prefix {p}: <{u}> .",) for p, u in ns.items()], "value string"
    )
    return header.unionByName(body)


def xml_escape(col: Column) -> Column:
    """XML element-content escaping: & first, then < and >; newlines and
    carriage returns become numeric character references (legal XML that
    preserves the value) so the line-oriented writer emits exactly one
    well-formed line per row."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit("\n"), F.lit("&#10;"))
    return F.replace(c, F.lit("\r"), F.lit("&#13;"))


def xml_escape_attr(col: Column) -> Column:
    return F.replace(xml_escape(col), F.lit('"'), F.lit("&quot;"))


def _xml_property_qname(prop: str, ns: dict[str, str]) -> str:
    qn = _compact(prop, ns)
    if qn.startswith("<"):
        raise ValueError(
            f"RDF/XML requires a registered namespace for predicate {prop}"
        )
    return qn


def _xml_literal_segment(qn: str, spec: StatementSpec) -> Column:
    """One `<qn ...>escaped-lexical</qn>` property element (null-gated,
    coalesced to '' so absent values vanish from the concatenation)."""
    from ..functions.typed_literals import RDF_NS, XSD

    if spec.prerendered:
        raise ValueError(
            "rdfxml cannot consume prerendered N-Triples terms; "
            "serialize from the source column with datatype/lang instead"
        )
    src = F.col(spec.column)
    if spec.lang:
        seg = F.when(
            src.isNotNull(),
            F.concat(
                F.lit(f'<{qn} xml:lang="{spec.lang}">'),
                xml_escape(src.cast("string")),
                F.lit(f"</{qn}>"),
            ),
        )
    elif spec.datatype:
        dt_ns = RDF_NS if spec.datatype in ("HTML", "XMLLiteral") else XSD
        uri = dt_ns + (
            "normalizedString"
            if spec.datatype == "normalizeString"
            else spec.datatype
        )
        rendered = to_typed_literal(src, spec.datatype)
        # rendered is '"lex"^^<uri>' with a constant-length suffix;
        # slice the lexical form back out (gated nulls stay null)
        suffix_len = len(f'"^^<{uri}>')
        lex = rendered.substr(
            F.lit(2), F.length(rendered) - F.lit(suffix_len + 1)
        )
        seg = F.when(
            rendered.isNotNull(),
            F.concat(
                F.lit(f'<{qn} rdf:datatype="{uri}">'),
                xml_escape(lex),
                F.lit(f"</{qn}>"),
            ),
        )
    else:
        seg = F.when(
            src.isNotNull(),
            F.concat(
                F.lit(f"<{qn}>"),
                xml_escape(src.cast("string")),
                F.lit(f"</{qn}>"),
            ),
        )
    return F.coalesce(seg, F.lit(""))


def _xml_envelope(
    spark, body: DataFrame, ns: dict[str, str]
) -> DataFrame:
    xmlns = " ".join(f'xmlns:{p}="{u}"' for p, u in sorted(ns.items()))
    header = spark.createDataFrame(
        [
            ('<?xml version="1.0" encoding="UTF-8"?>',),
            (f"<rdf:RDF {xmlns}>",),
        ],
        "value string",
    )
    footer = spark.createDataFrame([("</rdf:RDF>",)], "value string")
    # header ∪ body ∪ footer: coalesce(1) preserves partition order, so a
    # single-file write yields well-formed XML top to bottom
    return header.unionByName(body).unionByName(footer)


def rdfxml_rows(
    docs: DataFrame,
    subject_col: str = "subject",
    statements: dict[str, StatementSpec | str] | None = None,
    namespaces: dict[str, str] | None = None,
) -> DataFrame:
    """Flat RDF/XML (Rdf11.java:82-83): XML declaration + <rdf:RDF> open
    with xmlns declarations, one `<rdf:Description rdf:about=...>` row per
    subject holding its property elements (xml:lang / rdf:datatype
    attributes for tagged/typed objects), and the close tag. Every
    predicate must compact under a registered namespace — RDF/XML cannot
    express un-namespaced property elements. For the abbreviated syntax
    (typed node elements, blank-node elision) see rdfxml_abbrev_rows."""
    from ..functions.typed_literals import RDF_NS

    ns = dict(
        sorted(
            (namespaces if namespaces is not None else DEFAULT_NAMESPACES).items()
        )
    )
    ns.setdefault("rdf", RDF_NS)
    stmts = statements or {}
    segs: list[Column] = []
    for prop, spec in stmts.items():
        if isinstance(spec, str):
            spec = StatementSpec(spec)
        if spec.collection:
            raise ValueError(
                "flat RDF/XML has no collection shorthand — use "
                "rdfxml_abbrev_rows (rdf:parseType=\"Collection\") for "
                "IRI-item lists, or turtle/ntriples for literal items"
            )
        qn = _xml_property_qname(prop, ns)
        segs.append(_xml_literal_segment(qn, spec))
    body = docs.select(
        F.concat(
            F.lit('  <rdf:Description rdf:about="'),
            xml_escape_attr(F.col(subject_col)),
            F.lit('">'),
            *segs,
            F.lit("</rdf:Description>"),
        ).alias("value")
    )
    return _xml_envelope(docs.sparkSession, body, ns)


def rdfxml_abbrev_rows(
    docs: DataFrame,
    subject_col: str = "subject",
    statements: dict | None = None,
    namespaces: dict[str, str] | None = None,
    type_uri: str | None = None,
) -> DataFrame:
    """Abbreviated RDF/XML (Rdf11.java:82-83 RDF/XML-ABBREV, Jena's
    "Abbreviated" writer) — genuinely distinct from the flat layout:

      * **typed node elements**: when `type_uri` is given, the subject's
        rdf:type statement is folded into the element name —
        `<t:Turn rdf:about=...>` instead of `<rdf:Description>` +
        `<rdf:type rdf:resource=.../>`;
      * **blank-node elision** via `rdf:parseType="Resource"`: a nested
        dict value in `statements` describes an anonymous substructure
        (construct.py's recursive blank-node children,
        JenaModelStep.java:347-376) written inline as
        `<t:meta rdf:parseType="Resource">…children…</t:meta>` — no
        rdf:nodeID indirection, no inner rdf:Description element.

    A substructure whose children are all null drops entirely
    (ActionIfNull=IGNORE parity with construct.py). Literal property
    elements share the flat writer's xml:lang / rdf:datatype machinery.
    Pure Catalyst string expressions — one narrow projection per row."""
    from ..functions.typed_literals import RDF_NS

    ns = dict(
        sorted(
            (namespaces if namespaces is not None else DEFAULT_NAMESPACES).items()
        )
    )
    ns.setdefault("rdf", RDF_NS)

    def render(stmts: dict) -> Column:
        segs: list[Column] = []
        for prop, spec in stmts.items():
            qn = _xml_property_qname(prop, ns)
            if isinstance(spec, dict):
                inner = render(spec)
                # all-null children → empty inner → drop the property
                seg = F.when(
                    F.length(inner) > 0,
                    F.concat(
                        F.lit(f'<{qn} rdf:parseType="Resource">'),
                        inner,
                        F.lit(f"</{qn}>"),
                    ),
                )
                segs.append(F.coalesce(seg, F.lit("")))
            else:
                if isinstance(spec, str):
                    spec = StatementSpec(spec)
                if spec.collection:
                    if not spec.items_iri:
                        raise ValueError(
                            "RDF/XML collections can only hold node "
                            "elements (items_iri=True); literal-item "
                            "lists have no RDF/XML form — serialize "
                            "those as turtle/ntriples"
                        )
                    # rdf:parseType="Collection": one empty node element
                    # per IRI item; empty list → empty element = rdf:nil
                    arr = F.filter(
                        F.col(spec.column), lambda e: e.isNotNull()
                    )
                    inner = F.concat_ws(
                        "",
                        F.transform(
                            arr,
                            lambda e: F.concat(
                                F.lit('<rdf:Description rdf:about="'),
                                xml_escape_attr(e),
                                F.lit('"/>'),
                            ),
                        ),
                    )
                    seg = F.when(
                        F.col(spec.column).isNotNull(),
                        F.concat(
                            F.lit(f'<{qn} rdf:parseType="Collection">'),
                            inner,
                            F.lit(f"</{qn}>"),
                        ),
                    )
                    segs.append(F.coalesce(seg, F.lit("")))
                    continue
                segs.append(_xml_literal_segment(qn, spec))
        return F.concat(*segs) if segs else F.lit("")

    if type_uri is not None:
        tq = _xml_property_qname(type_uri, ns)
        open_lit, close_lit = f'  <{tq} rdf:about="', f"</{tq}>"
    else:
        open_lit = '  <rdf:Description rdf:about="'
        close_lit = "</rdf:Description>"
    body = docs.select(
        F.concat(
            F.lit(open_lit),
            xml_escape_attr(F.col(subject_col)),
            F.lit('">'),
            render(statements or {}),
            F.lit(close_lit),
        ).alias("value")
    )
    return _xml_envelope(docs.sparkSession, body, ns)


def serialize_docs(
    docs: DataFrame,
    path: str,
    fmt: str = "ntriples",
    subject_col: str = "subject",
    statements: dict[str, StatementSpec | str] | None = None,
    namespaces: dict[str, str] | None = None,
    single_file: bool = False,
    decorate: FilenameDecoration | None = None,
) -> float:
    """Write the document stream once; returns wall seconds (the reference
    logs serializer wall time, JenaSerializerStep.java:96-102).

    statements: {property_uri: column | StatementSpec} — exploded to one
    triple line per non-null value for the ntriples/turtle formats.
    decorate: rename part-files per FilenameDecoration
    (JenaSerializerStep.java:256-300 filename building).
    """
    if fmt not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}")
    t0 = time.time()
    out = docs
    if single_file:
        out = out.coalesce(1)
    if fmt == "parquet":
        out.write.mode("overwrite").parquet(path)
    elif fmt == "jsonl":
        out.write.mode("overwrite").json(path)
    elif fmt == "canon":
        out.select(
            F.col(subject_col).cast("string").alias("value")
        ).write.mode("overwrite").text(path)
    elif fmt == "turtle":
        df = turtle_lines(out, subject_col, statements, namespaces)
        if single_file:
            df = df.coalesce(1)
        df.write.mode("overwrite").text(path)
    elif fmt in ("rdfxml", "rdfxml-abbrev"):
        # ALWAYS one part-file: XML declaration/<rdf:RDF>/body/footer split
        # across part-files would leave no individual file well-formed —
        # only the exact filename-ordered concatenation would parse
        if fmt == "rdfxml-abbrev":
            df = rdfxml_abbrev_rows(out, subject_col, statements, namespaces)
        else:
            df = rdfxml_rows(out, subject_col, statements, namespaces)
        df.coalesce(1).write.mode("overwrite").text(path)
    else:  # ntriples
        ntriples_lines(out, subject_col, statements).write.mode(
            "overwrite"
        ).text(path)
    if decorate is not None:
        decorate_part_files(path, decorate, fmt)
    return time.time() - t0
