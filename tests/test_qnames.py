"""QName pure-function tests incl. property-based — parity with the
reference's UtilTest.java:37-178 (isQName, parseQName incl. {uri}local and
error cases) plus the column-version equivalence check."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kettle_jena_plugins_spark.functions.qnames import (
    DEFAULT_NAMESPACES,
    expand_qname,
    expand_qname_col,
    is_qname,
    parse_qname,
)


def test_is_qname_cases():
    assert is_qname("rdf:type")
    assert is_qname("{http://example.org/}local")
    assert not is_qname("")
    assert not is_qname(None)
    assert not is_qname("no spaces allowed x")
    assert not is_qname("http://example.org/full")  # scheme '//' not a qname


def test_parse_qname_forms():
    assert parse_qname("rdf:type") == ("rdf", None, "type")
    assert parse_qname("{http://e.org/}x") == (None, "http://e.org/", "x")
    assert parse_qname("plain") == (None, None, "plain")


def test_expand_defaults_and_custom():
    assert (
        expand_qname("rdf:type")
        == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    )
    assert expand_qname("t:x", {"t": "http://e.org/"}) == "http://e.org/x"
    assert expand_qname("unknown:x") == "unknown:x"  # unknown prefix unchanged
    assert expand_qname(None) is None


_local = st.from_regex(r"[A-Za-z][A-Za-z0-9_.-]{0,10}", fullmatch=True)


@given(prefix=st.sampled_from(sorted(DEFAULT_NAMESPACES)), local=_local)
def test_expand_roundtrip_property(prefix, local):
    q = f"{prefix}:{local}"
    assert expand_qname(q) == DEFAULT_NAMESPACES[prefix] + local


@given(uri=st.from_regex(r"http://[a-z]{1,8}\.org/", fullmatch=True), local=_local)
def test_braced_form_property(uri, local):
    assert expand_qname("{" + uri + "}" + local) == uri + local


@settings(deadline=None, max_examples=20)
@given(
    qnames=st.lists(
        st.one_of(
            st.builds(
                lambda p, l: f"{p}:{l}",
                st.sampled_from(sorted(DEFAULT_NAMESPACES)),
                _local,
            ),
            _local,
            st.builds(lambda l: "{http://e.org/}" + l, _local),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_column_version_matches_pure(spark, qnames):
    df = spark.createDataFrame([(q,) for q in qnames], "q string")
    got = [
        r["e"]
        for r in df.select(expand_qname_col(df.q).alias("e")).collect()
    ]
    want = [expand_qname(q) for q in qnames]
    assert got == want
