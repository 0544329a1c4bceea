"""Property-based tests (hypothesis) for the vectorized Mersenne-prime
hash core — the 32-bit limb arithmetic must be bit-exact against Python
big-int reference math for ALL inputs, not just the example corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kettle_jena_plugins_spark.operators.text import (
    _horner_pass,
    _length_groups,
    _mulmod_const,
)

M = (1 << 61) - 1


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=M - 1), min_size=1, max_size=50),
    st.integers(min_value=0, max_value=M - 1),
)
def test_mulmod_const_matches_bigint(a_vals, c):
    a = np.array(a_vals, dtype="uint64")
    got = _mulmod_const(a, c)
    for av, gv in zip(a_vals, got):
        assert int(gv) == (av * c) % M


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=200)), max_size=20))
def test_horner_matches_scalar_on_arbitrary_unicode(texts):
    s = pd.Series(texts, dtype="object")
    valid, groups = _length_groups(s)
    finals = {}
    for pos, lens_g, pad in groups:
        h, _ = _horner_pass(pad, lens_g, keep_prefixes=False)
        for p, hv in zip(pos, h):
            finals[p] = int(hv)
    vi = 0
    for t in texts:
        if t is None:
            continue
        h = 0
        for b in t.encode("utf-8"):
            h = (h * 257 + b) % M
        assert finals[vi] == h, repr(t)
        vi += 1


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=8))
def test_prefix_matrix_matches_scalar_prefixes(blobs):
    # drive via latin-1 round-trip so arbitrary bytes survive the encode
    texts = [b.decode("latin-1") for b in blobs]
    s = pd.Series(texts, dtype="object")
    valid, groups = _length_groups(s)
    for pos, lens_g, pad in groups:
        _, P = _horner_pass(pad, lens_g, keep_prefixes=True)
        for gi, p in enumerate(pos):
            bs = texts[p].encode("utf-8")
            h = 0
            for j, b in enumerate(bs):
                h = (h * 257 + b) % M
                assert int(P[gi, j + 1]) == h
