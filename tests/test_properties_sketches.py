"""Property-based tests over the new sketch kernels (no Ray — pure numpy).

Bloom: no false negatives, ever (the invariant exactness relies on: a
"definite no" must be definite). Quantile summaries: total mass preserved
by compaction; any quantile read from a compressed summary is within one
bucket (~W/m) of the true rank.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from session_graph_ray.ops.approx import (
    _quantile_from_summary,
    _quantile_summary,
)
from session_graph_ray.ops.bloom import _positions


@given(
    keys=st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300),
    n_bits_log=st.integers(6, 16),
    k=st.integers(1, 6),
)
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative(keys, n_bits_log, k):
    n_bits = 1 << n_bits_log
    x = np.array(keys, np.uint64)
    bm = np.zeros(n_bits // 64, np.uint64)
    pos = _positions(x, n_bits, k).ravel()
    np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    # probe the same keys: every bit must be set
    p2 = _positions(x, n_bits, k)
    hit = (bm[p2 >> 6] >> (p2 & 63).astype(np.uint64)) & np.uint64(1)
    assert hit.all()


@given(
    vals=st.lists(
        st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=2000,
    ),
    m=st.integers(4, 64),
)
@settings(max_examples=150, deadline=None)
def test_quantile_summary_mass_and_rank_error(vals, m):
    v = np.sort(np.array(vals, np.float64))
    w = np.ones(len(v))
    sv, sw = _quantile_summary(v, w, m)
    assert len(sv) <= m
    assert sw.sum() == len(v)  # no mass lost or invented
    assert (np.diff(sv) >= 0).all()  # still sorted
    for q in (0.1, 0.5, 0.9):
        est = _quantile_from_summary(sv, sw, [q])[0]
        # with duplicate values a single rank is ill-defined: the estimate
        # is correct if the target rank falls within the estimate's tie
        # range, up to one summary bucket of slack
        lo = np.searchsorted(v, est, side="left")
        hi = np.searchsorted(v, est, side="right")
        slack = max(2.0, 2.0 * len(v) / m)
        assert lo - slack <= q * len(v) <= hi + slack


@given(
    vals=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=50)
)
@settings(max_examples=100, deadline=None)
def test_quantile_summary_exact_when_uncompressed(vals):
    v = np.sort(np.array(vals, np.float64))
    sv, sw = _quantile_summary(v, np.ones(len(v)), m=1024)
    assert np.array_equal(sv, v)
    assert sw.sum() == len(v)
