"""Property-based tests (hypothesis) over the pure kernels.

The headline property: every multi-member block's members stay CONNECTED
through the generated candidate pairs — chunking/capping may drop pairs but
must never split a block into disconnected islands (the round-1 advice bug).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from session_graph_ray.ops.pairing import (
    FAM_EXACT,
    FAM_STEM,
    ROUTE_METRIC,
    _bucket_pairs_factory,
)


def _run_kernel(keys, fids, fams, shas, block_cap=8):
    t = pa.table(
        {
            "block_key": pa.array(keys, pa.uint64()),
            "file_id": pa.array(fids, pa.uint64()),
            "fam": pa.array(fams, pa.int8()),
            "sha": pa.array(shas, pa.uint64()),
        }
    )
    out = _bucket_pairs_factory(block_cap)(t)
    mask = np.array(out.column("route").to_pylist()) != ROUTE_METRIC
    return (
        np.array(out.column("id_a").to_pylist(), dtype=np.uint64)[mask],
        np.array(out.column("id_b").to_pylist(), dtype=np.uint64)[mask],
        np.array(out.column("block_key").to_pylist(), dtype=np.uint64)[mask],
    )


rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 6),        # block key
        st.integers(0, 40),       # file id
        st.booleans(),            # exact fam?
        st.integers(0, 5),        # sha (small domain -> planned collisions)
    ),
    min_size=0,
    max_size=120,
)


def _dedup_rows(rows):
    """One (key, fid) membership at most once; one fam/sha per (key, fid)."""
    seen = {}
    for k, f, ex, sha in rows:
        seen.setdefault((k, f), (ex, sha))
    out = []
    for (k, f), (ex, sha) in seen.items():
        # a fid's sha must be consistent across all its keys
        out.append((k, f, ex, sha))
    # make sha a function of fid (consistency), fam a function of key
    fid_sha = {}
    key_fam = {}
    final = []
    for k, f, ex, sha in out:
        fid_sha.setdefault(f, sha)
        key_fam.setdefault(k, ex)
        final.append((k, f, key_fam[k], fid_sha[f]))
    # exact-fam blocks must group by sha (that's what a sha key IS): remap
    # exact keys to the member's sha value
    return [
        ((1000 + s) if ex else k, f, ex, s) for k, f, ex, s in final
    ]


@settings(max_examples=200, deadline=None)
@given(rows_strategy)
def test_pairs_invariants(raw_rows):
    rows = _dedup_rows(raw_rows)
    if not rows:
        return
    keys = [r[0] for r in rows]
    fids = [r[1] for r in rows]
    fams = [FAM_EXACT if r[2] else FAM_STEM for r in rows]
    shas = [r[3] for r in rows]
    a, b, _k = _run_kernel(keys, fids, fams, shas, block_cap=8)

    # ordered, no self pairs
    assert (a < b).all()

    # every generated pair shares at least one block key
    memb: dict[int, set] = {}
    for k, f in zip(keys, fids):
        memb.setdefault(f, set()).add(k)
    for x, y in zip(a, b):
        assert memb[int(x)] & memb[int(y)], (x, y)

    # CONNECTIVITY: within every multi-member block, all members are in one
    # component of the pair graph RESTRICTED to the union of (pair edges +
    # implicit equal-sha identity edges)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry

    for x, y in zip(a, b):
        union(int(x), int(y))
    # equal-sha fids are connected through their shared exact-sha block
    by_sha: dict[int, list] = {}
    for f, s in zip(fids, shas):
        by_sha.setdefault(s, []).append(f)
    for group in by_sha.values():
        for f in group[1:]:
            union(group[0], f)

    blocks: dict[int, set] = {}
    for k, f in zip(keys, fids):
        blocks.setdefault(k, set()).add(f)
    for k, members in blocks.items():
        if len(members) < 2:
            continue
        roots = {find(f) for f in members}
        assert len(roots) == 1, f"block {k} split into {len(roots)} components"


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1 << 62), min_size=1, max_size=200, unique=True))
def test_exact_star_counts(fids):
    """n identical-content members -> exactly n-1 pairs, all from the min."""
    n = len(fids)
    a, b, _ = _run_kernel([5] * n, fids, [FAM_EXACT] * n, [7] * n, block_cap=4)
    if n == 1:
        assert a.size == 0
        return
    assert a.size == n - 1
    assert (a == min(fids)).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1 << 63), min_size=1, max_size=50))
def test_hex_u64_roundtrip(vals):
    from session_graph_ray.functions.hashing import hex_to_u64, u64_to_hex

    arr = np.array(vals, dtype=np.uint64)
    assert (hex_to_u64(u64_to_hex(arr)) == arr).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=60),
    st.integers(1, 6),
)
def test_sliding_sum_matches_pandas_rolling(values, window):
    import pandas as pd

    v = np.array(values, dtype=np.int64)
    cs = np.cumsum(v)
    lag = np.zeros_like(cs)
    if len(v) > window:
        lag[window:] = cs[:-window]
    mine = cs - lag
    ref = pd.Series(v).rolling(window, min_periods=1).sum().to_numpy()
    assert (mine == ref).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=40))
def test_minhash_identical_sets_identical_bands(tokens):
    from session_graph_ray.functions.hashing import hash64_np
    from session_graph_ray.functions.minhash import MinHasher, shingle_vals

    mh = MinHasher()
    vals = shingle_vals(hash64_np(tokens), 3)
    s1 = mh.signature_from_vals(vals)
    s2 = mh.signature_from_vals(vals.copy())
    assert np.array_equal(s1, s2)
    assert np.array_equal(mh.band_keys_u64(s1), mh.band_keys_u64(s2))
    assert (s1 <= 0xFFFFFFFF).all()  # 32-bit outputs as documented
