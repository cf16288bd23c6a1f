"""ops.exchange volume-gate coverage (VERDICT r2 house rule: every gated
fast path / fallback is exercised by pytest with the threshold forced).

The >max_bytes fallback swaps the one-round scatter/gather for Ray's
streaming ``groupby().map_groups`` — same colocation contract, different
machinery. These tests force the gate both ways on the same input and
require bit-equal results, including the ``__xbkt`` injected-column path
(bucket_fn callers) and sentinel ``-1`` pass-through rows.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from session_graph_ray.ops.exchange import exchange_map_groups

_SCHEMA = pa.schema([("k", pa.uint64()), ("v", pa.int64())])


def _make_min_kernel():
    """min(v) per k; rows with v < 0 are sentinels that pass through
    untouched (mirrors ops.pairing's ROUTE_METRIC contract). Builds output
    from named columns only, so an injected __xbkt column must not break it.
    Returned as a closure: test-module top-level functions pickle by
    reference and Ray workers cannot import tests/."""
    schema = _SCHEMA

    def _min_kernel(g: pa.Table) -> pa.Table:
        k = g.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = g.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        sent = v < 0
        parts = []
        if sent.any():
            parts.append(
                pa.table({"k": pa.array(k[sent], pa.uint64()),
                          "v": pa.array(v[sent], pa.int64())})
            )
        k, v = k[~sent], v[~sent]
        if k.size:
            order = np.lexsort((v, k))
            k, v = k[order], v[order]
            starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            parts.append(
                pa.table({"k": pa.array(k[starts], pa.uint64()),
                          "v": pa.array(v[starts], pa.int64())})
            )
        if not parts:
            return schema.empty_table()
        return pa.concat_tables(parts)

    return _min_kernel


def _input(n=3000, nkeys=97, n_sentinel=5):
    rng = np.random.default_rng(7)
    k = rng.integers(0, nkeys, size=n).astype(np.uint64)
    v = rng.integers(0, 10_000, size=n).astype(np.int64)
    v[:n_sentinel] = -np.arange(1, n_sentinel + 1)  # sentinel rows
    return pa.table({"k": pa.array(k, pa.uint64()), "v": pa.array(v, pa.int64())})


def _bucket_fn(B):
    def fn(t: pa.Table) -> np.ndarray:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        b = (k % np.uint64(B)).astype(np.int64)
        b[v < 0] = -1  # sentinels bypass grouping
        return b
    return fn


def _run(tbl, B, **kw):
    ds = ray.data.from_arrow(tbl).repartition(6)
    out = exchange_map_groups(
        ds, _make_min_kernel(), None, B, _SCHEMA.empty_table(),
        bucket_fn=_bucket_fn(B), **kw,
    )
    df = out.to_pandas()
    return df.sort_values(["k", "v"]).reset_index(drop=True)


def test_fallback_matches_scatter_gather():
    """Force the groupby fallback (max_bytes=0) and require the exact rows
    the scatter/gather path produces — including the 5 sentinel rows."""
    tbl = _input()
    fast = _run(tbl, B=64)
    slow = _run(tbl, B=64, max_bytes=0)
    assert len(fast) == len(slow)
    assert (fast["k"].values == slow["k"].values).all()
    assert (fast["v"].values == slow["v"].values).all()
    assert (fast["v"].values < 0).sum() == 5  # sentinels survived both routes


def test_fallback_bucket_col_path():
    """bucket_col (no bucket_fn) through both routes."""
    tbl = _input(n_sentinel=0)
    b = (tbl.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
         % np.uint64(32)).astype(np.int64)
    tbl2 = tbl.append_column("bkt", pa.array(b, pa.int64()))

    def run(**kw):
        ds = ray.data.from_arrow(tbl2).repartition(4)
        out = exchange_map_groups(
            ds, _make_min_kernel(), "bkt", 32, _SCHEMA.empty_table(), **kw)
        return out.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    fast, slow = run(), run(max_bytes=0)
    assert (fast["k"].values == slow["k"].values).all()
    assert (fast["v"].values == slow["v"].values).all()


def test_size_hint_routes_to_streaming_fallback():
    """A size hint above the gate must route to the streaming fallback
    WITHOUT materializing first (the hint exists so a 100-TB exchange never
    pins its input just to learn it is huge). Results identical."""
    tbl = _input()
    base = _run(tbl, B=64)
    hinted = _run(tbl, B=64, size_hint_bytes=1 << 60)
    assert (base["k"].values == hinted["k"].values).all()
    assert (base["v"].values == hinted["v"].values).all()


def test_size_hint_below_gate_uses_exchange():
    tbl = _input()
    base = _run(tbl, B=64)
    hinted = _run(tbl, B=64, size_hint_bytes=1024)
    assert (base["k"].values == hinted["k"].values).all()
    assert (base["v"].values == hinted["v"].values).all()


@pytest.mark.parametrize("max_bytes", [None, 0])
def test_single_key_degenerate(max_bytes):
    """All rows in one bucket — both routes must still reduce correctly."""
    tbl = pa.table({
        "k": pa.array(np.full(500, 7, np.uint64), pa.uint64()),
        "v": pa.array(np.arange(500, dtype=np.int64) + 1, pa.int64()),
    })
    kw = {} if max_bytes is None else {"max_bytes": max_bytes}
    df = _run(tbl, B=16, **kw)
    assert len(df) == 1
    assert int(df["v"].iloc[0]) == 1
