"""center_clustering (ops/center.py): parity with the sequential greedy,
star/independence properties, chains, isolated nodes, edge validation."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from session_graph_ray.ops.center import center_clustering


def _sequential(edges, nodes):
    """Reference: ascending-id greedy star clustering."""
    smaller = {}
    nbrs = {}
    for a, b in edges:
        smaller.setdefault(b, set()).add(a)
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    centers = set()
    for v in sorted(nodes):
        if not (smaller.get(v, set()) & centers):
            centers.add(v)
    out = {}
    for v in sorted(nodes):
        if v in centers:
            out[v] = v
        else:
            out[v] = min(c for c in nbrs.get(v, ()) if c in centers)
    return out


def _run(edges, nodes, **kw):
    e = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    }))
    n = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(nodes), pa.int64()),
    }))
    df = center_clustering(e, n, **kw).to_pandas()
    if len(df) == 0:
        return {}
    return dict(zip(df["node"], df["center_id"]))


def test_random_graphs_match_sequential():
    rng = np.random.default_rng(19)
    for trial in range(4):
        n = int(rng.integers(10, 80))
        nodes = list(range(n))
        m = int(rng.integers(0, 3 * n))
        edges = set()
        for _ in range(m):
            a, b = rng.integers(0, n, size=2)
            if a != b:
                edges.add((int(min(a, b)), int(max(a, b))))
        got = _run(sorted(edges), nodes)
        want = _sequential(sorted(edges), nodes)
        assert got == want, f"trial={trial}"


def test_star_properties():
    rng = np.random.default_rng(23)
    n = 60
    edges = set()
    for _ in range(150):
        a, b = rng.integers(0, n, size=2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    got = _run(sorted(edges), range(n))
    centers = {c for c in got.values()}
    adj = set(edges) | {(b, a) for a, b in edges}
    # centers independent (lexicographic-first MIS)
    for c1 in centers:
        for c2 in centers:
            assert c1 == c2 or (c1, c2) not in adj
    # every non-center DIRECTLY adjacent to its center (star property)
    for v, c in got.items():
        assert v == c or (v, c) in adj
    # centers map to themselves
    for c in centers:
        assert got[c] == c


def test_chain_alternates():
    # path 0-1-2-3-4: sequential greedy -> centers {0, 2, 4}
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = _run(edges, range(5))
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4}


def test_isolated_and_empty():
    got = _run([], [3, 7, 9])
    assert got == {3: 3, 7: 7, 9: 9}
    got = _run([(3, 7)], [3, 7, 9])
    assert got == {3: 3, 7: 3, 9: 9}


def test_min_center_tiebreak():
    # node 5 adjacent to centers 1 and 2 -> joins MIN center 1
    edges = [(1, 5), (2, 5)]
    got = _run(edges, [1, 2, 5])
    assert got == {1: 1, 2: 2, 5: 1}


def test_bad_edges_raise():
    with pytest.raises(Exception):
        _run([(5, 3)], [3, 5])


def test_edge_gate_raises():
    with pytest.raises(ValueError):
        _run([(0, 1), (1, 2)], range(3), max_edges=1)
