"""Triangle enumeration (ops/triangles.py) vs brute force, both routes."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from session_graph_ray.ops.triangles import enumerate_triangles, triangle_count


def _brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for a, b in und:
        for c in adj[a] & adj[b]:
            tris.add(tuple(sorted((a, b, c))))
    return tris


def _ds(edges, parts=3):
    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64()),
    })).repartition(parts)


def test_k4_plus_isolated_edge():
    edges = list(itertools.combinations([10, 20, 30, 40], 2)) + [(50, 60)]
    got = set(map(tuple, enumerate_triangles(_ds(edges))
                  .to_pandas().itertuples(index=False)))
    assert got == _brute(edges)
    assert len(got) == 4
    cnt = triangle_count(_ds(edges)).to_pandas()
    assert int(cnt.n_triangles.iloc[0]) == 4


@pytest.mark.parametrize("broadcast_max", [2_000_000, 0])
def test_random_graph_matches_brute_force(broadcast_max):
    rng = np.random.default_rng(11)
    edges = [tuple(rng.integers(0, 60, 2)) for _ in range(400)]
    # duplicates, reversed duplicates and self-loops included on purpose
    edges += [(b, a) for a, b in edges[:50]] + [(7, 7)]
    got = set(map(tuple,
                  enumerate_triangles(_ds(edges, parts=5),
                                      broadcast_max=broadcast_max)
                  .to_pandas().itertuples(index=False)))
    assert got == _brute(edges)
    assert len(got) > 20  # dense enough to be a real check


def test_hub_wedges_bounded_by_orientation():
    # star hub: 1 center, 40 leaves, no triangles — oriented wedge count
    # must be 0 from the leaves' side (each leaf has out-degree 1 toward
    # the hub), i.e. the result is empty rather than a 40^2 wedge blow-up
    edges = [(0, i) for i in range(1, 41)]
    out = enumerate_triangles(_ds(edges)).to_pandas()
    assert len(out) == 0
