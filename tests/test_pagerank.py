"""ops/pagerank: integer power iteration vs a hand-rolled reference."""

import numpy as np
import pyarrow as pa

import ray.data

from session_graph_ray.ops.pagerank import SCALE_U, pagerank


def _ref_pagerank(edges, nodes, iters, damping_u=850_000):
    """Pure-Python reference of the integer contract."""
    from collections import Counter, defaultdict

    deg = Counter(s for s, _ in edges)
    r = {v: SCALE_U for v in nodes}
    node_set = set(nodes)
    for _ in range(iters):
        acc = defaultdict(int)
        for s, d in edges:
            acc[d] += (damping_u * r[s]) // (SCALE_U * deg[s])
        r = {v: (SCALE_U - damping_u) + acc.get(v, 0) for v in node_set}
    return r


def _run(edges, nodes, iters=3):
    e = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    )
    n = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    out = pagerank(e, n, num_iters=iters).to_pandas()
    return dict(zip(out["node"], out["rank_u"]))


def test_pagerank_matches_reference(ray_session):
    rng = np.random.RandomState(7)
    nodes = list(range(60))
    edges = []
    for s in nodes:
        for d in rng.randint(0, 60, size=rng.randint(1, 4)):
            edges.append((s, int(d)))
    got = _run(edges, nodes)
    want = _ref_pagerank(edges, nodes, 3)
    assert got == want


def test_pagerank_ghost_dst_dropped_and_sources_get_base(ray_session):
    # 0 -> 1, 1 -> 99 (ghost: 99 not in the node table), 2 isolated
    got = _run([(0, 1), (1, 99)], [0, 1, 2], iters=2)
    assert set(got) == {0, 1, 2}
    base = SCALE_U - 850_000
    # 0 and 2 receive nothing; 1 receives floor(.85 * r0(0)) then
    # floor(.85 * base) in round 2
    assert got[0] == base and got[2] == base
    assert got[1] == base + (850_000 * base) // SCALE_U


def test_pagerank_mass_is_partition_independent(ray_session):
    # same graph through many tiny input blocks — bit-equal result
    edges = [(s, (s * 7 + 1) % 40) for s in range(40)] + [
        (s, (s * 13 + 2) % 40) for s in range(0, 40, 2)
    ]
    nodes = list(range(40))
    ref = _run(edges, nodes)
    e = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.int64()),
                "dst": pa.array([d for _, d in edges], pa.int64()),
            }
        )
    ).repartition(17)
    n = ray.data.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64())})
    ).repartition(5)
    out = pagerank(e, n, num_iters=3).to_pandas()
    assert dict(zip(out["node"], out["rank_u"])) == ref
