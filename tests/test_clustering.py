"""Stage-3 tests: min-label propagation = transitive closure; order-free
canonical election (min id); singleton preservation; hex output mapping."""

import pyarrow as pa

import ray.data as rd

from session_graph_ray.config import ERConfig
from session_graph_ray.stages.clustering import (
    assignments,
    assignments_hex,
    propagate_labels,
)


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.uint64()),
                "id_b": pa.array([p[1] for p in pairs], pa.uint64()),
            }
        )
    )


def _ids(ids):
    return rd.from_arrow(pa.table({"file_id_u64": pa.array(ids, pa.uint64())}))


def _label_map(labels):
    return {r["node"]: r["label"] for r in labels.iter_rows()}


def test_chain_transitive_closure():
    cfg = ERConfig().scaled(4)
    # chain 1-2-3-4 plus disjoint 5-6: closure must label all of 1..4 as 1
    labels = propagate_labels(_edges([(2, 3), (1, 2), (3, 4), (5, 6)]), cfg)
    assert _label_map(labels) == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_assignments_cover_singletons():
    cfg = ERConfig().scaled(4)
    labels = propagate_labels(_edges([(1, 2)]), cfg)
    out = assignments(_ids([1, 2, 71, 72]), labels, cfg).to_pandas()
    m = dict(zip(out["file_id_u64"], out["canonical_u64"]))
    assert m == {1: 1, 2: 1, 71: 71, 72: 72}


def test_order_free_canonical():
    cfg = ERConfig().scaled(4)
    l1 = propagate_labels(_edges([(30, 90), (10, 90)]), cfg)
    l2 = propagate_labels(_edges([(10, 90), (30, 90)]), cfg)
    assert _label_map(l1) == _label_map(l2) == {30: 10, 90: 10, 10: 10}


def test_big_ids_survive_exactly():
    """uint64 ids above 2^53 must round-trip without float decay."""
    cfg = ERConfig().scaled(4)
    a = (1 << 63) + 12345
    b = (1 << 63) + 99999
    labels = propagate_labels(_edges([(a, b)]), cfg)
    assert _label_map(labels) == {a: a, b: a}
    out = assignments(_ids([a, b]), labels, cfg).to_pandas()
    assert dict(zip(out["file_id_u64"], out["canonical_u64"])) == {a: a, b: a}


def test_assignments_hex_formatting():
    cfg = ERConfig().scaled(4)
    labels = propagate_labels(_edges([(0x1F, 0x2F)]), cfg)
    out = assignments_hex(assignments(_ids([0x1F, 0x2F]), labels, cfg)).to_pandas()
    m = dict(zip(out["file_id"], out["canonical_file_id"]))
    assert m == {
        "000000000000001f": "000000000000001f",
        "000000000000002f": "000000000000001f",
    }


def test_long_chain_convergence_warning():
    """A chain longer than max_cluster_rounds must warn, not silently split."""
    import warnings

    cfg = ERConfig(max_cluster_rounds=2, driver_cluster_max_edges=0).scaled(4)
    chain = [(i, i + 1) for i in range(1, 40)]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        propagate_labels(_edges(chain), cfg)
    assert any("max_cluster_rounds" in str(x.message) for x in w)


def test_driver_fastpath_equals_distributed():
    """propagate_labels' small-input driver kernel must produce exactly the
    distributed fixpoint's labels (same min-reachable-id semantics)."""
    import numpy as np
    import pyarrow as pa
    from dataclasses import replace

    import ray.data as rd

    from session_graph_ray.config import auto_config
    from session_graph_ray.stages.clustering import propagate_labels

    rng = np.random.RandomState(5)
    a = rng.randint(0, 5000, 4000).astype(np.uint64)
    b = rng.randint(0, 5000, 4000).astype(np.uint64)
    # add a chain (depth stresses the min-label fixpoint; kept short enough
    # for the distributed form to converge without a deep stats lineage)
    chain = np.arange(6000, 6012, dtype=np.uint64)
    a = np.concatenate([a, chain[:-1]])
    b = np.concatenate([b, chain[1:]])
    edges = rd.from_arrow(
        pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    ).repartition(4)
    cfg = auto_config()
    assert len(a) <= cfg.driver_cluster_max_edges  # gate actually fires
    drv = propagate_labels(edges, cfg).to_pandas()
    dist = propagate_labels(
        edges, replace(cfg, driver_cluster_max_edges=0, max_cluster_rounds=32)
    ).to_pandas()
    drv = drv.sort_values("node").reset_index(drop=True)
    dist = dist.sort_values("node").reset_index(drop=True)
    assert drv.equals(dist)
