"""Stage-3 tests: min-label propagation = transitive closure; order-free
canonical election (min id); singleton preservation."""

import pyarrow as pa

import ray.data as rd

from session_graph_ray.config import ERConfig
from session_graph_ray.stages.clustering import assignments, propagate_labels


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.string()),
                "id_b": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _ids(ids):
    return rd.from_arrow(pa.table({"file_id": pa.array(ids, pa.string())}))


def test_chain_transitive_closure():
    cfg = ERConfig().scaled(4)
    # chain a-b-c-d plus disjoint e-f: closure must label all of a..d as 'a'
    labels = propagate_labels(_edges([("b", "c"), ("a", "b"), ("c", "d"), ("e", "f")]), cfg)
    lab = {r["node"]: r["label"] for r in labels.iter_rows()}
    assert lab == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}


def test_assignments_cover_singletons():
    cfg = ERConfig().scaled(4)
    labels = propagate_labels(_edges([("a", "b")]), cfg)
    out = assignments(_ids(["a", "b", "z1", "z2"]), labels, cfg).to_pandas()
    m = dict(zip(out["file_id"], out["canonical_file_id"]))
    assert m == {"a": "a", "b": "a", "z1": "z1", "z2": "z2"}


def test_order_free_canonical():
    cfg = ERConfig().scaled(4)
    # same component presented in two edge orders -> same canonical (min id)
    l1 = propagate_labels(_edges([("m", "q"), ("b", "q")]), cfg)
    l2 = propagate_labels(_edges([("b", "q"), ("m", "q")]), cfg)
    d1 = {r["node"]: r["label"] for r in l1.iter_rows()}
    d2 = {r["node"]: r["label"] for r in l2.iter_rows()}
    assert d1 == d2 == {"m": "b", "q": "b", "b": "b"}
