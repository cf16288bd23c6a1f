"""k-NN graph (all-pairs top-k per row, ops/similarity.knn_graph): the exact
broadcast plan is pinned rank-for-rank against a numpy reference; the IVF
plan (forced via the size gate) is checked for invariants + recall vs exact
on a cluster-structured corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _ds_from(vecs: np.ndarray) -> "rd.Dataset":
    n = len(vecs)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(n)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float64())),
            }
        )
    ).repartition(4)


def _numpy_knn(vecs: np.ndarray, k: int) -> pd.DataFrame:
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    rows = []
    for i in range(len(vecs)):
        order = np.lexsort((np.arange(len(vecs)), -sims[i]))
        order = order[order != i][:k]
        for r, j in enumerate(order, start=1):
            rows.append((i, int(j), r))
    return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "nn_rank"])


def test_knn_graph_exact_matches_numpy():
    from session_graph_ray.ops.similarity import knn_graph

    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8)
    got = (
        knn_graph(_ds_from(vecs), k=5)
        .to_pandas()
        .sort_values(["vec_id", "nn_rank"])
        .reset_index(drop=True)
    )
    want = _numpy_knn(vecs, k=5)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_knn_graph_ivf_plan_invariants_and_recall():
    from session_graph_ray.ops.similarity import knn_graph

    rng = np.random.RandomState(11)
    centers = rng.randn(12, 16) * 3.0
    assign = rng.randint(0, 12, 800)
    vecs = centers[assign] + rng.randn(800, 16) * 0.3
    ds = _ds_from(vecs)

    k = 5
    # broadcast_max_rows=0 forces the IVF-bucketed plan on a corpus the
    # exact plan would otherwise take
    approx = knn_graph(
        ds, k=k, broadcast_max_rows=0, n_centroids=16, n_probe=6
    ).to_pandas()

    # invariants: no self edges, no duplicate (q, neighbor), <= k per row,
    # ranks are 1..count within each row
    assert (approx["vec_id"] != approx["neighbor_id"]).all()
    assert not approx.duplicated(["vec_id", "neighbor_id"]).any()
    per_row = approx.groupby("vec_id")["nn_rank"]
    assert (per_row.count() <= k).all()
    assert (per_row.max() == per_row.count()).all()
    assert approx["vec_id"].nunique() == 800  # every row got neighbors

    exact = _numpy_knn(vecs, k=k)
    ekeys = set(zip(exact["vec_id"], exact["neighbor_id"]))
    akeys = set(zip(approx["vec_id"], approx["neighbor_id"]))
    recall = len(ekeys & akeys) / len(ekeys)
    assert recall >= 0.9, recall


def test_knn_graph_exact_handles_k_above_corpus():
    from session_graph_ray.ops.similarity import knn_graph

    vecs = np.random.RandomState(0).randn(4, 6)
    out = knn_graph(_ds_from(vecs), k=10).to_pandas()
    # n-1 neighbors per row when k > n-1
    assert (out.groupby("vec_id")["neighbor_id"].count() == 3).all()


def test_knn_graph_tied_sims_break_by_id():
    """Regression: with >k+1 tied sims (duplicate embeddings), candidate
    selection must include boundary ties so the (sim DESC, id) tie-break is
    honored — a bare argpartition keeps an arbitrary tied subset."""
    from session_graph_ray.ops.similarity import knn_graph

    vecs = np.tile(np.array([1.0, 2.0, 3.0]), (20, 1))  # all identical
    out = (
        knn_graph(_ds_from(vecs), k=5)
        .to_pandas()
        .sort_values(["vec_id", "nn_rank"])
        .reset_index(drop=True)
    )
    got0 = out[out["vec_id"] == 0]["neighbor_id"].tolist()
    assert got0 == [1, 2, 3, 4, 5], got0
    got19 = out[out["vec_id"] == 19]["neighbor_id"].tolist()
    assert got19 == [0, 1, 2, 3, 4], got19

    # IVF plan under the same degenerate ties
    approx = (
        knn_graph(_ds_from(vecs), k=5, broadcast_max_rows=0,
                  n_centroids=2, n_probe=2)
        .to_pandas()
        .sort_values(["vec_id", "nn_rank"])
        .reset_index(drop=True)
    )
    a0 = approx[approx["vec_id"] == 0]["neighbor_id"].tolist()
    assert a0 == [1, 2, 3, 4, 5], a0


def test_group_centroids_exact_and_partition_free(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from session_graph_ray.ops.similarity import group_centroids

    rng = np.random.RandomState(3)
    n, d = 200, 8
    g = rng.randint(0, 5, n).astype(np.int64)
    m = (rng.randn(n, d) * 2).astype(np.float32)  # negatives exercised
    tbl = pa.table({
        "label": pa.array(g),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float32()), d
        ),
    })

    def ref():
        q = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        out = {}
        for lab in np.unique(g):
            s = q[g == lab].sum(axis=0)
            cnt = int((g == lab).sum())
            for dim in range(d):
                out[(int(lab), dim + 1)] = int(s[dim]) // cnt
        return out

    want = ref()
    for parts in (1, 13):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        got = group_centroids(ds, "label").to_pandas()
        gotd = {(int(r.label), int(r.dim)): int(r.centroid_u)
                for r in got.itertuples()}
        assert gotd == want


def test_assign_to_centroids_tie_breaks_to_smallest_label(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from session_graph_ray.ops.similarity import assign_to_centroids

    # two identical centroids (labels 3 and 7): ties must go to 3
    cents = pa.table({
        "label": pa.array([3] * 2 + [7] * 2, pa.int64()),
        "dim": pa.array([1, 2, 1, 2], pa.int64()),
        "centroid_u": pa.array([1_000_000, 0, 1_000_000, 0], pa.int64()),
    })
    vecs = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array([1.0, 0.0, -1.0, 0.5], pa.float32()), 2
        ),
    })
    out = assign_to_centroids(
        ray.data.from_arrow(vecs), cents
    ).to_pandas().set_index("vec_id")
    assert out.loc[0, "assigned"] == 3 and out.loc[0, "dist_q"] == 0
    assert out.loc[1, "assigned"] == 3
    # exact integer distance: (-1e6 - 1e6)^2 + (5e5)^2
    assert out.loc[1, "dist_q"] == 2_000_000**2 + 500_000**2
