"""IVF at 10x the testdata scale: distributed k-means training + recall vs
brute force on a cluster-structured corpus (round-2 verdict item #10)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _clustered_vectors(n=5000, d=32, n_clusters=24, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d) * 3.0
    assign = rng.randint(0, n_clusters, n)
    vecs = centers[assign] + rng.randn(n, d) * 0.4
    return vecs


def test_ivf_recall_at_scale():
    from session_graph_ray.ops.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    vecs = _clustered_vectors()
    n = len(vecs)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(n)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float64())),
            }
        )
    ).repartition(8)

    qids = [0, 1, 2, 3, 4]
    q = vecs[qids]
    exact = brute_force_topk(ds, q, qids, k=10).to_pandas()

    cents = train_ivf_centroids(ds, n_centroids=32, n_iter=3)
    assert cents.shape == (32, vecs.shape[1])
    # trained codebook is reusable across query batches (the 100-TB pattern)
    approx = ivf_topk(ds, q, qids, k=10, n_probe=8, centroids=cents).to_pandas()

    inter = len(
        set(zip(exact["query_id"], exact["vec_id"]))
        & set(zip(approx["query_id"], approx["vec_id"]))
    )
    recall = inter / len(exact)
    assert recall >= 0.8, recall


def test_kmeans_training_deterministic():
    from session_graph_ray.ops.similarity import train_ivf_centroids

    vecs = _clustered_vectors(n=1000)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float64())),
            }
        )
    ).repartition(4)
    c1 = train_ivf_centroids(ds, n_centroids=16, n_iter=2)
    c2 = train_ivf_centroids(ds, n_centroids=16, n_iter=2)
    assert np.allclose(c1, c2)
