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


def test_init_sample_capped_and_reshard_invariant():
    """VERDICT r3 #1: the k-means/PQ init sample must be a FIXED global
    size (not per-block x blocks), and — being content-hash keyed — the
    selected sample must be identical under any re-sharding."""
    import pyarrow as pa

    from session_graph_ray.ops.similarity import sample_vectors_capped

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(5000, 8))
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs]),
    })
    samples = []
    for parts in (1, 37):
        s = sample_vectors_capped(
            rd.from_arrow(t).repartition(parts), max_rows=256, seed=9)
        assert len(s) == 256  # exactly the cap, never blocks x per-block
        samples.append(s[np.lexsort(s.T)])
    assert np.allclose(samples[0], samples[1])


def test_init_sample_many_blocks_stays_bounded():
    """37 blocks x up to 512 rows each would have been ~19k driver rows
    under the old per-block gather; the capped sampler returns <= max_rows."""
    import pyarrow as pa

    from session_graph_ray.ops.similarity import sample_vectors_capped

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(19000, 4))
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs]),
    })
    s = sample_vectors_capped(
        rd.from_arrow(t).repartition(37), max_rows=512, seed=1)
    assert len(s) == 512
    # unit-normalized output contract
    assert np.allclose(np.linalg.norm(s, axis=1), 1.0)
