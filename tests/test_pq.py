"""Product quantization (ops/pq.py): recall vs brute force, encode
determinism under re-sharding, and compression invariants."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from session_graph_ray.ops.pq import pq_encode, pq_topk, pq_train
from session_graph_ray.ops.similarity import brute_force_topk


def _clustered(n=600, d=32, n_clusters=12, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, d))
    assign = rng.integers(0, n_clusters, size=n)
    vecs = cents[assign] + 0.08 * rng.normal(size=(n, d))
    return vecs


@pytest.fixture(scope="module")
def corpus():
    vecs = _clustered()
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs]),
    })
    return vecs, t


def test_pq_recall_vs_brute_force(corpus):
    vecs, t = corpus
    ds = rd.from_arrow(t).repartition(4)
    books = pq_train(ds, m=16, k=64, n_iter=6)
    assert books.shape == (16, 64, 2)
    enc = pq_encode(ds, books)
    qids = [0, 100, 250, 400, 550]
    queries = vecs[qids]
    got = (pq_topk(enc, books, queries, qids, k=10)
           .to_pandas().groupby("query_id").vec_id.apply(set))
    want = (brute_force_topk(ds, queries, qids, k=10)
            .to_pandas().groupby("query_id").vec_id.apply(set))
    recalls = [len(got[q] & want[q]) / 10 for q in qids]
    # within-cluster top-10 on near-equidistant points is the hard PQ
    # regime; a 16x64 codebook holds most of it (measured 0.70)
    assert np.mean(recalls) >= 0.55, recalls


def test_pq_rerank_recovers_exact_topk(corpus):
    from session_graph_ray.ops.pq import pq_topk_rerank

    vecs, t = corpus
    ds = rd.from_arrow(t).repartition(4)
    books = pq_train(ds, m=8, k=16, n_iter=4)
    enc = pq_encode(ds, books)
    qids = [0, 100, 250, 400, 550]
    queries = vecs[qids]
    got = (pq_topk_rerank(enc, ds, books, queries, qids, k=10, mult=8)
           .to_pandas().groupby("query_id").vec_id.apply(set))
    want = (brute_force_topk(ds, queries, qids, k=10)
            .to_pandas().groupby("query_id").vec_id.apply(set))
    recalls = [len(got[q] & want[q]) / 10 for q in qids]
    # exact re-rank of the ADC candidate union recovers nearly everything
    assert np.mean(recalls) >= 0.9, recalls


def test_pq_encode_partition_independent(corpus):
    _, t = corpus
    books = pq_train(rd.from_arrow(t).repartition(2), m=8, k=16, n_iter=2)
    a = (pq_encode(rd.from_arrow(t).repartition(1), books)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    b = (pq_encode(rd.from_arrow(t).repartition(7), books)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert (a.vec_id == b.vec_id).all()
    for x, y in zip(a.code, b.code):
        assert list(x) == list(y)
    # codes are genuinely compressed: m uint8 values spanning < 16 codes
    assert all(len(c) == 8 and max(c) < 16 for c in a.code)


def test_pq_topk_exact_row_contract(corpus):
    vecs, t = corpus
    ds = rd.from_arrow(t).repartition(3)
    books = pq_train(ds, m=4, k=8, n_iter=2)
    enc = pq_encode(ds, books)
    out = pq_topk(enc, books, vecs[[7]], [7], k=10).to_pandas()
    assert len(out) == 10
    assert list(out["rank"]) == list(range(1, 11))
    assert 7 not in set(out.vec_id)  # exclude_self


def test_ivfpq_recall_and_prune(corpus):
    from session_graph_ray.ops.pq import ivfpq_encode, ivfpq_topk
    from session_graph_ray.ops.similarity import train_ivf_centroids

    vecs, t = corpus
    ds = rd.from_arrow(t).repartition(4)
    books = pq_train(ds, m=16, k=64, n_iter=4)
    cents = train_ivf_centroids(ds, n_centroids=12, n_iter=3)
    enc = ivfpq_encode(ds, books, cents).materialize()
    # the coarse quantizer genuinely spreads the corpus
    n_cells = enc.to_pandas().cell.nunique()
    assert n_cells >= 8
    qids = [0, 100, 250, 400, 550]
    got = (ivfpq_topk(enc, books, cents, vecs[qids], qids, k=10,
                      n_probe=4)
           .to_pandas().groupby("query_id").vec_id.apply(set))
    want = (brute_force_topk(ds, vecs[qids], qids, k=10)
            .to_pandas().groupby("query_id").vec_id.apply(set))
    recalls = [len(got[q] & want[q]) / 10 for q in qids]
    # clustered corpus: probing 4/12 cells keeps the true neighbors'
    # cells, so IVF pruning costs little on top of ADC (measured ~=
    # pure-ADC recall at a third of the scan)
    assert np.mean(recalls) >= 0.5, recalls


def test_pq_topk_deterministic_under_ties_and_layout():
    """ADVICE r3: identical PQ codes => identical ADC distances, so the
    per-batch prune must keep boundary TIES (not an arbitrary argpartition
    subset) for the final (dist, vec_id) tie-break to be layout-invariant."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 8))
    # 40 exact copies of base[0] (all tie at the boundary), plus fillers
    vecs = np.concatenate([np.tile(base[0], (40, 1)),
                           base[1:] + 0.01 * rng.normal(size=(3, 8))])
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs]),
    })
    books = pq_train(rd.from_arrow(t), m=4, k=8, n_iter=3)
    frames = []
    for parts in (1, 7):
        enc = pq_encode(rd.from_arrow(t).repartition(parts), books)
        out = (pq_topk(enc, books, vecs[[0]], [0], k=10)
               .to_pandas().sort_values("rank").reset_index(drop=True))
        frames.append(out)
    a, b = frames
    assert list(a.vec_id) == list(b.vec_id)
    assert list(a["rank"]) == list(range(1, 11))
    # ties resolve to the smallest vec_ids among the 39 other copies
    assert list(a.vec_id)[:9] == list(range(1, 10))


def test_pq_topk_survives_empty_blocks(corpus):
    """ADVICE r3: zero-row blocks (routine after ivfpq's cell prune) must
    not crash the per-batch ADC kernel."""
    vecs, t = corpus
    ds = rd.from_arrow(t).repartition(4)
    books = pq_train(ds, m=4, k=8, n_iter=2)
    # empty 3 of 4 blocks post-encode
    enc = pq_encode(ds, books).map_batches(
        lambda b: b.filter(pa.compute.less(b.column("vec_id"), 100)),
        batch_format="pyarrow")
    out = pq_topk(enc, books, vecs[[7]], [7], k=10).to_pandas()
    assert len(out) == 10
    assert list(out.sort_values("rank")["rank"]) == list(range(1, 11))
