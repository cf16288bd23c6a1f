"""Bigram-LM scoring (ops/lm.py) vs a brute-force Python reference, on both
the broadcast-lookup and bucketed-join routes."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from session_graph_ray.ops.lm import bigram_lm_scores


def _brute(docs):
    from collections import Counter

    bigrams = {}
    for did, text in docs:
        toks = text.split()
        bigrams[did] = [(toks[i], toks[i + 1])
                        for i in range(len(toks) - 1)]
    counts = Counter(bg for bgs in bigrams.values() for bg in bgs)
    out = {}
    for did, bgs in bigrams.items():
        score = sum(math.floor(math.log(counts[bg]) * 1e6 + 0.5)
                    for bg in bgs)
        out[did] = (len(bgs), score)
    return out


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "a dog ran over the cat"),
    (3, "the cat sat"),
    (4, "singleton"),          # 1 token -> 0 bigrams
    (5, ""),                   # empty -> 0 bigrams
    (6, "the cat sat on the mat"),  # exact dup of doc 0
]


@pytest.mark.parametrize("broadcast_max", [2_000_000, 0])
def test_bigram_lm_matches_brute_force(broadcast_max):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS]),
    })).repartition(3)
    got = (bigram_lm_scores(ds, broadcast_max=broadcast_max)
           .to_pandas().set_index("doc_id").sort_index())
    want = _brute(DOCS)
    assert set(got.index) == set(want)
    for did, (n, score) in want.items():
        assert int(got.loc[did, "n_bigrams"]) == n, did
        assert int(got.loc[did, "lm_score_u"]) == score, did
    # dup doc scores identically; the dup'd bigrams outscore the rare ones
    assert got.loc[0, "lm_score_u"] == got.loc[6, "lm_score_u"]
    assert got.loc[0, "lm_score_u"] > got.loc[2, "lm_score_u"]


def test_bigram_lm_partition_independent():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab, size=rng.integers(0, 40))))
            for i in range(60)]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs])})
    a = (bigram_lm_scores(rd.from_arrow(t).repartition(1))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (bigram_lm_scores(rd.from_arrow(t).repartition(7))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_mixture_sample_semantics_and_partition_independence():
    from session_graph_ray.ops.sample import mixture_sample

    t = pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "source": pa.array(["a", "b", "c", "d"] * 100),
    })
    rates = {"a": 2.5, "b": 1.0, "c": 0.0}
    a = (mixture_sample(rd.from_arrow(t).repartition(1), "source", "doc_id",
                        rates, default_rate=0.25)
         .to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    b = (mixture_sample(rd.from_arrow(t).repartition(9), "source", "doc_id",
                        rates, default_rate=0.25)
         .to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    assert a.equals(b)

    per = a.groupby(["doc_id", "source"], observed=True).epoch.agg(
        ["count", "min", "max"])
    for (_, src), row in per.iterrows():
        n = row["count"]
        assert row["min"] == 0 and row["max"] == n - 1  # epoch is 0..n-1
        if src == "a":
            assert n in (2, 3)
        elif src == "b":
            assert n == 1
        else:
            assert src == "d" and n == 1  # default 0.25 keeps some d rows
    assert "c" not in set(a.source)      # rate 0 drops every row
    n_a = per.xs("a", level="source")["count"]
    assert 0.3 < (n_a == 3).mean() < 0.7  # ~half the a-rows get the 3rd copy
    d_kept = (a.source == "d").sum()
    assert 10 < d_kept < 40               # ~25% of 100 d-rows


def test_weighted_stratified_sample():
    from session_graph_ray.ops.sample import weighted_stratified_sample
    from session_graph_ray.functions.sketch import splitmix64

    n = 400
    w = np.where(np.arange(n) < 20, 500.0, 1.0)  # 20 heavy rows
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["x"] * n),
        "n_chars": pa.array(w, pa.float64()),
    })

    def brute(seed):
        u = splitmix64(np.arange(n).astype(np.uint64)
                       ^ np.uint64(seed)).astype(np.float64) / 2.0**64
        rank = u ** (1.0 / w)
        order = np.lexsort((np.arange(n), -rank))[:10]
        return set(order.tolist())

    hits = 0
    for seed in [1, 2, 3, 4, 5]:
        got = (weighted_stratified_sample(
            rd.from_arrow(t).repartition(4), "lang", "doc_id", "n_chars",
            k=10, seed=seed).to_pandas())
        assert set(got.doc_id) == brute(seed), seed
        hits += (got.doc_id < 20).sum()
    # 20 rows carry 500x weight -> they dominate every draw
    assert hits >= 40  # of 50 sampled rows across 5 seeds

    a = (weighted_stratified_sample(rd.from_arrow(t).repartition(1),
                                    "lang", "doc_id", "n_chars", k=10)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (weighted_stratified_sample(rd.from_arrow(t).repartition(9),
                                    "lang", "doc_id", "n_chars", k=10)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_contrastive_negatives_contract():
    from session_graph_ray.ops.sample import contrastive_negatives

    t = pa.table({"vec_id": pa.array(range(200), pa.int64())})
    a = (contrastive_negatives(rd.from_arrow(t).repartition(1),
                               "vec_id", k=3, n_total=200)
         .to_pandas().sort_values(["vec_id", "slot"])
         .reset_index(drop=True))
    b = (contrastive_negatives(rd.from_arrow(t).repartition(7),
                               "vec_id", k=3, n_total=200)
         .to_pandas().sort_values(["vec_id", "slot"])
         .reset_index(drop=True))
    assert a.equals(b)
    assert len(a) == 600
    assert (a.neg_id != a.vec_id).all()          # never self
    assert a.neg_id.between(0, 199).all()
    # roughly uniform: every fifth of the id space gets drawn
    hist = np.histogram(a.neg_id, bins=5, range=(0, 200))[0]
    assert hist.min() > 60
