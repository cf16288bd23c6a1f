"""pairwise_cluster_eval (ops/clustereval.py) vs a brute-force reference."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _brute(pred, gold):
    n = len(pred)
    tp = pp = gp = 0
    for i in range(n):
        for j in range(i + 1, n):
            sp = pred[i] == pred[j]
            sg = gold[i] == gold[j]
            pp += sp
            gp += sg
            tp += sp and sg
    prec = tp / pp if pp else 0.0
    rec = tp / gp if gp else 0.0
    f1 = 2.0 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
    tot = n * (n - 1) // 2
    exp = (float(pp) * float(gp)) / float(tot) if tot else 0.0
    den = 0.5 * float(pp + gp) - exp
    ari = (float(tp) - exp) / den if den != 0.0 else 0.0

    def u6(x):
        return int(math.floor(x * 1000000 + 0.5))

    return dict(n_items=n, tp_pairs=tp, pred_pairs=pp, gold_pairs=gp,
                precision_u6=u6(prec), recall_u6=u6(rec), f1_u6=u6(f1),
                ari_u6=u6(ari))


def _run(pred, gold, blocks=5):
    from session_graph_ray.ops.clustereval import pairwise_cluster_eval

    ds = ray.data.from_arrow(
        pa.table({"p": pa.array(pred, pa.int64()),
                  "g": pa.array(gold, pa.int64())})
    ).repartition(blocks)
    row = pairwise_cluster_eval(ds, "p", "g").to_pandas().iloc[0]
    return {k: int(v) for k, v in row.items()}


def test_random_clusterings_match_bruteforce():
    rng = np.random.RandomState(5)
    n = 300
    pred = rng.randint(0, 40, size=n).astype(np.int64)
    gold = rng.randint(0, 25, size=n).astype(np.int64)
    assert _run(pred, gold) == _brute(pred, gold)


def test_perfect_clustering_scores_one():
    rng = np.random.RandomState(9)
    labels = rng.randint(0, 10, size=200).astype(np.int64)
    got = _run(labels, labels)
    assert got["precision_u6"] == got["recall_u6"] == got["f1_u6"] == 1000000
    assert got["ari_u6"] == 1000000


def test_all_singletons_vs_one_cluster():
    n = 50
    pred = np.arange(n, dtype=np.int64)          # all singletons
    gold = np.zeros(n, dtype=np.int64)           # one cluster
    got = _run(pred, gold)
    ref = _brute(pred, gold)
    assert got == ref
    assert got["pred_pairs"] == 0 and got["precision_u6"] == 0


def test_label_range_validated():
    from session_graph_ray.ops.clustereval import pairwise_cluster_eval

    ds = ray.data.from_arrow(
        pa.table({"p": pa.array([-1, 2], pa.int64()),
                  "g": pa.array([0, 1], pa.int64())})
    )
    with pytest.raises(Exception):
        pairwise_cluster_eval(ds, "p", "g").materialize()


def test_exact_assignments_labels_every_row():
    from session_graph_ray.ops.clustereval import exact_assignments

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    ids = [10, 11, 12, 13, 14, 15]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(3)
    got = exact_assignments(ds).to_pandas().sort_values("doc_id")
    assert got["canonical"].tolist() == [10, 11, 10, 13, 11, 10]


def _brute_bcubed(pred, gold):
    from collections import Counter

    n = len(pred)
    cells = Counter(zip(pred, gold))
    n_p = Counter(pred)
    n_g = Counter(gold)
    sp = sum((1_000_000 * c * c) // n_p[p] for (p, g), c in cells.items())
    sr = sum((1_000_000 * c * c) // n_g[g] for (p, g), c in cells.items())
    pu = (2 * sp + n) // (2 * n) if n else 0
    ru = (2 * sr + n) // (2 * n) if n else 0
    f1 = (2 * pu * ru) // (pu + ru) if (pu + ru) else 0
    return {"n_items": n, "n_cells": len(cells),
            "bcubed_precision_u6": pu, "bcubed_recall_u6": ru,
            "bcubed_f1_u6": f1}


def _run_bcubed(pred, gold, blocks=5):
    from session_graph_ray.ops.clustereval import bcubed_eval

    ds = ray.data.from_arrow(
        pa.table({"p": pa.array(pred, pa.int64()),
                  "g": pa.array(gold, pa.int64())})
    ).repartition(blocks)
    return bcubed_eval(ds, "p", "g").to_pandas().iloc[0].to_dict()


def test_bcubed_matches_bruteforce():
    rng = np.random.default_rng(31)
    for trial in range(4):
        n = int(rng.integers(20, 200))
        pred = rng.integers(0, max(2, n // 6), size=n).tolist()
        gold = rng.integers(0, max(2, n // 4), size=n).tolist()
        got = _run_bcubed(pred, gold)
        want = _brute_bcubed(pred, gold)
        assert {k: int(got[k]) for k in want} == want, f"trial={trial}"


def test_bcubed_perfect_and_degenerate():
    # identical clusterings -> P = R = F1 = 1.0 (modulo floor quanta)
    got = _run_bcubed([1, 1, 2, 2, 3], [7, 7, 8, 8, 9])
    assert got["bcubed_precision_u6"] == 1_000_000
    assert got["bcubed_recall_u6"] == 1_000_000
    assert got["bcubed_f1_u6"] == 1_000_000
    # all-singleton pred vs one gold cluster: P = 1, R = 1/n
    got = _run_bcubed([1, 2, 3, 4], [0, 0, 0, 0])
    assert got["bcubed_precision_u6"] == 1_000_000
    assert got["bcubed_recall_u6"] == 250_000
