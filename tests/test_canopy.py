"""canopy_assign (ops/canopy.py): greedy parity on one partition,
determinism, T-tight separation of centers, and the 2*(1-t_tight)
triangle-inequality cover guarantee."""

import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.canopy import canopy_assign

_M = 1_000_000


def _tok(s):
    return {t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t}


def _jacc(a, b):
    u = len(a | b)
    return (len(a & b) / u) if u else 0.0


def _make_ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }))


def _corpus(seed, n=80):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(25)]
    anchors = [set(rng.choice(vocab, size=8, replace=False)) for _ in range(4)]
    texts = {}
    for i in range(n):
        base = list(anchors[i % 4])
        for _ in range(rng.integers(0, 3)):
            base[rng.integers(len(base))] = vocab[rng.integers(25)]
        texts[i] = " ".join(base)
    return texts


def _run(texts, t_loose, t_tight, **kw):
    a, stats = canopy_assign(_make_ds(texts), t_loose, t_tight, **kw)
    df = a.to_pandas()
    if len(df) == 0:
        return set(), stats
    return set(zip(df["doc_id"], df["canopy_id"], df["jacc_u"])), stats


def _greedy_reference(texts, t_tight):
    """Single-level sequential greedy ascending doc_id."""
    sets = {i: _tok(t) for i, t in sorted(texts.items())}
    centers = []
    for i, s in sets.items():
        if not s:
            continue
        if all(_jacc(s, sets[c]) < t_tight - 1e-12 for c in centers):
            centers.append(i)
    return centers


def test_single_partition_matches_sequential_greedy():
    texts = _corpus(3, n=40)
    got, stats = _run(texts, 0.3, 0.7, num_partitions=1)
    want_centers = set(_greedy_reference(texts, 0.7))
    got_centers = {c for _, c, _ in got}
    assert got_centers == want_centers
    # every center is in its own canopy at jacc 1.0
    assert all((c, c, _M) in got for c in want_centers)


def test_deterministic_across_runs():
    texts = _corpus(7)
    a, sa = _run(texts, 0.3, 0.7)
    b, sb = _run(texts, 0.3, 0.7)
    assert a == b and sa == sb


def test_centers_are_tight_separated():
    texts = _corpus(11)
    got, _ = _run(texts, 0.3, 0.7)
    sets = {i: _tok(t) for i, t in texts.items()}
    centers = sorted({c for _, c, _ in got})
    for x in range(len(centers)):
        for y in range(x + 1, len(centers)):
            assert _jacc(sets[centers[x]], sets[centers[y]]) < 0.7


def test_cover_guarantee():
    # 1 - t_loose >= 2*(1 - t_tight): t_tight=0.9 -> t_loose <= 0.8
    texts = _corpus(13)
    got, _ = _run(texts, 0.8, 0.9)
    covered = {d for d, _, _ in got}
    nonempty = {i for i, t in texts.items() if _tok(t)}
    assert covered == nonempty


def test_assignment_respects_loose_threshold():
    texts = _corpus(17)
    got, _ = _run(texts, 0.5, 0.8)
    sets = {i: _tok(t) for i, t in texts.items()}
    for d, c, ju in got:
        j = _jacc(sets[d], sets[c])
        assert ju == int((2 * _M * len(sets[d] & sets[c])
                          + len(sets[d] | sets[c]))
                         // (2 * len(sets[d] | sets[c])))
        assert j >= 0.5 - 1e-9


def test_bad_thresholds_raise():
    import pytest

    with pytest.raises(ValueError):
        canopy_assign(_make_ds({1: "a"}), 0.9, 0.5)
