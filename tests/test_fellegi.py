"""Fellegi–Sunter EM (ops/fellegi.py): recovery on planted populations and
distributed-census parity."""

import numpy as np
import pyarrow as pa

import ray.data


def _synthetic_scores(n_match=400, n_unmatch=4000, seed=13):
    """Two planted populations: matches agree on each field w.p. ~0.92,
    unmatches w.p. ~0.08. Continuous scores placed around the binarization
    thresholds (0.88 / 0.5 / 0.8)."""
    rng = np.random.RandomState(seed)
    rows = []
    for is_match, count in ((True, n_match), (False, n_unmatch)):
        pa_ = 0.92 if is_match else 0.08
        for _ in range(count):
            jw = 0.95 if rng.rand() < pa_ else 0.3
            tj = 0.7 if rng.rand() < pa_ else 0.1
            lev = 0.9 if rng.rand() < pa_ else 0.2
            rows.append((jw, tj, lev))
    rng.shuffle(rows)
    a = np.array(rows)
    return ray.data.from_arrow(
        pa.table({"jw": pa.array(a[:, 0]), "tj": pa.array(a[:, 1]),
                  "lev_sim": pa.array(a[:, 2])})
    ).repartition(6)


def test_em_recovers_planted_populations():
    from session_graph_ray.ops.fellegi import fs_match_weights

    out = fs_match_weights(_synthetic_scores()).to_pandas()
    assert len(out) == 3
    for _, r in out.iterrows():
        m, u = r["m_u6"] / 1e6, r["u_u6"] / 1e6
        assert m > 0.8, (r["field"], m)
        assert u < 0.2, (r["field"], u)
        assert r["w_agree_u6"] > 0      # agreement is evidence FOR a match
        assert r["w_disagree_u6"] < 0   # disagreement is evidence against
    # learned prevalence near the planted 400/4400
    p = out["p_u6"].iloc[0] / 1e6
    assert 0.05 < p < 0.15


def test_census_is_exact_and_block_invariant():
    from session_graph_ray.ops.fellegi import (DEFAULT_FIELDS,
                                               fs_pattern_counts)

    ds = _synthetic_scores(seed=3)
    c1 = fs_pattern_counts(ds)
    c2 = fs_pattern_counts(ds.repartition(1))
    assert (c1 == c2).all()
    assert int(c1.sum()) == ds.count()
    # brute-force reference census
    df = ds.to_pandas()
    pat = np.zeros(len(df), dtype=np.int64)
    for b, (_n, col, thr) in enumerate(DEFAULT_FIELDS):
        pat |= (df[col].to_numpy() >= thr).astype(np.int64) << b
    ref = np.bincount(pat, minlength=8)
    assert (c1 == ref).all()


def test_em_is_deterministic_pure_function():
    from session_graph_ray.ops.fellegi import fs_em

    counts = np.array([1000, 30, 40, 20, 50, 25, 35, 300], dtype=np.int64)
    a = fs_em(counts, 3)
    b = fs_em(counts, 3)
    assert a == b
    p, m, u = a
    assert 0.0 < p < 1.0
    assert all(0.0 < x < 1.0 for x in m + u)
