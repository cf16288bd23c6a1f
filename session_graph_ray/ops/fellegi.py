"""Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
JASA): learn per-field match/unmatch agreement probabilities (m, u) by EM
over the agreement-pattern histogram, and emit the classic log2 agreement /
disagreement weights.

This is the canonical ER scoring model (the statistical backbone of
production linkers); here it rides on the engine's own scored comparison
vectors: each scored pair's (jw, tj, lev) components binarize into K
agreement bits, and EM runs on the 2^K pattern counts — the standard
histogram trick, so the distributed part is ONE constant-size reduce
(2^K integers per block) no matter the corpus size, and the EM itself is
driver-side scalar math over 2^K cells.

Determinism contract: the EM is written with an EXPLICIT evaluation order
(ascending pattern index, ascending field index, left-associated sums and
products over plain Python floats) so the SQL oracle can replay every IEEE
operation bit-for-bit; outputs round to integer micro-units.

Reference analog: the engine's fixed-weight blend (stages/scoring.py, the
reference's confidence gate ``link_entities.py:57``) hand-picks weights;
Fellegi–Sunter LEARNS them from the candidate population.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

# (field name, score column, agreement threshold) — binarization of the
# scorer's comparison vector. Bit k of the pattern = field k agrees.
DEFAULT_FIELDS = (
    ("jw", "jw", 0.88),
    ("tj", "tj", 0.5),
    ("lev", "lev_sim", 0.8),
)

EM_ITERS = 30
_EPS = 1e-6
_HI = 1.0 - 1e-6
P0, M0, U0 = 0.1, 0.9, 0.1


def fs_pattern_counts(
    scores: "ray.data.Dataset",
    fields=DEFAULT_FIELDS,
) -> np.ndarray:
    """Exact counts of the 2^K agreement patterns over all scored pairs.
    One bincount per block, constant-size driver reduce."""
    k = len(fields)
    npat = 1 << k

    def partial(t: pa.Table) -> pa.Table:
        pat = np.zeros(t.num_rows, dtype=np.int64)
        for bit, (_n, col, thr) in enumerate(fields):
            v = t.column(col).to_numpy(zero_copy_only=False)
            pat |= (v >= thr).astype(np.int64) << bit
        cnt = np.bincount(pat, minlength=npat)
        return pa.table({"i": pa.array(np.arange(npat), pa.int64()),
                         "c": pa.array(cnt, pa.int64())})

    parts = scores.map_batches(partial, batch_format="pyarrow").to_pandas()
    counts = np.zeros(npat, dtype=np.int64)
    np.add.at(counts, parts["i"].to_numpy(), parts["c"].to_numpy())
    return counts


def fs_em(counts, k: int, n_iter: int = EM_ITERS):
    """EM over the pattern histogram, plain Python floats in a pinned
    evaluation order (see module doc). Returns (p, m[k], u[k])."""
    npat = 1 << k
    c = [float(int(x)) for x in counts]
    n = 0.0
    for i in range(npat):
        n = n + c[i]
    p, m, u = P0, [M0] * k, [U0] * k
    for _ in range(n_iter):
        g = []
        for i in range(npat):
            wm = p
            wu = 1.0 - p
            for f in range(k):
                if (i >> f) & 1:
                    wm = wm * m[f]
                    wu = wu * u[f]
                else:
                    wm = wm * (1.0 - m[f])
                    wu = wu * (1.0 - u[f])
            g.append(wm / (wm + wu))
        dm = 0.0
        for i in range(npat):
            dm = dm + c[i] * g[i]
        new_m, new_u = [], []
        for f in range(k):
            sm = 0.0
            su = 0.0
            for i in range(npat):
                if (i >> f) & 1:
                    sm = sm + c[i] * g[i]
                    su = su + c[i] * (1.0 - g[i])
            new_m.append(min(max(sm / dm, _EPS), _HI))
            new_u.append(min(max(su / (n - dm), _EPS), _HI))
        p = min(max(dm / n, _EPS), _HI)
        m, u = new_m, new_u
    return p, m, u


def fs_match_weights(
    scores: "ray.data.Dataset",
    fields=DEFAULT_FIELDS,
    n_iter: int = EM_ITERS,
) -> "ray.data.Dataset":
    """One row per comparison field: learned (m, u), the Fellegi–Sunter
    log2 agreement/disagreement weights, the exact integer count of pairs
    agreeing on the field, and the learned match prevalence p (repeated
    per row). All floats in integer micro-units."""
    k = len(fields)
    counts = fs_pattern_counts(scores, fields)
    p, m, u = fs_em(counts, k, n_iter)

    def u6(x: float) -> int:
        return int(math.floor(x * 1000000 + 0.5))

    names, agree, m6, u6s, wa, wd = [], [], [], [], [], []
    for f, (name, _col, _thr) in enumerate(fields):
        names.append(name)
        agree.append(int(counts[(np.arange(1 << k) >> f) & 1 == 1].sum()))
        m6.append(u6(m[f]))
        u6s.append(u6(u[f]))
        wa.append(u6(math.log2(m[f] / u[f])))
        wd.append(u6(math.log2((1.0 - m[f]) / (1.0 - u[f]))))
    return ray.data.from_arrow(
        pa.table(
            {
                "field": pa.array(names, pa.string()),
                "agree_pairs": pa.array(agree, pa.int64()),
                "m_u6": pa.array(m6, pa.int64()),
                "u_u6": pa.array(u6s, pa.int64()),
                "w_agree_u6": pa.array(wa, pa.int64()),
                "w_disagree_u6": pa.array(wd, pa.int64()),
                "p_u6": pa.array([u6(p)] * k, pa.int64()),
            }
        )
    )


def fs_pattern_posteriors(
    scores: "ray.data.Dataset",
    fields=DEFAULT_FIELDS,
    n_iter: int = EM_ITERS,
) -> "ray.data.Dataset":
    """One row per agreement pattern: its exact pair count and the
    posterior match probability P(match | pattern) under the EM-learned
    parameters (one extra E-step in the same pinned evaluation order) —
    the decision side of Fellegi–Sunter: thresholding this posterior IS
    the optimal linkage rule for given error bounds."""
    k = len(fields)
    npat = 1 << k
    counts = fs_pattern_counts(scores, fields)
    p, m, u = fs_em(counts, k, n_iter)

    pats, ns, posts = [], [], []
    for i in range(npat):
        wm = p
        wu = 1.0 - p
        for f in range(k):
            if (i >> f) & 1:
                wm = wm * m[f]
                wu = wu * u[f]
            else:
                wm = wm * (1.0 - m[f])
                wu = wu * (1.0 - u[f])
        pats.append(i)
        ns.append(int(counts[i]))
        posts.append(int(math.floor(wm / (wm + wu) * 1000000 + 0.5)))
    return ray.data.from_arrow(
        pa.table(
            {
                "pattern": pa.array(pats, pa.int64()),
                "n_pairs": pa.array(ns, pa.int64()),
                "posterior_u6": pa.array(posts, pa.int64()),
            }
        )
    )


__all__ = ["fs_pattern_counts", "fs_em", "fs_match_weights",
           "fs_pattern_posteriors", "DEFAULT_FIELDS", "EM_ITERS"]
