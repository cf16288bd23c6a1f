"""HyperLogLog sketch — approximate count-distinct in one streaming pass.

Public-knowledge algorithm: Flajolet, Fusy, Gandouet, Meunier,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm" (AofA 2007), with the standard small-range linear-counting
correction. 2^p byte registers; relative error ~= 1.04/sqrt(2^p)
(p=12 -> ~1.6%).

Why it belongs in this engine: the exact count-distinct
(``analytics.q_event_type_users``) is a two-level groupby whose first level
shuffles one row PER DISTINCT (key, value) pair. At 10^12 events with ~10^9
distinct users per key that exchange is the job; the HLL form ships a fixed
4 KiB register array per (batch, key) instead — constant-size partials,
mergeable by element-wise max, no second shuffle level. The reference has no
sketch surface (its SPARQL ``COUNT(DISTINCT ...)`` loads the whole graph in
RAM — ``/root/reference/.claude/skills/devkg-sparql/SKILL.md:240-251``); this
is a scale-path extension, rows-only checked against exact counts in tests.

The register-update kernel is fully vectorized: splitmix64 mixing,
``>>`` for the bucket, float-log2 for the leading-zero rank (exact except for
values within 1 ulp of a power of two — a 2^-53-probability perturbation of
one register rank, far below the sketch's intrinsic error), and
``np.maximum.at`` scatter.
"""

from __future__ import annotations

import numpy as np

_P = 12
_M = 1 << _P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele, Lea, Flood 2014; public
    domain) — a full-avalanche uint64 -> uint64 mix."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def empty_registers() -> np.ndarray:
    return np.zeros(_M, dtype=np.uint8)


def update_registers(regs: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold a batch of uint64 hashes into the register array (in place)."""
    if len(hashes) == 0:
        return regs
    idx = (hashes >> np.uint64(64 - _P)).astype(np.int64)
    w = hashes << np.uint64(_P)  # low 64-p bits, left-aligned
    # rank = leading zeros of w + 1; w == 0 -> max rank
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rank = np.where(nz, 64 - bl + 1, 64 - _P + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(regs: np.ndarray) -> float:
    """HLL estimate with the small-range linear-counting correction."""
    e = _ALPHA * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    if e <= 2.5 * _M:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return _M * float(np.log(_M / zeros))
    return float(e)


def hll_int_column(values: np.ndarray, regs: np.ndarray | None = None) -> np.ndarray:
    """Convenience: fold an int64/uint64 column into (new or given) registers."""
    if regs is None:
        regs = empty_registers()
    return update_registers(regs, splitmix64(np.asarray(values).astype(np.uint64)))
