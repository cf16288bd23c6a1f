"""Deterministic sampling operators for training-data curation.

A 100-TB pipeline samples constantly (dev subsets, eval splits, mixture
weighting), and the sample must be REPRODUCIBLE across runs, partitionings
and cluster sizes — so membership is a pure function of the row key, never of
``random()`` state or row position. Both operators here are stateless
``map_batches``/``map_groups`` transforms driven by splitmix64 of the key
(``functions/sketch.py``): re-running on a re-sharded input yields the
identical sample. The reference's analog is deterministic id-derived
identity (``/root/reference/pipeline/common.py:29-36``) — same key, same
outcome, no coordination.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.sketch import splitmix64
from .util import pd_to_arrow


def _key_hash(t: pa.Table, key: str, seed: int) -> np.ndarray:
    v = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
    return splitmix64(v ^ np.uint64(seed))


def hash_sample(
    ds: "ray.data.Dataset", key: str, rate: float, seed: int = 0xA5A5
) -> "ray.data.Dataset":
    """Bernoulli(rate) sample keyed on ``key`` (integer column): a row is in
    the sample iff splitmix64(key ^ seed) < rate * 2^64. Changing ``seed``
    draws an independent sample; the same key always resolves the same way,
    so samples of two tables sharing a key column are CONSISTENT (both sides
    keep the same keys — join-safe sampling)."""
    thresh = np.uint64(min(int(rate * 2.0**64), 2**64 - 1))

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_key_hash(t, key, seed) < thresh))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds: "ray.data.Dataset",
    stratum: str,
    key: str,
    k: int,
    seed: int = 0xA5A5,
) -> "ray.data.Dataset":
    """Exactly min(k, |stratum|) rows per stratum: the k smallest key-hashes
    — a deterministic uniform draw without replacement. One shuffle on the
    stratum key; the per-group pick is a vectorized argpartition. For strata
    too large for one worker, the scale path is the same trick pre-applied:
    ``hash_sample`` at a few-times-oversampled rate first, then this exact
    top-k — membership stays key-pure so the composition is still exact."""

    def pick(g: pd.DataFrame) -> pa.Table:
        h = splitmix64(g[key].to_numpy().astype(np.uint64) ^ np.uint64(seed))
        if len(g) > k:
            idx = np.argpartition(h, k)[:k]
            g = g.iloc[idx]
        return pd_to_arrow(g)

    return ds.groupby(stratum).map_groups(pick, batch_format="pandas")
