"""Deterministic sampling operators for training-data curation.

A 100-TB pipeline samples constantly (dev subsets, eval splits, mixture
weighting), and the sample must be REPRODUCIBLE across runs, partitionings
and cluster sizes — so membership is a pure function of the row key, never of
``random()`` state or row position. Every operator here is a stateless
``map_batches``/``map_groups`` transform driven by a hash of the key
(splitmix64 for the samplers; a SQL-mirrorable Knuth multiplicative hash for
:func:`hash_split` so the split is oracle-checkable): re-running on a
re-sharded input yields the identical sample. The reference's analog is
deterministic id-derived
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


_KNUTH = 2654435761  # Knuth multiplicative constant (golden-ratio * 2^32)


def split_buckets(keys: np.ndarray, n_buckets: int, seed: int) -> np.ndarray:
    """((key * 2654435761 + seed) mod 2^32) mod n_buckets, exactly.

    Chosen over splitmix64 for one reason: it is EXACTLY mirrorable in SQL
    (``(CAST(k AS HUGEINT) * 2654435761 + seed) % 4294967296 % n``), so the
    split itself is oracle-checkable value-for-value. numpy's uint64 wrap
    (mod 2^64) preserves the mod-2^32 residue because 2^32 | 2^64, so the
    kernel is exact for any NON-NEGATIVE int64 key with zero per-row
    Python. Negative keys are rejected: SQL ``%`` returns negative residues
    there, so the two sides would silently disagree — reject loudly instead
    of splitting differently from the documented mirror."""
    if keys.size and keys.min() < 0:
        raise ValueError("split_buckets requires non-negative keys "
                         "(the SQL mirror's % semantics differ below 0)")
    k = keys.astype(np.uint64)
    h = (k * np.uint64(_KNUTH) + np.uint64(seed)) & np.uint64(0xFFFFFFFF)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def hash_split(
    ds: "ray.data.Dataset",
    key: str,
    splits: "dict[str, int]",
    seed: int = 0,
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Deterministic train/val/test split as a pure per-row map — the way a
    100-TB corpus is split: membership is a function of the row KEY alone,
    so it is stable across runs, re-shardings and cluster sizes, needs no
    shuffle or coordination, and two tables sharing the key column land in
    consistent splits (no leakage across feature/label tables).

    ``splits`` maps name -> integer weight (e.g. train 90 / val 5 / test 5);
    a row lands in the split whose cumulative-weight range contains its
    bucket. Appends ``out_col``; drop or select downstream."""
    names = list(splits)
    weights = np.array([splits[n] for n in names], dtype=np.int64)
    if (weights <= 0).any():
        raise ValueError("split weights must be positive")
    bounds = np.cumsum(weights)
    total = int(bounds[-1])
    names_arr = np.array(names, dtype=object)

    def f(t: pa.Table) -> pa.Table:
        b = split_buckets(
            t.column(key).to_numpy(zero_copy_only=False), total, seed
        )
        lab = names_arr[np.searchsorted(bounds, b, side="right")]
        return t.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def frac_threshold(rate_frac: float) -> int:
    """uint64 threshold for a Bernoulli(rate_frac) key-hash draw. One shared
    definition so the DuckDB oracle builder quantizes the SAME float product
    the kernel does (bit-exact parity)."""
    return min(int(rate_frac * 2.0**64), 2**64 - 1)


def mixture_sample(
    ds: "ray.data.Dataset",
    source_col: str,
    key: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0xA5A5,
) -> "ray.data.Dataset":
    """Deterministic dataset-mixture weighting: each row is emitted
    ``floor(rate[source])`` times, plus one more iff
    ``splitmix64(key ^ seed) < frac(rate) * 2^64`` — so a source weighted
    2.5 contributes every row twice and half the rows (key-chosen) a third
    time. The training-mixture primitive (weight corpora up/down without a
    shuffle): membership and copy-count are pure functions of (key, source),
    so re-running on any re-sharding emits the identical multiset, and an
    ``epoch`` column (0..copies-1) makes the copies distinguishable for
    downstream per-epoch shuffles. Fully vectorized: rates resolve through
    a dictionary-encode lookup, copies expand via one ``take``."""
    base_of = {s: int(np.floor(r)) for s, r in rates.items()}
    thr_of = {s: np.uint64(frac_threshold(r - np.floor(r)))
              for s, r in rates.items()}
    dbase = int(np.floor(default_rate))
    dthr = np.uint64(frac_threshold(default_rate - np.floor(default_rate)))

    def f(t: pa.Table) -> pa.Table:
        src = t.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode() if not pa.types.is_dictionary(
            src.type) else src
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = enc.dictionary.to_pylist()
        base_lut = np.array([base_of.get(s, dbase) for s in dic],
                            dtype=np.int64)
        thr_lut = np.array([thr_of.get(s, dthr) for s in dic],
                           dtype=np.uint64)
        h = _key_hash(t, key, seed)
        copies = base_lut[codes] + (h < thr_lut[codes]).astype(np.int64)
        row_idx = np.repeat(np.arange(len(copies), dtype=np.int64), copies)
        out = t.take(pa.array(row_idx))
        ends = np.cumsum(copies)
        epoch = np.arange(int(ends[-1]) if len(ends) else 0,
                          dtype=np.int64) - np.repeat(ends - copies, copies)
        return out.append_column("epoch", pa.array(epoch))

    return ds.map_batches(f, batch_format="pyarrow")


def weighted_stratified_sample(
    ds: "ray.data.Dataset",
    stratum: str,
    key: str,
    weight: str,
    k: int,
    seed: int = 0xA5A5,
) -> "ray.data.Dataset":
    """Deterministic weighted sampling WITHOUT replacement, k per stratum
    (Efraimidis-Spirakis 2006): each row draws u = splitmix64(key ^ seed)
    / 2^64 and ranks by u^(1/w) — the top-k per stratum is distributed as
    weight-proportional sampling without replacement, yet membership is a
    pure function of (key, weight, seed): re-sharding, re-running, or
    growing the cluster cannot change the sample. The hash chain and the
    IEEE-double rank expression both replay exactly in SQL, so the draw is
    oracle-checkable (the repo's float-expression-parity contract).

    Per-batch combiner prunes to each stratum's local top-k before the
    one shuffle (candidates per batch <= strata x k); the per-stratum
    reduce re-ranks exactly. Ties (same rank key) break by key asc."""

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        kv = t.column(key).to_numpy(zero_copy_only=False)
        u = splitmix64(kv.astype(np.uint64) ^ np.uint64(seed)).astype(
            np.float64) / 18446744073709551616.0
        w = t.column(weight).to_numpy(zero_copy_only=False).astype(
            np.float64)
        rank = u ** (1.0 / np.maximum(w, 1e-300))
        df = pd.DataFrame({
            "__stratum": t.column(stratum).to_numpy(zero_copy_only=False),
            key: kv, "__rank": rank,
        })
        top = (df.sort_values(["__rank", key], ascending=[False, True])
               .groupby("__stratum", sort=False).head(k))
        return pa.table({
            stratum: pa.array(top["__stratum"].to_numpy()),
            key: pa.array(top[key].to_numpy()),
            "__rank": pa.array(top["__rank"].to_numpy(), pa.float64()),
        })

    def final(g: pa.Table) -> pa.Table:
        r = g.column("__rank").to_numpy(zero_copy_only=False)
        kv = g.column(key).to_numpy(zero_copy_only=False)
        order = np.lexsort((kv, -r))[:k]
        out = g.take(pa.array(order))
        return out.select([stratum, key])

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
            .groupby(stratum)
            .map_groups(final, batch_format="pyarrow"))


def contrastive_negatives(
    ds: "ray.data.Dataset",
    id_col: str,
    k: int,
    n_total: int,
    seed: int = 0xA5A5,
) -> "ray.data.Dataset":
    """k deterministic negative ids per anchor row — the contrastive /
    triplet-loss pair generator. Negative j for anchor a is
    ``splitmix64((a*k + j) ^ seed) % n_total`` (bumped by one on a self
    collision), so the draw is a pure function of (anchor, slot, seed):
    reproducible across runs, shardings and cluster sizes, uniform over a
    DENSE 0..n_total-1 id space (the caller's contract — stated, not
    assumed), and shuffle-free: one map_batches, k-fold repeat + one hash
    per emitted row. Output: (id_col, slot, neg_id)."""

    def f(t: pa.Table) -> pa.Table:
        a = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rep = np.repeat(a, k)
        slot = np.tile(np.arange(k, dtype=np.int64), len(a))
        h = splitmix64((rep * k + slot).astype(np.uint64)
                       ^ np.uint64(seed))
        neg = (h % np.uint64(n_total)).astype(np.int64)
        neg = np.where(neg == rep, (neg + 1) % n_total, neg)
        return pa.table({id_col: pa.array(rep), "slot": pa.array(slot),
                         "neg_id": pa.array(neg)})

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)
