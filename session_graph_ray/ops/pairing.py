"""Shared candidate-pair generation over (block_key, id) tables.

One distributed pass replaces round-1's census-shuffle → driver-broadcast
keep-set → salt pass → self-join chain: keys are hash-bucketed by
``block_key % B`` (every member of a key lands in one bucket), and inside
each bucket a single vectorized kernel does the census, singleton pruning
(the reference's min-sessions frequency idea, "don't work on singletons" —
``/root/reference/pipeline/link_entities.py:857-879``), skew chunking, and
pair generation. No driver-side state, no broadcast, no second pass — the
whole blocking stage is map → one groupby → map → one groupby (dedup).

Key families (``fam`` column):

- ``FAM_EXACT`` (0): members share identical content (sha-keyed blocks).
  Pairs are a **star over the group minimum** — n-1 pairs for an n-member
  block, never chunked, so an exact-duplicate group of ANY size (the
  ubiquitous >64-copy licenses/vendored files at 10^12-file scale) resolves
  to ONE cluster in one label-propagation round. (Round-1's salted splitting
  fragmented such groups — the round-2 fix.)
- fuzzy fams (1+): all pairs within a block, except pairs whose content
  hashes are equal (those are already connected by the exact star). Blocks
  above ``cfg.block_cap`` are chunked by sorted-id ranges: all pairs within
  each chunk, plus **star bridges** — chunk 0's first member pairs with every
  other chunk's first member — so an oversized near-duplicate block stays
  connected (bridge pairs are scored for real, not assumed matches) with a
  star (not chain) topology, keeping label-propagation diameter O(1).
  Cross-chunk pairs that are *not* generated are **counted**, not silent:
  per-bucket metric rows with ``route == ROUTE_METRIC`` carry
  (dropped_pairs, hot_blocks) and are split out by the caller (the
  reference's counted-filter discipline, ``link_entities.py:760-773``).

Routes: ROUTE_EXACT pairs short-circuit to score 1.0 downstream; ROUTE_FUZZY
pairs go to the scorer. All ids and keys are uint64 — shuffles move 8-byte
ints, bucketing is one numpy mod, and pair dedup is a vectorized in-bucket
groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import ERConfig
from ..functions.minhash import _ranges_concat

FAM_EXACT = 0
FAM_STEM = 1
FAM_MH = 2
FAM_PHON = 3  # phonetic (soundex) stem blocks — fuzzy route

ROUTE_EXACT = 0
ROUTE_FUZZY = 1
ROUTE_METRIC = -1

_PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)

KEYS_SCHEMA = pa.schema(
    [
        ("block_key", pa.uint64()),
        ("file_id", pa.uint64()),
        ("fam", pa.int8()),
        ("sha", pa.uint64()),
    ]
)

PAIRS_SCHEMA = pa.schema(
    [
        ("id_a", pa.uint64()),
        ("id_b", pa.uint64()),
        ("block_key", pa.uint64()),
        ("fam", pa.int8()),
        ("route", pa.int8()),
    ]
)


def _all_pairs_idx(starts: np.ndarray, sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(a_idx, b_idx) of all i<j pairs inside each [start, start+size) group,
    vectorized across groups (group members must be contiguous)."""
    if sizes.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    elem = _ranges_concat(starts, sizes)
    local = elem - np.repeat(starts, sizes)
    rem = np.repeat(sizes, sizes) - 1 - local  # partners after each element
    a_idx = np.repeat(elem, rem)
    total = int(rem.sum())
    run_start = np.cumsum(rem) - rem
    b_off = np.arange(total, dtype=np.int64) - np.repeat(run_start, rem) + 1
    return a_idx, a_idx + b_off


def _bucket_pairs_factory(block_cap: int):
    def bucket_pairs(g: pa.Table) -> pa.Table:
        key = g.column("block_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        fid = g.column("file_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        fam = g.column("fam").to_numpy(zero_copy_only=False).astype(np.int8)
        sha = g.column("sha").to_numpy(zero_copy_only=False).astype(np.uint64)

        order = np.lexsort((fid, key))
        key, fid, fam, sha = key[order], fid[order], fam[order], sha[order]
        n = key.size
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        sizes = np.r_[starts[1:], n] - starts
        gkey = key[starts]
        gfam = fam[starts]
        multi = sizes >= 2  # singleton-block prune

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_k: list[np.ndarray] = []
        out_f: list[np.ndarray] = []
        out_r: list[np.ndarray] = []

        def emit(a, b, k, f, route):
            keep = a != b
            out_a.append(a[keep])
            out_b.append(b[keep])
            out_k.append(k[keep])
            out_f.append(np.full(keep.sum(), f, dtype=np.int8))
            out_r.append(np.full(keep.sum(), route, dtype=np.int8))

        # --- exact fam: star over the group min (any size, never chunked) --
        sel = multi & (gfam == FAM_EXACT)
        if sel.any():
            s, m = starts[sel], sizes[sel] - 1
            b_idx = _ranges_concat(s + 1, m)
            emit(
                np.repeat(fid[s], m), fid[b_idx],
                np.repeat(gkey[sel], m), FAM_EXACT, ROUTE_EXACT,
            )

        # --- fuzzy fams, small blocks: all pairs -------------------------
        sel = multi & (gfam != FAM_EXACT) & (sizes <= block_cap)
        if sel.any():
            a_idx, b_idx = _all_pairs_idx(starts[sel], sizes[sel])
            keep = sha[a_idx] != sha[b_idx]  # equal-content pairs ride the star
            a_idx, b_idx = a_idx[keep], b_idx[keep]
            kcol = np.repeat(gkey[sel], sizes[sel] * (sizes[sel] - 1) // 2)[keep]
            gf = np.repeat(gfam[sel], sizes[sel] * (sizes[sel] - 1) // 2)[keep]
            ka = fid[a_idx]
            kb = fid[b_idx]
            out_a.append(ka)
            out_b.append(kb)
            out_k.append(kcol)
            out_f.append(gf)
            out_r.append(np.full(ka.size, ROUTE_FUZZY, dtype=np.int8))

        # --- fuzzy fams, hot blocks: chunk + star bridges (counted) ------
        hot = np.flatnonzero(multi & (gfam != FAM_EXACT) & (sizes > block_cap))
        dropped = 0
        for gi in hot:
            s, m = int(starts[gi]), int(sizes[gi])
            n_chunks = -(-m // block_cap)
            c_starts = s + np.arange(n_chunks, dtype=np.int64) * block_cap
            c_sizes = np.minimum(block_cap, s + m - c_starts)
            a_idx, b_idx = _all_pairs_idx(c_starts, c_sizes)
            keep = sha[a_idx] != sha[b_idx]
            a_idx, b_idx = a_idx[keep], b_idx[keep]
            kk = np.full(a_idx.size, gkey[gi], dtype=np.uint64)
            emit(fid[a_idx], fid[b_idx], kk, int(gfam[gi]), ROUTE_FUZZY)
            # star bridges: chunk 0 head <-> every other chunk head
            ba = np.full(n_chunks - 1, fid[s], dtype=np.uint64)
            bb = fid[c_starts[1:]]
            bkeep = sha[np.full(n_chunks - 1, s)] != sha[c_starts[1:]]
            emit(ba[bkeep], bb[bkeep],
                 np.full(int(bkeep.sum()), gkey[gi], dtype=np.uint64),
                 int(gfam[gi]), ROUTE_FUZZY)
            dropped += m * (m - 1) // 2 - int(
                (c_sizes * (c_sizes - 1) // 2).sum()
            ) - (n_chunks - 1)

        if dropped or hot.size:
            # per-bucket metric row: (dropped cross-chunk pairs, hot blocks)
            out_a.append(np.array([dropped], dtype=np.uint64))
            out_b.append(np.array([hot.size], dtype=np.uint64))
            out_k.append(np.array([0], dtype=np.uint64))
            out_f.append(np.array([-1], dtype=np.int8))
            out_r.append(np.array([ROUTE_METRIC], dtype=np.int8))

        if not out_a:
            return PAIRS_SCHEMA.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.uint64()),
                "id_b": pa.array(np.concatenate(out_b), pa.uint64()),
                "block_key": pa.array(np.concatenate(out_k), pa.uint64()),
                "fam": pa.array(np.concatenate(out_f), pa.int8()),
                "route": pa.array(np.concatenate(out_r), pa.int8()),
            }
        )

    return bucket_pairs


def pairs_from_keys(keys: "ray.data.Dataset", cfg: ERConfig) -> "ray.data.Dataset":
    """(block_key u64, file_id u64, fam i8, sha u64) -> deduped candidate
    pairs (id_a, id_b, block_key, fam, route) + ROUTE_METRIC sentinel rows.

    Two int-keyed exchanges (``ops.exchange`` scatter/gather; Ray's sort
    shuffle above the volume gate): key-bucket (census+prune+chunk+pairs in
    one kernel) and pair-bucket (cross-key dedup — a pair found by several
    fams is scored once, exact route preferred). ``cfg.hash_buckets`` bounds
    per-task memory AND balances reduce tasks: coarse buckets (the old
    ``join_partitions*4``) made the hottest reduce task 6x the mean.
    """
    from .exchange import exchange_map_groups

    B = cfg.hash_buckets

    def key_bucket(t: pa.Table) -> np.ndarray:
        k = t.column("block_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(B)).astype(np.int64)

    raw = exchange_map_groups(
        keys,
        _bucket_pairs_factory(cfg.block_cap),
        None, B, PAIRS_SCHEMA.empty_table(), bucket_fn=key_bucket,
    )

    def pair_bucket(t: pa.Table) -> np.ndarray:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        r = t.column("route").to_numpy(zero_copy_only=False)
        pb = (((a * _PAIR_MIX) ^ b) % np.uint64(B)).astype(np.int64)
        pb[r == ROUTE_METRIC] = -1  # sentinels bypass dedup (pass-through)
        return pb

    def dedup_kernel(g: pa.Table) -> pa.Table:
        cols = ["id_a", "id_b", "block_key", "fam", "route"]
        r_all = g.column("route").to_numpy(zero_copy_only=False).astype(np.int8)
        sent = r_all == ROUTE_METRIC
        passthrough = None
        if sent.any():  # metric sentinel rows ride along undeduped
            mask = pa.array(sent)
            passthrough = g.filter(mask).select(cols)
            g = g.filter(pc.invert(mask))
        a = g.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = g.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        k = g.column("block_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        f = g.column("fam").to_numpy(zero_copy_only=False).astype(np.int8)
        r = g.column("route").to_numpy(zero_copy_only=False).astype(np.int8)
        order = np.lexsort((b, a))
        a, b, k, f, r = a[order], b[order], k[order], f[order], r[order]
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        out = pa.table(
            {
                "id_a": pa.array(a[starts], pa.uint64()),
                "id_b": pa.array(b[starts], pa.uint64()),
                "block_key": pa.array(np.minimum.reduceat(k, starts), pa.uint64()),
                "fam": pa.array(np.minimum.reduceat(f, starts), pa.int8()),
                "route": pa.array(np.minimum.reduceat(r, starts), pa.int8()),
            }
        ) if a.size else PAIRS_SCHEMA.empty_table()
        return pa.concat_tables([passthrough, out]) if passthrough is not None else out

    return exchange_map_groups(
        raw, dedup_kernel, None, B, PAIRS_SCHEMA.empty_table(),
        bucket_fn=pair_bucket,
    )


def split_metric_rows(
    pairs: "ray.data.Dataset", cfg: ERConfig
) -> tuple["ray.data.Dataset", dict]:
    """Separate ROUTE_METRIC sentinel rows from a *materialized* pairs
    dataset: returns (clean pairs view, {'dropped_pairs': n, 'hot_blocks': n})."""
    import pyarrow.compute as pc

    sent = pairs.map_batches(
        lambda t: t.filter(pc.equal(t["route"], pa.scalar(ROUTE_METRIC, pa.int8()))),
        batch_format="pyarrow", batch_size=cfg.pair_batch_size,
    ).to_pandas()
    metrics = {
        "dropped_cross_chunk_pairs": int(sent["id_a"].sum()) if len(sent) else 0,
        "hot_blocks": int(sent["id_b"].sum()) if len(sent) else 0,
    }
    clean = pairs.map_batches(
        lambda t: t.filter(pc.not_equal(t["route"], pa.scalar(ROUTE_METRIC, pa.int8()))),
        batch_format="pyarrow", batch_size=cfg.pair_batch_size,
    )
    return clean, metrics
