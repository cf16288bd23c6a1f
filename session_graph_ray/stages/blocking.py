"""Stage 1 — blocking: key derivation, salted groupby shuffle, pair generation.

Reference semantic carried over (not the mechanism): "same normalized string
=> same node" (``/root/reference/pipeline/common.py:29-36``) generalized to
three key families, plus the min-sessions frequency idea "don't work on
singletons" (``/root/reference/pipeline/link_entities.py:857-879``) as the
singleton-block drop, plus explicit skew handling (SURVEY.md §7.4 hard part 1).

Key families per scorable row:

- ``sha:<content_sha256[:16]>``      exact-content block (score-1.0 fast path)
- ``stem:<lang>:<stem_norm>``        normalized path-stem block
- ``mh:<band>:<hash>``               MinHash-LSH band blocks over content
                                     shingles (near-duplicate recall)

Physical plan (all Ray Data, no driver loops over rows):

1. ``map_batches(KeyExploder)``  — actor pool (MinHasher permutation tables
   built once per actor) -> (block_key, file_id) rows.
2. block-size census: ``groupby(block_key).count()`` (keys+ids only — tiny
   rows through the shuffle); keys above ``block_cap`` become a broadcast
   hot-key -> n_chunks dict (``ray.put`` once, read per task).
3. salt pass: hot keys get ``#<crc32(file_id) % n_chunks>`` appended.
4. ``groupby(salted_key).map_groups(pairs_in_block)`` -> candidate pairs,
   capped per block with truncation *counted* (mirrors the reference's
   counted filters, ``link_entities.py:760-773``).
5. cross-key dedup: ``groupby(pair_key).aggregate(Min(route), Min(block_key))``
   so each unordered pair is scored once; ``route==0`` marks pairs backed by
   an exact-sha block (short-circuit to score 1.0 without feature join).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..config import ERConfig
from ..functions.minhash import MinHasher
from ..functions.text import content_tokens, token_shingles


class KeyExploder:
    """Actor-pool batch fn: one corpus row -> ~2 + bands (block_key, file_id) rows.

    Stateful: MinHash permutation tables + config built once per actor
    (reference analog: per-worker client construction,
    ``/root/reference/pipeline/llm_providers.py:65-228``).
    """

    def __init__(self, cfg: ERConfig):
        self.cfg = cfg
        self.mh = MinHasher(cfg.minhash_num_perm, cfg.minhash_bands, cfg.minhash_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fids = batch.column("file_id").to_pylist()
        shas = batch.column("content_sha256").to_pylist()
        langs = batch.column("lang_norm").to_pylist()
        stems = batch.column("stem_norm").to_pylist()
        contents = batch.column("content").to_pylist()
        scorable = batch.column("scorable").to_pylist()

        keys: list[str] = []
        out_ids: list[str] = []
        for i in range(len(fids)):
            if not scorable[i]:
                continue
            fid = fids[i]
            keys.append(f"sha:{shas[i][:16]}")
            out_ids.append(fid)
            if stems[i]:
                keys.append(f"stem:{langs[i]}:{stems[i]}")
                out_ids.append(fid)
            toks = content_tokens(contents[i], cap=self.cfg.content_token_cap)
            sig = self.mh.signature(token_shingles(toks, self.cfg.shingle_k))
            for bk in self.mh.band_keys(sig):
                keys.append(f"mh:{bk}")
                out_ids.append(fid)
        return pa.table(
            {"block_key": pa.array(keys, pa.string()),
             "file_id": pa.array(out_ids, pa.string())}
        )


def derive_block_keys(norm_ds: "ray.data.Dataset", cfg: ERConfig) -> "ray.data.Dataset":
    return norm_ds.map_batches(
        KeyExploder,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.scorer_concurrency,
        num_cpus=1,
    )


def block_census(
    keys_ds: "ray.data.Dataset", cfg: ERConfig
) -> tuple[dict[str, int], set[str]]:
    """Block-size accounting: (hot-key -> n_chunks dict, non-singleton key set).

    The census shuffle moves (key, id) rows only — never content — so it is
    cheap even at huge row counts. Singleton blocks (the overwhelming
    majority: unique sha hashes and unique MinHash bands) produce no pairs
    (frequency-filter analog, ``link_entities.py:857-879``), so their keys are
    dropped BEFORE the pair self-join — at bench scale this prunes ~80% of
    key rows. Both outputs are heavy-hitter/multi-member keys only and are
    broadcast via ``ray.put`` (at extreme corpus scale the keep-set becomes a
    distributed semi-join against the sizes table instead — same plan shape).
    """
    # bucketed count: a native groupby here sort-shuffles millions of distinct
    # key strings (~20s at bench scale); bucketing shuffles on B small ints
    # and counts with vectorized pandas value_counts inside each bucket
    B = cfg.join_partitions * 4

    def add_bkt(t: pa.Table) -> pa.Table:
        ks = t.column("block_key").to_pylist()
        bkt = [zlib.crc32(k.encode()) % B for k in ks]
        return pa.table(
            {"block_key": t.column("block_key"),
             "__bkt": pa.array(bkt, pa.int32())}
        )

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["block_key"].value_counts()
        vc = vc[vc >= 2]
        return pd.DataFrame({"block_key": vc.index, "n": vc.to_numpy()})

    multi = (
        keys_ds.map_batches(add_bkt, batch_format="pyarrow",
                            batch_size=cfg.pair_batch_size)
        .groupby("__bkt")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
    )
    hot = {
        k: int(np.ceil(n / cfg.block_cap))
        for k, n in zip(multi["block_key"], multi["n"])
        if n > cfg.block_cap
    }
    # keep-set as a SORTED crc32 array: pickles/broadcasts 10x faster than a
    # Python string set and filters via vectorized np.isin. crc collisions
    # only cause a singleton block to survive pruning (still yields no pairs).
    from ..functions.hashing import crc32_np

    keep = np.sort(crc32_np(list(multi["block_key"])))
    return hot, keep


def _salt_batch_factory(hot_ref, keep_ref, cfg: ERConfig):
    """Fused prune + salt pass: drop singleton-block keys, split hot blocks.

    Prune is vectorized: np.isin of batch key crcs against the broadcast
    sorted keep array. Salting stays a dict lookup — the hot dict holds only
    heavy-hitter keys (a handful)."""
    from ..functions.hashing import crc32_np

    def salt(batch: pa.Table) -> pa.Table:
        hot: dict[str, int] = ray.get(hot_ref) if hot_ref is not None else {}
        keep = ray.get(keep_ref) if keep_ref is not None else None
        keys = batch.column("block_key").to_pylist()
        if keep is not None and len(keys):
            # keep is pre-sorted: binary search beats np.isin (which re-sorts
            # the whole keep array on every batch)
            vals = crc32_np(keys)
            pos = np.searchsorted(keep, vals)
            in_range = pos < keep.size
            mask = in_range & (keep[np.where(in_range, pos, 0)] == vals)
            batch = batch.filter(pa.array(mask))
            keys = batch.column("block_key").to_pylist()
        if hot:
            fids = batch.column("file_id").to_pylist()
            keys = [
                f"{k}#{zlib.crc32(f.encode()) % hot[k]}" if k in hot else k
                for k, f in zip(keys, fids)
            ]
            batch = batch.set_column(
                batch.schema.get_field_index("block_key"), "block_key",
                pa.array(keys, pa.string()),
            )
        return batch.select(["block_key", "file_id"])

    return salt


def pairs_via_self_join(
    keys: "ray.data.Dataset", cfg: ERConfig
) -> "ray.data.Dataset":
    """Candidate pairs by self-joining the (block_key, file_id) table.

    A per-group ``map_groups`` here would mean one Python/pandas invocation
    per block key — tens of thousands of tiny groups. The self bucket-join
    does the same work as vectorized pandas merges over ~B buckets; the
    ``id_a < id_b`` triangle filter runs as an Arrow kernel. Block sizes are
    already bounded by the salting pass, so the per-block n^2 blowup is
    capped before this join (skew handling happens upstream, not here).
    """
    from ..ops.join import bucket_join, rename_batches

    ka = rename_batches(keys, {"file_id": "id_a"})
    kb = rename_batches(keys, {"block_key": "block_key_r", "file_id": "id_b"})
    joined = bucket_join(
        ka, kb, left_on="block_key", right_on="block_key_r",
        num_buckets=cfg.join_partitions * 4,
        left_schema=pa.schema([("block_key", pa.string()), ("id_a", pa.string())]),
        right_schema=pa.schema([("block_key_r", pa.string()), ("id_b", pa.string())]),
    )

    def triangle(batch: pa.Table) -> pa.Table:
        mask = pa.compute.less(batch["id_a"], batch["id_b"])
        t = batch.filter(mask)
        return pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "block_key": t["block_key"]}
        )

    return joined.map_batches(triangle, batch_format="pyarrow",
                              batch_size=cfg.pair_batch_size)


def candidate_pairs(
    norm_ds: "ray.data.Dataset", cfg: ERConfig
) -> "ray.data.Dataset":
    """Full blocking stage: returns deduped pairs
    ``(id_a, id_b, block_key, route)`` where route==0 means sha-backed."""
    keys = derive_block_keys(norm_ds, cfg)
    # census + salting need two passes over keys — materialize once (ids+keys
    # only; tiny blocks relative to the corpus)
    keys = keys.materialize()
    hot, keep = block_census(keys, cfg)
    hot_ref = ray.put(hot) if hot else None
    keep_ref = ray.put(keep)
    # materialize + coalesce the pruned keys: (a) the self-join consumes this
    # dataset twice — lazy would re-run the prune pass per side; (b) actor
    # output blocks are tiny and thousands of them stall the executor with
    # per-task overhead, so coalesce to ~join_partitions blocks first
    salted = (
        keys.map_batches(
            _salt_batch_factory(hot_ref, keep_ref, cfg), batch_format="pyarrow",
            batch_size=65536,  # narrow (key, id) rows: big batches, few tasks
        )
        .repartition(cfg.join_partitions)
        .materialize()
    )
    raw_pairs = pairs_via_self_join(salted, cfg)

    # cross-key dedup, bucketed: a native groupby on millions of distinct
    # pair-key strings sort-shuffles them (~30s at bench scale); bucketing by
    # crc(id_a) shuffles small ints and dedups with a vectorized pandas
    # groupby inside each bucket (same pair always lands in the same bucket)
    B = cfg.join_partitions * 4

    def add_route_bkt(batch: pa.Table) -> pa.Table:
        keys = batch.column("block_key").to_pylist()
        ids_a = batch.column("id_a").to_pylist()
        route = [0 if k.startswith("sha:") else 1 for k in keys]
        bkt = [zlib.crc32(a.encode()) % B for a in ids_a]
        return batch.append_column(
            "route", pa.array(route, pa.int32())
        ).append_column("__bkt", pa.array(bkt, pa.int32()))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["id_a", "id_b"], as_index=False).agg(
            block_key=("block_key", "min"), route=("route", "min")
        )
        return out[["id_a", "id_b", "block_key", "route"]]

    return (
        raw_pairs.map_batches(add_route_bkt, batch_format="pyarrow",
                              batch_size=cfg.pair_batch_size)
        .groupby("__bkt")
        .map_groups(dedup_bucket, batch_format="pandas")
    )
