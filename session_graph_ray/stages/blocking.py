"""Stage 1 — blocking: key derivation + one-pass bucketed pair generation.

Reference semantic carried over (not the mechanism): "same normalized string
=> same node" (``/root/reference/pipeline/common.py:29-36``) generalized to
three key families, plus the min-sessions frequency idea "don't work on
singletons" (``/root/reference/pipeline/link_entities.py:857-879``) as the
singleton-block drop, plus explicit skew handling (SURVEY.md §7.4 hard part 1).

Key families per scorable row (all uint64, family tag in the top 2 bits so
families can never collide numerically):

- ``FAM_EXACT`` sha key      exact-content block (content sha prefix; pairs
                             become a star over the block min — score-1.0
                             fast path, immune to block size)
- ``FAM_STEM``  stem key     hash64(lang + normalized path stem)
- ``FAM_MH``    band keys    MinHash-LSH bands over content-token shingles
                             (near-duplicate recall)

Physical plan (all Ray Data, no driver loops, no driver-held key state):

1. ``map_batches(explode_keys)`` — stateless tasks (the MinHash permutation
   tables are tiny and cached once per worker process) -> KEYS_SCHEMA rows.
2. ``ops.pairing.pairs_from_keys`` — ONE groupby fuses the block census,
   singleton pruning, hot-block chunking with star bridges, and vectorized
   pair generation; a second int-bucketed groupby dedups pairs across key
   families. Truncated cross-chunk pairs are metric-counted, never silent.

Round-1's plan (census shuffle -> ``.to_pandas()`` keep-set broadcast ->
salt pass -> self-join) had a driver-serial census that capped scaling
efficiency; this plan has zero driver actions inside the stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import ERConfig
from ..functions.hashing import hash64_np
from ..functions.minhash import MinHasher, shingles_flat
from ..functions.text import content_tokens
from ..registry import blocking_key_provider, register_blocking_key
from ..ops.pairing import (
    FAM_EXACT,
    FAM_MH,
    FAM_STEM,
    KEYS_SCHEMA,
    pairs_from_keys,
    split_metric_rows,
)

_FAM_SHIFT = np.uint64(62)
_KEY_MASK = np.uint64((1 << 62) - 1)


def _tag(h: np.ndarray, fam: int) -> np.ndarray:
    """Pack the family id into the top 2 bits of a uint64 key."""
    return (np.asarray(h, dtype=np.uint64) & _KEY_MASK) | (
        np.uint64(fam) << _FAM_SHIFT
    )


_MH_CACHE: dict[tuple, MinHasher] = {}


def _hasher(cfg: ERConfig) -> MinHasher:
    """Per-process MinHasher cache: permutation tables built once per worker
    (the reference's load-state-once worker pattern,
    ``/root/reference/pipeline/llm_providers.py:65-228`` — as a plain-task
    process cache because the state is a few KB, which schedules as elastic
    tasks instead of pinning an actor pool)."""
    k = (cfg.minhash_num_perm, cfg.minhash_bands, cfg.minhash_seed)
    if k not in _MH_CACHE:
        _MH_CACHE[k] = MinHasher(*k)
    return _MH_CACHE[k]


def _keys_table(keys, fids, fam: int, shas) -> pa.Table:
    return pa.table(
        {
            "block_key": pa.array(keys, pa.uint64()),
            "file_id": pa.array(fids, pa.uint64()),
            "fam": pa.array(np.full(len(fids), fam, dtype=np.int8), pa.int8()),
            "sha": pa.array(shas, pa.uint64()),
        }
    )


@register_blocking_key("sha")
def sha_keys(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """Exact-content block: the content sha prefix IS the key (FAM_EXACT —
    downstream emits a star over the block min, any size)."""
    sha = batch.column("sha_u64").to_numpy(zero_copy_only=False).astype(np.uint64)
    fid = batch.column("file_id_u64").to_numpy(zero_copy_only=False).astype(np.uint64)
    return _keys_table(_tag(sha, FAM_EXACT), fid, FAM_EXACT, sha)


@register_blocking_key("stem")
def stem_keys(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """lang + normalized-path-stem block."""
    sha = batch.column("sha_u64").to_numpy(zero_copy_only=False).astype(np.uint64)
    fid = batch.column("file_id_u64").to_numpy(zero_copy_only=False).astype(np.uint64)
    langs = batch.column("lang_norm").to_pylist()
    stems = batch.column("stem_norm").to_pylist()
    si = np.flatnonzero(np.array([bool(s) for s in stems]))
    if not si.size:
        return KEYS_SCHEMA.empty_table()
    stem_h = hash64_np([f"{langs[i]}\x1f{stems[i]}" for i in si])
    return _keys_table(_tag(stem_h, FAM_STEM), fid[si], FAM_STEM, sha[si])


@register_blocking_key("minhash")
def minhash_keys(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """MinHash-LSH band blocks over content-token shingles.

    One flat numpy pass for the whole batch (tokenize per row — the regex is
    C — then ONE crc pass over the concatenated token stream, one global
    windowed-polynomial shingle pass, perm-chunked signature mins, batch
    band folds). Bit-identical to the per-row kernel it replaced; ~4x
    cheaper per row (the per-row numpy-call overhead was the cost)."""
    mh = _hasher(cfg)
    sha = batch.column("sha_u64").to_numpy(zero_copy_only=False).astype(np.uint64)
    fid = batch.column("file_id_u64").to_numpy(zero_copy_only=False).astype(np.uint64)
    contents = batch.column("content").to_pylist()
    n = len(contents)
    bands = mh.bands
    toks = [content_tokens(c, cap=cfg.content_token_cap) for c in contents]
    sizes = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
    flat_hashes = hash64_np([t for row in toks for t in row])
    svals, scounts = shingles_flat(flat_hashes, sizes, cfg.shingle_k)
    sigs = mh.signatures_flat(svals, scounts)
    band_keys = mh.band_keys_u64_batch(sigs).reshape(-1)
    return _keys_table(
        _tag(band_keys, FAM_MH), np.repeat(fid, bands), FAM_MH, np.repeat(sha, bands)
    )


def explode_keys_batch(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """One corpus row -> KEYS_SCHEMA rows from every configured key provider
    (``cfg.blocking_keys``; pluggable via registry.register_blocking_key)."""
    scor = batch.column("scorable").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(scor)
    if idx.size == 0:
        return KEYS_SCHEMA.empty_table()
    sub = batch.take(pa.array(idx))
    parts = [
        blocking_key_provider(name)(sub, cfg) for name in cfg.blocking_keys
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return KEYS_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def derive_block_keys(norm_ds: "ray.data.Dataset", cfg: ERConfig) -> "ray.data.Dataset":
    return norm_ds.map_batches(
        explode_keys_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def candidate_pairs(
    norm_ds: "ray.data.Dataset", cfg: ERConfig
) -> "ray.data.Dataset":
    """Full blocking stage: deduped pairs ``(id_a, id_b, block_key, fam,
    route)`` (uint64 ids; route==0 means exact-content backed) plus
    ROUTE_METRIC sentinel rows — split them off with
    ``ops.pairing.split_metric_rows`` after materializing.

    The final repartition restores scoring parallelism: the dedup groupby
    coalesces its output to a handful of blocks (measured: 4 at bench scale),
    which would cap the downstream scorer actor pool at 4 concurrent tasks.
    """
    # keys are materialized before the shuffle: the groupby is a pipeline
    # breaker regardless (Ray sort-shuffles its whole input), and fusing the
    # read+normalize+explode chain into the shuffle-map tasks measurably
    # serializes them (13-23s vs 4s at bench scale). The keys table is the
    # compact (u64,u64,i8,u64) projection — content never materializes.
    keys = derive_block_keys(norm_ds, cfg).materialize()
    pairs = pairs_from_keys(keys, cfg)
    return pairs.repartition(max(cfg.scorer_concurrency * 4, cfg.join_partitions * 2))


__all__ = [
    "FAM_EXACT",
    "FAM_STEM",
    "FAM_MH",
    "candidate_pairs",
    "derive_block_keys",
    "explode_keys_batch",
    "split_metric_rows",
]


@register_blocking_key("stem_soundex")
def stem_soundex_keys(batch: pa.Table, cfg: ERConfig) -> pa.Table:
    """Phonetic block: lang + Soundex of the normalized path stem — the
    classic ER blocking key for misspelled names ('Robert'/'Rupert' share
    R163), here over file stems. Registered but NOT in the default
    ``ERConfig.blocking_keys``; enabling it is the extension-surface demo
    (tests/test_blocking.py) — one config line adds a whole key family.
    Soundex runs once per DISTINCT stem in the batch (dictionary-encode
    + gather), not per row."""
    from ..functions.text import soundex
    from ..ops.pairing import FAM_PHON

    sha = batch.column("sha_u64").to_numpy(zero_copy_only=False).astype(
        np.uint64)
    fid = batch.column("file_id_u64").to_numpy(
        zero_copy_only=False).astype(np.uint64)
    langs = batch.column("lang_norm").to_pylist()
    stems = batch.column("stem_norm")
    if isinstance(stems, pa.ChunkedArray):
        stems = stems.combine_chunks()
    enc = stems.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    sdx = [soundex(s or "") for s in enc.dictionary.to_pylist()]
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    row_sdx = [sdx[c] for c in codes]
    si = np.flatnonzero(np.array([bool(x) for x in row_sdx]))
    if not si.size:
        return KEYS_SCHEMA.empty_table()
    key_h = hash64_np([f"{langs[i]}\x1f{row_sdx[i]}" for i in si])
    return _keys_table(_tag(key_h, FAM_PHON), fid[si], FAM_PHON, sha[si])
