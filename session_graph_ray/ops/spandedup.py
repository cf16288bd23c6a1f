"""Duplicate n-gram span detection (exact substring dedup).

Public-method pedigree: "Deduplicating Training Data Makes Language Models
Better" (Lee et al., 2022, arXiv:2107.06499) — find exact token spans that
recur across a corpus and score each document by the fraction of its spans
that are duplicated somewhere else (including elsewhere in the same doc).

Ray-Data plan (two bounded shuffles, one bucketed semi-join):
  1. one ``map_batches`` explodes each doc into (gram_hash, doc_id) rows —
     every token is hashed ONCE via dictionary-encode, window hashes are an
     n-term vectorized polynomial combine (no per-window Python);
  2. census: ``groupby(gram_hash).count()`` filtered to count >= min_count —
     output is one row per duplicated gram, shuffle ships 8-byte ints;
  3. occurrences semi-join the census (bucketed int join) and reduce to
     per-doc duplicate-gram counts, re-joined with per-doc totals.

The gram identity is a 64-bit polynomial hash (carried as int64 — the
join/shuffle layer is int64-native) of the token hashes: a hash
collision (~2^-64 per gram pair) could mark a unique gram duplicated; the
DuckDB oracle compares on gram STRINGS, so the check also guards collision
behavior at test scale. No stage is O(n^2): a hot gram (boilerplate in
millions of docs) contributes one census row and its occurrence rows pass
through the join once each.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.hashing import hash64_np
from ..functions.minhash import mix64 as _splitmix64
from .wordcount import _flat_tokens

_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for the window combine


def _explode_grams(n: int, id_col: str, text_col: str):
    def f(t: pa.Table) -> pa.Table:
        flat, lengths = _flat_tokens(t.column(text_col))
        doc_ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table(
                {
                    "gram_h": pa.array([], pa.int64()),
                    "g_doc_id": pa.array([], pa.int64()),
                }
            )
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_hash = _splitmix64(hash64_np(enc.dictionary.to_pylist()))
        th = dict_hash[codes]  # one uint64 per token slot
        total = len(th)
        if total < n:
            return pa.table(
                {
                    "gram_h": pa.array([], pa.int64()),
                    "g_doc_id": pa.array([], pa.int64()),
                }
            )
        row_ids = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        # polynomial window hash over flat positions, then mask windows that
        # cross a document boundary
        m = total - n + 1
        h = np.zeros(m, dtype=np.uint64)
        mult = np.uint64(1)
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
            for k in range(n):
                h += th[k : k + m] * mult
                mult *= _P
        valid = row_ids[:m] == row_ids[n - 1 :]
        return pa.table(
            {
                "gram_h": pa.array(_splitmix64(h[valid]).view(np.int64)),
                "g_doc_id": pa.array(doc_ids[row_ids[:m][valid]], pa.int64()),
            }
        )

    return f


def duplicate_span_stats(
    ds: "rd.Dataset",
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Per-doc span-dup stats: n_grams, n_dup_grams, dup_frac_permille.

    A gram is "duplicated" when its total occurrence count in the corpus is
    >= min_count. Docs shorter than n tokens report n_grams = 0. The ratio
    is integer permille (floor) — the repo's exact-hash output contract.
    """
    grams = ds.map_batches(
        _explode_grams(n, id_col, text_col),
        batch_format="pyarrow", batch_size=4096,
    )

    census = grams.groupby("gram_h").aggregate(Count(alias_name="n_occ"))
    dup_keys = census.map_batches(
        lambda t: pa.table(
            {"dup_h": t.filter(
                pc.greater_equal(t["n_occ"], pa.scalar(min_count))
            )["gram_h"]}
        ),
        batch_format="pyarrow",
    )

    from .join import bucket_join

    dup_occ = bucket_join(
        grams, dup_keys, left_on="gram_h", right_on="dup_h",
        left_schema=pa.schema([("gram_h", pa.int64()),
                               ("g_doc_id", pa.int64())]),
        right_schema=pa.schema([("dup_h", pa.int64())]),
    )
    per_doc_dup = dup_occ.groupby("g_doc_id").aggregate(
        Count(alias_name="n_dup_grams")
    )

    def totals(t: pa.Table) -> pa.Table:
        _, lengths = _flat_tokens(t.column(text_col))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_grams": pa.array(np.maximum(lengths - (n - 1), 0)),
            }
        )

    tot = ds.map_batches(totals, batch_format="pyarrow", batch_size=8192)
    joined = bucket_join(
        tot, per_doc_dup, left_on=id_col, right_on="g_doc_id", how="left",
        left_schema=pa.schema([(id_col, pa.int64()), ("n_grams", pa.int64())]),
        right_schema=pa.schema([("g_doc_id", pa.int64()),
                                ("n_dup_grams", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        nd = pc.fill_null(t["n_dup_grams"], 0)
        ng = t["n_grams"].to_numpy(zero_copy_only=False)
        ndv = pc.cast(nd, pa.int64()).to_numpy(zero_copy_only=False)
        frac = np.zeros(len(ng), dtype=np.int64)
        nz = ng > 0
        frac[nz] = (1000 * ndv[nz]) // ng[nz]
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": t["n_grams"],
                "n_dup_grams": pc.cast(nd, pa.int64()),
                "dup_frac_permille": pa.array(frac),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def contamination_stats(
    train: "rd.Dataset",
    test: "rd.Dataset",
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Benchmark-contamination check: for every *test* doc, the number and
    fraction of its n-gram spans that appear anywhere in the *train* corpus
    (the train/test n-gram-overlap decontamination rule used by GPT-3 /
    PaLM-style data curation).

    Plan: explode both sides to (gram_hash, doc_id); distinct train grams
    (one census groupby — ships 8-byte ints); bucketed int semi-join of test
    occurrences against train grams; per-test-doc counts re-joined with
    totals. Same bounded-shuffle profile as ``duplicate_span_stats``.

    Output: (doc_id, n_grams, n_hit_grams, hit_frac_permille) per test doc.
    """
    from .join import bucket_join

    tr_grams = train.map_batches(
        _explode_grams(n, id_col, text_col),
        batch_format="pyarrow", batch_size=4096,
    )
    train_keys = tr_grams.groupby("gram_h").aggregate(
        Count(alias_name="n_occ")
    ).map_batches(
        lambda t: pa.table({"tr_h": t["gram_h"]}), batch_format="pyarrow"
    )

    te_grams = test.map_batches(
        _explode_grams(n, id_col, text_col),
        batch_format="pyarrow", batch_size=4096,
    )
    hits = bucket_join(
        te_grams, train_keys, left_on="gram_h", right_on="tr_h",
        left_schema=pa.schema([("gram_h", pa.int64()),
                               ("g_doc_id", pa.int64())]),
        right_schema=pa.schema([("tr_h", pa.int64())]),
    )
    per_doc_hit = hits.groupby("g_doc_id").aggregate(
        Count(alias_name="n_hit_grams")
    )

    def totals(t: pa.Table) -> pa.Table:
        _, lengths = _flat_tokens(t.column(text_col))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_grams": pa.array(np.maximum(lengths - (n - 1), 0)),
            }
        )

    tot = test.map_batches(totals, batch_format="pyarrow", batch_size=8192)
    joined = bucket_join(
        tot, per_doc_hit, left_on=id_col, right_on="g_doc_id", how="left",
        left_schema=pa.schema([(id_col, pa.int64()), ("n_grams", pa.int64())]),
        right_schema=pa.schema([("g_doc_id", pa.int64()),
                                ("n_hit_grams", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        nh = pc.cast(pc.fill_null(t["n_hit_grams"], 0), pa.int64())
        ng = t["n_grams"].to_numpy(zero_copy_only=False)
        nhv = nh.to_numpy(zero_copy_only=False)
        frac = np.zeros(len(ng), dtype=np.int64)
        nz = ng > 0
        frac[nz] = (1000 * nhv[nz]) // ng[nz]
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": t["n_grams"],
                "n_hit_grams": nh,
                "hit_frac_permille": pa.array(frac),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
