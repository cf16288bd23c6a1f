"""Sequence packing: assign documents to fixed-token-budget training bins.

The standard LLM-pretraining batch-construction step (e.g. T5 / GPT "example
packing"): greedily pack documents into bins of at most ``max_tokens`` tokens
so padding waste is low. Global optimal packing is inherently sequential, so
the scale path is the same one production pipelines use: hash-shard the
corpus, pack WITHIN shards independently (first-fit-decreasing per shard),
and namespace bin ids by shard — embarrassingly parallel, deterministic, and
within ~11/9 of optimal fill per shard (FFD bound).

Determinism contract: shard = doc_id % n_shards (key-pure — stable across
runs, shardings and cluster sizes); within a shard docs pack in
(-n_tokens, doc_id) order. Oversized docs (> max_tokens alone) get a
dedicated bin and ``oversize = true`` — never silently dropped or split.

Output: one row per doc: (doc_id, n_tokens, pack_id, oversize). pack_id =
shard * 2^32 + local bin index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .wordcount import _flat_tokens


def pack_sequences(
    ds: "rd.Dataset",
    max_tokens: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """First-fit-decreasing packing within doc_id-hash shards."""

    def sizes(t: pa.Table) -> pa.Table:
        _, lengths = _flat_tokens(t.column(text_col))
        did = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(lengths),
                "shard": pa.array((did % n_shards).astype(np.int64)),
            }
        )

    sized = ds.map_batches(sizes, batch_format="pyarrow", batch_size=8192)

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.int64)
        toks = g["n_tokens"].to_numpy().astype(np.int64)
        shard = int(g["shard"].iloc[0])
        order = np.lexsort((ids, -toks))  # FFD: big first, ties by id
        ids_s, toks_s = ids[order], toks[order]
        bins_free: list[int] = []  # free capacity per open bin
        assign = np.empty(len(ids_s), dtype=np.int64)
        oversize = np.zeros(len(ids_s), dtype=bool)
        for i, tk in enumerate(toks_s.tolist()):
            if tk > max_tokens:
                assign[i] = len(bins_free)
                bins_free.append(0)
                oversize[i] = True
                continue
            # first fit: linear probe over open bins. FFD opens few bins
            # and fills early ones fast, so the scan is short in practice.
            for b, free in enumerate(bins_free):
                if free >= tk:
                    assign[i] = b
                    bins_free[b] = free - tk
                    break
            else:
                assign[i] = len(bins_free)
                bins_free.append(max_tokens - tk)
        base = np.int64(shard) << np.int64(32)
        return pd.DataFrame(
            {
                id_col: ids_s,
                "n_tokens": toks_s,
                "pack_id": base + assign,
                "oversize": oversize,
            }
        )

    return sized.groupby("shard").map_groups(pack_shard)


def packing_stats(
    packed: "rd.Dataset", max_tokens: int
) -> "rd.Dataset":
    """Per-bin fill stats: (pack_id, n_docs, sum_tokens, fill_permille)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    per_bin = packed.groupby("pack_id").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="sum_tokens")
    )

    def fill(t: pa.Table) -> pa.Table:
        f = pc.cast(
            pc.floor(pc.divide(pc.multiply(t["sum_tokens"], 1000.0),
                               float(max_tokens))),
            pa.int64(),
        )
        return t.append_column("fill_permille", f)

    return per_bin.map_batches(fill, batch_format="pyarrow")
