"""Meta-blocking: block-graph edge weighting + weighted-edge pruning.

Redundancy-positive blocking (tokens, q-grams, MinHash bands — anything
where an entity lands in many blocks) produces a candidate-pair multiset
where TRUE matches co-occur in more blocks than random pairs. Meta-blocking
(Papadakis et al., TKDE'13 "Meta-Blocking: Taking Entity Resolution to the
Next Level") rebuilds the block collection as a weighted pair graph and
prunes low-evidence edges BEFORE any expensive pairwise comparison:

1. **Block purging** — block sizes via the bucketed census; blocks larger
   than ``max_block_size`` are dropped (oversized blocks are near-useless
   evidence and quadratic to expand — the standard purging step), as are
   singletons. The kept-block size map is size-gated: broadcast
   searchsorted when small, bucketed semi-join at scale.
2. **Edge weighting (CBS)** — one exchange colocates each surviving block;
   every block emits its C(size,2) co-occurrence rows (bounded by the
   purge threshold); a packed-key exchange counts duplicates into the
   Common-Blocks-Scheme weight w(a,b) = |blocks(a) ∩ blocks(b)|.
3. **Weighted Edge Pruning (WEP)** — keep edges with weight >= the global
   mean edge weight, computed from constant-size per-batch partials and
   compared in pure integers (w * n_edges >= sum_weights), so the DuckDB
   oracle replays the cut bit-exactly.

Scale shape: no step materializes more than the purged co-occurrence
multiset (Σ C(|b|,2) over kept blocks — the same volume any blocking run
would feed its scorer); the weight table and the mean are strictly
smaller. The hot-block quadratic is bounded by ``max_block_size``, with
purged blocks COUNTED (metric rows), never silently skipped.

Reference analog: the reference trims its candidate space with per-key
frequency gates before scoring (``/root/reference/pipeline/
link_entities.py:283-329``); WEP is the published, graph-global form of
that gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .exchange import exchange_map_groups

_C31 = np.int64(1) << 31

# kept-block size map at or below this many blocks rides the object store
# (16 B/block); above it the size attach falls back to a bucketed join
SIZE_BROADCAST_MAX = 2_000_000

_EDGE_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("w", pa.int64())]
)


def doc_token_blocks(
    docs: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "rd.Dataset":
    """(entity id, block key) rows: one block per DISTINCT token — the
    token-blocking scheme meta-blocking assumes (redundancy-positive).
    Block keys are int64 views of the uint64 token hashes."""
    from .setsim import _doc_distinct_tokens

    def explode(t: pa.Table) -> pa.Table:
        rows, hh, _n = _doc_distinct_tokens(t.column(text_col))
        did = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "eid": pa.array(did[rows]),
            "bkey": pa.array(hh.view(np.int64)),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


def doc_gram_blocks(
    docs: "rd.Dataset", ngram: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> "rd.Dataset":
    """(entity id, block key) rows: one block per DISTINCT word n-gram —
    the near-dedup gram space (``ops/dedup._word_gram_sets``: token-count-
    salted rolling hashes, short rows contribute one fallback gram), which
    is redundancy-positive with far richer co-occurrence structure than
    whole tokens. The SQL mirror of the gram identity is the near-dedup
    oracle's ``gs`` CTE."""
    from .dedup import _word_gram_sets

    def explode(t: pa.Table) -> pa.Table:
        rows, hh = _word_gram_sets(t.column(text_col), ngram)
        did = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "eid": pa.array(did[rows]),
            "bkey": pa.array(hh.view(np.int64)),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


def _cooccurrence_rows(num_buckets: int):
    """Per-partition kernel: every complete block emits its C(m,2) pairs."""

    def kern(g: pa.Table) -> pa.Table:
        bk = g.column("bkey").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, bk))
        bk_s, eid_s = bk[order], eid[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], bk_s[1:] != bk_s[:-1], [True]])
        )
        starts = bounds[:-1]
        sizes = np.diff(bounds)
        multi = sizes >= 2
        if not multi.any():
            return _EDGE_SCHEMA.empty_table()
        # segmented all-pairs expansion (the ops/pairing.py vectorized idiom)
        from .pairing import _all_pairs_idx

        a_idx, b_idx = _all_pairs_idx(starts[multi], sizes[multi])
        x, y = eid_s[a_idx], eid_s[b_idx]
        return pa.table({
            "id_a": pa.array(np.minimum(x, y)),
            "id_b": pa.array(np.maximum(x, y)),
            "w": pa.array(np.ones(x.size, np.int64)),
        })

    return kern


def _count_pairs(cooc: "rd.Dataset", num_buckets: int) -> "rd.Dataset":
    """(id_a, id_b, w=count) via a packed-key exchange (31-bit checked)."""

    def bucket_fn(t: pa.Table) -> np.ndarray:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return (a * _C31 + b) % num_buckets

    def kern(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False)
        b = g.column("id_b").to_numpy(zero_copy_only=False)
        if a.size and (max(a.max(), b.max()) >= _C31 or a.min() < 0):
            raise ValueError("entity ids must fit in 31 bits")
        key = a * _C31 + b
        vals, counts = np.unique(key, return_counts=True)
        return pa.table({
            "id_a": pa.array(vals // _C31),
            "id_b": pa.array(vals % _C31),
            "w": pa.array(counts.astype(np.int64)),
        })

    return exchange_map_groups(
        cooc, kern, None, num_buckets, _EDGE_SCHEMA.empty_table(),
        bucket_fn=bucket_fn,
    )


def metablock_wep(
    blocks: "rd.Dataset",
    id_col: str = "eid",
    key_col: str = "bkey",
    max_block_size: int = 64,
    num_buckets: int = 256,
    size_broadcast_max: int = SIZE_BROADCAST_MAX,
) -> tuple["rd.Dataset", dict]:
    """Weighted-edge-pruned candidate edges from a (entity, block) table.

    Returns ``(edges, stats)``: edges = (id_a < id_b, w) with CBS weight
    >= the global mean (integer-exact cut); stats counts purged blocks and
    their forgone co-occurrence rows (counted truncation) plus the edge
    total/sum the cut used.
    """
    edges, stats = _weighted_edges(
        blocks, id_col, key_col, max_block_size, num_buckets,
        size_broadcast_max,
    )

    # global mean from constant-size partials
    tot_w = 0
    tot_n = 0
    for b in edges.iter_batches(batch_format="pandas"):
        tot_w += int(b["w"].sum())
        tot_n += len(b)

    def cut(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(w * tot_n >= tot_w))

    if tot_n == 0:
        # materializing an all-empty dataset drops its blocks (and with
        # them the schema) — pin the edge schema explicitly
        pruned = rd.from_arrow(_EDGE_SCHEMA.empty_table())
    else:
        pruned = edges.map_batches(cut, batch_format="pyarrow")
    stats.update({"edges_total": int(tot_n), "weight_sum": int(tot_w)})
    return pruned, stats


def metablock_wnp(
    blocks: "rd.Dataset",
    id_col: str = "eid",
    key_col: str = "bkey",
    max_block_size: int = 64,
    num_buckets: int = 256,
    size_broadcast_max: int = SIZE_BROADCAST_MAX,
) -> tuple["rd.Dataset", dict]:
    """Reciprocal Weighted Node Pruning (Papadakis et al. TKDE'13): an
    edge survives iff its CBS weight clears BOTH endpoints' local mean
    (w * deg(v) >= sum_w(v) for v in {a, b}) — the node-centric,
    precision-favoring alternative to ``metablock_wep``'s global cut.
    Integer-exact, so the SQL oracle replays it bit-for-bit. Node stats
    come from one bucketed exchange over exploded endpoints; the
    (node -> deg, sum) map is size-gated broadcast with a bucketed-join
    fallback."""
    edges, stats = _weighted_edges(
        blocks, id_col, key_col, max_block_size, num_buckets,
        size_broadcast_max,
    )

    def ends_map(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b])),
            "w": pa.array(np.concatenate([w, w])),
        })

    ends = edges.map_batches(ends_map, batch_format="pyarrow")

    def node_kern(g: pa.Table) -> pa.Table:
        nd = g.column("node").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(nd, kind="stable")
        nd_s, w_s = nd[order], w[order]
        starts = np.flatnonzero(np.r_[True, nd_s[1:] != nd_s[:-1]])
        return pa.table({
            "node": pa.array(nd_s[starts]),
            "deg": pa.array(np.diff(np.r_[starts, nd_s.size]).astype(np.int64)),
            "wsum": pa.array(np.add.reduceat(w_s, starts).astype(np.int64)),
        })

    nstats_schema = pa.schema([
        ("node", pa.int64()), ("deg", pa.int64()), ("wsum", pa.int64())
    ])
    nstats = exchange_map_groups(
        ends, node_kern, "node", num_buckets, nstats_schema.empty_table()
    ).materialize()

    n_nodes = nstats.count()
    if n_nodes == 0:
        stats["nodes_total"] = 0
        return rd.from_arrow(_EDGE_SCHEMA.empty_table()), stats
    if n_nodes <= size_broadcast_max:
        ndf = nstats.to_pandas()
        order = np.argsort(ndf["node"].to_numpy())
        nd_arr = ndf["node"].to_numpy(np.int64)[order]
        deg_arr = ndf["deg"].to_numpy(np.int64)[order]
        sum_arr = ndf["wsum"].to_numpy(np.int64)[order]
        ref = ray.put((nd_arr, deg_arr, sum_arr))

        def cut(t: pa.Table) -> pa.Table:
            nd_l, deg_l, sum_l = ray.get(ref)
            a = t.column("id_a").to_numpy(zero_copy_only=False)
            b = t.column("id_b").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            pa_i = np.searchsorted(nd_l, a)
            pb_i = np.searchsorted(nd_l, b)
            keep = ((w * deg_l[pa_i] >= sum_l[pa_i])
                    & (w * deg_l[pb_i] >= sum_l[pb_i]))
            return t.filter(pa.array(keep))

        pruned = edges.map_batches(cut, batch_format="pyarrow")
    else:
        # 100-TB path: replicate node stats onto each endpoint with two
        # bucketed joins, then one vectorized filter
        from .join import bucket_join, rename_batches

        sa = rename_batches(nstats, {"node": "na", "deg": "dega",
                                     "wsum": "suma"})
        sb = rename_batches(nstats, {"node": "nb", "deg": "degb",
                                     "wsum": "sumb"})
        j1 = bucket_join(
            edges, sa, left_on="id_a", right_on="na",
            left_schema=_EDGE_SCHEMA,
            right_schema=pa.schema([("na", pa.int64()),
                                    ("dega", pa.int64()),
                                    ("suma", pa.int64())]),
        )
        j2 = bucket_join(
            j1, sb, left_on="id_b", right_on="nb",
            left_schema=pa.schema(
                list(_EDGE_SCHEMA)
                + [pa.field("na", pa.int64()), pa.field("dega", pa.int64()),
                   pa.field("suma", pa.int64())]),
            right_schema=pa.schema([("nb", pa.int64()),
                                    ("degb", pa.int64()),
                                    ("sumb", pa.int64())]),
        )

        def cut_j(t: pa.Table) -> pa.Table:
            w = t.column("w").to_numpy(zero_copy_only=False)
            keep = ((w * t.column("dega").to_numpy(zero_copy_only=False)
                     >= t.column("suma").to_numpy(zero_copy_only=False))
                    & (w * t.column("degb").to_numpy(zero_copy_only=False)
                       >= t.column("sumb").to_numpy(zero_copy_only=False)))
            return t.filter(pa.array(keep)).select(["id_a", "id_b", "w"])

        pruned = j2.map_batches(cut_j, batch_format="pyarrow")
    stats["nodes_total"] = int(n_nodes)
    return pruned, stats


def _weighted_edges(
    blocks: "rd.Dataset",
    id_col: str,
    key_col: str,
    max_block_size: int,
    num_buckets: int,
    size_broadcast_max: int,
) -> tuple["rd.Dataset", dict]:
    """Shared meta-blocking front half: block purging (counted) + CBS
    edge weights. Returns the MATERIALIZED weighted edge table and the
    purge stats."""
    from .spandedup import _bucketed_value_counts

    named = blocks
    if id_col != "eid" or key_col != "bkey":
        from .join import rename_batches

        named = rename_batches(blocks, {id_col: "eid", key_col: "bkey"})

    sizes = _bucketed_value_counts(
        named, "bkey", "bkey", "c", min_count=2, num_buckets=num_buckets
    ).materialize()

    # block purging: sizes within [2, max_block_size] survive; oversized
    # blocks are counted, not silently skipped
    purged = sizes.map_batches(
        lambda t: t.filter(pc.greater(t["c"], pa.scalar(max_block_size))),
        batch_format="pyarrow",
    )
    purged_blocks = 0
    purged_rows = 0
    purged_pairs = 0
    for b in purged.iter_batches(batch_format="pandas"):
        purged_blocks += len(b)
        purged_rows += int(b["c"].sum()) if len(b) else 0
        purged_pairs += int((b["c"] * (b["c"] - 1) // 2).sum()) if len(b) else 0
    kept = sizes.map_batches(
        lambda t: t.filter(pc.less_equal(t["c"], pa.scalar(max_block_size))),
        batch_format="pyarrow",
    ).materialize()

    n_kept = kept.count()
    if n_kept <= size_broadcast_max:
        kdf = kept.to_pandas()
        if len(kdf) == 0:
            karr = np.empty(0, np.int64)
        else:
            karr = np.sort(kdf["bkey"].to_numpy())
        ref = ray.put(karr)

        def filt(t: pa.Table) -> pa.Table:
            want = ray.get(ref)
            bk = t.column("bkey").to_numpy(zero_copy_only=False)
            if want.size:
                pos = np.clip(np.searchsorted(want, bk), 0, want.size - 1)
                hit = want[pos] == bk
            else:
                hit = np.zeros(bk.size, bool)
            return t.filter(pa.array(hit))

        surviving = named.map_batches(filt, batch_format="pyarrow")
    else:
        from .join import rename_batches
        from .spandedup import _semi_join_int

        surviving = _semi_join_int(
            named,
            rename_batches(kept.select_columns(["bkey"]), {"bkey": "bkey_k"}),
            "bkey", "bkey_k",
            pa.schema([("eid", pa.int64()), ("bkey", pa.int64())]),
            broadcast_max=size_broadcast_max,
        )

    def bk_bucket(t: pa.Table) -> np.ndarray:
        bk = t.column("bkey").to_numpy(zero_copy_only=False)
        return (bk.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)

    cooc = exchange_map_groups(
        surviving, _cooccurrence_rows(num_buckets), None, num_buckets,
        _EDGE_SCHEMA.empty_table(), bucket_fn=bk_bucket,
    )
    edges = _count_pairs(cooc, num_buckets).materialize()
    stats = {
        "purged_blocks": int(purged_blocks),
        "purged_block_rows": int(purged_rows),
        "purged_cooccurrence_pairs": int(purged_pairs),
    }
    return edges, stats
