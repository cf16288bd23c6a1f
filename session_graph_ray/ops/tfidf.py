"""TF-IDF-weighted cosine candidate generation — the classic similarity
blocking family (PPJoin / set-similarity-join literature; the Magellan /
dedupe toolkits' default blocker): pairs of documents whose idf-weighted
token-set cosine clears a threshold, discovered through their RARE tokens.

Semantics (deterministic, value-hash-oracled):

- tokens: the shared text-dedup tokenizer (lowercase, ``[^\\pL\\pN_]+``
  split, empties dropped — ops/dedup.py), hashed with hash64 (two crc32
  halves) and DEDUPED per doc (set semantics; hash collisions merge tokens
  identically on both engine and oracle sides);
- weights: smooth idf ``ln((1 + N) / (1 + df)) + 1`` QUANTIZED to integer
  micro-units. Quantization makes every dot product and norm an exact
  integer, so no float SUM order exists anywhere — the oracle reproduces
  cosines bit-for-bit (the only float ops are two libm sqrts and two
  divisions in a pinned order);
- candidates: pairs sharing >= 1 rare token (2 <= df <= df_cap). This IS
  the blocking semantic — a pair sharing only df > df_cap tokens is not a
  candidate (the standard prefix-filter trade; at web scale a common-token
  join is quadratic in the hottest posting list);
- score: full cosine over ALL shared tokens of each candidate pair
  (common tokens included), emitted at >= threshold.

Distributed shape — bounded exchanges end to end, no driver rows:
df census (bucketed np.unique), weight/norm derivation, rare-token pair
generation (per-token C(df,2) <= C(df_cap,2)), pair dedup, one
membership exchange by token bucket for the exact integer numerators,
and compact int joins for the norms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash64_np
from ..functions.minhash import _ranges_concat
from .exchange import exchange_map_groups
from .spandedup import _bucketed_value_counts

_B = 256
_PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)


def _doc_tokens(docs: "ray.data.Dataset", id_col: str, text_col: str
                ) -> "ray.data.Dataset":
    """Exploded DISTINCT (id, h64) token rows (the ops/dedup tokenizer)."""
    from .dedup import _NONWORD_SPLIT

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size and (ids.min() < 0 or ids.max() >= 1 << 32):
            raise ValueError("tfidf ids must be in [0, 2^32)")
        low = pc.utf8_lower(pc.fill_null(
            pc.cast(t.column(text_col), pa.large_string()), ""))
        lists = pc.split_pattern_regex(low, _NONWORD_SPLIT)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(len(ids), dtype=np.int64), lengths)
        keep = pc.not_equal(flat, pa.scalar("", pa.large_string())).to_numpy(
            zero_copy_only=False)
        flat, rows = flat.filter(pa.array(keep)), rows[keep]
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        h_dict = hash64_np([s if s is not None else ""
                            for s in enc.dictionary.to_pylist()])
        h = h_dict[enc.indices.to_numpy(zero_copy_only=False)] if len(enc) \
            else np.empty(0, np.uint64)
        # per-(doc, token) dedup: sort composite then run-first
        order = np.lexsort((h, ids[rows]))
        di, dh = ids[rows][order], h[order]
        first = np.r_[True, (di[1:] != di[:-1]) | (dh[1:] != dh[:-1])]
        return pa.table({
            "id": pa.array(di[first], pa.int64()),
            "h64": pa.array(dh[first], pa.uint64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


def tfidf_cosine_pairs(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int = 20,
    threshold: float = 0.3,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
) -> "ray.data.Dataset":
    """(id_a, id_b, cos_u6): candidate pairs sharing a rare token, scored
    by exact quantized-idf cosine, kept at cosine >= threshold."""
    n_docs = docs.count()
    tok = _doc_tokens(docs, id_col, text_col).materialize()

    # --- df census + quantized idf weight per token --------------------
    df = _bucketed_value_counts(tok, "h64", out_val="h64", out_cnt="df")

    def weight(t: pa.Table) -> pa.Table:
        d = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((1.0 + float(n_docs)) / (1.0 + d)) + 1.0
        wq = np.floor(idf * 1000000 + 0.5).astype(np.int64)
        return pa.table({
            "h64": t.column("h64"),
            "df": t.column("df"),
            "wq": pa.array(wq, pa.int64()),
        })

    wtab = df.map_batches(weight, batch_format="pyarrow").materialize()

    # --- tag every (doc, token) row with its weight: one exchange by
    # token bucket over the tagged union (complete buckets => local join)
    tok_tagged = tok.map_batches(
        lambda t: pa.table({
            "id": t.column("id"), "h64": t.column("h64"),
            "wq": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8())}),
        batch_format="pyarrow")
    w_tagged = wtab.map_batches(
        lambda t: pa.table({
            "id": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "h64": t.column("h64"), "wq": t.column("wq"),
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8())}),
        batch_format="pyarrow")
    merged_in = tok_tagged.union(w_tagged)
    tw_schema = pa.table({
        "id": pa.array([], pa.int64()), "h64": pa.array([], pa.uint64()),
        "wq": pa.array([], pa.int64())}).schema.empty_table()

    def join_w(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        h = g.column("h64").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        wq = g.column("wq").to_numpy(zero_copy_only=False)
        wm = side == 1
        wh = h[wm]
        worder = np.argsort(wh, kind="stable")
        wh, wv = wh[worder], wq[wm][worder]
        tm = ~wm
        th, ti = h[tm], ids[tm]
        pos = np.searchsorted(wh, th)
        pos_c = np.minimum(pos, max(wh.size - 1, 0))
        ok = (pos < wh.size) & (wh[pos_c] == th) if wh.size else \
            np.zeros(th.size, bool)
        return pa.table({
            "id": pa.array(ti[ok], pa.int64()),
            "h64": pa.array(th[ok], pa.uint64()),
            "wq": pa.array(wv[pos_c[ok]], pa.int64()),
        })

    def h_bucket(t: pa.Table) -> np.ndarray:
        return (t.column("h64").to_numpy(zero_copy_only=False)
                % np.uint64(_B)).astype(np.int64)

    tokw = exchange_map_groups(
        merged_in, join_w, None, _B, tw_schema, bucket_fn=h_bucket
    ).materialize()

    # --- per-doc squared norms (exact integers) -------------------------
    nrm_schema = pa.schema([("id", pa.int64()), ("nsq", pa.int64())])

    def norm_partial(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        wq = t.column("wq").to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return nrm_schema.empty_table()
        order = np.argsort(ids, kind="stable")
        ids, wq = ids[order], wq[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        sq = np.add.reduceat(wq * wq, starts) if ids.size else \
            np.empty(0, np.int64)
        return pa.table({"id": pa.array(ids[starts], pa.int64()),
                         "nsq": pa.array(sq, pa.int64())})

    def id_bucket(t: pa.Table) -> np.ndarray:
        return (t.column("id").to_numpy(zero_copy_only=False) % _B).astype(
            np.int64)

    def norm_final(g: pa.Table) -> pa.Table:
        ids = g.column("id").to_numpy(zero_copy_only=False)
        v = g.column("nsq").to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return nrm_schema.empty_table()
        order = np.argsort(ids, kind="stable")
        ids, v = ids[order], v[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        return pa.table({
            "id": pa.array(ids[starts], pa.int64()),
            "nsq": pa.array(np.add.reduceat(v, starts), pa.int64()),
        })

    norms = exchange_map_groups(
        tokw.map_batches(norm_partial, batch_format="pyarrow"),
        norm_final, None, _B, nrm_schema.empty_table(), bucket_fn=id_bucket,
    ).materialize()

    # --- candidate pairs from rare tokens (2 <= df <= df_cap) -----------
    rare_ids = wtab.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["df"], pa.scalar(2)),
                    pc.less_equal(t["df"], pa.scalar(df_cap)))
        ).select(["h64"]),
        batch_format="pyarrow")
    rare_tagged = rare_ids.map_batches(
        lambda t: pa.table({
            "id": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "h64": t.column("h64"),
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8())}),
        batch_format="pyarrow")
    tok_for_pairs = tok.map_batches(
        lambda t: t.append_column(
            "side", pa.array(np.zeros(t.num_rows, np.int8), pa.int8())),
        batch_format="pyarrow")
    pair_schema = pa.table({
        id_a: pa.array([], pa.int64()),
        id_b: pa.array([], pa.int64())}).schema.empty_table()

    def gen_pairs(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        h = g.column("h64").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        rare = np.unique(h[side == 1])
        tm = side == 0
        th, ti = h[tm], ids[tm]
        keep = rare[np.minimum(np.searchsorted(rare, th),
                               max(rare.size - 1, 0))] == th \
            if rare.size else np.zeros(th.size, bool)
        th, ti = th[keep], ti[keep]
        if th.size == 0:
            return pair_schema
        order = np.lexsort((ti, th))
        th, ti = th[order], ti[order]
        starts = np.flatnonzero(np.r_[True, th[1:] != th[:-1]])
        sizes = np.diff(np.r_[starts, th.size])
        from .pairing import _all_pairs_idx

        ai, bi = _all_pairs_idx(starts, sizes)
        return pa.table({id_a: pa.array(ti[ai], pa.int64()),
                         id_b: pa.array(ti[bi], pa.int64())})

    raw_pairs = exchange_map_groups(
        tok_for_pairs.union(rare_tagged), gen_pairs, None, _B,
        pair_schema, bucket_fn=h_bucket,
    )

    def pair_bucket(t: pa.Table) -> np.ndarray:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (((a * _PAIR_MIX) ^ b) % np.uint64(_B)).astype(np.int64)

    def pair_dedup(g: pa.Table) -> pa.Table:
        a = g.column(id_a).to_numpy(zero_copy_only=False)
        b = g.column(id_b).to_numpy(zero_copy_only=False)
        if a.size == 0:
            return pair_schema
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({id_a: pa.array(a[first], pa.int64()),
                         id_b: pa.array(b[first], pa.int64())})

    cand = exchange_map_groups(
        raw_pairs, pair_dedup, None, _B, pair_schema, bucket_fn=pair_bucket,
    ).materialize()

    # --- exact integer numerators: one membership exchange by token -----
    # P rows: (a, b, h64, wq2) for every token of a; T rows: (id, h64).
    # A token contributes wq^2 iff b also holds it (complete h64 buckets).
    from .join import bucket_join

    pj_schema = pa.schema([(id_a, pa.int64()), (id_b, pa.int64())])
    tw2 = tokw.map_batches(
        lambda t: pa.table({
            "jid": t.column("id"), "h64": t.column("h64"),
            "wq": t.column("wq")}),
        batch_format="pyarrow")
    ptok = bucket_join(
        cand, tw2, left_on=id_a, right_on="jid",
        num_buckets=_B,
        left_schema=pj_schema,
        right_schema=pa.schema([("jid", pa.int64()), ("h64", pa.uint64()),
                                ("wq", pa.int64())]),
    )
    p_tagged = ptok.map_batches(
        lambda t: pa.table({
            "oa": t.column(id_a), "ob": t.column(id_b),
            "h64": t.column("h64"), "wq": t.column("wq"),
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8())}),
        batch_format="pyarrow")
    t_tagged = tok.map_batches(
        lambda t: pa.table({
            "oa": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "ob": t.column("id"), "h64": t.column("h64"),
            "wq": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8())}),
        batch_format="pyarrow")
    num_schema = pa.table({
        id_a: pa.array([], pa.int64()), id_b: pa.array([], pa.int64()),
        "num": pa.array([], pa.int64())}).schema.empty_table()

    def numerate(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        h = g.column("h64").to_numpy(zero_copy_only=False)
        oa = g.column("oa").to_numpy(zero_copy_only=False)
        ob = g.column("ob").to_numpy(zero_copy_only=False)
        wq = g.column("wq").to_numpy(zero_copy_only=False)
        tm = side == 1
        # membership key (h64 mixed down, holder id) — exact match needs
        # both columns: dictionary-encode h64 within the bucket union
        uh, inv = np.unique(h, return_inverse=True)
        tkey = (inv[tm].astype(np.uint64) << np.uint64(32)) | \
            ob[tm].astype(np.uint64)
        tkey = np.sort(tkey)
        pm = ~tm
        pkey = (inv[pm].astype(np.uint64) << np.uint64(32)) | \
            ob[pm].astype(np.uint64)
        pos = np.searchsorted(tkey, pkey)
        pos_c = np.minimum(pos, max(tkey.size - 1, 0))
        hit = (pos < tkey.size) & (tkey[pos_c] == pkey) if tkey.size else \
            np.zeros(pkey.size, bool)
        a, b, w = oa[pm][hit], ob[pm][hit], wq[pm][hit]
        if a.size == 0:
            return num_schema
        order = np.lexsort((b, a))
        a, b, w = a[order], b[order], w[order]
        starts = np.flatnonzero(
            np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        num = np.add.reduceat(w * w, starts) if a.size else \
            np.empty(0, np.int64)
        return pa.table({
            id_a: pa.array(a[starts], pa.int64()),
            id_b: pa.array(b[starts], pa.int64()),
            "num": pa.array(num, pa.int64()),
        })

    num_parts = exchange_map_groups(
        p_tagged.union(t_tagged), numerate, None, _B, num_schema,
        bucket_fn=h_bucket,
    )

    def num_final(g: pa.Table) -> pa.Table:
        a = g.column(id_a).to_numpy(zero_copy_only=False)
        b = g.column(id_b).to_numpy(zero_copy_only=False)
        v = g.column("num").to_numpy(zero_copy_only=False)
        if a.size == 0:
            return num_schema
        order = np.lexsort((b, a))
        a, b, v = a[order], b[order], v[order]
        starts = np.flatnonzero(
            np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return pa.table({
            id_a: pa.array(a[starts], pa.int64()),
            id_b: pa.array(b[starts], pa.int64()),
            "num": pa.array(np.add.reduceat(v, starts), pa.int64()),
        })

    nums = exchange_map_groups(
        num_parts, num_final, None, _B, num_schema, bucket_fn=pair_bucket,
    )

    # --- norms in, cosine out -------------------------------------------
    na = norms.map_batches(
        lambda t: pa.table({"ida": t.column("id"), "nsqa": t.column("nsq")}),
        batch_format="pyarrow")
    nb = norms.map_batches(
        lambda t: pa.table({"idb": t.column("id"), "nsqb": t.column("nsq")}),
        batch_format="pyarrow")
    nschema = pa.schema([(id_a, pa.int64()), (id_b, pa.int64()),
                         ("num", pa.int64())])
    joined = bucket_join(
        bucket_join(nums, na, left_on=id_a, right_on="ida",
                    num_buckets=_B, left_schema=nschema,
                    right_schema=pa.schema([("ida", pa.int64()),
                                            ("nsqa", pa.int64())])),
        nb, left_on=id_b, right_on="idb",
        num_buckets=_B,
        left_schema=pa.schema(list(nschema)
                              + [("ida", pa.int64()), ("nsqa", pa.int64())]),
        right_schema=pa.schema([("idb", pa.int64()), ("nsqb", pa.int64())]),
    )

    thr = float(threshold)

    def score(t: pa.Table) -> pa.Table:
        num = t.column("num").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nsa = t.column("nsqa").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nsb = t.column("nsqb").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cos = num / np.sqrt(nsa) / np.sqrt(nsb)
        keep = cos >= thr
        return pa.table({
            id_a: t.column(id_a).filter(pa.array(keep)),
            id_b: t.column(id_b).filter(pa.array(keep)),
            "cos_u6": pa.array(
                np.floor(cos[keep] * 1e6 + 0.5).astype(np.int64), pa.int64()),
        })

    return joined.map_batches(score, batch_format="pyarrow")


__all__ = ["tfidf_cosine_pairs"]
