"""Per-source vocabulary-drift diagnostics: KL(source ‖ corpus).

The mixture-curation signal: when one source's unigram distribution drifts
from the corpus (boilerplate floods, language shift, scraper breakage), its
KL divergence spikes — the standard monitoring statistic for corpus
composition (and the quantity CCNet-style pipelines threshold on when a
shard "doesn't look like" the reference distribution).

KL(P_s ‖ Q) = Σ_t P_s(t) · ln(P_s(t) / Q(t)) with P_s(t) = c_st / N_s and
Q(t) = c_t / N over the corpus unigram census. Every term's inputs are
exact int64 counts, and each term is quantized to micro-units
``floor(1e6 · (c_st/N_s) · ln((c_st·N)/(c_t·N_s)) + 0.5)`` BEFORE the
per-source sum — the bm25/bigram-LM contract: both engines evaluate the
identical IEEE-double expression tree on identical ints, so the int64 sums
value-hash exactly.

One exchange does all the joining: (source, token, c_st) partials bucket by
TOKEN hash, so each bucket kernel sees every source's rows for its tokens
and attaches the token total c_t locally — no second shuffle, no token-level
join. N_s / N are a constant-size side census (one tiny aggregate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import hash64_np
from .wordcount import _flat_tokens


def source_kl(
    ds: "rd.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """(source, n_tokens, kl_u) per source — kl_u in exact micro-units."""

    def partial(t: pa.Table) -> pa.Table:
        flat, lengths = _flat_tokens(t.column(text_col))
        if len(flat) == 0:
            return pa.table({
                group_col: pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
                "__bkt": pa.array([], pa.int32()),
            })
        src = t.column(group_col).to_numpy(zero_copy_only=False)
        row_src = np.repeat(src, lengths)
        # (source, token) counts inside the batch: dictionary-encode both,
        # pack the code pair, one np.unique
        enc_t = pc.dictionary_encode(flat)
        if isinstance(enc_t, pa.ChunkedArray):
            enc_t = enc_t.combine_chunks()
        tcodes = enc_t.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        svals, scodes = np.unique(row_src, return_inverse=True)
        key = tcodes * np.int64(len(svals)) + scodes
        vals, counts = np.unique(key, return_counts=True)
        vt = (vals // len(svals)).astype(np.int64)
        vs = vals % len(svals)
        toks = enc_t.dictionary.take(pa.array(vt))
        bkt = (hash64_np(toks.to_pylist()) % np.uint64(num_buckets)).astype(
            np.int32)
        return pa.table({
            group_col: pa.array(svals[vs]),
            "token": toks,
            "c": pa.array(counts.astype(np.int64)),
            "__bkt": pa.array(bkt),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)

    # constant-size totals: rows per source (token counts), corpus total
    def tot_partial(t: pa.Table) -> pa.Table:
        src = t.column(group_col).to_numpy(zero_copy_only=False)
        _, lengths = _flat_tokens(t.column(text_col))
        vals, inv = np.unique(src, return_inverse=True)
        s = np.zeros(len(vals), dtype=np.int64)
        np.add.at(s, inv, lengths.astype(np.int64))
        return pa.table({group_col: pa.array(vals),
                         "n_tokens": pa.array(s)})

    from ray.data.aggregate import Sum

    totals = (ds.map_batches(tot_partial, batch_format="pyarrow",
                             batch_size=8192)
              .groupby(group_col)
              .aggregate(Sum("n_tokens", alias_name="n_tokens"))
              .to_pandas())
    n_s = dict(zip(totals[group_col], totals["n_tokens"]))
    n_total = int(totals["n_tokens"].sum())

    import ray

    ns_ref = ray.put(n_s)

    def kern(g: pa.Table) -> pa.Table:
        ns = ray.get(ns_ref)
        enc = pc.dictionary_encode(g.column("token"))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        tcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        src = g.column(group_col).to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        # combine duplicate (source, token) partials, then token totals —
        # the bucket holds EVERY source's rows for its tokens, so c_t is
        # complete locally
        svals, scodes = np.unique(src, return_inverse=True)
        key = tcodes * np.int64(len(svals)) + scodes
        vals, inv = np.unique(key, return_inverse=True)
        cst = np.zeros(len(vals), dtype=np.int64)
        np.add.at(cst, inv, c)
        vt = (vals // len(svals)).astype(np.int64)
        vs = vals % len(svals)
        ct = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(ct, vt, cst)
        nsv = np.array([ns[s] for s in svals], dtype=np.int64)[vs]
        # identical IEEE-double expression tree as the SQL oracle
        term = (cst.astype(np.float64) / nsv.astype(np.float64)) * np.log(
            (cst.astype(np.float64) * float(n_total))
            / (ct[vt].astype(np.float64) * nsv.astype(np.float64)))
        u = np.floor(term * 1e6 + 0.5).astype(np.int64)
        out_s = np.zeros(len(svals), dtype=np.int64)
        np.add.at(out_s, vs, u)
        return pa.table({group_col: pa.array(svals),
                         "kl_u": pa.array(out_s)})

    per_bucket = parts.groupby("__bkt").map_groups(kern,
                                                   batch_format="pyarrow")
    agg = (per_bucket.groupby(group_col)
           .aggregate(Sum("kl_u", alias_name="kl_u")))

    def finish(t: pa.Table) -> pa.Table:
        src = t.column(group_col).to_numpy(zero_copy_only=False)
        nt = np.array([n_s[s] for s in src], dtype=np.int64)
        return pa.table({group_col: t.column(group_col),
                         "n_tokens": pa.array(nt),
                         "kl_u": t.column("kl_u")})

    return agg.map_batches(finish, batch_format="pyarrow").sort(group_col)


def source_overlap(
    ds: "rd.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """(source_a, source_b, n_shared): for every source pair, how many
    DISTINCT contents appear in both — the cross-source contamination
    matrix (mirror sites, scraper overlap, re-crawls) a mixture curator
    reads before weighting sources.

    One content-hash-bucketed exchange: each bucket kernel sees every
    source's rows for its hashes, dedups (hash, source), and expands each
    hash's source set into pairs with the same segmented-numpy algebra as
    the triangle wedge kernel — pair counts pre-aggregate per bucket, so
    the final groupby moves at most buckets x |sources|^2 rows. Content
    identity is a 64-bit text hash (collision ~2^-64); the DuckDB oracle
    compares on full STRINGS, guarding collisions at test scale."""
    from ..functions.hashing import hash64_np

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        if not texts:
            return pa.table({"sha": pa.array([], pa.int64()),
                             group_col: pa.array([], pa.string()),
                             "__bkt": pa.array([], pa.int32())})
        h = hash64_np(texts).view(np.int64)
        src = t.column(group_col).to_numpy(zero_copy_only=False)
        svals, scodes = np.unique(src, return_inverse=True)
        # lexsort dedup of (hash, source) — NOT hash*n+code packing, which
        # overflows int64 for full-range hashes and the wrap scrambles
        # key % n (the source code)
        order = np.lexsort((scodes, h))
        hh, ss = h[order], scodes[order]
        keep = np.r_[True, (hh[1:] != hh[:-1]) | (ss[1:] != ss[:-1])]
        hh, ss = hh[keep], ss[keep]
        return pa.table({
            "sha": pa.array(hh),
            group_col: pa.array(svals[ss]),
            "__bkt": pa.array(
                (hh % num_buckets).astype(np.int32)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)

    def kern(g: pa.Table) -> pa.Table:
        sha = g.column("sha").to_numpy(zero_copy_only=False)
        src = g.column(group_col).to_numpy(zero_copy_only=False)
        svals, scodes = np.unique(src, return_inverse=True)
        # same lexsort dedup as the partial (overflow-safe)
        order = np.lexsort((scodes, sha))
        vh, vs = sha[order], scodes[order].astype(np.int64)
        keep = np.r_[True, (vh[1:] != vh[:-1]) | (vs[1:] != vs[:-1])]
        vh, vs = vh[keep], vs[keep]
        # per-sha segments over (sha, source-code) sorted rows: all pairs
        starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
        counts = np.diff(np.r_[starts, len(vh)])
        idx = np.arange(len(vh), dtype=np.int64) - np.repeat(starts, counts)
        total = int(idx.sum())
        if total == 0:
            return pa.table({"source_a": pa.array([], pa.string()),
                             "source_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        seg_start = np.repeat(starts, counts)
        offs = np.cumsum(idx) - idx
        first_idx = (np.repeat(seg_start, idx)
                     + (np.arange(total, dtype=np.int64)
                        - np.repeat(offs, idx)))
        a = vs[first_idx]            # earlier source code (codes sorted
        b = np.repeat(vs, idx)       # within a sha segment), so a < b
        pk = a * np.int64(len(svals)) + b
        pv, pc_ = np.unique(pk, return_counts=True)
        return pa.table({
            "source_a": pa.array(svals[pv // len(svals)]),
            "source_b": pa.array(svals[pv % len(svals)]),
            "n": pa.array(pc_.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    return (parts.groupby("__bkt").map_groups(kern, batch_format="pyarrow")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("n", alias_name="n_shared"))
            .sort(["source_a", "source_b"]))
