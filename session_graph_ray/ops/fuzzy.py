"""Fuzzy string matching: edit-distance-1 pair discovery at vocabulary
scale (FastSS deletion neighborhoods — Bocek et al. 2007).

The typo/spelling-variant clustering step of entity normalization: two
strings are within edit distance 1 iff their 0-or-1-deletion neighborhoods
intersect (delete-at-i of both sides meets substitutions; the shorter
string itself meets insertions/deletions), so candidate generation is an
EXACT blocking scheme — no recall loss — with |s|+1 keys per string
instead of an O(n^2) comparison space. The Ray plan is the house pairing
discipline: explode neighborhoods, ONE bucketed exchange on the variant
hash, per-bucket pair expansion (deduped on the pair key), then a fully
vectorized verify over fixed-width char matrices — equal-length pairs
count mismatches, length±1 pairs check the one-gap splice — no per-pair
Python in either kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import hash64_np


def _char_matrix(tokens: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, zero-padded."""
    buf = np.zeros((len(tokens), width), dtype=np.uint32)
    flat = np.frombuffer(
        np.asarray(tokens, dtype=f"U{width}").tobytes(), dtype=np.uint32
    ).reshape(len(tokens), width)
    buf[:, :] = flat
    return buf


def edit1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """True where edit_distance(a[i], b[i]) == 1 — vectorized over the
    whole pair batch via fixed-width char matrices."""
    la = np.char.str_len(a.astype(str))
    lb = np.char.str_len(b.astype(str))
    out = np.zeros(len(a), dtype=bool)
    width = int(max(la.max(initial=1), lb.max(initial=1))) + 1
    A = _char_matrix(a.astype(f"U{width}"), width)
    B = _char_matrix(b.astype(f"U{width}"), width)

    same = la == lb
    if same.any():
        diffs = (A[same] != B[same]).sum(axis=1)
        out[same] = diffs == 1  # exactly one substitution

    for swap in (False, True):
        # longer side X, shorter Y with len(X) = len(Y) + 1: distance 1
        # iff deleting X's first-mismatch char splices the rest together
        m = (lb == la + 1) if not swap else (la == lb + 1)
        if not m.any():
            continue
        X, Y = (B[m], A[m]) if not swap else (A[m], B[m])
        ne = X[:, :-1] != Y[:, :-1]
        first = np.where(ne.any(axis=1), ne.argmax(axis=1),
                         (la[m] if not swap else lb[m]))
        idx = np.arange(X.shape[1] - 1)
        # after dropping X[first], X's tail must equal Y's tail
        shifted = idx[None, :] >= first[:, None]
        xa = np.where(shifted, X[:, 1:], X[:, :-1])
        out[m] = (xa == Y[:, :-1]).all(axis=1)
    return out


def edit1_pairs(
    tokens: "rd.Dataset",
    token_col: str = "token",
    num_buckets: int = 64,
    bucket_cap: int = 4096,
) -> "rd.Dataset":
    """(token_a, token_b) for every DISTINCT token pair at edit distance
    exactly 1. Input rows need not be distinct (the neighborhood explode
    dedups per batch; pairs dedup in the final exchange). Oversized
    variant buckets truncate COUNTED (token_a = '__truncated__',
    token_b = dropped-pair count as string)."""

    def explode(t: pa.Table) -> pa.Table:
        toks = np.unique(np.asarray(t.column(token_col).to_pylist(),
                                    dtype=object))
        out_v, out_t = [], []
        for tok in toks:  # per DISTINCT token, not per row; short strings
            out_v.append(tok)
            out_t.append(tok)
            for i in range(len(tok)):
                out_v.append(tok[:i] + tok[i + 1:])
                out_t.append(tok)
        h = hash64_np(out_v)
        return pa.table({
            "vh": pa.array(h.view(np.int64)),
            "token": pa.array(out_t, pa.string()),
            "__bkt": pa.array((h % np.uint64(num_buckets)).astype(
                np.int32)),
        })

    exploded = tokens.map_batches(explode, batch_format="pyarrow",
                                  batch_size=8192)

    def pairs(g: pa.Table) -> pa.Table:
        vh = g.column("vh").to_numpy(zero_copy_only=False)
        tok = np.asarray(g.column("token").to_pylist(), dtype=object)
        # dedup (variant, token) then segment per variant
        order = np.lexsort((tok, vh))
        vh, tok = vh[order], tok[order]
        keep = np.r_[True, (vh[1:] != vh[:-1]) | (tok[1:] != tok[:-1])]
        vh, tok = vh[keep], tok[keep]
        starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
        counts = np.diff(np.r_[starts, len(vh)])
        out_a, out_b = [], []
        dropped = 0
        for s, c in zip(starts, counts):
            if c < 2:
                continue
            if c > bucket_cap:
                dropped += int(c * (c - 1) // 2
                               - bucket_cap * (bucket_cap - 1) // 2)
                c = bucket_cap
            seg = tok[s:s + c]
            iu, ju = np.triu_indices(c, k=1)
            out_a.append(seg[iu])
            out_b.append(seg[ju])
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            lo = np.minimum(a, b).astype(object)
            hi = np.maximum(a, b).astype(object)
            ok = edit1_mask(lo, hi)
            lo, hi = lo[ok], hi[ok]
        else:
            lo = hi = np.array([], dtype=object)
        rows = {"token_a": pa.array(list(lo), pa.string()),
                "token_b": pa.array(list(hi), pa.string())}
        if dropped:
            rows = {"token_a": pa.array(list(lo) + ["__truncated__"]),
                    "token_b": pa.array(list(hi) + [str(dropped)])}
        return pa.table(rows)

    cand = exploded.groupby("__bkt").map_groups(pairs,
                                                batch_format="pyarrow")

    # a pair may surface from several shared variants — bucketed distinct
    def pair_bkt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(t["token_a"], t["token_b"],
                                          "\x1f")
        h = hash64_np(key.to_pylist())
        return t.append_column("__pbkt", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)))

    # Truncation metric rows are excluded from the dedup and their counts
    # SUMMED (two variant buckets dropping EQUAL counts would otherwise
    # collapse to one metric row — ADVICE r3); metric rows with different
    # counts hash to different pair buckets, so the output may hold several
    # metric rows whose token_b counts sum to the global dropped total.
    def dedup(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        metric = df["token_a"] == "__truncated__"
        out = df[~metric].drop_duplicates(["token_a", "token_b"])
        if metric.any():
            total = int(df.loc[metric, "token_b"].astype(np.int64).sum())
            out = pd.concat(
                [out[["token_a", "token_b"]],
                 pd.DataFrame({"token_a": ["__truncated__"],
                               "token_b": [str(total)]})],
                ignore_index=True)
        return pa.Table.from_pandas(out[["token_a", "token_b"]],
                                    preserve_index=False)

    return (cand.map_batches(pair_bkt, batch_format="pyarrow")
            .groupby("__pbkt").map_groups(dedup, batch_format="pyarrow"))
