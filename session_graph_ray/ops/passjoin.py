"""PassJoin: exact edit-distance <= k similarity join over a vocabulary.

Li, Deng, Wang & Feng (VLDB'11 "PASS-JOIN: A Partition-based Method for
Similarity Joins"): partition every indexed string of length l into k+1
segments; if ed(s, t) <= k then at most k segments of s are touched by
edits, so at least one appears in t EXACTLY, with its start position
shifted by at most k. Candidates are therefore pairs sharing a
(segment-substring, segment-index, source-length) key — an exact
blocking scheme with zero recall loss, generalizing the k=1 FastSS
deletion neighborhoods in ``ops/fuzzy.py``.

Distributed shape (mirrors edit1_pairs):

1. per-batch DISTINCT tokens emit index keys (their own k+1 segments)
   and probe keys (substrings matching every candidate source length
   l in [m-k, m+k], segment i, start within the +-k shift window);
   strings shorter than k+1 ride a dedicated short-word key (any such
   s can only match words of length <= 2k — a tiny closed group);
2. ONE hash exchange groups keys; each group crosses its (deduped)
   index x probe sides, normalizes pair order, dedups locally, and
   verifies with a fully VECTORIZED banded Levenshtein: one DP row per
   character step across ALL pairs at once, the left-to-right deletion
   chain resolved by the subtract-arange / minimum.accumulate transform
   (no per-pair Python loop);
3. a pair can surface under several shared segment keys — a second
   bucketed exchange keeps one copy; oversized key groups truncate
   COUNTED (token_a='__truncated__', never silent).

Character semantics are CODEPOINTS (``ops/fuzzy._char_matrix``), the
same unit DuckDB's ``levenshtein()`` counts, so the SQL oracle is an
exhaustive self-join at BETWEEN 1 AND k.

Reference analog: the reference tolerates near-miss entity names during
linking (``/root/reference/pipeline/link_entities.py:283-329``);
PassJoin is the published exact-threshold form of that tolerance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import hash64_np
from .fuzzy import _char_matrix

_SHORT = "\x00short"  # key for strings with len < k+1 (match anything <= 2k)


def seg_bounds(l: int, k: int) -> list[tuple[int, int]]:
    """The PINNED segment scheme for an indexed string of length l:
    k+1 segments, the first (k+1-rem) of length l//(k+1), the last rem
    one longer (rem = l mod (k+1)). Both the index and probe sides must
    use this exact scheme."""
    base, rem = divmod(l, k + 1)
    lens = [base] * (k + 1 - rem) + [base + 1] * rem
    out = []
    st = 0
    for ln in lens:
        out.append((st, ln))
        st += ln
    return out


def lev_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact Levenshtein distance for every (a[i], b[i]) pair, fully
    vectorized across pairs: one O(n x width) numpy row per character
    step; the in-row deletion dependency cur[j] = min(t[j], cur[j-1]+1)
    resolves as minimum.accumulate(cat - arange) + arange."""
    n = len(a)
    if n == 0:
        return np.empty(0, np.int64)
    la = np.fromiter((len(x) for x in a), np.int64, n)
    lb = np.fromiter((len(x) for x in b), np.int64, n)
    LA = int(la.max(initial=1))
    LB = int(lb.max(initial=1))
    A = _char_matrix(np.asarray(a, dtype=object), LA)
    B = _char_matrix(np.asarray(b, dtype=object), LB)
    idx = np.arange(LB + 1, dtype=np.int32)
    prev = np.tile(idx, (n, 1))
    for i in range(1, LA + 1):
        active = i <= la
        cost = (A[:, i - 1][:, None] != B).astype(np.int32)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        cat = np.concatenate(
            [np.full((n, 1), i, np.int32), t], axis=1
        )
        cur = np.minimum.accumulate(cat - idx, axis=1) + idx
        prev = np.where(active[:, None], cur, prev)
    return prev[np.arange(n), lb].astype(np.int64)


def _explode_factory(k: int, token_col: str, num_buckets: int):
    def explode(t: pa.Table) -> pa.Table:
        toks = np.unique(
            np.asarray(t.column(token_col).to_pylist(), dtype=object)
        )
        keys: list[str] = []
        words: list[str] = []
        sides: list[int] = []
        for w in toks:
            m = len(w)
            # ---- index side -----------------------------------------
            if m >= k + 1:
                for i, (st, ln) in enumerate(seg_bounds(m, k)):
                    keys.append(f"{w[st:st + ln]}\x1f{i}\x1f{m}")
                    words.append(w)
                    sides.append(0)
            else:
                keys.append(_SHORT)
                words.append(w)
                sides.append(0)
            # ---- probe side -----------------------------------------
            if m <= 2 * k:
                keys.append(_SHORT)
                words.append(w)
                sides.append(1)
            for l in range(max(k + 1, m - k), m + k + 1):
                for i, (st, ln) in enumerate(seg_bounds(l, k)):
                    lo = max(0, st - k)
                    hi = min(m - ln, st + k)
                    for p in range(lo, hi + 1):
                        keys.append(f"{w[p:p + ln]}\x1f{i}\x1f{l}")
                        words.append(w)
                        sides.append(1)
        h = hash64_np(keys)
        return pa.table({
            "kh": pa.array(h.view(np.int64)),
            "token": pa.array(words, pa.string()),
            "side": pa.array(np.asarray(sides, np.int8)),
            "__bkt": pa.array(
                (h % np.uint64(num_buckets)).astype(np.int32)
            ),
        })

    return explode


def edit_pairs_k(
    tokens: "rd.Dataset",
    k: int = 2,
    token_col: str = "token",
    num_buckets: int = 64,
    group_cap: int = 4096,
) -> "rd.Dataset":
    """(token_a < token_b, dist) for every DISTINCT token pair with
    1 <= levenshtein <= k — exact (PassJoin blocking + vectorized DP
    verify). Input rows need not be distinct. Oversized key groups
    truncate COUNTED (token_a='__truncated__', token_b=dropped count as
    string, dist=-1)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    exploded = tokens.map_batches(
        _explode_factory(k, token_col, num_buckets),
        batch_format="pyarrow", batch_size=8192,
    )

    def pairs(g: pa.Table) -> pa.Table:
        kh = g.column("kh").to_numpy(zero_copy_only=False)
        tok = np.asarray(g.column("token").to_pylist(), dtype=object)
        side = g.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, side, kh))
        kh, tok, side = kh[order], tok[order], side[order]
        keep = np.r_[True, (kh[1:] != kh[:-1]) | (side[1:] != side[:-1])
                     | (tok[1:] != tok[:-1])]
        kh, tok, side = kh[keep], tok[keep], side[keep]
        starts = np.flatnonzero(np.r_[True, kh[1:] != kh[:-1]])
        ends = np.r_[starts[1:], kh.size]
        out_a, out_b = [], []
        dropped = 0
        for s, e in zip(starts, ends):
            sd = side[s:e]
            tk = tok[s:e]
            nidx = int(np.searchsorted(sd, 1))  # index rows sort first
            I, P = tk[:nidx], tk[nidx:]
            if I.size == 0 or P.size == 0:
                continue
            prod = I.size * P.size
            if prod > group_cap:
                # deterministic trim: keep the lexicographically first
                # index words until the product fits
                keep_i = max(1, group_cap // max(P.size, 1))
                dropped += (I.size - keep_i) * P.size
                I = I[:keep_i]
            ia = np.repeat(I, P.size)
            ib = np.tile(P, I.size)
            ne = ia != ib
            out_a.append(np.minimum(ia[ne], ib[ne]).astype(object))
            out_b.append(np.maximum(ia[ne], ib[ne]).astype(object))
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            # local dedup before the (costly) verify
            key = np.char.add(np.char.add(a.astype(str), "\x1f"),
                              b.astype(str))
            _, first = np.unique(key, return_index=True)
            a, b = a[first], b[first]
            d = lev_batch(a, b)
            ok = d <= k  # d >= 1 guaranteed (a != b)
            a, b, d = a[ok], b[ok], d[ok]
        else:
            a = b = np.array([], dtype=object)
            d = np.empty(0, np.int64)
        rows = {
            "token_a": pa.array(list(a), pa.string()),
            "token_b": pa.array(list(b), pa.string()),
            "dist": pa.array(d, pa.int64()),
        }
        if dropped:
            rows = {
                "token_a": pa.array(list(a) + ["__truncated__"]),
                "token_b": pa.array(list(b) + [str(dropped)]),
                "dist": pa.array(np.r_[d, -1], pa.int64()),
            }
        return pa.table(rows)

    cand = exploded.groupby("__bkt").map_groups(
        pairs, batch_format="pyarrow"
    )

    def pair_bkt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            t["token_a"], t["token_b"], "\x1f"
        )
        h = hash64_np(key.to_pylist())
        return t.append_column("__pbkt", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)
        ))

    # metric rows excluded from the dedup, counts SUMMED (the counted-
    # truncation contract; see ops/fuzzy.edit1_pairs)
    def dedup(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        metric = df["token_a"] == "__truncated__"
        out = df[~metric].drop_duplicates(["token_a", "token_b"])
        if metric.any():
            total = int(df.loc[metric, "token_b"].astype(np.int64).sum())
            out = pd.concat(
                [out[["token_a", "token_b", "dist"]],
                 pd.DataFrame({"token_a": ["__truncated__"],
                               "token_b": [str(total)],
                               "dist": [-1]})],
                ignore_index=True)
        # explicit construction: from_pandas attaches pandas schema
        # metadata, which is unhashable and defeats Ray's block-schema
        # deduplication (see sources/parquet.read_parquet_clean)
        return pa.table({
            "token_a": pa.array(out["token_a"].tolist(), pa.string()),
            "token_b": pa.array(out["token_b"].tolist(), pa.string()),
            "dist": pa.array(out["dist"].astype(np.int64).tolist(),
                             pa.int64()),
        })

    return (cand.map_batches(pair_bkt, batch_format="pyarrow")
            .groupby("__pbkt").map_groups(dedup, batch_format="pyarrow"))
