"""Exact threshold set-similarity self-join via prefix filtering (AllPairs).

Finds ALL document pairs whose distinct-token Jaccard similarity is >= a
threshold — exact semantics (no LSH recall loss), the complement to the
probabilistic MinHash path in ``ops/dedup.py``. The algorithm is the
published AllPairs / PPJoin family (Bayardo et al. WWW'07; Xiao et al.
WWW'08; Vernica et al. SIGMOD'10 give the MapReduce shape this module
re-expresses on Ray Data):

1. **Token census** — document frequency (df) of every distinct token,
   via the bucketed ``np.unique`` census (one shuffle of per-batch
   partials). Tokens with df == 1 can never be shared, so only df >= 2
   tokens flow further; each doc's TRUE distinct-token count ``n`` is
   carried separately so Jaccard stays exact.
2. **Rare-first global order + prefix emission** — tokens are ordered by
   (df asc, hash asc). A doc with n distinct tokens only needs its first
   ``p = n - ceil(tau*n) + 1`` tokens indexed: the prefix-filter lemma
   (PPJoin Lemma 1) guarantees any pair with Jaccard >= tau shares a
   token inside BOTH prefixes. df-1 tokens sort first and occupy prefix
   slots without ever being emitted (they cannot be shared) — correct,
   because the lemma only promises a SHARED (hence df>=2) prefix token.
   The df lookup is size-gated: a sorted broadcast array + searchsorted
   when the df>=2 vocabulary is small, else a bucketed join (100-TB path).
3. **Prefix-token exchange + verify** — group prefix records by token
   (one hash exchange); inside each token group, length-filtered pairs
   (1e6*min(n) >= tau_u*max(n)) are verified by exact sorted-array
   intersection over the df>=2 token hashes. All arithmetic is integer
   (tau in micro-units), so the DuckDB oracle replays the same comparisons
   bit-exactly.
4. **Pair dedup** — a pair can be discovered under several shared prefix
   tokens; a packed-key exchange keeps one copy (31-bit range-checked
   packing, the ``ops/triangles.py`` idiom).

Skew: a hot token that lands in many prefixes would make a quadratic
group; ``group_cap`` bounds every token group with COUNTED truncation
(metric rows, never a silent skip — the ``ops/pairing.py`` contract).
Prefix tokens are the globally rarest by construction, so the cap only
engages on adversarial corpora.

Reference analog: the reference verifies fuzzy entity matches by exact
token-set overlap after candidate generation
(``/root/reference/pipeline/link_entities.py:283-329``); this module is
that semantic as a standalone exact join, distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.hashing import hash64_np
from ..functions.minhash import mix64
from .exchange import exchange_map_groups

_NONWORD_SPLIT = r"[^\pL\pN_]+"  # shared with ops/dedup.py and the oracle
_C31 = np.int64(1) << 31
_M = 1_000_000  # micro-unit scale for tau and jacc_u

# df>=2 vocabulary at or below this many tokens rides the object store as
# one sorted uint64 array (16 B/token -> <=32 MB at the default); above it
# the df attach is a bucketed join. Same size-gating idiom as
# ops/spandedup.BROADCAST_MAX_KEYS.
DF_BROADCAST_MAX = 2_000_000


def _doc_distinct_tokens(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row DISTINCT token hashes for a utf8 column, vectorized.

    Returns (row_ids int64, tok_h uint64, n_distinct int64 per row).
    Tokenization: lowercased ``[^\\pL\\pN_]+`` split with empties dropped —
    bit-equal to the dedup kernels and the SQL oracle's
    ``regexp_split_to_array``. Hash: mix64(crc64) per DISTINCT string via
    dictionary encoding (one hash per unique token per batch).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    lists = pc.split_pattern_regex(low, _NONWORD_SPLIT)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    n_rows = len(lists)
    flat = lists.flatten()
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        row_ids = row_ids[keep]
    if not len(flat):
        return (np.empty(0, np.int64), np.empty(0, np.uint64),
                np.zeros(n_rows, np.int64))
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = mix64(hash64_np(enc.dictionary.to_pylist()))[codes]
    order = np.lexsort((th, row_ids))
    rows, hh = row_ids[order], th[order]
    first = np.ones(rows.size, dtype=bool)
    first[1:] = (rows[1:] != rows[:-1]) | (hh[1:] != hh[:-1])
    rows, hh = rows[first], hh[first]
    n = np.bincount(rows, minlength=n_rows).astype(np.int64)
    return rows, hh, n


def _prefix_len(n: np.ndarray, tau_u: int) -> np.ndarray:
    """p = n - ceil(tau*n) + 1, integer-exact in micro-units."""
    need = (tau_u * n + (_M - 1)) // _M  # ceil(tau*n)
    return n - need + 1


def _emit_prefix_records(
    doc_ids: np.ndarray,
    rows: np.ndarray,
    hh: np.ndarray,
    df: np.ndarray,
    n_true: np.ndarray,
    tau_u: int,
) -> pa.Table:
    """Build (pt, doc_id, n, toks) prefix records for one batch of docs.

    ``rows``/``hh``/``df`` are the exploded df>=2 tokens of the batch
    (row-major); ``n_true`` is the TRUE distinct count per row (df-1
    tokens included). Emits one record per effective-prefix token: the
    first ``max(0, p - n_df1)`` entries of the (df, hash)-sorted df>=2
    list. ``toks`` is each doc's full df>=2 hash set sorted ascending —
    the verify payload, shipped once per prefix slot.
    """
    n_rows = n_true.size
    if rows.size == 0:
        return pa.table({
            "pt": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "toks": pa.array([], pa.list_(pa.uint64())),
        })
    # global rare-first order within each doc: (row, df, hash)
    order = np.lexsort((hh, df, rows))
    r_s, h_s = rows[order], hh[order]
    k = np.bincount(rows, minlength=n_rows).astype(np.int64)  # df>=2 count
    starts = np.zeros(n_rows + 1, np.int64)
    np.cumsum(k, out=starts[1:])
    p = _prefix_len(n_true, tau_u)
    n_df1 = n_true - k
    eff = np.clip(p - n_df1, 0, k)  # emitted prefix slots per doc
    total = int(eff.sum())
    if total == 0:
        return pa.table({
            "pt": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "toks": pa.array([], pa.list_(pa.uint64())),
        })
    # gather the first eff[r] sorted-slot indices of every row, vectorized:
    # offsets within each emitting row are 0..eff-1
    emit_rows = np.repeat(np.arange(n_rows, dtype=np.int64), eff)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(eff) - eff, eff
    )
    slot = starts[emit_rows] + within
    pts = h_s[slot]
    # verify payload: each doc's df>=2 hashes sorted ASCENDING by hash
    order_h = np.lexsort((hh, rows))
    h_byhash = hh[order_h]
    toks_vals = h_byhash  # row-major, rows are contiguous under lexsort
    toks_offsets = starts  # same per-row counts
    toks_list = pa.ListArray.from_arrays(
        pa.array(toks_offsets, pa.int32()), pa.array(toks_vals, pa.uint64())
    )
    # one list per doc -> repeat per emitted slot via take
    toks_rep = toks_list.take(pa.array(emit_rows, pa.int64()))
    return pa.table({
        "pt": pa.array(pts.view(np.int64)),
        "doc_id": pa.array(doc_ids[emit_rows]),
        "n": pa.array(n_true[emit_rows]),
        "toks": toks_rep,
    })


def _pairs_kernel(tau_u: int, group_cap: int):
    """Per-partition kernel: verified pairs within each complete pt group."""

    def kern(g: pa.Table) -> pa.Table:
        pt = g.column("pt").to_numpy(zero_copy_only=False)
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        toks = g.column("toks")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        # .values + .offsets (NOT .flatten()) so offsets index the raw child
        # buffer correctly even on sliced/concatenated list arrays
        flat = toks.values.to_numpy(zero_copy_only=False)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, n, pt))
        pt_s, did_s, n_s = pt[order], did[order], n[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], pt_s[1:] != pt_s[:-1], [True]])
        )
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[int] = []
        dropped = 0
        for gi in range(bounds.size - 1):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            m = hi - lo
            if m < 2:
                continue
            if m > group_cap:
                dropped += (m * (m - 1) - group_cap * (group_cap - 1)) // 2
                hi = lo + group_cap
                m = group_cap
            idx = order[lo:hi]
            nn = n_s[lo:hi]
            dd = did_s[lo:hi]
            for i in range(m - 1):
                ti = flat[offs[idx[i]]:offs[idx[i] + 1]]
                ni = nn[i]
                for j in range(i + 1, m):
                    nj = nn[j]
                    if _M * ni < tau_u * nj:  # length filter (n asc)
                        break
                    if dd[i] == dd[j]:
                        continue  # same doc via duplicate record (shouldn't occur)
                    tj = flat[offs[idx[j]]:offs[idx[j] + 1]]
                    if ti.size > tj.size:
                        small, big = tj, ti
                    else:
                        small, big = ti, tj
                    pos = np.searchsorted(big, small)
                    pos[pos == big.size] = 0
                    inter = int((big[pos] == small).sum())
                    union = int(ni + nj - inter)
                    if union <= 0 or _M * inter < tau_u * union:
                        continue
                    a, b = (int(dd[i]), int(dd[j]))
                    if a > b:
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append((2 * _M * inter + union) // (2 * union))
        if dropped:
            out_a.append(-1)
            out_b.append(-1)
            out_j.append(dropped)
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jacc_u": pa.array(out_j, pa.int64()),
        })

    return kern


_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jacc_u", pa.int64())]
)


def _dedup_pairs(pairs: "rd.Dataset", num_buckets: int) -> "rd.Dataset":
    """Global DISTINCT on (doc_a, doc_b); metric rows (doc_a < 0) pass
    through UNSUMMED per partition (each partition emits at most one, and
    partitions are disjoint tasks — summing happens in the split helper,
    the ADVICE-r3 counted-truncation contract)."""

    def bucket_fn(t: pa.Table) -> np.ndarray:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        key = np.where(a < 0, 0, a * _C31 + b)
        return key % num_buckets

    def kern(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        j = g.column("jacc_u").to_numpy(zero_copy_only=False)
        metric = a < 0
        real = ~metric
        ar, br, jr = a[real], b[real], j[real]
        if ar.size and (max(ar.max(), br.max()) >= _C31 or ar.min() < 0):
            raise ValueError("doc ids must fit in 31 bits")
        key = ar * _C31 + br
        _, first = np.unique(key, return_index=True)
        out = pa.table({
            "doc_a": pa.array(np.concatenate([ar[first], a[metric]])),
            "doc_b": pa.array(np.concatenate([br[first], b[metric]])),
            "jacc_u": pa.array(np.concatenate([jr[first], j[metric]])),
        })
        return out

    return exchange_map_groups(
        pairs, kern, None, num_buckets, _PAIR_SCHEMA.empty_table(),
        bucket_fn=bucket_fn,
    )


def split_setsim_metric_rows(tbl: pa.Table) -> tuple[pa.Table, int]:
    """(real pairs, total dropped cross-pair count from capped groups)."""
    a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
    metric = a < 0
    dropped = int(tbl.column("jacc_u").to_numpy(zero_copy_only=False)[metric].sum())
    return tbl.filter(pa.array(~metric)), dropped


def setsim_join(
    docs: "rd.Dataset",
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 256,
    group_cap: int = 4096,
    df_broadcast_max: int = DF_BROADCAST_MAX,
) -> "rd.Dataset":
    """All pairs (doc_a < doc_b, jacc_u) with distinct-token Jaccard >=
    ``threshold`` — exact. ``jacc_u`` is Jaccard in micro-units, rounded
    half-up with pure integer arithmetic (oracle-replayable). Truncation
    metric rows carry ``doc_a = -1`` (see ``split_setsim_metric_rows``).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    tau_u = int(round(threshold * _M))

    def explode(t: pa.Table) -> pa.Table:
        rows, hh, n = _doc_distinct_tokens(t.column(text_col))
        did = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(did[rows]),
            "h64": pa.array(hh.view(np.int64)),
            "n": pa.array(n[rows]),
        })

    exploded = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )

    from .spandedup import _bucketed_value_counts

    census = _bucketed_value_counts(
        exploded, "h64", "h64", "df", min_count=2, num_buckets=num_buckets
    ).materialize()

    if census.count() <= df_broadcast_max:
        cdf = census.to_pandas()
        if len(cdf) == 0:  # all tokens df=1: no pair is possible
            cs_h = np.empty(0, np.int64)
            cs_df = np.empty(0, np.int64)
        else:
            order = np.argsort(cdf["h64"].to_numpy())
            cs_h = cdf["h64"].to_numpy()[order]
            cs_df = cdf["df"].to_numpy().astype(np.int64)[order]
        ref = ray.put((cs_h, cs_df))

        def prefix_batch(t: pa.Table) -> pa.Table:
            cs_h_l, cs_df_l = ray.get(ref)
            rows, hh, n = _doc_distinct_tokens(t.column(text_col))
            did = t.column(id_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            hi = hh.view(np.int64)
            if cs_h_l.size:
                pos = np.searchsorted(cs_h_l, hi)
                pos_c = np.clip(pos, 0, cs_h_l.size - 1)
                hit = cs_h_l[pos_c] == hi
            else:
                hit = np.zeros(hi.size, bool)
                pos_c = np.zeros(hi.size, np.int64)
            rows2, hh2 = rows[hit], hh[hit]
            df2 = cs_df_l[pos_c[hit]]
            return _emit_prefix_records(did, rows2, hh2, df2,
                                        n, tau_u)

        records = docs.select_columns([id_col, text_col]).map_batches(
            prefix_batch, batch_format="pyarrow"
        )
    else:
        # 100-TB path: bucketed join exploded x census on h64, then one
        # exchange on doc_id to rebuild per-doc token lists.
        from .join import bucket_join, rename_batches

        joined = bucket_join(
            exploded, rename_batches(census, {"h64": "h64_r"}),
            left_on="h64", right_on="h64_r",
            left_schema=pa.schema([
                ("doc_id", pa.int64()), ("h64", pa.int64()), ("n", pa.int64())
            ]),
            right_schema=pa.schema([("h64_r", pa.int64()), ("df", pa.int64())]),
        )

        def rebuild(g: pa.Table) -> pa.Table:
            did = g.column("doc_id").to_numpy(zero_copy_only=False)
            hh = g.column("h64").to_numpy(zero_copy_only=False).view(np.uint64)
            df = g.column("df").to_numpy(zero_copy_only=False)
            n = g.column("n").to_numpy(zero_copy_only=False)
            # compact doc ids to local row indices
            uids, inv = np.unique(did, return_inverse=True)
            n_per = np.zeros(uids.size, np.int64)
            n_per[inv] = n  # true distinct count rides every exploded row
            return _emit_prefix_records(uids, inv, hh, df, n_per, tau_u)

        records = exchange_map_groups(
            joined, rebuild, "doc_id", num_buckets,
            pa.schema([
                ("pt", pa.int64()), ("doc_id", pa.int64()),
                ("n", pa.int64()),
                ("toks", pa.list_(pa.uint64())),
            ]).empty_table(),
        )

    def pt_bucket(t: pa.Table) -> np.ndarray:
        # pt is an int64 VIEW of a uint64 hash: half the values are
        # negative, and the exchange clips negative buckets to partition 0
        # (sentinel-row convention) — bucket on the uint64 bits instead
        pt = t.column("pt").to_numpy(zero_copy_only=False)
        return (pt.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)

    raw_pairs = exchange_map_groups(
        records, _pairs_kernel(tau_u, group_cap), None, num_buckets,
        _PAIR_SCHEMA.empty_table(), bucket_fn=pt_bucket,
    )
    return _dedup_pairs(raw_pairs, num_buckets)
