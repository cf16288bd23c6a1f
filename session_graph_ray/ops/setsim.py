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
    """Per-partition kernel: verified pairs within each complete pt group.

    Three structural fast paths keep it vectorized on near-dup-heavy
    corpora (where output pairs number in the millions):

    - candidate (i, j) expansion + length filter via the segmented
      all-pairs idiom (``ops/pairing._all_pairs_idx``), no Python loop;
    - candidate pairs are DEDUPED before verification (a pair sharing k
      prefix tokens in this partition would otherwise verify k times);
    - equal df>=2 token sets are detected by (count, wraparound-sum hash)
      and resolved without any merge: equal arrays => intersection is
      exactly the shared-array length. Only genuinely partial overlaps
      reach the per-pair sorted-merge loop.
    """

    def kern(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _TAGGED_SCHEMA.empty_table()
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
        k_arr = offs[1:] - offs[:-1]  # df>=2 token count per record
        # wraparound-sum set hash per record (commutative; equal sets =>
        # equal hash, unequal sets collide with ~2^-64 probability — the
        # same collision class the token hashing already accepts)
        with np.errstate(over="ignore"):
            csum = np.zeros(flat.size + 1, np.uint64)
            np.cumsum(flat, dtype=np.uint64, out=csum[1:])
            sh_arr = csum[offs[1:]] - csum[offs[:-1]]  # wraps mod 2^64

        # ---- partition-wide PROFILE collapse -------------------------
        # A profile is an identical df>=2 token array, keyed (n, k, sh):
        # same profile => same prefix records => its docs appear in
        # exactly the same pt runs, and every cross pair verifies
        # identically. Candidate generation is quadratic in PROFILES,
        # not docs — the decisive reduction on template-heavy corpora
        # (a 10^12-file code corpus is mostly identical files).
        porder = np.lexsort((did, sh_arr.view(np.int64), k_arr, n))
        pn = n[porder]
        pk = k_arr[porder]
        psh = sh_arr[porder]
        newp = np.ones(porder.size, bool)
        newp[1:] = ((pn[1:] != pn[:-1]) | (pk[1:] != pk[:-1])
                    | (psh[1:] != psh[:-1]))
        pid_sorted = np.cumsum(newp) - 1
        pid = np.empty(porder.size, np.int64)
        pid[porder] = pid_sorted
        n_prof = int(pid_sorted[-1]) + 1 if porder.size else 0
        rep = porder[np.flatnonzero(newp)]  # one record index per profile
        prof_n = n[rep]
        prof_k = k_arr[rep]
        # members: DISTINCT doc ids per profile (a doc has one record per
        # prefix token, all with the same pid)
        mkey = pid * _C31 + did  # doc ids are 31-bit checked below
        if did.size and (did.max() >= _C31 or did.min() < 0):
            raise ValueError("doc ids must fit in 31 bits")
        mu = np.unique(mkey)
        mem_pid = mu // _C31
        mem_doc = mu % _C31
        mem_starts = np.searchsorted(mem_pid, np.arange(n_prof + 1))
        prof_m = np.diff(mem_starts)  # member count per profile

        rep_doc = mem_doc[mem_starts[:-1]] if n_prof else np.empty(0, np.int64)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_j: list[np.ndarray] = []
        out_kind: list[np.ndarray] = []
        referenced: list[np.ndarray] = []  # pids needing membership rows

        def emit(doc_a, doc_b, jacc, kind):
            out_a.append(np.asarray(doc_a, np.int64))
            out_b.append(np.asarray(doc_b, np.int64))
            out_j.append(np.asarray(jacc, np.int64))
            out_kind.append(np.full(len(out_a[-1]), kind, np.int8))

        # ---- within-profile pairs (identical df>=2 arrays) ----------
        # jacc = k / (2n - k) exactly (intersection is the shared array;
        # each side's df-1 tokens are unique to it by definition). Emitted
        # as ONE self profile-pair row (rep, rep, jacc) — the expansion
        # stage materializes the C(m,2) member pairs exactly once
        wmulti = np.flatnonzero(prof_m >= 2)
        if wmulti.size:
            wu = 2 * prof_n[wmulti] - prof_k[wmulti]
            wpass = wmulti[(wu > 0)
                           & (_M * prof_k[wmulti] >= tau_u * wu)]
            if wpass.size:
                wun = 2 * prof_n[wpass] - prof_k[wpass]
                emit(rep_doc[wpass], rep_doc[wpass],
                     (2 * _M * prof_k[wpass] + wun) // (2 * wun), 0)
                referenced.append(wpass)

        # ---- cross-profile candidates per pt run --------------------
        dropped = 0
        rorder = np.lexsort((pid, pt))
        rpt = pt[rorder]
        rpid = pid[rorder]
        rbounds = np.flatnonzero(
            np.concatenate([[True], rpt[1:] != rpt[:-1], [True]])
        )
        # distinct pids per run (a profile's docs share identical prefix
        # records, so within a run a pid repeats once per member doc)
        keep1 = np.ones(rpid.size, bool)
        keep1[1:] = (rpid[1:] != rpid[:-1]) | (rpt[1:] != rpt[:-1])
        run_of = np.repeat(
            np.arange(rbounds.size - 1), np.diff(rbounds)
        )[keep1]
        upid = rpid[keep1]
        # order profiles within each run by (n, pid) for the length filter
        uorder = np.lexsort((upid, prof_n[upid], run_of))
        run_s = run_of[uorder]
        upid_s = upid[uorder]
        ubounds = np.flatnonzero(
            np.concatenate([[True], run_s[1:] != run_s[:-1], [True]])
        )
        ustarts = ubounds[:-1]
        usizes = np.diff(ubounds)
        # profile-level group cap with exact dropped MEMBER-pair counts:
        # keep the first group_cap profiles of an oversized run; dropped =
        # C(run member docs, 2) - C(kept member docs, 2)
        if (usizes > group_cap).any():
            mcnt = prof_m[upid_s]
            over = np.flatnonzero(usizes > group_cap)
            for oi in over:
                lo, hi = int(ustarts[oi]), int(ubounds[oi + 1])
                m_all = int(mcnt[lo:hi].sum())
                m_kept = int(mcnt[lo:lo + group_cap].sum())
                dropped += (m_all * (m_all - 1) - m_kept * (m_kept - 1)) // 2
            local = np.arange(upid_s.size, dtype=np.int64) - np.repeat(
                ustarts, usizes
            )
            sel = np.flatnonzero(local < group_cap)
            upid_s = upid_s[sel]
            usizes = np.minimum(usizes, group_cap)
            ustarts = np.concatenate([[0], np.cumsum(usizes)[:-1]])
        pmulti = usizes >= 2
        if pmulti.any():
            from .pairing import _all_pairs_idx

            a_i, b_i = _all_pairs_idx(ustarts[pmulti], usizes[pmulti])
            pa_id, pb_id = upid_s[a_i], upid_s[b_i]
            # length filter: profiles are n-ascending within a run
            ok = _M * prof_n[pa_id] >= tau_u * prof_n[pb_id]
            pa_id, pb_id = pa_id[ok], pb_id[ok]
            # dedup candidate PROFILE pairs across runs before verify
            key = pa_id * np.int64(n_prof) + pb_id
            cand = np.unique(key)
            ca = cand // n_prof
            cb = cand % n_prof
            na, nb = prof_n[ca], prof_n[cb]
            ka, kb = prof_k[ca], prof_k[cb]
            ra, rb = rep[ca], rep[cb]
            inter = np.empty(ca.size, np.int64)
            same = (ka == kb) & (sh_arr[ra] == sh_arr[rb])
            inter[same] = ka[same]
            rest = np.flatnonzero(~same)
            if rest.size:
                # vectorized multi-pair intersection: encode partition
                # tokens to dense ids, key each side's elements by
                # (chunk-local pair index * V + id) — the probe target is
                # then globally sorted, so ONE searchsorted per chunk
                # counts every pair's overlap; chunking bounds memory at
                # ~elem_budget gathered elements per pass
                from .pairing import _ranges_concat

                uniq = np.unique(flat)
                V = np.int64(max(uniq.size, 1))
                elem_budget = 16_000_000
                ksum = np.cumsum(
                    (k_arr[ra[rest]] + k_arr[rb[rest]]).astype(np.int64)
                )
                n_chunks = max(1, int(-(-int(ksum[-1]) // elem_budget)))
                cuts = np.searchsorted(
                    ksum, elem_budget * np.arange(1, n_chunks + 1)
                ) + 1
                cuts = np.unique(np.clip(cuts, 1, rest.size))
                lo = 0
                for hi in cuts:
                    ch = rest[lo:hi]
                    lo = int(hi)
                    if ch.size == 0:
                        continue
                    ra_c, rb_c = ra[ch], rb[ch]
                    la = k_arr[ra_c]
                    lb = k_arr[rb_c]
                    ppos = np.arange(ch.size, dtype=np.int64)
                    a_idxf = _ranges_concat(offs[ra_c], la)
                    b_idxf = _ranges_concat(offs[rb_c], lb)
                    a_ids = np.searchsorted(uniq, flat[a_idxf])
                    b_ids = np.searchsorted(uniq, flat[b_idxf])
                    a_pair = np.repeat(ppos, la)
                    a_key = a_pair * V + a_ids
                    b_key = np.repeat(ppos, lb) * V + b_ids
                    if b_key.size:
                        pos = np.searchsorted(b_key, a_key)
                        pos[pos == b_key.size] = 0
                        hit = b_key[pos] == a_key
                        inter[ch] = np.bincount(
                            a_pair[hit], minlength=ch.size
                        )
                    else:
                        inter[ch] = 0
            union = na + nb - inter
            good = np.flatnonzero((union > 0)
                                  & (_M * inter >= tau_u * union))
            if good.size:
                ga, gb = ca[good], cb[good]
                gj = ((2 * _M * inter[good] + union[good])
                      // (2 * union[good]))
                da, db = rep_doc[ga], rep_doc[gb]
                emit(np.minimum(da, db), np.maximum(da, db), gj, 0)
                referenced.append(ga)
                referenced.append(gb)

        # ---- membership rows for every referenced profile -----------
        if referenced:
            refp = np.unique(np.concatenate(referenced))
            cnts = prof_m[refp]
            from .pairing import _ranges_concat

            midx = _ranges_concat(mem_starts[refp], cnts)
            emit(np.repeat(rep_doc[refp], cnts), mem_doc[midx],
                 np.zeros(midx.size, np.int64), 1)

        if dropped:
            emit(np.array([-1], np.int64), np.array([-1], np.int64),
                 np.array([dropped], np.int64), 2)
        if not out_a:
            return _TAGGED_SCHEMA.empty_table()
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a)),
            "doc_b": pa.array(np.concatenate(out_b)),
            "jacc_u": pa.array(np.concatenate(out_j)),
            "kind": pa.array(np.concatenate(out_kind)),
        })

    return kern


_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jacc_u", pa.int64())]
)
_TAGGED_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jacc_u", pa.int64()),
     ("kind", pa.int8())]
)

# deduped membership at or below this many rows expands through one
# broadcast lookup; above it, two bucketed joins (the 100-TB path)
MEM_BROADCAST_MAX = 4_000_000


def _dedup_tagged(rows: "rd.Dataset", num_buckets: int) -> "rd.Dataset":
    """Global DISTINCT on (kind, doc_a, doc_b) for profile-pair (kind 0)
    and membership (kind 1) rows; metric rows (kind 2) pass through
    UNSUMMED per partition (each source partition emits at most one —
    summing happens in the split helper, the counted-truncation
    contract)."""

    def bucket_fn(t: pa.Table) -> np.ndarray:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        key = np.where(a < 0, 0, a * _C31 + b)
        return key % num_buckets

    def kern(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        j = g.column("jacc_u").to_numpy(zero_copy_only=False)
        kd = g.column("kind").to_numpy(zero_copy_only=False)
        metric = kd == 2
        real = ~metric
        ar, br, jr, kr = a[real], b[real], j[real], kd[real]
        if ar.size and (max(ar.max(), br.max()) >= _C31 or ar.min() < 0):
            raise ValueError("doc ids must fit in 31 bits")
        key = (ar * _C31 + br) * 2 + kr
        _, first = np.unique(key, return_index=True)
        return pa.table({
            "doc_a": pa.array(np.concatenate([ar[first], a[metric]])),
            "doc_b": pa.array(np.concatenate([br[first], b[metric]])),
            "jacc_u": pa.array(np.concatenate([jr[first], j[metric]])),
            "kind": pa.array(np.concatenate([kr[first], kd[metric]])),
        })

    return exchange_map_groups(
        rows, kern, None, num_buckets, _TAGGED_SCHEMA.empty_table(),
        bucket_fn=bucket_fn,
    )


def _expand_profiles(
    tagged: "rd.Dataset",
    num_buckets: int,
    mem_broadcast_max: int = MEM_BROADCAST_MAX,
) -> "rd.Dataset":
    """Materialize member doc pairs from deduped profile-pair rows —
    exactly once globally. Self pairs (rep == rep) expand to C(m,2)
    within-profile pairs; cross pairs to the m_a x m_b product. Metric
    rows ride through untouched."""
    mat = tagged.materialize()

    def pick(kind: int):
        def f(t: pa.Table, k=kind) -> pa.Table:
            # Ray hands zero-row blocks as column-less tables — pin schema
            if t.num_rows == 0 or "kind" not in t.schema.names:
                return _TAGGED_SCHEMA.empty_table()
            return t.filter(pc.equal(t["kind"], pa.scalar(k)))

        return mat.map_batches(f, batch_format="pyarrow")

    pairs = pick(0)
    mem = pick(1).materialize()

    # metric rows are bounded by the partition count (at most one per
    # kernel task), so they collect driver-side; a lazy all-empty union
    # side would surface as a schema-less block and break concatenation
    met_parts = [
        b.select(["doc_a", "doc_b", "jacc_u"])
        for b in pick(2).iter_batches(batch_format="pyarrow")
        if b.num_rows and "doc_a" in b.schema.names
    ]
    metric_tbl = (
        pa.concat_tables(met_parts) if met_parts
        else _PAIR_SCHEMA.empty_table()
    )

    n_mem = mem.count()
    if n_mem <= mem_broadcast_max:
        if n_mem == 0:
            reps = np.empty(0, np.int64)
            members = np.empty(0, np.int64)
            starts = np.zeros(1, np.int64)
        else:
            mdf = mem.to_pandas()
            r = mdf["doc_a"].to_numpy(np.int64)
            m = mdf["doc_b"].to_numpy(np.int64)
            order = np.lexsort((m, r))
            r, members = r[order], m[order]
            newr = np.ones(r.size, bool)
            newr[1:] = r[1:] != r[:-1]
            reps = r[newr]
            starts = np.concatenate([
                np.flatnonzero(newr), [r.size]
            ]).astype(np.int64)
        ref = ray.put((reps, members, starts))

        def expand(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "doc_a" not in t.schema.names:
                return _PAIR_SCHEMA.empty_table()
            reps_l, mem_l, st_l = ray.get(ref)
            a = t.column("doc_a").to_numpy(zero_copy_only=False)
            b = t.column("doc_b").to_numpy(zero_copy_only=False)
            j = t.column("jacc_u").to_numpy(zero_copy_only=False)
            pia = np.searchsorted(reps_l, a)
            pib = np.searchsorted(reps_l, b)
            out_a: list[np.ndarray] = []
            out_b: list[np.ndarray] = []
            out_j: list[np.ndarray] = []
            from .pairing import _all_pairs_idx

            for i in range(a.size):
                ma = mem_l[st_l[pia[i]]:st_l[pia[i] + 1]]
                if a[i] == b[i]:
                    ai, bi = _all_pairs_idx(
                        np.zeros(1, np.int64),
                        np.array([ma.size], np.int64),
                    )
                    out_a.append(ma[ai])
                    out_b.append(ma[bi])
                    out_j.append(np.full(ai.size, j[i], np.int64))
                else:
                    mb = mem_l[st_l[pib[i]]:st_l[pib[i] + 1]]
                    xa = np.repeat(ma, mb.size)
                    xb = np.tile(mb, ma.size)
                    out_a.append(np.minimum(xa, xb))
                    out_b.append(np.maximum(xa, xb))
                    out_j.append(np.full(xa.size, j[i], np.int64))
            if not out_a:
                return _PAIR_SCHEMA.empty_table()
            return pa.table({
                "doc_a": pa.array(np.concatenate(out_a)),
                "doc_b": pa.array(np.concatenate(out_b)),
                "jacc_u": pa.array(np.concatenate(out_j)),
            })

        expanded = pairs.map_batches(expand, batch_format="pyarrow")
    else:
        # 100-TB path: two bucketed joins replicate membership onto each
        # side, then normalize order. Self pairs keep ma < mb only.
        from .join import bucket_join, rename_batches

        p3 = pairs.map_batches(
            lambda t: t.select(["doc_a", "doc_b", "jacc_u"]),
            batch_format="pyarrow",
        )
        ma_side = rename_batches(
            mem.map_batches(
                lambda t: t.select(["doc_a", "doc_b"]),
                batch_format="pyarrow",
            ),
            {"doc_a": "rep_a", "doc_b": "mem_a"},
        )
        mb_side = rename_batches(
            mem.map_batches(
                lambda t: t.select(["doc_a", "doc_b"]),
                batch_format="pyarrow",
            ),
            {"doc_a": "rep_b", "doc_b": "mem_b"},
        )
        j1 = bucket_join(
            p3, ma_side, left_on="doc_a", right_on="rep_a",
            left_schema=_PAIR_SCHEMA,
            right_schema=pa.schema([("rep_a", pa.int64()),
                                    ("mem_a", pa.int64())]),
        )
        j2 = bucket_join(
            j1, mb_side, left_on="doc_b", right_on="rep_b",
            left_schema=pa.schema(list(_PAIR_SCHEMA)
                                  + [pa.field("rep_a", pa.int64()),
                                     pa.field("mem_a", pa.int64())]),
            right_schema=pa.schema([("rep_b", pa.int64()),
                                    ("mem_b", pa.int64())]),
        )

        def finish(t: pa.Table) -> pa.Table:
            a = t.column("doc_a").to_numpy(zero_copy_only=False)
            b = t.column("doc_b").to_numpy(zero_copy_only=False)
            ma = t.column("mem_a").to_numpy(zero_copy_only=False)
            mb = t.column("mem_b").to_numpy(zero_copy_only=False)
            j = t.column("jacc_u").to_numpy(zero_copy_only=False)
            keep = (a != b) | (ma < mb)
            ma, mb, j = ma[keep], mb[keep], j[keep]
            return pa.table({
                "doc_a": pa.array(np.minimum(ma, mb)),
                "doc_b": pa.array(np.maximum(ma, mb)),
                "jacc_u": pa.array(j),
            })

        expanded = j2.map_batches(finish, batch_format="pyarrow")
    if metric_tbl.num_rows:
        return expanded.union(rd.from_arrow(metric_tbl))
    return expanded


def split_setsim_metric_rows(tbl: pa.Table) -> tuple[pa.Table, int]:
    """(real pairs, total dropped cross-pair count from capped groups)."""
    if tbl.num_rows == 0 or "doc_a" not in tbl.schema.names:
        return _PAIR_SCHEMA.empty_table(), 0
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
    new_min_doc_id: int | None = None,
    tile_target: int = 4096,
    tile_max: int = 6,
) -> "rd.Dataset":
    """All pairs (doc_a < doc_b, jacc_u) with distinct-token Jaccard >=
    ``threshold`` — exact. ``jacc_u`` is Jaccard in micro-units, rounded
    half-up with pure integer arithmetic (oracle-replayable). Truncation
    metric rows carry ``doc_a = -1`` (see ``split_setsim_metric_rows``).

    **Incremental fold-in**: with ``new_min_doc_id`` set, docs with
    id >= it are the delta and only pairs touching the delta are
    returned — exactly ``setsim_join(union)`` restricted to those pairs
    (the idempotent-reprocessing contract, SURVEY.md §2.9 D3). The
    prefix-filter lemma guarantees any matching pair shares a token
    inside the NEW doc's prefix, so the exchange only processes the
    delta's prefix-token runs (a delta-sized fraction of the corpus);
    the df census still covers the full union, so prefix lengths — and
    therefore results — are identical to the batch run.
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

    if new_min_doc_id is not None:
        # delta-only run restriction: keep only records in runs of the
        # delta's prefix tokens (old-old candidates inside those runs are
        # filtered from the OUTPUT below — cheap, and the run skip is the
        # structural saving). Distinct delta prefix tokens ride the
        # size-gated semi-join machinery.
        from .spandedup import _bucketed_value_counts

        split = pa.scalar(int(new_min_doc_id))
        new_recs = records.map_batches(
            lambda t: t.filter(pc.greater_equal(t["doc_id"], split)),
            batch_format="pyarrow",
        )
        new_pts = _bucketed_value_counts(
            new_recs, "pt", "pt", None, min_count=1,
            num_buckets=num_buckets,
        ).materialize()
        if new_pts.count() <= df_broadcast_max:
            npdf = new_pts.to_pandas()
            parr = (np.sort(npdf["pt"].to_numpy(np.int64))
                    if len(npdf) else np.empty(0, np.int64))
            pref = ray.put(parr)

            def run_filter(t: pa.Table) -> pa.Table:
                want = ray.get(pref)
                pts = t.column("pt").to_numpy(zero_copy_only=False)
                if want.size:
                    pos = np.clip(np.searchsorted(want, pts),
                                  0, want.size - 1)
                    hit = want[pos] == pts
                else:
                    hit = np.zeros(pts.size, bool)
                return t.filter(pa.array(hit))

            records = records.map_batches(run_filter,
                                          batch_format="pyarrow")
        # else: delta prefix vocabulary itself exceeds the broadcast gate
        # — the "delta" is corpus-sized, so the batch plan (all runs) is
        # the right cost model; the output filter below still applies.

    # ---- hot-run tiling -------------------------------------------
    # Prefix-token runs are as skewed as the vocabulary is small (a
    # template-heavy corpus can have a handful of tokens owning most
    # records), and a run must see all its profiles together — so a hot
    # run is REPLICATED instead of split: its profiles hash into T
    # chunks and every chunk pair (i <= j) becomes an independent exact
    # sub-task (the 1-bucket-theta tiling). Each record is copied T
    # times; cross-tile duplicate discoveries are absorbed by the
    # existing global (kind, a, b) dedup, so correctness is untouched.
    # With tiling engaged the group cap applies per tile.
    rc = _bucketed_value_counts(
        records.map_batches(
            lambda t: (t.select(["pt"]) if t.num_rows else
                       pa.table({"pt": pa.array([], pa.int64())})),
            batch_format="pyarrow",
        ),
        "pt", "pt", "rc", min_count=1, num_buckets=num_buckets,
    )
    # only HOT tokens (> tile_target records) reach the driver — the
    # full census is O(vocabulary) at corpus scale, the hot set is the
    # skew tail by definition
    hot = rc.map_batches(
        lambda t: (t.filter(pc.greater(t["rc"],
                                       pa.scalar(int(tile_target))))
                   if t.num_rows and "rc" in t.schema.names
                   else pa.table({"pt": pa.array([], pa.int64()),
                                  "rc": pa.array([], pa.int64())})),
        batch_format="pyarrow",
    ).materialize()
    rdf = hot.to_pandas()
    if len(rdf):
        h_pt = rdf["pt"].to_numpy(np.int64)
        h_T = np.minimum(
            -(-rdf["rc"].to_numpy(np.int64) // tile_target),
            tile_max,
        )
        horder = np.argsort(h_pt)
        h_pt, h_T = h_pt[horder], h_T[horder]
        tref = ray.put((h_pt, h_T))

        def tile_map(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("tile",
                                       pa.array([], pa.int64()))
            hp, hT = ray.get(tref)
            pts = t.column("pt").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(hp, pts), 0, max(hp.size - 1, 0))
            is_hot = (hp[pos] == pts) if hp.size else np.zeros(
                pts.size, bool
            )
            T_row = np.where(is_hot, hT[pos] if hp.size else 0, 1)
            # profile chunk id: same (k, set-hash, n) => same chunk, so
            # tiles hold complete profiles
            toks = t.column("toks")
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = toks.values.to_numpy(zero_copy_only=False)
            offs = toks.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            with np.errstate(over="ignore"):
                csum = np.zeros(flat.size + 1, np.uint64)
                np.cumsum(flat, dtype=np.uint64, out=csum[1:])
                sig = ((csum[offs[1:]] - csum[offs[:-1]])
                       ^ (t.column("n").to_numpy(zero_copy_only=False)
                          .astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            out_rows: list[np.ndarray] = []
            out_tiles: list[np.ndarray] = []
            for Tv in np.unique(T_row):
                sel = np.flatnonzero(T_row == Tv)
                if Tv <= 1:
                    out_rows.append(sel)
                    out_tiles.append(np.zeros(sel.size, np.int64))
                    continue
                c = (sig[sel] % np.uint64(Tv)).astype(np.int64)
                # tiles containing chunk c: (min(c,k), max(c,k)) for all k
                k = np.tile(np.arange(Tv, dtype=np.int64), sel.size)
                cc = np.repeat(c, Tv)
                ti = np.minimum(cc, k) * tile_max + np.maximum(cc, k)
                out_rows.append(np.repeat(sel, Tv))
                out_tiles.append(ti)
            rows_idx = np.concatenate(out_rows)
            tiles = np.concatenate(out_tiles)
            return t.take(pa.array(rows_idx)).append_column(
                "tile", pa.array(tiles)
            )

        records = records.map_batches(tile_map, batch_format="pyarrow")

        def pt_bucket(t: pa.Table) -> np.ndarray:
            pt = t.column("pt").to_numpy(zero_copy_only=False)
            tile = t.column("tile").to_numpy(zero_copy_only=False)
            mixed = (pt.view(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)) ^ (
                tile.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            )
            return (mixed % np.uint64(num_buckets)).astype(np.int64)
    else:
        def pt_bucket(t: pa.Table) -> np.ndarray:
            # pt is an int64 VIEW of a uint64 hash: half the values are
            # negative, and the exchange clips negative buckets to
            # partition 0 (sentinel convention) — bucket on uint64 bits
            pt = t.column("pt").to_numpy(zero_copy_only=False)
            return (pt.view(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int64)

    raw = exchange_map_groups(
        records, _pairs_kernel(tau_u, group_cap), None, num_buckets,
        _TAGGED_SCHEMA.empty_table(), bucket_fn=pt_bucket,
    )
    out = _expand_profiles(_dedup_tagged(raw, num_buckets), num_buckets)
    if new_min_doc_id is None:
        return out

    def delta_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.schema.names:
            return _PAIR_SCHEMA.empty_table()
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        keep = (a < 0) | (a >= new_min_doc_id) | (b >= new_min_doc_id)
        return t.filter(pa.array(keep))

    return out.map_batches(delta_only, batch_format="pyarrow")
