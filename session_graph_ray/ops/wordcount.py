"""Corpus vocabulary operators: global token frequencies (word-count with
per-batch partial aggregation) and per-document vocabulary stats.

Parity target: the reference's SPARQL hub/frequency reports (SURVEY.md §2.7
A8, ``/root/reference/pipeline/sample_queries.sparql``) generalized to token
space — the classic wide `GROUP BY token` expressed the scale-safe way:
each batch collapses to its own (token, n) partial via ``pc.value_counts``
BEFORE the shuffle, so the groupby exchanges at most |vocab| rows per block
instead of one row per token occurrence. At 100 TB the exchange volume is
bounded by vocab × blocks, not corpus tokens.

Token contract (shared with the DuckDB oracle): a token is a ``\\S+`` run —
``regexp_extract_all(text, '\\S+')`` on the SQL side, Arrow
``split_pattern_regex`` + empty-string drop here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_TOKEN_SPLIT = r"\s+"


def _flat_tokens(col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Split a utf8 column into (flat token array, per-row token counts).

    Empty strings produced by leading/trailing separators are dropped, so
    counts equal ``len(s.split())`` / the oracle's ``\\S+`` match count.
    """
    lists = pc.split_pattern_regex(col, _TOKEN_SPLIT)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, pa.scalar(""))
    if pc.all(keep).as_py() is not True:
        # drop empties and fix the per-row counts via the row-id of each slot
        row_ids = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        lengths = np.bincount(row_ids[keep_np], minlength=len(lengths)).astype(np.int64)
    return flat, lengths.astype(np.int64)


def token_frequencies(
    ds: "rd.Dataset", text_col: str = "text"
) -> "rd.Dataset":
    """Global (token, n) frequency table.

    Per-batch ``value_counts`` partials feed the reduce — the
    combiner-before-shuffle pattern (SURVEY.md §2.7 A1 scale note).

    The reduce buckets partials by token hash and sums inside ONE vectorized
    kernel per bucket (dictionary-encode + np.add.at) — a native
    ``groupby(token).aggregate(Sum)`` would pay per-group Python overhead on
    a web-scale vocabulary (see ops/spandedup._bucketed_value_counts).
    """
    B = 64

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64_np

        flat, _ = _flat_tokens(t.column(text_col))
        vc = pc.value_counts(flat)
        toks = vc.field("values")
        bkt = (hash64_np(toks.to_pylist()) % np.uint64(B)).astype(np.int32)
        return pa.table(
            {
                "token": toks,
                "n": pc.cast(vc.field("counts"), pa.int64()),
                "__bkt": pa.array(bkt),
            }
        )

    def kern(g: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(g.column("token"))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(sums, codes, g.column("n").to_numpy(zero_copy_only=False))
        return pa.table({"token": enc.dictionary, "n": pa.array(sums)})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    return parts.groupby("__bkt").map_groups(kern, batch_format="pyarrow")


def top_k_tokens(
    ds: "rd.Dataset", k: int = 30, text_col: str = "text"
) -> "rd.Dataset":
    """Top-k corpus tokens by frequency, ties broken by token asc."""
    freq = token_frequencies(ds, text_col=text_col)
    return freq.sort(["n", "token"], descending=[True, False]).limit(k)


def vocab_stats(
    ds: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "rd.Dataset":
    """Per-document vocabulary stats: n_tokens, n_distinct, ttr_permille.

    type-token ratio reported as ``floor(1000 * distinct / total)`` (integer
    permille — the repo's exact-hash contract for ratio outputs). Distinct
    counting is fully vectorized: dictionary-encode the flat token array,
    lexsort (row, code), count group starts per row with bincount. Rows with
    zero tokens are dropped (the SQL oracle's unnest emits no row for them).
    """

    def f(t: pa.Table) -> pa.Table:
        flat, lengths = _flat_tokens(t.column(text_col))
        n_rows = len(lengths)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.column(id_col).type),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "ttr_permille": pa.array([], pa.int64()),
                }
            )
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, row_ids))
        r_s, c_s = row_ids[order], codes[order]
        starts = np.ones(len(r_s), dtype=bool)
        starts[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
        distinct = np.bincount(r_s[starts], minlength=n_rows).astype(np.int64)
        keep = lengths > 0
        ttr = np.zeros(n_rows, dtype=np.int64)
        ttr[keep] = (1000 * distinct[keep]) // lengths[keep]
        return pa.table(
            {
                id_col: t.column(id_col).filter(pa.array(keep)),
                "n_tokens": pa.array(lengths[keep]),
                "n_distinct": pa.array(distinct[keep]),
                "ttr_permille": pa.array(ttr[keep]),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=8192)


def repetition_stats(
    ds: "rd.Dataset",
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Per-doc repetition metrics (Gopher-rule family, Rae et al. 2021):
    the within-doc occurrence count of the most frequent n-gram and the
    fraction of tokens it covers (integer permille, floor).

    Pure map-side — no shuffle: each doc's grams are counted inside the
    batch kernel via hash + lexsort + run-length, max per row with
    ``np.maximum.at``. Docs with < n tokens report 0 / 0.
    """
    from ..functions.hashing import hash64_np
    from ..functions.minhash import mix64

    P = np.uint64(0x100000001B3)

    def f(t: pa.Table) -> pa.Table:
        flat, lengths = _flat_tokens(t.column(text_col))
        n_rows = len(lengths)
        mx = np.zeros(n_rows, dtype=np.int64)
        if len(flat) >= n:
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            th = mix64(hash64_np(enc.dictionary.to_pylist()))[codes]
            row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
            m = len(th) - n + 1
            h = np.zeros(m, dtype=np.uint64)
            mult = np.uint64(1)
            with np.errstate(over="ignore"):
                for k in range(n):
                    h += th[k : k + m] * mult
                    mult *= P
            valid = row_ids[:m] == row_ids[n - 1 :]
            gr, gh = row_ids[:m][valid], h[valid]
            if len(gr):
                order = np.lexsort((gh, gr))
                gr_s, gh_s = gr[order], gh[order]
                start = np.ones(len(gr_s), dtype=bool)
                start[1:] = (gr_s[1:] != gr_s[:-1]) | (gh_s[1:] != gh_s[:-1])
                sidx = np.nonzero(start)[0]
                run = np.diff(np.append(sidx, len(gr_s)))
                np.maximum.at(mx, gr_s[sidx], run)
        cover = np.zeros(n_rows, dtype=np.int64)
        nz = lengths > 0
        cover[nz] = (1000 * n * mx[nz]) // lengths[nz]
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(lengths),
                f"max_{n}gram_count": pa.array(mx),
                f"top{n}_cover_permille": pa.array(cover),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=8192)
