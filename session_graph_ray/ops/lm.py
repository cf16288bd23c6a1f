"""Corpus bigram language-model scoring (count-based perplexity proxy).

A classic data-curation signal (CCNet / Gopher-style quality pipelines score
documents with a small LM; the count-based variant here is its exact,
oracle-checkable core): train bigram counts over the corpus in one pass,
then score every document by the summed log-frequency of its bigrams —
high scores = made of common continuations, near-zero = mostly never-seen
bigrams. Reference analog: the repo the engine re-expresses scores entities
with corpus-derived statistics the same two-pass way (entity census then
per-record lookup, `/root/reference/pipeline/link_entities.py`).

Ray-Data plan (all stages stream; two bounded int exchanges):
  1. explode docs to (bigram_hash, doc_id) rows via ``spandedup._explode_grams``
     (dictionary-encode + vectorized polynomial window hash — no per-window
     Python);
  2. census with counts via ``_bucketed_value_counts`` — one row per distinct
     bigram, the shuffle ships 8-byte ints;
  3. occurrences pick up their gram's count: below the key gate the census
     broadcasts as (sorted keys, quantized-ln table) and the lookup is one
     searchsorted per batch (ln computed once per DISTINCT gram, not per
     occurrence); above it, a bucketed partitioned join;
  4. per-doc sums collapse per batch (np.unique + add.at) before ONE bucketed
     combine; a left join back to the doc table keeps <2-token docs at 0.

Output contract: per-occurrence contributions are quantized to integer
micro-units ``floor(ln(count)*1e6 + 0.5)`` BEFORE summation (the bm25 /
doc_char_jaccard pattern), so per-doc sums are exact int64 — no float
summation-order hazard, and the DuckDB oracle reproduces them value-for-value
on bigram STRINGS (which also guards hash-collision behavior at test scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .spandedup import (
    BROADCAST_MAX_KEYS,
    _bucketed_value_counts,
    _explode_grams,
)


def _sum_by_doc(num_buckets: int = 64):
    """Per-batch partial: sum (contrib_u, 1) per g_doc_id, bucket-tagged."""

    def f(t: pa.Table) -> pa.Table:
        d = t["g_doc_id"].to_numpy(zero_copy_only=False)
        c = t["contrib_u"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(vals), dtype=np.int64)
        n = np.zeros(len(vals), dtype=np.int64)
        np.add.at(s, inv, c)
        np.add.at(n, inv, 1)
        return pa.table({
            "g_doc_id": pa.array(vals, pa.int64()),
            "lm_score_u": pa.array(s),
            "n_bigrams": pa.array(n),
            "__bkt": pa.array((vals % num_buckets).astype(np.int32)),
        })

    return f


def _combine_doc(g: pa.Table) -> pa.Table:
    d = g["g_doc_id"].to_numpy(zero_copy_only=False)
    s = g["lm_score_u"].to_numpy(zero_copy_only=False)
    n = g["n_bigrams"].to_numpy(zero_copy_only=False)
    vals, inv = np.unique(d, return_inverse=True)
    ss = np.zeros(len(vals), dtype=np.int64)
    nn = np.zeros(len(vals), dtype=np.int64)
    np.add.at(ss, inv, s)
    np.add.at(nn, inv, n)
    return pa.table({
        "g_doc_id": pa.array(vals, pa.int64()),
        "lm_score_u": pa.array(ss),
        "n_bigrams": pa.array(nn),
    })


def bigram_lm_scores(
    ds: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max: int = BROADCAST_MAX_KEYS,
) -> "rd.Dataset":
    """Per-doc (n_bigrams, lm_score_u) over the corpus's own bigram LM.

    ``lm_score_u`` = sum over the doc's bigram instances of
    ``floor(ln(corpus_count)*1e6 + 0.5)`` — exact int64 by construction.
    Docs with fewer than 2 tokens report (0, 0).
    """
    grams = ds.map_batches(
        _explode_grams(2, id_col, text_col),
        batch_format="pyarrow", batch_size=4096,
    )
    grams = grams.materialize()  # probed twice: census build + scoring pass
    census = _bucketed_value_counts(
        grams, "gram_h", "bg_h", "cnt"
    ).materialize()

    if census.count() <= broadcast_max:
        import ray

        cdf = census.to_pandas()
        keys = cdf["bg_h"].to_numpy()
        order = np.argsort(keys)
        keys = keys[order]
        # ln once per DISTINCT gram; occurrences just gather
        lnq = np.floor(
            np.log(cdf["cnt"].to_numpy()[order].astype(np.float64))
            * 1e6 + 0.5
        ).astype(np.int64)
        ref = ray.put((keys, lnq))

        def lookup(t: pa.Table) -> pa.Table:
            k, q = ray.get(ref)
            v = t["gram_h"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(k, v)  # every occ gram is in the census
            return pa.table({
                "g_doc_id": t["g_doc_id"],
                "contrib_u": pa.array(q[idx]),
            })

        occ = grams.map_batches(lookup, batch_format="pyarrow")
    else:
        from .join import bucket_join

        joined = bucket_join(
            grams, census, left_on="gram_h", right_on="bg_h",
            left_schema=pa.schema([("gram_h", pa.int64()),
                                   ("g_doc_id", pa.int64())]),
            right_schema=pa.schema([("bg_h", pa.int64()),
                                    ("cnt", pa.int64())]),
        )

        def quantize(t: pa.Table) -> pa.Table:
            c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({
                "g_doc_id": t["g_doc_id"],
                "contrib_u": pa.array(
                    np.floor(np.log(c) * 1e6 + 0.5).astype(np.int64)),
            })

        occ = joined.map_batches(quantize, batch_format="pyarrow")

    per_doc = (occ.map_batches(_sum_by_doc(), batch_format="pyarrow")
               .groupby("__bkt")
               .map_groups(_combine_doc, batch_format="pyarrow"))

    def ids_only(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column(id_col)})

    tot = ds.map_batches(ids_only, batch_format="pyarrow", batch_size=8192)
    per_mat = per_doc.materialize()
    if per_mat.count() <= broadcast_max:
        from .join import broadcast_join

        joined = broadcast_join(tot, per_mat.to_pandas(), left_on=id_col,
                                right_on="g_doc_id", how="left")
    else:
        from .join import bucket_join

        joined = bucket_join(
            tot, per_mat, left_on=id_col, right_on="g_doc_id", how="left",
            left_schema=pa.schema([(id_col, pa.int64())]),
            right_schema=pa.schema([("g_doc_id", pa.int64()),
                                    ("lm_score_u", pa.int64()),
                                    ("n_bigrams", pa.int64())]),
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_bigrams": pc.cast(pc.fill_null(t["n_bigrams"], 0), pa.int64()),
            "lm_score_u": pc.cast(pc.fill_null(t["lm_score_u"], 0),
                                  pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
