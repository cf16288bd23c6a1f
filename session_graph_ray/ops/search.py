"""Keyword / BM25 text search over a documents table.

Search is query-term-sparse: only tokens that appear in some query matter,
so the whole index never materializes. Plan (both entry points):

  1. broadcast the query-term vocabulary (tiny) via ``ray.put``;
  2. one ``map_batches`` computes per-doc term frequencies FOR QUERY TERMS
     ONLY (dictionary-encode + bincount — no Python row loop) plus doc
     length; emits one sparse (doc, term, tf) row per hit;
  3. document frequencies per term reduce from per-batch partials (bounded
     by |query vocab| × blocks);
  4. scoring + per-query partial top-k inside ``map_batches``; a final tiny
     sort/limit per query.

``keyword_topk`` scores with integers (sum of tf over matched terms, then
number of distinct matched terms, then doc_id asc) — exactly reproducible
in SQL, which the ``keyword_search`` oracle checks value-for-value.
``bm25_topk`` is the classic Okapi BM25 (k1/b) with per-term contributions
quantized to integer micro-units before summation, so it too is exactly
SQL-reproducible (the ``bm25_docs`` oracle) and additionally pinned by a
pytest against a brute-force reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .wordcount import _flat_tokens


def _term_hits(
    ds: "rd.Dataset",
    terms: list[str],
    id_col: str,
    text_col: str,
) -> "rd.Dataset":
    """Sparse (doc_id, term_idx, tf, doc_len) rows for query terms only."""
    term_ref = ray.put({t: i for i, t in enumerate(terms)})

    def f(t: pa.Table) -> pa.Table:
        tmap = ray.get(term_ref)
        flat, lengths = _flat_tokens(t.column(text_col))
        n_rows = len(lengths)
        doc_ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table(
                {
                    "h_doc_id": pa.array([], pa.int64()),
                    "term_idx": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "doc_len": pa.array([], pa.int64()),
                }
            )
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dvals = enc.dictionary.to_pylist()
        # map each DISTINCT token to a query-term index (or -1)
        d2t = np.array([tmap.get(v, -1) for v in dvals], dtype=np.int64)
        tcode = d2t[codes]
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
        sel = tcode >= 0
        if not sel.any():
            return pa.table(
                {
                    "h_doc_id": pa.array([], pa.int64()),
                    "term_idx": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "doc_len": pa.array([], pa.int64()),
                }
            )
        r, c = row_ids[sel], tcode[sel]
        # per (row, term) counts via flat bincount on r * T + c
        T = len(tmap)
        flatkey = r * T + c
        counts = np.bincount(flatkey, minlength=0)
        nz = np.nonzero(counts)[0]
        rr, cc = nz // T, nz % T
        return pa.table(
            {
                "h_doc_id": pa.array(doc_ids[rr], pa.int64()),
                "term_idx": pa.array(cc),
                "tf": pa.array(counts[nz].astype(np.int64)),
                "doc_len": pa.array(lengths[rr]),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=8192)


def _term_df(hits: "rd.Dataset", n_terms: int) -> np.ndarray:
    """Per-term document frequency, reduced DISTRIBUTED (VERDICT r3 #2 —
    the old ``hits.to_pandas()`` pulled one row per (doc x matched term)
    to the driver, unbounded for a common term at corpus scale).

    ``_term_hits`` emits exactly one row per (doc, query-term) — a doc's
    rows never split across batches because each input ROW is a doc — so
    df(term) is a plain row count per term_idx. Each batch ships one
    bincount partial (<= n_terms ints); a native Sum groupby reduces them
    and the driver materializes O(|query vocab|) rows only."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ti = t["term_idx"].to_numpy(zero_copy_only=False)
        c = np.bincount(ti, minlength=n_terms).astype(np.int64)
        nz = np.flatnonzero(c)
        return pa.table({
            "term_idx": pa.array(nz.astype(np.int64)),
            "c": pa.array(c[nz]),
        })

    rows = (hits.map_batches(partial, batch_format="pyarrow")
            .groupby("term_idx")
            .aggregate(Sum("c", alias_name="c"))
            .take_all())
    df = np.zeros(n_terms, dtype=np.float64)
    for r in rows:
        df[int(r["term_idx"])] = float(r["c"])
    return df


def keyword_topk(
    ds: "rd.Dataset",
    queries: dict[int, list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Integer-scored keyword search: per query, top-k docs by
    (sum tf over matched terms DESC, distinct matched terms DESC, doc_id
    ASC). Exact and SQL-reproducible. Returns (query_id, doc_id, tf_sum,
    n_terms, rank 1..k)."""
    terms = sorted({t for ts in queries.values() for t in ts})
    t2i = {t: i for i, t in enumerate(terms)}
    hits = _term_hits(ds, terms, id_col, text_col)
    # query membership matrix broadcast: term_idx -> list of query ids
    q_of_term: dict[int, list[int]] = {}
    for qid, ts in queries.items():
        for t in set(ts):
            q_of_term.setdefault(t2i[t], []).append(qid)
    qref = ray.put(q_of_term)

    def expand(t: pa.Table) -> pa.Table:
        qmap = ray.get(qref)
        ti = t["term_idx"].to_numpy(zero_copy_only=False)
        reps = np.array([len(qmap.get(int(x), ())) for x in ti], dtype=np.int64)
        qids = np.concatenate(
            [np.asarray(qmap.get(int(x), ()), dtype=np.int64) for x in ti]
        ) if len(ti) else np.array([], dtype=np.int64)
        idx = np.repeat(np.arange(len(ti)), reps)
        return pa.table(
            {
                "query_id": pa.array(qids),
                "h_doc_id": pa.array(
                    t["h_doc_id"].to_numpy(zero_copy_only=False)[idx]),
                "tf": pa.array(t["tf"].to_numpy(zero_copy_only=False)[idx]),
            }
        )

    per_q = hits.map_batches(expand, batch_format="pyarrow")

    # reduce per (query, doc): one vectorized kernel per query-hash bucket
    def add_bkt(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        return t.append_column("__bkt", pa.array((q % 16).astype(np.int32)))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        q = g["query_id"].to_numpy()
        d = g["h_doc_id"].to_numpy()
        tf = g["tf"].to_numpy()
        order = np.lexsort((d, q))
        qs, ds_, tfs = q[order], d[order], tf[order]
        start = np.ones(len(qs), dtype=bool)
        start[1:] = (qs[1:] != qs[:-1]) | (ds_[1:] != ds_[:-1])
        gid = np.cumsum(start) - 1
        n_g = int(gid[-1]) + 1 if len(gid) else 0
        tf_sum = np.bincount(gid, weights=tfs, minlength=n_g).astype(np.int64)
        n_terms = np.bincount(gid, minlength=n_g).astype(np.int64)
        uq, ud = qs[start], ds_[start]
        out = []
        for qid in np.unique(uq):
            m = uq == qid
            o = np.lexsort((ud[m], -n_terms[m], -tf_sum[m]))[:k]
            sel = np.nonzero(m)[0][o]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": uq[sel],
                        "doc_id": ud[sel],
                        "tf_sum": tf_sum[sel],
                        "n_terms": n_terms[sel],
                        "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "tf_sum": [],
                 "n_terms": [], "rank": []}
            ).astype(np.int64)
        return pd.concat(out, ignore_index=True)

    return (
        per_q.map_batches(add_bkt, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(kern)
    )


def bm25_topk(
    ds: "rd.Dataset",
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Okapi BM25 top-k per query. idf = ln((N - df + 0.5) / (df + 0.5) + 1).

    Scores are exact integer micro-units: each (doc, term) contribution is
    quantized to ``floor(x*1e6 + 0.5)`` BEFORE summation, so the per-doc
    score is order-independent and bit-reproducible in SQL — the
    ``bm25_docs`` DuckDB oracle checks (query_id, doc_id, score_u, rank)
    value-for-value (the doc_char_jaccard micro-unit pattern; VERDICT r2
    #6). ``score`` = score_u / 1e6 is also returned; ranking ties break
    (-score_u, doc_id).

    Corpus stats (N, avg doc len, per-term df) reduce from per-batch
    partials, then broadcast; scoring is one vectorized pass."""
    terms = sorted({t for ts in queries.values() for t in ts})
    hits = _term_hits(ds, terms, id_col, text_col).materialize()

    # corpus size and average length from one cheap stats pass
    def len_partial(t: pa.Table) -> pa.Table:
        _, lengths = _flat_tokens(t.column(text_col))
        return pa.table(
            {
                "n": pa.array([len(lengths)], pa.int64()),
                "s": pa.array([int(lengths.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(len_partial, batch_format="pyarrow").to_pandas()
    n_docs, avg_len = int(agg.n.sum()), float(agg.s.sum() / max(agg.n.sum(), 1))

    df = _term_df(hits, len(terms))
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    idf_ref = ray.put(idf)
    q_terms = {qid: np.array(sorted({t for t in ts if t in set(terms)}))
               for qid, ts in queries.items()}
    qt_idx = {qid: np.array([terms.index(t) for t in ts], dtype=np.int64)
              for qid, ts in q_terms.items()}
    qt_ref = ray.put(qt_idx)

    def score(t: pa.Table) -> pa.Table:
        idf_v = ray.get(idf_ref)
        qts = ray.get(qt_ref)
        d = t["h_doc_id"].to_numpy(zero_copy_only=False)
        ti = t["term_idx"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["doc_len"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl / max(avg_len, 1e-9))
        # integer micro-units per (doc, term): summation order stops
        # mattering, so the SQL oracle reproduces scores exactly
        contrib = np.floor(
            idf_v[ti] * tf * (k1 + 1.0) / denom * 1e6 + 0.5
        )
        frames = []
        for qid, tidx in qts.items():
            sel = np.isin(ti, tidx)
            if not sel.any():
                continue
            dd = d[sel]
            order = np.argsort(dd, kind="stable")
            dd, cc = dd[order], contrib[sel][order]
            start = np.ones(len(dd), dtype=bool)
            start[1:] = dd[1:] != dd[:-1]
            gid = np.cumsum(start) - 1
            # micro-unit weights are ints <= ~1e7; float64 bincount sums
            # them exactly (far below 2^53)
            s = np.bincount(gid, weights=cc).astype(np.int64)
            docs = dd[start]
            # NO top-k here: the score is additive and a doc's rows may
            # split across batches — truncating a partial sum drops score.
            # Volume is bounded by (docs matching any query term) x queries.
            frames.append(
                pd.DataFrame({"query_id": qid, "doc_id": docs, "score_u": s})
            )
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "score_u": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    partial = hits.map_batches(score, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg2 = g.groupby("doc_id", as_index=False).score_u.sum()
        agg2["query_id"] = g["query_id"].iloc[0]
        agg2 = agg2.sort_values(["score_u", "doc_id"],
                                ascending=[False, True]).head(k)
        agg2["score"] = agg2["score_u"] / 1e6
        agg2["rank"] = np.arange(1, len(agg2) + 1, dtype=np.int64)
        return agg2[["query_id", "doc_id", "score_u", "score", "rank"]]

    return partial.groupby("query_id").map_groups(final)
