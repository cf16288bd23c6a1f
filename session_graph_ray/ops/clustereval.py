"""Clustering-quality evaluation: pairwise precision / recall / F1, Rand
and Adjusted Rand — the BASELINE.json acceptance metric ("pairwise F1 on
labeled pairs") promoted to a first-class distributed operator so any
clustering the engine produces can be scored against a gold standard.

Everything derives from three exact integer aggregates of the
pred x gold contingency table (Hubert & Arabie 1985 for ARI):

    tp  = sum over cells      of C(n_pg, 2)   (pairs together in BOTH)
    pp  = sum over pred sizes of C(n_p, 2)    (pairs together in pred)
    gp  = sum over gold sizes of C(n_g, 2)    (pairs together in gold)

Distributed shape: three bucketed censuses (the
``ops/spandedup._bucketed_value_counts`` kernel — never a native
per-group aggregate) over compact packed-u64 label projections; each
census reduces to ONE partial-sum row per block, so the driver only ever
sees O(blocks) integers. The final metric row is pure scalar math.

Exactness contract: the integer aggregates are exact; the derived ratios
are single/fixed-order double operations on those integers, so the SQL
oracle reproduces them bit-for-bit (no float summation order anywhere).
Label packing requires 0 <= label < 2^32 and cluster sizes < 2^31
(validated, raising like ops/triangles._canonical_edges — pair counts
then fit int64 up to ~3e9 items).

Reference analog: the engine's own acceptance harness (eval.pairwise_f1)
scores labeled pairs; this operator scores whole clusterings, the way
``/root/reference/pipeline/link_entities.py:760-786`` tallies
linked/unlinked outcomes after a run.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .spandedup import _bucketed_value_counts

_U32 = np.uint64(0xFFFFFFFF)


def _pack_check(v: np.ndarray, what: str) -> np.ndarray:
    v64 = v.astype(np.int64, copy=False)
    if v64.size and (v64.min() < 0 or v64.max() >= 1 << 32):
        raise ValueError(f"{what} labels must be in [0, 2^32)")
    return v64.astype(np.uint64)


def _pairs_of_counts(counts: np.ndarray) -> int:
    c = counts.astype(np.int64, copy=False)
    if c.size and c.max() >= 1 << 31:
        raise ValueError("cluster size >= 2^31: pair count would overflow")
    return int((c * (c - 1) // 2).sum())


def _census_pair_sum(ds: "ray.data.Dataset", col: str) -> int:
    """Sum of C(count, 2) over the value census of ``col`` (u64), computed
    as one bucketed census + per-block constant partial sums."""
    census = _bucketed_value_counts(ds, col, out_val="v", out_cnt="c")

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([_pairs_of_counts(c)], pa.int64())})

    parts = census.map_batches(partial, batch_format="pyarrow").to_pandas()
    return int(parts["s"].sum()) if len(parts) else 0


def pairwise_cluster_eval(
    items: "ray.data.Dataset",
    pred_col: str,
    gold_col: str,
) -> "ray.data.Dataset":
    """One-row result: exact pair-level contingency integers plus pairwise
    precision / recall / F1 and Adjusted Rand in integer micro-units.

    ``items`` must hold one row per evaluated item with its predicted and
    gold cluster labels (any uint32-packable integers).
    """

    def project(t: pa.Table) -> pa.Table:
        p = _pack_check(
            t.column(pred_col).to_numpy(zero_copy_only=False), "pred")
        g = _pack_check(
            t.column(gold_col).to_numpy(zero_copy_only=False), "gold")
        return pa.table(
            {
                "p": pa.array(p, pa.uint64()),
                "g": pa.array(g, pa.uint64()),
                "cell": pa.array((p << np.uint64(32)) | (g & _U32),
                                 pa.uint64()),
            }
        )

    proj = items.select_columns([pred_col, gold_col]).map_batches(
        project, batch_format="pyarrow"
    ).materialize()

    n = proj.count()
    tp = _census_pair_sum(proj, "cell")
    pp = _census_pair_sum(proj, "p")
    gp = _census_pair_sum(proj, "g")

    # fixed-order scalar double math (mirrored literally by the SQL oracle)
    prec = tp / pp if pp else 0.0
    rec = tp / gp if gp else 0.0
    f1 = 2.0 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
    tot = n * (n - 1) // 2
    exp = (float(pp) * float(gp)) / float(tot) if tot else 0.0
    den = 0.5 * float(pp + gp) - exp
    ari = (float(tp) - exp) / den if den != 0.0 else 0.0

    def u6(x: float) -> int:
        return int(math.floor(x * 1000000 + 0.5))

    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n], pa.int64()),
                "tp_pairs": pa.array([tp], pa.int64()),
                "pred_pairs": pa.array([pp], pa.int64()),
                "gold_pairs": pa.array([gp], pa.int64()),
                "precision_u6": pa.array([u6(prec)], pa.int64()),
                "recall_u6": pa.array([u6(rec)], pa.int64()),
                "f1_u6": pa.array([u6(f1)], pa.int64()),
                "ari_u6": pa.array([u6(ari)], pa.int64()),
            }
        )
    )


def bcubed_eval(
    items: "ray.data.Dataset",
    pred_col: str,
    gold_col: str,
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """B-cubed precision / recall / F1 (Bagga & Baldwin 1998) — the
    item-averaged ER clustering metric, one exact-integer row.

    Definition used (integer-exact, oracle-replayable): each contingency
    cell (p, g, m = |cell|) contributes ``(1e6 * m * m) // n_p`` to the
    precision sum and ``(1e6 * m * m) // n_g`` to the recall sum (floor
    division PER CELL, the ops/pagerank.py integer-contribution idiom, so
    summation is order-free); then

        bcubed_precision_u6 = (2 * sumP + N) // (2 * N)   (half-up)
        bcubed_recall_u6    = (2 * sumR + N) // (2 * N)
        bcubed_f1_u6        = (2 * P * R) // (P + R)      (floor)

    Distributed shape: one packed-cell census (the bucketed ``np.unique``
    kernel), then the CELLS table — at most one row per item — exchanges
    twice (grouped by pred label, then by gold label); each kernel call
    emits one partial-sum row, so the driver sees O(buckets) integers.
    No broadcast, no per-group Python aggregate.
    """
    from .exchange import exchange_map_groups

    def project(t: pa.Table) -> pa.Table:
        p = _pack_check(
            t.column(pred_col).to_numpy(zero_copy_only=False), "pred")
        g = _pack_check(
            t.column(gold_col).to_numpy(zero_copy_only=False), "gold")
        return pa.table(
            {"cell": pa.array((p << np.uint64(32)) | (g & _U32),
                              pa.uint64())}
        )

    proj = items.select_columns([pred_col, gold_col]).map_batches(
        project, batch_format="pyarrow"
    ).materialize()
    n = proj.count()

    cells = _bucketed_value_counts(
        proj, "cell", out_val="cell", out_cnt="m",
        num_buckets=num_buckets,
    ).materialize()

    empty = pa.table({"s": pa.array([], pa.int64())})

    def side_sum(shift: int) -> int:
        """sum over cells of (1e6*m^2) // n_side, side = cell >> shift
        (shift 32 = pred) or cell & U32 (shift 0 = gold)."""

        def side_of(c: np.ndarray) -> np.ndarray:
            return (c >> np.uint64(32)) if shift else (c & _U32)

        def bucket_fn(t: pa.Table) -> np.ndarray:
            c = t.column("cell").to_numpy(zero_copy_only=False)
            return (side_of(c) % np.uint64(num_buckets)).astype(np.int64)

        def kern(g: pa.Table) -> pa.Table:
            c = g.column("cell").to_numpy(zero_copy_only=False)
            m = g.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
            s = side_of(c)
            order = np.argsort(s, kind="stable")
            s_s, m_s = s[order], m[order]
            starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
            n_side = np.add.reduceat(m_s, starts)
            n_rep = np.repeat(n_side, np.diff(np.r_[starts, s_s.size]))
            contrib = (1_000_000 * m_s * m_s) // n_rep
            return pa.table({"s": pa.array([int(contrib.sum())], pa.int64())})

        parts = exchange_map_groups(
            cells, kern, None, num_buckets, empty, bucket_fn=bucket_fn
        )
        total = 0
        for b in parts.iter_batches(batch_format="pandas"):
            if len(b):
                total += int(b["s"].sum())
        return total

    sum_p = side_sum(32)
    sum_r = side_sum(0)
    p_u6 = (2 * sum_p + n) // (2 * n) if n else 0
    r_u6 = (2 * sum_r + n) // (2 * n) if n else 0
    f1_u6 = (2 * p_u6 * r_u6) // (p_u6 + r_u6) if (p_u6 + r_u6) else 0

    n_cells = cells.count()
    return ray.data.from_arrow(
        pa.table(
            {
                "n_items": pa.array([n], pa.int64()),
                "n_cells": pa.array([n_cells], pa.int64()),
                "bcubed_precision_u6": pa.array([p_u6], pa.int64()),
                "bcubed_recall_u6": pa.array([r_u6], pa.int64()),
                "bcubed_f1_u6": pa.array([f1_u6], pa.int64()),
            }
        )
    )


def exact_assignments(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """(id, canonical) for exact-content groups: canonical = MIN(id) over
    rows with identical text (the assignment form of
    ops/dedup.exact_dedup_survivors — that one keeps only survivors, this
    one labels every row so clusterings can be compared item-by-item).
    Text identity travels as a sha256-prefix u64; ids never < 0."""
    import hashlib

    from .exchange import exchange_map_groups

    def key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sha = np.fromiter(
            (
                int.from_bytes(
                    hashlib.sha256(
                        (s or "").encode("utf-8", errors="surrogatepass")
                    ).digest()[:8],
                    "big",
                )
                for s in t.column(text_col).to_pylist()
            ),
            dtype=np.uint64,
            count=t.num_rows,
        )
        return pa.table(
            {id_col: pa.array(ids, pa.int64()),
             "__sha": pa.array(sha, pa.uint64())}
        )

    keyed = docs.select_columns([id_col, text_col]).map_batches(
        key, batch_format="pyarrow"
    )
    empty = pa.table(
        {id_col: pa.array([], pa.int64()),
         "canonical": pa.array([], pa.int64())}
    )

    def kernel(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        sha = g.column("__sha").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sha))
        ids_s, sha_s = ids[order], sha[order]
        starts = np.flatnonzero(np.r_[True, sha_s[1:] != sha_s[:-1]])
        canon = ids_s[np.repeat(starts, np.diff(np.r_[starts, sha_s.size]))]
        return pa.table(
            {id_col: pa.array(ids_s, pa.int64()),
             "canonical": pa.array(canon, pa.int64())}
        )

    def bucket_fn(t: pa.Table) -> np.ndarray:
        return (
            t.column("__sha").to_numpy(zero_copy_only=False)
            % np.uint64(256)
        ).astype(np.int64)

    return exchange_map_groups(keyed, kernel, None, 256, empty,
                               bucket_fn=bucket_fn)


__all__ = ["pairwise_cluster_eval", "bcubed_eval", "exact_assignments"]
