"""Canopy clustering: cheap-distance overlapping pre-blocks for ER.

McCallum, Nigam & Ungar (KDD'00): greedily pick centers; every point
within a LOOSE threshold of a center joins its canopy; points within a
TIGHT threshold stop being center candidates. Expensive pairwise work
then runs only within canopies. The cheap metric here is Jaccard
distance d = 1 - J over distinct-token hash sets (a true metric, which
the cover bound below relies on).

Distributed shape (the Mahout two-level scheme, made deterministic):

1. one record per doc (id, n, sorted token hashes) via ``map_batches``;
2. LOCAL greedy canopy per partition in ascending doc_id order — each
   partition emits its local centers (bounded: centers are pairwise
   farther than the tight radius, so their count is the packing number
   of the partition, not its size);
3. the local centers (small) gather to one task that runs the SAME
   greedy ascending doc_id → global centers — deterministic given the
   deterministic partitioner (hash of doc_id);
4. centers broadcast once via the object store; one vectorized
   assignment pass emits (doc_id, canopy_id, jacc_u) for every center
   with J >= ``t_loose``.

Cover guarantee (pytest-pinned): every doc is within tight distance of
a local center, and that center within tight distance of a global
center, so by triangle inequality every doc lies within 2*(1-t_tight)
of some global center. Choosing 1 - t_loose >= 2*(1 - t_tight)
guarantees every non-empty doc lands in >= 1 canopy.

Reference analog: the reference pre-gates entity comparisons per
blocking key before its expensive disambiguation
(``/root/reference/pipeline/link_entities.py:283-329``); canopies are
the published overlapping-cover generalization of that gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .setsim import _doc_distinct_tokens

_M = 1_000_000

_REC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n", pa.int64()),
    ("toks", pa.list_(pa.uint64())),
])

_ASSIGN_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("canopy_id", pa.int64()),
    ("jacc_u", pa.int64()),
])


def _doc_records(docs: "rd.Dataset", id_col: str, text_col: str) -> "rd.Dataset":
    def f(t: pa.Table) -> pa.Table:
        rows, hh, n = _doc_distinct_tokens(t.column(text_col))
        did = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_rows = n.size
        counts = np.bincount(rows, minlength=n_rows).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        toks = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(hh, pa.uint64())
        )
        keep = counts > 0  # empty docs join no canopy
        tbl = pa.table({
            "doc_id": pa.array(did), "n": pa.array(n), "toks": toks,
        })
        return tbl.filter(pa.array(keep))

    return docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )


def _jacc_u_vs_center(flat, offs, n, center_toks, center_n) -> np.ndarray:
    """Integer micro-unit Jaccard of every record against ONE center —
    one searchsorted over the batch's concatenated tokens."""
    if flat.size == 0:
        return np.zeros(n.size, np.int64)
    pos = np.searchsorted(center_toks, flat)
    pos_c = np.clip(pos, 0, max(center_toks.size - 1, 0))
    hit = (center_toks[pos_c] == flat) if center_toks.size else np.zeros(
        flat.size, bool
    )
    row_ids = np.repeat(np.arange(n.size, dtype=np.int64),
                        (offs[1:] - offs[:-1]))
    inter = np.bincount(row_ids[hit], minlength=n.size).astype(np.int64)
    union = n + center_n - inter
    out = np.zeros(n.size, np.int64)
    nz = union > 0
    out[nz] = (2 * _M * inter[nz] + union[nz]) // (2 * union[nz])
    return out


def _greedy_centers(did, n, flat, offs, t_tight_u: int):
    """Sequential greedy in ascending doc_id: a doc becomes a center iff
    its Jaccard to every earlier center is < t_tight. Returns center
    indices (into the given arrays)."""
    order = np.argsort(did, kind="stable")
    centers: list[int] = []
    c_toks: list[np.ndarray] = []
    c_n: list[int] = []
    for i in order:
        ti = flat[offs[i]:offs[i + 1]]
        ni = int(n[i])
        is_center = True
        for ct, cn in zip(c_toks, c_n):
            small, big = (ti, ct) if ti.size <= ct.size else (ct, ti)
            if big.size == 0:
                continue
            pos = np.searchsorted(big, small)
            pos[pos == big.size] = 0
            inter = int((big[pos] == small).sum())
            union = ni + cn - inter
            if union > 0 and _M * inter >= t_tight_u * union:
                is_center = False
                break
        if is_center:
            centers.append(int(i))
            c_toks.append(ti)
            c_n.append(ni)
    return centers


def canopy_assign(
    docs: "rd.Dataset",
    t_loose: float,
    t_tight: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
    max_centers: int = 100_000,
) -> tuple["rd.Dataset", dict]:
    """(doc_id, canopy_id, jacc_u) rows: every doc joins the canopy of
    every global center with token-Jaccard >= ``t_loose`` (loose);
    centers are greedily T-tight-separated (``t_tight`` >= ``t_loose``).
    Deterministic: records partition by hash(doc_id), both greedy levels
    scan ascending doc_id. With ``1 - t_loose >= 2*(1 - t_tight)`` every
    non-empty doc is covered (triangle inequality on Jaccard distance).

    ``max_centers`` bounds the broadcast center table; exceeding it
    raises (canopies with that many centers mean ``t_tight`` is set
    wrong for the corpus — a loud failure beats a silent mis-cover).
    """
    if not (0.0 < t_loose <= t_tight <= 1.0):
        raise ValueError("need 0 < t_loose <= t_tight <= 1")
    t_loose_u = int(round(t_loose * _M))
    t_tight_u = int(round(t_tight * _M))

    recs = _doc_records(docs, id_col, text_col)

    def part_fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part",
            pa.array((t.column("doc_id").to_numpy(zero_copy_only=False)
                      % num_partitions).astype(np.int32)),
        )

    def local_centers(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        toks = g.column("toks")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values.to_numpy(zero_copy_only=False)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = _greedy_centers(did, n, flat, offs, t_tight_u)
        sel = pa.array(np.asarray(idx, np.int64))
        return g.select(["doc_id", "n", "toks"]).take(sel)

    local = (
        recs.map_batches(part_fn, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(local_centers, batch_format="pyarrow")
        .materialize()
    )

    n_local = local.count()
    if n_local > max_centers:
        raise ValueError(
            f"{n_local} local canopy centers exceed max_centers="
            f"{max_centers}; raise t_tight or max_centers"
        )
    # global greedy over the (small) local-center table, ascending doc_id
    parts = [
        b for b in local.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not parts:
        return rd.from_arrow(_ASSIGN_SCHEMA.empty_table()), {
            "local_centers": 0, "global_centers": 0
        }
    lt = pa.concat_tables(parts).combine_chunks()
    did = lt.column("doc_id").to_numpy(zero_copy_only=False)
    n = lt.column("n").to_numpy(zero_copy_only=False)
    toks = lt.column("toks")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values.to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    gidx = _greedy_centers(did, n, flat, offs, t_tight_u)
    g_order = sorted(gidx, key=lambda i: int(did[i]))
    c_ids = np.array([int(did[i]) for i in g_order], np.int64)
    c_ns = np.array([int(n[i]) for i in g_order], np.int64)
    c_toks = [np.asarray(flat[offs[i]:offs[i + 1]]) for i in g_order]
    ref = ray.put((c_ids, c_ns, c_toks))

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return _ASSIGN_SCHEMA.empty_table()
        cids, cns, ctoks = ray.get(ref)
        did_b = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_b = t.column("n").to_numpy(zero_copy_only=False)
        tk = t.column("toks")
        if isinstance(tk, pa.ChunkedArray):
            tk = tk.combine_chunks()
        flat_b = tk.values.to_numpy(zero_copy_only=False)
        offs_b = tk.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        out_d: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        out_j: list[np.ndarray] = []
        for ci in range(cids.size):
            ju = _jacc_u_vs_center(flat_b, offs_b, n_b, ctoks[ci],
                                   int(cns[ci]))
            hit = ju >= t_loose_u
            if hit.any():
                out_d.append(did_b[hit])
                out_c.append(np.full(int(hit.sum()), cids[ci], np.int64))
                out_j.append(ju[hit])
        if not out_d:
            return _ASSIGN_SCHEMA.empty_table()
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_d)),
            "canopy_id": pa.array(np.concatenate(out_c)),
            "jacc_u": pa.array(np.concatenate(out_j)),
        })

    assigned = recs.map_batches(assign, batch_format="pyarrow")
    stats = {"local_centers": int(n_local), "global_centers": len(gidx)}
    return assigned, stats
