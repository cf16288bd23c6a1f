"""Two-table record linkage: link each row of a DIRTY table to its best
match in a REFERENCE table.

The self-dedup ER pipeline (``pipelines/er.py``) answers "which rows of ONE
corpus are the same entity"; this answers the other classic shape — "which
row of a curated reference does each incoming record correspond to" (the
reference repo's entity-linking step resolves mentions against an existing
canonical graph the same way, ``/root/reference/pipeline/link_entities.py:
578-641``). Everything heavy is the SAME machinery run once over the tagged
union: one blocking pass (census/prune/chunk/pair-gen with counted
truncation), one scorer-pool pass — no per-table rescans.

Side tagging: both sides' ``file_id_u64`` are content-hash ids; the top bit
is overwritten with the side (0 = reference, 1 = dirty), so

- cross-side pairs are ``(id_a ^ id_b) >> 63 == 1`` — one vectorized xor,
  no side lookup table shipped anywhere;
- within-side pairs (reference internal dups, dirty internal dups) are
  dropped BEFORE scoring — the scored pair count is the cross product the
  user asked about, not the union's self-join.

Overwriting one bit of a 64-bit content hash can in principle alias two
ids that differ only in that bit (~2^-63 per pair); ids remain unique
per side with the same probability budget the untagged pipeline already
accepts for hash ids.

Best-match semantics: per dirty row, the highest-scoring reference row at
or above ``cfg.score_threshold``, ties broken by smaller reference id —
an associative (partial-then-final) argmax, so it reduces in the house
bucketed two-level pattern with no global sort. Dirty rows with no
candidate above threshold are absent from the output (the caller left-joins
if they want explicit misses).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import ERConfig
from ..ops.join import broadcast_join
from ..ops.pairing import split_metric_rows
from ..stages.blocking import candidate_pairs
from ..stages.normalize import features_view, normalize, normalize_core
from ..stages.scoring import score_pairs

_TOP = np.uint64(1) << np.uint64(63)
_MASK = ~_TOP


def _tag_u64(ds: "ray.data.Dataset", side: int,
             cols: tuple[str, ...] = ("file_id_u64",)) -> "ray.data.Dataset":
    """Overwrite the top bit of each id column with ``side``."""
    bit = _TOP if side else np.uint64(0)

    def tag(t: pa.Table) -> pa.Table:
        for c in cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.uint64)
            t = t.set_column(
                t.schema.get_field_index(c), c,
                pa.array((v & _MASK) | bit, pa.uint64()),
            )
        return t

    return ds.map_batches(tag, batch_format="pyarrow")


def _cross_side_only(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.filter(pa.array(((a ^ b) & _TOP) != 0))

    return pairs.map_batches(f, batch_format="pyarrow")


def _best_ref_per_dirty(scores: "ray.data.Dataset", cfg: ERConfig
                        ) -> "ray.data.Dataset":
    """(id_a, id_b, score) -> per-dirty-id best reference row.

    Partial argmax per batch, bucketed final argmax per dirty id — the
    two-level reduce is exact because argmax by (score desc, ref id asc)
    is associative."""
    B = cfg.hash_buckets

    def orient_and_partial(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = t.column("score").to_numpy(zero_copy_only=False)
        keep = s >= cfg.score_threshold
        a, b, s = a[keep], b[keep], s[keep]
        a_dirty = (a & _TOP) != 0
        rid = np.where(a_dirty, a, b)   # dirty side
        lid = np.where(a_dirty, b, a)   # reference side
        # lexsort: last key is primary -> order by (rid, -score, lid)
        order = np.lexsort((lid, -s, rid))
        rid, lid, s = rid[order], lid[order], s[order]
        first = np.flatnonzero(np.r_[True, rid[1:] != rid[:-1]])
        return pa.table({
            "dirty_u64": pa.array(rid[first], pa.uint64()),
            "ref_u64": pa.array(lid[first], pa.uint64()),
            "score": pa.array(s[first], pa.float64()),
            "__bkt": pa.array((rid[first] % np.uint64(B)).astype(np.int64)),
        })

    def final(g: pa.Table) -> pa.Table:
        rid = g.column("dirty_u64").to_numpy(zero_copy_only=False)
        lid = g.column("ref_u64").to_numpy(zero_copy_only=False)
        s = g.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((lid, -s, rid))
        rid, lid, s = rid[order], lid[order], s[order]
        first = np.flatnonzero(np.r_[True, rid[1:] != rid[:-1]])
        return pa.table({
            "dirty_u64": pa.array(rid[first], pa.uint64()),
            "ref_u64": pa.array(lid[first], pa.uint64()),
            "score": pa.array(s[first], pa.float64()),
        })

    return (scores
            .map_batches(orient_and_partial, batch_format="pyarrow")
            .groupby("__bkt")
            .map_groups(final, batch_format="pyarrow"))


def run_er_link(
    ref_path: str,
    dirty_path: str,
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """Link every row of ``dirty_path`` to its best match in ``ref_path``.

    Returns (dirty_file_id, ref_file_id, score) — hex ids, one row per
    dirty record that matched at/above ``cfg.score_threshold``.
    """
    if cfg is None:
        from ..config import auto_config

        cfg = auto_config()

    ref_raw = ray.data.read_parquet(ref_path)
    dirty_raw = ray.data.read_parquet(dirty_path)

    core = _tag_u64(normalize_core(ref_raw, batch_size=cfg.batch_size), 0).union(
        _tag_u64(normalize_core(dirty_raw, batch_size=cfg.batch_size), 1)
    )
    pairs_raw = candidate_pairs(core, cfg)
    pairs_all, _metrics = split_metric_rows(pairs_raw, cfg)
    cross = _cross_side_only(pairs_all).materialize()

    feats = _tag_u64(features_view(normalize(ref_raw, batch_size=cfg.batch_size)), 0).union(
        _tag_u64(features_view(normalize(dirty_raw, batch_size=cfg.batch_size)), 1)
    ).materialize()
    n_feat = feats.count()

    scores = score_pairs(cross, feats, cfg, n_features=n_feat)
    links = _best_ref_per_dirty(scores, cfg).materialize()

    # id -> hex re-join (J7 shape), reusing the ALREADY-materialized tagged
    # feature table (no extra pass over content). Size-gated like the
    # scorer: small corpora broadcast the (u64 -> hex) map once, huge ones
    # go through the bucketed hash join — never an ungated driver pull.
    ids_hex = feats.select_columns(["file_id", "file_id_u64"])
    if n_feat <= cfg.feature_broadcast_limit:
        m = ids_hex.to_pandas()
        dirty_side = (m["file_id_u64"].to_numpy().astype(np.uint64)
                      & _TOP) != 0
        dirty_map = m[dirty_side].rename(columns={
            "file_id": "dirty_file_id", "file_id_u64": "dirty_u64"})
        ref_map = m[~dirty_side].rename(columns={
            "file_id": "ref_file_id", "file_id_u64": "ref_u64"})
        out = broadcast_join(links, dirty_map, left_on="dirty_u64")
        out = broadcast_join(out, ref_map, left_on="ref_u64")
    else:
        from ..ops.join import hash_join, rename_batches

        out = hash_join(
            links,
            rename_batches(ids_hex, {"file_id": "dirty_file_id",
                                     "file_id_u64": "dirty_u64"}),
            on="dirty_u64",
        )
        out = hash_join(
            out,
            rename_batches(ids_hex, {"file_id": "ref_file_id",
                                     "file_id_u64": "ref_u64"}),
            on="ref_u64",
        )
    return out.select_columns(["dirty_file_id", "ref_file_id", "score"])
