"""Golden-record construction (survivorship) over duplicate clusters.

The classic last step of an entity-resolution pipeline: after dedup/linkage
groups records into clusters, elect ONE canonical value per field per
cluster under explicit, deterministic survivorship rules (reference parity:
the canonical-uri election in ``pipeline/link_entities.py:740-760`` keeps
only a winner id; this operator generalizes it to field-level merge).

Rules (all order-free and mergeable, so the reduce is one bucketed
exchange of compact rows — cluster payload never re-shuffles):

- ``min`` / ``max``  — numeric, temporal or string extremum
- ``count``          — cluster size
- ``mode``           — most frequent value; ties break to the SMALLEST
                       value, so the result is independent of partition
                       and batch layout (DuckDB's bare ``mode()`` is
                       unspecified under ties — an oracle must replay the
                       same (count DESC, value ASC) election)

Scale shape: the prep map projects only (cluster key, ruled columns) and
hash-buckets clusters into B=64 groups; each per-bucket kernel is
vectorized (dictionary-encode + argsort + reduceat; mode via a packed
(key, value) pair census then a per-key first-run take). The driver holds
nothing; output is one row per distinct cluster key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["golden_records"]

_B = 64


def _codes(col: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, "pa.Array"]:
    """Dictionary-encode any column -> (int64 codes, dictionary array)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    return (enc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            enc.dictionary)


def _value_ranks(col) -> tuple[np.ndarray, "pa.Array", np.ndarray]:
    """(per-row rank in sorted-dictionary order, dictionary, dict order).

    Ranks compare like the values themselves, so reduceat extrema and the
    mode tie-break run on plain int64s regardless of the value type.
    """
    vc, vdict = _codes(col)
    vorder = pc.sort_indices(vdict).to_numpy(zero_copy_only=False).astype(
        np.int64)
    rank = np.empty(len(vorder), dtype=np.int64)
    rank[vorder] = np.arange(len(vorder))
    return rank[vc], vdict, vorder


def golden_records(
    ds: "ray.data.Dataset",
    key_col: str,
    rules: dict[str, str],
) -> "ray.data.Dataset":
    """Reduce ``ds`` to one golden row per distinct ``key_col`` value.

    ``rules`` maps output column -> ``"<rule>:<input col>"`` where rule is
    one of min / max / count / mode ("count" takes no input: ``"count:"``).
    Integer keys bucket by value; any other key type buckets by the repo's
    stable 64-bit string hash (``functions.hashing.hash64_np``).
    """
    for out, spec in rules.items():
        rule = spec.split(":", 1)[0]
        if rule not in ("min", "max", "count", "mode"):
            raise ValueError(f"unknown survivorship rule {rule!r} for {out!r}")

    in_cols = [key_col] + sorted(
        {s.split(":", 1)[1] for s in rules.values() if s.split(":", 1)[1]
         and s.split(":", 1)[1] != key_col}
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(in_cols)
        key = t.column(key_col)
        if pa.types.is_integer(key.type):
            k = key.to_numpy(zero_copy_only=False).astype(np.int64)
            bkt = (k % _B).astype(np.int32)
        else:
            from ..functions.hashing import hash64_np

            h = hash64_np([str(v) for v in key.to_pylist()])
            bkt = (h % np.uint64(_B)).astype(np.int32)
        return t.append_column("__bkt", pa.array(bkt))

    def reduce_bucket(g: pa.Table) -> pa.Table:
        kc, kdict = _codes(g.column(key_col))
        order = np.argsort(kc, kind="stable")
        kc_s = kc[order]
        new = np.empty(len(kc_s), dtype=bool)
        new[:1] = True
        new[1:] = kc_s[1:] != kc_s[:-1]
        seg = np.flatnonzero(new)
        if not len(seg):
            out_cols = {key_col: kdict.take(pa.array([], pa.int64()))}
            for out in rules:
                out_cols[out] = pa.array([], pa.int64())
            return pa.table(out_cols)
        cols: dict[str, pa.Array] = {
            key_col: kdict.take(pa.array(kc_s[seg], pa.int64()))
        }
        sizes = np.diff(np.append(seg, len(kc_s)))
        for out, spec in rules.items():
            rule, _, src = spec.partition(":")
            if rule == "count":
                cols[out] = pa.array(sizes, pa.int64())
            elif rule in ("min", "max"):
                vr, vdict, vorder = _value_ranks(g.column(src))
                v = vr[order]
                red = (np.minimum if rule == "min" else np.maximum
                       ).reduceat(v, seg)
                cols[out] = vdict.take(pa.array(vorder[red], pa.int64()))
            else:  # mode with (count DESC, value ASC) tie-break
                vr, vdict, vorder = _value_ranks(g.column(src))
                if (int(kc.max(initial=0)) + 1) * (len(vorder) + 1) >= 2**63:
                    raise ValueError(
                        "survivorship mode: packed (key, value) census "
                        "exceeds int64 — bucket is implausibly large"
                    )
                pair = kc * np.int64(len(vorder) + 1) + vr
                up, cnt = np.unique(pair, return_counts=True)
                pk = up // (len(vorder) + 1)
                pv = up % (len(vorder) + 1)
                sel = np.lexsort((pv, -cnt, pk))
                pk, pv = pk[sel], pv[sel]
                first = np.empty(len(pk), dtype=bool)
                first[:1] = True
                first[1:] = pk[1:] != pk[:-1]
                win_k, win_v = pk[first], pv[first]
                # both win_k and kc_s[seg] are unique + ascending
                pos = np.searchsorted(win_k, kc_s[seg])
                cols[out] = vdict.take(pa.array(vorder[win_v[pos]],
                                                pa.int64()))
        return pa.table(cols)

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("__bkt")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )
