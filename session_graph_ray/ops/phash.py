"""Perceptual-hash image dedup (dHash + banded Hamming LSH).

The image-side twin of MinHash near-dedup: a 64-bit difference hash
(8x9 gray thumbnail, horizontal gradient signs — the classic dHash) is
robust to re-encode noise, so near-identical images land within a few
Hamming bits. Candidate generation is the pigeonhole band trick: split the
64-bit hash into 4 x 16-bit bands — any pair within Hamming distance 3
agrees EXACTLY on at least one band, so grouping by (band_idx, band_value)
finds every such pair with zero misses; the verify step is one vectorized
XOR + popcount. The same census/prune/cap discipline as text near-dedup
applies: singleton buckets drop in the census, per-bucket pair expansion is
capped with COUNTED truncation (a metric row, never a silent skip).

Decode runs in an actor-pool ``map_batches`` stage (stateless here, but the
actor shape matches ops/multimodal.MediaFeatureExtractor — per-payload
decode is inherently row-wise; the pool parallelizes it and quarantines
malformed payloads instead of failing the batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_BANDS = 4
_BAND_BITS = 16
ROUTE_METRIC = -1  # media_a value marking a truncation-metric row


def _ppm_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from a P6 PPM (the same header contract as
    ops/multimodal.decode_image, which returns features, not pixels)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    parts = payload.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    w, h = (int(x) for x in parts[1].split())
    pixels = np.frombuffer(parts[3][: w * h * 3], dtype=np.uint8)
    if pixels.size < w * h * 3:
        raise ValueError("truncated PPM body")
    return pixels.reshape(h, w, 3)


def dhash64(pixels: np.ndarray) -> np.uint64:
    """(h, w, 3) uint8 -> 64-bit dHash: 8x9 gray thumbnail, row-wise
    gradient signs."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h // 8).clip(max=h - 1)
    xs = (np.arange(10) * w // 9).clip(max=w - 1)
    thumb = np.empty((8, 9))
    for i in range(8):
        for j in range(9):
            y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            thumb[i, j] = gray[y0:y1, x0:x1].mean()
    bits = (thumb[:, 1:] > thumb[:, :-1]).ravel()
    return np.uint64(
        int.from_bytes(np.packbits(bits).tobytes(), "big"))


class PHasher:
    """Actor-pool stage: decode PPM payloads, emit (media_id, phash);
    malformed payloads quarantine as null phash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_h: list[int | None] = []
        for p in payloads:
            try:
                out_h.append(int(dhash64(_ppm_pixels(p))))
            except Exception:
                out_h.append(None)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "phash": pa.array(
                [np.int64(np.uint64(h)) if h is not None else None
                 for h in out_h], pa.int64()),
        })


def media_phashes(ds: "rd.Dataset", concurrency: int = 2,
                  batch_size: int = 128) -> "rd.Dataset":
    return ds.map_batches(PHasher, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays (byte-LUT
    popcount)."""
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    c = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        c += _POP[(x & np.uint64(0xFF)).astype(np.int64)]
        x >>= np.uint64(8)
    return c


def phash_dup_pairs(
    hashes: "rd.Dataset",
    max_dist: int = 3,
    bucket_cap: int = 4096,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """(media_a, media_b, dist) for every image pair within ``max_dist``
    Hamming bits whose hashes share a 16-bit band (guaranteed for
    max_dist <= 3 by pigeonhole). Pair expansion inside a band bucket is
    capped at ``bucket_cap`` rows with a COUNTED truncation metric row
    (media_a = '__truncated__', dist = dropped-pair count)."""
    if max_dist > _BANDS - 1:
        raise ValueError(
            f"banding guarantees recall only for max_dist <= {_BANDS - 1}")

    def explode(t: pa.Table) -> pa.Table:
        ph = t.column("phash")
        mask = pa.compute.is_valid(ph)
        t = t.filter(mask)
        h = t.column("phash").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        ids = t.column("media_id")
        n = len(h)
        bands = np.empty((n, _BANDS), dtype=np.int64)
        for b in range(_BANDS):
            bands[:, b] = ((h >> np.uint64(b * _BAND_BITS))
                           & np.uint64(0xFFFF)).astype(np.int64)
            bands[:, b] |= np.int64(b) << 16
        rep_ids = pa.concat_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray)
             else ids] * _BANDS) if n else pa.array([], pa.string())
        key = bands.T.ravel()  # band-major so ids repeat per band
        return pa.table({
            "bk": pa.array(key),
            "media_id": rep_ids,
            "phash": pa.array(
                np.tile(h.view(np.int64), _BANDS)),
            "__bkt": pa.array((key % num_buckets).astype(np.int32)),
        })

    exploded = hashes.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        bk = g.column("bk").to_numpy(zero_copy_only=False)
        ids = np.asarray(g.column("media_id").to_pylist(), dtype=object)
        h = g.column("phash").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        order = np.argsort(bk, kind="stable")
        bk, ids, h = bk[order], ids[order], h[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        counts = np.diff(np.r_[starts, len(bk)])
        out_a, out_b, out_d = [], [], []
        dropped = 0
        for s, c in zip(starts, counts):
            if c < 2:
                continue
            if c > bucket_cap:
                dropped += int(c * (c - 1) // 2
                               - bucket_cap * (bucket_cap - 1) // 2)
                c = bucket_cap
            seg_ids = ids[s:s + c]
            seg_h = h[s:s + c]
            iu, ju = np.triu_indices(c, k=1)
            d = hamming64(seg_h[iu], seg_h[ju])
            ok = d <= max_dist
            out_a.append(seg_ids[iu[ok]])
            out_b.append(seg_ids[ju[ok]])
            out_d.append(d[ok])
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            d = np.concatenate(out_d)
            lo = np.minimum(a, b).astype(str)
            hi = np.maximum(a, b).astype(str)
        else:
            lo = hi = np.array([], dtype=str)
            d = np.array([], dtype=np.int64)
        tbl = {"media_a": pa.array(lo, pa.string()),
               "media_b": pa.array(hi, pa.string()),
               "dist": pa.array(d.astype(np.int64))}
        if dropped:
            tbl = {
                "media_a": pa.array(list(lo) + ["__truncated__"]),
                "media_b": pa.array(list(hi) + [""]),
                "dist": pa.array(list(d.astype(np.int64)) + [dropped]),
            }
        return pa.table(tbl)

    cand = exploded.groupby("__bkt").map_groups(pairs,
                                                batch_format="pyarrow")

    # a pair can match in several bands — one bucketed distinct pass.
    # Truncation METRIC rows are excluded from the dedup and their dropped-
    # pair counts SUMMED (identical metric rows from different band buckets
    # would otherwise collapse to one, under-counting the truncation —
    # ADVICE r3): all metric rows share the ('__truncated__', '') key, so
    # they land in one pair bucket and the sum here is the global total.
    def dedup(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        metric = df["media_a"] == "__truncated__"
        out = df[~metric].drop_duplicates(["media_a", "media_b"])
        if metric.any():
            out = pd.concat(
                [out, pd.DataFrame({
                    "media_a": ["__truncated__"], "media_b": [""],
                    "dist": [int(df.loc[metric, "dist"].sum())],
                    "__pbkt": [df.loc[metric, "__pbkt"].iloc[0]],
                })],
                ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def pair_bkt(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64_np

        key = hash64_np(
            [a + "\x1f" + b for a, b in zip(
                t.column("media_a").to_pylist(),
                t.column("media_b").to_pylist())])
        return t.append_column(
            "__pbkt", pa.array((key % np.uint64(num_buckets)).astype(
                np.int32)))

    return (cand.map_batches(pair_bkt, batch_format="pyarrow")
            .groupby("__pbkt").map_groups(dedup, batch_format="pyarrow")
            .select_columns(["media_a", "media_b", "dist"]))
