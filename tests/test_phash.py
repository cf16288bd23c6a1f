"""Perceptual-hash image dedup (ops/phash.py): planted exact and noisy
copies recovered; banding recall guarantee; counted truncation."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.multimodal import _make_ppm
from session_graph_ray.ops.phash import (
    dhash64,
    hamming64,
    media_phashes,
    phash_dup_pairs,
)


def _smooth_ppm(seed: int, w: int = 48, h: int = 48,
                noise: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    base = ((gx * rng.uniform(0.3, 1.0) + gy * rng.uniform(0.3, 1.0)) / 2)
    img = np.stack([base] * 3, axis=2)
    if noise:
        img = img + rng.randint(-noise, noise + 1, size=img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _table():
    rng = np.random.RandomState(0)
    ids, payloads = [], []
    for i in range(30):  # distinct smooth images
        ids.append(f"img{i:03d}")
        payloads.append(_smooth_ppm(seed=100 + i))
    ids.append("dup_exact")            # exact copy of img000
    payloads.append(payloads[0])
    ids.append("dup_noisy")            # lightly-noised copy of img001
    payloads.append(_smooth_ppm(seed=101, noise=2))
    ids.append("random")               # pure-noise image, no dup
    payloads.append(_make_ppm(rng, 48, 48))
    ids.append("broken")               # malformed payload -> quarantined
    payloads.append(b"NOTAPPM")
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    })


def test_phash_dup_pairs_recover_planted_copies():
    ds = rd.from_arrow(_table()).repartition(3)
    hashes = media_phashes(ds).materialize()
    hdf = hashes.to_pandas().set_index("media_id")
    assert hdf.loc["broken"].phash is None or np.isnan(
        hdf.loc["broken"].phash)  # quarantined, not failed
    pairs = phash_dup_pairs(hashes, max_dist=3).to_pandas()
    got = {(a, b) for a, b in zip(pairs.media_a, pairs.media_b)
           if a != "__truncated__"}
    assert ("dup_exact", "img000") in got
    d_exact = pairs.set_index(["media_a", "media_b"]).loc[
        ("dup_exact", "img000"), "dist"]
    assert int(d_exact) == 0
    assert ("dup_noisy", "img001") in got
    # no pair involves the quarantined or pure-noise rows
    flat = {m for p in got for m in p}
    assert "broken" not in flat


def test_banding_guarantee_and_hamming_kernel():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 2**63, size=200).astype(np.uint64)
    flips = rng.randint(0, 64, size=200).astype(np.uint64)
    b = a ^ (np.uint64(1) << flips)
    assert (hamming64(a, b) == 1).all()
    assert (hamming64(a, a) == 0).all()
    # any hash pair at distance <= 3 shares at least one 16-bit band
    for _ in range(100):
        x = np.uint64(rng.randint(0, 2**63))
        y = x
        for f in rng.choice(64, size=3, replace=False):
            y ^= np.uint64(1) << np.uint64(f)
        shared = any(
            (int(x) >> (16 * j)) & 0xFFFF == (int(y) >> (16 * j)) & 0xFFFF
            for j in range(4))
        assert shared


def test_truncation_is_counted():
    # 20 identical images -> one giant band bucket; cap at 5 rows
    payload = _smooth_ppm(seed=1)
    t = pa.table({
        "media_id": pa.array([f"c{i:02d}" for i in range(20)], pa.string()),
        "payload": pa.array([payload] * 20, pa.large_binary()),
    })
    hashes = media_phashes(rd.from_arrow(t)).materialize()
    pairs = phash_dup_pairs(hashes, max_dist=0, bucket_cap=5).to_pandas()
    metrics = pairs[pairs.media_a == "__truncated__"]
    kept = pairs[pairs.media_a != "__truncated__"]
    assert len(metrics) > 0 and metrics.dist.sum() > 0
    # kept pairs + counted-dropped pairs account for every pair per band
    assert len(kept) < 20 * 19 // 2


def test_resize_images_roundtrip_and_quarantine():
    from session_graph_ray.ops.multimodal import resize_images
    from session_graph_ray.ops.phash import _ppm_pixels

    t = pa.table({
        "media_id": pa.array(["a", "b", "bad"], pa.string()),
        "payload": pa.array([_smooth_ppm(1, w=40, h=24),
                             _smooth_ppm(2, w=9, h=31),
                             b"NOTPPM"], pa.large_binary()),
    })
    out = (resize_images(rd.from_arrow(t), out_w=16, out_h=12)
           .to_pandas().set_index("media_id"))
    for mid in ["a", "b"]:
        assert out.loc[mid, "decode_error"] is None
        px = _ppm_pixels(out.loc[mid, "payload"])
        assert px.shape == (12, 16, 3)
    assert out.loc["bad", "payload"] is None
    assert "ValueError" in out.loc["bad", "decode_error"]
    # nearest-neighbor: resizing a constant-gradient image preserves
    # monotonicity along x
    px = _ppm_pixels(out.loc["a", "payload"]).astype(int).mean(axis=2)
    assert (np.diff(px.mean(axis=0)) >= 0).all()


def test_resize_then_phash_composition():
    from session_graph_ray.ops.multimodal import resize_images
    from session_graph_ray.ops.phash import media_phashes, phash_dup_pairs

    # resize normalizes scale: the same scene at 2x resolution becomes a
    # near-dup after resize
    t = pa.table({
        "media_id": pa.array(["small", "large", "other"], pa.string()),
        "payload": pa.array([_smooth_ppm(3, w=24, h=24),
                             _smooth_ppm(3, w=48, h=48),
                             _smooth_ppm(99, w=24, h=24)],
                            pa.large_binary()),
    })
    resized = resize_images(rd.from_arrow(t), out_w=16, out_h=16)
    hashes = media_phashes(resized.select_columns(
        ["media_id", "payload"])).materialize()
    pairs = phash_dup_pairs(hashes, max_dist=3).to_pandas()
    got = set(zip(pairs.media_a, pairs.media_b))
    assert ("large", "small") in got


def test_truncation_counts_sum_across_band_buckets():
    """ADVICE r3: identical metric rows from different band buckets must
    SUM, not collapse in the pair-dedup. 20 identical images, cap 5: each
    of the 4 bands drops C(20,2)-C(5,2)=180 pairs -> exactly 720 total."""
    payload = _smooth_ppm(seed=1)
    t = pa.table({
        "media_id": pa.array([f"c{i:02d}" for i in range(20)], pa.string()),
        "payload": pa.array([payload] * 20, pa.large_binary()),
    })
    hashes = media_phashes(rd.from_arrow(t)).materialize()
    pairs = phash_dup_pairs(hashes, max_dist=0, bucket_cap=5).to_pandas()
    metrics = pairs[pairs.media_a == "__truncated__"]
    assert len(metrics) == 1  # all metric rows share one pair bucket
    assert int(metrics.dist.sum()) == 4 * (20 * 19 // 2 - 5 * 4 // 2)
