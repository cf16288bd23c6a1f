"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this environment — see module guards); everything Ray-side is real and
tested: schema handling, actor-pool stage shape, small batch sizes for wide
binary rows, and the output layout. Swap ``_decode_image_stub`` for a real
decoder (PIL/torchvision/ffmpeg) on a cluster that has it.

Batch sizing note (100 TB reality): binary payloads dominate block size —
callers should use small ``batch_size`` (128-512) and rely on Arrow
``large_binary`` so a batch × pool concurrency fits worker heaps.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.large_binary()),
        ("meta", pa.string()),        # JSON metadata sidecar
    ]
)


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows: payload = seeded bytes with a tiny
    16-byte header encoding (width, height, channels, sample_rate)."""
    rng = np.random.RandomState(seed)
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h, c, sr = int(rng.randint(8, 256)), int(rng.randint(8, 256)), 3, 16000
        header = struct.pack("<IIII", w, h, c, sr)
        body = rng.bytes(int(rng.randint(64, 2048)))
        ids.append(f"m{i:05d}")
        kinds.append(kind)
        payloads.append(header + body)
        metas.append(f'{{"w":{w},"h":{h}}}')
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


def _decode_image_stub(payload: bytes) -> dict:
    """STUB decoder. A real deployment replaces this with PIL/libjpeg.

    Reads the deterministic fake header; 'pixels' become a stable hash-derived
    feature so downstream stages have real numbers to flow.
    """
    try:
        import PIL.Image  # noqa: F401  — not present in this container
        raise NotImplementedError("real decode path not wired in this sandbox")
    except ImportError:
        pass
    if len(payload) < 16:
        raise ValueError("payload too short for fake header")
    w, h, c, sr = struct.unpack("<IIII", payload[:16])
    digest = hashlib.sha256(payload).digest()
    feat = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
    return {"width": w, "height": h, "channels": c, "feature": feat}


class MediaFeatureExtractor:
    """Actor-pool stage: decode + fixed-size feature vector per media row.

    __init__ holds the (stub) model state once per actor; __call__ handles a
    small batch of wide binary rows. Rows that fail to decode land in the
    quarantine columns instead of failing the task (row-level quarantine,
    SURVEY.md §4 retry design)."""

    def __init__(self, feature_dim: int = 32):
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths, heights, feats, errors = [], [], [], []
        for p in payloads:
            try:
                d = _decode_image_stub(p)
                widths.append(d["width"])
                heights.append(d["height"])
                feats.append(d["feature"][: self.dim].tolist())
                errors.append(None)
            except Exception as e:  # quarantine, don't crash the task
                widths.append(0)
                heights.append(0)
                feats.append([0.0] * self.dim)
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
                "decode_error": pa.array(errors, pa.string()),
            }
        )


def extract_media_features(
    ds: "ray.data.Dataset", concurrency: int = 2, batch_size: int = 128
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: binary payloads are wide
        concurrency=concurrency,
        num_cpus=1,
    )
