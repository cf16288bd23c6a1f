"""Deduplication operator family over a (id, text) table.

Exact dedup mirrors the reference's hash-keyed idempotency
(``/root/reference/pipeline/triple_extraction.py:32-68`` — sha-keyed skip)
as a distributed hash-partition + per-group-min; the near-dup members
(MinHash-LSH, SimHash, n-gram Jaccard) extend the reference's
"same canonical key => merge" semantics
(``/root/reference/pipeline/link_entities.py:741-754``) to fuzzy content.

All operators stream: shingle/sign per batch (stateful actor pools where
permutation tables are heavy), shuffle only compact (key, id) rows, verify
candidates after a feature join, close transitively with the same
hash-partitioned label propagation the ER pipeline uses.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from ..config import ERConfig
from ..functions.hashing import sha256_column
from ..functions.minhash import MinHasher, jaccard, simhash64
from ..stages.clustering import propagate_labels

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def add_text_sha(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column("text_sha", sha256_column(batch.column(text_col)))

    return ds.map_batches(f, batch_format="pyarrow")


def exact_dedup_survivors(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """One surviving id per distinct text: min(id) within each content hash.

    hash-partition + per-group-first (SURVEY.md §2.9 D1); the groupby ships
    only (text_sha, id) — content never enters the shuffle.
    """
    hashed = add_text_sha(ds, text_col).select_columns(["text_sha", id_col])
    return (
        hashed.groupby("text_sha")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


def _word_tokens(text: str) -> list[str]:
    return [w.lower() for w in _WORD_RE.findall(text)]


class _DocSigner:
    """Actor-pool stage: word-shingle MinHash band keys per document."""

    def __init__(self, cfg: ERConfig, text_col: str, id_col: str, shingle_k: int):
        self.mh = MinHasher(cfg.minhash_num_perm, cfg.minhash_bands, cfg.minhash_seed)
        self.text_col = text_col
        self.id_col = id_col
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_keys, out_ids = [], []
        for i, t in zip(ids, texts):
            toks = _word_tokens(t or "")
            sh = (
                [" ".join(toks[j : j + self.k]) for j in range(len(toks) - self.k + 1)]
                if len(toks) >= self.k
                else [" ".join(toks)]
                if toks
                else []
            )
            if not sh:
                continue
            sig = self.mh.signature(sh)
            for bk in self.mh.band_keys(sig):
                out_keys.append(f"{bk}")
                out_ids.append(i)
        return pa.table(
            {
                "band_key": pa.array(out_keys, pa.string()),
                "doc_id": pa.array(out_ids, pa.int64()),
            }
        )


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: ERConfig | None = None,
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """LSH candidate pairs (id_a < id_b), deduped across bands."""
    from ..config import auto_config

    cfg = cfg or auto_config()
    keys = ds.map_batches(
        _DocSigner,
        fn_constructor_args=(cfg, text_col, id_col, shingle_k),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.scorer_concurrency,
        num_cpus=1,
    ).materialize()
    # materialized before the self-join: both join sides consuming a lazy
    # actor-pool stage would spawn two pools and starve the CPU budget

    from .join import bucket_join, rename_batches

    ka = rename_batches(keys, {"doc_id": "id_a"})
    kb = rename_batches(keys, {"band_key": "band_key_r", "doc_id": "id_b"})
    joined = bucket_join(
        ka, kb, left_on="band_key", right_on="band_key_r",
        left_schema=pa.schema([("band_key", pa.string()), ("id_a", pa.int64())]),
        right_schema=pa.schema([("band_key_r", pa.string()), ("id_b", pa.int64())]),
    )

    def triangle(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.less(batch["id_a"], batch["id_b"]))
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"]})

    raw = joined.map_batches(triangle, batch_format="pyarrow")
    return (
        raw.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["id_a", "id_b", "n_bands"])
    )


def verify_jaccard_pairs(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard verification of candidate pairs.

    Feature join ships texts only for candidate ids (a tiny subset), then a
    vectorized-enough per-pair set intersection inside map_batches.
    """
    from .join import bucket_join, rename_batches

    side = docs.select_columns([id_col, text_col])
    pa_ = rename_batches(side, {id_col: "jid_a", text_col: "text_a"})
    pb_ = rename_batches(side, {id_col: "jid_b", text_col: "text_b"})
    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    side_a = pa.schema([("jid_a", pa.int64()), ("text_a", pa.string())])
    side_b = pa.schema([("jid_b", pa.int64()), ("text_b", pa.string())])
    enriched = bucket_join(
        bucket_join(
            pairs.select_columns(["id_a", "id_b"]),
            pa_, left_on="id_a", right_on="jid_a",
            left_schema=pair_schema, right_schema=side_a,
        ),
        pb_, left_on="id_b", right_on="jid_b",
        left_schema=pa.schema(list(pair_schema) + list(side_a)),
        right_schema=side_b,
    )

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        sims = []
        for x, y in zip(ta, tb):
            wa, wb = _word_tokens(x or ""), _word_tokens(y or "")
            sa = set(
                tuple(wa[i : i + ngram]) for i in range(max(len(wa) - ngram + 1, 0))
            ) or {tuple(wa)}
            sb = set(
                tuple(wb[i : i + ngram]) for i in range(max(len(wb) - ngram + 1, 0))
            ) or {tuple(wb)}
            sims.append(jaccard(sa, sb))
        out = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(pa.compute.greater_equal(out["jaccard"], pa.scalar(threshold)))

    return enriched.map_batches(verify, batch_format="pyarrow")


def near_dedup_assignments(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: ERConfig | None = None,
) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dedup: (doc_id, canonical_doc_id) for every doc.

    shingle -> minhash -> band groupby -> verify n-gram Jaccard -> transitive
    closure (same label-propagation operator as the flagship ER stage 3).
    """
    from ..config import auto_config
    from ..stages.clustering import assignments as assign_op

    cfg = cfg or auto_config()
    cand = minhash_candidate_pairs(docs, id_col, text_col, cfg)
    edges_raw = verify_jaccard_pairs(cand, docs, threshold, id_col, text_col)

    def to_str_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pa.compute.cast(batch.column("id_a"), pa.string()),
                "id_b": pa.compute.cast(batch.column("id_b"), pa.string()),
            }
        )

    edges = edges_raw.map_batches(to_str_edges, batch_format="pyarrow")
    labels = propagate_labels(edges, cfg)
    ids = docs.select_columns([id_col]).map_batches(
        lambda t: pa.table({"file_id": pa.compute.cast(t.column(id_col), pa.string())}),
        batch_format="pyarrow",
    )
    out = assign_op(ids, labels, cfg)
    return out.map_batches(
        lambda t: pa.table(
            {
                id_col: pa.compute.cast(t.column("file_id"), pa.int64()),
                "canonical_doc_id": pa.compute.cast(
                    t.column("canonical_file_id"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def simhash_fingerprints(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """64-bit SimHash per document (returned as hex string)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        fps = [f"{simhash64(_word_tokens(t or '')):016x}" for t in texts]
        return pa.table({id_col: ids, "simhash": pa.array(fps, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Embedding-cosine near-dup: random-hyperplane LSH buckets, then exact
    cosine verification within buckets. Scale path: bucket count 2^n_planes
    bounds each groupby partition; brute force only within buckets."""
    import pandas as pd

    def bucketize_factory():
        state = {}

        def f(batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
            if "planes" not in state:
                rng = np.random.RandomState(seed)
                state["planes"] = rng.randn(vecs.shape[1], n_planes)
            signs = (vecs @ state["planes"]) > 0
            bucket = np.packbits(signs, axis=1, bitorder="little")[:, :2]
            bkt = (bucket[:, 0].astype(np.int64) << 8) | bucket[:, 1].astype(np.int64) if bucket.shape[1] > 1 else bucket[:, 0].astype(np.int64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            unit = vecs / np.maximum(norms, 1e-12)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "bucket": pa.array(bkt, pa.int64()),
                    "unit": pa.array(list(unit), pa.list_(pa.float64())),
                }
            )

        return f

    bucketed = ds.map_batches(bucketize_factory(), batch_format="pyarrow")

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        mat = np.asarray(g["unit"].tolist(), dtype=np.float64)
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[iu[0]][mask], ids[iu[1]][mask]),
                "id_b": np.maximum(ids[iu[0]][mask], ids[iu[1]][mask]),
                "cosine": sims[iu][mask],
            }
        )

    return bucketed.groupby("bucket").map_groups(verify_bucket, batch_format="pandas")
