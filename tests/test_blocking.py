"""Stage-1 tests: key families, singleton drop, skew salting, pair dedup."""

import pandas as pd
import pyarrow as pa

import ray.data as rd

from session_graph_ray.config import ERConfig
from session_graph_ray.stages.blocking import (
    KeyExploder,
    candidate_pairs,
    pairs_via_self_join,
)
from session_graph_ray.stages.normalize import normalize


def _norm_ds(tiny_corpus_dir):
    return normalize(rd.read_parquet(f"{tiny_corpus_dir}/corpus"))


def test_key_exploder_families(tiny_corpus_dir):
    cfg = ERConfig()
    batch = _norm_ds(tiny_corpus_dir).limit(20).to_pandas()
    tbl = pa.Table.from_pandas(batch)
    out = KeyExploder(cfg)(tbl)
    keys = out.column("block_key").to_pylist()
    assert any(k.startswith("sha:") for k in keys)
    assert any(k.startswith("stem:") for k in keys)
    assert any(k.startswith("mh:") for k in keys)
    # every scorable row yields exactly bands + 2 keys (sha + stem + bands)
    n_scorable = int(batch["scorable"].sum())
    assert len(keys) <= n_scorable * (cfg.minhash_bands + 2)


def test_pairs_via_self_join_singleton_and_triangle():
    import ray.data as rdata

    cfg = ERConfig().scaled(4)
    keys = rdata.from_items(
        [
            {"block_key": "k1", "file_id": "a"},   # singleton -> no pairs
            {"block_key": "k2", "file_id": "b"},
            {"block_key": "k2", "file_id": "c"},
            {"block_key": "k2", "file_id": "d"},
        ]
    )
    out = pairs_via_self_join(keys, cfg).to_pandas()
    got = sorted(zip(out["id_a"], out["id_b"]))
    assert got == [("b", "c"), ("b", "d"), ("c", "d")]  # triangle, no dups


def test_candidate_pairs_unique_and_ordered(tiny_corpus_dir):
    cfg = ERConfig().scaled(4)
    pairs = candidate_pairs(_norm_ds(tiny_corpus_dir), cfg).to_pandas()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    dup = pairs.duplicated(subset=["id_a", "id_b"]).sum()
    assert dup == 0


def test_hot_block_salting():
    """A block above block_cap must be split into sub-blocks (skew handling)."""
    cfg = ERConfig(block_cap=8).scaled(4)
    n = 40
    rows = {
        "repo": [f"r{i}" for i in range(n)],
        "path": ["pkg/__init__.py"] * n,
        "commit": [f"{i:040d}" for i in range(n)],
        "lang": ["python"] * n,
        "content": [f"def f{i}(): return {i}" * 3 for i in range(n)],
    }
    ds = normalize(rd.from_arrow(pa.table(rows)))
    pairs = candidate_pairs(ds, cfg).to_pandas()
    stem_pairs = pairs[pairs["block_key"].str.startswith("stem:")]
    # salted split: far fewer than the unsplit n*(n-1)/2 pairs survive,
    # and each salted sub-block produced at most cap*(cap-1)/2 of them
    assert 0 < len(stem_pairs) < n * (n - 1) / 2
    assert stem_pairs["block_key"].str.contains("#").any()
