"""Stage-1 tests: key families, singleton drop, skew chunking with bridges,
exact-block star pairs, cross-key pair dedup, truncation metrics."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.config import ERConfig
from session_graph_ray.ops.pairing import (
    FAM_EXACT,
    FAM_MH,
    FAM_STEM,
    ROUTE_EXACT,
    ROUTE_FUZZY,
    ROUTE_METRIC,
    pairs_from_keys,
    split_metric_rows,
)
from session_graph_ray.stages.blocking import candidate_pairs, explode_keys_batch
from session_graph_ray.stages.normalize import normalize_core


def _norm_ds(tiny_corpus_dir):
    return normalize_core(rd.read_parquet(f"{tiny_corpus_dir}/corpus"))


def _clean_pairs(norm_ds, cfg):
    raw = candidate_pairs(norm_ds, cfg).materialize()
    clean, metrics = split_metric_rows(raw, cfg)
    return clean.to_pandas(), metrics


def test_key_exploder_families(tiny_corpus_dir):
    cfg = ERConfig()
    tbl = pa.Table.from_pandas(_norm_ds(tiny_corpus_dir).limit(20).to_pandas())
    out = explode_keys_batch(tbl, cfg)
    fams = set(out.column("fam").to_pylist())
    assert {FAM_EXACT, FAM_STEM, FAM_MH} <= fams
    n_scorable = sum(tbl.column("scorable").to_pylist())
    assert out.num_rows <= n_scorable * (cfg.minhash_bands + 2)
    # family tag occupies the top bits: families never collide numerically
    keys = np.array(out.column("block_key").to_pylist(), dtype=np.uint64)
    fam_col = np.array(out.column("fam").to_pylist())
    assert ((keys >> np.uint64(62)).astype(int) == fam_col).all()


def test_pairs_singleton_drop_and_dedup():
    cfg = ERConfig().scaled(4)
    rows = {
        # k1 singleton -> no pairs; k2 three members -> 3 pairs
        "block_key": pa.array([1, 2, 2, 2], pa.uint64()),
        "file_id": pa.array([10, 21, 22, 23], pa.uint64()),
        "fam": pa.array([FAM_STEM] * 4, pa.int8()),
        "sha": pa.array([1, 2, 3, 4], pa.uint64()),
    }
    out, _ = _split(pairs_from_keys(rd.from_arrow(pa.table(rows)), cfg), cfg)
    got = sorted(zip(out["id_a"], out["id_b"]))
    assert got == [(21, 22), (21, 23), (22, 23)]
    assert (out["route"] == ROUTE_FUZZY).all()


def _split(ds, cfg):
    clean, metrics = split_metric_rows(ds.materialize(), cfg)
    return clean.to_pandas(), metrics


def test_exact_block_star_any_size():
    """>cap identical-content members must form ONE star (n-1 pairs), not
    fragmented chunks — the round-1 advice finding."""
    cfg = ERConfig(block_cap=8).scaled(4)
    n = 100
    rows = {
        "block_key": pa.array([7] * n, pa.uint64()),
        "file_id": pa.array(list(range(1000, 1000 + n)), pa.uint64()),
        "fam": pa.array([FAM_EXACT] * n, pa.int8()),
        "sha": pa.array([7] * n, pa.uint64()),
    }
    out, metrics = _split(pairs_from_keys(rd.from_arrow(pa.table(rows)), cfg), cfg)
    assert len(out) == n - 1
    assert (out["id_a"] == 1000).all()  # star over the min id
    assert (out["route"] == ROUTE_EXACT).all()
    assert metrics["hot_blocks"] == 0  # exact blocks are never chunked


def test_hot_fuzzy_block_chunked_bridged_and_counted():
    cfg = ERConfig(block_cap=8).scaled(4)
    n = 40
    rows = {
        "block_key": pa.array([9] * n, pa.uint64()),
        "file_id": pa.array(list(range(n)), pa.uint64()),
        "fam": pa.array([FAM_STEM] * n, pa.int8()),
        "sha": pa.array(list(range(100, 100 + n)), pa.uint64()),  # all distinct
    }
    out, metrics = _split(pairs_from_keys(rd.from_arrow(pa.table(rows)), cfg), cfg)
    n_chunks = -(-n // 8)
    within = n_chunks * (8 * 7 // 2)
    bridges = n_chunks - 1
    assert len(out) == within + bridges
    assert metrics["hot_blocks"] == 1
    assert metrics["dropped_cross_chunk_pairs"] == n * (n - 1) // 2 - within - bridges
    # bridge pairs connect chunk heads: chunk0 head (0) to 8, 16, 24, 32
    pairs = set(zip(out["id_a"], out["id_b"]))
    for head in (8, 16, 24, 32):
        assert (0, head) in pairs


def test_equal_sha_pairs_ride_the_star_not_fuzzy():
    """Fuzzy blocks skip pairs whose content is identical (covered by the
    exact family star) — no redundant scoring."""
    cfg = ERConfig().scaled(4)
    rows = {
        "block_key": pa.array([5, 5, 5], pa.uint64()),
        "file_id": pa.array([1, 2, 3], pa.uint64()),
        "fam": pa.array([FAM_STEM] * 3, pa.int8()),
        "sha": pa.array([42, 42, 99], pa.uint64()),  # 1,2 identical content
    }
    out, _ = _split(pairs_from_keys(rd.from_arrow(pa.table(rows)), cfg), cfg)
    got = sorted(zip(out["id_a"], out["id_b"]))
    assert got == [(1, 3), (2, 3)]


def test_candidate_pairs_unique_and_ordered(tiny_corpus_dir):
    cfg = ERConfig().scaled(4)
    pairs, _ = _clean_pairs(_norm_ds(tiny_corpus_dir), cfg)
    assert (pairs["id_a"] < pairs["id_b"]).all()
    assert pairs.duplicated(subset=["id_a", "id_b"]).sum() == 0
    assert set(pairs["route"]) <= {ROUTE_EXACT, ROUTE_FUZZY}


def test_hot_block_chunking_end_to_end():
    """A stem block above block_cap is chunked (bounded pairs), and an
    exact-duplicate set larger than block_cap still clusters as one."""
    cfg = ERConfig(block_cap=8).scaled(4)
    n = 40
    rows = {
        "repo": [f"r{i}" for i in range(n)],
        "path": ["pkg/__init__.py"] * n,
        "commit": [f"{i:040d}" for i in range(n)],
        "lang": ["python"] * n,
        "content": [f"def f{i}(): return {i}" * 3 for i in range(n)],
    }
    ds = normalize_core(rd.from_arrow(pa.table(rows)))
    pairs, metrics = _clean_pairs(ds, cfg)
    stem_pairs = pairs[pairs["fam"] == FAM_STEM]
    assert 0 < len(stem_pairs) < n * (n - 1) / 2
    assert metrics["hot_blocks"] >= 1
    assert metrics["dropped_cross_chunk_pairs"] > 0


def test_blocking_metrics(tiny_corpus_dir):
    from session_graph_ray.eval import blocking_metrics, pairwise_f1
    from session_graph_ray.pipelines.er import run_er_pipeline

    res = run_er_pipeline(f"{tiny_corpus_dir}/corpus")
    n = res.assignments.count()
    m = blocking_metrics(
        res.pairs.select_columns(res.pairs.schema().names[:2]), n,
        f"{tiny_corpus_dir}/labeled_pairs.parquet")
    assert 0 < m["n_candidates"] < n * (n - 1) // 2
    assert m["reduction_ratio"] > 0.95       # blocking kills the quadratic
    assert m["pair_completeness"] >= 0.8     # literal (star caveat in doc)
    # transitive recall through clustering is still perfect
    f1 = pairwise_f1(res.assignments,
                     f"{tiny_corpus_dir}/labeled_pairs.parquet")
    assert f1["recall"] == 1.0


def test_soundex_blocking_key_extension(tiny_corpus_dir):
    """Extension surface: one config line enables the phonetic key family
    and the full pipeline still recovers the planted clusters exactly."""
    from dataclasses import replace

    from session_graph_ray.config import ERConfig
    from session_graph_ray.eval import cluster_equality, pairwise_f1
    from session_graph_ray.pipelines.er import run_er_pipeline

    cfg = replace(ERConfig(),
                  blocking_keys=("sha", "stem", "minhash", "stem_soundex"))
    res = run_er_pipeline(f"{tiny_corpus_dir}/corpus", cfg)
    f1 = pairwise_f1(res.assignments,
                     f"{tiny_corpus_dir}/labeled_pairs.parquet")
    assert f1["f1"] == 1.0
    eq = cluster_equality(res.assignments,
                          f"{tiny_corpus_dir}/expected_clusters.parquet")
    assert eq["exact_equal_frac"] == 1.0


def test_soundex_groups_phonetic_variants():
    import pyarrow as pa

    from session_graph_ray.config import ERConfig
    from session_graph_ray.registry import blocking_key_provider

    batch = pa.table({
        "sha_u64": pa.array([1, 2, 3], pa.uint64()),
        "file_id_u64": pa.array([10, 20, 30], pa.uint64()),
        "lang_norm": pa.array(["py", "py", "py"]),
        "stem_norm": pa.array(["robert", "rupert", "ashcraft"]),
    })
    keys = blocking_key_provider("stem_soundex")(batch, ERConfig())
    k = keys["block_key"].to_pylist()
    assert k[0] == k[1]      # R163 == R163
    assert k[2] != k[0]      # A261 differs


def test_threshold_sweep(tiny_corpus_dir):
    from session_graph_ray.eval import threshold_sweep
    from session_graph_ray.pipelines.er import run_er_pipeline

    res = run_er_pipeline(f"{tiny_corpus_dir}/corpus")
    sweep = threshold_sweep(
        res.scores.select_columns(["id_a", "id_b", "score"]),
        f"{tiny_corpus_dir}/labeled_pairs.parquet")
    assert len(sweep) > 1
    # recall never increases as the threshold rises
    assert (sweep.recall.diff().dropna() <= 1e-12).all()
    # at the config gate (0.70) the tiny corpus separates perfectly at
    # the CLUSTER level; at the candidate-pair level star-blocking holds
    # literal recall at ~0.83 (see blocking_metrics) with precision 1.0
    at_gate = sweep[sweep.threshold >= 0.70].iloc[0]
    assert at_gate.precision == 1.0
    assert at_gate.recall >= 0.8
    # the sweep surfaces a better-informed threshold than 0.0: below some
    # bucket precision degrades (negative pairs exist in the score table)
    assert sweep.precision.min() < 1.0
