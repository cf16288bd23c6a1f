"""metablock_wep (ops/metablock.py) — brute-force parity, block purging,
counted purge stats, WEP mean-cut edge cases, broadcast-vs-join purge path."""

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.metablock import metablock_wep


def _brute(blocks, max_block_size):
    """blocks: list[(eid, bkey)] -> (kept edge dict, stats)."""
    per_block = Counter(b for _, b in blocks)
    kept_blocks = {b for b, c in per_block.items()
                   if 2 <= c <= max_block_size}
    w = Counter()
    for b in kept_blocks:
        ids = sorted({e for e, bb in blocks if bb == b})
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                w[(ids[i], ids[j])] += 1
    s, n = sum(w.values()), len(w)
    kept = {p: c for p, c in w.items() if c * n >= s}
    purged = [c for b, c in per_block.items()
              if c > max_block_size]
    return kept, {
        "purged_blocks": len(purged),
        "purged_block_rows": sum(purged),
        "purged_cooccurrence_pairs": sum(c * (c - 1) // 2 for c in purged),
        "edges_total": n,
        "weight_sum": s,
    }


def _run(blocks, max_block_size, **kw):
    ds = rd.from_arrow(pa.table({
        "eid": pa.array([e for e, _ in blocks], pa.int64()),
        "bkey": pa.array([b for _, b in blocks], pa.int64()),
    }))
    edges, stats = metablock_wep(ds, max_block_size=max_block_size, **kw)
    df = edges.to_pandas()
    if len(df) == 0:  # Ray's to_pandas drops columns on 0-row datasets
        assert [f.name for f in edges.schema().base_schema] == \
            ["id_a", "id_b", "w"]
        return {}, stats
    got = {(a, b): w for a, b, w in
           zip(df["id_a"], df["id_b"], df["w"])}
    return got, stats


def _random_blocks(seed, n_entities=40, n_blocks=25, density=0.25):
    rng = np.random.default_rng(seed)
    out = []
    for e in range(n_entities):
        for b in range(n_blocks):
            if rng.random() < density:
                out.append((e, b))
    return out


def test_brute_force_parity_randomized():
    for seed in (1, 2, 3):
        blocks = _random_blocks(seed)
        for mx in (5, 10, 40):
            got, gstats = _run(blocks, mx)
            want, wstats = _brute(blocks, mx)
            assert got == want, f"seed={seed} mx={mx}"
            assert gstats == wstats


def test_purge_counts_oversized_blocks():
    # one hot block of 20 entities, one small block of 3
    blocks = [(e, 100) for e in range(20)] + [(e, 200) for e in (1, 5, 9)]
    got, stats = _run(blocks, max_block_size=10)
    assert stats["purged_blocks"] == 1
    assert stats["purged_block_rows"] == 20
    assert stats["purged_cooccurrence_pairs"] == 190
    # surviving block contributes its 3 edges, all weight 1 (== mean)
    assert got == {(1, 5): 1, (1, 9): 1, (5, 9): 1}


def test_wep_cut_keeps_only_heavy_edges():
    # pair (1,2) shares 3 blocks; four other pairs share 1 each:
    # mean = 7/5 -> only (1,2) survives
    blocks = ([(1, b) for b in (10, 11, 12)] + [(2, b) for b in (10, 11, 12)]
              + [(3, 20), (4, 20), (5, 21), (6, 21),
                 (7, 22), (8, 22), (9, 23), (10, 23)])
    got, stats = _run(blocks, max_block_size=64)
    assert got == {(1, 2): 3}
    assert stats["edges_total"] == 5 and stats["weight_sum"] == 7


def test_join_path_parity():
    blocks = _random_blocks(7)
    a, sa = _run(blocks, 10)
    b, sb = _run(blocks, 10, size_broadcast_max=0)
    assert a == b and sa == sb


def test_empty_and_singleton_blocks():
    got, stats = _run([(1, 10), (2, 20), (3, 30)], max_block_size=64)
    assert got == {} and stats["edges_total"] == 0


def _brute_wnp(blocks, max_block_size):
    """Reciprocal weighted node pruning reference."""
    per_block = Counter(b for _, b in blocks)
    kept_blocks = {b for b, c in per_block.items()
                   if 2 <= c <= max_block_size}
    w = Counter()
    for b in kept_blocks:
        ids = sorted({e for e, bb in blocks if bb == b})
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                w[(ids[i], ids[j])] += 1
    deg, s = Counter(), Counter()
    for (a, b), c in w.items():
        deg[a] += 1
        deg[b] += 1
        s[a] += c
        s[b] += c
    return {p: c for p, c in w.items()
            if c * deg[p[0]] >= s[p[0]] and c * deg[p[1]] >= s[p[1]]}


def _run_wnp(blocks, max_block_size, **kw):
    import pyarrow as pa_
    from session_graph_ray.ops.metablock import metablock_wnp

    ds = rd.from_arrow(pa_.table({
        "eid": pa_.array([e for e, _ in blocks], pa_.int64()),
        "bkey": pa_.array([b for _, b in blocks], pa_.int64()),
    }))
    edges, stats = metablock_wnp(ds, max_block_size=max_block_size, **kw)
    df = edges.to_pandas()
    if len(df) == 0:
        return {}, stats
    return {(a, b): w for a, b, w in
            zip(df["id_a"], df["id_b"], df["w"])}, stats


def test_wnp_brute_force_parity():
    for seed in (4, 5):
        blocks = _random_blocks(seed)
        for mx in (5, 40):
            got, _ = _run_wnp(blocks, mx)
            assert got == _brute_wnp(blocks, mx), f"seed={seed} mx={mx}"


def test_wnp_join_path_parity():
    blocks = _random_blocks(11)
    a, _ = _run_wnp(blocks, 10)
    b, _ = _run_wnp(blocks, 10, size_broadcast_max=0)
    assert a == b


def test_wnp_reciprocal_requires_both_endpoints():
    # star: hub 1 has edges w=3 to node 2 and w=1 to nodes 3,4.
    # hub mean = 5/3 -> only (1,2) clears the hub; node 2's mean = 3.
    # (1,2) survives reciprocally; (1,3),(1,4) fail at the hub.
    blocks = ([(1, b) for b in (10, 11, 12)] + [(2, b) for b in (10, 11, 12)]
              + [(3, 20), (1, 20), (4, 21), (1, 21)])
    got, _ = _run_wnp(blocks, 64)
    assert got == {(1, 2): 3}
