"""source_kl (ops/drift.py): planted drift detection + partition
independence + a brute-force reference."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from session_graph_ray.ops.drift import source_kl


def _brute(docs):
    from collections import Counter

    cst, ns, ct = Counter(), Counter(), Counter()
    for src, text in docs:
        for tok in text.split():
            cst[(src, tok)] += 1
            ns[src] += 1
            ct[tok] += 1
    n = sum(ns.values())
    kl = Counter()
    for (src, tok), c in cst.items():
        term = (c / ns[src]) * math.log((c * n) / (ct[tok] * ns[src]))
        kl[src] += math.floor(term * 1e6 + 0.5)
    return ns, kl


def _docs():
    rng = np.random.default_rng(5)
    common = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(120):
        src = "clean_a" if i % 2 else "clean_b"
        docs.append((src, " ".join(rng.choice(common, size=30))))
    # drifted source: mostly its own vocabulary
    weird = [f"zz{i}" for i in range(30)]
    for i in range(40):
        docs.append(("drifted", " ".join(rng.choice(weird, size=30))))
    return docs


def test_source_kl_matches_brute_and_flags_drift():
    docs = _docs()
    ds = rd.from_arrow(pa.table({
        "source": pa.array([s for s, _ in docs]),
        "text": pa.array([t for _, t in docs]),
    })).repartition(4)
    got = source_kl(ds).to_pandas().set_index("source")
    ns, kl = _brute(docs)
    assert set(got.index) == set(ns)
    for src in ns:
        assert int(got.loc[src, "n_tokens"]) == ns[src]
        assert int(got.loc[src, "kl_u"]) == kl[src], src
    # the planted drift dominates both in-distribution sources (disjoint
    # vocab caps KL at ln(N/N_s) = ln(4) here = 1.386M u; clean ~0.29M u)
    assert (got.loc["drifted", "kl_u"]
            > 3 * max(got.loc["clean_a", "kl_u"],
                      got.loc["clean_b", "kl_u"]))


def test_source_kl_partition_independent():
    docs = _docs()
    t = pa.table({"source": pa.array([s for s, _ in docs]),
                  "text": pa.array([x for _, x in docs])})
    a = source_kl(rd.from_arrow(t).repartition(1)).to_pandas()
    b = source_kl(rd.from_arrow(t).repartition(9)).to_pandas()
    assert a.equals(b)


def test_source_overlap_matches_brute_force():
    from itertools import combinations

    from session_graph_ray.ops.drift import source_overlap

    rng = np.random.default_rng(9)
    srcs = [f"s{i}" for i in range(6)]
    rows = []
    # unique texts + mirror content shared across overlapping source sets
    for i in range(150):
        rows.append((srcs[i % 6], f"unique text number {i}"))
    for j in range(12):
        for s in rng.choice(srcs, size=rng.integers(2, 5), replace=False):
            rows.append((s, f"mirrored boilerplate {j}"))
    ds = rd.from_arrow(pa.table({
        "source": pa.array([s for s, _ in rows]),
        "text": pa.array([t for _, t in rows]),
    })).repartition(5)
    got = {(r.source_a, r.source_b): int(r.n_shared)
           for r in source_overlap(ds).to_pandas().itertuples(index=False)}

    from collections import defaultdict

    by_text = defaultdict(set)
    for s, t in rows:
        by_text[t].add(s)
    want = defaultdict(int)
    for t, ss in by_text.items():
        for a, b in combinations(sorted(ss), 2):
            want[(a, b)] += 1
    assert got == dict(want)
    assert len(got) > 5  # non-trivial matrix
