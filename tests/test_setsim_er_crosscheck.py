"""Cross-validation: the exact set-similarity join (ops/setsim.py) run
over the ER corpus CONTENT recovers the flagship's planted ground truth.

The tiny fixture corpus plants duplicate clusters (exact copies, path
renames, content edits); labeled same-content positives have high
content-token Jaccard by construction. setsim_join is an independent
mechanism from the flagship's blocking+scoring path (no MinHash, no
Jaro-Winkler, no Levenshtein), so agreement here cross-checks both."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from session_graph_ray.functions.hashing import file_id_of
from session_graph_ray.fixtures import ensure_corpus
from session_graph_ray.ops.setsim import (
    setsim_join,
    split_setsim_metric_rows,
)


def test_setsim_recovers_planted_er_clusters():
    d = ensure_corpus("tiny")
    corpus = pd.read_parquet(f"{d}/corpus")
    labels = pd.read_parquet(f"{d}/labeled_pairs.parquet")

    # dense int ids (setsim requires 31-bit ids; file ids are 64-bit hex)
    fids = [
        file_id_of(r, p, c)
        for r, p, c in zip(corpus["repo"], corpus["path"], corpus["commit"])
    ]
    id_of = {f: i for i, f in enumerate(sorted(set(fids)))}
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([id_of[f] for f in fids], pa.int64()),
        "text": pa.array(corpus["content"].tolist(), pa.string()),
    }))

    res = setsim_join(docs, 0.5)
    tbls = [t for t in (ray.get(r) for r in res.to_arrow_refs())
            if t.num_rows]
    real, dropped = split_setsim_metric_rows(pa.concat_tables(tbls))
    assert dropped == 0
    found = set(zip(real.column("doc_a").to_pylist(),
                    real.column("doc_b").to_pylist()))

    # labeled positives at sha/stem block keys are exact or lightly-edited
    # content: at tau=0.5 token Jaccard the exact join must find every
    # exact-copy positive and the vast majority of edited ones
    pos = labels[labels["is_match"]]
    want_exact = set()
    want_all = set()
    for fa, fb, bk in zip(pos["file_id_a"], pos["file_id_b"],
                          pos["block_key"]):
        if fa not in id_of or fb not in id_of:
            continue
        a, b = sorted((id_of[fa], id_of[fb]))
        want_all.add((a, b))
        if bk.startswith("sha:"):
            want_exact.add((a, b))
    assert want_exact, "fixture should plant exact-copy positives"
    missed_exact = want_exact - found
    assert not missed_exact, f"exact-copy positives missed: {missed_exact}"
    recall_all = len(want_all & found) / len(want_all)
    assert recall_all >= 0.9, (
        f"recall {recall_all:.3f} over {len(want_all)} labeled positives"
    )
