"""Scorer actor-pool fault tolerance (VERDICT r2 #3): SIGKILL one
IndexedPairScorer worker mid-run and the scoring stage must still complete
with output identical to an undisturbed run. This only holds because the
actor's constructor args are plain values (cfg + spilled-Arrow-IPC path) a
restarted actor can rebuild from — an object-store constructor ref makes
Ray Data actor restarts fail (ray#53727)."""

import os
import signal
import threading
import time

import pytest
import ray.data as rd

import ray._private.state as _state


def _alive_scorer_pids() -> list[int]:
    return [
        v["Pid"]
        for v in _state.actors().values()
        if "IndexedPairScorer" in (v.get("ActorClassName") or "")
        and v.get("State") == "ALIVE"
        and v.get("Pid")
    ]


def _score_run(pairs, features, cfg, n_feat):
    from session_graph_ray.stages.scoring import score_pairs

    return (
        score_pairs(pairs, features, cfg, n_features=n_feat)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def test_scorer_survives_worker_sigkill(small_corpus_dir):
    from session_graph_ray.config import auto_config
    from session_graph_ray.stages.blocking import (
        candidate_pairs,
        split_metric_rows,
    )
    from session_graph_ray.stages.normalize import (
        features_view,
        normalize,
        normalize_core,
    )

    corpus = rd.read_parquet(f"{small_corpus_dir}/corpus")
    cfg = auto_config()
    features = features_view(normalize(corpus)).materialize()
    pairs, _ = split_metric_rows(candidate_pairs(normalize_core(corpus), cfg), cfg)
    # many small blocks -> the scorer pool has work left after the kill
    pairs = pairs.repartition(16).materialize()
    n_feat = features.count()

    clean = _score_run(pairs, features, cfg, n_feat)

    killed = []
    for _attempt in range(3):
        result: dict = {}

        def run():
            result["df"] = _score_run(pairs, features, cfg, n_feat)

        t = threading.Thread(target=run)
        t.start()
        t0 = time.time()
        while t.is_alive() and time.time() - t0 < 120:
            if not killed:
                pids = _alive_scorer_pids()
                if pids:
                    os.kill(pids[0], signal.SIGKILL)
                    killed.append(pids[0])
            time.sleep(0.02)
        t.join(timeout=120)
        assert "df" in result, "scoring run did not complete after kill"
        assert result["df"].equals(clean)
        if killed:
            return
    pytest.skip("scoring finished before a scorer actor could be killed")
