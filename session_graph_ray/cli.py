"""CLI entry point — the ``ray job submit`` surface of the engine.

    ray job submit --working-dir . -- python -m session_graph_ray.cli \
        --corpus /data/corpus/*.parquet --out /data/er_out \
        --checkpoint-dir /data/er_ckpt

On the sandbox (single node): ``python -m session_graph_ray.cli --corpus ...``.
Owns its Ray session (guarded — never re-inits inside an existing session,
per the driver contract). Resumable: rerunning with the same checkpoint dir
skips completed stages (watermark semantics at stage grain,
``/root/reference/pipeline/bulk_process.py:83-99``).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="session_graph_ray")
    ap.add_argument("--corpus", required=True,
                    help="input parquet path/glob with (repo,path,commit,lang,content)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--score-threshold", type=float, default=0.70)
    ap.add_argument("--block-cap", type=int, default=64)
    ap.add_argument("--eval-labels", default=None,
                    help="optional labeled_pairs parquet for F1 report")
    ap.add_argument("--watch", action="store_true",
                    help="poll --corpus (a directory) and fold new files "
                         "through the incremental pipeline; duplicate-"
                         "content drops are skipped idempotently")
    ap.add_argument("--poll-interval", type=float, default=5.0)
    ap.add_argument("--max-polls", type=int, default=None,
                    help="stop after N polls (default: run forever)")
    ap.add_argument("--stop-file", default=None,
                    help="exit the watch loop when this path appears")
    ap.add_argument("--key-cache-dir", default=None,
                    help="file-grain cache root for delta-only increments")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from dataclasses import replace

    from .config import ERConfig
    from .eval import pairwise_f1
    from .pipelines.er import match_metrics, run_er_pipeline

    cfg = replace(
        ERConfig().scaled(args.num_cpus),
        score_threshold=args.score_threshold,
        block_cap=args.block_cap,
    )
    if args.watch:
        from .pipelines.watch import watch_loop

        polls = watch_loop(
            args.corpus, args.out, cfg=cfg,
            key_cache_dir=args.key_cache_dir,
            poll_interval=args.poll_interval,
            max_polls=args.max_polls,
            stop_file=args.stop_file,
            on_poll=lambda m: print(json.dumps(m, default=str), flush=True),
        )
        print(json.dumps({"watch_polls": polls}))
        if owns_session:
            ray.shutdown()
        return 0
    t0 = time.time()
    res = run_er_pipeline(args.corpus, cfg, checkpoint_dir=args.checkpoint_dir)

    os.makedirs(args.out, exist_ok=True)
    res.assignments.write_parquet(os.path.join(args.out, "assignments"))
    res.edges.write_parquet(os.path.join(args.out, "match_edges"))

    metrics = match_metrics(res)
    metrics["wall_sec"] = round(time.time() - t0, 2)
    metrics["stage_metrics"] = res.metrics
    if args.eval_labels:
        metrics["pairwise_f1"] = pairwise_f1(res.assignments, args.eval_labels)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    print(json.dumps({k: v for k, v in metrics.items() if k != "stage_metrics"},
                     default=str))

    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
