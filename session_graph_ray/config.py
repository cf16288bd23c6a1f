"""Engine configuration (config-as-data, reference analog:
``entity_aliases.json`` + predicate vocabulary +.env,
``/root/reference/pipeline/triple_extraction.py:75-100``)."""

from __future__ import annotations

from dataclasses import dataclass


# ERConfig fields that are execution-only — result-invariant by
# construction (every byte/row gate collapses to the same rows as the
# distributed form; pool/partition/batch sizes change scheduling, never
# output). Everything NOT listed here participates in semantic_repr() and
# therefore in run fingerprints — new fields fail closed.
_EXECUTION_KNOBS = frozenset({
    "feature_broadcast_limit",
    "feature_spill_dir",
    "driver_cluster_max_edges",
    "broadcast_assign_max_labels",
    "incremental_broadcast_max_ids",
    "broadcast_verify_max_pairs",
    "batch_size",
    "pair_batch_size",
    "scorer_concurrency",
    "join_partitions",
    "hash_buckets",
})


@dataclass(frozen=True)
class ERConfig:
    # --- blocking ---------------------------------------------------------
    minhash_num_perm: int = 64
    minhash_bands: int = 16
    minhash_seed: int = 42
    shingle_k: int = 3
    content_token_cap: int = 2000
    # which registered key providers run (registry.register_blocking_key
    # adds new ones without touching the stages — SURVEY.md §2.12)
    blocking_keys: tuple[str, ...] = ("sha", "stem", "minhash")
    # max rows of a fuzzy block before chunked pair generation (chunks get
    # all-pairs + star bridges; skipped cross-chunk pairs are metric-counted
    # by ops.pairing — see ROUTE_METRIC). Exact-content blocks are never
    # chunked: they emit a linear star over the block min.
    block_cap: int = 64

    # --- scoring (reference: confidence >= 0.7 gate,
    #     /root/reference/pipeline/link_entities.py:57) -------------------
    w_jw: float = 0.30           # Jaro-Winkler on normalized path stems
    w_tj: float = 0.35           # token-Jaccard on identifier sets
    w_lev: float = 0.35          # Levenshtein similarity on truncated content
    score_threshold: float = 0.70

    # scorer feature access: at or below this many feature rows the scorer
    # actor pool memory-maps the whole consolidated feature spill (one
    # page-cache copy per node) with a searchsorted index — no enrichment
    # shuffle at all. Above it, features join in via the partitioned
    # two-phase bucket_join path (the 10^12-row plan, where features exceed
    # node RAM). Size this to node RAM: a feature row is ~0.7 KB, so 20M
    # rows ≈ 14 GB spill — comfortable on 128 GB nodes, and the measured
    # cliff is steep (benchxxl, 5.9M rows / 85M pairs: 82 s mmap-indexed
    # vs >90 min through the one-phase join — PERF.md round 4).
    feature_broadcast_limit: int = 20_000_000

    # scratch dir for the consolidated-feature spill file the scorer actors
    # (re)load in __init__ — plain-path constructor args keep the actor pool
    # restartable (ray#53727). Single-node: /tmp is fine; multi-node: point
    # this at cluster-visible storage (the prod analog is object storage).
    feature_spill_dir: str = "/tmp/session_graph_ray_spill"

    # small-input collapse gates: below these provably-tiny volumes the
    # fixed per-round / per-shuffle costs of the distributed form dominate
    # by orders of magnitude, so the same kernel runs once, vectorized, in
    # the driver. Both are hard byte-bounded (16 B/edge, 16 B/label row:
    # <= ~3 MB pulled); the distributed fixpoint/join stays the plan for
    # anything bigger and is what the bench corpus exercises.
    driver_cluster_max_edges: int = 200_000
    broadcast_assign_max_labels: int = 2_000_000
    # incremental runs: at or below this many previous-corpus ids the
    # old-vs-old pair drop broadcasts one sorted id array (8 B/id); above
    # it the membership test is two bucketed left-join flag passes
    # (ops/join.drop_both_member_pairs) — never a driver pull of a huge set
    incremental_broadcast_max_ids: int = 2_000_000

    # at or below this many candidate pairs the Jaccard verifier ships the
    # candidate texts once via the object store (ids are a tiny subset of
    # the corpus) instead of running a two-sided partitioned text join
    broadcast_verify_max_pairs: int = 50_000

    # --- execution --------------------------------------------------------
    batch_size: int = 2048
    pair_batch_size: int = 8192
    scorer_concurrency: int = 4  # actor-pool size; override per run
    join_partitions: int = 32
    max_cluster_rounds: int = 12
    # modulo for int-bucketed groupby kernels (pairing census, label rounds,
    # assignment merges). Deliberately FIXED and well above any CPU count:
    # the sort-shuffle range-partitions distinct bucket values across reduce
    # tasks, so bucket granularity — not partition count — bounds task
    # balance. At hash_buckets == 4*join_partitions (the old coupling) the
    # hottest reduce task held whole hot buckets and ran 6x the mean
    # (measured: 0.9-6.1s spread at 8 CPUs), capping scaling efficiency;
    # 256 buckets keep every reduce task statistically even at any
    # parallelism while per-group kernel overhead (~0.3 ms) stays noise.
    hash_buckets: int = 256

    def scaled(self, num_cpus: int) -> "ERConfig":
        """Derive per-run pool sizing from the session CPU budget.

        ``join_partitions`` stays below the CPU count: Ray's JoinOperator
        allocates one aggregator actor per partition, and a partition count
        above the CPU budget deadlocks the streaming executor while the
        upstream map stage still holds its slots (observed on 2.49).
        """
        from dataclasses import replace

        # scorer pool sizes to the FULL CPU budget: the stages that run
        # concurrently with it (exact-route passthrough, unions) are trivial
        # maps that Ray Data interleaves into pool idle gaps, so an
        # ncpu//2 pool would idle half the machine during the scoring wall
        # (measured at every parallelism level). Full-budget (not ncpu-1):
        # the pool fraction must be the SAME at every parallelism level or
        # the higher level systematically underuses its budget — an ncpu-1
        # pool is 50% of 2 CPUs but 97% of 32, which shows up directly as
        # lost scaling efficiency.
        return replace(
            self,
            scorer_concurrency=max(2, num_cpus),
            join_partitions=max(2, min(num_cpus // 2, 16)),
        )

    def semantic_repr(self) -> str:
        """Stable repr of ONLY the fields that affect pipeline OUTPUTS.

        Execution knobs (pool sizes, partition counts, batch sizes, scratch
        paths, small-input collapse gates — all result-invariant by
        construction: every gated fast path computes the same rows as the
        distributed form) are excluded, so run fingerprints derived from
        this survive cluster-size changes: a checkpointed run resumes, and
        the consolidated-feature spill is reused, when the same inputs are
        reprocessed at different parallelism.

        DENYLIST, not allowlist, so it fails closed: a future field added
        to ERConfig is fingerprint-relevant BY DEFAULT — forgetting to
        classify it invalidates caches (a re-run), never silently reuses a
        stale checkpoint computed under different semantics (wrong rows)."""
        from dataclasses import fields

        return repr({
            f.name: getattr(self, f.name)
            for f in fields(self)
            if f.name not in _EXECUTION_KNOBS
        })


def auto_config() -> "ERConfig":
    """ERConfig sized to the already-initialised Ray session."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return ERConfig().scaled(ncpu)
