"""Stage 2 — pairwise scoring: stateful actor pool over candidate-pair batches.

Reference semantic carried over: thresholded, cached, confidence-scored
linking with a deterministic tie-break ladder (exact > alias > keyword,
``/root/reference/pipeline/link_entities.py:374-400, 531-537, 677-686``)
becomes a deterministic score ladder:

    content sha equal (route 0)     -> score 1.0 (short-circuit, no features)
    else   0.30 * JaroWinkler(stem) + 0.35 * tokenJaccard(identifiers)
         + 0.35 * LevenshteinSim(content[:256])
    emit match edge iff score >= 0.70 (the reference's confidence gate,
    ``link_entities.py:57``)

Execution: ``map_batches(PairScorer, concurrency=N, num_cpus=1)``. Each actor
holds one in-process DuckDB connection (built once in ``__init__``, reference
analog: per-worker client construction ``llm_providers.py:65-228``) and scores
each Arrow batch with a single vectorized SQL projection — C++ string-distance
kernels, zero Python per-pair loops. DuckDB is a public, baked-in library;
no external services are involved.

Feature access (pairs carry only uint64 ids): the compact feature table is
consolidated and sorted by id inside a REMOTE task (zero driver-serial
seconds), spilled once as an uncompressed Arrow IPC file, and every scorer
actor memory-maps that file zero-copy in ``__init__`` — restart-safe
(ray#53727) and one page-cache copy per node — resolving both sides of each
pair batch with one vectorized
``np.searchsorted`` + ``Table.take``. Above ``cfg.feature_broadcast_limit``
rows (node-RAM bound at 10^12 scale) features join in via the partitioned
``bucket_join`` path instead. Pairs whose block was exact-content (route 0)
bypass features entirely and emit score 1.0 straight from the pair table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import ERConfig

_FEATURE_COLS = [
    "file_id_u64", "sha_u64", "stem_norm", "tokens_bin", "content_trunc"
]


class PairScorer:
    """Callable class for ``map_batches`` — one DuckDB connection per actor.

    Kernel budget per fuzzy pair (measured, this container):
    DuckDB ``jaro_winkler_similarity`` ~1µs; ``levenshtein`` on 256 chars
    ~300µs; ``list_intersect`` on 150-token lists ~590µs. So:

    - token-Jaccard runs in numpy — tokens are SORTED-unique in normalize,
      so the whole batch intersects in ONE searchsorted over (row, token)
      composite keys (``_tokens_flat``), zero per-pair Python;
    - Levenshtein is LAZY: with score = w_jw*jw + w_tj*tj + w_lev*lev and
      lev ∈ [0,1], a pair whose upper bound w_jw*jw + w_tj*tj + w_lev < τ
      can never match — the bulk of same-stem garbage pairs skip the
      quadratic kernel entirely. Every EMITTED edge carries the full exact
      score (accept is impossible without the lev term since
      w_jw + w_tj < τ); rejected rows record score = upper bound and
      lev_sim = 1.0 (the bound's lev value), both below τ by construction.
    """

    def __init__(self, cfg: ERConfig):
        import duckdb

        from ..registry import scorer_extra_features

        self.cfg = cfg
        self.con = duckdb.connect()
        self.con.execute("SET threads TO 1")  # the actor owns exactly 1 CPU
        # pluggable extra features (SURVEY.md §2.12): loaded once per actor;
        # the blend renormalizes so built-in weights keep their ratios
        self.extras = scorer_extra_features()
        self.denom = cfg.w_jw + cfg.w_tj + cfg.w_lev + sum(
            w for _n, w, _f in self.extras
        )

    @staticmethod
    def _tokens_flat(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Binary column of sorted-unique <u4 token hashes -> one flat view.

        Returns (keys, row_ids, sizes): keys = pair_row << 32 | token over
        ALL rows' tokens at once, zero-copy from the Arrow data buffer. The
        per-row buffers are sorted-unique and rows are consecutive, so the
        composite key array is GLOBALLY sorted — intersection against
        another side is one vectorized searchsorted, no per-pair Python
        (VERDICT r2 #2)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_binary(col.type):
            col = col.cast(pa.binary())  # batches are block-bounded, safe
        col = pc.fill_null(col, b"")
        if col.offset != 0:
            col = pa.concat_arrays([col])  # rebase slice so buffers align
        off = col.buffers()[1]
        byte_off = np.frombuffer(off, dtype=np.int32, count=len(col) + 1)
        data_buf = col.buffers()[2]
        flat = (
            np.frombuffer(data_buf, dtype="<u4",
                          count=int(byte_off[-1]) // 4,
                          offset=0)
            if data_buf is not None and byte_off[-1]
            else np.empty(0, "<u4")
        )
        starts = (byte_off // 4).astype(np.int64)
        sizes = np.diff(starts)
        row_ids = np.repeat(np.arange(len(col), dtype=np.int64), sizes)
        keys = (row_ids.astype(np.uint64) << np.uint64(32)) | flat.astype(
            np.uint64
        )
        return keys, row_ids, sizes

    def _token_jaccard(self, col_a, col_b) -> np.ndarray:
        """Pre-hashed sorted-unique uint32 token sets -> exact Jaccard,
        one searchsorted over (row, token) composite keys for the batch."""
        ka, _ra, sa = self._tokens_flat(col_a)
        kb, rb, sb = self._tokens_flat(col_b)
        n = sa.size
        if ka.size and kb.size:
            pos = np.searchsorted(ka, kb)
            hit = np.zeros(kb.size, dtype=bool)
            ok = pos < ka.size
            hit[ok] = ka[pos[ok]] == kb[ok]
            inter = np.bincount(rb[hit], minlength=n).astype(np.float64)
        else:
            inter = np.zeros(n, np.float64)
        union = sa + sb - inter
        out = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
        # empty-side rows score 0 (the scalar kernel's `if not a or not b`)
        out[(sa == 0) | (sb == 0)] = 0.0
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_scores()
        cfg = self.cfg
        n = batch.num_rows
        sha_a = batch.column("sha_a").to_numpy(zero_copy_only=False)
        sha_b = batch.column("sha_b").to_numpy(zero_copy_only=False)
        exact = sha_a == sha_b

        self.con.register("batch", batch.select(["stem_a", "stem_b"]))
        jw = (
            self.con.execute(
                "SELECT jaro_winkler_similarity(stem_a, stem_b) AS jw FROM batch"
            )
            .arrow()
            .column("jw")
            .to_numpy(zero_copy_only=False)
        )
        tj = self._token_jaccard(
            batch.column("tokens_a"), batch.column("tokens_b")
        )

        extra_sum = np.zeros(n)
        for _name, w, fn in self.extras:
            extra_sum += w * np.clip(np.asarray(fn(batch), dtype=np.float64), 0.0, 1.0)

        upper = (cfg.w_jw * jw + cfg.w_tj * tj + extra_sum + cfg.w_lev) / self.denom
        need_lev = (~exact) & (upper >= cfg.score_threshold)
        lev = np.ones(n)
        if need_lev.any():
            idx = np.flatnonzero(need_lev)
            sub = batch.select(["trunc_a", "trunc_b"]).take(pa.array(idx))
            self.con.register("sub", sub)
            lev_sub = (
                self.con.execute(
                    "SELECT 1.0 - levenshtein(trunc_a, trunc_b)::DOUBLE"
                    " / GREATEST(len(trunc_a), len(trunc_b), 1) AS l FROM sub"
                )
                .arrow()
                .column("l")
                .to_numpy(zero_copy_only=False)
            )
            self.con.unregister("sub")
            lev[idx] = lev_sub
        self.con.unregister("batch")

        score = (cfg.w_jw * jw + cfg.w_tj * tj + extra_sum + cfg.w_lev * lev) / self.denom
        jw = np.where(exact, 1.0, jw)
        tj = np.where(exact, 1.0, tj)
        lev = np.where(exact, 1.0, lev)
        score = np.where(exact, 1.0, score)
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "block_key": batch.column("block_key"),
                "jw": pa.array(jw, pa.float64()),
                "tj": pa.array(tj, pa.float64()),
                "lev_sim": pa.array(lev, pa.float64()),
                "score": pa.array(score, pa.float64()),
            }
        )


def _scores_schema() -> pa.Schema:
    return pa.schema(
        [
            ("id_a", pa.uint64()),
            ("id_b", pa.uint64()),
            ("block_key", pa.uint64()),
            ("jw", pa.float64()),
            ("tj", pa.float64()),
            ("lev_sim", pa.float64()),
            ("score", pa.float64()),
        ]
    )


def _empty_scores() -> pa.Table:
    return _scores_schema().empty_table()


_SPILL_TTL_S = 24 * 3600  # GC horizon for orphaned spill files


def _gc_spill_dir(spill_dir: str, keep: str) -> None:
    """Best-effort removal of spill files no live run can still be reading:
    a spill is consumed within its own run, so anything older than the TTL
    is an orphan from a finished/crashed run. Keyed reuse (below) already
    bounds steady-state growth; this sweeps the residue.

    Liveness signal: every scorer-actor ``__init__`` (including restarts)
    utimes its file, so a run is only at risk if one scoring STAGE runs
    longer than the TTL with zero actor (re)starts — with a 24 h TTL that
    is not a realistic stage duration; on a shared cluster, scratch
    lifecycle ultimately belongs to the cluster scheduler, not this sweep."""
    import os
    import time

    now = time.time()
    try:
        for name in os.listdir(spill_dir):
            if not (name.startswith("feat-") and name.endswith(".arrow")):
                continue
            p = os.path.join(spill_dir, name)
            if p != keep and now - os.path.getmtime(p) > _SPILL_TTL_S:
                os.unlink(p)
    except OSError:
        pass


@ray.remote(num_cpus=1)
def _consolidate_features(refs: list, spill_dir: str,
                          spill_key: str | None = None) -> str:
    """Concat + id-sort the compact feature blocks OFF the driver, then
    spill ONE uncompressed Arrow IPC file and return its path.

    Scorer actors rebuild their index from the FILE in ``__init__``, so a
    restarted actor needs nothing from the object store — constructor
    ObjectRefs make Ray Data actor restarts fail (ray#53727; VERDICT r2 #3).
    On a multi-node cluster ``cfg.feature_spill_dir`` must point at
    cluster-visible scratch (object storage in prod); each actor reads the
    file once, memory-mapped.

    ``spill_key`` (the run's input fingerprint — input files + config) makes
    the spill CONTENT-ADDRESSED: features are a deterministic function of
    that key, so a re-run of the same inputs reuses the existing file
    (skipping consolidation entirely, page cache already warm) instead of
    writing an identical copy — repeated benches/resumes stop accreting
    spill files. Writes are tmp + atomic rename, so a concurrent run racing
    on the same key harmlessly replaces the file with identical bytes and a
    crashed write is never visible at the keyed path."""
    import os
    import uuid

    os.makedirs(spill_dir, exist_ok=True)
    name = spill_key if spill_key else uuid.uuid4().hex
    path = os.path.join(spill_dir, f"feat-{name}.arrow")
    _gc_spill_dir(spill_dir, keep=path)
    if spill_key and os.path.exists(path):
        os.utime(path)  # refresh the GC clock on reuse
        return path
    tbls = [t for t in ray.get(list(refs)) if t.num_rows]
    t = pa.concat_tables(tbls).combine_chunks() if tbls else pa.table(
        {c: pa.array([], pa.uint64()) for c in ["file_id_u64"]}
    )
    order = pc.sort_indices(t, sort_keys=[("file_id_u64", "ascending")])
    t = t.take(order).combine_chunks()
    # uncompressed Arrow IPC, not parquet: every actor memory-maps the SAME
    # file zero-copy (one page-cache copy per node, ~zero decode at init)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with pa.OSFile(tmp, "wb") as f:
        with pa.ipc.new_file(f, t.schema) as w:
            w.write_table(t)
    os.replace(tmp, path)
    return path


class IndexedPairScorer(PairScorer):
    """PairScorer whose feature lookup is a vectorized binary search over the
    id-sorted consolidated feature table (memory-mapped zero-copy from the spilled
    Arrow IPC file once per actor; the reference's load-state-once worker pattern,
    ``/root/reference/pipeline/llm_providers.py:65-228``). Constructor args
    are PLAIN VALUES (a path), so Ray Data can restart a lost actor —
    object-store constructor args break restarts (ray#53727).
    ``__call__`` takes a NARROW uint64 pair batch, gathers both sides' rows
    with ``np.searchsorted`` + ``Table.take``, and scores. No enrichment
    shuffle at all."""

    def __init__(self, cfg: ERConfig, feat_path: str):
        super().__init__(cfg)
        import os

        try:
            os.utime(feat_path)  # mark live for _gc_spill_dir's TTL sweep
        except OSError:
            pass
        src = pa.memory_map(feat_path, "r")
        self.feat = pa.ipc.open_file(src).read_all().combine_chunks()
        self.ids = self.feat.column("file_id_u64").to_numpy(zero_copy_only=False)

    def _gather(self, col: pa.ChunkedArray) -> pa.Table:
        want = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(self.ids, want)
        if pos.size and not (self.ids[np.minimum(pos, self.ids.size - 1)] == want).all():
            raise KeyError("candidate pair references an id missing from features")
        return self.feat.take(pa.array(pos))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_scores()
        fa = self._gather(batch.column("id_a"))
        fb = self._gather(batch.column("id_b"))
        enriched = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "block_key": batch.column("block_key"),
                "sha_a": fa.column("sha_u64"),
                "sha_b": fb.column("sha_u64"),
                "stem_a": fa.column("stem_norm"),
                "stem_b": fb.column("stem_norm"),
                "tokens_a": fa.column("tokens_bin"),
                "tokens_b": fb.column("tokens_bin"),
                "trunc_a": fa.column("content_trunc"),
                "trunc_b": fb.column("content_trunc"),
            }
        )
        return super().__call__(enriched)


class LitePairScorer(PairScorer):
    """Phase 1 of the two-phase join-path scorer: jw + token-Jaccard and
    the lazy-Levenshtein upper bound from the COMPACT feature columns only
    (stem + token hashes — no ``content_trunc``). Rows whose upper bound
    can't reach the threshold are FINAL here (score = upper, lev = 1.0 —
    the identical contract the one-phase scorer emits); only the survivors
    ever have the heavy truncated-content column shipped to them (phase 2).
    Output = the scores schema + a ``need`` flag splitting the two routes.

    Why: on the >feature_broadcast_limit join path the enrichment shuffle
    cost is payload-dominated, and ``content_trunc`` (2 x 256 chars) is
    ~60% of it while only the small gated fraction of pairs ever uses it
    (the in-batch lazy-lev gate, measured match rates ~10-25%)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: C901
        if batch.num_rows == 0:
            return _empty_lite()
        cfg = self.cfg
        n = batch.num_rows
        sha_a = batch.column("sha_a").to_numpy(zero_copy_only=False)
        sha_b = batch.column("sha_b").to_numpy(zero_copy_only=False)
        exact = sha_a == sha_b

        self.con.register("batch", batch.select(["stem_a", "stem_b"]))
        jw = (
            self.con.execute(
                "SELECT jaro_winkler_similarity(stem_a, stem_b) AS jw FROM batch"
            ).arrow().column("jw").to_numpy(zero_copy_only=False)
        )
        self.con.unregister("batch")
        tj = self._token_jaccard(
            batch.column("tokens_a"), batch.column("tokens_b")
        )
        extra_sum = np.zeros(n)  # two-phase path requires no extras (gated
        # in score_pairs: registry extras may reference trunc columns)
        upper = (cfg.w_jw * jw + cfg.w_tj * tj + extra_sum + cfg.w_lev) / self.denom
        need = (~exact) & (upper >= cfg.score_threshold)
        # final rows (identical to the one-phase lazy-reject contract)
        lev = np.ones(n)
        score = upper
        jw_o = np.where(exact, 1.0, jw)
        tj_o = np.where(exact, 1.0, tj)
        lev_o = np.where(exact, 1.0, lev)
        score_o = np.where(exact, 1.0, score)
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "block_key": batch.column("block_key"),
                "jw": pa.array(jw_o, pa.float64()),
                "tj": pa.array(tj_o, pa.float64()),
                "lev_sim": pa.array(lev_o, pa.float64()),
                "score": pa.array(score_o, pa.float64()),
                "need": pa.array(need, pa.bool_()),
            }
        )


def _empty_lite() -> pa.Table:
    return pa.schema(
        list(_scores_schema()) + [("need", pa.bool_())]
    ).empty_table()


class LevScorer:
    """Phase 2: Levenshtein + the final blend for the gated pairs, with jw
    and tj carried through the trunc joins as float64 columns — the blend
    expression is the one-phase scorer's, so scores are bit-identical."""

    def __init__(self, cfg: ERConfig):
        import duckdb

        self.cfg = cfg
        self.con = duckdb.connect()
        self.con.execute("SET threads TO 1")
        self.denom = cfg.w_jw + cfg.w_tj + cfg.w_lev

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_scores()
        cfg = self.cfg
        jw = batch.column("jw").to_numpy(zero_copy_only=False)
        tj = batch.column("tj").to_numpy(zero_copy_only=False)
        self.con.register("sub", batch.select(["trunc_a", "trunc_b"]))
        lev = (
            self.con.execute(
                "SELECT 1.0 - levenshtein(trunc_a, trunc_b)::DOUBLE"
                " / GREATEST(len(trunc_a), len(trunc_b), 1) AS l FROM sub"
            ).arrow().column("l").to_numpy(zero_copy_only=False)
        )
        self.con.unregister("sub")
        extra_sum = np.zeros(batch.num_rows)
        score = (cfg.w_jw * jw + cfg.w_tj * tj + extra_sum
                 + cfg.w_lev * lev) / self.denom
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "block_key": batch.column("block_key"),
                "jw": pa.array(jw, pa.float64()),
                "tj": pa.array(tj, pa.float64()),
                "lev_sim": pa.array(lev, pa.float64()),
                "score": pa.array(score, pa.float64()),
            }
        )


def _rename_for_side(ds: "ray.data.Dataset", side: str) -> "ray.data.Dataset":
    from ..ops.join import rename_batches

    return rename_batches(
        ds,
        {
            "file_id_u64": f"fid_{side}",
            "sha_u64": f"sha_{side}",
            "stem_norm": f"stem_{side}",
            "tokens_bin": f"tokens_{side}",
            "content_trunc": f"trunc_{side}",
        },
    )


def _pool_spec(cfg: ERConfig) -> tuple[int, int]:
    """Scorer-pool (min, max): max = the full CPU budget, min = budget - 2.

    The MIN actors are created unconditionally at operator start, bypassing
    the reservation-aware autoscaler, and each holds its CPU for the pool's
    lifetime. A floor equal to the whole budget therefore DEADLOCKS the
    streaming executor: the task-pool operators sharing the stage
    (ReadParquet of the materialized pairs, the exact-route map, a
    checkpoint Write sink) can never get a slot — reproduced as a hard hang
    at num_cpus=4 with (4, 4) and at num_cpus=2 with (2, 2). Scaling UP
    past the floor goes through the reservation-aware path and does not
    starve peers (observed: (2, 4) at 4 CPUs completes), so max stays the
    full budget. Floor = budget - 2 (>=1) starts the pool near-full —
    a floor of just 2 made the hottest stage ramp for tens of seconds at
    high parallelism because each late actor re-pays the spill mmap +
    index build (measured: scores 66.8s at 8 CPUs) — while always leaving
    slots for the peer task ops at every level."""
    return (max(1, cfg.scorer_concurrency - 2), cfg.scorer_concurrency)


def _join_pool_spec(cfg: ERConfig) -> tuple[int, int]:
    """Scorer-pool (min, max) for the JOIN enrichment path.

    Here the scorer actors sit DOWNSTREAM of a multi-stage shuffle
    (bucket tagging -> sort-shuffle -> per-bucket acero merge), and the
    near-full `_pool_spec` floor starves that shuffle of task slots:
    measured at 32 CPUs / 4.6M pairs, the whole stage sat ~idle (workers
    at ~1% CPU, 33+ tasks pending behind 30 floor actors). Join-path
    scorer init is CHEAP (one DuckDB connect — no spill mmap / index
    build), so the indexed path's ramp-cost argument for a high floor
    does not apply: floor 1 lets the reservation-aware autoscaler grow
    the pool as merged buckets actually arrive."""
    return (1, cfg.scorer_concurrency)


def consolidate_features_async(
    features: "ray.data.Dataset",
    cfg: ERConfig,
    spill_key: str | None = None,
):
    """Launch the consolidated-feature spill build WITHOUT blocking and
    return the ObjectRef of its path. The consolidation (concat + id-sort +
    IPC write, a single ~15-20s task at bench scale) depends only on the
    features stage, so callers that still have independent work to run —
    the ER pipeline's entire blocking/pairs stage — kick it off first and
    the serial task hides completely behind that wall. Pass the ref to
    ``score_pairs(feat_path_ref=...)``."""
    feat = features.select_columns(_FEATURE_COLS)
    return _consolidate_features.remote(
        feat.to_arrow_refs(), cfg.feature_spill_dir, spill_key
    )


def score_pairs(
    pairs: "ray.data.Dataset",
    features: "ray.data.Dataset",
    cfg: ERConfig,
    n_features: int | None = None,
    spill_key: str | None = None,
    feat_path_ref=None,
) -> "ray.data.Dataset":
    """(id_a, id_b, block_key, fam, route) × features -> scored edges.

    ``n_features``: row count of ``features`` if the caller already knows it
    (e.g. from the stage checkpoint manifest) — avoids re-executing the
    feature lineage just to pick the indexed-vs-join path. ``spill_key``:
    content key for the consolidated-feature spill (the run's input
    fingerprint) — same inputs reuse the same file instead of rewriting it.
    ``feat_path_ref``: an in-flight consolidation launched earlier via
    ``consolidate_features_async`` (overlapped with unrelated stages);
    only consumed on the broadcast path. Returns every scored pair
    (thresholding is the caller's concern so the scores table can be
    checkpointed *including* non-matches — the reference caches negative
    results too, ``link_entities.py:283-329``).
    """
    feat = features.select_columns(_FEATURE_COLS)

    def _route_filter(route_val: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["route"], pa.scalar(route_val, pa.int8())))

        return f

    # vectorized route split (a row-wise ds.filter(lambda) here costs seconds
    # per million pairs)
    sha_pairs = pairs.map_batches(_route_filter(0), batch_format="pyarrow",
                                  batch_size=cfg.pair_batch_size)
    fuzzy_pairs = pairs.map_batches(_route_filter(1), batch_format="pyarrow",
                                    batch_size=cfg.pair_batch_size)

    def sha_to_scores(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        one = pa.array([1.0] * n, pa.float64())
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "block_key": batch.column("block_key"),
                "jw": one,
                "tj": one,
                "lev_sim": one,
                "score": one,
            }
        )

    exact_scored = sha_pairs.map_batches(
        sha_to_scores, batch_format="pyarrow", batch_size=cfg.pair_batch_size
    )

    if n_features is None:
        n_features = feat.count()

    # fast path: features fit the object store -> indexed scorer, no join
    if n_features <= cfg.feature_broadcast_limit:
        import os
        import time

        t0 = time.time()
        if feat_path_ref is None:
            feat_path_ref = _consolidate_features.remote(
                feat.to_arrow_refs(), cfg.feature_spill_dir, spill_key
            )
        feat_path = ray.get(feat_path_ref)
        if os.environ.get("SGR_TRACE"):
            print(f"[score] consolidate wait: {time.time() - t0:.2f}s", flush=True)
        fuzzy_scored = fuzzy_pairs.map_batches(
            IndexedPairScorer,
            fn_constructor_args=(cfg, feat_path),
            batch_format="pyarrow",
            batch_size=cfg.pair_batch_size,
            concurrency=_pool_spec(cfg),
            num_cpus=1,
        )
        return exact_scored.union(fuzzy_scored)

    from ..ops.join import bucket_join
    from ..registry import scorer_extra_features

    pairs_schema = pa.schema(
        [("id_a", pa.uint64()), ("id_b", pa.uint64()), ("block_key", pa.uint64())]
    )

    def _feat_schema(side: str, with_trunc: bool) -> pa.Schema:
        cols = [(f"fid_{side}", pa.uint64()), (f"sha_{side}", pa.uint64()),
                (f"stem_{side}", pa.string()), (f"tokens_{side}", pa.binary())]
        if with_trunc:
            cols.append((f"trunc_{side}", pa.string()))
        return pa.schema(cols)

    if scorer_extra_features():
        # registry extras may reference any feature column (incl. trunc):
        # single-phase enrichment so the extra fns see the full batch
        fa = _rename_for_side(feat, "a")
        fb = _rename_for_side(feat, "b")
        enriched = bucket_join(
            bucket_join(
                fuzzy_pairs.select_columns(["id_a", "id_b", "block_key"]),
                fa, left_on="id_a", right_on="fid_a",
                num_buckets=cfg.hash_buckets,
                left_schema=pairs_schema,
                right_schema=_feat_schema("a", True),
            ),
            fb, left_on="id_b", right_on="fid_b",
            num_buckets=cfg.hash_buckets,
            left_schema=pa.schema(list(pairs_schema)
                                  + list(_feat_schema("a", True))),
            right_schema=_feat_schema("b", True),
        )
        fuzzy_scored = enriched.map_batches(
            PairScorer,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=cfg.pair_batch_size,
            concurrency=_join_pool_spec(cfg),
            num_cpus=1,
        )
        return exact_scored.union(fuzzy_scored)

    # two-phase join path: the enrichment shuffle is payload-dominated and
    # content_trunc (2 x 256 chars) is most of it, while only the gated
    # fraction of pairs ever reaches the Levenshtein kernel. Phase 1 joins
    # the COMPACT columns and finalizes every lazily-rejected pair; phase 2
    # ships trunc only to the survivors. Bit-identical to the one-phase
    # scorer (pinned by tests/test_join_scorer_path.py).
    feat_lite = feat.select_columns(
        ["file_id_u64", "sha_u64", "stem_norm", "tokens_bin"])
    feat_trunc = feat.select_columns(["file_id_u64", "content_trunc"])

    from ..ops.join import rename_batches

    la = rename_batches(feat_lite, {
        "file_id_u64": "fid_a", "sha_u64": "sha_a",
        "stem_norm": "stem_a", "tokens_bin": "tokens_a"})
    lb = rename_batches(feat_lite, {
        "file_id_u64": "fid_b", "sha_u64": "sha_b",
        "stem_norm": "stem_b", "tokens_bin": "tokens_b"})
    lite = bucket_join(
        bucket_join(
            fuzzy_pairs.select_columns(["id_a", "id_b", "block_key"]),
            la, left_on="id_a", right_on="fid_a",
            num_buckets=cfg.hash_buckets,
            left_schema=pairs_schema, right_schema=_feat_schema("a", False),
        ),
        lb, left_on="id_b", right_on="fid_b",
        num_buckets=cfg.hash_buckets,
        left_schema=pa.schema(list(pairs_schema)
                              + list(_feat_schema("a", False))),
        right_schema=_feat_schema("b", False),
    )
    phase1 = lite.map_batches(
        LitePairScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
        concurrency=_join_pool_spec(cfg),
        num_cpus=1,
    ).materialize()

    score_cols = [f.name for f in _scores_schema()]

    def _split(need_val: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.equal(t["need"], pa.scalar(need_val))
            return t.filter(m).select(score_cols)

        return f

    done = phase1.map_batches(_split(False), batch_format="pyarrow",
                              batch_size=cfg.pair_batch_size)
    todo = phase1.map_batches(
        lambda t: t.filter(t["need"]).select(
            ["id_a", "id_b", "block_key", "jw", "tj"]),
        batch_format="pyarrow", batch_size=cfg.pair_batch_size,
    )
    gated_schema = pa.schema(
        [("id_a", pa.uint64()), ("id_b", pa.uint64()),
         ("block_key", pa.uint64()), ("jw", pa.float64()),
         ("tj", pa.float64())]
    )
    ta = rename_batches(feat_trunc, {"file_id_u64": "tfid_a",
                                     "content_trunc": "trunc_a"})
    tb = rename_batches(feat_trunc, {"file_id_u64": "tfid_b",
                                     "content_trunc": "trunc_b"})
    gated = bucket_join(
        bucket_join(
            todo, ta, left_on="id_a", right_on="tfid_a",
            num_buckets=cfg.hash_buckets,
            left_schema=gated_schema,
            right_schema=pa.schema([("tfid_a", pa.uint64()),
                                    ("trunc_a", pa.string())]),
        ),
        tb, left_on="id_b", right_on="tfid_b",
        num_buckets=cfg.hash_buckets,
        left_schema=pa.schema(list(gated_schema)
                              + [("tfid_a", pa.uint64()),
                                 ("trunc_a", pa.string())]),
        right_schema=pa.schema([("tfid_b", pa.uint64()),
                                ("trunc_b", pa.string())]),
    )
    phase2 = gated.map_batches(
        LevScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
        concurrency=_join_pool_spec(cfg),
        num_cpus=1,
    )
    return exact_scored.union(done).union(phase2)


def match_edges(scores: "ray.data.Dataset", cfg: ERConfig) -> "ray.data.Dataset":
    """Confidence gate (reference: emit owl:sameAs only when >= 0.7)."""
    thr = cfg.score_threshold
    return scores.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], pa.scalar(thr))),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
    )
