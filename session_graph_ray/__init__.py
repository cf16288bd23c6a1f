"""session_graph_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch re-expression of the capabilities of the reference system
(robertoshimizu/session-graph, surveyed in SURVEY.md) on top of
``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches`` stages, actor
pools for stateful scoring, explicit hash-partitioned shuffles for blocking /
frequency filtering / transitive clustering, and per-partition Parquet
checkpoints for resume.

Flagship pipeline (three stages, see ``pipelines/er.py``):

1. **Blocking** — derive blocking keys (exact content hash, lang+path-stem,
   MinHash bands over content shingles) via ``map_batches`` on Arrow; salted
   ``groupby`` with hot-block splitting; candidate-pair generation.
   (Reference semantic: same normalized string => same entity node,
   ``/root/reference/pipeline/common.py:29-36``.)
2. **Pairwise scoring** — actor pool of stateful scorers (DuckDB-vectorized
   Jaro-Winkler on path stems, token-Jaccard on identifier sets, Levenshtein
   on truncated content); confidence threshold gate.
   (Reference semantic: thresholded entity linking with confidence >= 0.7,
   ``/root/reference/pipeline/link_entities.py:57,677-686``.)
3. **Transitive clustering** — distributed union-find by iterative
   hash-partitioned min-label propagation; canonical id = min(file_id).
   (Reference semantic: same-QID => owl:sameAs merge,
   ``/root/reference/pipeline/link_entities.py:741-754``.)
"""

__version__ = "0.1.0"
