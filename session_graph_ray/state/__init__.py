"""Run state: per-stage per-partition Parquet checkpoints + manifest."""
