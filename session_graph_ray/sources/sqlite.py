"""SQLite source (SURVEY.md S4).

Reference semantic: ``/root/reference/pipeline/warp_to_rdf.py:59-87`` reads a
Warp SQLite database with two ordered queries (conversations by
``last_modified_at DESC``, exchanges by ``start_ts``). Re-expressed Ray-Data-
first: the table is split into rowid ranges and each range becomes one read
task (``from_items`` of partition specs -> ``flat_map``-style ``map_batches``
that opens the database read-only per task), so a large table streams through
the executor instead of materializing in the driver. Ordering is restored
downstream with ``ds.sort`` when required (Ray Data blocks are unordered by
design; the reference's ORDER BY is a per-consumer concern).

SQLite is a local-file engine, so every task re-opens the file with
``mode=ro`` — the distributed-cluster analog is a per-node replica / NFS
mount of the file, or swapping the connection factory for a networked DBMS.
"""

from __future__ import annotations

import sqlite3

import pyarrow as pa

import ray.data


def _open_ro(db_path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)


def read_sqlite_table(
    db_path: str,
    table: str,
    columns: list[str] | None = None,
    n_partitions: int = 8,
) -> "ray.data.Dataset":
    """Partitioned scan of one SQLite table -> Dataset.

    Partitioning key is the implicit ``rowid`` (monotone, always indexed),
    split into ``n_partitions`` contiguous ranges sized from min/max rowid —
    one cheap metadata query on the driver, then fully parallel range reads.
    """
    con = _open_ro(db_path)
    try:
        row = con.execute(
            f"SELECT MIN(rowid), MAX(rowid), COUNT(*) FROM {table}"
        ).fetchone()
    finally:
        con.close()
    lo, hi, n = row
    if n == 0 or lo is None:
        return ray.data.from_items([])
    n_partitions = max(1, min(n_partitions, n))
    span = (hi - lo + 1 + n_partitions - 1) // n_partitions
    parts = [
        {"lo": lo + i * span, "hi": min(hi, lo + (i + 1) * span - 1)}
        for i in range(n_partitions)
        if lo + i * span <= hi
    ]
    col_sql = ", ".join(columns) if columns else "*"

    def read_range(batch: pa.Table) -> pa.Table:
        tables = []
        con = _open_ro(db_path)
        try:
            for r in batch.to_pylist():
                cur = con.execute(
                    f"SELECT {col_sql} FROM {table} "
                    f"WHERE rowid BETWEEN ? AND ? ORDER BY rowid",
                    (r["lo"], r["hi"]),
                )
                names = [d[0] for d in cur.description]
                rows = cur.fetchall()
                if rows:
                    cols = list(zip(*rows))
                    tables.append(
                        pa.table({nm: pa.array(c) for nm, c in zip(names, cols)})
                    )
        finally:
            con.close()
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return ray.data.from_items(parts).map_batches(
        read_range, batch_format="pyarrow", batch_size=1
    )


def read_sqlite_query(db_path: str, query: str) -> "ray.data.Dataset":
    """Single-task ordered query (the reference's small ordered scans,
    ``warp_to_rdf.py:64-67``). For big tables use ``read_sqlite_table``."""

    def run(_batch: pa.Table) -> pa.Table:
        con = _open_ro(db_path)
        try:
            cur = con.execute(query)
            names = [d[0] for d in cur.description]
            rows = cur.fetchall()
        finally:
            con.close()
        if not rows:
            return pa.table({nm: pa.array([]) for nm in names})
        cols = list(zip(*rows))
        return pa.table({nm: pa.array(c) for nm, c in zip(names, cols)})

    return ray.data.from_items([{"q": 0}]).map_batches(
        run, batch_format="pyarrow", batch_size=1
    )
