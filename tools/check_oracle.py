"""Local replica of the driver's correctness gate: run every queries() entry
and compare row-count / schema / order-insensitive values against oracle_sql()
via DuckDB. Usage:
    python tools/check_oracle.py [sf_dir] [name ...]
    python tools/check_oracle.py --json OUT.json [sf_dir] [name ...]
With --json, per-query results (rows/schema/hash match booleans, the
driver's CORRECTNESS schema) are also written to OUT.json."""

from __future__ import annotations

import logging
import sys
import time

import duckdb
import pandas as pd


def _to_pandas(obj):
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object or pd.api.types.is_string_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, ".")
    import __ray_entry__ as entry_mod

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict = {}

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oq = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = _to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            results[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oq:
            print(f"ok   {name}: rows={len(mine)} (rows-only, {dt:.1f}s)")
            results[name] = {"rows_only": True, "spark_rows": len(mine),
                             "err": None, "sec": round(dt, 2)}
            continue
        try:
            oracle = con.execute(oq[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            results[name] = {"err": f"oracle: {e}"[:200]}
            failures += 1
            continue
        a, b = _canon(mine), _canon(oracle)
        rec = {
            "rows_match": len(a) == len(b),
            "schema_match": list(a.columns) == list(b.columns),
            "hash_match": False,
            "spark_rows": len(a),
            "oracle_rows": len(b),
            "err": None,
            "sec": round(dt, 2),
        }
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} mismatched rows of {len(a)}")
            print("mine:\n", a[neq].head(3))
            print("oracle:\n", b[neq].head(3))
            failures += 1
        else:
            rec["hash_match"] = True
            print(f"ok   {name}: rows={len(a)} MATCH ({dt:.1f}s)")
        results[name] = rec
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} entries)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
