"""Analytics queries vs DuckDB oracle at sf0.001 (the driver's gate,
replicated in-process; tools/check_oracle.py runs the sf0.01 version)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(obj):
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(name, oracle_con):
    mine = _canon(_to_pandas(entry_mod.queries()[name](SF)))
    oracle = _canon(oracle_con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle)


def test_all_queries_have_callables():
    qs = entry_mod.queries()
    assert set(entry_mod.oracle_sql()) <= set(qs)
    assert len(qs) >= 20


def test_parts_supplier_counts_rejects_oversized_keys(tmp_path):
    """ADVICE r3: keys >= 2^31 would silently corrupt the packed
    (partkey, suppkey) pair — the query must raise instead."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    import pyarrow as _pa
    from session_graph_ray.pipelines.analytics import q_parts_supplier_counts

    pq.write_table(_pa.table({
        "s_suppkey": _pa.array([1], _pa.int64()),
        "s_acctbal": _pa.array([10.0]),
    }), tmp_path / "supplier.parquet")
    pq.write_table(_pa.table({
        "p_partkey": _pa.array([2**31 + 5], _pa.int64()),
        "p_brand": _pa.array(["B"]), "p_type": _pa.array(["T"]),
        "p_size": _pa.array([1], _pa.int64()),
    }), tmp_path / "part.parquet")
    pq.write_table(_pa.table({
        "l_partkey": _pa.array([2**31 + 5], _pa.int64()),
        "l_suppkey": _pa.array([1], _pa.int64()),
    }), tmp_path / "lineitem.parquet")
    with _pytest.raises((ValueError, Exception)) as ei:
        q_parts_supplier_counts(str(tmp_path)).to_pandas()
    assert "31 bits" in str(ei.value)
