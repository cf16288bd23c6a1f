"""Byte-set Jaccard kernel parity with DuckDB's jaccard() (the oracle for
q_doc_char_jaccard)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _py_jaccard(x: str, y: str) -> float:
    sa, sb = set(x.encode()), set(y.encode())
    u = len(sa | sb)
    return (len(sa & sb) / u) if u else 1.0


@settings(max_examples=80, deadline=None)
@given(st.text(min_size=1, max_size=30), st.text(min_size=1, max_size=30))
def test_byte_jaccard_matches_duckdb(x, y):
    con = duckdb.connect()
    try:
        ref = con.execute("SELECT jaccard(?, ?)", [x, y]).fetchone()[0]
    except duckdb.Error:
        pytest.skip("duckdb rejects this input (e.g. NUL bytes)")
    assert abs(_py_jaccard(x, y) - ref) < 1e-12, (x, y)
