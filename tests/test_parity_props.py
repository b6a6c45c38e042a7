"""Property tests for cross-engine parity primitives: the rolling
codepoint hash (token/fingerprint/snapshot-diff foundation) and the
signed trunc-division pin — each checked against DuckDB itself on
arbitrary inputs, batched one query per example."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from k_gap_ray.functions.similarity import _trunc_div
from k_gap_ray.functions.textstats import (H1_BASE, H1_MOD, hash_tokens,
                                           sql_token_hash_expr)

_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                                   exclude_characters="'"),
            min_size=0, max_size=40),
    min_size=1, max_size=20)


@settings(max_examples=50, deadline=None)
@given(_texts)
def test_rolling_hash_matches_duckdb_on_ascii(texts):
    got = hash_tokens(pa.array(texts, pa.string()), H1_BASE, H1_MOD)
    con = duckdb.connect()
    expr = sql_token_hash_expr("t", H1_BASE, H1_MOD)
    vals = ", ".join(f"('{t}')" for t in texts)
    want = [r[0] for r in con.execute(
        f"SELECT {expr} FROM (VALUES {vals}) AS v(t)").fetchall()]
    assert [int(x) for x in got] == want


_nonascii = st.lists(
    st.text(alphabet=st.characters(min_codepoint=0x20,
                                   max_codepoint=0x2FF,
                                   exclude_characters="'"),
            min_size=1, max_size=20),
    min_size=1, max_size=8)


@settings(max_examples=30, deadline=None)
@given(_nonascii)
def test_rolling_hash_matches_duckdb_beyond_ascii(texts):
    """The per-token codepoint fallback path must agree too."""
    got = hash_tokens(pa.array(texts, pa.string()), H1_BASE, H1_MOD)
    con = duckdb.connect()
    expr = sql_token_hash_expr("t", H1_BASE, H1_MOD)
    vals = ", ".join(f"('{t}')" for t in texts)
    want = [r[0] for r in con.execute(
        f"SELECT {expr} FROM (VALUES {vals}) AS v(t)").fetchall()]
    assert [int(x) for x in got] == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(-10**12, 10**12),
                          st.integers(1, 10**6)),
                min_size=1, max_size=50))
def test_trunc_div_matches_duckdb_floor_free(pairs):
    s = np.array([p[0] for p in pairs], dtype=np.int64)
    c = np.array([p[1] for p in pairs], dtype=np.int64)
    got = _trunc_div(s, c)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    want = [r[0] for r in con.execute(
        f"SELECT a // b FROM (VALUES {vals}) AS v(a, b)").fetchall()]
    assert got.tolist() == want
