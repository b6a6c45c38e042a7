"""Sliding-window chunking: DuckDB parity + pinned edge cases."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from k_gap_ray.functions.chunking import chunk_spans, sql_chunk_spans


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)[["doc_id", "chunk_id", "start_tok",
                                     "n_tok", "n_chars", "chunk"]])


def _run(tbl: pa.Table, size: int, stride: int) -> pd.DataFrame:
    import ray.data as rd

    ds = chunk_spans(rd.from_arrow(tbl), size=size, stride=stride)
    return _norm(ds.to_pandas())


def _oracle(tbl: pa.Table, size: int, stride: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    df = con.execute(sql_chunk_spans(size=size, stride=stride)).df()
    con.close()
    return _norm(df)


def test_edge_docs_match_oracle(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "",                                  # one empty token
            "solo",                              # shorter than size
            "a b c d e f g h",                   # exact multiple
            "w1 w2 w3 w4 w5 w6 w7 w8 w9",        # trailing partial
            None,                                # NULL == ''
        ])})
    got = _run(tbl, size=4, stride=2)
    want = _oracle(tbl, size=4, stride=2)
    pd.testing.assert_frame_equal(got, want)
    one = got[got.doc_id == 1]
    assert len(one) == 1 and one.iloc[0].n_tok == 1 \
        and one.iloc[0].n_chars == 0 and one.iloc[0].chunk == ""


def test_overlap_and_coverage(ray_session):
    text = " ".join(f"t{i}" for i in range(10))
    tbl = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "text": pa.array([text])})
    got = _run(tbl, size=4, stride=3)
    # starts 0,3,6,9 (< n_tokens=10); last chunk length 1
    assert list(got.start_tok) == [0, 3, 6, 9]
    assert list(got.n_tok) == [4, 4, 4, 1]
    assert got.iloc[0].chunk == "t0 t1 t2 t3"
    assert got.iloc[-1].chunk == "t9"
    # every token appears in at least one chunk
    seen = set()
    for c in got.chunk:
        seen.update(c.split(" "))
    assert seen == {f"t{i}" for i in range(10)}


@pytest.mark.parametrize("size,stride", [(64, 48), (8, 8), (5, 2)])
def test_sf_corpus_matches_oracle(ray_session, sf_dir, size, stride):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    got = _run(tbl, size, stride)
    want = _oracle(tbl, size, stride)
    pd.testing.assert_frame_equal(got, want)


def test_bad_params_raise(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["x"])}))
    with pytest.raises(ValueError):
        chunk_spans(ds, size=0)
    with pytest.raises(ValueError):
        chunk_spans(ds, stride=0)
