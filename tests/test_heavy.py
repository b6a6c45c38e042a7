"""Exact top-k heavy hitters: oracle parity, pruning-bound fallback."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa

from k_gap_ray.functions.heavy import heavy_hitters, sql_heavy_hitters


def _oracle(tbl: pa.Table, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    df = con.execute(sql_heavy_hitters(k=k)).df()
    con.close()
    return df.reset_index(drop=True)


def _got(tbl: pa.Table, k: int, counters: int) -> pd.DataFrame:
    import ray.data as rd

    return heavy_hitters(rd.from_arrow(tbl), k=k,
                         counters=counters).to_pandas()


def test_certified_path_matches_oracle(ray_session):
    # zipf-ish corpus: token ti appears ~ 600/(i+1) times across docs
    rows = []
    toks = []
    for i in range(120):
        toks += [f"t{i:03d}"] * (600 // (i + 1))
    for d in range(40):
        rows.append(" ".join(toks[d::40]))
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(rows)})
    got = _got(tbl, k=10, counters=64)
    want = _oracle(tbl, k=10)
    pd.testing.assert_frame_equal(got.astype({"rank": "int64"}),
                                  want.astype({"rank": "int64"}))


def test_fallback_path_is_still_exact(ray_session):
    # near-uniform counts with ties: counters=2 cannot certify top-5,
    # so the full-vocabulary fallback must fire and stay exact
    rows = [" ".join(f"w{i}" for i in range(30)) for _ in range(6)]
    rows[0] += " w0 w1"            # break perfect uniformity slightly
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "text": pa.array(rows)})
    got = _got(tbl, k=5, counters=2)
    want = _oracle(tbl, k=5)
    pd.testing.assert_frame_equal(got.astype({"rank": "int64"}),
                                  want.astype({"rank": "int64"}))
    # tie-break is token ASC: w1 has 7, then six-count tokens by name
    assert list(got.token[:2]) == ["w0", "w1"]


def test_sf_corpus_matches_oracle(ray_session, sf_dir):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    got = _got(tbl, k=20, counters=64)
    want = _oracle(tbl, k=20)
    pd.testing.assert_frame_equal(got.astype({"rank": "int64"}),
                                  want.astype({"rank": "int64"}))
