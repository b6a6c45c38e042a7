"""Flat-JSON integer-field extraction (functions/jsonx.py).

Covers the documented value-shape contract (bare/quoted integers
accepted; floats, non-numeric strings, missing keys, malformed JSON,
and NULL payloads all null), oracle parity on synthetic edges AND the
sf events corpus, and the grouped-stats shuffle shape."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from k_gap_ray.functions.jsonx import (json_field_stats, json_int_field,
                                       sql_json_field_stats)

EDGES = [
    ('{"k": 69}', 69),
    ('{"k": -7}', -7),
    ('{"k": "42"}', 42),          # quoted integer accepted
    ('{"k": 69.5}', None),        # non-integral
    ('{"k": "69abc"}', None),     # non-numeric string
    ('{"j": 5}', None),           # key absent
    ('{"kk": 5}', None),          # key is a strict match
    ('{"a": 1, "k": 8}', 8),      # not the first field
    ('not json', None),           # malformed
    ('', None),
    (None, None),
]


def test_json_int_field_contract(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "i": pa.array(range(len(EDGES)), pa.int64()),
        "props": pa.array([e[0] for e in EDGES], pa.string())})
    out = (json_int_field(rd.from_arrow(tbl), "props", "k")
           .to_pandas().sort_values("i"))
    got = [None if pd.isna(v) else int(v) for v in out["k"]]
    assert got == [e[1] for e in EDGES]


def test_json_field_stats_oracle_on_edges_and_corpus(ray_session,
                                                     sf_dir):
    import ray.data as rd

    # synthetic: two groups, one with no extractable values at all
    rows = [(g, p) for g, (p, _) in
            zip(["a", "b"] * 6, EDGES + EDGES[:1])]
    rows += [("empty", "not json"), ("empty", '{"k": 1.5}')]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "props": pa.array([r[1] for r in rows], pa.string())})
    got = (json_field_stats(rd.from_arrow(tbl).repartition(4),
                            "props", "k", by="event_type")
           .to_pandas().sort_values("event_type")
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("ev", tbl)
    want = (con.execute(sql_json_field_stats("props", "k",
                                             by="event_type",
                                             rel="ev")).df()
            .sort_values("event_type").reset_index(drop=True))
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    empty = got.set_index("event_type").loc["empty"]
    assert empty.n == 2 and empty.n_k == 0 and pd.isna(empty.sum_k)

    # sf corpus parity
    etbl = pq.read_table(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    got = (json_field_stats(rd.from_arrow(etbl), "props", "k",
                            by="event_type")
           .to_pandas().sort_values("event_type")
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", etbl)
    want = (con.execute(sql_json_field_stats("props", "k",
                                             by="event_type")).df()
            .sort_values("event_type").reset_index(drop=True))
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_json_key_validation():
    with pytest.raises(ValueError, match="key"):
        json_int_field(None, "props", 'k"bad')
    with pytest.raises(ValueError, match="key"):
        sql_json_field_stats("props", "x.y", by="t")
