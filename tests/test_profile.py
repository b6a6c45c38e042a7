"""ANALYZE-style table profiling (functions/profile.py)."""
import pyarrow as pa
import pytest


def test_profile_table_kinds_nulls_and_ndv(ray_session):
    """One row per column: floats encode min/max as cents while ndv
    counts RAW distinct values (1.001 vs 1.002 collapse to the same
    cents but stay two distinct values); nulls are excluded from
    min/max and counted; strings report min_str/max_str; timestamps
    land as epoch micros — all matching the per-column UNION ALL
    mirror."""
    import datetime as dt

    import duckdb
    import ray.data as rd

    from k_gap_ray.functions.profile import (profile_table,
                                             sql_profile_table)

    t = pa.table({
        "i": pa.array([3, 1, None, 7], pa.int64()),
        "f": pa.array([1.001, 1.002, 2.5, None], pa.float64()),
        "s": pa.array(["b", None, "a", "c"]),
        "ts": pa.array([dt.datetime(2024, 1, 1), None,
                        dt.datetime(2024, 6, 1),
                        dt.datetime(2024, 1, 1)],
                       pa.timestamp("us")),
    })
    got = profile_table(rd.from_arrow(t).repartition(2),
                        ["i", "f", "s", "ts"]).to_pylist()
    con = duckdb.connect()
    con.register("t", t)
    want = [dict(zip(("column", "n", "n_null", "n_distinct", "min_key",
                      "max_key", "min_str", "max_str"), r))
            for r in con.execute(sql_profile_table(
                "t", {"i": "int", "f": "float", "s": "str",
                      "ts": "ts"})).fetchall()]
    assert sorted(got, key=lambda r: r["column"]) == \
        sorted(want, key=lambda r: r["column"])
    by = {r["column"]: r for r in got}
    assert by["f"]["n_distinct"] == 3            # raw values, not cents
    assert by["f"]["min_key"] == 100             # round(1.001*100)
    assert by["i"]["n_null"] == 1 and by["i"]["min_key"] == 1
    assert by["s"]["min_str"] == "a" and by["s"]["max_str"] == "c"
    assert by["ts"]["n_distinct"] == 2


def test_profile_table_ndv_cap_raises(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.profile import profile_table

    t = pa.table({"x": pa.array(range(100), pa.int64())})
    with pytest.raises(ValueError, match="distinct exact cap"):
        profile_table(rd.from_arrow(t), ["x"], ndv_cap=10)
