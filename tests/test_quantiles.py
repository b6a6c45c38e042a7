"""exact_quantiles vs the DuckDB quantile_disc oracle."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest


def _cross_check(vals, qs=None):
    import duckdb
    import ray.data as rd

    from k_gap_ray.functions.quantiles import exact_quantiles, quantiles_sql

    kwargs = {} if qs is None else {"qs": qs}
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    eng = exact_quantiles(ds.repartition(5), "x", **kwargs).to_pandas()
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals, pa.int64())}))
    ora = con.execute(quantiles_sql("x", "t", **kwargs)).df()
    assert eng.to_dict("records") == ora.to_dict("records")


def test_quantiles_random_with_ties_and_nulls(ray_session):
    random.seed(23)
    vals = ([random.randint(-40, 999) for _ in range(2000)]
            + [17] * 300 + [None] * 21)
    _cross_check(vals)


def test_quantiles_single_value(ray_session):
    _cross_check([5] * 97)


def test_quantiles_extreme_qs(ray_session):
    random.seed(5)
    vals = [random.randint(0, 9) for _ in range(64)]
    _cross_check(vals, qs=(0.001, 0.5, 1.0))


def test_grouped_quantiles_matches_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from k_gap_ray.functions.quantiles import (grouped_quantiles,
                                               grouped_quantiles_sql)

    random.seed(11)
    keys = [random.choice(["en", "fr", "de"]) for _ in range(900)]
    vals = [random.randint(0, 250) for _ in range(900)]
    t = pa.table({"lang": pa.array(keys, pa.string()),
                  "x": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(t).repartition(7)
    eng = (grouped_quantiles(ds, "lang", "x").to_pandas()
           .sort_values(["key", "q"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    ora = (con.execute(grouped_quantiles_sql("lang", "x", "t")).df()
           .sort_values(["key", "q"]).reset_index(drop=True))
    assert eng.to_dict("records") == ora.to_dict("records")


def test_quantiles_rejects_bad_input(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.quantiles import exact_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array([None, None],
                                               pa.int64())}))
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantiles(ds, "x")
    ds2 = rd.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="quantiles must lie"):
        exact_quantiles(ds2, "x", qs=(0.0, 0.5))
