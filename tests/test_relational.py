"""Relational-operator conformance vs DuckDB at sf0.001 (in-suite
mirror of the driver's oracle gate; tools/check_oracle.py runs the full
catalog at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


SAMPLE = ["q_agg_pricing", "q_left_join_orders", "q_events_hourly",
          "q_topk_orders", "q_distinct_flags", "q_doc_token_counts",
          "q_knn_top10", "q_union_priorities", "q_events_range_join",
          "q_knn_lsh", "q_knn_ivf"]


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(ray_session, oracle, sf_dir, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    mine = _to_pandas(entrymod.queries()[name](sf_dir))
    ref = oracle.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(mine.columns) == sorted(ref.columns)
    assert len(mine) == len(ref)
    pd.testing.assert_frame_equal(_norm(mine), _norm(ref))


def test_dereference_loop(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.relational import dereference

    triples = rd.from_arrow(pa.table({
        "subj": ["a", "b", "c", "z", "b"],
        "pred": ["p"] * 5,
        "obj": ["b", "c", "a", "q", "d"],   # cycle a->b->c->a, plus b->d
    }))
    out = dereference(triples, ["a"], depth=3)
    rows = {(r["subj"], r["obj"]) for r in out.take_all()}
    # depth 3 from a: hop1 a->b, hop2 b->{c,d}, hop3 c->a (cycle-safe)
    assert rows == {("a", "b"), ("b", "c"), ("b", "d"), ("c", "a")}

    # driver_cap=1 forces the spill-to-Dataset mode (frontier/visited
    # as Datasets, Bloom semi-joins per round) after the first hop —
    # must produce exactly the driver-mode result, cycle guard intact
    out2 = dereference(triples, ["a"], depth=3, driver_cap=1)
    rows2 = {(r["subj"], r["obj"]) for r in out2.take_all()}
    assert rows2 == rows

    # cap crossed mid-walk with depth exhausting in Dataset mode
    out3 = dereference(triples, ["a"], depth=2, driver_cap=1)
    rows3 = {(r["subj"], r["obj"]) for r in out3.take_all()}
    assert rows3 == {("a", "b"), ("b", "c"), ("b", "d")}


def test_annotate_actor_pool_parity(ray_session, pages_table):
    """compute='actors' must produce exactly the tasks-path output."""
    import ray.data as rd

    from k_gap_ray.ops.annotate import annotate_stage
    from k_gap_ray.ops.extract import extract_stage

    pages = rd.from_arrow(pages_table.slice(0, 100)).repartition(2)
    base = extract_stage(pages)
    a = annotate_stage(base, compute="tasks")
    b = annotate_stage(base, compute="actors", concurrency=2)

    def key_set(ds):
        return {tuple(sorted((k, str(v)) for k, v in r.items()))
                for r in ds.take_all()}

    assert key_set(a) == key_set(b)


def test_grouped_topk_ties_and_layout(ray_session):
    """Partial-cut + per-group finisher must equal the window-function
    semantics (value DESC, tiebreak ASC, rank 1..k) under any block
    layout, including tied values crossing the cut."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.relational import grouped_topk

    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
        "v": pa.array([3.0, 5.0, 5.0, 5.0, 1.0, 2.0, 2.0], pa.float64()),
        "id": pa.array([10, 11, 12, 13, 14, 20, 21], pa.int64()),
    })
    want = {("a", 11, 1), ("a", 12, 2), ("a", 13, 3),
            ("b", 20, 1), ("b", 21, 2)}
    for parts in (1, 5):
        ds = rd.from_arrow(t).repartition(parts)
        got = {(r["g"], r["id"], r["rank"])
               for r in grouped_topk(ds, "g", "v", 3, "id").take_all()}
        assert got == want, parts


def test_grouped_median_exact(ray_session):
    """Histogram-combiner median: odd group -> middle value, even
    group -> mean of the two middles, exact at 2-decimal fixed point."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.relational import grouped_median_scaled

    t = pa.table({
        "g": pa.array(["odd"] * 3 + ["even"] * 4 + ["one"], pa.string()),
        "v": pa.array([1.25, 9.75, 2.5, 4.0, 1.0, 2.0, 3.0, 7.77],
                      pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    got = {r["g"]: (r["median_value"], r["n"])
           for r in grouped_median_scaled(ds, "g", "v", 100).take_all()}
    assert got == {"odd": (2.5, 3), "even": (2.5, 4), "one": (7.77, 1)}


def test_hourly_distinct_users_matches_duckdb(ray_session, sf_dir):
    """Grouped COUNT DISTINCT via in-batch pair dedup + two-level
    groupby equals the SQL answer."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    got = _to_pandas(em.queries()["q_events_hourly_users"](sf_dir))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(em.oracle_sql()["q_events_hourly_users"]).fetchdf()
    assert len(got) == len(want)
    g = _norm(got)
    w = _norm(want)
    assert g.equals(w)


def test_lineitem_cube_matches_oracle(ray_session):
    """CUBE derives per-flag, per-status, and grand-total cells from
    the one base aggregate; padded NULLs match SQL CUBE exactly."""
    import duckdb

    from k_gap_ray.relational import q_lineitem_cube

    sf_dir = "/root/testdata/sf0.001"
    eng = q_lineitem_cube(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    ora = con.execute("""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """).df()
    key = ["l_returnflag", "l_linestatus"]
    e = eng.fillna("~").sort_values(key).reset_index(drop=True)
    o = ora.fillna("~").sort_values(key).reset_index(drop=True)
    assert e.to_dict("records") == o.to_dict("records")


def test_shipping_priority_composite(ray_session, sf_dir):
    """TPC-H Q3 shape: broadcast segment filter + pre-aggregated fact
    join + pinned total-order top-k matches the three-table SQL on a
    tier where every stage has rows; revenue is the exact fixed-point
    sum (no float drift at the cutoff)."""
    import duckdb

    from k_gap_ray.relational import q_shipping_priority

    got = q_shipping_priority(sf_dir).to_pylist()
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    want = [dict(zip(("l_orderkey", "revenue", "o_orderdate",
                      "o_orderpriority"), r)) for r in con.execute("""
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount)
                              * 10000) AS BIGINT)) / 10000.0 AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                                * 10000) AS BIGINT)) DESC,
                 o_orderdate, l_orderkey
        LIMIT 10""").fetchall()]
    assert len(got) == 10
    assert [(g["l_orderkey"], g["revenue"]) for g in got] == \
        [(w["l_orderkey"], w["revenue"]) for w in want]


def test_local_supplier_volume_composite(ray_session, sf_dir):
    """TPC-H Q5 shape: one fact hash join + broadcast dim attaches,
    same-nation filter AFTER the join; the supplier table's only
    catalog exercise. Exact fixed-point revenue matches the 6-table
    SQL including the descending order."""
    import duckdb

    from k_gap_ray.relational import q_local_supplier_volume

    got = q_local_supplier_volume(sf_dir).to_pylist()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "orders", "lineitem",
              "supplier"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    want = con.execute("""
        SELECT n_name,
               sum(CAST(round(l_extendedprice * (1 - l_discount)
                              * 10000) AS BIGINT)) / 10000.0 AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
                     AND s_nationkey = c_nationkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                                * 10000) AS BIGINT)) DESC, n_name
        """).fetchall()
    assert [(g["n_name"], g["revenue"]) for g in got] == want
    assert len(got) > 0


def test_customer_deciles_concentration(ray_session, sf_dir):
    """Pareto deciles: the global NTILE(10) by revenue DESC through
    the value-bucket machinery matches SQL exactly, decile counts
    follow SQL's fill rule, and decile 1's revenue dominates decile
    10's (the concentration the report exists to show)."""
    import duckdb

    import __ray_entry__ as em

    got = {r["decile"]: (r["n_customers"], r["revenue"]) for r in
           em.queries()["q_customer_deciles"](sf_dir).take_all()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"'{sf_dir}/orders.parquet'")
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        em.oracle_sql()["q_customer_deciles"]).fetchall()}
    assert got == want
    assert set(got) == set(range(1, 11))
    assert got[1][1] > got[10][1]
