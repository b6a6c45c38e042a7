"""Relational / aggregation operator surface (SURVEY.md sections 2.4-2.7).

The reference exercises these operators as SPARQL over GraphDB
(BGP joins, OPTIONAL, NOT EXISTS, grouped counts, HAVING, ORDER BY /
LIMIT, DISTINCT — citations per function). Here each one is a Ray Data
pipeline over the driver's Parquet tables, with column pruning at the
read and partial pre-aggregation before shuffles. Every function takes
``sf_dir`` and returns a Dataset / pyarrow Table; the matching DuckDB
oracle SQL lives in ``__ray_entry__.oracle_sql``.

Float SUM/AVG outputs use fixed-point int64 scaling on both sides
(`scaled_int_col` here, `sum(CAST(round(x*scale) AS BIGINT))/scale.0`
in the oracle SQL) so order-of-summation float noise cannot break the
driver's value-hash comparison; integral-double aggregates are exact
by construction and only rounded for display.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _rd():
    import ray.data as rd

    return rd


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    from k_gap_ray.dsutil import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet",
                              columns=columns)


def scaled_int_col(t: pa.Table, name: str, values, scale: int) -> pa.Table:
    """Append round(values*scale) as int64 — makes a float SUM exact.

    Sums of non-integral doubles are order-dependent in the last ULP;
    when the true sum sits on a rounding boundary, Ray and a SQL oracle
    can round to different cents. Fixed-point per-row scaling makes the
    sum an exact int64 on both sides (decimal inputs scale to integers
    up to float noise ~1e-9, far from any .5)."""
    import numpy as np

    arr = np.rint(pc.cast(values, pa.float64()).to_numpy(
        zero_copy_only=False) * scale).astype("int64")
    return t.append_column(name, pa.array(arr, type=pa.int64()))


def _unscale(ds, col: str, scale: int):
    """int64 scaled sum -> float via one double division — bit-identical
    to the SQL `sum(CAST(...AS BIGINT)) / scale.0`. No final rounding:
    a half-even vs half-away difference at a true .5 boundary would
    reintroduce the coin flip the fixed-point sum just removed."""

    def f(t: pa.Table, c=col) -> pa.Table:
        arr = t.column(c).to_numpy(zero_copy_only=False) / float(scale)
        return t.set_column(t.column_names.index(c), c,
                            pa.array(arr, type=pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow")


def _round_col(ds, col: str, digits: int):
    # numpy round (== python/duckdb round at the ULP level); pyarrow's
    # pc.round computes scaled multiply/divide and lands on different
    # doubles, which breaks value-hash comparison against a SQL oracle.
    import numpy as np

    def f(t: pa.Table, c=col, d=digits) -> pa.Table:
        arr = np.round(pc.cast(t.column(c), pa.float64()).to_numpy(
            zero_copy_only=False), d)
        return t.set_column(t.column_names.index(c), c,
                            pa.array(arr, type=pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Aggregations (A1-A7)
# ---------------------------------------------------------------------------

def q_agg_pricing(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate (A3/A5 + M3 filter).

    Reference analogue: grouped count/type distribution queries,
    /root/reference/docs/components/sembench.md:244-250."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.less_equal(t.column("l_shipdate"),
                          pa.scalar(pa.compute.strptime("1998-09-01",
                                                        format="%Y-%m-%d",
                                                        unit="us")))),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: scaled_int_col(
            t, "revenue_s",
            pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            10_000),
        batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("revenue_s", alias_name="sum_revenue"),
        Mean("l_quantity", alias_name="avg_qty"),
        Count(alias_name="n"),
    )
    out = _round_col(out, "sum_qty", 2)       # integral doubles: exact sum
    out = _unscale(out, "sum_revenue", 10_000)
    out = _round_col(out, "avg_qty", 4)
    return out


def q_filter_bind(sf_dir: str):
    """M3 FILTER + M4 BIND: computed revenue over a predicate filter,
    aggregated per return flag (docs/components/sembench.md:178-179)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"])
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t.column("l_quantity"), pa.scalar(10.0)),
                    pc.less(t.column("l_discount"), pa.scalar(0.05)))),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: scaled_int_col(
            t, "revenue_s",
            pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
            10_000),
        batch_format="pyarrow")
    out = ds.groupby("l_returnflag").aggregate(
        Sum("revenue_s", alias_name="sum_revenue"),
        Count(alias_name="n"))
    return _unscale(out, "sum_revenue", 10_000)


def q_count_distinct(sf_dir: str):
    """A2 COUNT(DISTINCT) — docs/components/sembench.md:242."""
    ds = _read(sf_dir, "lineitem", ["l_suppkey"])
    n = (ds.groupby("l_suppkey").count()).count()
    return pa.table({"n_distinct_supp": pa.array([n], type=pa.int64())})


def q_having(sf_dir: str):
    """A6 HAVING count > threshold — docs/advanced-topics.md:377-394."""
    ds = _read(sf_dir, "orders", ["o_custkey"])
    out = ds.groupby("o_custkey").count().rename_columns({"count()": "n_orders"})
    return out.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_orders"), pa.scalar(12))),
        batch_format="pyarrow")


def q_events_by_type(sf_dir: str):
    """A3+A4: grouped count / MAX(ts) / AVG — per-graph accounting
    analogue, docs/components/ldes-consumer.md:330-343."""
    from ray.data.aggregate import Count, Max, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    ds = ds.map_batches(
        lambda t: scaled_int_col(t, "value_s", t.column("value"), 100),
        batch_format="pyarrow")
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Max("ts", alias_name="max_ts"),
        Sum("value_s", alias_name="avg_value"))

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        avg = (t.column("avg_value").to_numpy(zero_copy_only=False)
               / 100.0
               / t.column("n").to_numpy(zero_copy_only=False))
        return t.set_column(t.column_names.index("avg_value"), "avg_value",
                            pa.array(avg, pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_hourly(sf_dir: str):
    """Tumbling 1h event-time window via key normalization + groupby
    (streaming-shaped aggregate; SURVEY.md section 2.8)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        # arrow-native window-key normalization: this map runs
        # pre-shuffle over raw read blocks, where a pandas conversion
        # would pay its per-block constant cost on every tiny block
        win = pc.floor_temporal(t.column("ts"), unit="hour")
        return scaled_int_col(
            pa.table({"window_start": win}), "value_s", t.column("value"),
            100)

    out = (ds.map_batches(add_window, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("window_start").aggregate(
               Count(alias_name="n"),
               Sum("value_s", alias_name="sum_value")))
    out = out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("window_start"), "window_start",
            pc.cast(t.column("window_start"), pa.timestamp("us"))),
        batch_format="pyarrow")  # ns->us so the oracle compare sees one unit
    return _unscale(out, "sum_value", 100)


def q_events_sliding(sf_dir: str):
    """Sliding event-time window (size 2h, slide 1h): each event is
    replicated to the two windows containing it inside the per-batch
    map (flat-map by window key), then one grouped aggregate — the
    standard Ray Data expression of overlapping windows. Fixed-point
    sums as elsewhere."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "value"])
    hour = pa.scalar(3_600_000_000, pa.duration("us"))

    def explode_windows(t: pa.Table) -> pa.Table:
        win0 = pc.cast(pc.floor_temporal(t.column("ts"), unit="hour"),
                       pa.timestamp("us"))
        base = scaled_int_col(pa.table({"window_start": win0}),
                              "value_s", t.column("value"), 100)
        shifted = base.set_column(
            0, "window_start", pc.subtract(base.column("window_start"),
                                           hour))
        return pa.concat_tables([base, shifted])

    out = (ds.map_batches(explode_windows, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("window_start").aggregate(
               Count(alias_name="n"),
               Sum("value_s", alias_name="sum_value")))
    return _unscale(out, "sum_value", 100)


def q_events_sessions(sf_dir: str, gap_hours: int = 24):
    """Session windows (gap-based): per user, events closer than
    `gap_hours` chain into one session. Ray Data has no session-window
    primitive; the composition is ONE global (user, ts, id) sort +
    vectorized per-batch sessionization + an O(batches) driver seam
    stitch (functions/windows.py:sessions_sorted) — exact semantics
    (the stitch re-applies the same gap rule across batch seams),
    hot-key-safe (the sort splits a user's stream freely), and no
    per-group pandas overhead. Values are fixed-point int64."""
    from k_gap_ray.functions.windows import sessions_sorted

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return sessions_sorted(ds, key_col="user_id", ts_col="ts",
                           id_col="event_id", value_col="value",
                           gap_hours=gap_hours, scale=100)


def q_events_asof_click(sf_dir: str):
    """As-of join WITHIN the event stream: for every 'error' event,
    the most recent prior 'click' event of the same user (event-time
    as-of, ties broken by event_id). Ray Data lacks an as-of join;
    the composition is the hot-key-safe composite (user x day-bucket)
    forward-carry with per-bucket last-match summaries chained into
    carry-ins (functions/windows.py:asof_carry_bucketed) — exact, and
    one pathological user no longer concentrates in one task."""
    from k_gap_ray.functions.windows import asof_carry_bucketed

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    return asof_carry_bucketed(ds, key_col="user_id", ts_col="ts",
                               id_col="event_id", type_col="event_type",
                               probe_type="error", match_type="click",
                               out_col="click_event_id")


def q_events_user_running(sf_dir: str):
    """Per-key ordered running aggregate (streaming-shaped windowing:
    partition by key, sort by event time within the partition, carry
    state across the ordered group — SURVEY.md section 2.8 / guide's
    groupby(key).map_groups window pattern). Values are fixed-point
    int64 so the cumulative sum is exact and order-stable vs the SQL
    window-function oracle."""

    from k_gap_ray.functions.windows import running_sum_bucketed

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return running_sum_bucketed(ds, key_col="user_id", ts_col="ts",
                                id_col="event_id", value_col="value",
                                out_col="running_value_s", scale=100)


def q_orders_rank(sf_dir: str):
    """Partition-by window RANK: dense_rank of order value within its
    priority class. Rank is computed on the fixed-point int price, so
    it depends only on VALUES (ties share a rank) — deterministic
    across engines with no tie-order ambiguity. Hot-key-safe since
    round 4: 5 priority classes is a known-skewed partitioning, so the
    rank runs as a composite (priority, value-range-bucket) pre-split
    with a distinct-count carry stitch (functions/windows.py) — no
    task ever holds a whole priority class. bucket_width 1<<18 fixed-
    point cents (~$2.6k) gives ~200 buckets over TPC-H's totalprice
    range at any SF."""
    from k_gap_ray.functions.windows import dense_rank_bucketed

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return dense_rank_bucketed(ds, key_col="o_orderpriority",
                               value_col="o_totalprice",
                               id_col="o_orderkey",
                               out_col="price_rank", scale=100,
                               bucket_width=1 << 18, descending=True)


def q_events_ntile(sf_dir: str):
    """NTILE window: quartile assignment of event value within its
    event-type partition, ordered by the exact fixed-point value with
    event_id tie-break (fully deterministic). SQL's NTILE fill rule —
    the first n%k buckets take the extra row — reproduced verbatim.
    Hot-key-safe since round 4: handful-of-event-types is a skewed
    partitioning, so positions come from a composite
    (type, value-range-bucket) pre-split with a row-count carry stitch
    (functions/windows.py); event values are 2-decimal in [0,100], so
    bucket_width=128 fixed-point gives ~80 buckets per type."""
    from k_gap_ray.functions.windows import ntile_bucketed

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return ntile_bucketed(ds, key_col="event_type", value_col="value",
                          id_col="event_id", k=4, out_col="quartile",
                          scale=100, bucket_width=128)


def q_events_watermark(sf_dir: str):
    """W2 high-watermark: global MAX over event time
    (docs/components/ldes-consumer.md:338-343)."""
    ds = _read(sf_dir, "events", ["ts"])
    return pa.table({"max_ts": pa.array([ds.max("ts")],
                                        type=pa.timestamp("us"))})


def q_events_asof_value(sf_dir: str):
    """GENERAL as-of join (functions/asof.py — one shuffle, vectorized
    searchsorted per group; q_events_asof_click above is the bespoke
    forward-carry variant): for each purchase event, the same user's
    latest prior-or-equal click (value + timestamp), LEFT-outer so
    click-less purchases survive null-filled. Right side
    pre-aggregated to one row per (user, ts) — the operator's
    uniqueness contract. Oracle: DuckDB ASOF LEFT JOIN."""
    from ray.data.aggregate import Max

    from k_gap_ray.dsutil import drop_empty_blocks
    from k_gap_ray.functions.asof import asof_join

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])
    purch = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"),
                                    pa.scalar("purchase")))
        .drop_columns(["event_type"]), batch_format="pyarrow")
    def click_keyed(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("event_type"),
                                pa.scalar("click")))
        # single composite-key groupby (the repo's multi-key rule):
        # user and ts are both int64-representable, round-trip is exact
        key = pc.binary_join_element_wise(
            pc.cast(sel.column("user_id"), pa.string()),
            pc.cast(pc.cast(sel.column("ts"), pa.int64()), pa.string()),
            "\x1f")
        return pa.table({"k": key, "value": sel.column("value")})

    def click_unkey(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("k"), pattern="\x1f")
        flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) \
            else parts
        user = pc.cast(pc.list_element(flat, 0), pa.int64())
        ts = pc.cast(pc.cast(pc.list_element(flat, 1), pa.int64()),
                     pa.timestamp("us"))
        return pa.table({"user_id": user, "ts": ts,
                         "value": t.column("value")})

    clicks = (ev.map_batches(click_keyed, batch_format="pyarrow")
              .groupby("k").aggregate(Max(on="value", alias_name="value"))
              .map_batches(click_unkey, batch_format="pyarrow"))
    clicks = drop_empty_blocks(clicks.materialize())
    out = asof_join(purch, clicks, on="user_id", left_ts="ts",
                    right_ts="ts", right_cols=["value"], suffix="_click")
    return out.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "value": t.column("value"),
            "click_value": t.column("value_click"),
            "click_ts": t.column("ts_click")}),
        batch_format="pyarrow")


def q_events_range_join(sf_dir: str):
    """GENERAL range (interval) join (functions/rangejoin.py — interval
    replication into granularity buckets, one composite-key shuffle,
    vectorized searchsorted prefix + end-mask per group): every event
    that falls inside the 2-hour window opened by a same-user
    high-value (value > 95) event, one row per (event, window) pair.
    Window bounds returned as int64 epoch-microseconds so both
    backends compare exact integers. Oracle: DuckDB inner join with a
    BETWEEN-style ON clause."""
    from k_gap_ray.functions.rangejoin import range_join

    two_h = 2 * 3600 * 1_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def windows(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.greater(t.column("value"), pa.scalar(95.0)))
        s = pc.cast(sel.column("ts"), pa.int64())
        return pa.table({"user_id": sel.column("user_id"),
                         "win_start": s,
                         "win_end": pc.add(s, pa.scalar(two_h))})

    wins = _read(sf_dir, "events", ["user_id", "ts", "value"]) \
        .map_batches(windows, batch_format="pyarrow")
    return range_join(ev, wins, on="user_id", point_ts="ts",
                      right_cols=[], granularity_us=two_h)


# ---------------------------------------------------------------------------
# Joins (J1-J4)
# ---------------------------------------------------------------------------

def q_join_customer_nation_region(sf_dir: str):
    """J1 inner-join chain (BGP join, docs/advanced-topics.md:147-169).

    Both dimension tables are tiny -> broadcast-joined inside one
    map_batches (ray.put once, read per actor), no shuffle; the only
    shuffle is the final small groupby."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    # broadcast the dim lookup as parallel Arrow arrays: the per-batch
    # attach is then index_in + take (dictionary join), no pandas
    keys = pa.array(dim["n_nationkey"].tolist(), pa.int64())
    names = pa.array(dim["r_name"].tolist(), pa.string())
    lookup_ref = ray.put((keys, names))

    def attach(t: pa.Table) -> pa.Table:
        import ray as _r

        k, v = _r.get(lookup_ref)
        idx = pc.index_in(t.column("c_nationkey"), value_set=k)
        out = pa.table({"r_name": pc.take(v, idx)})
        return scaled_int_col(out, "acctbal_s", t.column("c_acctbal"), 100)

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    out = (ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("r_name").aggregate(
               Count(alias_name="n_customers"),
               Sum("acctbal_s", alias_name="sum_acctbal")))
    return _unscale(out, "sum_acctbal", 100)


def q_left_join_orders(sf_dir: str):
    """J2 OPTIONAL left join: every customer with its order count,
    zero-order customers included (docs/components/sembench.md:176-177)."""
    from ray.data.aggregate import Count

    from k_gap_ray.dsutil import join_datasets

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    # pre-aggregate the fact side, then left-join the (small) result;
    # join_datasets sizes num_partitions from ray.cluster_resources()
    # (a hardcoded count under-parallelizes at any other cluster size)
    # and scrubs the groupby-descended right side (zero-row
    # empty-schema blocks crash hash-join partitions, BENCH/NOTES.md)
    per_cust = orders.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"))
    joined = join_datasets(cust, per_cust, on="c_custkey",
                           right_on="o_custkey", join_type="left_outer",
                           scrub_left=False, scrub_right=True)
    return joined.map_batches(
        lambda t: pa.table({
            "c_custkey": t.column("c_custkey"),
            "n_orders": pc.fill_null(t.column("n_orders"), 0)}),
        batch_format="pyarrow")


def q_full_outer_users(sf_dir: str):
    """FULL OUTER join (the J-family shape the other queries don't
    cover): distinct event actors vs the customer key range >= 100,
    classified into both / events_only / customer_only and counted —
    all three null patterns exercised. The join is Ray's hash
    full_outer; the classification is a vectorized null mask."""
    from ray.data.aggregate import Count

    from k_gap_ray.dsutil import join_datasets

    users = (_read(sf_dir, "events", ["user_id"])
             .map_batches(lambda t: pa.table({
                 "u": pc.unique(pc.cast(t.column("user_id")
                                        .combine_chunks(), pa.int64()))}),
                 batch_format="pyarrow")
             .groupby("u").count()
             .map_batches(lambda t: pa.table({
                 "u": t.column("u"),
                 "has_u": pa.array([1] * t.num_rows, pa.int64())}),
                 batch_format="pyarrow"))
    cust = (_read(sf_dir, "customer", ["c_custkey"])
            .filter(expr="c_custkey >= 100")
            .map_batches(lambda t: pa.table({
                "c": pc.cast(t.column("c_custkey"), pa.int64()),
                "has_c": pa.array([1] * t.num_rows, pa.int64())}),
                batch_format="pyarrow"))
    # users descends from a groupby: Ray 2.49 map_batches passes
    # zero-row empty-schema groupby blocks through untouched, and a
    # hash-join partition fed only such blocks crashes — scrub the
    # groupby-descended side (BENCH/NOTES.md join rule).
    j = join_datasets(users, cust, on="u", right_on="c",
                      join_type="full_outer",
                      scrub_left=True, scrub_right=False)

    def classify(t: pa.Table) -> pa.Table:
        no_u = pc.is_null(t.column("has_u"))
        no_c = pc.is_null(t.column("has_c"))
        side = pc.if_else(no_u, "customer_only",
                          pc.if_else(no_c, "events_only", "both"))
        return pa.table({"side": side})

    return (j.map_batches(classify, batch_format="pyarrow")
            .groupby("side").aggregate(Count(alias_name="n")))


def q_anti_join(sf_dir: str):
    """J3 anti join (FILTER NOT EXISTS): customers with no high-value
    order (docs/components/jupyter.md:556-566). Bloom-pre-filtered
    exact anti join (functions/bloom.py): the bitmap is the only
    broadcast (fixed size, not O(matching keys)) and the exact check
    is a shuffle marker join — no driver-side key set, result stays a
    Dataset."""
    from k_gap_ray.functions.bloom import bloom_semi_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    hi = orders.map_batches(
        lambda t: pa.table({"o_custkey": t.filter(
            pc.greater(t.column("o_totalprice"),
                       pa.scalar(150000.0))).column("o_custkey")}),
        batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = bloom_semi_join(cust, hi, on="c_custkey", right_on="o_custkey",
                          anti=True).materialize()
    if out.count() == 0:
        # typed empty: Ray's Dataset.to_pandas drops the schema of a
        # fully-empty result, and at tiny scale factors every customer
        # has a high-value order (legitimately 0 rows)
        return pa.Table.from_pylist(
            [], schema=pa.schema([("c_custkey", pa.int64()),
                                  ("c_name", pa.string())]))
    return out


def q_semi_join(sf_dir: str):
    """J4 semi join / ASK: how many customers have >=1 order
    (docs/components/jupyter.md:596)."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    n = orders.groupby("o_custkey").count().count()
    return pa.table({"n_customers_with_orders": pa.array([n], type=pa.int64())})


def q_bloom_semi_join(sf_dir: str):
    """J4 semi join at the 100-TB shape: lineitems of URGENT orders,
    counted per returnflag. The fact side is pre-filtered by a
    broadcast Bloom filter built from the (much smaller) urgent-order
    key set — only maybe-matching rows reach the exact marker join —
    and the result is EXACTLY the plain IN-subquery semi join
    (functions/bloom.py)."""
    from k_gap_ray.functions.bloom import bloom_semi_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                    "1-URGENT")),
        batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    hit = bloom_semi_join(li, urgent, on="l_orderkey",
                          right_on="o_orderkey")
    return (hit.groupby("l_returnflag").count()
            .rename_columns({"count()": "n"}))


def q_bloom_anti_join(sf_dir: str):
    """J3 anti join, Bloom-routed: lineitems whose order is NOT
    urgent, per returnflag. Bloom misses are definite keeps emitted
    without any shuffle; only the maybe subset pays the exact anti
    join (functions/bloom.py)."""
    from k_gap_ray.functions.bloom import bloom_semi_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                    "1-URGENT")),
        batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    miss = bloom_semi_join(li, urgent, on="l_orderkey",
                           right_on="o_orderkey", anti=True)
    return (miss.groupby("l_returnflag").count()
            .rename_columns({"count()": "n"}))


# ---------------------------------------------------------------------------
# Sort / top-k / pagination (O1-O3), set ops (D2-D3)
# ---------------------------------------------------------------------------

def q_topk_orders(sf_dir: str):
    """O1/O2 ORDER BY DESC + LIMIT with deterministic tie-break."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return (ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(10))


def q_sort_limit_offset(sf_dir: str):
    """O3 LIMIT+OFFSET pagination (docs/components/jupyter.md:613-629).

    Offset is applied at the driver edge on the tiny sorted head —
    offset deep into a distributed sort is an anti-pattern at scale."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    head = (ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(20).take_all())
    return pa.Table.from_pylist(head[10:20])


def q_distinct_flags(sf_dir: str):
    """D2 DISTINCT projection (docs/components/jupyter.md:531)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return (ds.groupby(["l_returnflag", "l_linestatus"]).count()
            .select_columns(["l_returnflag", "l_linestatus"]))


def q_union_priorities(sf_dir: str):
    """D3 union of two filtered sets, then grouped count (default graph
    = union of named graphs, docs/components/ldes-consumer.md:330-336)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    hi = ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"),
                                      pa.scalar(200000.0))),
        batch_format="pyarrow")
    lo = ds.map_batches(
        lambda t: t.filter(pc.less(t.column("o_totalprice"),
                                   pa.scalar(50000.0))),
        batch_format="pyarrow")
    return (hi.union(lo).groupby("o_orderpriority").count()
            .rename_columns({"count()": "n"}))


# ---------------------------------------------------------------------------
# Dereference loop (J5) — frontier expansion over the adjacency table
# ---------------------------------------------------------------------------

def dereference(triples_ds, seeds: list[str], depth: int = 2,
                driver_cap: int = 100_000):
    """Iterative frontier expansion with cycle-safety (visited set) —
    recursive URI dereferencing, docs/advanced-topics.md:226-285.

    Two modes, switched by an EXPLICIT driver-state cap (the
    canonicalize.py pattern): while ``len(visited) + next-frontier
    distinct count <= driver_cap`` the frontier is a broadcast Arrow
    array and the hop is one streaming ``is_in`` filter (no shuffle —
    the right shape for seed expansions). The next frontier's size is
    learned from a distributed groupby-distinct COUNT *before*
    anything is pulled to the driver, so a high-fanout hub can never
    explode driver memory: crossing the cap spills permanently to
    DATASET mode, where frontier/visited stay Datasets and each round
    is a Bloom semi-join (functions/bloom.py — streaming pre-filter +
    exact marker join) with the driver holding only row counts."""
    import ray
    import ray.data as rd

    from k_gap_ray.dsutil import drop_empty_blocks
    from k_gap_ray.functions.bloom import bloom_semi_join

    def _distinct_objs(hop):
        # groupby-distinct (Dataset.unique crashes on multi-block data
        # in Ray 2.49); scrubbed — groupby output feeds a later join
        return drop_empty_blocks(
            hop.map_batches(lambda t: pa.table({"node": t.column("obj")}),
                            batch_format="pyarrow")
            .groupby("node").count().select_columns(["node"])
            .materialize())

    collected = []
    visited: set[str] = set()
    frontier = set(seeds)
    rounds_left = depth
    spill = None  # (frontier_ds, visited_ds) once driver_cap is hit
    while rounds_left > 0:
        new = frontier - visited
        if not new:
            break
        visited |= new
        ref = ray.put(pa.array(sorted(new), pa.string()))

        def expand(t: pa.Table, _ref=ref) -> pa.Table:
            import ray as _r

            fr = _r.get(_ref)
            return t.filter(pc.is_in(t.column("subj"), value_set=fr))

        hop = triples_ds.map_batches(expand,
                                     batch_format="pyarrow").materialize()
        rounds_left -= 1
        n_hop = hop.count()
        if n_hop == 0:
            break
        collected.append(hop)
        if rounds_left == 0:
            break
        if n_hop + len(visited) <= driver_cap:
            # the hop row count bounds its distinct-object count: pull
            # raw objects and dedup on the driver, no shuffle needed
            frontier = {r["obj"]
                        for r in hop.select_columns(["obj"]).take_all()}
            continue
        objs = _distinct_objs(hop)
        if objs.count() + len(visited) > driver_cap:
            spill = (objs, rd.from_arrow(pa.table(
                {"node": pa.array(sorted(visited), pa.string())})))
            break
        frontier = {r["node"] for r in objs.take_all()}

    if spill is not None:
        frontier_ds, visited_ds = spill
        while rounds_left > 0:
            # unvisited frontier nodes only (cycle guard)
            frontier_ds = drop_empty_blocks(
                bloom_semi_join(frontier_ds, visited_ds,
                                on="node", anti=True).materialize())
            if frontier_ds.count() == 0:
                break
            visited_ds = visited_ds.union(frontier_ds)
            hop = bloom_semi_join(triples_ds, frontier_ds,
                                  on="subj", right_on="node").materialize()
            rounds_left -= 1
            if hop.count() == 0:
                break
            collected.append(hop)
            if rounds_left == 0:
                break
            frontier_ds = _distinct_objs(hop)

    if not collected:
        return None
    out = collected[0]
    for h in collected[1:]:
        out = out.union(h)
    return out


def grouped_topk(ds, key: str, value: str, k: int, tiebreak: str):
    """Top-k rows per group, ordered by (value DESC, tiebreak ASC) —
    the windowed `row_number() <= k` pattern (grouped LIMIT is the
    per-feed "latest n members" idiom, docs/components/sembench.md).

    Scale shape: a per-batch PARTIAL top-k cut first (vectorized
    lexsort, no Python loop), so the groupby shuffle carries at most
    k rows per key per input block instead of the full table; the
    per-group finisher re-cuts the k survivors. Emits a ``rank``
    column (1-based) so ties are deterministic under any block order.
    """
    import numpy as np

    def partial_cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        kv = t.column(key).to_numpy(zero_copy_only=False)
        vv = t.column(value).to_numpy(zero_copy_only=False)
        tb = t.column(tiebreak).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, -vv, kv))
        ks = kv[order]
        starts = np.ones(len(ks), dtype=bool)
        starts[1:] = ks[1:] != ks[:-1]
        idx = np.arange(len(ks), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(starts, idx, 0))
        keep = (idx - run_start) < k
        return t.take(pa.array(order[keep]))

    def final_cut(t: pa.Table) -> pa.Table:
        out = partial_cut(t)
        n = min(out.num_rows, k)
        out = out.slice(0, n)
        return out.append_column("rank",
                                 pa.array(range(1, n + 1), pa.int64()))

    partial = ds.map_batches(partial_cut, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partial.groupby(key).map_groups(final_cut,
                                           batch_format="pyarrow")


def q_top_orders_per_priority(sf_dir: str):
    """Grouped top-k: the 3 highest-value orders per order priority
    (value DESC, orderkey ASC tiebreak), with ranks."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderkey", "o_totalprice"])
    return grouped_topk(ds, key="o_orderpriority", value="o_totalprice",
                        k=3, tiebreak="o_orderkey")


def grouped_median_scaled(ds, key: str, value: str, scale: int):
    """Exact per-group median over fixed-point-scaled values.

    Distributed shape: quantize to int64 in-batch, pre-aggregate to a
    (key, scaled-value) histogram — ONE count per distinct value per
    group leaves the combiner, bounded by value cardinality (after
    quantization), never by row count — then a per-group finisher
    walks its (tiny) histogram cumulatively to the exact middle.
    Even-sized groups average the two middle values (SQL median
    semantics); the result is n.0 or n.5 exactly, so doubles compare
    bit-identically with the oracle."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    def quantize(t: pa.Table) -> pa.Table:
        v = np.rint(pc.cast(t.column(value), pa.float64())
                    .to_numpy(zero_copy_only=False) * scale).astype("int64")
        return pa.table({key: t.column(key),
                         "v_s": pa.array(v, pa.int64())})

    hist = (ds.map_batches(quantize, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([key, "v_s"]).aggregate(Count(alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        # one group's histogram: rows (key, v_s, n)
        v = t.column("v_s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        lo_rank, hi_rank = (total - 1) // 2, total // 2
        lo = v[np.searchsorted(cum, lo_rank + 1)]
        hi = v[np.searchsorted(cum, hi_rank + 1)]
        med = (float(lo) + float(hi)) / 2.0 / scale
        return pa.table({key: t.column(key).slice(0, 1),
                         "median_value": pa.array([med], pa.float64()),
                         "n": pa.array([total], pa.int64())})

    return hist.groupby(key).map_groups(finish, batch_format="pyarrow")


def q_events_median_by_type(sf_dir: str):
    """Exact per-type median of event value (2-decimal fixed point):
    the histogram-combiner median, value-verified against SQL
    ``median``."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_median_scaled(ds, key="event_type", value="value",
                                 scale=100)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_hourly_pivot(sf_dir: str):
    """Pivot (wide conditional aggregation): per-hour event counts with
    one COLUMN per event type, in a single pass — per-batch indicator
    columns feed ordinary SUM aggregates, so the shuffle carries one
    partial row per (block, hour) instead of a per-type scan or a
    post-groupby reshape."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def indicators(t: pa.Table) -> pa.Table:
        h = pc.floor_temporal(t.column("ts"), unit="hour")
        cols = {"window_start": h}
        for et in EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(
                pc.equal(t.column("event_type"), pa.scalar(et)), pa.int64())
        return pa.table(cols)

    wide = ds.map_batches(indicators, batch_format="pyarrow",
                          zero_copy_batch=True)
    return wide.groupby("window_start").aggregate(
        *[Sum(f"n_{et}", alias_name=f"n_{et}") for et in EVENT_TYPES])


def q_lineitem_rollup(sf_dir: str):
    """ROLLUP (multi-level aggregate): (flag, status) counts plus
    per-flag subtotals and the grand total, NULL-padded like SQL
    ROLLUP. The subtotal levels re-aggregate the BASE AGGREGATE (a
    handful of rows) instead of rescanning the fact table — the
    cube-cell derivation that makes rollup one shuffle at any scale."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    base = (ds.groupby(["l_returnflag", "l_linestatus"]).count()
            .rename_columns({"count()": "n"}))
    rows = base.take_all()          # |flags| x |statuses| cells only
    flags: dict[str, int] = {}
    total = 0
    for r in rows:
        flags[r["l_returnflag"]] = flags.get(r["l_returnflag"], 0) + r["n"]
        total += r["n"]
    out_flag = [r["l_returnflag"] for r in rows] + list(flags) + [None]
    out_stat = [r["l_linestatus"] for r in rows] \
        + [None] * (len(flags) + 1)
    out_n = [r["n"] for r in rows] + list(flags.values()) + [total]
    return pa.table({
        "l_returnflag": pa.array(out_flag, pa.string()),
        "l_linestatus": pa.array(out_stat, pa.string()),
        "n": pa.array(out_n, pa.int64())})


def q_lineitem_cube(sf_dir: str):
    """CUBE (all grouping sets): (flag, status) counts plus per-flag
    subtotals, per-STATUS subtotals, and the grand total, NULL-padded
    like SQL CUBE. Same shape as :func:`q_lineitem_rollup` — every
    coarser cell derives from the one base aggregate (|flags| x
    |statuses| rows), so CUBE costs ONE corpus shuffle at any scale."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    base = (ds.groupby(["l_returnflag", "l_linestatus"]).count()
            .rename_columns({"count()": "n"}))
    rows = base.take_all()          # |flags| x |statuses| cells only
    flags: dict[str, int] = {}
    stats: dict[str, int] = {}
    total = 0
    for r in rows:
        flags[r["l_returnflag"]] = flags.get(r["l_returnflag"], 0) + r["n"]
        stats[r["l_linestatus"]] = stats.get(r["l_linestatus"], 0) + r["n"]
        total += r["n"]
    out_flag = ([r["l_returnflag"] for r in rows] + list(flags)
                + [None] * (len(stats) + 1))
    out_stat = ([r["l_linestatus"] for r in rows]
                + [None] * len(flags) + list(stats) + [None])
    out_n = ([r["n"] for r in rows] + list(flags.values())
             + list(stats.values()) + [total])
    return pa.table({
        "l_returnflag": pa.array(out_flag, pa.string()),
        "l_linestatus": pa.array(out_stat, pa.string()),
        "n": pa.array(out_n, pa.int64())})


def grouped_quantile_disc_scaled(ds, key: str, value: str, q: float,
                                 scale: int):
    """Exact per-group DISCRETE quantile (the value at 1-based rank
    ceil(q*n), DuckDB quantile_disc semantics — pinned empirically
    n=2..10 incl. the ceil-vs-floor divergence at n=2, q=0.9) over
    fixed-point-scaled values. Same scale shape as
    grouped_median_scaled: histogram combiner, per-group cumulative
    walk."""
    import math

    import numpy as np

    from ray.data.aggregate import Count

    def quantize(t: pa.Table) -> pa.Table:
        v = np.rint(pc.cast(t.column(value), pa.float64())
                    .to_numpy(zero_copy_only=False) * scale).astype("int64")
        return pa.table({key: t.column(key),
                         "v_s": pa.array(v, pa.int64())})

    hist = (ds.map_batches(quantize, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([key, "v_s"]).aggregate(Count(alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        v = t.column("v_s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        rank = max(1, math.ceil(q * total))
        val = v[np.searchsorted(cum, rank)] / scale
        return pa.table({key: t.column(key).slice(0, 1),
                         "q_value": pa.array([float(val)], pa.float64()),
                         "n": pa.array([total], pa.int64())})

    return hist.groupby(key).map_groups(finish, batch_format="pyarrow")


def q_events_p90_by_type(sf_dir: str):
    """Per-type p90 of event value (2-decimal fixed point), exact
    discrete quantile — oracle: quantile_disc(0.9)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantile_disc_scaled(ds, key="event_type",
                                        value="value", q=0.9, scale=100)


def q_priority_intersect(sf_dir: str):
    """INTERSECT: order priorities present among BOTH high-value
    (>200k) and low-value (<50k) orders — two pruned distinct sets,
    combined with a distinct inner join (no row explosion: both sides
    deduped before the join)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def side(pred):
        return (ds.map_batches(
            lambda t, p=pred: t.filter(p(t)).select(["o_orderpriority"]),
            batch_format="pyarrow")
            .groupby("o_orderpriority").count()
            .select_columns(["o_orderpriority"]))

    hi = side(lambda t: pc.greater(t.column("o_totalprice"),
                                   pa.scalar(200000.0)))
    lo = side(lambda t: pc.less(t.column("o_totalprice"),
                                pa.scalar(50000.0)))
    from k_gap_ray.dsutil import join_datasets

    return join_datasets(hi, lo.rename_columns(
        {"o_orderpriority": "p2"}), on="o_orderpriority",
        right_on="p2").select_columns(["o_orderpriority"])


def q_priority_except(sf_dir: str):
    """EXCEPT: priorities of high-value orders never seen below 50k —
    distinct left side minus a broadcast right key set (the anti-join
    set-difference; right side is tiny after dedup)."""
    import ray

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    hi = (ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"),
                                      pa.scalar(200000.0)))
        .select(["o_orderpriority"]),
        batch_format="pyarrow")
        .groupby("o_orderpriority").count()
        .select_columns(["o_orderpriority"]))
    lo_keys = (ds.map_batches(
        lambda t: t.filter(pc.less(t.column("o_totalprice"),
                                   pa.scalar(50000.0)))
        .select(["o_orderpriority"]),
        batch_format="pyarrow")
        .groupby("o_orderpriority").count().take_all())
    ref = ray.put(pa.array(sorted(r["o_orderpriority"] for r in lo_keys),
                           pa.string()))

    def anti(t: pa.Table) -> pa.Table:
        import ray as _r

        return t.filter(pc.invert(pc.is_in(t.column("o_orderpriority"),
                                           value_set=_r.get(ref))))

    out = hi.map_batches(anti, batch_format="pyarrow")
    return pa.Table.from_pylist(
        out.take_all(),
        schema=pa.schema([("o_orderpriority", pa.string())]))


def q_events_value_delta(sf_dir: str):
    """Window lag: each event's value change vs the user's previous
    event (ts, event_id order), first-per-user dropped. Fixed-point
    int deltas so the subtraction is exact on both engines; per-key
    ordered compute via groupby(user).map_groups with an in-group
    vectorized diff (same shape as the running-sum query)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def scale(t: pa.Table) -> pa.Table:
        v = np.rint(pc.cast(t.column("value"), pa.float64())
                    .to_numpy(zero_copy_only=False) * 100).astype("int64")
        return pa.table({"user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "event_id": t.column("event_id"),
                         "v_s": pa.array(v, pa.int64())})

    def diffs(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("v_s").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        v_o, eid_o = v[order], eid[order]
        return pa.table({
            "event_id": pa.array(eid_o[1:], pa.int64()),
            "delta_s": pa.array(v_o[1:] - v_o[:-1], pa.int64())})

    scaled = ds.map_batches(scale, batch_format="pyarrow",
                            zero_copy_batch=True)
    return scaled.groupby("user_id").map_groups(diffs,
                                                batch_format="pyarrow")


def q_events_user_list(sf_dir: str):
    """A-family grouped collect: per event type, the lexicographically
    sorted comma-joined DISTINCT user-id list plus its size. The
    collect uses the shuffle-safe Unique aggregate (dsutil.SafeUnique);
    the join-to-string runs in a result-set-scale finish map (one row
    per event type). Oracle = string_agg(DISTINCT ... ORDER BY ...) —
    the reference's "which entities appear per class" notebook idiom
    (docs/components/jupyter.md:530-549) with the list made explicit."""
    from k_gap_ray.dsutil import SafeUnique

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    agg = ds.groupby("event_type").aggregate(
        SafeUnique("user_id", alias_name="users"))

    def finish(t: pa.Table) -> pa.Table:
        users, counts = [], []
        for row in t.column("users").to_pylist():
            vals = sorted(str(u) for u in row)
            users.append(",".join(vals))
            counts.append(len(vals))
        return pa.table({
            "event_type": t.column("event_type"),
            "users": pa.array(users, pa.string()),
            "n_users": pa.array(counts, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_lineitem_melt(sf_dir: str):
    """UNPIVOT/melt: three per-row measures folded into (measure,
    value) rows inside one zero-shuffle map_batches, then an exact
    fixed-point SUM per measure — the wide-to-long reshape that pairs
    with q_events_hourly_pivot's long-to-wide. Oracle = UNION ALL of
    three scaled sums."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount"])

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for name, col, scale in (("qty", "l_quantity", 100),
                                 ("price", "l_extendedprice", 100),
                                 ("disc", "l_discount", 10000)):
            p = pa.table({"measure": pa.array([name] * t.num_rows,
                                              pa.string())})
            parts.append(scaled_int_col(p, "v", t.column(col), scale))
        return pa.concat_tables(parts)

    out = (ds.map_batches(melt, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("measure").aggregate(Sum("v", alias_name="total")))
    return out.map_batches(lambda t: t.select(["measure", "total"]),
                           batch_format="pyarrow")


def q_events_mode_user(sf_dir: str):
    """Grouped MODE (argmax-by-count): the dominant user per event
    type, smallest user id on ties. Counting goes through ONE
    composite-key groupby (type\\x1fuser -> count; multi-key groupby
    aggregates are a measured regression, BENCH/NOTES.md), then the
    windowed row_number()=1 cut reuses grouped_topk's partial-cut
    combiner with k=1."""
    _S = "\x1f"
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    keyed = ds.map_batches(
        lambda t: pa.table({"__k": pc.binary_join_element_wise(
            t.column("event_type"),
            pc.cast(t.column("user_id"), pa.string()), _S)}),
        batch_format="pyarrow")

    def unkey(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("__k").combine_chunks(), _S)
        return pa.table({
            "event_type": pc.list_element(parts, 0),
            "user_id": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "n": pc.cast(t.column("count()"), pa.int64())})

    counts = (keyed.groupby("__k").count()
              .map_batches(unkey, batch_format="pyarrow"))
    top = grouped_topk(counts, "event_type", "n", 1, "user_id")
    return top.map_batches(
        lambda t: t.select(["event_type", "user_id", "n"]),
        batch_format="pyarrow")


def q_orders_priority_share(sf_dir: str):
    """Percent-of-total window (count per priority over the grand
    total) in exact integer basis points — the `count(*) /
    sum(count(*)) OVER ()` reporting idiom without float division
    ambiguity: share_bp = n * 10000 // total on both backends."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderpriority"])
    per = ds.groupby("o_orderpriority").aggregate(Count(alias_name="n"))

    # the grouped result is priority-cardinality-sized (5 rows): one
    # driver-side total, then a vectorized finish map
    import numpy as np

    rows = per.take_all()
    total = sum(r["n"] for r in rows)

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype("int64")
        bp = n * 10_000 // max(total, 1)
        return pa.table({"o_orderpriority": t.column("o_orderpriority"),
                         "n": pa.array(n, pa.int64()),
                         "share_bp": pa.array(bp, pa.int64())})

    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(
        rows, schema=pa.schema([("o_orderpriority", pa.string()),
                                ("n", pa.int64())]))).map_batches(
        finish, batch_format="pyarrow")


def q_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                        cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H Q3-shaped 3-table composite (the multi-join + group +
    top-k shape the single-purpose join queries don't chain): orders
    of one customer segment placed BEFORE ``cutoff``, revenue from
    their lineitems shipped AFTER it, top-``k`` orders by revenue.

    Scale shape: the customer segment filter broadcasts its custkey
    set (ray.put once, is_in per batch — customers are the small dim);
    the lineitem fact side is date-filtered AND pre-aggregated to one
    revenue row per orderkey BEFORE the hash join with filtered orders
    (the combine-then-join rule) — the join moves O(qualifying
    orders), never O(lineitems).  Revenue is the house fixed-point
    cents-of-basis-points int64 (exact, order-independent), and the
    top-k order (revenue_s DESC, o_orderdate, l_orderkey) is total, so
    the SQL mirror's cutoff is unambiguous."""
    import ray
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import join_datasets

    cut = pa.compute.strptime(cutoff, format="%Y-%m-%d", unit="us")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(
            lambda t: pa.table({"c_custkey": pc.cast(
                t.column("c_custkey").filter(
                    pc.equal(t.column("c_mktsegment"), segment)),
                pa.int64())}),
            batch_format="pyarrow")
    ckeys = [r["c_custkey"] for r in cust.take_all()]
    ckeys_ref = ray.put(pa.array(sorted(ckeys), pa.int64()))

    def orders_scan(t: pa.Table) -> pa.Table:
        import ray as _r

        keep = pc.and_(
            pc.less(t.column("o_orderdate"), pa.scalar(cut)),
            pc.is_in(pc.cast(t.column("o_custkey"), pa.int64()),
                     value_set=_r.get(ckeys_ref)))
        t = t.filter(keep)
        return pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderpriority": t.column("o_orderpriority")})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"]) \
        .map_batches(orders_scan, batch_format="pyarrow")

    def line_scan(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(cut)))
        out = pa.table({"l_orderkey": pc.cast(t.column("l_orderkey"),
                                              pa.int64())})
        return scaled_int_col(
            out, "revenue_s",
            pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    t.column("l_discount"))),
            10_000)

    rev = (_read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount",
                  "l_shipdate"])
           .map_batches(line_scan, batch_format="pyarrow")
           .groupby("l_orderkey")
           .aggregate(Sum("revenue_s", alias_name="revenue_s")))
    from k_gap_ray.dsutil import drop_empty_blocks

    # Ray 2.49 hash join crashes outright on a fully-empty side
    # (BENCH/NOTES.md): decide emptiness on materialized inputs first —
    # degenerate params (cutoff past the date range, unmatched segment)
    # must yield an empty result, not a crash.
    rev = drop_empty_blocks(rev.materialize())
    orders = orders.materialize()
    if rev.count() == 0 or orders.count() == 0:
        rows = []
    else:
        joined = join_datasets(rev, orders, on="l_orderkey",
                               right_on="o_orderkey",
                               num_partitions=max(
                                   2, min(32, rev.count() // 20_000 + 2)),
                               scrub_left=False, scrub_right=False)
        # the join output feeds a SORT shuffle: scrub the empty-schema
        # blocks empty hash partitions can emit (BENCH/NOTES.md)
        joined = drop_empty_blocks(joined.materialize())
        top = (joined.sort(["revenue_s", "o_orderdate", "l_orderkey"],
                           descending=[True, False, False]).limit(k))
        rows = top.take_all()
    if not rows:
        return pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_orderpriority": pa.array([], pa.string())})
    return pa.table({
        "l_orderkey": pa.array([r["l_orderkey"] for r in rows],
                               pa.int64()),
        "revenue": pa.array([r["revenue_s"] / 10_000.0 for r in rows],
                            pa.float64()),
        "o_orderdate": pa.array([r["o_orderdate"] for r in rows]),
        "o_orderpriority": pa.array([r["o_orderpriority"] for r in rows],
                                    pa.string())})


def q_local_supplier_volume(sf_dir: str, region: str = "EUROPE",
                            date_lo: str = "1996-01-01",
                            date_hi: str = "1998-01-01"):
    """TPC-H Q5-shaped 6-table composite — revenue by nation where the
    supplier and the ordering customer share the nation, within one
    region and order-date window.  The only use of the SUPPLIER table
    in the catalog, and the deepest dim chain (region→nation→customer
    + supplier) the relational family exercises.

    Scale shape: ONE hash join total (lineitem revenue rows ⋈
    date-filtered orders, keyed on orderkey).  Everything else is a
    broadcast attach: region→nation names, custkey→nationkey and
    suppkey→nationkey lookups are dimension-sized (10^2..10^7 rows at
    any SF — orders/lineitem dwarf them by 3-4 orders of magnitude),
    shipped once via ray.put and applied per batch as index_in+take
    dictionary joins.  The same-nation condition filters AFTER the
    join, vectorized; revenue is the house fixed-point int64; output
    order (revenue_s DESC, n_name) is total."""
    import ray
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    lo = pa.compute.strptime(date_lo, format="%Y-%m-%d", unit="us")
    hi = pa.compute.strptime(date_hi, format="%Y-%m-%d", unit="us")
    nation = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    nat = nation.merge(reg, left_on="n_regionkey",
                       right_on="r_regionkey")
    nat = nat[nat["r_name"] == region]
    nkeys = pa.array(nat["n_nationkey"].tolist(), pa.int64())
    nnames = pa.array(nat["n_name"].tolist(), pa.string())
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nat["n_nationkey"])]
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    lookup_ref = ray.put((
        nkeys, nnames,
        pa.array(cust["c_custkey"].tolist(), pa.int64()),
        pa.array(cust["c_nationkey"].tolist(), pa.int64()),
        pa.array(supp["s_suppkey"].tolist(), pa.int64()),
        pa.array(supp["s_nationkey"].tolist(), pa.int64())))

    def orders_scan(t: pa.Table) -> pa.Table:
        import ray as _r

        _, _, ck, cn, _, _ = _r.get(lookup_ref)
        t = t.filter(pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
            pc.less(t.column("o_orderdate"), pa.scalar(hi))))
        idx = pc.index_in(pc.cast(t.column("o_custkey"), pa.int64()),
                          value_set=ck)
        out = pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "c_nationkey": pc.take(cn, idx)})
        return out.filter(pc.is_valid(out.column("c_nationkey")))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_scan, batch_format="pyarrow")

    def line_scan(t: pa.Table) -> pa.Table:
        import ray as _r

        _, _, _, _, sk, sn = _r.get(lookup_ref)
        idx = pc.index_in(pc.cast(t.column("l_suppkey"), pa.int64()),
                          value_set=sk)
        out = pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "s_nationkey": pc.take(sn, idx)})
        out = scaled_int_col(
            out, "revenue_s",
            pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    t.column("l_discount"))),
            10_000)
        return out.filter(pc.is_valid(out.column("s_nationkey")))

    rev = _read(sf_dir, "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(line_scan, batch_format="pyarrow")
    # Empty-side guard (BENCH/NOTES.md): Ray 2.49's hash join crashes
    # when one side is fully empty — degenerate params (region with no
    # suppliers, window past the date range) must return zero rows.
    rev = rev.materialize()
    orders = orders.materialize()
    if rev.count() == 0 or orders.count() == 0:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64())})
    joined = join_datasets(rev, orders, on="l_orderkey",
                           right_on="o_orderkey",
                           scrub_left=False, scrub_right=False)

    def same_nation(t: pa.Table) -> pa.Table:
        import ray as _r

        nk, nn, _, _, _, _ = _r.get(lookup_ref)
        t = t.filter(pc.equal(t.column("s_nationkey"),
                              t.column("c_nationkey")))
        idx = pc.index_in(t.column("c_nationkey"), value_set=nk)
        return pa.table({"n_name": pc.take(nn, idx),
                         "revenue_s": t.column("revenue_s")})

    out = (joined.map_batches(same_nation, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("revenue_s", alias_name="revenue_s")))
    out = drop_empty_blocks(out.materialize())
    rows = sorted(out.take_all(),
                  key=lambda r: (-r["revenue_s"], r["n_name"]))
    return pa.table({
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "revenue": pa.array([r["revenue_s"] / 10_000.0 for r in rows],
                            pa.float64())})
