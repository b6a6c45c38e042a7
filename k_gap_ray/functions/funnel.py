"""Ordered-funnel and retention/cohort analytics over an event stream.

The two classic event-analytics reductions a web-scale corpus needs
next to sessionization (functions/windows.py):

- **Funnel**: how many users performed step_1 < step_2 < ... < step_k
  in timestamp order (unlimited conversion window).  Greedy earliest
  completion is exact for this contract: taking the MINIMUM qualifying
  timestamp at each step can only enlarge the set of events eligible
  for later steps, so a user completes the funnel iff the greedy chain
  does.  That turns a per-user sequence scan into k passes of
  `filter -> per-batch partial min -> groupby(user).min` — no per-user
  map_groups, no skew exposure (a hot user costs one row per step
  after the partial min).
- **Retention cohorts**: users grouped by the epoch-day of their first
  event (cohort), counted per day-offset of later activity.  Two
  aggregates plus one small-side lookup; distinct (user, day) activity
  is reduced with a composite int key so no multi-key groupby is ever
  shuffled (CLAUDE.md perf rule).

100-TB shape: the per-user "reached step k" relation is bounded by
DISTINCT USERS, not events.  Below ``broadcast_cap`` rows it rides a
ray.put'd sorted-array lookup inside map_batches (one object-store
copy per node); above the cap both operators switch to a distributed
hash join (dsutil.join_datasets with the groupby-side scrub the Ray
2.49 empty-block edge requires, BENCH/NOTES.md).

Timestamps are compared as int64 microseconds (Arrow timestamp[us]
cast) and days as ``us // 86_400_000_000`` — the exact DuckDB mirror
is ``epoch_us(ts)`` and integer ``//``, so oracles are value-exact
with no float rounding anywhere.

Reference analogue: kgap's monitoring notebooks derive per-feed
progress funnels over harvested LDES event streams (kgap_tools.py
query helpers); here the same reductions are first-class distributed
operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US_PER_DAY = 86_400_000_000
_DAY_BITS = 20  # composite (user, day) key: day < 2**20 (~2870 years)


def _ts_us(col) -> pa.Array:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.cast(a, pa.int64())


def _per_user_min(ds, user_col: str):
    """groupby(user).min over a (user_col, ts_us) stream; per-batch
    Arrow hash-agg partial first so the shuffle carries at most
    |distinct users per batch| rows."""
    from ray.data.aggregate import Min

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({user_col: t.column(user_col),
                       "ts_us": t.column("ts_us")})
             .group_by([user_col]).aggregate([("ts_us", "min")]))
        return pa.table({user_col: g.column(user_col),
                         "ts_us": g.column("ts_us_min")})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(user_col)
            .aggregate(Min("ts_us", alias_name="ts_us")))


def funnel_counts(events_ds, steps: list[str], user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  broadcast_cap: int = 2_000_000) -> pa.Table:
    """Ordered funnel: users completing steps[0] < steps[1] < ... in
    strict timestamp order.  -> pa.Table (step, event_type, users),
    one row per step, step 1-based.

    Pass k filters events to ``steps[k]`` and to ``ts > reached[k-1]``
    per user, then reduces to a per-user min — k linear passes over
    the event stream, each reduced batch-locally before the (small)
    user-keyed shuffle.
    """
    import ray

    from .. import dsutil

    if not steps:
        raise ValueError("funnel needs at least one step")

    counts: list[int] = []
    prev = None  # Dataset[(user_col, ts_us)] of users who reached k-1
    prev_count = -1
    for k, step_type in enumerate(steps):
        if k > 0 and prev_count == 0:
            counts.append(0)
            continue
        if k == 0:
            def base(t: pa.Table, _st=step_type) -> pa.Table:
                m = pc.equal(t.column(type_col), pa.scalar(_st))
                t = t.filter(m)
                return pa.table({user_col: t.column(user_col),
                                 "ts_us": _ts_us(t.column(ts_col))})

            stream = events_ds.map_batches(base, batch_format="pyarrow",
                                           zero_copy_batch=True)
            reached = _per_user_min(stream, user_col)
        elif prev_count <= broadcast_cap:
            tbl = pa.Table.from_pylist(
                prev.take_all(),
                schema=pa.schema([(user_col, pa.int64()),
                                  ("ts_us", pa.int64())]))
            order = pc.sort_indices(tbl.column(user_col))
            users_np = tbl.column(user_col).take(order) \
                .to_numpy(zero_copy_only=False)
            ts_np = tbl.column("ts_us").take(order) \
                .to_numpy(zero_copy_only=False)
            ref = ray.put((users_np, ts_np))

            def gated(t: pa.Table, _st=step_type, _ref=ref) -> pa.Table:
                import ray as _r

                u_sorted, t_prev = _r.get(_ref)
                m = pc.equal(t.column(type_col), pa.scalar(_st))
                t = t.filter(m)
                u = t.column(user_col).to_numpy(zero_copy_only=False)
                ts = _ts_us(t.column(ts_col)).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(u_sorted, u)
                pos_c = np.clip(pos, 0, max(len(u_sorted) - 1, 0))
                hit = (len(u_sorted) > 0) & (u_sorted[pos_c] == u)
                keep = hit & (ts > t_prev[pos_c])
                return pa.table({user_col: pa.array(u[keep], pa.int64()),
                                 "ts_us": pa.array(ts[keep], pa.int64())})

            stream = events_ds.map_batches(gated, batch_format="pyarrow",
                                           zero_copy_batch=True)
            reached = _per_user_min(stream, user_col)
        else:
            def typed(t: pa.Table, _st=step_type) -> pa.Table:
                m = pc.equal(t.column(type_col), pa.scalar(_st))
                t = t.filter(m)
                return pa.table({user_col: t.column(user_col),
                                 "ts_us": _ts_us(t.column(ts_col))})

            stream = events_ds.map_batches(typed, batch_format="pyarrow",
                                           zero_copy_batch=True)
            prev_r = prev.map_batches(
                lambda t: t.rename_columns([user_col, "prev_us"]),
                batch_format="pyarrow")
            # prev descends from a groupby: scrub_right required
            joined = dsutil.join_datasets(stream, prev_r, on=user_col,
                                          scrub_left=False,
                                          scrub_right=True)

            def after(t: pa.Table) -> pa.Table:
                t = t.filter(pc.greater(t.column("ts_us"),
                                        t.column("prev_us")))
                return t.select([user_col, "ts_us"])

            reached = _per_user_min(
                joined.map_batches(after, batch_format="pyarrow"),
                user_col)
        reached = reached.materialize()
        prev, prev_count = reached, reached.count()
        counts.append(prev_count)

    return pa.table({
        "step": pa.array(range(1, len(steps) + 1), pa.int64()),
        "event_type": pa.array(list(steps), pa.string()),
        "users": pa.array(counts, pa.int64())})


def retention_cohorts(events_ds, user_col: str = "user_id",
                      ts_col: str = "ts",
                      broadcast_cap: int = 2_000_000):
    """Cohort retention: (cohort_day, day_offset, users) where
    cohort_day is the epoch-day of a user's first event and users
    counts DISTINCT users of that cohort active day_offset days later
    (offset 0 = the cohort day itself).

    -> Dataset sorted by (cohort_day, day_offset).
    """
    import ray

    from .. import dsutil
    from ray.data.aggregate import Sum

    def to_days(t: pa.Table) -> pa.Table:
        us = _ts_us(t.column(ts_col))
        day = pc.divide(us, pa.scalar(_US_PER_DAY, pa.int64()))
        u = t.column(user_col).combine_chunks() \
            if isinstance(t.column(user_col), pa.ChunkedArray) \
            else t.column(user_col)
        u_np = u.to_numpy(zero_copy_only=False)
        d_np = day.to_numpy(zero_copy_only=False)
        if len(u_np) and (u_np.min() < 0 or u_np.max() >= 1 << 42
                          or d_np.min() < 0 or d_np.max() >= 1 << _DAY_BITS):
            raise ValueError("user/day outside composite-key range")
        ckey = np.unique((u_np << _DAY_BITS) | d_np)
        return pa.table({"ckey": pa.array(ckey, pa.int64())})

    # distinct (user, day) via composite-key groupby (single-key rule)
    act = (events_ds.map_batches(to_days, batch_format="pyarrow",
                                 zero_copy_batch=True)
           .groupby("ckey").count())

    def day_stream(t: pa.Table) -> pa.Table:
        us = _ts_us(t.column(ts_col))
        return pa.table({
            user_col: t.column(user_col),
            "ts_us": pc.divide(us, pa.scalar(_US_PER_DAY, pa.int64()))})

    first = _per_user_min(
        events_ds.map_batches(day_stream, batch_format="pyarrow",
                              zero_copy_batch=True),
        user_col).materialize()
    n_users = first.count()
    if n_users == 0:
        empty = pa.table({"cohort_day": pa.array([], pa.int64()),
                          "day_offset": pa.array([], pa.int64()),
                          "users": pa.array([], pa.int64())})
        import ray.data as rd
        return rd.from_arrow(empty)

    if n_users <= broadcast_cap:
        tbl = pa.Table.from_pylist(
            first.take_all(),
            schema=pa.schema([(user_col, pa.int64()),
                              ("ts_us", pa.int64())]))
        order = pc.sort_indices(tbl.column(user_col))
        users_np = tbl.column(user_col).take(order) \
            .to_numpy(zero_copy_only=False)
        cohort_np = tbl.column("ts_us").take(order) \
            .to_numpy(zero_copy_only=False)
        ref = ray.put((users_np, cohort_np))

        def to_cell(t: pa.Table, _ref=ref) -> pa.Table:
            import ray as _r

            u_sorted, cohort = _r.get(_ref)
            ck = t.column("ckey").to_numpy(zero_copy_only=False)
            u = ck >> _DAY_BITS
            d = ck & ((1 << _DAY_BITS) - 1)
            pos = np.searchsorted(u_sorted, u)  # always found
            coh = cohort[pos]
            cell = (coh << _DAY_BITS) | (d - coh)
            cells, n = np.unique(cell, return_counts=True)
            return pa.table({"cell": pa.array(cells, pa.int64()),
                             "n_p": pa.array(n, pa.int64())})

        cells = act.map_batches(to_cell, batch_format="pyarrow")
    else:
        def decomp(t: pa.Table) -> pa.Table:
            ck = t.column("ckey").to_numpy(zero_copy_only=False)
            return pa.table({
                user_col: pa.array(ck >> _DAY_BITS, pa.int64()),
                "d": pa.array(ck & ((1 << _DAY_BITS) - 1), pa.int64())})

        pairs = act.map_batches(decomp, batch_format="pyarrow")
        first_r = first.map_batches(
            lambda t: t.rename_columns([user_col, "cohort"]),
            batch_format="pyarrow")
        joined = dsutil.join_datasets(pairs, first_r, on=user_col,
                                      scrub_left=True, scrub_right=True)

        def to_cell_j(t: pa.Table) -> pa.Table:
            d = t.column("d").to_numpy(zero_copy_only=False)
            coh = t.column("cohort").to_numpy(zero_copy_only=False)
            cell = (coh << _DAY_BITS) | (d - coh)
            cells, n = np.unique(cell, return_counts=True)
            return pa.table({"cell": pa.array(cells, pa.int64()),
                             "n_p": pa.array(n, pa.int64())})

        cells = joined.map_batches(to_cell_j, batch_format="pyarrow")

    agg = cells.groupby("cell").aggregate(Sum("n_p", alias_name="users"))

    def decode(t: pa.Table) -> pa.Table:
        c = t.column("cell").to_numpy(zero_copy_only=False)
        return pa.table({
            "cohort_day": pa.array(c >> _DAY_BITS, pa.int64()),
            "day_offset": pa.array(c & ((1 << _DAY_BITS) - 1), pa.int64()),
            "users": pc.cast(t.column("users"), pa.int64())})

    return (agg.map_batches(decode, batch_format="pyarrow")
            .sort(["cohort_day", "day_offset"]))


def sql_funnel(steps: list[str], rel: str = "events") -> str:
    """DuckDB mirror of :func:`funnel_counts` — the same greedy
    earliest-completion chain as correlated min-CTEs."""
    ctes = []
    for i, st in enumerate(steps):
        name, s = f"s{i + 1}", st.replace("'", "''")
        if i == 0:
            ctes.append(
                f"{name} AS (SELECT user_id, min(epoch_us(ts)) AS t "
                f"FROM {rel} WHERE event_type = '{s}' GROUP BY 1)")
        else:
            prev = f"s{i}"
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t "
                f"FROM {rel} e JOIN {prev} p USING (user_id) "
                f"WHERE e.event_type = '{s}' AND epoch_us(e.ts) > p.t "
                f"GROUP BY 1)")
    arms = [
        f"SELECT CAST({i + 1} AS BIGINT) AS step, "
        f"'{st.replace(chr(39), chr(39) * 2)}' AS event_type, "
        f"count(*)::BIGINT AS users FROM s{i + 1}"
        for i, st in enumerate(steps)]
    return ("WITH " + ",\n".join(ctes) + "\nSELECT * FROM ("
            + " UNION ALL ".join(arms) + ") ORDER BY step")


def sql_retention(rel: str = "events") -> str:
    """DuckDB mirror of :func:`retention_cohorts` (epoch_us // day)."""
    return f"""
        WITH f AS (SELECT user_id,
                          min(epoch_us(ts) // {_US_PER_DAY}) AS cohort_day
                   FROM {rel} GROUP BY 1),
             a AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // {_US_PER_DAY} AS d
                   FROM {rel})
        SELECT f.cohort_day,
               a.d - f.cohort_day AS day_offset,
               count(*)::BIGINT AS users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


def rolling_active_users(events_ds, window_days: int = 7,
                         user_col: str = "user_id", ts_col: str = "ts"):
    """Rolling-window active users (the DAU/WAU/MAU family): for each
    epoch-day ``e`` in the corpus range, the count of DISTINCT users
    active in ``[e - window_days + 1, e]``.

    Shape: distinct (user, day) pairs ride ONE composite int key
    (no multi-key groupby), each pair then fans out to the at most
    ``window_days`` window end-days it contributes to (clipped to the
    corpus max day), a second composite-key groupby dedupes
    (user, end-day) — a user active twice inside one window counts
    once — and a per-batch partial + tiny groupby counts users per
    end-day.  All exchanges are bounded by users x days x window, the
    payload never moves.  -> Dataset (day, wau) sorted by day.
    """
    from ray.data.aggregate import Sum

    def to_pairs(t: pa.Table) -> pa.Table:
        us = _ts_us(t.column(ts_col))
        day = pc.divide(us, pa.scalar(_US_PER_DAY, pa.int64()))
        u = t.column(user_col).combine_chunks() \
            if isinstance(t.column(user_col), pa.ChunkedArray) \
            else t.column(user_col)
        u_np = u.to_numpy(zero_copy_only=False)
        d_np = day.to_numpy(zero_copy_only=False)
        if len(u_np) and (u_np.min() < 0 or u_np.max() >= 1 << 42
                          or d_np.min() < 0 or d_np.max() >= 1 << _DAY_BITS):
            raise ValueError("user/day outside composite-key range")
        ckey = np.unique((u_np << _DAY_BITS) | d_np)
        return pa.table({"ckey": pa.array(ckey, pa.int64())})

    act = (events_ds.map_batches(to_pairs, batch_format="pyarrow",
                                 zero_copy_batch=True)
           .groupby("ckey").count().materialize())

    # corpus max day: O(blocks) driver merge of per-batch partials
    parts = act.map_batches(
        lambda t: pa.table({"m": pa.array(
            [int(pc.max(pc.bit_wise_and(
                t.column("ckey"),
                pa.scalar((1 << _DAY_BITS) - 1, pa.int64()))).as_py())]
            if t.num_rows else [], pa.int64())}),
        batch_format="pyarrow").take_all()
    if not parts:
        import ray.data as rd
        return rd.from_arrow(pa.table({"day": pa.array([], pa.int64()),
                                       "wau": pa.array([], pa.int64())}))
    max_day = max(r["m"] for r in parts)

    def fan_out(t: pa.Table) -> pa.Table:
        ck = t.column("ckey").to_numpy(zero_copy_only=False)
        u = ck >> _DAY_BITS
        d = ck & ((1 << _DAY_BITS) - 1)
        offs = np.arange(window_days, dtype=np.int64)
        e = (d[:, None] + offs[None, :]).ravel()
        ue = np.repeat(u, window_days)
        keep = e <= max_day
        ck2 = np.unique((ue[keep] << _DAY_BITS) | e[keep])
        return pa.table({"ckey2": pa.array(ck2, pa.int64())})

    win = (act.map_batches(fan_out, batch_format="pyarrow")
           .groupby("ckey2").count())

    def per_day(t: pa.Table) -> pa.Table:
        ck = t.column("ckey2").to_numpy(zero_copy_only=False)
        days, n = np.unique(ck & ((1 << _DAY_BITS) - 1),
                            return_counts=True)
        return pa.table({"day": pa.array(days, pa.int64()),
                         "n_p": pa.array(n, pa.int64())})

    agg = (win.map_batches(per_day, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("n_p", alias_name="wau")))
    return (agg.map_batches(
        lambda t: pa.table({"day": t.column("day"),
                            "wau": pc.cast(t.column("wau"), pa.int64())}),
        batch_format="pyarrow").sort("day"))


def sql_rolling_active_users(window_days: int = 7,
                             rel: str = "events") -> str:
    """DuckDB mirror of :func:`rolling_active_users`."""
    return f"""
        WITH act AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // {_US_PER_DAY} AS d
                     FROM {rel})
        SELECT e AS day, count(DISTINCT user_id)::BIGINT AS wau
        FROM (SELECT user_id, d + o AS e
              FROM act CROSS JOIN
                   (SELECT unnest(generate_series(0, {window_days - 1}))
                        AS o))
        WHERE e <= (SELECT max(d) FROM act)
        GROUP BY e ORDER BY e
    """


def burst_scores(events_ds, type_col: str = "event_type",
                 ts_col: str = "ts", window_days: int = 7,
                 driver_cap: int = 2_000_000):
    """Burst detection: per (type, day) the event count against the
    trailing ``window_days`` baseline, as the exact integer ratio
    ``burst_permille = n * 1000 * window_days // baseline`` (baseline
    = summed counts over the previous ``window_days`` calendar days,
    absent days counting 0; days with an empty baseline are omitted —
    there is nothing to compare against).  The day a type's volume
    spikes, the ratio leaves 1000.

    Shape: per-batch Arrow hash-agg (type, day) partials merged
    DIRECTLY on the driver over <= batches x |types| x |days| slim
    rows (guarded by ``driver_cap``, a loud refusal, not truncation)
    — the result lands on the driver anyway, so a Ray groupby would
    only add its multi-second fixed aggregate cost
    (the ngram_prefix_bands pattern, BENCH/NOTES.md round-3).
    -> pa.Table (event_type, day, n, baseline, burst_permille) sorted.
    """

    def partial(t: pa.Table) -> pa.Table:
        us = _ts_us(t.column(ts_col))
        day = pc.divide(us, pa.scalar(_US_PER_DAY, pa.int64()))
        g = (pa.table({"ty": pc.cast(t.column(type_col), pa.string()),
                       "d": day})
             .group_by(["ty", "d"]).aggregate([([], "count_all")]))
        return pa.table({"ty": g.column("ty"),
                         "d": pc.cast(g.column("d"), pa.int64()),
                         "n_p": pc.cast(g.column("count_all"),
                                        pa.int64())})

    rows = events_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    if len(rows) > driver_cap:
        raise ValueError(f"{len(rows)} (type, day) partial rows exceed "
                         f"driver_cap={driver_cap}")
    per: dict[str, dict[int, int]] = {}
    for r in rows:
        days = per.setdefault(r["ty"], {})
        days[int(r["d"])] = days.get(int(r["d"]), 0) + int(r["n_p"])
    out = []
    for ty in sorted(per):
        days = per[ty]
        for d in sorted(days):
            baseline = sum(days.get(p, 0)
                           for p in range(d - window_days, d))
            if baseline > 0:
                out.append((ty, d, days[d], baseline,
                            days[d] * 1000 * window_days // baseline))
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "day": pa.array([r[1] for r in out], pa.int64()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "baseline": pa.array([r[3] for r in out], pa.int64()),
        "burst_permille": pa.array([r[4] for r in out], pa.int64())})


def sql_burst_scores(window_days: int = 7, rel: str = "events") -> str:
    """DuckDB mirror of :func:`burst_scores` (RANGE window frame over
    the integer day key reproduces the trailing calendar baseline)."""
    return f"""
        WITH c AS (SELECT event_type,
                          epoch_us(ts) // {_US_PER_DAY} AS day,
                          count(*)::BIGINT AS n
                   FROM {rel} GROUP BY 1, 2),
             b AS (SELECT event_type, day, n,
                          CAST(coalesce(sum(n) OVER (
                              PARTITION BY event_type ORDER BY day
                              RANGE BETWEEN {window_days} PRECEDING
                                        AND 1 PRECEDING), 0) AS BIGINT)
                              AS baseline
                   FROM c)
        SELECT event_type, day, n, baseline,
               n * 1000 * {window_days} // baseline AS burst_permille
        FROM b WHERE baseline > 0
        ORDER BY event_type, day
    """


def funnel_windowed(events_ds, steps: list[str], window_us: int,
                    user_col: str = "user_id", type_col: str = "event_type",
                    ts_col: str = "ts",
                    broadcast_cap: int = 2_000_000) -> pa.Table:
    """Funnel with a CONVERSION WINDOW: a user completes step k iff
    some step-k event falls within ``(t', t' + window_us]`` of a
    FEASIBLE step-(k-1) event time t'.  Greedy earliest-completion is
    NOT exact here (the earliest step-1 event may expire while a later
    one converts), so each pass carries the full FEASIBLE-TIME SET:

    - feasible_1 = all step-1 event times;
    - feasible_k = step-k event times with a qualifying predecessor —
      and the LARGEST feasible t' below ts is the decisive candidate
      (if any t' < ts has ts <= t' + W, the largest such t' does too),
      so the broadcast check is one searchsorted against the
      (user, t')-sorted feasible arrays.

    Distribution: the feasible set is bounded by that STEP's event
    count, not by users.  Below ``broadcast_cap`` rows it gates the
    next pass as driver-sorted broadcast arrays; ABOVE the cap it
    stays a Dataset and the gate runs as a distributed RANGE JOIN
    (functions/rangejoin.py — each feasible time becomes the interval
    ``[t'+1, t'+W+1)``, integer-us-exact for ``(t', t'+W]``), with
    per-batch dedup and a user-keyed distinct count.  Both paths are
    oracle-identical (tests force each).
    -> pa.Table (step, event_type, users).
    """
    import ray
    from ray.data.aggregate import Count  # noqa: F401 (distinct shape)

    if not steps:
        raise ValueError("funnel needs at least one step")

    def typed_pairs(st):
        def f(t: pa.Table, _st=st) -> pa.Table:
            m = pc.equal(t.column(type_col), pa.scalar(_st))
            t = t.filter(m)
            u = t.column(user_col).combine_chunks() \
                if isinstance(t.column(user_col), pa.ChunkedArray) \
                else t.column(user_col)
            us = u.to_numpy(zero_copy_only=False)
            ts = _ts_us(t.column(ts_col)).to_numpy(zero_copy_only=False)
            order = np.lexsort((ts, us))
            us, ts = us[order], ts[order]
            keep = np.ones(len(us), dtype=bool)   # in-batch dedupe
            keep[1:] = (us[1:] != us[:-1]) | (ts[1:] != ts[:-1])
            return pa.table({user_col: pa.array(us[keep], pa.int64()),
                             "ts_us": pa.array(ts[keep], pa.int64())})
        return f

    def batch_dedupe(t: pa.Table) -> pa.Table:
        us = t.column(user_col).to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, us))
        us, ts = us[order], ts[order]
        keep = np.ones(len(us), dtype=bool)
        keep[1:] = (us[1:] != us[:-1]) | (ts[1:] != ts[:-1])
        return pa.table({user_col: pa.array(us[keep], pa.int64()),
                         "ts_us": pa.array(ts[keep], pa.int64())})

    counts: list[int] = []
    feas = None              # materialized Dataset[(user, ts_us)]
    feas_n = -1              # its row count (upper bound w/ dupes)
    for k, st in enumerate(steps):
        stream = events_ds.map_batches(typed_pairs(st),
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)
        if k > 0:
            if feas_n == 0:
                counts.append(0)
                continue
            if feas_n <= broadcast_cap:
                rows = feas.take_all()
                u = np.array([r[user_col] for r in rows], np.int64)
                t_ = np.array([r["ts_us"] for r in rows], np.int64)
                order = np.lexsort((t_, u))
                u, t_ = u[order], t_[order]
                keep = np.ones(len(u), dtype=bool)
                keep[1:] = (u[1:] != u[:-1]) | (t_[1:] != t_[:-1])
                ref = ray.put((u[keep], t_[keep]))

                def gated(t: pa.Table, _ref=ref) -> pa.Table:
                    import ray as _r

                    pu, pt = _r.get(_ref)
                    us = t.column(user_col) \
                        .to_numpy(zero_copy_only=False)
                    ts = t.column("ts_us").to_numpy(zero_copy_only=False)
                    # largest feasible (user, t') strictly below
                    # (user, ts) in the lexsorted arrays
                    idx = _pair_searchsorted(pu, pt, us, ts) - 1
                    ok = idx >= 0
                    idx_c = np.maximum(idx, 0)
                    ok &= (pu[idx_c] == us) & (pt[idx_c] < ts) \
                        & (ts <= pt[idx_c] + window_us)
                    return pa.table({
                        user_col: pa.array(us[ok], pa.int64()),
                        "ts_us": pa.array(ts[ok], pa.int64())})

                stream = stream.map_batches(gated,
                                            batch_format="pyarrow")
            else:
                from .rangejoin import range_join

                intervals = feas.map_batches(
                    lambda t: pa.table({
                        user_col: t.column(user_col),
                        "win_start": pc.add(t.column("ts_us"),
                                            pa.scalar(1, pa.int64())),
                        "win_end": pc.add(
                            t.column("ts_us"),
                            pa.scalar(window_us + 1, pa.int64()))}),
                    batch_format="pyarrow")
                j = range_join(stream, intervals, on=user_col,
                               point_ts="ts_us",
                               granularity_us=max(window_us, 1),
                               max_span=4)
                stream = j.map_batches(
                    lambda t: batch_dedupe(t.select([user_col,
                                                     "ts_us"])),
                    batch_format="pyarrow")
        feas = stream.materialize()
        feas_n = feas.count()
        if feas_n <= broadcast_cap:
            rows = feas.take_all()
            counts.append(int(len({r[user_col] for r in rows})))
        else:
            counts.append(int(
                feas.groupby(user_col).count().count()))

    return pa.table({
        "step": pa.array(range(1, len(steps) + 1), pa.int64()),
        "event_type": pa.array(list(steps), pa.string()),
        "users": pa.array(counts, pa.int64())})


def _pair_searchsorted(pu: np.ndarray, pt: np.ndarray,
                       us: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """For each query pair (us[i], ts[i]) the insertion index into
    the (pu, pt)-lexsorted pair arrays (side='left') — vectorized:
    user-block bounds via two searchsorteds on pu, then a bounded
    searchsorted per DISTINCT query user's block (loop over distinct
    users present in the batch, not rows)."""
    out = np.zeros(len(us), dtype=np.int64)
    if len(pu) == 0 or len(us) == 0:
        return out
    lo = np.searchsorted(pu, us, side="left")
    hi = np.searchsorted(pu, us, side="right")
    order = np.argsort(us, kind="stable")
    us_o = us[order]
    block_start = np.ones(len(us_o), dtype=bool)
    block_start[1:] = us_o[1:] != us_o[:-1]
    for s in np.flatnonzero(block_start):
        e = s + 1
        while e < len(us_o) and us_o[e] == us_o[s]:
            e += 1
        rows = order[s:e]
        l, h = lo[rows[0]], hi[rows[0]]
        out[rows] = l + np.searchsorted(pt[l:h], ts[rows], side="left")
    return out


def sql_funnel_windowed(steps: list[str], window_us: int,
                        rel: str = "events") -> str:
    """DuckDB mirror of :func:`funnel_windowed` — per-step EXISTS
    against the previous feasible set."""
    ctes = []
    for i, st in enumerate(steps):
        name, s = f"f{i + 1}", st.replace("'", "''")
        if i == 0:
            ctes.append(
                f"{name} AS (SELECT DISTINCT user_id, "
                f"epoch_us(ts) AS t FROM {rel} "
                f"WHERE event_type = '{s}')")
        else:
            prev = f"f{i}"
            ctes.append(
                f"{name} AS (SELECT DISTINCT e.user_id, "
                f"epoch_us(e.ts) AS t FROM {rel} e "
                f"WHERE e.event_type = '{s}' AND EXISTS ("
                f"SELECT 1 FROM {prev} p WHERE p.user_id = e.user_id "
                f"AND p.t < epoch_us(e.ts) "
                f"AND epoch_us(e.ts) <= p.t + {window_us}))")
    arms = [
        f"SELECT CAST({i + 1} AS BIGINT) AS step, "
        f"'{st.replace(chr(39), chr(39) * 2)}' AS event_type, "
        f"count(DISTINCT user_id)::BIGINT AS users FROM f{i + 1}"
        for i, st in enumerate(steps)]
    return ("WITH " + ",\n".join(ctes) + "\nSELECT * FROM ("
            + " UNION ALL ".join(arms) + ") ORDER BY step")
