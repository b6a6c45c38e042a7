"""Hot-key-safe per-key ordered window ops (sessions / as-of /
running sum) via composite (key, coarse-time-bucket) pre-split with
boundary stitching.

The naive shape — ``groupby(user).map_groups(ordered_fn)`` — is exact
but concentrates one user's whole history in one task: a pathological
user owning half the events at 100x scale becomes one giant task.
Here every operator groups on the COMPOSITE key ``user x time-bucket``
(single string key; multi-key groupby aggregates are a known Ray 2.49
tax, BENCH/NOTES.md), so no task ever sees more than one bucket-width
of one user's stream, then repairs the seams:

- running sum: per-bucket local cumsum + per-bucket totals; a tiny
  per-user pass turns totals into per-bucket carry-in offsets
  (O(buckets/user) rows), added back by broadcast lookup.
- as-of forward-carry: per-bucket local carry with a sentinel for
  "no prior match in this bucket"; the per-bucket last-match summary
  chains into carry-ins the same way; only sentinel rows are patched.
Group summaries ride ALONG the data rows (a __kind marker column,
split by filter downstream) so each operator pays exactly one
composite-key shuffle plus one O(users x buckets) slim pass — no
second scan of the events. Carry tables are broadcast below
``broadcast_cap`` (users x buckets, slim) with a documented join
fallback above it.

Sessions and transition counts use the newer SORT + SEAM design
instead (one range-shuffle sort, vectorized per-batch local pass,
O(batches) driver stitch): same exactness and hot-key-safety, fewer
exchanges, and no per-group pandas overhead — measured 5-10x faster
(BENCH/NOTES.md session 4). The bucketed shape remains the right fit
for running-sum/as-of, whose outputs are per-EVENT (a per-batch patch
pass needs the carry-in lookup either way).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DAY_US = 86_400_000_000
_SEP = "\x1f"


def _with_bucket_key(ds, key_col: str, ts_col: str, bucket_us: int,
                     columns: list[str]):
    """Append __k = '{key}\\x1f{bucket}' (and __b int64) to the rows."""

    def f(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        b = pc.divide(ts, pa.scalar(bucket_us, pa.int64()))
        k = pc.binary_join_element_wise(
            pc.cast(t.column(key_col), pa.string()),
            pc.cast(b, pa.string()), _SEP)
        out = t.select(columns)
        out = out.append_column("__b", pc.cast(b, pa.int64()))
        return out.append_column("__k", k)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _carry_map(summaries: list[dict], key_col: str,
               val_field: str, mode: str) -> dict[str, int]:
    """(user, bucket, v) summary rows -> {'user\\x1fbucket': carry-in}.

    mode='prefix_sum': carry = sum of v over earlier buckets.
    mode='last':       carry = v of the latest earlier bucket with a
                       non-sentinel v (sentinel = -1)."""
    by_user: dict[str, list[tuple[int, int]]] = {}
    for r in summaries:
        by_user.setdefault(str(r[key_col]), []).append(
            (int(r["__b"]), int(r[val_field])))
    out: dict[str, int] = {}
    for u, rows in by_user.items():
        rows.sort()
        acc = 0 if mode == "prefix_sum" else -1
        for b, v in rows:
            out[f"{u}{_SEP}{b}"] = acc
            if mode == "prefix_sum":
                acc += v
            elif v != -1:
                acc = v
    return out


def _carry_ds(both, key_col: str, mode: str):
    """Distributed twin of :func:`_carry_map` for carry tables ABOVE
    the broadcast cap: per-key map_groups over the slim summary rows
    (O(buckets) per key) -> Dataset(__k, __carry), scrubbed and
    arrow-rebuilt for the join that patches the data rows."""
    from ..dsutil import drop_empty_blocks

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("__b", kind="mergesort")
        key = str(df[key_col].iloc[0])
        b = df["__b"].to_numpy(dtype="int64")
        v = df["__local"].to_numpy(dtype="int64")
        if mode == "prefix_sum":
            # carry-in = exclusive prefix sum of the earlier buckets
            cs = np.concatenate(([0], np.cumsum(v)[:-1]))
        else:
            # carry-in = last non-sentinel value of an earlier bucket
            # (shift past self, then forward-fill over sentinels)
            cs = (pd.Series(v).where(v != -1).shift(1).ffill()
                  .fillna(-1).to_numpy(dtype="int64"))
        ks = np.char.add(f"{key}{_SEP}", b.astype("U"))
        return pd.DataFrame({"__k": ks,
                             "__carry": pd.array(cs, dtype="int64")})

    carried = (both.filter(expr="__kind == 1")
               .groupby(key_col).map_groups(per_user,
                                            batch_format="pandas")
               .map_batches(lambda t: t.select(["__k", "__carry"]),
                            batch_format="pyarrow"))
    return drop_empty_blocks(carried.materialize())


def _patch_by_join(both, carry_ds, id_col: str, fix):
    """LEFT-join the per-bucket carry onto the kind-0 data rows and
    apply ``fix(local, carry_or_null) -> out`` — the above-cap twin of
    the broadcast index_in patch."""
    from ..dsutil import drop_empty_blocks, join_datasets

    data = (both.filter(expr="__kind == 0")
            .map_batches(lambda t: t.select([id_col, "__local", "__k"]),
                         batch_format="pyarrow"))
    data = drop_empty_blocks(data.materialize())
    j = join_datasets(data, carry_ds, on="__k",
                      join_type="left_outer",
                      scrub_left=False, scrub_right=False)
    return j.map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            "__out": fix(t.column("__local"),
                                         t.column("__carry"))}),
        batch_format="pyarrow")


def _add_fix(local_v, carry):
    """offset patch: local + carry (0 when the key-bucket had no
    earlier buckets — the left join found no carry row)."""
    return pc.add(local_v, pc.fill_null(pc.cast(carry, pa.int64()), 0))


def running_sum_bucketed(ds, key_col: str, ts_col: str, id_col: str,
                         value_col: str, out_col: str = "running_value_s",
                         scale: int = 100, bucket_us: int = DAY_US,
                         broadcast_cap: int = 2_000_000):
    """Per-key running fixed-point sum ordered by (ts, id) — exact
    equivalent of the single-group cumsum, hot-key-safe."""
    import ray

    keyed = _with_bucket_key(ds, key_col, ts_col, bucket_us,
                             [id_col, key_col, ts_col, value_col])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="mergesort")
        vs = np.rint(df[value_col].to_numpy() * scale).astype("int64")
        data = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "__local": np.cumsum(vs),
            "__k": df["__k"].iloc[0],
            key_col: df[key_col].iloc[0],
            "__b": df["__b"].iloc[0],
            "__kind": 0,
        })
        summary = data.iloc[-1:].copy()
        summary["__kind"] = 1  # per-bucket total rides along
        return pd.concat([data, summary], ignore_index=True)

    both = keyed.groupby("__k").map_groups(
        local, batch_format="pandas").materialize()
    if both.filter(expr="__kind == 1").count() > broadcast_cap:
        # distributed fallback: per-key carry pass + key-join patch
        return _patch_by_join(
            both, _carry_ds(both, key_col, "prefix_sum"), id_col,
            _add_fix).map_batches(
                lambda t: t.rename_columns([id_col, out_col]),
                batch_format="pyarrow")
    summaries = [r for r in both.filter(expr="__kind == 1").take_all()]
    carry = _carry_map(summaries, key_col, "__local", "prefix_sum")
    keys = pa.array(list(carry.keys()), pa.string())
    vals = pa.array(list(carry.values()), pa.int64())
    ref = ray.put((keys, vals))

    def patch(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _r

        t = t.filter(pc.equal(t.column("__kind"), pa.scalar(0)))
        ks, vs_ = _r.get(_ref)
        idx = pc.index_in(t.column("__k"), value_set=ks)
        off = pc.fill_null(pc.take(vs_, idx), 0)
        return pa.table({
            id_col: t.column(id_col),
            out_col: pc.add(t.column("__local"), off)})

    return both.map_batches(patch, batch_format="pyarrow")


def asof_carry_bucketed(ds, key_col: str, ts_col: str, id_col: str,
                        type_col: str, probe_type: str, match_type: str,
                        out_col: str = "click_event_id",
                        bucket_us: int = DAY_US,
                        broadcast_cap: int = 2_000_000):
    """For every `probe_type` event, the id of the most recent prior
    `match_type` event of the same key (sentinel -1 when none) —
    exact forward-carry, hot-key-safe."""
    import ray

    keyed = _with_bucket_key(ds, key_col, ts_col, bucket_us,
                             [id_col, key_col, ts_col, type_col])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="mergesort")
        last = -1
        ids, vals = [], []
        for eid, etype in zip(df[id_col], df[type_col]):
            if etype == probe_type:
                ids.append(eid)
                vals.append(last)
            if etype == match_type:
                last = int(eid)
        data = pd.DataFrame({
            id_col: pd.array(ids, dtype="int64"),
            "__local": pd.array(vals, dtype="int64"),
            "__k": df["__k"].iloc[0], key_col: df[key_col].iloc[0],
            "__b": df["__b"].iloc[0], "__kind": 0})
        summary = pd.DataFrame({
            id_col: pd.array([-1], dtype="int64"),
            "__local": pd.array([last], dtype="int64"),  # -1 = no match
            "__k": [df["__k"].iloc[0]], key_col: [df[key_col].iloc[0]],
            "__b": [df["__b"].iloc[0]], "__kind": [1]})
        return pd.concat([data, summary], ignore_index=True)

    both = keyed.groupby("__k").map_groups(
        local, batch_format="pandas").materialize()
    n_summaries = both.filter(expr="__kind == 1").count()
    if n_summaries > broadcast_cap:
        # distributed fallback: per-key carry pass + key-join patch
        def fix(local_v, carry):
            cin = pc.fill_null(pc.cast(carry, pa.int64()), -1)
            return pc.if_else(
                pc.equal(local_v, pa.scalar(-1, pa.int64())),
                cin, local_v)

        out = _patch_by_join(both, _carry_ds(both, key_col, "last"),
                             id_col, fix)
        return out.map_batches(
            lambda t: t.rename_columns([id_col, out_col]),
            batch_format="pyarrow")
    summaries = [r for r in both.filter(expr="__kind == 1").take_all()]
    carry = _carry_map(summaries, key_col, "__local", "last")
    keys = pa.array(list(carry.keys()), pa.string())
    vals = pa.array(list(carry.values()), pa.int64())
    ref = ray.put((keys, vals))

    def patch(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _r

        t = t.filter(pc.equal(t.column("__kind"), pa.scalar(0)))
        ks, vs_ = _r.get(_ref)
        idx = pc.index_in(t.column("__k"), value_set=ks)
        cin = pc.fill_null(pc.take(vs_, idx), -1)
        local_v = t.column("__local")
        fixed = pc.if_else(pc.equal(local_v, pa.scalar(-1, pa.int64())),
                           cin, local_v)
        return pa.table({id_col: t.column(id_col), out_col: fixed})

    return both.map_batches(patch, batch_format="pyarrow")


def _with_value_bucket_key(ds, key_col: str, value_col: str, scale: int,
                           bucket_width: int, id_col: str,
                           negate: bool = False):
    """Rows -> (id, key, __v fixed-point value, __b value-range bucket,
    __k '{key}\\x1f{bucket}'). ``negate`` flips bucket sign so that
    ascending __b order == descending value order (the carry pass
    always walks __b ascending). Floor division (numpy) keeps negative
    values in the right bucket — pc.divide truncates toward zero."""

    def f(t: pa.Table) -> pa.Table:
        v = np.rint(t.column(value_col).to_numpy(zero_copy_only=False)
                    * scale).astype("int64")
        b = v // bucket_width
        if negate:
            b = -b
        k = pc.binary_join_element_wise(
            pc.cast(t.column(key_col), pa.string()),
            pc.cast(pa.array(b), pa.string()), _SEP)
        return pa.table({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            "__v": pa.array(v),
            "__b": pa.array(b),
            "__k": k,
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def dense_rank_bucketed(ds, key_col: str, value_col: str, id_col: str,
                        out_col: str = "rank", scale: int = 100,
                        bucket_width: int = 1 << 18,
                        descending: bool = True,
                        broadcast_cap: int = 2_000_000):
    """Per-key DENSE_RANK over the fixed-point value, hot-key-safe:
    composite (key, value-range-bucket) pre-split, local dense rank per
    bucket, then a carry-in of the count of DISTINCT values in earlier
    (higher, when descending) buckets. Exact for any key skew; a single
    hot VALUE still lands in one bucket, but dense rank collapses its
    ties to one row of work. ``bucket_width`` is in fixed-point units —
    size it so one bucket of one key fits a task."""
    import ray

    keyed = _with_value_bucket_key(ds, key_col, value_col, scale,
                                   bucket_width, id_col,
                                   negate=descending)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        v = df["__v"].to_numpy()
        sortkey = -v if descending else v
        uniq = np.unique(sortkey)
        data = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "__local": (np.searchsorted(uniq, sortkey) + 1).astype("int64"),
            "__k": df["__k"].iloc[0],
            key_col: df[key_col].iloc[0],
            "__b": df["__b"].iloc[0],
            "__kind": 0,
        })
        summary = data.iloc[:1].copy()
        summary["__local"] = np.int64(len(uniq))
        summary["__kind"] = 1  # distinct-value count rides along
        return pd.concat([data, summary], ignore_index=True)

    both = keyed.groupby("__k").map_groups(
        local, batch_format="pandas").materialize()
    if both.filter(expr="__kind == 1").count() > broadcast_cap:
        # distributed fallback: per-key carry pass + key-join patch
        return _patch_by_join(
            both, _carry_ds(both, key_col, "prefix_sum"), id_col,
            _add_fix).map_batches(
                lambda t: t.rename_columns([id_col, out_col]),
                batch_format="pyarrow")
    summaries = [r for r in both.filter(expr="__kind == 1").take_all()]
    carry = _carry_map(summaries, key_col, "__local", "prefix_sum")
    keys = pa.array(list(carry.keys()), pa.string())
    vals = pa.array(list(carry.values()), pa.int64())
    ref = ray.put((keys, vals))

    def patch(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _r

        t = t.filter(pc.equal(t.column("__kind"), pa.scalar(0)))
        ks, vs_ = _r.get(_ref)
        idx = pc.index_in(t.column("__k"), value_set=ks)
        off = pc.fill_null(pc.take(vs_, idx), 0)
        return pa.table({
            id_col: t.column(id_col),
            out_col: pc.add(t.column("__local"), off)})

    return both.map_batches(patch, batch_format="pyarrow")


def ntile_bucketed(ds, key_col: str, value_col: str, id_col: str,
                   k: int = 4, out_col: str = "quartile",
                   scale: int = 100, bucket_width: int = 128,
                   broadcast_cap: int = 2_000_000):
    """Per-key NTILE(k) ordered by (fixed-point value asc, id asc),
    hot-key-safe: composite (key, value-range-bucket) pre-split, local
    1-based positions per bucket, carry-in = rows in lower buckets,
    per-key totals from the same summary pass; SQL's fill rule (the
    first n%k tiles take the extra row) applied vectorized."""
    import ray

    keyed = _with_value_bucket_key(ds, key_col, value_col, scale,
                                   bucket_width, id_col, negate=False)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__v", id_col], kind="mergesort")
        data = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "__local": np.arange(1, len(df) + 1, dtype="int64"),
            "__k": df["__k"].iloc[0],
            key_col: df[key_col].iloc[0],
            "__b": df["__b"].iloc[0],
            "__kind": 0,
        })
        summary = data.iloc[:1].copy()
        summary["__local"] = np.int64(len(df))  # bucket row count
        summary["__kind"] = 1
        return pd.concat([data, summary], ignore_index=True)

    both = keyed.groupby("__k").map_groups(
        local, batch_format="pandas").materialize()
    if both.filter(expr="__kind == 1").count() > broadcast_cap:
        # distributed fallback: carry join on the composite bucket key
        # + per-key totals join, tile arithmetic vectorized per batch
        from ray.data.aggregate import Sum

        from ..dsutil import drop_empty_blocks, join_datasets

        totals_ds = drop_empty_blocks(
            (both.filter(expr="__kind == 1")
             .map_batches(lambda t: pa.table({
                 "__tk": pc.cast(t.column(key_col), pa.string()),
                 "n_p": pc.cast(t.column("__local"), pa.int64())}),
                 batch_format="pyarrow")
             .groupby("__tk").aggregate(Sum("n_p", alias_name="__n"))
             .map_batches(lambda t: t.select(["__tk", "__n"]),
                          batch_format="pyarrow")).materialize())
        data = drop_empty_blocks(
            both.filter(expr="__kind == 0").map_batches(
                lambda t: pa.table({
                    id_col: pc.cast(t.column(id_col), pa.int64()),
                    "__local": pc.cast(t.column("__local"), pa.int64()),
                    "__k": pc.cast(t.column("__k"), pa.string()),
                    "__tk": pc.cast(t.column(key_col), pa.string())}),
                batch_format="pyarrow").materialize())
        j = join_datasets(data, _carry_ds(both, key_col, "prefix_sum"),
                          on="__k", join_type="left_outer",
                          scrub_left=False, scrub_right=False)
        # consecutive joins: scrub BETWEEN them (BENCH/NOTES.md rule)
        j = join_datasets(drop_empty_blocks(j.materialize()), totals_ds,
                          on="__tk", join_type="left_outer",
                          scrub_left=False, scrub_right=False)

        def tile_fix(t: pa.Table) -> pa.Table:
            off = pc.fill_null(pc.cast(t.column("__carry"), pa.int64()),
                               0).to_numpy(zero_copy_only=False)
            n = pc.cast(t.column("__n"), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            pos = t.column("__local").to_numpy(zero_copy_only=False) \
                + off
            base, rem = n // k, n % k
            boundary = rem * (base + 1)
            base_safe = np.maximum(base, 1)
            tile = np.where(pos <= boundary,
                            (pos - 1) // (base + 1) + 1,
                            rem + (pos - boundary - 1) // base_safe + 1)
            return pa.table({id_col: t.column(id_col),
                             out_col: pa.array(tile.astype("int64"))})

        return j.map_batches(tile_fix, batch_format="pyarrow")
    summaries = [r for r in both.filter(expr="__kind == 1").take_all()]
    carry = _carry_map(summaries, key_col, "__local", "prefix_sum")
    totals: dict[str, int] = {}
    for r in summaries:
        u = str(r[key_col])
        totals[u] = totals.get(u, 0) + int(r["__local"])
    ckeys = pa.array(list(carry.keys()), pa.string())
    cvals = pa.array(list(carry.values()), pa.int64())
    tkeys = pa.array(list(totals.keys()), pa.string())
    tvals = pa.array(list(totals.values()), pa.int64())
    ref = ray.put((ckeys, cvals, tkeys, tvals))

    def patch(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _r

        t = t.filter(pc.equal(t.column("__kind"), pa.scalar(0)))
        ks, cs, tks, tvs = _r.get(_ref)
        idx = pc.index_in(t.column("__k"), value_set=ks)
        off = pc.fill_null(pc.take(cs, idx), 0).to_numpy(
            zero_copy_only=False)
        tidx = pc.index_in(pc.cast(t.column(key_col), pa.string()),
                           value_set=tks)
        n = pc.take(tvs, tidx).to_numpy(zero_copy_only=False)
        pos = t.column("__local").to_numpy(zero_copy_only=False) + off
        base, rem = n // k, n % k
        boundary = rem * (base + 1)
        base_safe = np.maximum(base, 1)  # base==0 rows take the if-branch
        tile = np.where(pos <= boundary,
                        (pos - 1) // (base + 1) + 1,
                        rem + (pos - boundary - 1) // base_safe + 1)
        return pa.table({
            id_col: t.column(id_col),
            out_col: pa.array(tile.astype("int64"))})

    return both.map_batches(patch, batch_format="pyarrow")


def _chain_merge_sessions(rows: list[dict], key_col: str,
                          gap_us: int) -> list[dict]:
    """Driver-side seam stitch: boundary sessions in (key, start)
    order chain-merge when the same key's next session starts within
    ``gap_us`` of the current end — the same gap rule the local pass
    applies, so a session spanning MANY batches folds left to right."""
    rows = sorted(rows, key=lambda r: (r[key_col], r["start_us"],
                                       r["end_us"]))
    merged: list[dict] = []
    for r in rows:
        if merged:
            cur = merged[-1]
            if (r[key_col] == cur[key_col]
                    and r["start_us"] - cur["end_us"] <= gap_us):
                cur["end_us"] = max(cur["end_us"], r["end_us"])
                cur["n_events"] += r["n_events"]
                cur["value_s"] += r["value_s"]
                continue
        merged.append(dict(r))
    return merged


def sessions_sorted(ds, key_col: str, ts_col: str, id_col: str,
                    value_col: str, gap_hours: int = 2,
                    scale: int = 100):
    """Gap-based session windows via ONE global sort + seam stitching.

    Sort by (key, ts, id) makes every batch a contiguous slice of the
    total order; the per-batch pass sessionizes VECTORIZED (one
    boolean diff + reduceat aggregates — no pandas groups) and only a
    batch's FIRST and LAST sessions can continue across a seam, so
    interior sessions stream straight to the output and the driver
    chain-merges O(2 x batches) boundary rows — independent of key
    count, day span, and skew (a hot key is split freely by the sort;
    a session spanning many batches folds in the ordered driver scan).

    Replaces the (key x day-bucket) map_groups pre-split of earlier
    rounds: same exactness and hot-key-safety, but one range shuffle
    instead of a composite groupby of thousands of tiny pandas groups,
    and the driver set is O(batches), not O(keys x buckets) — both
    measured wins (BENCH/NOTES.md session 4).

    -> Dataset (key_col, session_start, session_end, n_events,
    value_s) with timestamp[us] bounds and fixed-point int64 sums.
    """
    import ray.data as rd

    from ..dsutil import drop_empty_blocks

    gap_us = int(gap_hours) * 3_600_000_000

    def slim(t: pa.Table) -> pa.Table:
        # DuckDB round() = half away from zero; Arrow's name for it is
        # half_towards_infinity (BENCH/NOTES.md round-4)
        vs = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(value_col), pa.float64()),
            pa.scalar(float(scale))), round_mode="half_towards_infinity"),
            pa.int64())
        return pa.table({
            "k": pc.cast(t.column(key_col), pa.int64()),
            "ts_us": pc.cast(pc.cast(t.column(ts_col),
                                     pa.timestamp("us")), pa.int64()),
            "i": pc.cast(t.column(id_col), pa.int64()),
            "vs": vs})

    s = (ds.map_batches(slim, batch_format="pyarrow",
                        zero_copy_batch=True)
         .sort(["k", "ts_us", "i"]))

    def local(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.table({
            "kind": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
            "start_us": pa.array([], pa.int64()),
            "end_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "value_s": pa.array([], pa.int64())})
        if n == 0:
            return empty
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        vs = t.column("vs").to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = (k[1:] != k[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        idx = np.flatnonzero(new)              # session start offsets
        ends = np.r_[idx[1:], n] - 1
        m = len(idx)
        kind = np.zeros(m, dtype=np.int64)
        kind[0] = kind[-1] = 1                 # seam candidates
        return pa.table({
            "kind": pa.array(kind, pa.int64()),
            "k": pa.array(k[idx], pa.int64()),
            "start_us": pa.array(ts[idx], pa.int64()),
            "end_us": pa.array(ts[ends], pa.int64()),
            "n_events": pa.array(np.diff(np.r_[idx, n]), pa.int64()),
            "value_s": pa.array(np.add.reduceat(vs, idx), pa.int64())})

    # sort can emit zero-row blocks that BYPASS map_batches with the
    # pre-map schema — scrub before the kind filter
    both = drop_empty_blocks(
        s.map_batches(local, batch_format="pyarrow").materialize())
    boundary = both.filter(expr="kind == 1").take_all()  # O(2 x batches)
    stitched = _chain_merge_sessions(boundary, "k", gap_us)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t.column("k"),
            "session_start": pc.cast(t.column("start_us"),
                                     pa.timestamp("us")),
            "session_end": pc.cast(t.column("end_us"),
                                   pa.timestamp("us")),
            "n_events": t.column("n_events"),
            "value_s": t.column("value_s")})

    interior = both.filter(expr="kind == 0") \
        .map_batches(finish, batch_format="pyarrow")
    st = pa.table({
        "k": pa.array([r["k"] for r in stitched], pa.int64()),
        "start_us": pa.array([r["start_us"] for r in stitched],
                             pa.int64()),
        "end_us": pa.array([r["end_us"] for r in stitched], pa.int64()),
        "n_events": pa.array([r["n_events"] for r in stitched],
                             pa.int64()),
        "value_s": pa.array([r["value_s"] for r in stitched],
                            pa.int64())})
    return interior.union(rd.from_arrow(finish(st)))


def transition_counts(ds, key_col: str, ts_col: str, id_col: str,
                      type_col: str) -> pa.Table:
    """Per-key event-transition (Markov) counts: for every pair of
    CONSECUTIVE events in a key's (ts, id)-ordered stream, count
    (prev_type, next_type) over all keys — the user-journey matrix
    funnels and sessionization are read against.

    Shape: ONE range-shuffle sort of the slim (key, ts, id, type)
    projection, then a fully vectorized per-batch pass.  Every batch
    of a sorted Dataset is a contiguous slice of the total order, so
    in-batch pairs are exact and the only missing pairs are the batch
    SEAMS — each batch also emits its first/last row as a summary, and
    the driver reconstructs seam pairs by re-sorting the O(batches)
    summaries by their first key (disjoint ranges sort back into
    stream order).  Hot keys are safe by construction: the sort splits
    a key across blocks freely; no task ever holds a whole key.
    -> pa.Table (prev_type, next_type, n) sorted.

    (First cut used the (key, day-bucket) map_groups pre-split of the
    other ops here: oracle-exact but 55 s at sf0.1 — thousands of
    tiny pandas groups are pure per-group overhead.  The sort+seam
    design is the same exactness with one shuffle and no Python-level
    groups; see BENCH/NOTES.md session 4.)
    """
    from ray.data.aggregate import Sum

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(t.column(key_col), pa.string()),
            "ts_us": pc.cast(pc.cast(t.column(ts_col),
                                     pa.timestamp("us")), pa.int64()),
            "i": pc.cast(t.column(id_col), pa.int64()),
            "y": pc.cast(t.column(type_col), pa.string())})

    s = (ds.map_batches(slim, batch_format="pyarrow",
                        zero_copy_batch=True)
         .sort(["k", "ts_us", "i"]))

    def pairs_and_summary(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "k": pa.array([], pa.string()),
                             "ts_us": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "y2": pa.array([], pa.string())})
        k = t.column("k").combine_chunks() if isinstance(
            t.column("k"), pa.ChunkedArray) else t.column("k")
        y = t.column("y").combine_chunks() if isinstance(
            t.column("y"), pa.ChunkedArray) else t.column("y")
        same = pc.equal(k.slice(0, n - 1), k.slice(1, n))
        pair = pc.filter(
            pc.binary_join_element_wise(y.slice(0, n - 1),
                                        y.slice(1, n), _SEP),
            same)
        vc = pc.value_counts(pair)
        inner = pa.table({
            "kind": pa.array([0] * len(vc), pa.int64()),
            "pair": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
            "k": pa.array([""] * len(vc), pa.string()),
            "ts_us": pa.array([0] * len(vc), pa.int64()),
            "i": pa.array([0] * len(vc), pa.int64()),
            "y2": pa.array([""] * len(vc), pa.string())})
        summ = pa.table({
            "kind": pa.array([1], pa.int64()),
            "pair": pa.array([y[n - 1].as_py()], pa.string()),  # last y
            "n": pa.array([0], pa.int64()),
            "k": pa.array([k[0].as_py()], pa.string()),
            "ts_us": pa.array([t.column("ts_us")[0].as_py()], pa.int64()),
            "i": pa.array([t.column("i")[0].as_py()], pa.int64()),
            "y2": pa.array([y[0].as_py()], pa.string()),   # first y
        })
        # summary also needs the LAST row's key to pair across a seam
        summ = summ.append_column("k_last",
                                  pa.array([k[n - 1].as_py()],
                                           pa.string()))
        inner = inner.append_column("k_last",
                                    pa.array([""] * len(vc), pa.string()))
        return pa.concat_tables([inner, summ])

    from ..dsutil import drop_empty_blocks

    # sort can emit zero-row blocks that BYPASS map_batches with the
    # pre-map schema (no "kind" column) — scrub before filtering
    both = drop_empty_blocks(
        s.map_batches(pairs_and_summary,
                      batch_format="pyarrow").materialize())
    inner = (both.filter(expr="kind == 0")
             .groupby("pair").aggregate(Sum("n", alias_name="n"))
             .take_all())                      # <= |types|^2 rows
    counts: dict[tuple[str, str], int] = {}
    for r in inner:
        a, b = r["pair"].split(_SEP, 1)
        counts[(a, b)] = counts.get((a, b), 0) + int(r["n"])
    summaries = both.filter(expr="kind == 1").take_all()  # O(batches)
    summaries.sort(key=lambda r: (r["k"], r["ts_us"], r["i"]))
    for prev, nxt in zip(summaries, summaries[1:]):
        if prev["k_last"] == nxt["k"]:
            key = (prev["pair"], nxt["y2"])    # last type -> first type
            counts[key] = counts.get(key, 0) + 1
    out = sorted(counts.items())
    return pa.table({
        "prev_type": pa.array([a for (a, _), _ in out], pa.string()),
        "next_type": pa.array([b for (_, b), _ in out], pa.string()),
        "n": pa.array([v for _, v in out], pa.int64())})


def sql_transition_counts(key_col: str = "user_id", ts_col: str = "ts",
                          id_col: str = "event_id",
                          type_col: str = "event_type",
                          rel: str = "events") -> str:
    """DuckDB mirror of :func:`transition_counts` (lead() over the
    same (ts, id) per-key order)."""
    return f"""
        WITH seq AS (
          SELECT {type_col} AS prev_type,
                 lead({type_col}) OVER (PARTITION BY {key_col}
                                        ORDER BY {ts_col}, {id_col})
                     AS next_type
          FROM {rel})
        SELECT prev_type, next_type, count(*)::BIGINT AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def interevent_gap_hist(ds, key_col: str, ts_col: str, id_col: str):
    """Log-bucketed histogram of the gaps between a key's CONSECUTIVE
    events — the inter-arrival-time distribution sessionization gap
    thresholds and burst monitors are tuned against.

    Bucket contract (exact integers on both engines): the gap in
    whole seconds ``g = (ts2 - ts1) // 1e6 us`` falls in bucket
    ``length(bin(g + 1))`` == ``bit_length(g + 1)`` — bucket 1 holds
    sub-second gaps, each next bucket doubles the range.

    Same SORT + SEAM shape as :func:`transition_counts`: one range
    shuffle, vectorized in-batch diffs, O(batches) first/last
    summaries stitched on the driver.  -> pa.Table (bucket, n) sorted.
    """

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(t.column(key_col), pa.int64()),
            "ts_us": pc.cast(pc.cast(t.column(ts_col),
                                     pa.timestamp("us")), pa.int64()),
            "i": pc.cast(t.column(id_col), pa.int64())})

    s = (ds.map_batches(slim, batch_format="pyarrow",
                        zero_copy_batch=True)
         .sort(["k", "ts_us", "i"]))

    def local(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "ts_us": pa.array([], pa.int64()),
                             "last_k": pa.array([], pa.int64()),
                             "last_us": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64())})
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        same = k[1:] == k[:-1]
        g = (ts[1:] - ts[:-1])[same] // 1_000_000
        _, e = np.frexp(np.maximum(g + 1, 1).astype(np.float64))
        b, c = np.unique(e.astype(np.int64), return_counts=True)
        inner = pa.table({
            "kind": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            "bucket": pa.array(b, pa.int64()),
            "n_p": pa.array(c, pa.int64()),
            "k": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            "ts_us": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            "last_k": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            "last_us": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            "i": pa.array(np.zeros(len(b), np.int64), pa.int64())})
        summ = pa.table({
            "kind": pa.array([1], pa.int64()),
            "bucket": pa.array([0], pa.int64()),
            "n_p": pa.array([0], pa.int64()),
            "k": pa.array([int(k[0])], pa.int64()),
            "ts_us": pa.array([int(ts[0])], pa.int64()),
            "last_k": pa.array([int(k[-1])], pa.int64()),
            "last_us": pa.array([int(ts[-1])], pa.int64()),
            "i": pa.array([int(t.column("i")[0].as_py())], pa.int64())})
        return pa.concat_tables([inner, summ])

    from ..dsutil import drop_empty_blocks

    both = drop_empty_blocks(
        s.map_batches(local, batch_format="pyarrow").materialize())
    hist: dict[int, int] = {}
    for r in both.filter(expr="kind == 0").take_all():
        hist[r["bucket"]] = hist.get(r["bucket"], 0) + int(r["n_p"])
    summaries = both.filter(expr="kind == 1").take_all()
    summaries.sort(key=lambda r: (r["k"], r["ts_us"], r["i"]))
    for prev, nxt in zip(summaries, summaries[1:]):
        if prev["last_k"] == nxt["k"]:
            g = (nxt["ts_us"] - prev["last_us"]) // 1_000_000
            b = int(g + 1).bit_length()
            hist[b] = hist.get(b, 0) + 1
    out = sorted(hist.items())
    return pa.table({"bucket": pa.array([b for b, _ in out], pa.int64()),
                     "n": pa.array([v for _, v in out], pa.int64())})


def sql_interevent_gap_hist(key_col: str = "user_id",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            rel: str = "events") -> str:
    """DuckDB mirror of :func:`interevent_gap_hist`."""
    return f"""
        WITH g AS (
          SELECT (epoch_us({ts_col})
                  - lag(epoch_us({ts_col})) OVER (
                        PARTITION BY {key_col}
                        ORDER BY {ts_col}, {id_col})) // 1000000 AS gap
          FROM {rel})
        SELECT length(bin(gap + 1))::BIGINT AS bucket,
               count(*)::BIGINT AS n
        FROM g WHERE gap IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """
