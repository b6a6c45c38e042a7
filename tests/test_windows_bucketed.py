"""Hot-key-safe window ops (functions/windows.py): exactness of the
composite (key, time-bucket) pre-split + boundary stitching vs a
single-pass pandas reference, under heavy key skew (one user owns
half the events) and with sessions spanning bucket seams."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from k_gap_ray.functions.windows import (DAY_US, asof_carry_bucketed,
                                         running_sum_bucketed,
                                         sessions_sorted)


def _skewed_events(n: int = 4000, seed: int = 7) -> pd.DataFrame:
    """Half the events belong to user 0; timestamps span ~20 days so
    day-bucketing splits every user's stream across many buckets."""
    rng = np.random.RandomState(seed)
    user = np.where(rng.rand(n) < 0.5, 0, rng.randint(1, 30, size=n))
    ts = (np.datetime64("2024-01-01", "us")
          + rng.randint(0, 20 * 86_400_000_000, size=n)
          .astype("timedelta64[us]"))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": user.astype("int64"),
        "ts": ts,
        "event_type": rng.choice(["click", "error", "view"], size=n),
        "value": np.round(rng.rand(n) * 100, 2),
    })


@pytest.mark.parametrize("cap", [2_000_000, 0])
def test_running_sum_matches_single_pass_under_skew(ray_session, cap):
    import ray.data as rd

    df = _skewed_events()
    out = running_sum_bucketed(
        rd.from_arrow(pa.Table.from_pandas(df)), key_col="user_id",
        ts_col="ts", id_col="event_id", value_col="value",
        bucket_us=DAY_US, broadcast_cap=cap).take_all()
    mine = {r["event_id"]: r["running_value_s"] for r in out}

    ref = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        vs = np.rint(g["value"].to_numpy() * 100).astype("int64")
        for eid, rv in zip(g["event_id"], np.cumsum(vs)):
            ref[int(eid)] = int(rv)
    assert mine == ref


@pytest.mark.parametrize("cap", [2_000_000, 0])
def test_asof_matches_single_pass_under_skew(ray_session, cap):
    import ray.data as rd

    df = _skewed_events()
    out = asof_carry_bucketed(
        rd.from_arrow(pa.Table.from_pandas(df)), key_col="user_id",
        ts_col="ts", id_col="event_id", type_col="event_type",
        probe_type="error", match_type="click",
        bucket_us=DAY_US, broadcast_cap=cap).take_all()
    mine = {r["event_id"]: r["click_event_id"] for r in out}

    ref = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        last = -1
        for eid, et in zip(g["event_id"], g["event_type"]):
            if et == "error":
                ref[int(eid)] = last
            if et == "click":
                last = int(eid)
    assert mine == ref


def test_sessions_stitch_across_bucket_seams(ray_session):
    """Events 1 hour apart across midnight MUST merge into one session
    (gap 2h, day buckets): the boundary stitch is doing real work."""
    import ray.data as rd

    rows = []
    eid = 0
    # user 5: a chain crossing two midnights, one event per 20 hours
    t = np.datetime64("2024-01-01T20:00:00", "us")
    for _ in range(5):
        rows.append((eid, 5, t, 1.0))
        eid += 1
        t += np.timedelta64(90, "m")  # 1.5h < 2h gap: one session
    # user 6: two sessions inside one day
    rows.append((eid, 6, np.datetime64("2024-01-03T01:00:00", "us"), 2.0))
    rows.append((eid + 1, 6, np.datetime64("2024-01-03T09:00:00", "us"), 3.0))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])

    out = sessions_sorted(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
        key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="value", gap_hours=2).take_all()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[5]) == 1
    s = by_user[5][0]
    assert s["n_events"] == 5 and s["value_s"] == 500
    assert len(by_user[6]) == 2


def test_sessions_match_single_pass_under_skew(ray_session):
    import ray.data as rd

    df = _skewed_events(n=2000)
    out = sessions_sorted(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(8),
        key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="value", gap_hours=2).take_all()
    mine = sorted((r["user_id"], pd.Timestamp(r["session_start"]),
                   pd.Timestamp(r["session_end"]), r["n_events"],
                   r["value_s"]) for r in out)

    ref = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        sess = (g["ts"].diff() > np.timedelta64(2, "h")).cumsum()
        vs = np.rint(g["value"].to_numpy() * 100).astype("int64")
        g = g.assign(_s=sess, _v=vs)
        for _, sg in g.groupby("_s"):
            ref.append((uid, sg["ts"].min(), sg["ts"].max(),
                        len(sg), int(sg["_v"].sum())))
    assert mine == sorted(ref)


@pytest.mark.parametrize("cap", [2_000_000, 0])
def test_dense_rank_matches_single_pass_under_skew(ray_session, cap):
    """Dense rank (desc) over a skewed frame: one group owns 60% of
    rows AND one hot value repeats heavily (ties must share a rank).
    bucket_width=50 forces many value buckets so the carry stitch is
    doing real work."""
    import ray.data as rd

    from k_gap_ray.functions.windows import dense_rank_bucketed

    rng = np.random.RandomState(11)
    n = 3000
    grp = np.where(rng.rand(n) < 0.6, "HOT", rng.choice(list("ABCD"), n))
    val = np.round(rng.rand(n) * 100, 2)
    val[rng.rand(n) < 0.2] = 42.0  # hot value: 20% ties
    df = pd.DataFrame({"rid": np.arange(n, dtype="int64"),
                       "grp": grp, "val": val})

    out = dense_rank_bucketed(
        rd.from_arrow(pa.Table.from_pandas(df)), key_col="grp",
        value_col="val", id_col="rid", out_col="r", scale=100,
        bucket_width=50, descending=True, broadcast_cap=cap).take_all()
    mine = {r["rid"]: r["r"] for r in out}

    ref = {}
    for _, g in df.groupby("grp"):
        v = np.rint(g["val"].to_numpy() * 100).astype("int64")
        uniq = np.unique(-v)
        for rid, rk in zip(g["rid"], np.searchsorted(uniq, -v) + 1):
            ref[int(rid)] = int(rk)
    assert len(mine) == n and mine == ref


@pytest.mark.parametrize("cap", [2_000_000, 0])
def test_ntile_matches_single_pass_under_skew(ray_session, cap):
    """NTILE(4) ordered by (value, id) under the same skew; SQL fill
    rule (first n%k tiles take the extra row). Small groups (n < k)
    exercise the base==0 branch."""
    import ray.data as rd

    from k_gap_ray.functions.windows import ntile_bucketed

    rng = np.random.RandomState(13)
    n = 3000
    grp = np.where(rng.rand(n) < 0.6, "HOT", rng.choice(list("ABCD"), n))
    val = np.round(rng.rand(n) * 100, 2)
    df = pd.DataFrame({"rid": np.arange(n, dtype="int64"),
                       "grp": grp, "val": val})
    # a 2-row group: n < k
    df = pd.concat([df, pd.DataFrame({
        "rid": [n, n + 1], "grp": ["TINY", "TINY"],
        "val": [5.0, 1.0]})], ignore_index=True)

    out = ntile_bucketed(
        rd.from_arrow(pa.Table.from_pandas(df)), key_col="grp",
        value_col="val", id_col="rid", k=4, out_col="q", scale=100,
        bucket_width=64, broadcast_cap=cap).take_all()
    mine = {r["rid"]: r["q"] for r in out}

    ref = {}
    for _, g in df.groupby("grp"):
        v = np.rint(g["val"].to_numpy() * 100).astype("int64")
        g = g.assign(_v=v).sort_values(["_v", "rid"], kind="mergesort")
        m, k = len(g), 4
        base, rem = divmod(m, k)
        sizes = [base + 1] * rem + [base] * (k - rem)
        tiles = np.repeat(np.arange(1, k + 1, dtype=np.int64), sizes)
        for rid, t in zip(g["rid"], tiles):
            ref[int(rid)] = int(t)
    assert len(mine) == len(df) and mine == ref


def test_chain_merge_folds_sessions_spanning_many_batches():
    """Driver-side seam stitch in isolation: one user's session split
    across FOUR batch boundaries must fold into one row; a gap wider
    than the threshold must not merge; different keys never merge."""
    from k_gap_ray.functions.windows import _chain_merge_sessions

    gap = 2 * 3_600_000_000
    h = 3_600_000_000
    rows = [
        # user 1: four boundary fragments, each 1h after the previous
        {"k": 1, "start_us": 0 * h, "end_us": 1 * h,
         "n_events": 2, "value_s": 10},
        {"k": 1, "start_us": 2 * h, "end_us": 3 * h,
         "n_events": 1, "value_s": 5},
        {"k": 1, "start_us": 4 * h, "end_us": 5 * h,
         "n_events": 3, "value_s": 7},
        {"k": 1, "start_us": 6 * h, "end_us": 6 * h,
         "n_events": 1, "value_s": 1},
        # user 1 again after a 10h gap: separate session
        {"k": 1, "start_us": 16 * h, "end_us": 17 * h,
         "n_events": 2, "value_s": 4},
        # user 2 adjacent in time to user 1's chain: never merges
        {"k": 2, "start_us": 5 * h, "end_us": 5 * h,
         "n_events": 1, "value_s": 9},
    ]
    out = _chain_merge_sessions(rows, "k", gap)
    assert len(out) == 3
    merged = [r for r in out if r["k"] == 1 and r["start_us"] == 0][0]
    assert merged["end_us"] == 6 * h
    assert merged["n_events"] == 7 and merged["value_s"] == 23
