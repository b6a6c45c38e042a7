"""Property tests for the sort+seam driver-side helpers: the
boundary-session chain merge (windows._chain_merge_sessions) and the
two-key searchsorted gate (funnel._pair_searchsorted) — the two pure
functions every seam-stitched operator's exactness rests on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from k_gap_ray.functions.funnel import _pair_searchsorted
from k_gap_ray.functions.windows import _chain_merge_sessions

_pairs = st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)),
                  min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(_pairs, _pairs)
def test_pair_searchsorted_matches_bruteforce(feas, queries):
    feas = sorted(set(feas))
    pu = np.array([u for u, _ in feas], dtype=np.int64)
    pt = np.array([t for _, t in feas], dtype=np.int64)
    us = np.array([u for u, _ in queries], dtype=np.int64)
    ts = np.array([t for _, t in queries], dtype=np.int64)
    got = _pair_searchsorted(pu, pt, us, ts)
    for i, (u, t) in enumerate(queries):
        want = sum(1 for p in feas if p < (u, t))
        assert got[i] == want, (u, t, got[i], want)


_sessions = st.lists(
    st.tuples(st.integers(0, 3),          # key
              st.integers(0, 100),        # start
              st.integers(0, 20),         # duration
              st.integers(1, 5),          # n_events
              st.integers(-10, 10)),      # value_s
    min_size=0, max_size=25)


@settings(max_examples=200, deadline=None)
@given(_sessions, st.integers(0, 15))
def test_chain_merge_invariants(rows, gap):
    rows = [{"k": k, "start_us": s, "end_us": s + d,
             "n_events": n, "value_s": v}
            for k, s, d, n, v in rows]
    out = _chain_merge_sessions([dict(r) for r in rows], "k", gap)
    # totals preserved per key
    for key in {r["k"] for r in rows}:
        assert sum(r["n_events"] for r in out if r["k"] == key) \
            == sum(r["n_events"] for r in rows if r["k"] == key)
        assert sum(r["value_s"] for r in out if r["k"] == key) \
            == sum(r["value_s"] for r in rows if r["k"] == key)
    # output sorted per key with no mergeable adjacent pair left
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for rs in by_key.values():
        assert rs == sorted(rs, key=lambda r: (r["start_us"],
                                               r["end_us"]))
        for a, b in zip(rs, rs[1:]):
            assert b["start_us"] - a["end_us"] > gap
    # every output interval covers its inputs (start from an input,
    # end >= max merged end)
    in_starts = {(r["k"], r["start_us"]) for r in rows}
    for r in out:
        assert (r["k"], r["start_us"]) in in_starts
