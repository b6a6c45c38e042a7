"""Distributed range (interval) join — the second time-series join Ray
Data lacks (asof.py is the first).

For each *point* row (key, ts) attach every *interval* row with an
equal key whose window contains the point: ``start <= ts < end``.
INNER semantics — points matching no window are dropped, one output
row per (point, window) pair, exactly the SQL
``JOIN ... ON p.key = w.key AND p.ts >= w.start AND p.ts < w.end``
(the catalog oracle).

Plan (Ray-Data-first, mirrors asof.py): both sides are widened to one
schema with a side tag; intervals are REPLICATED into every
time-bucket they overlap (``floor(ts / granularity)``); points land in
exactly one bucket, so each (point, window) pair meets in exactly one
group and needs no post-join dedup. ONE hash shuffle on the composite
``key\\x1fbucket`` string key (single-key groupby per BENCH/NOTES.md),
then a per-group vectorized match: intervals sorted by start once,
``np.searchsorted`` prefix + an end-mask — no per-row Python, no
driver state.

Partitioning assumptions (custom-operator contract):
- one (key, bucket) group fits a worker — pick ``granularity`` near
  the typical window length so an interval replicates into ~2 buckets;
- windows much longer than ``granularity`` replicate; a window longer
  than ``max_span`` buckets raises (guard against a runaway
  full-history interval silently exploding the shuffle);
- a corpus-scale hot (key, bucket) needs upstream salting, as with
  any groupby.

Reference parity: k-gap expresses time-window containment as SPARQL
FILTER over xsd:dateTime ranges (/root/reference/docs/
advanced-topics.md:330-340); this operator is the join-shaped
generalization a Ray pipeline needs for event-in-window analytics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"


def _ts_int(col) -> pa.ChunkedArray:
    return pc.cast(col, pa.int64())


def range_join(points_ds, intervals_ds, on: str, point_ts: str = "ts",
               start: str = "win_start", end: str = "win_end",
               right_cols: list[str] | None = None, suffix: str = "_w",
               granularity_us: int = 86_400_000_000, max_span: int = 64):
    """Join point rows to every same-key interval containing them.

    Returns all point columns + ``right_cols`` (suffixed on collision)
    + ``start``/``end`` (suffixed) as int64 ticks of the matched
    window. ``granularity_us`` is the bucket width in the ts column's
    int64 unit (microseconds for timestamp[us]).
    """
    if granularity_us <= 0:
        raise ValueError("range_join: granularity_us must be positive")
    p_schema = points_ds.schema()
    i_schema = intervals_ds.schema()
    pcols = list(p_schema.names)
    if right_cols is None:
        right_cols = [c for c in i_schema.names if c not in (on, start, end)]
    p_types = dict(zip(p_schema.names, p_schema.types))
    i_types = dict(zip(i_schema.names, i_schema.types))
    out_rcols = {c: (c + suffix if c in pcols else c) for c in right_cols}
    out_start = start + suffix if start in pcols else start
    out_end = end + suffix if end in pcols else end

    def composite(key_col, bucket: np.ndarray):
        return pc.binary_join_element_wise(
            pc.cast(key_col, pa.string()),
            pa.array(bucket.astype("U"), type=pa.string()), _SEP)

    def widen_points(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = _ts_int(t.column(point_ts)).to_numpy(zero_copy_only=False)
        bucket = ts // granularity_us
        cols = {"__k": composite(t.column(on), bucket),
                "__side": pa.array(np.zeros(n, np.int8)),
                "__ts": pa.array(ts)}
        for c in pcols:
            cols["l_" + c] = t.column(c)
        for c in right_cols:
            cols["r_" + c] = pa.nulls(n, i_types[c])
        cols["r__s"] = pa.nulls(n, pa.int64())
        cols["r__e"] = pa.nulls(n, pa.int64())
        return pa.table(cols)

    def widen_intervals(t: pa.Table) -> pa.Table:
        s = _ts_int(t.column(start)).to_numpy(zero_copy_only=False)
        e = _ts_int(t.column(end)).to_numpy(zero_copy_only=False)
        if len(s) and np.any(e < s):
            raise ValueError("range_join: interval end < start")
        b0 = s // granularity_us
        # end is exclusive: a window ending exactly on a bucket edge
        # does not reach into the next bucket
        b1 = np.maximum(e - 1, s) // granularity_us
        span = b1 - b0 + 1
        if len(span) and span.max() > max_span:
            raise ValueError(
                f"range_join: an interval spans {int(span.max())} buckets "
                f"(> max_span={max_span}); raise granularity_us or split "
                "the window upstream")
        rep = pa.array(np.repeat(np.arange(len(s)), span))
        bucket = b0.repeat(span) + _concat_ranges(span)
        rt = t.take(rep)
        n = rt.num_rows
        cols = {"__k": composite(rt.column(on), bucket),
                "__side": pa.array(np.ones(n, np.int8)),
                "__ts": pa.array(np.zeros(n, np.int64))}
        for c in pcols:
            cols["l_" + c] = pa.nulls(n, p_types[c])
        for c in right_cols:
            cols["r_" + c] = rt.column(c)
        cols["r__s"] = pa.array(s.repeat(span))
        cols["r__e"] = pa.array(e.repeat(span))
        return pa.table(cols)

    merged = (points_ds.map_batches(widen_points, batch_format="pyarrow",
                                    zero_copy_batch=True)
              .union(intervals_ds.map_batches(widen_intervals,
                                              batch_format="pyarrow",
                                              zero_copy_batch=True)))

    def match(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        p_idx = np.flatnonzero(side == 0)
        w_idx = np.flatnonzero(side == 1)
        out_schema = ([(c, p_types[c]) for c in pcols]
                      + [(out_rcols[c], i_types[c]) for c in right_cols]
                      + [(out_start, pa.int64()), (out_end, pa.int64())])
        if len(p_idx) == 0 or len(w_idx) == 0:
            return pa.table({n: pa.nulls(0, t) for n, t in out_schema})
        ts = g.column("__ts").to_numpy(zero_copy_only=False)[p_idx]
        ws = g.column("r__s").to_numpy(zero_copy_only=False)[w_idx]
        we = g.column("r__e").to_numpy(zero_copy_only=False)[w_idx]
        order = np.argsort(ws, kind="stable")
        ws, we, w_idx = ws[order], we[order], w_idx[order]
        # candidates: all windows with start <= ts (sorted prefix),
        # then mask end > ts. Expansion is bounded by the group (one
        # key x one granularity bucket).
        counts = np.searchsorted(ws, ts, side="right")
        p_rep = np.repeat(np.arange(len(p_idx)), counts)
        cand = _concat_ranges(counts)
        keep = we[cand] > ts[p_rep]
        p_rep, cand = p_rep[keep], cand[keep]
        lt = g.take(pa.array(p_idx[p_rep]))
        wt = g.take(pa.array(w_idx[cand]))
        out = {c: lt.column("l_" + c) for c in pcols}
        for c in right_cols:
            out[out_rcols[c]] = wt.column("r_" + c)
        out[out_start] = wt.column("r__s")
        out[out_end] = wt.column("r__e")
        return pa.table(out)

    return merged.groupby("__k").map_groups(match, batch_format="pyarrow")


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """[3,1,2] -> [0,1,2, 0, 0,1] without a Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts = np.cumsum(counts) - counts
    return np.arange(total) - np.repeat(starts, counts)
