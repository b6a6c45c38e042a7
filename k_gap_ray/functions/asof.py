"""Distributed as-of join — the time-series join Ray Data lacks.

For each left row, attach the right row with an equal key and the
greatest right timestamp <= the left timestamp (``strict=True`` for
<). LEFT-outer semantics: unmatched left rows null-fill the attached
columns. Mirrors DuckDB's ``ASOF LEFT JOIN`` (the SQL oracle used by
the catalog query).

Plan: both sides are widened to one schema with a side tag, then ONE
hash shuffle groups by key and a per-group vectorized match runs one
lexsort + searchsorted — no per-row Python, no driver state.

Partitioning assumption (document per the custom-operator contract):
one key's rows fit a worker — the standard asof contract. A single
corpus-scale hot key needs upstream salting (e.g. bucket by coarse
time range first, then asof within buckets with boundary overlap).

Right-side contract: at most one row per (key, ts) — pre-aggregate
duplicates upstream (the catalog query takes max(value)); ties would
otherwise make "the" matched row ill-defined on any backend.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left_ds, right_ds, on: str, left_ts: str = "ts",
              right_ts: str = "ts", right_cols: list[str] | None = None,
              suffix: str = "_r", strict: bool = False):
    """Backward as-of join of two Datasets on ``on`` by timestamps.

    Returns left columns + ``right_cols`` (renamed with ``suffix`` on
    collision) + ``{right_ts}{suffix}`` (the matched timestamp)."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    lcols = list(left_schema.names)
    if right_cols is None:
        right_cols = [c for c in right_schema.names
                      if c not in (on, right_ts)]
    out_rcols = {c: (c + suffix if c in lcols else c) for c in right_cols}
    out_rts = right_ts + suffix

    def ts_int(col):
        t = col.type
        if pa.types.is_timestamp(t):
            return col.cast(pa.int64())
        return col.cast(pa.int64())

    l_arrow = dict(zip(left_schema.names, left_schema.types))
    r_arrow = dict(zip(right_schema.names, right_schema.types))

    def widen_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__key": t.column(on), "__ts": ts_int(t.column(left_ts)),
                "__side": pa.array(np.zeros(n, np.int8))}
        for c in lcols:
            cols["l_" + c] = t.column(c)
        for c in right_cols:
            cols["r_" + c] = pa.nulls(n, r_arrow[c])
        cols["r__ts"] = pa.nulls(n, r_arrow[right_ts])
        return pa.table(cols)

    def widen_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__key": t.column(on), "__ts": ts_int(t.column(right_ts)),
                "__side": pa.array(np.ones(n, np.int8))}
        for c in lcols:
            cols["l_" + c] = pa.nulls(n, l_arrow[c])
        for c in right_cols:
            cols["r_" + c] = t.column(c)
        cols["r__ts"] = t.column(right_ts)
        return pa.table(cols)

    merged = (left_ds.map_batches(widen_left, batch_format="pyarrow",
                                  zero_copy_batch=True)
              .union(right_ds.map_batches(widen_right,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)))

    side_kw = "left" if strict else "right"

    def match(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        ts = g.column("__ts").to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        out = {}
        lt = g.take(pa.array(l_idx))
        for c in lcols:
            out[c] = lt.column("l_" + c)
        if len(r_idx) == 0:
            for c in right_cols:
                out[out_rcols[c]] = pa.nulls(len(l_idx), r_arrow[c])
            out[out_rts] = pa.nulls(len(l_idx), r_arrow[right_ts])
            return pa.table(out)
        r_order = r_idx[np.argsort(ts[r_idx], kind="stable")]
        rts_sorted = ts[r_order]
        pos = np.searchsorted(rts_sorted, ts[l_idx], side=side_kw) - 1
        matched = pos >= 0
        # unmatched rows point at slot 0, then get nulled by the mask
        take_idx = r_order[np.where(matched, pos, 0)]
        rt = g.take(pa.array(take_idx))
        mask = pa.array(matched)
        for c in right_cols:
            out[out_rcols[c]] = pc.if_else(
                mask, rt.column("r_" + c).combine_chunks(),
                pa.scalar(None, r_arrow[c]))
        out[out_rts] = pc.if_else(
            mask, rt.column("r__ts").combine_chunks(),
            pa.scalar(None, r_arrow[right_ts]))
        return pa.table(out)

    return merged.groupby("__key").map_groups(match,
                                              batch_format="pyarrow")
