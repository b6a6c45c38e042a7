"""Exact distributed quantiles over an integer column.

The 100-TB shape: per-batch ``pyarrow.compute.value_counts`` partials
(corpus never leaves the workers), ONE groupby shuffle at
distinct-value scale (a histogram, not the corpus), then a cumulative
walk over the value-sorted histogram streamed through ``iter_batches``
— the driver holds one histogram block at a time, never the corpus
and never the whole histogram.

Tie/position semantics pin DuckDB's ``quantile_disc`` so the SQL
oracle is exact: the q-quantile is the k-th smallest value with
``k = max(1, ceil(q * n))`` (verified empirically against DuckDB
1.x on tied and untied inputs).

Reference parity: the reference exposes dataset statistics reports
(docs/components/sembench.md:229-253); length/score percentiles are
the standard corpus-profiling extension of that report family.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc


def _partial_value_counts(col: str):
    def f(t: pa.Table) -> pa.Table:
        # nulls excluded up front (the SQL aggregate's contract)
        vc = pc.value_counts(
            t.column(col).combine_chunks().drop_null())
        return pa.table({
            "v": pc.cast(vc.field("values"), pa.int64()),
            "c": pc.cast(vc.field("counts"), pa.int64())})

    return f


def exact_quantiles(ds, col: str,
                    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)):
    """Exact discrete quantiles of integer column ``col``.

    Returns a pa.Table (q float64, value int64), one row per requested
    quantile in ascending q order. Nulls in ``col`` are excluded (the
    SQL aggregate's contract). Raises ValueError on an all-null/empty
    input — a quantile of nothing has no SQL row either.
    """
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks

    qs = sorted(qs)
    if not qs or qs[0] <= 0 or qs[-1] > 1:
        raise ValueError("quantiles must lie in (0, 1]")
    hist = (ds.map_batches(_partial_value_counts(col),
                           batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("v").aggregate(Sum("c", alias_name="c"))
            .materialize())
    if hist.count() == 0:
        raise ValueError(f"exact_quantiles: no non-null values in "
                         f"{col!r}")
    hist = drop_empty_blocks(hist)
    n = hist.aggregate(Sum("c", alias_name="n"))["n"]
    # k-th smallest targets (1-indexed), DuckDB quantile_disc contract
    targets = [(q, max(1, math.ceil(q * n))) for q in qs]
    out: list[tuple[float, int]] = []
    cum = 0
    ti = 0
    for batch in hist.sort("v").iter_batches(batch_format="pyarrow"):
        vs = batch.column("v").to_pylist()
        cs = batch.column("c").to_pylist()
        for v, c in zip(vs, cs):
            cum += c
            while ti < len(targets) and targets[ti][1] <= cum:
                out.append((targets[ti][0], v))
                ti += 1
        if ti == len(targets):
            break
    return pa.table({
        "q": pa.array([q for q, _ in out], pa.float64()),
        "value": pa.array([v for _, v in out], pa.int64())})


def grouped_quantiles(ds, key: str, col: str,
                      qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)):
    """Per-group exact discrete quantiles: (key, q, value) rows.

    Same histogram reduction as :func:`exact_quantiles` but keyed: a
    per-batch (key, value)->count partial, then ONE groupby(key)
    shuffle of the partial histograms (groups x per-batch-distinct
    scale, not corpus scale), each group's histogram walked inside
    ``map_groups``. Duplicate (key, v) rows from different batches
    need no pre-merge — after the in-group sort they are adjacent and
    the cumulative walk sums them naturally, which avoids a multi-key
    groupby aggregate (measured slow on this Ray version,
    BENCH/NOTES.md).
    """
    qs = sorted(qs)
    if not qs or qs[0] <= 0 or qs[-1] > 1:
        raise ValueError("quantiles must lie in (0, 1]")

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([key, col]).filter(
            pc.and_(pc.is_valid(t.column(key)),
                    pc.is_valid(t.column(col))))
        g = t.group_by([key, col]).aggregate([([], "count_all")])
        return pa.table({
            key: g.column(key),
            "v": pc.cast(g.column(col), pa.int64()),
            "c": pc.cast(g.column("count_all"), pa.int64())})

    def walk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("v", "ascending")])
        vs = t.column("v").take(idx).to_pylist()
        cs = t.column("c").take(idx).to_pylist()
        n = sum(cs)
        targets = [(q, max(1, math.ceil(q * n))) for q in qs]
        rows_q, rows_v = [], []
        cum, ti = 0, 0
        for v, c in zip(vs, cs):
            cum += c
            while ti < len(targets) and targets[ti][1] <= cum:
                rows_q.append(targets[ti][0])
                rows_v.append(v)
                ti += 1
            if ti == len(targets):
                break
        return pa.table({
            "key": pa.array([str(t.column(key)[0].as_py())]
                            * len(rows_q), pa.string()),
            "q": pa.array(rows_q, pa.float64()),
            "value": pa.array(rows_v, pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key).map_groups(walk, batch_format="pyarrow"))


def grouped_quantiles_sql(key_sql: str, expr_sql: str, rel_sql: str,
                          qs: tuple = (0.25, 0.5, 0.75, 0.9,
                                       0.99)) -> str:
    """DuckDB mirror of :func:`grouped_quantiles`: per-key
    quantile_disc unnested to the same (key, q, value) rows."""
    qlist = ", ".join(str(q) for q in sorted(qs))
    return f"""
        WITH src AS (SELECT {key_sql} AS k, {expr_sql} AS x
                     FROM {rel_sql}
                     WHERE {key_sql} IS NOT NULL
                       AND {expr_sql} IS NOT NULL),
        qd AS (SELECT k, quantile_disc(x, [{qlist}]) AS l
               FROM src GROUP BY k)
        SELECT k AS key, unnest([{qlist}])::DOUBLE AS q,
               unnest(l)::BIGINT AS value
        FROM qd
    """


def quantiles_sql(expr_sql: str, rel_sql: str,
                  qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """The DuckDB mirror: ``quantile_disc`` over ``expr_sql`` computed
    from ``rel_sql`` (a FROM-able relation), unnested to the same
    (q, value) rows as :func:`exact_quantiles`."""
    qlist = ", ".join(str(q) for q in sorted(qs))
    return f"""
        WITH src AS (SELECT {expr_sql} AS x FROM {rel_sql}),
        qd AS (SELECT quantile_disc(x, [{qlist}]) AS l FROM src)
        SELECT unnest([{qlist}])::DOUBLE AS q,
               unnest(l)::BIGINT AS value
        FROM qd
    """
