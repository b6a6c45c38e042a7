"""Market-basket association rules: co-occurrence support, confidence
and lift over (basket, item) pairs — the classic recommendation /
affinity-analysis reduction ("parts bought together").

Exact-integer score contract (pinned on BOTH engines):

    support(a, b)   = # baskets containing both (a < b)
    conf_permille   = (support * 1000) // c_a
    lift_scaled     = ((support * 1000) // c_a) * n_baskets // c_b

with ``c_x`` the basket count of item x and the NESTED division
keeping every intermediate <= 1000 * n_baskets — int64-exact to
~4.6e15 baskets (the PMI trick from functions/colloc.py).

Shape (no per-basket task, no seams): distinct (basket, item) pairs
ride ONE composite int key; co-occurrence forms by a DISTRIBUTED SELF
HASH JOIN on the basket key filtered to ``item_a < item_b`` — the
fan-out is sum(basket_size^2), bounded by real basket sizes, and a
hot basket is just join rows, never one task.  Pair counts pre-reduce
per batch before the single pair-keyed groupby; item counts attach by
broadcast below ``broadcast_cap`` distinct items (the common case —
item vocabularies are dimension-sized) and the basket total is an
O(blocks) driver merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ITEM_BITS = 21          # composite keys: item < 2^21, basket < 2^42


def _distinct_pairs(ds, basket_col: str, item_col: str):
    """Dataset -> distinct (basket, item) via one composite-key
    groupby (per-batch np.unique partial first)."""

    def part(t: pa.Table) -> pa.Table:
        b = pc.cast(t.column(basket_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        i = pc.cast(t.column(item_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(b) and (b.min() < 0 or b.max() >= 1 << (63 - _ITEM_BITS)
                       or i.min() < 0 or i.max() >= 1 << _ITEM_BITS):
            raise ValueError("basket/item outside composite-key range")
        ck = np.unique((b << _ITEM_BITS) | i)
        return pa.table({"ck": pa.array(ck, pa.int64())})

    return (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("ck").count())


def association_rules(ds, basket_col: str, item_col: str, k: int = 20,
                      min_support: int = 2,
                      broadcast_cap: int = 2_000_000) -> pa.Table:
    """Top-``k`` item pairs by (support desc, item_a, item_b) with
    integer confidence and lift.  -> pa.Table (item_a, item_b,
    support, c_a, c_b, conf_permille, lift_scaled)."""
    import ray
    from ray.data.aggregate import Sum

    from ..dsutil import drop_empty_blocks, join_datasets

    # scrub ONCE here (groupby output): downstream rebuild maps can't
    # introduce empty-schema blocks, so the join needs no per-side scrub
    pp = drop_empty_blocks(
        _distinct_pairs(ds, basket_col, item_col).materialize())

    def decomp(name_b: str, name_i: str):
        def f(t: pa.Table) -> pa.Table:
            ck = t.column("ck").to_numpy(zero_copy_only=False)
            return pa.table({
                name_b: pa.array(ck >> _ITEM_BITS, pa.int64()),
                name_i: pa.array(ck & ((1 << _ITEM_BITS) - 1),
                                 pa.int64())})
        return f

    left = pp.map_batches(decomp("bk", "ia"), batch_format="pyarrow")
    right = pp.map_batches(decomp("bk", "ib"), batch_format="pyarrow")
    j = join_datasets(left, right, on="bk",
                      scrub_left=False, scrub_right=False)

    def pair_partial(t: pa.Table) -> pa.Table:
        ia = t.column("ia").to_numpy(zero_copy_only=False)
        ib = t.column("ib").to_numpy(zero_copy_only=False)
        m = ia < ib
        pk = (ia[m] << _ITEM_BITS) | ib[m]
        keys, n = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(keys, pa.int64()),
                         "n_p": pa.array(n, pa.int64())})

    pairs = (j.map_batches(pair_partial, batch_format="pyarrow")
             .groupby("pk").aggregate(Sum("n_p", alias_name="support")))
    if min_support > 1:
        pairs = pairs.filter(expr=f"support >= {min_support}")
    top = (pairs.sort(["support", "pk"], descending=[True, False])
           .limit(k).take_all())

    # item basket-counts ONLY for items in the top-k pairs (<= 2k
    # items): filter the distinct stream against the broadcast set —
    # no vocabulary-scale groupby (the bigram_lm attach trick)
    want_items = sorted({(int(r["pk"]) >> _ITEM_BITS) for r in top}
                        | {(int(r["pk"]) & ((1 << _ITEM_BITS) - 1))
                           for r in top})
    want_ref = ray.put(np.array(want_items, dtype=np.int64))

    def item_partial(t: pa.Table, _ref=want_ref) -> pa.Table:
        import ray as _r

        want = _r.get(_ref)
        items = (t.column("ck").to_numpy(zero_copy_only=False)
                 & ((1 << _ITEM_BITS) - 1))
        pos = np.searchsorted(want, items)
        pos_c = np.clip(pos, 0, max(len(want) - 1, 0))
        hit = (len(want) > 0) & (want[pos_c] == items)
        it, n = np.unique(items[hit], return_counts=True)
        return pa.table({"item": pa.array(it, pa.int64()),
                         "n_p": pa.array(n, pa.int64())})

    c_map: dict[int, int] = {}
    for r in pp.map_batches(item_partial,
                            batch_format="pyarrow").take_all():
        c_map[r["item"]] = c_map.get(r["item"], 0) + int(r["n_p"])

    # distinct baskets: per-batch unique partials merged on the driver
    # under the cap (pp rows are globally distinct pairs, so per-batch
    # basket ids only duplicate ACROSS batches)
    bk_parts = pp.map_batches(
        lambda t: pa.table({"bk": pa.array(np.unique(
            t.column("ck").to_numpy(zero_copy_only=False)
            >> _ITEM_BITS), pa.int64())}),
        batch_format="pyarrow").take_all()
    if len(bk_parts) > broadcast_cap:
        raise NotImplementedError(
            "per-batch distinct baskets exceed broadcast_cap; wire "
            "the groupby count path")
    n_baskets = int(len(np.unique(
        np.array([r["bk"] for r in bk_parts], dtype=np.int64))))

    rows = []
    for r in top:
        a = int(r["pk"]) >> _ITEM_BITS
        b = int(r["pk"]) & ((1 << _ITEM_BITS) - 1)
        s, ca, cb = int(r["support"]), c_map[a], c_map[b]
        conf = (s * 1000) // ca
        rows.append((a, b, s, ca, cb, conf, conf * n_baskets // cb))
    return pa.table({
        "item_a": pa.array([r[0] for r in rows], pa.int64()),
        "item_b": pa.array([r[1] for r in rows], pa.int64()),
        "support": pa.array([r[2] for r in rows], pa.int64()),
        "c_a": pa.array([r[3] for r in rows], pa.int64()),
        "c_b": pa.array([r[4] for r in rows], pa.int64()),
        "conf_permille": pa.array([r[5] for r in rows], pa.int64()),
        "lift_scaled": pa.array([r[6] for r in rows], pa.int64())})


def sql_association_rules(basket_col: str, item_col: str, k: int = 20,
                          min_support: int = 2,
                          rel: str = "lineitem") -> str:
    """DuckDB mirror of :func:`association_rules` — same composite
    pair-key tiebreak, same nested integer divisions."""
    return f"""
    WITH pp AS (SELECT DISTINCT {basket_col} AS bk, {item_col} AS it
                FROM {rel}),
    pairs AS (
      SELECT a.it AS ia, b.it AS ib, count(*)::BIGINT AS support
      FROM pp a JOIN pp b ON a.bk = b.bk AND a.it < b.it
      GROUP BY 1, 2
      HAVING count(*) >= {min_support}),
    topk AS (
      SELECT ia, ib, support FROM pairs
      ORDER BY support DESC, ia * {1 << _ITEM_BITS} + ib ASC
      LIMIT {k}),
    ic AS (SELECT it, count(*)::BIGINT AS c FROM pp GROUP BY 1),
    nb AS (SELECT count(DISTINCT bk)::BIGINT AS n FROM pp)
    SELECT t.ia AS item_a, t.ib AS item_b, t.support,
           ca.c AS c_a, cb.c AS c_b,
           (t.support * 1000) // ca.c AS conf_permille,
           ((t.support * 1000) // ca.c) * nb.n // cb.c AS lift_scaled
    FROM topk t
    JOIN ic ca ON t.ia = ca.it
    JOIN ic cb ON t.ib = cb.it
    CROSS JOIN nb
    ORDER BY t.support DESC, t.ia, t.ib
    """
