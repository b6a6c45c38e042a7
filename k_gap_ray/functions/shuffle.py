"""Seeded epoch shuffle: deterministic corpus permutation + shards.

Training pipelines re-order the corpus every epoch and split it into
worker shards. Done naively (`random_shuffle`, or a driver-side
permutation array) this is either non-reproducible or O(corpus) on
one node. Here the permutation key is a seeded 31-bit integer mix of
the row id — exactly mirrorable in SQL because every step keeps
intermediates under 2**62 (DuckDB BIGINT has no wraparound; a 64-bit
multiplicative mix would overflow it) — and the global positions come
from the same bucket-and-carry shape as functions/windows.py: the
hash domain is range-bucketed, each bucket ranks locally in one task,
and a tiny per-bucket summary (≤ N_BUCKETS rows, independent of
corpus size) prefix-sums into carry offsets on the driver. Shard
assignment applies SQL's NTILE fill rule (the first n%k shards take
one extra row) vectorized from the patched positions.

100-TB shape: one vectorized map_batches (key+bucket), ONE
groupby(bucket) shuffle whose groups are uniform by construction (the
mix is uniform on [0, 2**31) — no hot key can exist), a driver carry
of at most N_BUCKETS summary rows, and a broadcast patch. Different
seeds give unrelated permutations, so epoch k is `epoch_shuffle(ds,
seed=k)` with no state carried between epochs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_M = 1 << 31
_A1, _A2, _A3 = 1103515245, 784588715, 367413989
#: bucket count over the 31-bit hash domain; uniform mix -> uniform
#: buckets of ~n/N_BUCKETS rows each
N_BUCKETS = 1 << 13
_SHIFT = 31 - 13


def _mix(ids: np.ndarray, seed: int) -> np.ndarray:
    """Seeded 31-bit integer mix, numpy int64 (products < 2**62)."""
    x = ids.astype(np.int64) % _M
    x = (x * _A1 + seed) % _M
    x ^= x >> 15
    x = (x * _A2) % _M
    x ^= x >> 13
    x = (x * _A3) % _M
    x ^= x >> 16
    return x


def _mix_sql(col: str, seed: int) -> str:
    """The same mix as a DuckDB expression tree (xor / >> / %)."""
    x = f"(({col} % {_M}) * {_A1} + {seed}) % {_M}"
    x = f"xor({x}, ({x}) >> 15)"
    x = f"(({x}) * {_A2}) % {_M}"
    x = f"xor({x}, ({x}) >> 13)"
    x = f"(({x}) * {_A3}) % {_M}"
    x = f"xor({x}, ({x}) >> 16)"
    return x


def epoch_shuffle(ds, id_col: str, seed: int, n_shards: int,
                  summary_cap: int = 2_000_000):
    """-> Dataset[(id_col, pos, shard)]: the seeded permutation.

    ``pos`` is the row's 1-based position in the shuffled order
    (ORDER BY mix(id), id — the id tiebreak makes colliding 31-bit
    keys deterministic), ``shard`` its NTILE(n_shards) bucket in that
    order. Exactly equal to the SQL from :func:`sql_epoch_shuffle`.
    """
    import ray

    if not 0 <= seed < _M:
        raise ValueError(f"seed must be in [0, 2**31), got {seed}")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")

    def key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        v = _mix(ids, seed)
        return pa.table({id_col: t.column(id_col),
                         "__v": pa.array(v, pa.int64()),
                         "__b": pa.array(v >> _SHIFT, pa.int64())})

    keyed = ds.map_batches(key, batch_format="pyarrow")

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__v", id_col], kind="mergesort")
        data = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "__local": np.arange(1, len(df) + 1, dtype="int64"),
            "__b": df["__b"].iloc[0],
            "__kind": 0,
        })
        summary = data.iloc[:1].copy()
        summary["__local"] = np.int64(len(df))  # bucket row count
        summary["__kind"] = 1
        return pd.concat([data, summary], ignore_index=True)

    both = keyed.groupby("__b").map_groups(
        local, batch_format="pandas").materialize()
    summaries = both.filter(expr="__kind == 1").take_all()
    if len(summaries) > summary_cap:  # N_BUCKETS by construction
        raise NotImplementedError(
            f"summary table exceeds cap ({len(summaries)})")
    counts: dict[int, int] = {int(r["__b"]): int(r["__local"])
                              for r in summaries}
    total, carry = 0, {}
    for b in sorted(counts):
        carry[b] = total
        total += counts[b]
    bks = pa.array(list(carry.keys()), pa.int64())
    bvs = pa.array(list(carry.values()), pa.int64())
    ref = ray.put((bks, bvs, total))

    # NTILE fill rule: the first n % k shards hold ceil(n/k) rows
    size_small, n_big = divmod(total, n_shards)
    cut = (size_small + 1) * n_big  # rows living in the big shards

    def patch(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _r

        t = t.filter(pc.equal(t.column("__kind"), pa.scalar(0)))
        ks, vs, _n = _r.get(_ref)
        idx = pc.index_in(t.column("__b"), value_set=ks)
        pos = pc.add(t.column("__local"),
                     pc.fill_null(pc.take(vs, idx), 0))
        p = pos.to_numpy(zero_copy_only=False)
        shard = np.where(
            p <= cut,
            (p - 1) // (size_small + 1) + 1,
            n_big + (p - cut - 1) // max(size_small, 1) + 1)
        return pa.table({id_col: t.column(id_col),
                         "pos": pa.array(p, pa.int64()),
                         "shard": pa.array(shard, pa.int64())})

    return both.map_batches(patch, batch_format="pyarrow")


def stratified_cap(ds, key_col: str, id_col: str, cap: int,
                   seed: int = 0):
    """Per-stratum cap sampling: keep at most ``cap`` rows per
    ``key_col`` value, chosen deterministically as the lowest seeded
    31-bit ``mix(id)`` (id tiebreak) within the stratum — the
    "cap every domain/language at K docs" balancing move a web corpus
    makes before training, reproducible across runs and engines.

    100-TB shape: a vectorized per-batch prune first discards all but
    the ``cap`` best rows per key PER BATCH (run-length over one
    lexsort, no Python loop), so the single groupby(key) shuffle moves
    at most ``cap * n_batches`` rows per key — bounded regardless of
    stratum skew — and the final per-group head() sees pre-pruned
    groups.  -> Dataset[(id_col, key_col)] survivors.
    """
    if not 0 <= seed < _M:
        raise ValueError(f"seed must be in [0, 2**31), got {seed}")
    if cap <= 0:
        raise ValueError("cap must be positive")

    def prune(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        v = _mix(ids, seed)
        enc = pc.dictionary_encode(t.column(key_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ids, v, codes))
        sc = codes[order]
        new_run = np.r_[True, sc[1:] != sc[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        pos_in_run = np.arange(len(order)) - starts[run_id]
        keep = order[pos_in_run < cap]
        return pa.table({
            id_col: t.column(id_col).take(pa.array(keep)),
            key_col: t.column(key_col).take(pa.array(keep)),
            "__v": pa.array(v[keep], pa.int64())})

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__v", id_col], kind="mergesort").head(cap)
        return df[[id_col, key_col]]

    return pruned.groupby(key_col).map_groups(
        head, batch_format="pandas")


def sql_stratified_cap(cap: int, seed: int = 0,
                       table: str = "documents",
                       key_col: str = "lang",
                       id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`stratified_cap`: the same per-stratum
    rank via a window function."""
    return f"""
        SELECT {id_col}, {key_col} FROM (
            SELECT {id_col}, {key_col},
                   row_number() OVER (
                       PARTITION BY {key_col}
                       ORDER BY {_mix_sql(id_col, seed)} ASC,
                                {id_col} ASC) AS r
            FROM {table})
        WHERE r <= {int(cap)}
    """


def sql_epoch_shuffle(seed: int, n_shards: int,
                      table: str = "documents",
                      id_col: str = "doc_id") -> str:
    """DuckDB oracle: the same permutation via window functions."""
    return f"""
        WITH k AS (SELECT {id_col}, {_mix_sql(id_col, seed)} AS v
                   FROM {table})
        SELECT {id_col},
               ROW_NUMBER() OVER (ORDER BY v, {id_col}) AS pos,
               CAST(NTILE({n_shards}) OVER (ORDER BY v, {id_col})
                    AS BIGINT) AS shard
        FROM k
    """
