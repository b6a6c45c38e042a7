"""Bloom-filter accelerated semi / anti joins (J3/J4 scale path).

A Bloom filter built from the right side's join keys is broadcast once
(``ray.put``) and probed vectorized inside ``map_batches``, so the big
left side is pre-filtered BEFORE any shuffle: at 100-TB scale the
exchange then carries only the (small) maybe-matching subset instead
of every left row. False positives are removed by the exact hash join
that follows (semi), or routed through it (anti) — the result is
therefore EXACTLY the plain semi / anti join, and the driver gate
verifies it against the plain ``IN`` / ``NOT IN`` SQL oracle
(``q_bloom_semi_join``).

Reference parity: the J3/J4 existence joins of
``docs/components/jupyter.md:556-566,596`` — this module is their
documented shuffle-avoidance path, not a new semantics.

Build shape: each input block contributes a partial bitmap; the
partials are OR-reduced on the driver (one 128 KiB bitmap per block at
the default ``n_bits = 2^20``). For right sides past ~10^7 distinct
keys, raise ``n_bits`` (1.25 MiB per 10x) or swap the driver OR for a
tree-reduce — the broadcast object itself stays a single bitmap either
way. Hashing is the repo's deterministic rolling-codepoint hash
(functions/textstats.py:hash_tokens) with two independent (base, mod)
pairs combined by double hashing, so filters are bit-identical across
runs and processes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from k_gap_ray.functions.textstats import (
    H1_BASE,
    H1_MOD,
    H2_BASE,
    H2_MOD,
    hash_tokens,
)


def _positions(keys, n_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions per key via double hashing h1 + i*h2."""
    h1 = hash_tokens(keys, H1_BASE, H1_MOD)
    h2 = hash_tokens(keys, H2_BASE, H2_MOD) | np.uint64(1)  # odd stride
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)


def _key_col(t: pa.Table, col: str):
    c = t.column(col)
    if c.null_count:
        # NULL join keys are rejected up front: SQL's NOT IN returns
        # NULL (drops the row / empties the result) where a hash probe
        # would keep it — refusing beats silently diverging from the
        # documented sql_semi_join oracle contract
        raise ValueError(f"bloom join key column {col!r} contains nulls")
    return pc.cast(c, pa.string()).combine_chunks()


def build_bloom(ds, col: str, n_bits: int = 1 << 20,
                k: int = 4) -> np.ndarray:
    """Build the bitmap (uint8 array of n_bits/8 bytes) from a key
    column; per-block partials, OR-reduced at the driver."""
    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_bits // 8, np.uint8)
        if t.num_rows:
            pos = _positions(_key_col(t, col), n_bits, k)
            np.bitwise_or.at(bits, (pos >> 3).astype(np.int64),
                             np.left_shift(
                                 np.uint8(1),
                                 (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    bits = np.zeros(n_bits // 8, np.uint8)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        bits |= np.frombuffer(row["bitmap"], np.uint8)
    return bits


def _probe_mask(keys, bits: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """Boolean membership mask (false positives possible, no false
    negatives) for a key array against a built bitmap."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, bool)
    pos = _positions(keys, n_bits, k)
    byte = bits[(pos >> 3).astype(np.int64)]
    hit = (np.right_shift(byte, (pos & np.uint64(7)).astype(np.uint8))
           & np.uint8(1)).astype(bool)
    return hit.all(axis=0)


def bloom_semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
                    anti: bool = False, n_bits: int = 1 << 20, k: int = 4,
                    num_partitions: int | None = None):
    """Exact semi join (``anti=False``: left rows WITH a right match)
    or anti join (``anti=True``: left rows WITHOUT one), Bloom-
    pre-filtered.

    Semi: rows failing the Bloom probe are definite non-matches and
    never reach the shuffle; the surviving "maybe" subset goes through
    one exact join against the DISTINCT right key set. Anti: Bloom
    misses are definite KEEPS emitted directly; only the maybe subset
    pays the exact anti join. The maybe subset is materialized once
    (it is the small side by design — that is the point of the
    filter); everything upstream streams.

    Join keys must be NON-NULL on both sides (enforced — a null key
    raises): SQL's three-valued NOT IN drops null-key rows and empties
    entirely on a null right key, where a hash probe would keep them;
    refusing keeps the sql_semi_join oracle contract exact.
    """
    import ray

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    right_on = right_on or on
    bits = build_bloom(right_ds, right_on, n_bits=n_bits, k=k)
    ref = ray.put(bits)

    def probe(keep_hits: bool):
        def f(t: pa.Table) -> pa.Table:
            import ray as _r

            b = _r.get(ref)
            m = _probe_mask(_key_col(t, on), b, n_bits, k)
            return t.filter(pa.array(m if keep_hits else ~m))

        return f

    maybe = drop_empty_blocks(
        left_ds.map_batches(probe(True), batch_format="pyarrow")
        .materialize())
    if anti:
        definite = left_ds.map_batches(probe(False), batch_format="pyarrow")
        if maybe.count() == 0:
            return definite
    elif maybe.count() == 0:
        return maybe  # typed empty

    # exact check against the DISTINCT right key set (marker join; a
    # duplicated right key must not multiply left rows)
    cols = left_ds.schema().names
    rkeys = (right_ds.map_batches(
        lambda t: pa.table({"__bk": _key_col(t, right_on)}),
        batch_format="pyarrow")
        .groupby("__bk").count()
        .map_batches(lambda t: pa.table(
            {"__bk": t.column("__bk"),
             "__bm": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow"))
    rkeys = drop_empty_blocks(rkeys.materialize())
    keyed = maybe.map_batches(
        lambda t: t.append_column("__bk", _key_col(t, on)),
        batch_format="pyarrow")
    joined = join_datasets(keyed, rkeys, on="__bk",
                           join_type="left_outer",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False)

    def pick(null_marker: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.is_null(t.column("__bm"))
            if not null_marker:
                m = pc.invert(m)
            return t.filter(m).select(list(cols))

        return f

    checked = joined.map_batches(pick(anti), batch_format="pyarrow")
    if anti:
        return definite.union(checked)
    return checked


def sql_semi_join(left_rel: str, right_rel: str, on: str, right_on: str,
                  anti: bool = False) -> str:
    """Plain-SQL oracle: IN / NOT IN subquery semi/anti join."""
    neg = "NOT " if anti else ""
    return (f"SELECT * FROM ({left_rel}) l WHERE l.{on} {neg}IN "
            f"(SELECT r.{right_on} FROM ({right_rel}) r)")
