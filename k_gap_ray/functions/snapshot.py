"""Snapshot diff: the incremental-crawl delta between two versions of
a corpus — which documents were ADDED, REMOVED, or CHANGED.

The consume side of every incremental ingestion design (the engine's
LDES reader produces exactly such deltas; reference kgap harvests
LDES feeds incrementally): given OLD and NEW snapshots keyed by
``id_col``, emit one row per differing id and drop the (overwhelming
majority of) unchanged ones.

Content equality is decided on the repo's pinned double rolling
codepoint hash (h1/h2 of functions.textstats — 257/131 bases, 32-bit
prime mods), NOT on raw text: at 100 TB the full payload must never
enter the join, only (id, h1, h2).  The SQL mirror compares the SAME
two hashes, so both engines agree by construction even in the
astronomically-unlikely double-collision case — the contract is
"hash-equal", and it is exactly verifiable.

Shape: one vectorized hashing pass per side (byte fast path for
ASCII), one full-outer hash join on the id, one vectorized null/mask
classification.  Both join inputs descend from map_batches over
reads, so no empty-block scrub is needed (the BENCH/NOTES.md rule
applies to groupby-descended sides).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .textstats import H1_BASE, H1_MOD, H2_BASE, H2_MOD, hash_tokens


def _hashed(ds, id_col: str, content_col: str, kname: str, pfx: str):
    def f(t: pa.Table) -> pa.Table:
        s = t.column(content_col).combine_chunks() \
            if isinstance(t.column(content_col), pa.ChunkedArray) \
            else t.column(content_col)
        s = pc.fill_null(s, "")
        h1 = hash_tokens(s, H1_BASE, H1_MOD).astype("int64")
        h2 = hash_tokens(s, H2_BASE, H2_MOD).astype("int64")
        return pa.table({
            kname: pc.cast(t.column(id_col), pa.int64()),
            f"{pfx}1": pa.array(h1, pa.int64()),
            f"{pfx}2": pa.array(h2, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def snapshot_diff(old_ds, new_ds, id_col: str = "doc_id",
                  content_col: str = "text"):
    """-> Dataset (id_col, status) with status in
    {'added', 'removed', 'changed'}, sorted by id; unchanged ids are
    dropped inside the classify batch, never materialized."""
    from .. import dsutil

    o = _hashed(old_ds, id_col, content_col, "ko", "ho")
    n = _hashed(new_ds, id_col, content_col, "kn", "hn")
    j = dsutil.join_datasets(o, n, on="ko", right_on="kn",
                             join_type="full_outer",
                             scrub_left=False, scrub_right=False)

    def classify(t: pa.Table) -> pa.Table:
        no_old = pc.is_null(t.column("ho1"))
        no_new = pc.is_null(t.column("hn1"))
        same = pc.and_(
            pc.fill_null(pc.equal(t.column("ho1"), t.column("hn1")), False),
            pc.fill_null(pc.equal(t.column("ho2"), t.column("hn2")), False))
        status = pc.if_else(no_old, "added",
                            pc.if_else(no_new, "removed", "changed"))
        # Ray's full_outer emits ONE key column (the left name),
        # already coalesced across sides
        ids = t.column("ko")
        keep = pc.invert(same)
        return pa.table({id_col: pc.filter(ids, keep),
                         "status": pc.filter(status, keep)})

    return j.map_batches(classify, batch_format="pyarrow").sort(id_col)


def sql_snapshot_diff(old_rel: str, new_rel: str,
                      id_col: str = "doc_id",
                      content_col: str = "text") -> str:
    """DuckDB mirror of :func:`snapshot_diff` over two relations
    (tables, views, or parenthesized subqueries) — the SAME double
    rolling hash decides equality on both engines."""
    from .textstats import sql_token_hash_expr

    h1 = sql_token_hash_expr(f"coalesce({content_col}, '')",
                             H1_BASE, H1_MOD)
    h2 = sql_token_hash_expr(f"coalesce({content_col}, '')",
                             H2_BASE, H2_MOD)
    return f"""
        WITH o AS (SELECT {id_col} AS ko, {h1} AS ho1, {h2} AS ho2
                   FROM {old_rel}),
             n AS (SELECT {id_col} AS kn, {h1} AS hn1, {h2} AS hn2
                   FROM {new_rel})
        SELECT coalesce(ko, kn) AS {id_col},
               CASE WHEN ko IS NULL THEN 'added'
                    WHEN kn IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n ON o.ko = n.kn
        WHERE ko IS NULL OR kn IS NULL
              OR ho1 <> hn1 OR ho2 <> hn2
        ORDER BY {id_col}
    """
