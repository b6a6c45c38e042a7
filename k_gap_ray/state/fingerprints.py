"""Persisted content-fingerprint store + incremental batch dedup.

The streaming crawl-dedup shape the reference's incremental LDES
ingestion implies (ldes-consumer README: feeds are polled forever, and
"no duplicate ingestion" D1 semantics must hold ACROSS polls, not just
within one): yesterday's fingerprints live on disk as hash-bucketed
parquet, today's batch streams against them, and only the batch's
novel fingerprints are appended — the store grows by O(novel), never
rewrites, and a crashed batch can simply re-run (appending the same
novel set again leaves membership semantics unchanged because probes
are EXISTS, not counts).

Fingerprint = sha256 of a normalization key (the full text, or its
first ``prefix_tokens`` tokens — the head-fingerprint triage common in
crawl dedup). sha256 is bit-identical between hashlib and DuckDB's
``sha256()``, so the whole operator carries a value-hash SQL mirror.

Scale shape: the batch is hashed in one stateless map_batches pass
(per-row hashlib — a C call per doc); the store probe is ONE hash join
against the store Dataset (the bucket=K/ layout keeps membership
partition-prunable for point probes); first-occurrence-within-batch is
one slim (h) groupby; the append writes only novel rows, partitioned
by bucket so future readers prune.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HASH_BUCKETS = 16


def _hash_batch(t: pa.Table, key_col: str, id_col: str,
                prefix_tokens: int | None,
                n_buckets: int) -> pa.Table:
    """(id, h, bucket) per row: sha256 hex of the normalization key."""
    col = t.column(key_col)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if prefix_tokens is not None:
        toks = pc.split_pattern(pc.fill_null(col, ""), pattern=" ")
        head = pc.list_slice(toks, 0, prefix_tokens)
        col = pc.binary_join(head, " ")
    hs = [hashlib.sha256((v or "").encode("utf-8")).hexdigest()
          for v in col.to_pylist()]
    bucket = np.array([int(h[:8], 16) % n_buckets for h in hs],
                      dtype=np.int64)
    return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                     "h": pa.array(hs, pa.string()),
                     "bucket": pa.array(bucket, pa.int64())})


def _store_files(store_dir: str) -> bool:
    if not os.path.isdir(store_dir):
        return False
    for root, _dirs, files in os.walk(store_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def init_fingerprint_store(ds, store_dir: str, key_col: str = "text",
                           id_col: str = "doc_id",
                           prefix_tokens: int | None = None,
                           n_buckets: int = HASH_BUCKETS) -> str:
    """Build the store from a corpus: one row per DISTINCT fingerprint
    (min id), written as bucket-partitioned parquet."""
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks

    hashed = ds.map_batches(
        lambda t: _hash_batch(t, key_col, id_col, prefix_tokens,
                              n_buckets),
        batch_format="pyarrow")
    distinct = (hashed.groupby("h")
                .aggregate(Min(id_col, alias_name=id_col),
                           Min("bucket", alias_name="bucket")))
    distinct = drop_empty_blocks(distinct.materialize())
    if distinct.count():
        distinct.write_parquet(store_dir, partition_cols=["bucket"])
    else:
        os.makedirs(store_dir, exist_ok=True)
    return store_dir


def incremental_dedup(new_ds, store_dir: str, key_col: str = "text",
                      id_col: str = "doc_id",
                      prefix_tokens: int | None = None,
                      n_buckets: int = HASH_BUCKETS,
                      append: bool = True):
    """Dedup an incoming batch against the persisted store, then fold
    the batch's novel fingerprints in (unless ``append=False``).

    Returns Dataset(id_col, status) with status pinned to:

    - ``dup_store``: fingerprint already in the store (wins even when
      the batch also repeats it),
    - ``dup_batch``: not in the store, but a smaller-id row of THIS
      batch shares the fingerprint,
    - ``novel``: first occurrence anywhere.

    The identical CASE is the SQL mirror (:func:`sql_incremental_dedup`
    with old rows standing in for the store).
    """
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    hashed = new_ds.map_batches(
        lambda t: _hash_batch(t, key_col, id_col, prefix_tokens,
                              n_buckets),
        batch_format="pyarrow").materialize()
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "status": pa.array([], pa.string())})
    if hashed.count() == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    hashed = drop_empty_blocks(hashed)

    if _store_files(store_dir):
        import ray.data as rd

        store = rd.read_parquet(store_dir, columns=["h"])
        marks = (store.groupby("h").count()
                 .map_batches(lambda t: pa.table({
                     "h": t.column("h"),
                     "__in_store": pa.array([1] * t.num_rows,
                                            pa.int64())}),
                     batch_format="pyarrow"))
        marks = drop_empty_blocks(marks.materialize())
        flagged = join_datasets(hashed, marks, on="h",
                                join_type="left_outer",
                                scrub_left=False, scrub_right=False)
        flagged = drop_empty_blocks(flagged.materialize())
    else:
        flagged = hashed.map_batches(
            lambda t: t.append_column(
                "__in_store", pa.array([None] * t.num_rows, pa.int64())),
            batch_format="pyarrow")

    firsts = (hashed.groupby("h")
              .aggregate(Min(id_col, alias_name="__mid")))
    firsts = drop_empty_blocks(firsts.materialize())
    both = join_datasets(flagged, firsts, on="h",
                         scrub_left=False, scrub_right=False)

    def classify(t: pa.Table) -> pa.Table:
        in_store = pc.is_valid(t.column("__in_store"))
        is_first = pc.equal(pc.cast(t.column(id_col), pa.int64()),
                            pc.cast(t.column("__mid"), pa.int64()))
        status = pc.if_else(
            in_store, pa.scalar("dup_store"),
            pc.if_else(is_first, pa.scalar("novel"),
                       pa.scalar("dup_batch")))
        return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                         "status": status,
                         "h": t.column("h"),
                         "bucket": t.column("bucket"),
                         "__novel": pc.and_(pc.invert(in_store),
                                            is_first)})

    classified = drop_empty_blocks(
        both.map_batches(classify, batch_format="pyarrow").materialize())

    if append:
        novel = classified.map_batches(
            lambda t: (lambda m: pa.table({
                "h": t.column("h").filter(m),
                id_col: pc.cast(t.column(id_col).filter(m), pa.int64()),
                "bucket": pc.cast(t.column("bucket").filter(m),
                                  pa.int64())}))(
                t.column("__novel").combine_chunks()
                if isinstance(t.column("__novel"), pa.ChunkedArray)
                else t.column("__novel")),
            batch_format="pyarrow").materialize()
        if novel.count():
            drop_empty_blocks(novel).write_parquet(
                store_dir, partition_cols=["bucket"])

    return classified.map_batches(
        lambda t: t.select([id_col, "status"]), batch_format="pyarrow")


def sql_incremental_dedup(old_where: str, new_where: str,
                          key_col: str = "text",
                          id_col: str = "doc_id",
                          prefix_tokens: int | None = None,
                          table: str = "documents") -> str:
    """DuckDB oracle for :func:`incremental_dedup` where the store was
    initialized from ``{table} WHERE {old_where}`` and the batch is
    ``{table} WHERE {new_where}``: the identical sha256 fingerprint and
    three-way CASE."""
    if prefix_tokens is not None:
        key = (f"array_to_string(string_split({key_col}, ' ')"
               f"[1:{prefix_tokens}], ' ')")
    else:
        key = key_col
    return f"""
    WITH __old AS (
      SELECT DISTINCT sha256({key}) AS h FROM {table} WHERE {old_where}
    ), __new AS (
      SELECT {id_col}, sha256({key}) AS h
      FROM {table} WHERE {new_where}
    ), __firsts AS (
      SELECT h, MIN({id_col}) AS mid FROM __new GROUP BY h
    )
    SELECT n.{id_col},
           CASE WHEN EXISTS (SELECT 1 FROM __old o WHERE o.h = n.h)
                  THEN 'dup_store'
                WHEN n.{id_col} = f.mid THEN 'novel'
                ELSE 'dup_batch' END AS status
    FROM __new n JOIN __firsts f ON f.h = n.h
    """
