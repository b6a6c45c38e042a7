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
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HASH_BUCKETS = 16
_META = "_store_meta.json"


def _write_meta(store_dir: str, n_buckets: int) -> None:
    os.makedirs(store_dir, exist_ok=True)
    with open(os.path.join(store_dir, _META), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)


def _read_meta(store_dir: str, fallback: int) -> int:
    """The store's PERSISTED bucket count wins over caller values —
    probing with a different count than the build selects the wrong
    bucket=K/ directories and silently misses matches (the round-4
    advisor's band-index finding, closed for every bucketed store)."""
    try:
        with open(os.path.join(store_dir, _META)) as f:
            return int(json.load(f)["n_buckets"])
    except (FileNotFoundError, KeyError, ValueError):
        return fallback


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


def _probe_paths(store_dir: str, batch_ds, bucket_col: str) -> list:
    """Partition pruning for store probes: the batch's distinct bucket
    values (a bounded driver set — at most n_buckets rows, collected
    from per-batch uniques) select only the matching ``bucket=K/``
    directories, so a small batch against a huge store reads
    O(touched buckets), not O(store).  Buckets the store has never
    seen (all-novel batches) simply aren't on disk and are skipped;
    an empty selection falls back to the store root (the caller
    guarded non-emptiness already)."""
    seen: set = set()
    uniq = batch_ds.map_batches(
        lambda t: pa.table({bucket_col: pc.unique(
            pc.cast(t.column(bucket_col), pa.int64()).combine_chunks()
            if isinstance(t.column(bucket_col), pa.ChunkedArray)
            else pc.cast(t.column(bucket_col), pa.int64()))}),
        batch_format="pyarrow")
    for r in uniq.take_all():
        seen.add(int(r[bucket_col]))
    import glob

    paths = []
    for b in sorted(seen):
        bdir = os.path.join(store_dir, f"{bucket_col}={b}")
        if os.path.isdir(bdir):
            # Ray's read_parquet accepts one directory but a LIST must
            # be files — expand each selected bucket's parquet files
            paths.extend(sorted(glob.glob(
                os.path.join(bdir, "*.parquet"))))
    return paths if paths else [store_dir]


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
    _write_meta(store_dir, n_buckets)
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

    n_buckets = _read_meta(store_dir, n_buckets)
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

        store = rd.read_parquet(
            _probe_paths(store_dir, hashed, "bucket"), columns=["h"])
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


# ---------------------------------------------------------------------------
# Incremental NEAR-dup: a persisted MinHash band index probed per batch
# ---------------------------------------------------------------------------

BAND_BUCKETS = 64


def init_band_index(ds, index_dir: str, shingle_k: int = 3,
                    id_col: str = "doc_id",
                    n_buckets: int = BAND_BUCKETS) -> str:
    """Persist a corpus's MinHash band index (functions/dedup.py
    banding: 128 perms, 64 bands of 2 rows, int64 band keys) as
    bucket-partitioned parquet — bucket = band_key % n_buckets, so a
    batch probe reads only the buckets its own band keys hash into."""
    from k_gap_ray.dsutil import drop_empty_blocks
    from k_gap_ray.functions.dedup import minhash_doc_bands

    bands = minhash_doc_bands(ds, shingle_k=shingle_k, id_col=id_col)

    def add_bucket(t: pa.Table) -> pa.Table:
        bk = pc.cast(t.column("band_key"), pa.int64())
        bucket = pc.subtract(bk, pc.multiply(
            pc.divide(bk, pa.scalar(n_buckets, pa.int64())),
            pa.scalar(n_buckets, pa.int64())))
        return t.append_column("bucket", bucket)

    bands = drop_empty_blocks(
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .materialize())
    if bands.count():
        bands.write_parquet(index_dir, partition_cols=["bucket"])
    _write_meta(index_dir, n_buckets)
    return index_dir


def incremental_near_dup(new_ds, index_dir: str, docs_ds,
                         threshold: float = 0.5, shingle_k: int = 3,
                         id_col: str = "doc_id", append: bool = True,
                         n_buckets: int = BAND_BUCKETS):
    """Near-dup an incoming batch against the PERSISTED band index:
    band the batch, hash-join its bands against the stored bands (the
    LSH probe — only shared band keys produce candidates), dedupe the
    candidate (new, indexed) pairs, then verify each candidate's EXACT
    shingle Jaccard against the payload table — the same
    evidence-integer verification as the in-corpus minhash join, so
    the result is (doc_id_a=new, doc_id_b=indexed, n_common, n_union)
    with den*n_common >= num*n_union.

    ``append=True`` folds the batch's bands into the index afterward,
    so the NEXT batch also dedups against this one — the store grows
    by O(batch bands), never rewrites, and re-running a batch is
    harmless (duplicate band rows cannot create new distinct pairs).

    Scale shape: the probe is ONE hash join keyed on band_key (the
    bucket layout keeps it partition-prunable), candidates dedupe in
    one slim composite-key groupby, and only candidates reach the
    per-pair exact verification.
    """
    import ray.data as rd

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets
    from k_gap_ray.functions.dedup import (minhash_doc_bands,
                                           verify_jaccard_pairs)

    _S = "\x1f"
    n_buckets = _read_meta(index_dir, n_buckets)
    empty = pa.table({f"{id_col}_a": pa.array([], pa.int64()),
                      f"{id_col}_b": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "n_union": pa.array([], pa.int64())})
    new_bands = minhash_doc_bands(new_ds, shingle_k=shingle_k,
                                  id_col=id_col).materialize()
    if new_bands.count() == 0 or not _store_files(index_dir):
        if append and new_bands.count():
            init_band_index(new_ds, index_dir, shingle_k=shingle_k,
                            id_col=id_col, n_buckets=n_buckets)
        return rd.from_arrow(empty)
    new_bands = drop_empty_blocks(new_bands)
    nb_buckets = new_bands.map_batches(
        lambda t: (lambda bk: pa.table({"bucket": pc.subtract(
            bk, pc.multiply(pc.divide(bk, pa.scalar(n_buckets,
                                                    pa.int64())),
                            pa.scalar(n_buckets, pa.int64())))}))(
            pc.cast(t.column("band_key"), pa.int64())),
        batch_format="pyarrow")
    index = rd.read_parquet(
        _probe_paths(index_dir, nb_buckets, "bucket"),
        columns=["band_key", id_col]) \
        .rename_columns({id_col: "__old"})
    cand = join_datasets(new_bands, index, on="band_key",
                         scrub_left=False, scrub_right=False)

    def pair_key(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(id_col), pa.int64())
        b = pc.cast(t.column("__old"), pa.int64())
        # a batch re-run probes its own appended bands: drop self-pairs
        m = pc.not_equal(a, b)
        a, b = a.filter(m), b.filter(m)
        return pa.table({"__k": pc.binary_join_element_wise(
            pc.cast(a, pa.string()), pc.cast(b, pa.string()), _S)})

    keys = cand.map_batches(pair_key, batch_format="pyarrow") \
        .materialize()
    if keys.count() == 0:
        if append:
            init_band_index(new_ds, index_dir, shingle_k=shingle_k,
                            id_col=id_col, n_buckets=n_buckets)
        return rd.from_arrow(empty)
    keys = drop_empty_blocks(keys)
    pairs = (keys.groupby("__k").count()
             .map_batches(lambda t: (lambda split: pa.table({
                 f"{id_col}_a": pc.cast(pc.list_element(split, 0),
                                        pa.int64()),
                 f"{id_col}_b": pc.cast(pc.list_element(split, 1),
                                        pa.int64())}))(
                 pc.split_pattern(
                     t.column("__k").combine_chunks()
                     if isinstance(t.column("__k"), pa.ChunkedArray)
                     else t.column("__k"), _S)),
                 batch_format="pyarrow"))
    out = verify_jaccard_pairs(pairs, docs_ds, threshold=threshold,
                               shingle_k=shingle_k, id_col=id_col)
    out = out.materialize()
    if append:
        init_band_index(new_ds, index_dir, shingle_k=shingle_k,
                        id_col=id_col, n_buckets=n_buckets)
    return out


def sql_incremental_near_dup(old_where: str, new_where: str,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             table: str = "documents") -> str:
    """DuckDB oracle for :func:`incremental_near_dup` at threshold 0.5
    / 3-gram shingles (the pinned minhash shingle shape): brute-force
    exact Jaccard between the batch and the indexed split — LSH
    banding at 64x2 has full recall on this corpus (the same contract
    the in-corpus q_doc_minhash_pairs oracle relies on)."""
    return f"""
    WITH __toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS tk FROM {table}
    ), __sh AS (
      SELECT {id_col},
             CASE WHEN len(tk) >= 3 THEN
                 list_distinct(list_transform(
                     range(1, len(tk) - 1),
                     i -> array_to_string(tk[i:i+2], ' ')))
             ELSE [array_to_string(tk, ' ')] END AS s
      FROM __toks)
    SELECT {id_col}_a, {id_col}_b, n_common, n_union FROM (
        SELECT a.{id_col} AS {id_col}_a, b.{id_col} AS {id_col}_b,
               len(list_intersect(a.s, b.s)) AS n_common,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
                   AS n_union
        FROM __sh a, __sh b
        WHERE a.{id_col} IN (SELECT {id_col} FROM {table}
                             WHERE {new_where})
          AND b.{id_col} IN (SELECT {id_col} FROM {table}
                             WHERE {old_where})) __p
    WHERE 2 * n_common >= n_union
    """


def compact_store(store_dir: str, partition_prefix: str = "bucket=",
                  dedup_cols: tuple[str, ...] | None = None) -> dict:
    """Compact an append-grown bucketed store: merge each bucket
    directory's small parquet files into one, optionally dropping
    duplicate rows (``dedup_cols`` — e.g. ``("h",)`` for the
    fingerprint store, ``("band_key", "doc_id")`` for the band index,
    both of which tolerate duplicate appended rows semantically but
    pay them in probe-join fan-out).

    Atomic per bucket (temp file + rename, then unlink the old files)
    — a reader that races a compaction sees either the old files or
    the merged one, and a crashed compaction leaves a readable store.
    Runs one Ray task per bucket (bounded by bucket count, not store
    size). Returns {"buckets": n, "files_before": x, "files_after": y}.
    """
    import glob

    import ray

    @ray.remote
    def compact_bucket(bdir: str) -> tuple[int, int]:
        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
        if len(files) <= 1:
            return (len(files), len(files))
        merged = pa.concat_tables([pq.read_table(f) for f in files])
        if dedup_cols:
            import pandas as pd

            df = merged.to_pandas()
            df = df.drop_duplicates(subset=list(dedup_cols),
                                    keep="first")
            merged = pa.Table.from_pandas(df, preserve_index=False)
        tmp = os.path.join(bdir, ".compact.tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, os.path.join(bdir, "compacted-0.parquet"))
        for f in files:
            if os.path.basename(f) != "compacted-0.parquet":
                try:
                    os.unlink(f)
                except FileNotFoundError:
                    pass
        return (len(files), 1)

    buckets = [os.path.join(store_dir, d)
               for d in sorted(os.listdir(store_dir))
               if d.startswith(partition_prefix)
               and os.path.isdir(os.path.join(store_dir, d))]
    results = ray.get([compact_bucket.remote(b) for b in buckets])
    return {"buckets": len(buckets),
            "files_before": sum(r[0] for r in results),
            "files_after": sum(r[1] for r in results)}
