"""Dataset-level utilities shared by dedup / canonicalize / similarity.

These exist to paper over two Ray 2.49 sharp edges (each documented at
its definition) and to centralize the join-with-rename pattern that
Ray's Dataset.join API requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Unique


class SafeUnique(Unique):
    """`Unique` whose merge survives shuffle round-trips.

    Ray 2.49's ``Unique._to_set`` handles set/list accumulators but not
    numpy arrays; when a partial accumulator is serialized into an
    Arrow list column and read back it reappears as ``np.ndarray``, and
    ``{ndarray}`` raises ``TypeError: unhashable type`` (the kg_report
    crash in round 1's driver gate). This subclass coerces ndarray /
    tuple accumulators before the set union.
    """

    @staticmethod
    def _to_set(x):
        if isinstance(x, set):
            return x
        if isinstance(x, (list, tuple)):
            return set(x)
        if isinstance(x, np.ndarray):
            return set(x.tolist())
        return {x}


def drop_empty_blocks(ds):
    """Rebuild a materialized Dataset without its zero-row blocks.

    Ray's sort-based groupby emits 0-row blocks with an EMPTY schema;
    if a later join's hash-shuffle partition receives only those, the
    per-partition pyarrow join fails with "No match ... FieldRef".
    Block refs pass through untouched (zero-copy; the driver holds refs
    only). A fully-empty Dataset keeps one empty block WITH the proper
    schema so downstream joins/maps still see typed columns.
    """
    import ray
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        schema = None
        try:
            s = ds.schema(fetch_if_missing=True)
            schema = getattr(s, "base_schema", None)
        except Exception:
            pass
        empty = schema.empty_table() if isinstance(schema, pa.Schema) \
            else pa.table({})
        refs = [ray.put(empty)]
    return rd.from_arrow_refs(refs)


def join_datasets(left, right, on: str, right_on: str | None = None,
                  num_partitions: int | None = None,
                  join_type: str = "inner",
                  scrub_left: bool = True, scrub_right: bool = True):
    """Dataset join with the Ray 2.49 call conventions handled.

    - ``num_partitions`` defaults to cluster CPUs (capped);
    - sides flagged ``scrub_*`` are scrubbed of empty-schema blocks
      first (see drop_empty_blocks) — REQUIRED for any side that came
      out of a sort-based groupby; pass False for sides produced by
      map_batches/read/join (cannot carry empty-schema blocks), which
      skips a materialize-and-rebuild pass per side.
    Rename columns BEFORE calling when names collide; Ray's suffix
    handling is unreliable.
    """
    import ray

    if scrub_left:
        left = drop_empty_blocks(left.materialize())
    if scrub_right:
        right = drop_empty_blocks(right.materialize())
    if num_partitions is None:
        num_partitions = max(2, min(32, int(
            ray.cluster_resources().get("CPU", 8))))
        if scrub_left:
            # left was just materialized: sizing the join to its row
            # count is free, and a tiny candidate set doesn't need 32
            # shuffle partitions' worth of task overhead
            num_partitions = max(2, min(num_partitions,
                                        left.count() // 20_000 + 2))
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions,
                     on=(on,),
                     right_on=(right_on,) if right_on else None)


def list_col_matrix(col, dtype=np.float64) -> np.ndarray:
    """Uniform list<float> column -> (n, dim) matrix, zero-copy from
    the Arrow values buffer (no per-row to_pylist)."""
    flat = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(flat)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    lens = pa.compute.list_value_length(flat).to_numpy(zero_copy_only=False)
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("ragged embedding lengths")
    vals = flat.flatten().to_numpy(zero_copy_only=False)
    return vals.reshape(n, dim).astype(dtype, copy=False)


def pack_floats(col) -> pa.Array:
    """list<float32> column -> variable-width binary (join-safe payload).

    pyarrow's hash join rejects list-typed non-key fields; a binary
    view of the same float32 buffer is accepted. Variable-width (not
    fixed) so empty batches produce the same schema as full ones."""
    flat = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(flat)
    if n == 0:
        return pa.array([], pa.binary())
    vals = flat.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float32, copy=False)
    lens = pa.compute.list_value_length(flat).to_numpy(zero_copy_only=False)
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("ragged embedding lengths cannot be packed")
    offsets = (np.arange(n + 1, dtype=np.int32) * (dim * 4))
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(vals.tobytes())])


def unpack_floats(col) -> np.ndarray:
    """binary column of packed float32 rows -> (n, dim) matrix."""
    flat = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(flat)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float32)
    off_dtype = np.int64 if pa.types.is_large_binary(flat.type) else np.int32
    offs = np.frombuffer(flat.buffers()[1], dtype=off_dtype)[
        flat.offset:flat.offset + n + 1].astype(np.int64)
    widths = offs[1:] - offs[:-1]
    dim = int(widths[0]) // 4
    if not (widths == dim * 4).all():
        raise ValueError("ragged packed-embedding widths")
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    seg = data[offs[0]:offs[-1]]
    return np.frombuffer(seg.tobytes(), dtype=np.float32).reshape(n, dim)


_CLEAN_SCHEMAS: dict = {}


def read_parquet_clean(path, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's pandas metadata
    stripped via an explicit ``schema=``.

    The testdata parquet carries dict-valued pandas metadata that makes
    ``pa.Schema.__hash__`` raise, so every read task logs Ray's
    "Failed to hash the schemas (for deduplication)" warning and
    schema dedup is defeated — and the metadata rides the blocks into
    every downstream shuffle, which logs the same warning again.
    Single-file string paths only; directory stores the repo writes
    itself come from Arrow blocks and carry no pandas metadata.
    """
    import os

    import ray.data as rd

    if isinstance(path, str) and path not in _CLEAN_SCHEMAS \
            and os.path.isfile(path):
        try:
            import pyarrow.parquet as pq

            s = pq.read_schema(path)
            _CLEAN_SCHEMAS[path] = \
                s.remove_metadata() if s.metadata else None
        except (OSError, pa.ArrowInvalid):
            _CLEAN_SCHEMAS[path] = None
    schema = _CLEAN_SCHEMAS.get(path) if isinstance(path, str) else None
    if schema is not None and columns:
        # the read applies schema= AFTER column pruning: project it
        schema = pa.schema([schema.field(c) for c in columns])
    if schema is not None:
        kwargs.setdefault("schema", schema)
    return rd.read_parquet(path, columns=columns, **kwargs)
