"""Pred-hash-partitioned persisted quad store with bucket-pruned scans.

The SPARQL engine's one remaining 100x-scale tax (round-4 verdict) was
that every triple-pattern scan is a full map_batches pass over the
whole quads Dataset — an n-pattern query pays n full-corpus scans.
This store removes that tax the same way ``functions/search.py``'s
term-partitioned index removes it for FTS: persist the quads as
parquet partitioned by ``pbucket = stable_hash(pred) % n_buckets``, so
a scan whose predicate is BOUND (a constant IRI or an alternation
list — the overwhelmingly common case in real SPARQL) reads ONLY the
bucket directories its predicates hash into.  Var-predicate and
negated-alternation scans fall back to the full store read, which is
exactly what the in-memory engine did for every scan.

Reference parity: the reference holds its graph in GraphDB, whose
POS/PSO native indexes serve the same role (predicate-first lookup);
this is the Ray-Data-native equivalent — storage-side partition
pruning instead of a B-tree.

Scale shape: the store is written once (one partitioned write of the
canonical quads), each bound-pred scan is a ``read_parquet`` over the
matching ``pbucket=K/`` files only, and the engine's broadcast-join
planning is unchanged downstream.  ``n_buckets`` is persisted in the
directory (meta.json) and re-read at probe time, so an index built
with a non-default bucket count can never be probed with the wrong
mapping (the round-4 advisor flagged exactly this failure mode on the
band index).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

PRED_BUCKETS = 32
_META = "_quadstore_meta.json"


def pred_bucket(pred: str, n_buckets: int) -> int:
    """Stable predicate bucket: sha256-head mod n_buckets — identical
    across processes and sessions (Python's ``hash()`` is salted)."""
    h = hashlib.sha256(pred.encode("utf-8")).hexdigest()
    return int(h[:8], 16) % n_buckets


def _with_pbucket(quads, n_buckets: int):
    """Append the pbucket column in one stateless map_batches pass —
    hashing only each batch's DISTINCT predicates (real graphs have
    few preds per batch), then index_in/take to fan back out."""
    from k_gap_ray.dsutil import drop_empty_blocks

    def add_bucket(t: pa.Table) -> pa.Table:
        pred = t.column("pred")
        pred = pred.combine_chunks() if isinstance(pred, pa.ChunkedArray) \
            else pred
        uniq = pc.unique(pred)
        buckets = pa.array(
            [pred_bucket(u, n_buckets) for u in uniq.to_pylist()],
            pa.int64())
        idx = pc.index_in(pred, value_set=uniq)
        return t.append_column("pbucket", pc.take(buckets, idx))

    return drop_empty_blocks(
        quads.map_batches(add_bucket, batch_format="pyarrow")
        .materialize())


def init_quad_store(quads, store_dir: str,
                    n_buckets: int = PRED_BUCKETS) -> str:
    """Write a quads Dataset as a pred-hash-partitioned store.

    No shuffle: parquet partition_cols splits rows by value at write
    time, after the one stateless bucketing pass.
    """
    bucketed = _with_pbucket(quads, n_buckets)
    os.makedirs(store_dir, exist_ok=True)
    if bucketed.count():
        bucketed.write_parquet(store_dir, partition_cols=["pbucket"])
    with open(os.path.join(store_dir, _META), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)
    return store_dir


def append_quads(quads, store_dir: str) -> int:
    """Incremental feed append: bucket the batch with the STORE'S
    persisted n_buckets (never the module default — the exact wrong-
    mapping failure the band index had) and write additional files
    into the same ``pbucket=K/`` directories. Readers prune exactly as
    before; the store grows by O(batch), never rewrites. Small-file
    buildup from many appends is reclaimed by
    :func:`k_gap_ray.state.fingerprints.compact_store` with
    ``partition_prefix="pbucket="`` (quads are a bag — compact without
    dedup_cols unless the feed guarantees set semantics). Returns the
    number of appended rows."""
    with open(os.path.join(store_dir, _META)) as f:
        n_buckets = int(json.load(f)["n_buckets"])
    bucketed = _with_pbucket(quads, n_buckets)
    n = bucketed.count()
    if n:
        bucketed.write_parquet(store_dir, partition_cols=["pbucket"])
    return n


class QuadStore:
    """Handle to a persisted pred-partitioned quad store.

    Duck-typed for :func:`k_gap_ray.sparql.sparql_select` and friends:
    the engine checks ``hasattr(quads, "scan_for_preds")`` and routes
    each bound-predicate pattern scan through the pruned read; every
    other access goes through :meth:`full`.
    """

    def __init__(self, store_dir: str):
        self.store_dir = store_dir
        meta = os.path.join(store_dir, _META)
        with open(meta) as f:
            self.n_buckets = int(json.load(f)["n_buckets"])
        files = sorted(glob.glob(
            os.path.join(store_dir, "pbucket=*", "*.parquet")))
        if not files:
            raise FileNotFoundError(
                f"empty quad store (no pbucket=*/ parquet): {store_dir}")
        self._files = files
        import pyarrow.parquet as pq

        s = pq.read_schema(files[0])
        self._schema = pa.schema([s.field(n) for n in s.names
                                  if n != "pbucket"])

    # -- Dataset-compatible surface the engine touches ----------------
    def schema(self) -> pa.Schema:
        return self._schema

    def bucket_files(self, preds: list[str]) -> list[str]:
        """Parquet files of the buckets the given predicates hash into
        (exposed for tests asserting the pruning contract)."""
        want = sorted({pred_bucket(p, self.n_buckets) for p in preds})
        out: list[str] = []
        for b in want:
            out.extend(sorted(glob.glob(os.path.join(
                self.store_dir, f"pbucket={b}", "*.parquet"))))
        return out

    def _projected(self, columns: list[str] | None) -> pa.Schema:
        if columns is None:
            return self._schema
        missing = [c for c in columns if c not in self._schema.names]
        if missing:
            raise KeyError(f"columns not in quad store: {missing}")
        return pa.schema([self._schema.field(c) for c in columns])

    def scan_for_preds(self, preds: list[str],
                       columns: list[str] | None = None):
        """Dataset over ONLY the buckets these predicates land in,
        reading ONLY ``columns`` (quads tables are wide — url /
        metadata columns a pattern never binds should not leave
        storage). False positives (other preds sharing a bucket) are
        fine — the pattern scan's equality filter runs regardless;
        false negatives are impossible because the bucket fn is the
        write-side fn and n_buckets is persisted."""
        import ray.data as rd

        schema = self._projected(columns)
        files = self.bucket_files(preds)
        if not files:
            # no store bucket holds these preds: typed empty dataset
            return rd.from_arrow(schema.empty_table())
        return rd.read_parquet(files, columns=schema.names,
                               schema=schema)

    def full(self, columns: list[str] | None = None):
        """Full-store Dataset (var-pred scans, FTS rewrites, node
        identity scans), column-pruned when the caller names what it
        binds."""
        import ray.data as rd

        schema = self._projected(columns)
        return rd.read_parquet(self._files, columns=schema.names,
                               schema=schema)
