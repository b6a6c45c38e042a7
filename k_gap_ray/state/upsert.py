"""Sync-mode upsert/delete writer (S6) + incremental ingestion (W3/W4).

The reference's two ingestion modes
(/root/reference/ldes-consumer/README.md:147-149):
- Replication: append-only Graph Store Protocol bulk load -> our
  default `write_parquet(partition_cols=["graph"])` path.
- Sync: SPARQL-UPDATE create/update/delete -> here the
  rewrite-affected-partition pattern: bucket rows by subject hash,
  merge old+new per affected bucket (latest wins per key), rewrite
  ONLY those bucket directories. Unaffected buckets are untouched, so
  an upsert touches O(affected partitions), not the store.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

N_BUCKETS = 16
KEY_COLS = ["subj", "pred", "graph"]  # upsert identity: one obj per (s,p,g)
_META = "_upsert_meta.json"


def _store_buckets(store_dir: str, fallback: int) -> int:
    """The store's PERSISTED bucket count wins over any caller value:
    probing or rewriting with a different count than the build writes
    changes into the wrong bucket dirs and silently corrupts the
    latest-wins merge (the same failure mode the round-4 advisor found
    on the band index). Stores written before the meta file existed
    fall back to the caller's value."""
    try:
        with open(os.path.join(store_dir, _META)) as f:
            return int(json.load(f)["n_buckets"])
    except (FileNotFoundError, KeyError, ValueError):
        return fallback


def _bucket_of(series: pd.Series, n_buckets: int = N_BUCKETS) -> pd.Series:
    return (pd.util.hash_pandas_object(series, index=False) % n_buckets
            ).astype("int32")


def init_store(triples_ds, store_dir: str, n_buckets: int = N_BUCKETS):
    """Materialize a bucketed triple store (one dir per subj bucket)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["subj_bucket"] = _bucket_of(df["subj"], n_buckets)
        return df

    (triples_ds.map_batches(add_bucket, batch_format="pandas")
     .write_parquet(store_dir, partition_cols=["subj_bucket"]))
    with open(os.path.join(store_dir, _META), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)
    return store_dir


def upsert(store_dir: str, changes_ds, deletes_ds=None,
           n_buckets: int = N_BUCKETS):
    """Apply upserts (+ optional deletes) by rewriting affected buckets.

    changes: triples rows — replace the obj of matching (subj, pred,
    graph), insert if absent. deletes: rows with (subj, pred, graph)
    to remove. Bucket rewrite is atomic (temp dir + rename)."""
    changes = changes_ds.to_pandas()
    deletes = deletes_ds.to_pandas() if deletes_ds is not None else None

    n_buckets = _store_buckets(store_dir, n_buckets)
    changes["subj_bucket"] = _bucket_of(changes["subj"], n_buckets)
    affected = set(changes["subj_bucket"].unique())
    if deletes is not None and len(deletes):
        deletes["subj_bucket"] = _bucket_of(deletes["subj"], n_buckets)
        affected |= set(deletes["subj_bucket"].unique())

    import ray

    @ray.remote
    def rewrite_bucket(b: int, ch: pd.DataFrame, dl) -> int:
        bdir = os.path.join(store_dir, f"subj_bucket={b}")
        files = glob.glob(os.path.join(bdir, "*.parquet"))
        old = (pd.concat([pq.read_table(f).to_pandas() for f in files])
               if files else ch.iloc[0:0].drop(columns=["subj_bucket"]))
        merged = pd.concat([old, ch.drop(columns=["subj_bucket"])])
        # latest wins per upsert key (changes were concatenated last)
        merged = merged.drop_duplicates(subset=KEY_COLS, keep="last")
        if dl is not None and len(dl):
            key = merged[KEY_COLS].apply(tuple, axis=1)
            gone = set(dl[KEY_COLS].apply(tuple, axis=1))
            merged = merged[~key.isin(gone)]
        merged = merged.sort_values(["subj", "pred", "obj"],
                                    kind="mergesort")
        tmp = bdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                       os.path.join(tmp, "part-00000.parquet"))
        shutil.rmtree(bdir, ignore_errors=True)
        os.replace(tmp, bdir)
        return len(merged)

    futures = []
    for b in sorted(affected):
        ch = changes[changes["subj_bucket"] == b]
        dl = (deletes[deletes["subj_bucket"] == b]
              if deletes is not None and len(deletes) else None)
        futures.append(rewrite_bucket.remote(int(b), ch, dl))
    return sum(ray.get(futures))


def read_store(store_dir: str):
    import ray.data as rd

    return rd.read_parquet(store_dir)


def apply_set_changes(store_dir: str, inserts=None, deletes=None,
                      n_buckets: int = N_BUCKETS) -> int:
    """SET-semantics bucket rewrite (the SPARQL UPDATE contract,
    sparql_update.py): ``deletes`` is a (subj, pred, obj) Arrow table
    — every row whose triple matches is removed, all graphs;
    ``inserts`` is a full-schema Arrow table — rows whose (subj, pred,
    obj) already exists are no-ops. Only the buckets hashed by an
    affected subject are rewritten (atomic temp-dir + rename, like
    :func:`upsert`). Returns rows in the rewritten buckets after."""
    import ray

    ins_df = inserts.to_pandas() if inserts is not None else None
    del_df = deletes.to_pandas() if deletes is not None else None
    n_buckets = _store_buckets(store_dir, n_buckets)
    affected: set[int] = set()
    if ins_df is not None and len(ins_df):
        ins_df["subj_bucket"] = _bucket_of(ins_df["subj"], n_buckets)
        affected |= set(ins_df["subj_bucket"].unique())
    if del_df is not None and len(del_df):
        del_df["subj_bucket"] = _bucket_of(del_df["subj"], n_buckets)
        affected |= set(del_df["subj_bucket"].unique())
    if not affected:
        return 0

    @ray.remote
    def rewrite(b: int, ins: pd.DataFrame | None,
                dl: pd.DataFrame | None) -> int:
        bdir = os.path.join(store_dir, f"subj_bucket={b}")
        files = glob.glob(os.path.join(bdir, "*.parquet"))
        if files:
            old = pd.concat([pq.read_table(f).to_pandas() for f in files])
        elif ins is not None:
            old = ins.iloc[0:0].drop(columns=["subj_bucket"])
        else:
            return 0
        key3 = ["subj", "pred", "obj"]
        if dl is not None and len(dl):
            gone = set(dl[key3].apply(tuple, axis=1))
            old = old[~old[key3].apply(tuple, axis=1).isin(gone)]
        if ins is not None and len(ins):
            add = ins.drop(columns=["subj_bucket"])
            have = set(old[key3].apply(tuple, axis=1))
            add = add[~add[key3].apply(tuple, axis=1).isin(have)]
            old = pd.concat([old, add[old.columns]])
        old = old.sort_values(["subj", "pred", "obj"], kind="mergesort")
        tmp = bdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(old, preserve_index=False),
                       os.path.join(tmp, "part-00000.parquet"))
        shutil.rmtree(bdir, ignore_errors=True)
        os.replace(tmp, bdir)
        return len(old)

    futures = []
    for b in sorted(affected):
        ins = (ins_df[ins_df["subj_bucket"] == b]
               if ins_df is not None and len(ins_df) else None)
        dl = (del_df[del_df["subj_bucket"] == b]
              if del_df is not None and len(del_df) else None)
        futures.append(rewrite.remote(int(b), ins, dl))
    return sum(ray.get(futures))
