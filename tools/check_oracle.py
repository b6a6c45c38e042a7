"""Local simulation of the driver's correctness gate.

Runs every queries() entry at a given sf tier, converts the result to
pandas, runs the matching oracle_sql() through DuckDB over the same
parquet tables, and compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
all columns, values stringified). Mirrors the contract described in
the driver notes so mismatches surface before the real gate runs.
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def norm_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--limit", type=int, default=None,
                    help="check only the first N queries() entries "
                         "(the driver verifies the first 50)")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    failures = 0
    items = list(qs.items())
    if args.limit is not None:
        items = items[:args.limit]
    for name, fn in items:
        if args.only and args.only not in name:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(args.sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.perf_counter() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(mine)} rows, {wall:.1f}s)")
            continue
        oracle = con.execute(sqls[name]).fetchdf()
        probs = []
        if len(mine) != len(oracle):
            probs.append(f"rows {len(mine)} != {len(oracle)}")
        if sorted(mine.columns) != sorted(oracle.columns):
            probs.append(f"cols {sorted(mine.columns)} != {sorted(oracle.columns)}")
        elif norm_hash(mine) != norm_hash(oracle):
            probs.append("value-hash mismatch")
        if probs:
            failures += 1
            print(f"FAIL {name}: {'; '.join(probs)} ({wall:.1f}s)")
            if "value-hash mismatch" in probs:
                m = mine[sorted(mine.columns)].astype(str).sort_values(
                    list(sorted(mine.columns))).reset_index(drop=True)
                o = oracle[sorted(oracle.columns)].astype(str).sort_values(
                    list(sorted(oracle.columns))).reset_index(drop=True)
                neq = (m != o).any(axis=1)
                print("  mine:", m[neq].head(3).to_dict("records"))
                print("  orcl:", o[neq].head(3).to_dict("records"))
        else:
            print(f"ok   {name}: match ({len(mine)} rows, {wall:.1f}s)")
    ray.shutdown()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
