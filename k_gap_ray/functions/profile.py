"""Table profiling — the ANALYZE-style per-column statistics report a
data engineer runs first on a new corpus (and the reference's
statistics/reporting sembench step runs on a schedule): row count,
null count, exact distinct count, and min/max per column.

Exactness contract: min/max land in ONE pinned int64 encoding so the
SQL mirror compares integers, never engine-formatted strings —
integers as-is, floats as round(value * 100) fixed-point cents,
timestamps as epoch microseconds; string columns instead report
min_str/max_str verbatim.  Distinct counts are exact: per-batch
unique partials merged on the driver under an explicit cap (the
ngram_prefix_bands pattern — a profile's ndv set is bounded by the
cap, and crossing it raises rather than silently estimating; callers
wanting sketches at vocabulary scale use functions/sketch.py HLL).

Scale shape: ONE streaming map_batches pass computes every column's
partials (counts, nulls, per-batch uniques, min/max) — no shuffle at
all; the driver merge handles O(columns x blocks) summary rows plus
the capped unique sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: per-column distinct-set cap for the exact driver merge
NDV_CAP = 5_000_000


def _encode_minmax(col: pa.ChunkedArray | pa.Array):
    """(kind, int64-encoded array or None): the pinned encoding."""
    t = col.type
    if pa.types.is_integer(t):
        return "int", pc.cast(col, pa.int64())
    if pa.types.is_floating(t):
        return "float", pc.cast(pc.round(pc.multiply(
            pc.cast(col, pa.float64()), pa.scalar(100.0))), pa.int64())
    if pa.types.is_timestamp(t):
        return "ts", pc.cast(pc.cast(col, pa.timestamp("us")),
                             pa.int64())
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str", None
    return "other", None


def profile_table(ds, columns: list[str], ndv_cap: int = NDV_CAP):
    """-> pa.Table(column, n, n_null, n_distinct, min_key, max_key,
    min_str, max_str) with one row per profiled column, ordered by
    column name.  See module docstring for the encoding contract."""

    def partials(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t.column(c)
            col = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            n = len(col)
            n_null = col.null_count
            kind, enc = _encode_minmax(col)
            valid = col.drop_null()
            mn_k = mx_k = None
            mn_s = mx_s = None
            uniq: list = []
            if len(valid):
                # ndv counts RAW distinct values (stringified — str is
                # injective on distinct ints/floats/timestamps), NOT
                # the fixed-point min/max encodings, which collapse
                # nearby floats and would undercount vs SQL's
                # count(DISTINCT col)
                uniq = [str(v) for v in pc.unique(valid).to_pylist()]
                if kind in ("int", "float", "ts"):
                    enc_v = enc.drop_null()
                    mm = pc.min_max(enc_v)
                    mn_k = mm["min"].as_py()
                    mx_k = mm["max"].as_py()
                elif kind == "str":
                    mm = pc.min_max(valid)
                    mn_s = mm["min"].as_py()
                    mx_s = mm["max"].as_py()
            rows.append({"column": c, "n": n, "n_null": n_null,
                         "mn_k": mn_k, "mx_k": mx_k,
                         "mn_s": mn_s, "mx_s": mx_s,
                         "uniq": uniq})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("column", pa.string()), ("n", pa.int64()),
            ("n_null", pa.int64()),
            ("mn_k", pa.int64()), ("mx_k", pa.int64()),
            ("mn_s", pa.string()), ("mx_s", pa.string()),
            ("uniq", pa.list_(pa.string()))]))

    part = ds.map_batches(partials, batch_format="pyarrow")
    acc: dict = {c: {"n": 0, "n_null": 0, "mn_k": None, "mx_k": None,
                     "mn_s": None, "mx_s": None, "uniq": set()}
                 for c in columns}
    for r in part.take_all():
        a = acc[r["column"]]
        a["n"] += r["n"]
        a["n_null"] += r["n_null"]
        for key, better in (("mn_k", min), ("mx_k", max),
                            ("mn_s", min), ("mx_s", max)):
            v = r[key]
            if v is not None:
                a[key] = v if a[key] is None else better(a[key], v)
        a["uniq"].update(r["uniq"] or [])
        if len(a["uniq"]) > ndv_cap:
            raise ValueError(
                f"profile_table: column {r['column']} exceeds the "
                f"{ndv_cap}-distinct exact cap — use an HLL sketch "
                f"(functions/sketch.py) for vocabulary-scale columns")
    out = sorted(columns)
    return pa.table({
        "column": pa.array(out, pa.string()),
        "n": pa.array([acc[c]["n"] for c in out], pa.int64()),
        "n_null": pa.array([acc[c]["n_null"] for c in out], pa.int64()),
        "n_distinct": pa.array([len(acc[c]["uniq"]) for c in out],
                               pa.int64()),
        "min_key": pa.array([acc[c]["mn_k"] for c in out], pa.int64()),
        "max_key": pa.array([acc[c]["mx_k"] for c in out], pa.int64()),
        "min_str": pa.array([acc[c]["mn_s"] for c in out], pa.string()),
        "max_str": pa.array([acc[c]["mx_s"] for c in out], pa.string()),
    })


def sql_profile_table(table: str, columns: dict[str, str]) -> str:
    """DuckDB oracle for :func:`profile_table`: ``columns`` maps each
    column name to its kind ('int' | 'float' | 'ts' | 'str'); one
    UNION ALL arm per column with the identical int64 encoding."""
    arms = []
    for c in sorted(columns):
        kind = columns[c]
        if kind == "int":
            mn = f"min({c})::BIGINT"
            mx = f"max({c})::BIGINT"
            ms = "NULL::VARCHAR"
            xs = "NULL::VARCHAR"
        elif kind == "float":
            mn = f"CAST(round(min({c}) * 100) AS BIGINT)"
            mx = f"CAST(round(max({c}) * 100) AS BIGINT)"
            ms = "NULL::VARCHAR"
            xs = "NULL::VARCHAR"
        elif kind == "ts":
            mn = f"epoch_us(min({c}))::BIGINT"
            mx = f"epoch_us(max({c}))::BIGINT"
            ms = "NULL::VARCHAR"
            xs = "NULL::VARCHAR"
        else:
            mn = "NULL::BIGINT"
            mx = "NULL::BIGINT"
            ms = f"min({c})"
            xs = f"max({c})"
        arms.append(f"""
        SELECT '{c}' AS column, count(*)::BIGINT AS n,
               (count(*) - count({c}))::BIGINT AS n_null,
               count(DISTINCT {c})::BIGINT AS n_distinct,
               {mn} AS min_key, {mx} AS max_key,
               {ms} AS min_str, {xs} AS max_str
        FROM {table}""")
    return "\nUNION ALL\n".join(arms)
