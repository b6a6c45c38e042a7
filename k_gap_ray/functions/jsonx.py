"""Flat-JSON field extraction over string columns.

Web-scale corpora carry semi-structured sidecar columns (event
payloads, crawl metadata, API captures) as JSON strings; the engine
needs the Spark ``get_json_object`` / DuckDB ``json_extract`` idiom
without a per-row Python ``json.loads`` loop.  Extraction here is one
vectorized RE2 pass (``pyarrow.compute.extract_regex``) per batch —
zero-copy Arrow in, Arrow out, no shuffle — covering the **flat
object, integer-valued field** contract:

    {"k": 69}        -> 69
    {"k": "69"}      -> 69      (quoted integers accepted)
    {"k": 69.5}      -> null    (non-integral)
    {"k": "69abc"}   -> null
    {} / malformed   -> null
    19+ digit values -> null    (int64-overflow-proof on BOTH engines:
                                 DuckDB CAST errors rather than wraps)

The DuckDB mirror pins the same contract with a real JSON parse
(``json_extract_string`` + an integer-shape regexp guard), so both
backends agree byte-for-byte on every case above.  NOT covered (both
sides documented): nested objects where the key re-appears at depth —
the regex has no depth tracking.  Reference analogue: property-value
extraction from record payloads before mapping (kgap's member parser
flattens JSON-LD member payloads the same way, ldes-consumer
app.py member handling).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_KEY_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _pattern(key: str) -> str:
    if not _KEY_RE.match(key):
        raise ValueError(f"unsupported JSON key {key!r}")
    # {1,18}: the longest digit run guaranteed inside int64 — a longer
    # literal fails the trailing [,}] check entirely (RE2 backtracks
    # the bounded repeat, then the leftover digit matches nothing), so
    # overflow candidates extract as null instead of erroring the cast
    return f'"{key}"\\s*:\\s*"?(?P<v>-?\\d{{1,18}})"?\\s*[,}}]'


def json_int_field(ds, col: str, key: str, out_col: str | None = None):
    """Append ``out_col`` (int64, null on absent/non-integer) extracted
    from the flat-JSON string column ``col``.  One map_batches, no
    shuffle; the batch keeps all its original columns."""
    out = out_col or key
    pat = _pattern(key)

    def f(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(pc.fill_null(t.column(col), ""), pat)
        v = pc.cast(pc.struct_field(s, "v"), pa.int64())
        return t.append_column(out, v)

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True)


def json_field_stats(ds, col: str, key: str, by: str):
    """Grouped stats of an integer JSON field: per ``by`` value the
    row count, non-null extraction count, and sum/min/max of the
    field.

    100-TB shape: extraction fused into the per-batch partial
    aggregate (one arrow C++ hash aggregate per batch), then ONE
    groupby shuffle at |distinct by| * n_batches rows — the payload
    column never moves.

    -> Dataset[(by, n, n_k, sum_k, min_k, max_k)].
    """
    from ray.data.aggregate import Max, Min, Sum

    pat = _pattern(key)

    def partial(t: pa.Table) -> pa.Table:
        s = pc.extract_regex(pc.fill_null(t.column(col), ""), pat)
        v = pc.cast(pc.struct_field(s, "v"), pa.int64())
        g = (pa.table({by: t.column(by), "v": v})
             .group_by([by])
             .aggregate([("v", "count"), ("v", "sum"), ("v", "min"),
                         ("v", "max"), ([], "count_all")]))
        return pa.table({
            by: g.column(by),
            "n_p": pc.cast(g.column("count_all"), pa.int64()),
            "nk_p": pc.cast(g.column("v_count"), pa.int64()),
            "sum_p": pc.cast(g.column("v_sum"), pa.int64()),
            "min_p": pc.cast(g.column("v_min"), pa.int64()),
            "max_p": pc.cast(g.column("v_max"), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(by)
           .aggregate(Sum("n_p", alias_name="n"),
                      Sum("nk_p", alias_name="n_k"),
                      Sum("sum_p", alias_name="sum_k"),
                      Min("min_p", alias_name="min_k"),
                      Max("max_p", alias_name="max_k")))
    return agg.map_batches(
        lambda t: t.select([by, "n", "n_k", "sum_k", "min_k", "max_k"]),
        batch_format="pyarrow")


def sql_json_int_field(col: str, key: str) -> str:
    """The per-row DuckDB mirror of the RE2 extraction: a real JSON
    parse guarded to the same value-shape contract (integer lexical
    form, <= 18 digits)."""
    if not _KEY_RE.match(key):
        raise ValueError(f"unsupported JSON key {key!r}")
    # nested CASE: DuckDB evaluates THEN branches lazily, so
    # json_extract_string never sees malformed input (it ERRORS on it;
    # json_valid is the safe probe), and CAST never sees an
    # overflow-length literal
    return (f"CASE WHEN json_valid({col}) THEN "
            f"(CASE WHEN regexp_matches(coalesce("
            f"json_extract_string({col}, '$.{key}'), ''), "
            f"'^-?\\d{{1,18}}$') "
            f"THEN CAST(json_extract_string({col}, '$.{key}') AS BIGINT) "
            f"END) END")


def sql_json_field_stats(col: str, key: str, by: str,
                         rel: str = "events") -> str:
    """DuckDB mirror of :func:`json_field_stats` — real JSON parse
    guarded to the same integer-shape contract the RE2 path accepts."""
    v = sql_json_int_field(col, key)
    return f"""
        SELECT {by},
               count(*)::BIGINT AS n,
               count(v)::BIGINT AS n_k,
               CAST(sum(v) AS BIGINT) AS sum_k,
               CAST(min(v) AS BIGINT) AS min_k,
               CAST(max(v) AS BIGINT) AS max_k
        FROM (SELECT {by}, {v} AS v FROM {rel})
        GROUP BY {by}
    """
