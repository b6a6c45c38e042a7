"""Regex redaction and text normalization — the scrubbing pass a
training-data pipeline runs before anything else (PII masking,
boilerplate stripping, whitespace canonicalization).

Both pyarrow.compute and DuckDB execute RE2, so the same pattern
string means the same matches on both sides: redacted text and
per-rule match counts compare EXACTLY against the SQL oracle
(:func:`sql_redact`), no tolerance needed.

Rules apply sequentially (rule i sees the output of rule i-1), and
each rule's count is taken on its own input state; the oracle mirrors
this with one chained CTE per rule (match counts via
``regexp_split_to_array`` length, the non-overlapping-match identity).

Scale shape: one ``map_batches`` pass, zero shuffles, Arrow string
kernels throughout (no Python per-row work); patterns are plain
strings so there is no per-actor state to warm.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def redact(ds, rules: list[tuple[str, str]], id_col: str = "doc_id",
           text_col: str = "text"):
    """Dataset -> (id_col, text, n_redact_0..n-1): text with each
    (pattern, replacement) rule applied in order, plus the number of
    matches each rule replaced."""

    def f(t: pa.Table) -> pa.Table:
        cur = pc.fill_null(t.column(text_col), "")
        cols: dict = {id_col: t.column(id_col)}
        for i, (pat, rep) in enumerate(rules):
            cols[f"n_redact_{i}"] = pc.cast(
                pc.count_substring_regex(cur, pattern=pat), pa.int64())
            cur = pc.replace_substring_regex(cur, pattern=pat,
                                             replacement=rep)
        cols["text"] = cur
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Canonical text form: lowercase, all whitespace runs collapsed
    to single spaces, leading/trailing space stripped.  Matches
    ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""

    def f(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t.column(text_col), "")
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(pc.utf8_lower(s))
        return pa.table({id_col: t.column(id_col), "text": s})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_redact(rules: list[tuple[str, str]], id_col: str = "doc_id",
               text_col: str = "text",
               docs_table: str = "documents") -> str:
    """DuckDB oracle for :func:`redact`: one CTE per rule, counts via
    ``len(regexp_split_to_array(t, pat)) - 1`` (== non-overlapping
    match count for non-zero-width patterns)."""
    parts = [f"WITH s0 AS (SELECT {id_col}, "
             f"COALESCE({text_col}, '') AS t FROM {docs_table})"]
    for i, (pat, rep) in enumerate(rules):
        p, r = _sql_quote(pat), _sql_quote(rep)
        prev_counts = "".join(f", c{j}" for j in range(i))
        parts.append(
            f", s{i + 1} AS (SELECT {id_col}{prev_counts}, "
            f"(len(regexp_split_to_array(t, {p})) - 1)::BIGINT AS c{i}, "
            f"regexp_replace(t, {p}, {r}, 'g') AS t FROM s{i})")
    n = len(rules)
    count_cols = ", ".join(f"c{i} AS n_redact_{i}" for i in range(n))
    parts.append(f" SELECT {id_col}, {count_cols}, t AS text FROM s{n}")
    return "".join(parts)
