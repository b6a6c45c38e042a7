"""Line-level boilerplate removal (CCNet-style, Wenzek et al. 2020 —
public algorithm): a line that occurs in many distinct documents is
navigation/footer boilerplate, not content, and is stripped from every
document while the per-document line ORDER of surviving lines is kept.

Scale shape (the 100-TB story):
- The line->distinct-doc-count histogram is computed from per-batch
  PARTIALS: each document lives in exactly one input row, so its lines
  never straddle batches and per-batch (line, n_docs) partials sum to
  the exact distinct-doc count — no global (doc, line) dedup shuffle.
- Partials merge on the driver under ``broadcast_cap`` rows (Ray
  aggregates carry multi-second fixed cost; see BENCH/NOTES.md), else
  through a distributed groupby(line).sum — the all-Dataset path.
- Only the BOILERPLATE lines (count >= min_docs) are collected and
  broadcast via ray.put; the strip pass is one zero-copy Arrow
  map_batches (split -> is_in -> list rebuild -> binary_join), no
  join and no second shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _split_lines(t: pa.Table, id_col: str, text_col: str,
                 sep: str = "\n"):
    """(ids, list<unit> array) for one Arrow batch. ``sep`` picks
    the dedup unit: "\\n" = lines (CCNet), "\\n\\n" = paragraphs."""
    txt = t.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    return t.column(id_col), pc.split_pattern(txt, pattern=sep)


def explode_lines(docs_ds, id_col: str = "doc_id",
                  text_col: str = "text"):
    """documents -> one row per line: (id_col, line_no, line)."""

    def f(t: pa.Table) -> pa.Table:
        ids, lists = _split_lines(t, id_col, text_col)
        parent = pc.list_parent_indices(lists)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        line_no = np.arange(int(counts.sum()), dtype=np.int64) - starts
        return pa.table({
            id_col: pc.take(ids, parent),
            "line_no": pa.array(line_no, pa.int64()),
            "line": pc.list_flatten(lists),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow",
                               zero_copy_batch=True)


def _partial_counts(t: pa.Table, id_col: str, text_col: str,
                    sep: str = "\n") -> pa.Table:
    """Per-batch (line, n) where n = distinct docs of this batch that
    contain the line. Exact globally because a document's lines are
    always batch-local (one input row per document)."""
    ids, lists = _split_lines(t, id_col, text_col, sep)
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table({"line": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    # distinct (doc, line) pairs via integer keys, then a counted
    # unique over the surviving line ids
    uniq, inv = np.unique(flat, return_inverse=True)
    key = parent.astype(np.int64) * len(uniq) + inv
    pair_line = np.unique(key) % len(uniq)
    line_idx, counts = np.unique(pair_line, return_counts=True)
    return pa.table({"line": pa.array(uniq[line_idx], pa.string()),
                     "n": pa.array(counts, pa.int64())})


def boilerplate_lines(docs_ds, min_docs: int = 2, id_col: str = "doc_id",
                      text_col: str = "text",
                      broadcast_cap: int = 2_000_000,
                      sep: str = "\n") -> list[str]:
    """Lines occurring in >= min_docs distinct documents, as a sorted
    list (small by construction — boilerplate is the frequent tail)."""
    partial = docs_ds.map_batches(
        lambda t: _partial_counts(t, id_col, text_col, sep),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    if partial.count() <= broadcast_cap:
        import ray

        parts = ray.get(partial.to_arrow_refs())
        t = pa.concat_tables(parts)
        lines = t.column("line").to_numpy(zero_copy_only=False)
        ns = t.column("n").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(lines, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, ns)
        return [str(x) for x in uniq[tot >= min_docs]]

    from k_gap_ray.dsutil import drop_empty_blocks

    agg = drop_empty_blocks(
        partial.groupby("line").sum("n").materialize())
    # the aggregated histogram is > broadcast_cap rows on this branch:
    # filter with a vectorized Arrow kernel (a per-row Python predicate
    # here would be the hot loop), and ship only the surviving `line`
    # column to the driver
    hot = agg.map_batches(
        lambda t: pa.table({"line": t.filter(
            pc.greater_equal(t.column("sum(n)"),
                             pa.scalar(min_docs))).column("line")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return sorted(r["line"] for r in hot.take_all())


def strip_boilerplate(docs_ds, min_docs: int = 2, id_col: str = "doc_id",
                      text_col: str = "text",
                      broadcast_cap: int = 2_000_000,
                      sep: str = "\n"):
    """documents -> (id_col, text_clean, n_kept, n_dropped): every
    line present in >= min_docs distinct documents is removed from
    ALL documents; surviving lines keep their original order."""
    import ray

    boiler = boilerplate_lines(docs_ds, min_docs, id_col, text_col,
                               broadcast_cap, sep)
    ref = ray.put(pa.array(boiler, pa.string()))

    def f(t: pa.Table) -> pa.Table:
        import ray as _r

        ids, lists = _split_lines(t, id_col, text_col, sep)
        flat = pc.list_flatten(lists)
        drop = pc.is_in(flat, value_set=_r.get(ref))
        keep = pc.invert(drop).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        n_rows = len(t)
        kept_per = np.zeros(n_rows, dtype=np.int64)
        np.add.at(kept_per, parent[keep], 1)
        total_per = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_per)))
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pc.filter(flat, pa.array(keep)))
        return pa.table({
            id_col: ids,
            "text_clean": pc.binary_join(kept_lists, sep),
            "n_kept": pa.array(kept_per, pa.int64()),
            "n_dropped": pa.array(total_per - kept_per, pa.int64()),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow",
                               zero_copy_batch=True)
