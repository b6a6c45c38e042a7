"""Stage 1 — HTML -> clean text extraction (SURVEY.md M10).

Stateless ``map_batches`` over zero-copy Arrow batches. The html
column (the widest payload by far) is dropped inside the same batch
transform so downstream blocks shrink immediately (SURVEY.md 7.5.4 —
never carry multi-MB binary columns past the stage that consumes
them).
"""

from __future__ import annotations

import pyarrow as pa

from k_gap_ray.oracle.kernel import extract_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """html:binary -> text:string; drops html. Pure per-batch kernel."""
    html_col = batch.column("html")
    texts: list[str] = []
    for chunk in html_col.chunks if isinstance(html_col, pa.ChunkedArray) else [html_col]:
        for v in chunk:
            texts.append(extract_text(v.as_py()))
    out = batch.drop_columns(["html", "text"] if "text" in batch.column_names
                             else ["html"])
    return out.append_column("text", pa.array(texts, type=pa.string()))


def extract_stage(pages_ds, batch_size: int = 256):
    """pages(url, warc_ts, html, lang, [text]) -> (url, warc_ts, lang, text).

    batch_size is deliberately small: html rows are wide, and a batch x
    concurrency must fit each worker heap (guide: memory-aware sizing).
    """
    return pages_ds.map_batches(
        extract_text_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
