"""Sliding-window text chunking — the RAG / context-packing splitter.

Training and retrieval pipelines cut every document into token
windows of ``size`` tokens advancing by ``stride`` (overlap =
``size - stride``).  The reference platform leaves chunking to the
notebook layer (jupyter/kgap/notebooks/kgap_tools.py post-processes
SELECT results in pandas); here it is a first-class streaming
operator.

Pinned convention (identical on both backends, so the DuckDB oracle
hash-matches exactly):

- tokens = ``string_split(text, ' ')`` — the repo-wide single-space
  convention (`textstats._tokens_of`); empty/NULL text yields one
  empty token, hence exactly one chunk.
- chunk starts are ``s = 0, stride, 2*stride, ...`` for every
  ``s < n_tokens``; the chunk is ``tokens[s : s + size]`` (the tail
  chunks are shorter — no padding, no dropped tokens).
- emitted columns: ``(doc_id, chunk_id, start_tok, n_tok, n_chars,
  chunk)`` where ``chunk`` is the space-rejoined window and
  ``n_chars = length(chunk)`` in codepoints.

100-TB shape: ONE vectorized ``map_batches`` — no shuffle, no state,
no driver work.  Expansion is bounded by ``~size/stride`` x input
bytes by construction, so block sizes stay predictable; the token
gather is a single Arrow ``take`` and the rejoin one ``binary_join``
kernel per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from k_gap_ray.functions.textstats import _tokens_of

_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("chunk_id", pa.int64()),
    ("start_tok", pa.int64()), ("n_tok", pa.int64()),
    ("n_chars", pa.int64()), ("chunk", pa.string())])


def _empty() -> pa.Table:
    return _OUT_SCHEMA.empty_table()


def chunk_spans(ds, size: int = 64, stride: int = 48,
                id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) Dataset -> one row per sliding token window."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")

    def f(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        if n_docs == 0:
            return _empty()
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat, counts, tok_starts = _tokens_of(t.column(text_col))
        # counts >= 1 always ('' splits to ['']), so every doc emits
        # ceil(counts / stride) >= 1 chunks
        n_chunks = (counts + stride - 1) // stride
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
        first_of_doc = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(n_chunks[:-1], out=first_of_doc[1:])
        chunk_id = np.arange(total, dtype=np.int64) - first_of_doc[doc_idx]
        start_tok = chunk_id * stride
        n_tok = np.minimum(size, counts[doc_idx] - start_tok)
        # gather the window tokens: one flat index array over all
        # chunks (windows overlap, so this is a gather, not a slice)
        g0 = tok_starts[doc_idx] + start_tok
        offs = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offs[1:])
        intra = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1],
                                                                n_tok)
        gather = np.repeat(g0, n_tok) + intra
        vals = flat.take(pa.array(gather, pa.int64()))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), vals)
        chunk = pc.binary_join(lists, " ")
        return pa.table({
            "doc_id": pa.array(ids[doc_idx], pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "start_tok": pa.array(start_tok, pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(chunk), pa.int64()),
            "chunk": pc.cast(chunk, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_chunk_spans(size: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text",
                    rel: str = "documents") -> str:
    """The identical chunking as one DuckDB query (1-based inclusive
    list slicing mirrors tokens[s : s + size])."""
    return f"""
        WITH toks AS (SELECT {id_col} AS doc_id,
                             string_split(coalesce({text_col}, ''), ' ')
                                 AS ts
                      FROM {rel}),
        st AS (SELECT doc_id, ts,
                      unnest(generate_series(0, len(ts) - 1, {stride}))
                          AS s
               FROM toks)
        SELECT doc_id,
               (s // {stride})::BIGINT AS chunk_id,
               s::BIGINT AS start_tok,
               least({size}, len(ts) - s)::BIGINT AS n_tok,
               length(array_to_string(ts[s + 1 : s + {size}], ' '))::BIGINT
                   AS n_chars,
               array_to_string(ts[s + 1 : s + {size}], ' ') AS chunk
        FROM st
    """
