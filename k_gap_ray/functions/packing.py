"""Sequence packing: lay a document corpus out as one global token
stream and chunk it into fixed-length training sequences.

The "concat-and-chunk" packing every LLM pretraining pipeline runs
before batching: documents are concatenated in a deterministic order
(ascending ``doc_id``) and the stream is cut every ``seq_len`` tokens;
each document is told which byte^Wtoken span and which sequence range
it landed in.  Downstream consumers group by sequence id to emit
training examples.

Distributed shape — a two-pass ordered prefix sum, no global sort:

1. bucket every doc by ``doc_id // bucket_size`` and compute
   per-bucket token totals with a small ``groupby().sum()`` (the
   shuffle moves one row per bucket, not per doc);
2. the bucket-total table (``n_docs / bucket_size`` rows — driver
   state is O(buckets), bounded by construction, NOT corpus-sized) is
   prefix-summed on the driver and broadcast via ``ray.put``;
3. a ``groupby(bucket).map_groups`` pass sorts each bucket by doc_id,
   computes the local cumulative sum, and adds its bucket's offset —
   every doc now knows its global ``[tok_start, tok_end)`` span.

All emitted columns are exact integers, so the DuckDB window-function
oracle (``SUM(n) OVER (ORDER BY doc_id)``) compares values exactly.

Empty documents (0 tokens) get a degenerate span ``tok_start ==
tok_end`` and ``seq_first == seq_last == tok_start // seq_len`` (the
``greatest(tok_start, tok_end-1)`` formula, mirrored verbatim in the
SQL oracle, keeps the column integer and NULL-free).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def pack_sequences(docs_ds, seq_len: int = 1024, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   bucket_size: int = 4096):
    """(doc_id, n_tokens) -> (doc_id, n_tokens, tok_start, tok_end,
    seq_first, seq_last): the doc's span in the concatenated token
    stream and the training sequences it overlaps, packing docs in
    ascending ``doc_id`` order into ``seq_len``-token sequences."""
    from ray.data.aggregate import Sum

    def bucketed(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "_bucket", pa.array(ids // bucket_size, pa.int64()))

    with_bucket = docs_ds.map_batches(bucketed, batch_format="pyarrow",
                                      zero_copy_batch=True)
    totals = (with_bucket.select_columns(["_bucket", tokens_col])
              .groupby("_bucket")
              .aggregate(Sum(tokens_col, alias_name="_total")))
    # O(buckets) driver state: exclusive prefix over sorted buckets
    tot = totals.to_pandas().sort_values("_bucket")
    offsets = {int(b): int(o) for b, o in zip(
        tot["_bucket"],
        np.concatenate([[0], np.cumsum(tot["_total"].to_numpy())[:-1]]))}
    offsets_ref = ray.put(offsets)

    def span_group(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = g.sort_values(id_col).reset_index(drop=True)
        n = g[tokens_col].to_numpy(dtype=np.int64)
        start = int(offs[int(g["_bucket"].iloc[0])]) + \
            np.concatenate([[0], np.cumsum(n)[:-1]])
        end = start + n
        out = pd.DataFrame({
            id_col: g[id_col], tokens_col: n,
            "tok_start": start, "tok_end": end,
            "seq_first": start // seq_len,
            "seq_last": np.maximum(start, end - 1) // seq_len,
        })
        return out

    return with_bucket.groupby("_bucket").map_groups(
        span_group, batch_format="pandas")
