"""Benchmark decontamination: flag corpus documents that share token
n-grams with a held-out evaluation set.

The standard LLM training-data hygiene step (n-gram-overlap
decontamination as popularized by GPT-3/PaLM data cards): any training
document containing an n-gram that also occurs in an eval benchmark is
flagged (and typically dropped or split).  Shape of the computation:

- the EVAL side is benchmark-sized (thousands of documents) — a
  genuine small side, so its distinct n-gram set is collected once and
  broadcast via ``ray.put``; every scan task reads it zero-copy from
  the object store.  This is the documented small-side-broadcast
  pattern, NOT a corpus-sized materialization: the corpus side streams
  through ``map_batches`` and is never collected.
- the CORPUS side computes its n-grams per batch, fully vectorized
  (token split -> shifted-slice join -> ``pc.is_in`` against the
  broadcast gram set), and emits one row per contaminated document
  with integer evidence (count of DISTINCT matching n-grams), so the
  SQL oracle compares exact ints, never float thresholds.

Exactness of the per-batch distinct count: each document lives wholly
inside one batch row, so in-batch dedup of (doc, gram) pairs is global
dedup for that document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


from k_gap_ray.functions.textstats import batch_token_ngrams as _batch_ngrams


def eval_ngram_set(eval_ds, n: int = 13, text_col: str = "text"):
    """Collect the eval benchmark's DISTINCT n-grams into one object
    ref (``ray.put`` of a pyarrow StringArray).

    Small-side contract: the eval set is benchmark-sized by
    definition; its distinct-gram table is collected to the driver
    once and broadcast.  The corpus is never collected.
    """

    def grams_of(t: pa.Table) -> pa.Table:
        # id column is irrelevant for the eval side; reuse the kernel
        # with a synthetic zero id
        t2 = t.append_column("_eid", pa.array(
            np.zeros(t.num_rows, dtype=np.int64)))
        _, grams = _batch_ngrams(t2, n, "_eid", text_col)
        return pa.table({"g": pc.unique(grams)})

    distinct = (eval_ds.map_batches(grams_of, batch_format="pyarrow",
                                    zero_copy_batch=True)
                .groupby("g").count().select_columns(["g"]))
    blocks = [b for b in ray.get(distinct.to_arrow_refs())
              if b.num_rows > 0]
    if not blocks:
        return ray.put(pa.array([], pa.string()))
    tbl = pa.concat_tables(blocks)
    return ray.put(tbl.column("g").combine_chunks().cast(pa.string()))


def ngram_decontaminate(docs_ds, eval_grams_ref, n: int = 13,
                        id_col: str = "doc_id", text_col: str = "text"):
    """(doc table, broadcast eval-gram set) ->
    Dataset(doc_id, n_contaminated) for every document sharing >= 1
    token n-gram with the eval set.

    ``n_contaminated`` counts DISTINCT matching n-grams per document —
    integer evidence, oracle-comparable.  Documents with zero overlap
    are omitted (the common case at scale; callers wanting the clean
    complement anti-join on doc_id).
    """
    id_type = None

    def scan(t: pa.Table) -> pa.Table:
        grams_arr = ray.get(eval_grams_ref)  # zero-copy plasma read
        ids, grams = _batch_ngrams(t, n, id_col, text_col)
        empty = pa.table({id_col: pa.array([], t.column(id_col).type),
                          "n_contaminated": pa.array([], pa.int64())})
        if len(grams) == 0 or len(grams_arr) == 0:
            return empty
        hit = pc.is_in(grams, value_set=grams_arr)
        if not pc.any(hit).as_py():
            return empty
        ids_h = pc.filter(ids, hit)
        grams_h = pc.filter(grams, hit)
        # distinct (doc, gram) via dictionary codes + one int64 key
        enc = pc.dictionary_encode(grams_h)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nvocab = len(enc.dictionary)
        ids_np = ids_h.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_docs, doc_codes = np.unique(ids_np, return_inverse=True)
        pairs = np.unique(doc_codes * nvocab + codes)
        cnt = np.bincount(pairs // nvocab, minlength=len(uniq_docs))
        return pa.table({
            id_col: pa.array(uniq_docs).cast(t.column(id_col).type),
            "n_contaminated": pa.array(cnt, pa.int64())})

    return docs_ds.map_batches(scan, batch_format="pyarrow",
                               zero_copy_batch=True)
