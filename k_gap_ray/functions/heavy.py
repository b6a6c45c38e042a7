"""Exact top-k heavy hitters with frequent-items candidate pruning.

The scale problem: "top-k most frequent tokens" done as a full
vocabulary aggregate (`vocab_df` -> sort -> limit) shuffles the ENTIRE
distinct vocabulary — fine at gigabytes, wasteful at 100 TB where the
answer is 20 rows. The classic fix (Misra-Gries 1982 / the "Frequent"
algorithm, public) bounds what leaves each batch:

- **Pass A (candidates)**: each batch keeps only its top ``counters``
  tokens by in-batch count. A token absent from a batch's summary has
  in-batch count <= N_i/(counters+1) (there are counters+1 tokens at
  least as frequent), so a token absent from EVERY summary has global
  count <= N/(counters+1): the union of per-batch summaries contains
  every possible heavy hitter. At most ``counters`` rows leave a
  batch, independent of batch size or vocabulary.
- **Pass B (exact verify)**: the candidate set is broadcast
  (``ray.put`` once) and one more streaming pass counts ONLY
  candidates exactly — per-batch partials are bounded by the
  candidate-set size and merge by addition on the driver.
- **Guarantee check**: the result is certified exact iff the k-th
  candidate count strictly beats the pruning bound,
  ``tf_k * (counters+1) > N`` (integer arithmetic, no division).
  Otherwise the code falls back to the full vocabulary aggregate —
  correctness never depends on the tuning.

Deterministic contract (mirrored by :func:`sql_heavy_hitters`):
tokens are ``string_split(text, ' ')``; ranking is
``ORDER BY tf DESC, token ASC`` (UTF-8 byte order == codepoint
order), ranks 1..k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from k_gap_ray.functions.textstats import _tokens_of

_CAND_CAP = 2_000_000


def _batch_tf(t: pa.Table, text_col: str):
    """In-batch exact (vocab StringArray, tf int64 ndarray, total)."""
    import pyarrow.compute as pc

    flat, _, _ = _tokens_of(t.column(text_col))
    if len(flat) == 0:
        return None
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tf = np.bincount(codes, minlength=len(enc.dictionary))
    return enc.dictionary, tf, len(flat)


def _merge_counts(parts) -> pd.DataFrame:
    frames = []
    for p in parts:
        if not isinstance(p, pa.Table):
            p = pa.Table.from_pandas(p, preserve_index=False)
        if p.num_rows:
            frames.append(p.to_pandas())
    if not frames:
        return pd.DataFrame({"token": pd.Series([], dtype=str),
                             "tf": pd.Series([], dtype="int64")})
    df = pd.concat(frames, ignore_index=True)
    return df.groupby("token", as_index=False, sort=False).sum()


def heavy_hitters(ds, k: int = 20, counters: int = 64,
                  text_col: str = "text"):
    """-> pa.Table (rank, token, tf): the EXACT top-k tokens."""
    import ray

    if k <= 0 or counters <= 0:
        raise ValueError("k and counters must be positive")
    ds = ds.materialize()           # passes A and B both consume it

    def cand_partial(t: pa.Table, _c=counters) -> pa.Table:
        bt = _batch_tf(t, text_col)
        if bt is None:
            return pa.table({"token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "tot": pa.array([], pa.int64())})
        vocab, tf, total = bt
        if len(tf) > _c:
            keep = np.argpartition(tf, -_c)[-_c:]
        else:
            keep = np.arange(len(tf))
        tot = np.zeros(len(keep), dtype=np.int64)
        tot[0] = total                 # batch token total rides row 0
        return pa.table({"token": vocab.take(pa.array(keep, pa.int64())),
                         "tf": pa.array(tf[keep], pa.int64()),
                         "tot": pa.array(tot, pa.int64())})

    cands: set[str] = set()
    n_total = 0
    for p in ray.get(ds.map_batches(cand_partial, batch_format="pyarrow",
                                    zero_copy_batch=True).to_arrow_refs()):
        if not isinstance(p, pa.Table):
            p = pa.Table.from_pandas(p, preserve_index=False)
        if p.num_rows == 0:
            continue
        cands.update(p.column("token").to_pylist())
        n_total += int(np.sum(p.column("tot").to_numpy(
            zero_copy_only=False)))
        if len(cands) > _CAND_CAP:
            raise ValueError(
                f"candidate set exceeds {_CAND_CAP}; raise `counters` "
                "pruning or the cap")

    cand_arr = pa.array(sorted(cands), pa.string())
    cand_ref = ray.put(cand_arr)

    def exact_partial(t: pa.Table, _ref=cand_ref) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _r

        bt = _batch_tf(t, text_col)
        if bt is None:
            return pa.table({"token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        vocab, tf, _ = bt
        mask = pc.is_in(vocab, value_set=_r.get(_ref))
        m = mask.to_numpy(zero_copy_only=False)
        keep = np.nonzero(m)[0]
        return pa.table({"token": vocab.take(pa.array(keep, pa.int64())),
                         "tf": pa.array(tf[keep], pa.int64())})

    exact = _merge_counts(ray.get(ds.map_batches(
        exact_partial, batch_format="pyarrow",
        zero_copy_batch=True).to_arrow_refs()))
    top = (exact.sort_values(["tf", "token"], ascending=[False, True])
           .head(k).reset_index(drop=True))

    certified = (len(top) == k
                 and int(top.iloc[-1].tf) * (counters + 1) > n_total)
    if not certified and n_total > 0:
        # pruning bound not beaten: a non-candidate could tie/beat the
        # tail — fall back to the full-vocabulary exact aggregate
        from k_gap_ray.functions.textstats import vocab_df

        full = (vocab_df(ds, text_col=text_col)
                .select_columns(["token", "tf"])
                .sort(["tf", "token"], descending=[True, False])
                .limit(k).to_pandas())
        top = full.reset_index(drop=True)
    top["tf"] = top["tf"].astype("int64")
    return pa.table({
        "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        "token": pa.array(top["token"], pa.string()),
        "tf": pa.array(top["tf"].to_numpy(), pa.int64())})


def sql_heavy_hitters(k: int = 20, text_col: str = "text",
                      rel: str = "documents") -> str:
    return f"""
        WITH tf AS (
            SELECT token, count(*)::BIGINT AS tf
            FROM (SELECT unnest(string_split(coalesce({text_col}, ''),
                                             ' ')) AS token
                  FROM {rel})
            GROUP BY token)
        SELECT row_number() OVER (ORDER BY tf DESC, token ASC)::BIGINT
                   AS rank,
               token, tf
        FROM tf ORDER BY tf DESC, token ASC LIMIT {k}
    """
