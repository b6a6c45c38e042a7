"""Stage 4 — canonical rewrite, quad dedup, graph materialization.

- ``rewrite_triples`` / ``rewrite_mentions``: broadcast the
  surface->entity mapping once via ``ray.put`` and rewrite inside
  vectorized pandas ``map_batches`` (dict-map per batch; no shuffle) —
  the broadcast-small-side join pattern from SURVEY.md section 2.4 J6.
- ``dedup_quads``: exact dedup on the quad key via Ray's hash
  aggregate (partial pre-agg, no per-group Python) keeping the
  lexicographic-min provenance url — reference semantics "no duplicate
  data ingestion" (/root/reference/docs/components/ldes-consumer.md:584-592).
- ``materialize_graph``: subject-sorted triples (range-partition
  shuffle) + hash-bucketed adjacency, each written as partitioned
  Parquet so reruns/lookups touch single buckets.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_NORM_PUNCT = ".,;:"


def norm_series(s: pd.Series) -> pd.Series:
    """Vectorized twin of oracle.kernel.norm_surface (kept in lockstep)."""
    return (
        s.str.strip()
        .str.strip(_NORM_PUNCT)
        .str.casefold()
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )


def _resolve(mapping_ref):
    import ray

    return mapping_ref if isinstance(mapping_ref, dict) else ray.get(mapping_ref)


def rewrite_triples(triples_ds, mapping_ref):
    """surface subj/obj -> canonical entity IRIs (literals untouched).

    Normalization runs on the batch's UNIQUE values only (surface
    vocabulary, tiny under Zipf repetition), then a dict map replaces
    the column — regex work per batch drops from O(rows) to O(vocab).
    """

    def _uniq_replacements(values: pd.Series, mapping: dict) -> dict:
        uniq = pd.Series(values.unique())
        norms = norm_series(uniq.astype(str))
        return {u: mapping.get(n, u) for u, n in zip(uniq, norms)}

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        mapping = _resolve(mapping_ref)
        df["subj"] = df["subj"].map(_uniq_replacements(df["subj"], mapping))
        is_ent = ~df["obj_is_literal"]
        objs = df.loc[is_ent, "obj"]
        if len(objs):
            df.loc[is_ent, "obj"] = objs.map(_uniq_replacements(objs, mapping))
        return df

    return triples_ds.map_batches(rewrite, batch_format="pandas")


def rewrite_mentions(mentions_ds, mapping_ref):
    """cand_entity -> canonical entity IRI via the same broadcast map."""

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        mapping = _resolve(mapping_ref)
        ent = df["norm_surface"].map(mapping)
        df["cand_entity"] = ent.fillna(df["cand_entity"])
        return df

    return mentions_ds.map_batches(rewrite, batch_format="pandas")


QUAD_KEY = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
            "obj_lang", "graph"]
_SEP = "\x1f"  # never occurs in IRIs/surfaces/literals we emit


def coalesce_blocks(ds, per_cpu: int = 2, cap: int = 128):
    """Merge many tiny blocks into ~2 per CPU before a wide op.

    Ray's sort-based aggregate pays ~0.6s of fixed cost PER BLOCK in
    its map phase; hundreds of 10k-row blocks turn a seconds-long
    shuffle into minutes. One cheap no-sort repartition first is a
    ~5x win on every downstream groupby/sort (measured: 16s -> 3.6s
    on a 3.2M-row dedup)."""
    import ray

    n = int(ray.cluster_resources().get("CPU", 8)) * per_cpu
    return ds.repartition(max(8, min(cap, n)))


def dedup_quads(triples_ds, coalesce: bool = True):
    """Distinct quads, provenance = min url.

    Hash-partitioned dedup (SURVEY.md 7.4): a vectorized composite
    key + deterministic int hash bucket per row, local dedup as the
    combiner, then ONE int-key shuffle (groupby bucket) with a
    vectorized pandas dedup per partition. ~4x faster than Ray's
    string-key sort-aggregate (sorting 12.8M ~150-byte keys is what
    made the aggregate path slow), and the bucket count scales with
    cluster CPUs. "First" is sorted (quad_key, url), so the kept
    provenance url is the lexicographic min — block-order independent.
    """
    import pyarrow.compute as _pc
    import ray

    n_buckets = max(32, min(512, int(ray.cluster_resources()
                                     .get("CPU", 8)) * 4))

    def addkey_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # shuffle only (quad_key, url, bucket): the key losslessly
        # encodes all 7 quad columns, halving shuffle volume; columns
        # are reconstructed after the dedup
        key = (df["subj"] + _SEP + df["pred"] + _SEP + df["obj"] + _SEP
               + df["obj_is_literal"].astype(str) + _SEP
               + df["obj_datatype"].fillna("") + _SEP
               + df["obj_lang"].fillna("") + _SEP + df["graph"])
        out = pd.DataFrame({
            "quad_key": key,
            "url": df["url"],
            "bucket": (pd.util.hash_pandas_object(key, index=False)
                       % n_buckets).astype("int32"),
        })
        return out

    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["quad_key", "url"],
                              kind="mergesort").drop_duplicates("quad_key")

    def splitkey(t: pa.Table) -> pa.Table:
        parts = _pc.split_pattern(t.column("quad_key"), pattern=_SEP)
        field = [_pc.list_element(parts, i) for i in range(7)]
        return pa.table({
            "subj": field[0], "pred": field[1], "obj": field[2],
            "obj_is_literal": _pc.equal(field[3], "True"),
            "obj_datatype": field[4], "obj_lang": field[5],
            "graph": field[6], "url": t.column("url"),
        })

    # coalesce AFTER the slim-projection + combiner: the repartition
    # then moves (key, url) rows, not full triple rows — map stages are
    # indifferent to block count, only the groupby pays per-block cost
    slim = (triples_ds
            .map_batches(addkey_bucket, batch_format="pandas")
            .map_batches(local_dedup, batch_format="pandas"))  # combiner
    if coalesce:
        slim = coalesce_blocks(slim)
    return (slim
            .groupby("bucket").map_groups(local_dedup, batch_format="pandas")
            .map_batches(splitkey, batch_format="pyarrow"))


def add_subj_bucket(df: pd.DataFrame, n_buckets: int = 16) -> pd.DataFrame:
    # deterministic (fixed hash key), vectorized
    df["subj_bucket"] = (
        pd.util.hash_pandas_object(df["subj"], index=False) % n_buckets
    ).astype("int32")
    return df


def materialize_graph(triples_ds, out_dir: str, n_buckets: int = 16,
                      coalesce: bool = True):
    """Write `triples/` (subject-sorted) and `adjacency/` (hash-bucketed,
    sorted within bucket) partitioned Parquet. Returns row count."""
    deduped = dedup_quads(triples_ds, coalesce=coalesce).materialize()

    deduped.sort("subj").write_parquet(f"{out_dir}/triples")

    def sort_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["subj", "pred", "obj"], kind="mergesort")

    (
        deduped
        .map_batches(add_subj_bucket, batch_format="pandas")
        .groupby("subj_bucket")
        .map_groups(sort_bucket, batch_format="pandas")
        .write_parquet(f"{out_dir}/adjacency", partition_cols=["subj_bucket"])
    )
    return deduped.count()
