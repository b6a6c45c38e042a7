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

    One vectorized composite key (binary_join_element_wise) + a
    single-key hash aggregate, then a vectorized split back into
    columns — an order of magnitude faster than Ray's multi-key
    groupby+aggregate path, and the single string key is also what a
    10^12-row dedup would hash-partition on (SURVEY.md 7.4)."""
    import pyarrow.compute as _pc

    from ray.data.aggregate import Min

    def addkey(t: pa.Table) -> pa.Table:
        key = _pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"),
            _pc.cast(t.column("obj_is_literal"), pa.string()),
            _pc.fill_null(t.column("obj_datatype"), ""),
            _pc.fill_null(t.column("obj_lang"), ""),
            t.column("graph"), _SEP)
        return pa.table({"quad_key": key, "url": t.column("url")})

    def splitkey(t: pa.Table) -> pa.Table:
        parts = _pc.split_pattern(t.column("quad_key"), pattern=_SEP)
        field = [_pc.list_element(parts, i) for i in range(7)]
        return pa.table({
            "subj": field[0], "pred": field[1], "obj": field[2],
            "obj_is_literal": _pc.equal(field[3], "true"),
            "obj_datatype": field[4], "obj_lang": field[5],
            "graph": field[6], "url": t.column("url"),
        })

    def local_min(t: pa.Table) -> pa.Table:
        # combiner: per-batch (quad_key -> min url) before the shuffle
        g = pa.TableGroupBy(t, "quad_key").aggregate([("url", "min")])
        return pa.table({"quad_key": g.column("quad_key"),
                         "url": g.column("url_min")})

    src = coalesce_blocks(triples_ds) if coalesce else triples_ds
    out = (src
           .map_batches(addkey, batch_format="pyarrow", zero_copy_batch=True)
           .map_batches(local_min, batch_format="pyarrow")
           .groupby("quad_key").aggregate(Min("url", alias_name="url"))
           .map_batches(splitkey, batch_format="pyarrow"))
    return out


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
