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

def _resolve(mapping_ref):
    import ray

    return mapping_ref if isinstance(mapping_ref, dict) else ray.get(mapping_ref)


def _replace_via_uniques(col, mapping: dict):
    """Arrow-native replace: normalize+look up the column's UNIQUE
    values only (surface vocabulary, tiny under Zipf repetition), then
    project back with index_in/take. No pandas conversion, O(vocab)
    regex work per batch. Values without a mapping entry are null in
    the result (caller decides the fallback)."""
    import pyarrow.compute as _pc

    from k_gap_ray.oracle.kernel import norm_surface

    flat = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    uniq = _pc.unique(flat)
    repl = pa.array(
        [mapping.get(norm_surface(u)) if u is not None else None
         for u in uniq.to_pylist()],
        type=pa.string())
    idx = _pc.index_in(flat, value_set=uniq)
    return _pc.take(repl, idx)


def _norm_col(col) -> "pa.Array":
    """norm_surface over a string column via its UNIQUE values (tiny
    under Zipf repetition), projected back with index_in/take."""
    import pyarrow.compute as _pc

    from k_gap_ray.oracle.kernel import norm_surface

    flat = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    uniq = _pc.unique(flat)
    normed = pa.array(
        [norm_surface(u) if u is not None else None
         for u in uniq.to_pylist()], type=pa.string())
    return _pc.take(normed, _pc.index_in(flat, value_set=uniq))


def _is_mapping_ds(mapping_ref) -> bool:
    import ray.data as rd

    return isinstance(mapping_ref, rd.Dataset)


def _rewrite_col_via_join(ds, col: str, mapping_ds, guard_col=None,
                          out_cols: list | None = None):
    """Rewrite one surface column through a hash join on the mapping
    Dataset — the scale path when the vocabulary exceeds broadcast
    size. Adds a normalized key column, left-joins the mapping, then
    coalesces (unmatched or guarded rows keep their original value)."""
    import pyarrow.compute as _pc

    from k_gap_ray.dsutil import join_datasets

    keyed = ds.map_batches(
        lambda t: t.append_column("__norm", _norm_col(t.column(col))),
        batch_format="pyarrow", zero_copy_batch=True)
    m = mapping_ds.rename_columns({"norm_surface": "__norm",
                                   "entity_id": "__ent"})
    # keyed is map-produced (no empty-schema blocks); skipping the
    # scrub avoids materializing the full triple stream mid-rewrite
    joined = join_datasets(keyed, m, on="__norm", join_type="left_outer",
                           scrub_left=False)

    def finish(t: pa.Table) -> pa.Table:
        new = t.column("__ent")
        keep_old = _pc.is_null(new)
        if guard_col is not None:
            keep_old = _pc.or_(keep_old, t.column(guard_col))
        merged = _pc.if_else(keep_old, t.column(col), new)
        t = t.set_column(t.column_names.index(col), col, merged)
        t = t.drop_columns(["__norm", "__ent"])
        return t.select(out_cols) if out_cols else t

    return joined.map_batches(finish, batch_format="pyarrow")


def rewrite_triples(triples_ds, mapping_ref):
    """surface subj/obj -> canonical entity IRIs (literals untouched).

    Broadcast path (dict / ObjectRef mapping): dict lookup over batch
    uniques, zero shuffle. Dataset mapping: two hash joins (subj, then
    obj) — the documented path when the surface vocabulary exceeds the
    broadcast cap (round-1 review item: the scale claim is now code)."""
    import pyarrow.compute as _pc

    if _is_mapping_ds(mapping_ref):
        cols = triples_ds.schema().names
        out = _rewrite_col_via_join(triples_ds, "subj", mapping_ref)
        return _rewrite_col_via_join(out, "obj", mapping_ref,
                                     guard_col="obj_is_literal",
                                     out_cols=cols)

    def rewrite(t: pa.Table) -> pa.Table:
        mapping = _resolve(mapping_ref)
        subj_new = _replace_via_uniques(t.column("subj"), mapping)
        subj = _pc.if_else(_pc.is_valid(subj_new), subj_new,
                           t.column("subj"))
        obj_new = _replace_via_uniques(t.column("obj"), mapping)
        keep = _pc.or_(t.column("obj_is_literal"),
                       _pc.is_null(obj_new))
        obj = _pc.if_else(keep, t.column("obj"), obj_new)
        t = t.set_column(t.column_names.index("subj"), "subj", subj)
        return t.set_column(t.column_names.index("obj"), "obj", obj)

    return triples_ds.map_batches(rewrite, batch_format="pyarrow",
                                  zero_copy_batch=True)


def rewrite_mentions(mentions_ds, mapping_ref):
    """cand_entity -> canonical entity IRI (broadcast map or join)."""
    import pyarrow.compute as _pc

    if _is_mapping_ds(mapping_ref):
        from k_gap_ray.dsutil import join_datasets

        cols = mentions_ds.schema().names
        m = mapping_ref.rename_columns({"entity_id": "__ent"})
        joined = join_datasets(mentions_ds, m, on="norm_surface",
                               join_type="left_outer",
                               scrub_left=False)  # read/map-produced

        def finish(t: pa.Table) -> pa.Table:
            cand = _pc.if_else(_pc.is_null(t.column("__ent")),
                               t.column("cand_entity"), t.column("__ent"))
            t = t.set_column(t.column_names.index("cand_entity"),
                             "cand_entity", cand)
            return t.select(cols)

        return joined.map_batches(finish, batch_format="pyarrow")

    def rewrite(t: pa.Table) -> pa.Table:
        mapping = _resolve(mapping_ref)
        ent = _replace_via_uniques(t.column("norm_surface"), mapping)
        cand = _pc.if_else(_pc.is_valid(ent), ent, t.column("cand_entity"))
        return t.set_column(t.column_names.index("cand_entity"),
                            "cand_entity", cand)

    return mentions_ds.map_batches(rewrite, batch_format="pyarrow",
                                   zero_copy_batch=True)


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

    def addkey(t: pa.Table) -> pa.Table:
        # arrow-native slim projection: cheap even over many tiny
        # blocks (no pandas conversion); the key losslessly encodes
        # all 7 quad columns, halving shuffle volume
        key = _pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"),
            _pc.cast(t.column("obj_is_literal"), pa.string()),
            _pc.fill_null(t.column("obj_datatype"), ""),
            _pc.fill_null(t.column("obj_lang"), ""),
            t.column("graph"), _SEP)
        return pa.table({"quad_key": key, "url": t.column("url")})

    def bucket_dedup(df: pd.DataFrame) -> pd.DataFrame:
        # pandas only AFTER coalesce -> few big blocks pay conversion
        df["bucket"] = (pd.util.hash_pandas_object(df["quad_key"],
                                                   index=False)
                        % n_buckets).astype("int32")
        return df.sort_values(["quad_key", "url"],
                              kind="mergesort").drop_duplicates("quad_key")

    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["quad_key", "url"],
                              kind="mergesort").drop_duplicates("quad_key")

    def splitkey(t: pa.Table) -> pa.Table:
        parts = _pc.split_pattern(t.column("quad_key"), pattern=_SEP)
        # lossless-round-trip guard: a \x1f inside any column value
        # (possible for externally-parsed RDF literals, sources/rdfio)
        # adds separators, so any corrupted row splits into != 7 parts
        # — fail fast instead of silently mis-splitting. NOTE: null
        # obj_datatype/obj_lang round-trip as "" by design.
        n_parts = _pc.list_value_length(parts)
        if t.num_rows and not _pc.all(_pc.equal(n_parts, 7)).as_py():
            bad = t.filter(_pc.not_equal(n_parts, 7))
            raise ValueError(
                "dedup_quads: quad column contains the \\x1f separator; "
                f"first corrupted key: {bad.column('quad_key')[0].as_py()!r}")
        field = [_pc.list_element(parts, i) for i in range(7)]
        return pa.table({
            "subj": field[0], "pred": field[1], "obj": field[2],
            "obj_is_literal": _pc.equal(field[3], "true"),
            "obj_datatype": field[4], "obj_lang": field[5],
            "graph": field[6], "url": t.column("url"),
        })

    slim = triples_ds.map_batches(addkey, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if coalesce:
        slim = coalesce_blocks(slim)
    return (slim
            .map_batches(bucket_dedup, batch_format="pandas")  # combiner
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
    sorted within bucket) partitioned Parquet. Returns row count.

    The two writes consume the same materialized dedup output and run
    SEQUENTIALLY on purpose: each is internally parallel, and running
    both shuffles concurrently measured slower at every CPU level
    (they contend for the same cores)."""
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
