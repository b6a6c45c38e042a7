"""Triple-level transforms: CONSTRUCT vocab remap (M6), shape
validation with reject side-channel (M9), version materialization /
LDES stream semantics (M11, W1-W4, F3).

Reference semantics:
- CONSTRUCT rewrites old-vocabulary predicates to new ones
  (/root/reference/docs/components/sembench.md:437-455) — a broadcast
  dict lookup on the `pred` column.
- SHACL shapes drop members failing validation (SHAPE env,
  /root/reference/ldes-consumer/app.py:344) with
  FAILURE_IS_FATAL=false, i.e. rejects are counted, not fatal
  (app.py:342) — here rejects go to a side-channel column/dataset.
- MATERIALIZE=true strips version wrappers and keeps only the latest
  entity state (/root/reference/ldes-consumer/app.py:335;
  data/ldes-feeds-example.yml:18-19).
- Re-harvest produces no duplicate ingestion
  (/root/reference/docs/components/ldes-consumer.md:584-592).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def construct_remap(triples_ds, pred_map: dict[str, str],
                    drop_unmapped: bool = False):
    """CONSTRUCT-style vocabulary rewrite: pred -> pred_map[pred].

    The map is tiny (a vocabulary) -> shipped in the closure, applied
    as an Arrow index_in/take lookup per batch (zero pandas
    conversion); no shuffle."""
    keys = pa.array(sorted(pred_map), pa.string())
    vals = pa.array([pred_map[k] for k in sorted(pred_map)], pa.string())

    def remap(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("pred"), value_set=keys)
        if drop_unmapped:
            t = t.filter(pc.is_valid(idx))
            idx = idx.filter(pc.is_valid(idx))
            new = pc.take(vals, idx)
        else:
            new = pc.if_else(pc.is_valid(idx), pc.take(vals, idx),
                             t.column("pred"))
        return t.set_column(t.schema.get_field_index("pred"), "pred", new)

    return triples_ds.map_batches(remap, batch_format="pyarrow",
                                  zero_copy_batch=True)


# --- shape validation -------------------------------------------------------

class ShapeRule:
    """One SHACL-ish constraint on triples of a given predicate."""

    def __init__(self, pred: str, *, obj_is_iri: bool | None = None,
                 obj_pattern: str | None = None,
                 obj_datatype: str | None = None) -> None:
        self.pred = pred
        self.obj_is_iri = obj_is_iri
        self.obj_pattern = obj_pattern
        self.obj_datatype = obj_datatype


def validate_shapes(triples_ds, rules: list[ShapeRule]):
    """Returns the input with a `shape_ok:bool` + `shape_error:string`
    side-channel (FAILURE_IS_FATAL=false semantics: nothing is
    dropped; callers filter / route rejects)."""

    def check(df: pd.DataFrame) -> pd.DataFrame:
        ok = pd.Series(True, index=df.index)
        err = pd.Series("", index=df.index)
        for r in rules:
            hit = df["pred"] == r.pred
            if r.obj_is_iri is not None:
                bad = hit & (df["obj_is_literal"] == r.obj_is_iri)
                ok &= ~bad
                err = err.mask(bad & (err == ""), f"{r.pred}: wrong term kind")
            if r.obj_pattern is not None:
                bad = hit & ~df["obj"].str.match(r.obj_pattern, na=False)
                ok &= ~bad
                err = err.mask(bad & (err == ""), f"{r.pred}: pattern")
            if r.obj_datatype is not None:
                bad = hit & (df["obj_datatype"] != r.obj_datatype)
                ok &= ~bad
                err = err.mask(bad & (err == ""), f"{r.pred}: datatype")
        df["shape_ok"] = ok
        df["shape_error"] = err
        return df

    return triples_ds.map_batches(check, batch_format="pandas")


def split_valid(validated_ds):
    """(passing, rejects) pair — reject side-channel as its own Dataset."""
    passing = validated_ds.filter(expr="shape_ok == True").drop_columns(
        ["shape_ok", "shape_error"])
    rejects = validated_ds.filter(expr="shape_ok == False").drop_columns(
        ["shape_ok"])
    return passing, rejects


# --- LDES stream semantics (F3 fixture shape) -------------------------------

def materialize_latest(members_ds):
    """MATERIALIZE=true: latest version per entity (latest-wins).

    groupby(entity_uri) -> per-group max version_ts filter. Per-group
    pandas is fine here: groups are per-entity version chains (small
    and bounded), the classic map_groups case."""

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return g[g["version_ts"] == g["version_ts"].max()]

    return members_ds.groupby("entity_uri").map_groups(
        latest, batch_format="pandas")


def dedup_replayed_batches(members_ds, seen_batches: set[int]):
    """W4 no-duplicate-ingestion: drop rows whose batch_no was already
    ingested (the reference's continuation-state contract)."""
    seen = sorted(seen_batches)

    def drop_seen(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t.column("batch_no"),
                                  value_set=pa.array(seen, pa.int32())))
        return t.filter(mask)

    return members_ds.map_batches(drop_seen, batch_format="pyarrow",
                                  zero_copy_batch=True)


def feed_watermarks(members_ds):
    """W2 per-feed high-watermark: max version_ts + member count."""
    from ray.data.aggregate import Count, Max

    return members_ds.groupby("feed").aggregate(
        Max("version_ts", alias_name="watermark"),
        Count(alias_name="n_members"))


def hash_sample(ds, id_col: str, keep_pct: int, modulus: int = 100,
                mult: int = 2654435761):
    """Deterministic hash sampling (O5): keep rows where
    ``(id * mult) mod 2^32 mod modulus < keep_pct``.

    Unlike seeded random sampling this is reproducible independent of
    block layout and cluster size AND expressible in plain SQL, so the
    sample is oracle-verifiable value-for-value — the property a
    resumable 100-TB pipeline needs (re-running a failed shard must
    re-select the same rows). ``mult`` is Knuth's multiplicative-hash
    constant; ids below 2^31 keep the product inside int64."""
    import numpy as np

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = (ids * mult) % (1 << 32) % modulus
        return t.filter(pa.array(h < keep_pct))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def assign_splits(ds, id_col: str,
                  splits: list[tuple[str, int]] | None = None,
                  modulus: int = 100, mult: int = 2654435761,
                  out_col: str = "split"):
    """Deterministic train/val/test assignment: a ``split`` label per
    row from cumulative hash-bucket thresholds (``splits`` = ordered
    (name, pct) summing to ``modulus``; default 80/10/10).

    Same layout- and cluster-size-invariant multiplicative hash as
    :func:`hash_sample`, so (a) a resumed shard re-labels identically,
    (b) membership is disjoint and exhaustive BY CONSTRUCTION (one
    bucket, threshold intervals), and (c) the whole assignment is one
    SQL CASE — value-verifiable. Filter per split downstream
    (``ds.filter(expr="split = 'train'")``) or write partitioned by
    the label."""
    import numpy as np

    splits = splits or [("train", 80), ("val", 10), ("test", 10)]
    if sum(p for _, p in splits) != modulus:
        raise ValueError(f"split pcts must sum to {modulus}")
    names = np.array([n for n, _ in splits], dtype=object)
    bounds = np.cumsum([p for _, p in splits])

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = (ids * mult) % (1 << 32) % modulus
        lab = names[np.searchsorted(bounds, h, side="right")]
        return t.append_column(out_col,
                               pa.array(lab.tolist(), pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample(ds, group_col: str, rates: dict, id_col: str,
                   default_pct: int = 0, modulus: int = 100,
                   mult: int = 2654435761):
    """Data-mixture reweighting: stratified deterministic sampling
    with a per-group keep percentage (``rates[group] -> pct``; groups
    absent from ``rates`` keep ``default_pct``).

    The training-data "mixing" step — up/down-weight sources,
    languages, or quality tiers to hit a target mixture — built on the
    same layout-invariant multiplicative hash as :func:`hash_sample`,
    so the selection is reproducible shard-by-shard and SQL-mirrorable
    (a CASE over the group column).  ``rates`` is config-sized (one
    entry per source/lang), captured in the task closure — no
    broadcast machinery needed.
    """
    import numpy as np

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = (ids * mult) % (1 << 32) % modulus
        enc = pc.dictionary_encode(t.column(group_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        pct_by_val = np.array(
            [rates.get(v, default_pct)
             for v in enc.dictionary.to_pylist()], dtype=np.int64)
        idx = enc.indices
        if idx.null_count:  # null group -> default_pct
            idx = pc.fill_null(idx, -1)
        codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pct_by_val):
            pct = np.where(codes >= 0,
                           pct_by_val[np.maximum(codes, 0)], default_pct)
        else:
            pct = np.full(len(ids), default_pct, dtype=np.int64)
        return t.filter(pa.array(h < pct))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def synth_feed_members(n_entities: int = 20, versions: int = 3,
                       feeds: tuple[str, ...] = ("bodc-P02", "mtt-P02-NL"),
                       seed: int = 11) -> pa.Table:
    """Deterministic F3 fixture (FIXTURES.md): versioned stream members."""
    import datetime as dt
    import random

    from k_gap_ray.schema import FEED_MEMBERS

    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = []
    batch_no = 0
    for e in range(n_entities):
        feed = feeds[e % len(feeds)]
        uri = f"urn:kgap:concept:{feed}:{e:04d}"
        n_v = 1 + rng.randrange(versions)
        for v in range(n_v):
            ts = base + dt.timedelta(hours=e, minutes=30 * v)
            member = f"{uri}#v{v}"
            for p_i in range(1 + rng.randrange(3)):
                rows.append({
                    "feed": feed,
                    "member_id": member,
                    "entity_uri": uri,
                    "version_ts": ts,
                    "subj": uri,
                    "pred": f"urn:kgap:pred:p{p_i}",
                    "obj": f"val-{e}-{v}-{p_i}",
                    "batch_no": batch_no,
                })
            batch_no = (batch_no + 1) if rng.random() < 0.3 else batch_no
    return pa.Table.from_pylist(rows, schema=FEED_MEMBERS)


def weighted_hash_sample(ds, id_col: str, weight_col: str,
                         seed: int = 0, modulus: int = 1000):
    """Per-row weighted Bernoulli sampling, deterministically: keep a
    row iff ``mix31(id, seed) % modulus < weight`` — the
    quality/length-proportional downsampling an LLM-data pipeline runs
    (CCNet-style: keep high-quality documents with probability
    weight/modulus) without RNG state, so any engine or cluster size
    keeps the SAME rows and the keep decision is re-derivable row-by-
    row for audits.  ``weight_col`` must be an int column in
    [0, modulus] (0 = always drop, modulus = always keep).  One
    stateless map_batches pass, no shuffle; the SQL mirror
    (:func:`sql_weighted_hash_sample`) runs the identical mix."""
    import numpy as np

    from k_gap_ray.functions.shuffle import _mix

    def f(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        w = pc.cast(t.column(weight_col), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        keep = (_mix(ids, seed) % modulus) < w
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def sql_weighted_hash_sample(weight_expr: str, id_col: str = "doc_id",
                             seed: int = 0, modulus: int = 1000) -> str:
    """DuckDB keep-predicate for :func:`weighted_hash_sample`:
    ``(mix({id_col}) % modulus) < ({weight_expr})`` — compose into a
    WHERE clause."""
    from k_gap_ray.functions.shuffle import _mix_sql

    return (f"(({_mix_sql(id_col, seed)}) % {modulus})"
            f" < ({weight_expr})")
