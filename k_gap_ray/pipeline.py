"""End-to-end KG-construction pipeline (the engine's flagship).

    pages --extract--> text --annotate(tasks w/ per-worker state, or
          actor pool for heavyweight models)--> annotated (+ per-group
          vocab side-product)
          --canonicalize(LSH+union-find over the vocabulary)--> entities
          --rewrite+dedup+sort--> triples/ mentions/ adjacency/ Parquet

Two modes:
- ``run_pipeline(pages, out_dir=...)`` — checkpointed: each stage
  boundary is partitioned Parquet + a manifest; a rerun skips finished
  stages (resume semantics per SURVEY.md 4.4). Stage outputs are read
  back from Parquet so no stage is ever recomputed for a second
  consumer, and the `kind` partition column lets the triples/mentions
  splits prune each other's files at the read.
- ``run_pipeline(pages)`` — in-memory: the (html-free, much smaller)
  annotated dataset is materialized in the object store and split;
  used by tests and ``entry()``.

Never calls ray.init — sessions belong to the caller.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa

from k_gap_ray.checkpoint import Checkpoint, StageTimer
from k_gap_ray.ops.annotate import annotate_stage, split_annotated
from k_gap_ray.ops.canonicalize import canonicalize
from k_gap_ray.ops.extract import extract_stage
from k_gap_ray.ops.materialize import (
    dedup_quads,
    materialize_graph,
    rewrite_mentions,
    rewrite_triples,
)


def _stabilize_fsspec_http() -> None:
    """Make Ray's lazy `from fsspec.implementations.http import
    HTTPFileSystem` deterministic under threads.

    In this environment that import fails (no aiohttp). A failed import
    is NOT cached, so when two pipeline threads hit Ray's path
    resolution together, one sees a partially-initialized module and
    gets ImportError (which escapes Ray's ModuleNotFoundError handler)
    instead of the clean failure. Registering a minimal stand-in module
    makes the import succeed once and forever; the class is only ever
    used in isinstance checks, which correctly stay False for our
    local filesystems."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # isinstance-only stand-in
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _write_group_vocab(out_dir: str, pid: int, part_dir: str) -> None:
    """Side-product of the annotate pass: the group's distinct
    (norm_surface, surface) pairs — a combiner-at-source. The entities
    stage then unions these tiny per-group vocabularies instead of
    rescanning the full mentions table (vocabulary <<< corpus)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    mention_dir = os.path.join(part_dir, "kind=mention")
    vocab_dir = os.path.join(out_dir, "vocab")
    os.makedirs(vocab_dir, exist_ok=True)
    out_path = os.path.join(vocab_dir, f"part-{pid:04d}.parquet")
    if not os.path.isdir(mention_dir):
        pq.write_table(pa.schema([("norm_surface", pa.string()),
                                  ("surface", pa.string())]).empty_table(),
                       out_path)
        return
    t = pads.dataset(mention_dir).to_table(columns=["norm_surface",
                                                    "surface"])
    df = t.to_pandas().drop_duplicates()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), out_path)


def _as_dataset(pages):
    import ray.data as rd

    if isinstance(pages, (str, list)):
        return rd.read_parquet(pages)
    return pages


def _partition_groups(pages, n_groups: int) -> list:
    """Split the input into checkpoint units.

    Files are assigned to groups by a STABLE hash of the file name, so
    an appended input shard (incremental crawl, late data — W3) lands
    in exactly one group and only that group's checkpoint is
    invalidated; round-robin would reshuffle every assignment. An
    already-built Dataset is a single unit."""
    import glob as _glob
    import zlib

    if isinstance(pages, str):
        files = sorted(_glob.glob(os.path.join(pages, "*.parquet"))) or [pages]
    elif isinstance(pages, list):
        files = sorted(pages)
    else:
        return [pages]
    # FIXED modulus (never len(files)): with fewer shards than groups,
    # appending one shard must not change the modulus and reshuffle
    # every file->group assignment (full checkpoint invalidation);
    # empty groups are cheap (files==[] early-mark path in _run_group)
    n = max(1, n_groups)
    groups: list[list[str]] = [[] for _ in range(n)]
    for f in files:
        groups[zlib.crc32(os.path.basename(f).encode()) % n].append(f)
    return groups


def run_pipeline(
    pages,
    out_dir: str | None = None,
    *,
    annotate_compute: str = "tasks",
    annotate_concurrency=None,
    extract_batch_size: int = 256,
    annotate_batch_size: int = 512,
    annotate_partitions: int = 4,
    n_buckets: int = 16,
    force_distributed_cc: bool = False,
) -> dict[str, Any]:
    """Run the full pipeline; returns handles to every product table."""
    import ray
    import ray.data as rd

    if out_dir is None:
        return _run_in_memory(pages, annotate_compute, annotate_concurrency,
                              extract_batch_size, annotate_batch_size,
                              force_distributed_cc)

    _stabilize_fsspec_http()

    ck = Checkpoint(out_dir)
    annotated_dir = os.path.join(out_dir, "annotated")

    # ---- stage 1+2: extract + annotate -> partitioned parquet ----
    # Input shards are grouped into `annotate_partitions` checkpoint
    # units: each finished group has its own manifest + lineage row, so
    # a killed run resumes at the first unfinished group (per-partition
    # resume, SURVEY.md 4.4). Groups run sequentially; each is fully
    # parallel inside, so the barrier cost is one pipeline drain per
    # group.
    groups = _partition_groups(pages, annotate_partitions)

    def _run_group(pid: int, part) -> None:
        stage_id = f"annotated.{pid:04d}"
        files = part if isinstance(part, list) else None
        if ck.done(stage_id):
            if files is None or ck.info(stage_id).get("files") == files:
                return  # finished AND same input shards -> skip
        if files is not None and not files:
            ck.mark(stage_id, files=[], rows_out=0)
            return
        t = StageTimer()
        ds = part if not isinstance(part, list) else rd.read_parquet(part)
        annotated = annotate_stage(
            extract_stage(ds, batch_size=extract_batch_size),
            compute=annotate_compute,
            concurrency=annotate_concurrency,
            batch_size=annotate_batch_size)
        part_dir = os.path.join(annotated_dir, f"part={pid:04d}")
        # a failed earlier attempt may have left partial files: the
        # manifest is the source of truth, the dir is rebuilt
        import shutil

        shutil.rmtree(part_dir, ignore_errors=True)
        annotated.write_parquet(part_dir, partition_cols=["kind"])
        import pyarrow.dataset as pads
        n_out = pads.dataset(part_dir, partitioning="hive").count_rows()
        err_dir = os.path.join(part_dir, "kind=error")
        n_err = (pads.dataset(err_dir).count_rows()
                 if os.path.isdir(err_dir) else 0)
        _write_group_vocab(out_dir, pid, part_dir)
        ck.lineage("annotated", f"{pid:04d}", rows_in=-1, rows_out=n_out,
                   errors=n_err, wall_s=t.elapsed())
        ck.mark(stage_id, rows_out=n_out,
                files=files if files is not None else [])

    # groups in flight concurrently: each group's read/write/commit
    # latency overlaps the others' compute; Ray time-slices the CPUs
    # across the concurrent executions. Checkpoint units stay
    # independent — each group has its own dir + manifest.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, len(groups))) as pool:
        list(pool.map(lambda a: _run_group(*a), enumerate(groups)))

    # signature of the annotated stage's input: downstream manifests
    # recorded against a different signature are stale (incremental
    # append invalidates them; an identical rerun is a no-op)
    import hashlib as _hashlib
    import json as _json

    input_sig = _hashlib.blake2b(
        _json.dumps([[pid, part if isinstance(part, list) else "dataset"]
                     for pid, part in enumerate(groups)]).encode(),
        digest_size=12).hexdigest()
    ck.mark("annotated", n_partitions=len(groups), input_sig=input_sig)

    def _stage_done(stage: str) -> bool:
        return ck.done(stage) and ck.info(stage).get("input_sig") == input_sig

    triple_cols = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
                   "obj_lang", "graph", "url"]
    mention_cols = ["url", "surface", "norm_surface", "start", "end",
                    "ner_type", "cand_entity", "link_score"]

    def read_kind(kind: str, columns: list[str]):
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(
            annotated_dir, "part=*", f"kind={kind}", "*.parquet")))
        return rd.read_parquet(files, columns=columns)

    # ---- stage 3: canonicalize ----
    if not _stage_done("entities"):
        import glob as _glob
        import shutil as _sh

        t = StageTimer()
        # per-group vocab side-products (written by the annotate pass)
        # stand in for the full mentions table: same distinct pairs,
        # orders of magnitude fewer rows
        vocab_files = sorted(_glob.glob(
            os.path.join(out_dir, "vocab", "part-*.parquet")))
        vocab_ds = rd.read_parquet(vocab_files)
        entities, mapping = canonicalize(
            vocab_ds, force_distributed_cc=force_distributed_cc)
        _sh.rmtree(os.path.join(out_dir, "entities"), ignore_errors=True)
        _sh.rmtree(os.path.join(out_dir, "mapping"), ignore_errors=True)
        if isinstance(mapping, dict):
            # driver-vocabulary path: single parquet + JSON map
            import pyarrow.parquet as pq
            os.makedirs(os.path.join(out_dir, "entities"), exist_ok=True)
            pq.write_table(entities, os.path.join(
                out_dir, "entities", "part-00000.parquet"))
            ck.save_json("mapping.json", mapping)
            n_entities = entities.num_rows
        else:
            # distributed path: both products are Datasets; the mapping
            # persists as parquet and is re-read for the join rewrites
            entities.write_parquet(os.path.join(out_dir, "entities"))
            mapping.write_parquet(os.path.join(out_dir, "mapping"))
            mapping = rd.read_parquet(os.path.join(out_dir, "mapping"))
            n_entities = rd.read_parquet(
                os.path.join(out_dir, "entities")).count()
        ck.lineage("entities", "all", rows_in=-1,
                   rows_out=n_entities, wall_s=t.elapsed())
        ck.mark("entities", rows_out=n_entities, input_sig=input_sig)
    elif os.path.exists(os.path.join(out_dir, "_ckpt", "mapping.json")):
        mapping = ck.load_json("mapping.json")
    else:
        mapping = rd.read_parquet(os.path.join(out_dir, "mapping"))

    mapping_ref = ray.put(mapping) if isinstance(mapping, dict) else mapping

    # ---- stages 4+5 (independent given annotated+mapping): overlap ----
    def _stage_graph() -> None:
        if _stage_done("graph"):
            return
        import shutil as _sh

        _sh.rmtree(os.path.join(out_dir, "triples"), ignore_errors=True)
        _sh.rmtree(os.path.join(out_dir, "adjacency"), ignore_errors=True)
        t = StageTimer()
        triples_raw = read_kind("triple", triple_cols)
        canonical = rewrite_triples(triples_raw, mapping_ref)
        n = materialize_graph(canonical, out_dir, n_buckets=n_buckets)
        ck.lineage("graph", "all", rows_in=-1, rows_out=n, wall_s=t.elapsed())
        ck.mark("graph", rows_out=n, input_sig=input_sig)

    def _stage_mentions() -> None:
        if _stage_done("mentions"):
            return
        import shutil as _sh

        _sh.rmtree(os.path.join(out_dir, "mentions"), ignore_errors=True)
        t = StageTimer()
        mentions_raw = read_kind("mention", mention_cols)
        rewritten = rewrite_mentions(mentions_raw, mapping_ref)
        rewritten.write_parquet(os.path.join(out_dir, "mentions"))
        ck.lineage("mentions", "all", rows_in=-1, rows_out=-1,
                   wall_s=t.elapsed())
        ck.mark("mentions", input_sig=input_sig)

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_stage_graph), pool.submit(_stage_mentions)]
        for f in futs:
            f.result()

    return {
        "out_dir": out_dir,
        "triples": rd.read_parquet(os.path.join(out_dir, "triples")),
        "mentions": rd.read_parquet(os.path.join(out_dir, "mentions")),
        "adjacency": rd.read_parquet(os.path.join(out_dir, "adjacency")),
        "entities": rd.read_parquet(os.path.join(out_dir, "entities")),
        "lineage": rd.read_parquet(os.path.join(out_dir, "lineage")),
        "mapping": mapping,
    }


def _run_in_memory(pages, annotate_compute, annotate_concurrency,
                   extract_batch_size, annotate_batch_size,
                   force_distributed_cc):
    import ray

    ds = _as_dataset(pages)
    annotated = annotate_stage(
        extract_stage(ds, batch_size=extract_batch_size),
        compute=annotate_compute,
        concurrency=annotate_concurrency,
        batch_size=annotate_batch_size,
    ).materialize()  # html-free; split below consumes it twice
    triples_raw, mentions_raw = split_annotated(annotated)

    entities, mapping = canonicalize(
        mentions_raw, force_distributed_cc=force_distributed_cc)

    # dict vocabulary -> ray.put broadcast; Dataset vocabulary (the
    # distributed path) flows into join-based rewrites as-is
    mapping_ref = ray.put(mapping) if isinstance(mapping, dict) else mapping
    canonical_triples = dedup_quads(
        rewrite_triples(triples_raw, mapping_ref)).materialize()
    canonical_mentions = rewrite_mentions(mentions_raw, mapping_ref)

    return {
        "triples": canonical_triples,
        "mentions": canonical_mentions,
        "entities": entities,
        "mapping": mapping,
    }
