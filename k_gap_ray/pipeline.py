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
    annotate_single_pass: bool = False,
) -> dict[str, Any]:
    """Run the full pipeline; returns handles to every product table."""
    from concurrent.futures import ThreadPoolExecutor

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

    def _group_pending(pid: int, part) -> bool:
        stage_id = f"annotated.{pid:04d}"
        files = part if isinstance(part, list) else None
        if ck.done(stage_id):
            if files is None or ck.info(stage_id).get("files") == files:
                return False  # finished AND same input shards -> skip
        if files is not None and not files:
            ck.mark(stage_id, files=[], rows_out=0)
            return False
        return True

    def _build_group_ds(part):
        ds = part if not isinstance(part, list) else rd.read_parquet(part)
        return annotate_stage(
            extract_stage(ds, batch_size=extract_batch_size),
            compute=annotate_compute,
            concurrency=annotate_concurrency,
            batch_size=annotate_batch_size)

    def _commit_group(pid: int, part, wall_s: float) -> None:
        files = part if isinstance(part, list) else None
        part_dir = os.path.join(annotated_dir, f"part={pid:04d}")
        import pyarrow.dataset as pads
        n_out = pads.dataset(part_dir, partitioning="hive").count_rows()
        err_dir = os.path.join(part_dir, "kind=error")
        n_err = (pads.dataset(err_dir).count_rows()
                 if os.path.isdir(err_dir) else 0)
        ck.lineage("annotated", f"{pid:04d}", rows_in=-1, rows_out=n_out,
                   errors=n_err, wall_s=wall_s)
        ck.mark(f"annotated.{pid:04d}", rows_out=n_out,
                files=files if files is not None else [])

    def _run_group(pid: int, part) -> None:
        """Per-group execution: the fine-grained resume unit."""
        import shutil

        t = StageTimer()
        annotated = _build_group_ds(part)
        part_dir = os.path.join(annotated_dir, f"part={pid:04d}")
        # a failed earlier attempt may have left partial files: the
        # manifest is the source of truth, the dir is rebuilt
        shutil.rmtree(part_dir, ignore_errors=True)
        annotated.write_parquet(part_dir, partition_cols=["kind"])
        _commit_group(pid, part, t.elapsed())

    pending = [(pid, part) for pid, part in enumerate(groups)
               if _group_pending(pid, part)]

    if annotate_single_pass and len(pending) == len(groups) \
            and len(pending) > 1 \
            and all(isinstance(p, list) for _, p in pending):
        # OPT-IN: all groups in ONE streaming execution — per-group
        # branches union into a single write with a `part` partition
        # column. MEASURED SLOWER than the threaded per-group path on
        # this corpus (union+2-col partitioned write pipelines worse
        # than 4 overlapped executions: 25.8s vs 21.6s at 32 CPUs,
        # 78s vs 56-61s at 8) — kept for topologies where per-execution
        # scheduling dominates, off by default.
        import shutil

        t = StageTimer()
        branches = []
        for pid, part in pending:
            tag = f"{pid:04d}"
            shutil.rmtree(os.path.join(annotated_dir, f"part={tag}"),
                          ignore_errors=True)
            branches.append(_build_group_ds(part).map_batches(
                lambda b, p=tag: b.append_column(
                    "part", pa.array([p] * b.num_rows, pa.string())),
                batch_format="pyarrow", zero_copy_batch=True))
        unioned = branches[0].union(*branches[1:])
        unioned.write_parquet(annotated_dir, partition_cols=["part", "kind"])
        wall = t.elapsed()
        for pid, part in pending:
            _commit_group(pid, part, wall)
    else:
        # partial resume: only unfinished groups run, each its own
        # execution+manifest (groups in flight concurrently: read/
        # write/commit latency overlaps the others' compute)
        if pending:
            with ThreadPoolExecutor(max_workers=min(4, len(pending))) as pool:
                list(pool.map(lambda a: _run_group(*a), pending))

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

    def read_kind(kind: str, columns: list[str], coarse: bool = False):
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(
            annotated_dir, "part=*", f"kind={kind}", "*.parquet")))
        if coarse:
            # plan ~2 blocks per CPU at the READ instead of paying a
            # repartition barrier downstream (dedup's coalesce step)
            n = int(ray.cluster_resources().get("CPU", 8)) * 2
            return rd.read_parquet(files, columns=columns,
                                   override_num_blocks=max(8, n))
        return rd.read_parquet(files, columns=columns)

    # ---- stage 3: canonicalize ----
    if not _stage_done("entities"):
        import glob as _glob
        import shutil as _sh

        t = StageTimer()
        # kind=vocab rows (per-batch-distinct pairs emitted in-flight
        # by the annotate pass) stand in for the full mentions table:
        # same distinct pairs, orders of magnitude fewer rows, and no
        # extra scan of the mention partitions
        vocab_files = sorted(_glob.glob(os.path.join(
            annotated_dir, "part=*", "kind=vocab", "*.parquet")))
        import pyarrow.dataset as pads

        from k_gap_ray.ops.canonicalize import (
            DRIVER_CC_MAX,
            canonicalize_vocab_table,
        )

        n_vocab = (pads.dataset(vocab_files).count_rows()
                   if vocab_files else 0)  # parquet metadata, no scan
        if n_vocab <= DRIVER_CC_MAX and not force_distributed_cc:
            # vocabulary-sized: clustering runs on the driver with the
            # exact oracle kernels — zero Dataset executions
            pairs = (pads.dataset(vocab_files).to_table(
                columns=["norm_surface", "surface"]) if vocab_files
                else pa.table({"norm_surface": pa.array([], pa.string()),
                               "surface": pa.array([], pa.string())}))
            entities, mapping = canonicalize_vocab_table(pairs)
        else:
            vocab_ds = rd.read_parquet(vocab_files,
                                       columns=["norm_surface", "surface"])
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
        triples_raw = read_kind("triple", triple_cols, coarse=True)
        canonical = rewrite_triples(triples_raw, mapping_ref)
        n = materialize_graph(canonical, out_dir, n_buckets=n_buckets,
                              coalesce=False)  # read already coarse
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

    # canonicalize from the in-flight kind=vocab combiner rows (same
    # distinct pairs as the mention stream, far fewer rows)
    vocab_raw = (annotated.filter(expr="kind == 'vocab'")
                 .select_columns(["norm_surface", "surface"]))
    entities, mapping = canonicalize(
        vocab_raw, force_distributed_cc=force_distributed_cc)

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
