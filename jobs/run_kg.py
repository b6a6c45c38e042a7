"""`ray job submit` entrypoint for the KG-construction pipeline.

The north-star deployment runs this on a fixed-size multi-node Ray
cluster (see jobs/submit.sh for the N / 4N submissions). As a job
driver it owns the Ray session: inside a submitted job `ray.init()`
with no address attaches to the hosting cluster via RAY_ADDRESS;
standalone (local smoke) the same call starts a local session. The
pipeline itself (k_gap_ray.pipeline.run_pipeline) is unchanged — this
wrapper only parses arguments, sizes the stage knobs from the
cluster, and prints the end-of-run metrics JSON (counters + the
per-partition lineage written as parquet under <out>/lineage by the
checkpointed stages, SURVEY.md 4.4).

Resume semantics: rerunning the SAME command with the same --out-dir
skips every partition group whose manifest exists under <out>/_ckpt —
the crash-resume contract the test suite kills mid-run to verify.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `ray job submit --working-dir .` puts the repo root on the path;
# running the script directly from anywhere should work the same way
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pages", help="pages parquet path/dir (columns "
                                  "url, warc_ts, html, text, lang)")
    ap.add_argument("--out-dir", required=True,
                    help="output root: triples/ mentions/ adjacency/ "
                         "entities/ lineage/ _ckpt/")
    ap.add_argument("--annotate-partitions", type=int, default=None,
                    help="checkpoint groups (default: 2x cluster CPUs "
                         "/ 32, min 8 — one resume unit per ~16 cores)")
    ap.add_argument("--annotate-compute", default="tasks",
                    choices=["tasks", "actors"])
    ap.add_argument("--extract-batch-size", type=int, default=256)
    ap.add_argument("--annotate-batch-size", type=int, default=512)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init()  # in a submitted job this attaches to the cluster
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.WARNING)

    from k_gap_ray.pipeline import run_pipeline

    cpus = int(ray.cluster_resources().get("CPU", 8))
    parts = args.annotate_partitions or max(8, (2 * cpus) // 32)

    t0 = time.perf_counter()
    res = run_pipeline(
        args.pages, out_dir=args.out_dir,
        annotate_compute=args.annotate_compute,
        annotate_partitions=parts,
        extract_batch_size=args.extract_batch_size,
        annotate_batch_size=args.annotate_batch_size)
    wall = time.perf_counter() - t0

    n_triples = res["triples"].count()
    lineage = res["lineage"].to_pandas()
    print(json.dumps({
        "out_dir": res["out_dir"],
        "wall_sec": round(wall, 3),
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / wall, 1),
        "cluster_cpus": cpus,
        "annotate_partitions": parts,
        "lineage_rows": len(lineage),
        "stage_wall_sec": {
            s: round(float(w), 3) for s, w in
            lineage.groupby("stage")["wall_s"].sum().items()},
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
