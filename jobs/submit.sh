#!/usr/bin/env bash
# North-star submission: the same job at two fixed cluster sizes
# (N and 4N nodes) to measure throughput scaling efficiency >= 0.8.
# In this single-node sandbox the equivalent evidence is
# `python bench.py --scaling` (two pinned parallelism levels in fresh
# processes; protocol + measured numbers in BENCH/BASELINE.md and
# BENCH/scaling_r*.json) — these commands are the cluster form.
#
# Usage: RAY_ADDRESS=http://<head>:8265 ./jobs/submit.sh \
#          s3://bucket/pages/ s3://bucket/kg_out/
set -euo pipefail

PAGES=${1:?pages parquet path}
OUT=${2:?output root}

# working_dir ships the repo; the pipeline reads/writes parquet via
# fsspec, so any path Ray workers can reach (s3://, gs://, nfs) works.
ray job submit \
  --working-dir . \
  --runtime-env-json '{"py_modules": ["k_gap_ray"]}' \
  -- python jobs/run_kg.py "$PAGES" --out-dir "$OUT"

# Re-running the same command resumes: finished partition groups are
# skipped via their manifests under $OUT/_ckpt (per-partition lineage
# + metrics land under $OUT/lineage as parquet).
#
# Scaling protocol (north rule): submit once against the N-node
# cluster and once against the 4N-node cluster (same $PAGES, fresh
# $OUT each), then compare the printed triples_per_sec:
#   eff = (tps_4N / tps_N) / 4      # >= 0.8 required
