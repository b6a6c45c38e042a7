"""Stage-boundary checkpoints + lineage counters (SURVEY.md 4.4-4.5).

Plays the role of the reference's per-feed `/state` continuation dirs
(/root/reference/ldes-consumer/app.py:299-305): a completed stage
writes a manifest; a rerun skips stages whose manifest exists, so the
job resumes from the last finished boundary with no duplicate output
(the "no duplicate data ingestion" contract,
/root/reference/docs/components/ldes-consumer.md:584-592).

Every stage also appends a lineage row (rows_in/rows_out/errors/wall)
to a Parquet `lineage/` table — the per-partition lineage + metrics
required by the north rule.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from k_gap_ray.schema import LINEAGE


class Checkpoint:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.ckpt_dir = os.path.join(out_dir, "_ckpt")
        self.lineage_dir = os.path.join(out_dir, "lineage")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self.ckpt_dir, f"{stage}.done.json")

    def done(self, stage: str) -> bool:
        return os.path.exists(self._manifest(stage))

    def info(self, stage: str) -> dict:
        with open(self._manifest(stage)) as f:
            return json.load(f)

    def mark(self, stage: str, **info) -> None:
        tmp = self._manifest(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "completed_at": time.time(), **info}, f)
        os.replace(tmp, self._manifest(stage))  # atomic

    def lineage(self, stage: str, partition_id: str, rows_in: int,
                rows_out: int, errors: int = 0, nbytes: int = 0,
                wall_s: float = 0.0) -> None:
        t = pa.table({
            "stage": [stage], "partition_id": [partition_id],
            "rows_in": [rows_in], "rows_out": [rows_out],
            "errors": [errors], "bytes": [nbytes], "wall_s": [wall_s],
        }, schema=LINEAGE)
        path = os.path.join(self.lineage_dir,
                            f"stage={stage}-part={partition_id}.parquet")
        pq.write_table(t, path)

    def save_json(self, name: str, obj) -> None:
        tmp = os.path.join(self.ckpt_dir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, os.path.join(self.ckpt_dir, name))

    def load_json(self, name: str):
        with open(os.path.join(self.ckpt_dir, name)) as f:
            return json.load(f)


class StageTimer:
    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0
