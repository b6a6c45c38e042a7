"""jobs/run_kg.py — the `ray job submit` entrypoint.

Run as a subprocess (the entrypoint owns its own Ray session, which
must not collide with the test session's): a fresh run over a tiny
pages corpus prints the metrics JSON with per-stage lineage sums, and
rerunning the same command resumes from the manifests instead of
recomputing."""

import json
import shutil
import subprocess
import sys


def _run(pages_dir: str, out_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "jobs/run_kg.py", pages_dir,
         "--out-dir", out_dir, "--annotate-partitions", "4"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_job_entry_runs_and_resumes(tmp_path, pages_table):
    import pyarrow.parquet as pq

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pq.write_table(pages_table, pages_dir / "part-0.parquet")
    out = str(tmp_path / "kg_out")

    first = _run(str(pages_dir), out)
    assert first["n_triples"] > 0
    assert first["annotate_partitions"] == 4
    assert set(first["stage_wall_sec"]) >= {"annotated", "graph"}
    assert first["lineage_rows"] >= 4  # one per partition group + stages

    resumed = _run(str(pages_dir), out)
    assert resumed["n_triples"] == first["n_triples"]
    # the resume skipped the annotate groups: lineage is unchanged
    assert resumed["lineage_rows"] == first["lineage_rows"]
    shutil.rmtree(out, ignore_errors=True)
