"""D4 — orphan cleanup: state minus config (SURVEY.md section 2.7).

The reference reconciles running ldes2sparql containers against the
configured feed list and removes orphans
(/root/reference/ldes-consumer/app.py:242-272). Our equivalent
reconciles on-disk partition state against the configured input: any
`annotated/part=*` / `vocab/part-*` unit whose manifest no longer
matches a configured group is an orphan. Driver-side set difference
over partition manifests — no data pass.
"""

from __future__ import annotations

import glob
import os
import shutil


def find_orphans(out_dir: str, configured_groups: list[int]) -> list[str]:
    """Paths of partition dirs/manifests not backed by the config."""
    want = {f"{pid:04d}" for pid in configured_groups}
    orphans: list[str] = []
    for d in glob.glob(os.path.join(out_dir, "annotated", "part=*")):
        if d.rsplit("=", 1)[1] not in want:
            orphans.append(d)
    for f in glob.glob(os.path.join(out_dir, "vocab", "part-*.parquet")):
        pid = os.path.basename(f)[len("part-"):-len(".parquet")]
        if pid not in want:
            orphans.append(f)
    for m in glob.glob(os.path.join(out_dir, "_ckpt", "annotated.*.done.json")):
        pid = os.path.basename(m).split(".")[1]
        if pid not in want:
            orphans.append(m)
    return sorted(orphans)


def cleanup_orphans(out_dir: str, configured_groups: list[int]) -> list[str]:
    """Remove orphaned state; returns what was removed."""
    removed = find_orphans(out_dir, configured_groups)
    for path in removed:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)
    return removed
