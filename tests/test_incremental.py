"""W3/W4 incremental-append semantics: new input partitions trigger
bounded recompute; untouched annotate groups are not re-run."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from k_gap_ray.pipeline import run_pipeline
from k_gap_ray.synth import gen_pages

from tests.test_pipeline import oracle_triple_set, pipeline_quads


def test_incremental_append(ray_session, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("pages_inc"))
    out_dir = str(tmp_path_factory.mktemp("kg_inc"))

    full = gen_pages(250)
    for s in range(4):
        pq.write_table(full.slice(s * 50, 50),
                       os.path.join(in_dir, f"p{s}.parquet"))

    run_pipeline(in_dir, out_dir=out_dir, annotate_partitions=4)
    mtimes_before = {
        d: os.path.getmtime(d)
        for d in glob.glob(os.path.join(out_dir, "annotated", "part=*"))
    }

    # a new input shard arrives (late data / next crawl increment)
    pq.write_table(full.slice(200, 50), os.path.join(in_dir, "p4.parquet"))
    res = run_pipeline(in_dir, out_dir=out_dir, annotate_partitions=4)

    # output equals a from-scratch run over all 5 shards
    assert pipeline_quads(res) == oracle_triple_set(full)

    # only the group that received the new file was rewritten
    mtimes_after = {
        d: os.path.getmtime(d)
        for d in glob.glob(os.path.join(out_dir, "annotated", "part=*"))
    }
    changed = [d for d in mtimes_before
               if mtimes_after.get(d) != mtimes_before[d]]
    assert len(changed) == 1, f"expected exactly one rewritten group: {changed}"


def test_rerun_without_new_input_is_noop(ray_session, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("pages_noop"))
    out_dir = str(tmp_path_factory.mktemp("kg_noop"))
    pq.write_table(gen_pages(100), os.path.join(in_dir, "p0.parquet"))

    run_pipeline(in_dir, out_dir=out_dir)
    mtime = os.path.getmtime(os.path.join(out_dir, "_ckpt", "graph.done.json"))
    run_pipeline(in_dir, out_dir=out_dir)
    assert os.path.getmtime(
        os.path.join(out_dir, "_ckpt", "graph.done.json")) == mtime
