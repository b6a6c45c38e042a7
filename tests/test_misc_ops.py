"""Remaining operator-surface tests: orphan cleanup (D4), sampling
(O5), distributed byte-identical extraction, CC chain convergence."""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def test_orphan_cleanup(ray_session, tmp_path_factory, pages_table):
    from k_gap_ray.pipeline import run_pipeline
    from k_gap_ray.state.orphans import cleanup_orphans, find_orphans

    in_dir = str(tmp_path_factory.mktemp("pages_orph"))
    out_dir = str(tmp_path_factory.mktemp("kg_orph"))
    for s in range(4):
        pq.write_table(pages_table.slice(s * 60, 60),
                       os.path.join(in_dir, f"p{s}.parquet"))
    run_pipeline(in_dir, out_dir=out_dir, annotate_partitions=4)

    # config shrinks to 2 groups -> groups 2,3 become orphans
    orphans = find_orphans(out_dir, [0, 1])
    assert any("part=0002" in o for o in orphans)
    assert any("annotated.0003" in o for o in orphans)
    removed = cleanup_orphans(out_dir, [0, 1])
    assert removed == orphans
    assert find_orphans(out_dir, [0, 1]) == []
    # configured groups untouched
    assert os.path.isdir(os.path.join(out_dir, "annotated", "part=0000"))


def test_random_sample_deterministic_seeded(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    a = sorted(r["l_orderkey"] for r in ds.random_sample(0.05, seed=7).take_all())
    b = sorted(r["l_orderkey"] for r in ds.random_sample(0.05, seed=7).take_all())
    assert a == b
    assert 0 < len(a) < 6000


def test_distributed_extraction_byte_identical(ray_session, pages_table):
    """The north-rule per-row invariant exercised through the
    DISTRIBUTED stage, not just the kernel: extract_stage(html) must
    reproduce the ground-truth text column byte-for-byte per url."""
    import ray.data as rd

    from k_gap_ray.ops.extract import extract_stage

    truth = dict(zip(pages_table["url"].to_pylist(),
                     pages_table["text"].to_pylist()))
    out = extract_stage(
        rd.from_arrow(pages_table).repartition(7)).take_all()
    assert len(out) == len(truth)
    for r in out:
        assert r["text"] == truth[r["url"]]


def test_distributed_cc_chain_convergence(ray_session):
    """Label propagation must reach the fixpoint on a long chain
    (worst-case diameter), not stop after one round."""
    import ray.data as rd

    from k_gap_ray.ops.canonicalize import _cc_distributed

    n = 9
    nodes = [f"n{i:02d}" for i in range(n)]
    surf = rd.from_items([{"norm_surface": s} for s in nodes])
    edges = rd.from_items([{"a": nodes[i], "b": nodes[i + 1]}
                           for i in range(n - 1)])
    labels = {r["node"]: r["label"]
              for r in _cc_distributed(surf, edges).take_all()}
    assert set(labels.values()) == {"n00"}
