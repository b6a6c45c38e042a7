"""End-to-end pipeline tests: P/R vs the single-process oracle, resume,
determinism, distributed-CC parity (SURVEY.md section 5.2)."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from k_gap_ray.oracle import cluster_surfaces, entity_iri, extract_from_text, norm_surface
from k_gap_ray.oracle.kernel import graph_for_url
from k_gap_ray.pipeline import run_pipeline
from k_gap_ray.synth import gen_pages


def oracle_triple_set(pages_table) -> set[tuple]:
    """Golden canonical (subj, pred, obj, graph) quad set, single-process."""
    all_mention_norms: list[str] = []
    raw: list[tuple] = []
    for url, text in zip(pages_table["url"].to_pylist(),
                         pages_table["text"].to_pylist()):
        triples, mentions = extract_from_text(text)
        all_mention_norms += [m.norm for m in mentions]
        g = graph_for_url(url)
        raw += [(t, g) for t in triples]
    comp = cluster_surfaces(sorted(set(all_mention_norms)))

    def canon_term(surface: str) -> str:
        n = norm_surface(surface)
        return entity_iri(comp[n]) if n in comp else surface

    quads = set()
    for t, g in raw:
        obj = t.obj if t.obj_is_literal else canon_term(t.obj)
        quads.add((canon_term(t.subj), t.pred, obj, g))
    return quads


def pipeline_quads(result) -> set[tuple]:
    tbl = result["triples"]
    rows = tbl.take_all() if hasattr(tbl, "take_all") else tbl.to_pylist()
    return {(r["subj"], r["pred"], r["obj"], r["graph"]) for r in rows}


@pytest.fixture(scope="module")
def pipeline_result(ray_session, pages_table):
    import ray.data as rd

    pages = rd.from_arrow(pages_table).repartition(4)
    return run_pipeline(pages)


def test_triple_pr_vs_oracle(pipeline_result, pages_table):
    golden = oracle_triple_set(pages_table)
    got = pipeline_quads(pipeline_result)
    tp = len(golden & got)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(golden))
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # with shared kernels they should in fact be identical
    assert golden == got


def test_entities_deterministic_ids(pipeline_result):
    ents = pipeline_result["entities"]
    ids = ents["entity_id"].to_pylist()
    assert ids == sorted(ids)
    for eid, members in zip(ids, ents["members"].to_pylist()):
        assert eid == entity_iri(min(members))


def test_mentions_link_to_canonical(pipeline_result):
    rows = pipeline_result["mentions"].take(50)
    for r in rows:
        assert r["cand_entity"].startswith("urn:kgap:entity:")


def test_no_duplicate_quads(pipeline_result):
    tbl = pipeline_result["triples"]
    rows = tbl.take_all()
    keys = [(r["subj"], r["pred"], r["obj"], r["graph"]) for r in rows]
    assert len(keys) == len(set(keys))


@pytest.mark.parametrize("force_distributed", [False, True])
def test_checkpointed_run_and_resume(ray_session, tmp_path_factory,
                                     pages_table, force_distributed):
    out_dir = str(tmp_path_factory.mktemp(
        f"kg_out_{'dist' if force_distributed else 'drv'}"))
    in_dir = str(tmp_path_factory.mktemp("pages_in"))
    pq.write_table(pages_table, os.path.join(in_dir, "p0.parquet"))
    shutil.rmtree(out_dir, ignore_errors=True)

    res = run_pipeline(in_dir, out_dir=out_dir,
                       force_distributed_cc=force_distributed)
    n1 = res["triples"].count()
    assert n1 > 0
    assert res["adjacency"].count() == n1
    golden = oracle_triple_set(pages_table)
    assert pipeline_quads(res) == golden

    # resume: a rerun must skip all stages and produce identical output
    res2 = run_pipeline(in_dir, out_dir=out_dir)
    assert res2["triples"].count() == n1
    assert pipeline_quads(res2) == golden

    # lineage rows exist for every stage
    stages = {r["stage"] for r in res2["lineage"].take_all()}
    assert {"annotated", "entities", "graph", "mentions"} <= stages


def test_partial_resume_after_simulated_failure(ray_session, tmp_path_factory,
                                                pages_table):
    """Kill-mid-run semantics: later-stage checkpoints absent -> only
    those stages rerun; output equals a clean run (W4/D1 contract)."""
    out_dir = str(tmp_path_factory.mktemp("kg_partial"))
    in_dir = str(tmp_path_factory.mktemp("pages_in2"))
    pq.write_table(pages_table, os.path.join(in_dir, "p0.parquet"))

    res = run_pipeline(in_dir, out_dir=out_dir)
    golden = pipeline_quads(res)

    # simulate failure after 'annotated': delete downstream outputs+manifests
    for stage, sub in [("entities", "entities"), ("graph", "triples"),
                       ("graph", "adjacency"), ("mentions", "mentions")]:
        p = os.path.join(out_dir, "_ckpt", f"{stage}.done.json")
        if os.path.exists(p):
            os.remove(p)
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)

    res2 = run_pipeline(in_dir, out_dir=out_dir)
    assert pipeline_quads(res2) == golden


def test_partition_level_resume(ray_session, tmp_path_factory, pages_table):
    """Kill-mid-annotate semantics: one unfinished partition group ->
    only that group reruns (incl. cleanup of its partial files)."""
    import glob

    out_dir = str(tmp_path_factory.mktemp("kg_partres"))
    in_dir = str(tmp_path_factory.mktemp("pages_in_pr"))
    # several input shards so partitioning is real
    for s in range(4):
        pq.write_table(pages_table.slice(s * 75, 75),
                       os.path.join(in_dir, f"p{s}.parquet"))

    res = run_pipeline(in_dir, out_dir=out_dir, annotate_partitions=4)
    golden = pipeline_quads(res)
    assert len(glob.glob(os.path.join(out_dir, "annotated", "part=*"))) == 4

    # simulate a crash in group 2: manifest gone, partial files present
    os.remove(os.path.join(out_dir, "_ckpt", "annotated.0002.done.json"))
    os.remove(os.path.join(out_dir, "_ckpt", "annotated.done.json"))
    for stage, sub in [("entities", "entities"), ("graph", "triples"),
                       ("graph", "adjacency"), ("mentions", "mentions")]:
        p = os.path.join(out_dir, "_ckpt", f"{stage}.done.json")
        if os.path.exists(p):
            os.remove(p)
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)

    res2 = run_pipeline(in_dir, out_dir=out_dir, annotate_partitions=4)
    assert pipeline_quads(res2) == golden
    # per-partition lineage rows exist
    parts = {r["partition_id"] for r in res2["lineage"].take_all()
             if r["stage"] == "annotated"}
    assert {"0000", "0001", "0002", "0003"} <= parts


def test_adjacency_sorted_within_buckets(ray_session, tmp_path_factory,
                                         pages_table):
    out_dir = str(tmp_path_factory.mktemp("kg_adj"))
    in_dir = str(tmp_path_factory.mktemp("pages_in3"))
    pq.write_table(pages_table, os.path.join(in_dir, "p0.parquet"))
    run_pipeline(in_dir, out_dir=out_dir)

    import glob

    bucket_dirs = glob.glob(os.path.join(out_dir, "adjacency", "subj_bucket=*"))
    assert len(bucket_dirs) > 1
    for d in bucket_dirs:
        t = pq.read_table(d, columns=["subj"])
        subs = t["subj"].to_pylist()
        assert subs == sorted(subs)
