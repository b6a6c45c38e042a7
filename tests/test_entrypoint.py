"""Driver-contract regression tests: __ray_entry__ exercised the way
the grading driver calls it (Ray already initialized, then import)."""

from __future__ import annotations

import sys

import pytest


@pytest.fixture(scope="module")
def entrymod(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    return em


def test_entry_contract(entrymod):
    res = entrymod.entry()
    assert res.count() > 0
    assert res.schema().names == [
        "subj", "pred", "obj", "obj_is_literal", "obj_datatype",
        "obj_lang", "graph", "url"]
    row = res.take(1)[0]
    assert row["subj"].startswith("urn:kgap:entity:")
    assert row["pred"].startswith("urn:kgap:pred:")


def test_every_query_has_callable_and_sql_subset(entrymod):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(sqls) <= set(qs)          # every oracle has a query
    assert len(sqls) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_heavy_content_pr_vs_oracle(ray_session):
    """P/R on content-heavy pages (the bench corpus shape), not just
    the light test fixture."""
    import ray.data as rd

    from k_gap_ray.pipeline import run_pipeline
    from k_gap_ray.synth import gen_pages
    from tests.test_pipeline import oracle_triple_set, pipeline_quads

    heavy = gen_pages(120, min_sent=24, sent_spread=17)
    res = run_pipeline(rd.from_arrow(heavy).repartition(4))
    assert pipeline_quads(res) == oracle_triple_set(heavy)
