"""FTS magic predicate (k_gap_ray/sparql_fts.py): rewrite rules,
integer-TF-IDF scoring parity with the DuckDB mirror, and the
transparent sparql_select integration."""

import duckdb
import pyarrow as pa
import pytest

from k_gap_ray.sparql import parse_sparql, sparql_select, sparql_to_sql
from k_gap_ray.sparql_fts import (rewrite_fts_query, sql_fts_ctes)

COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
        "obj_lang", "graph", "url"]


def _quads() -> pa.Table:
    rows = [
        ("urn:e:a", "urn:p:abstract", "marine merge window data merge",
         True, "", "", "g", "u"),
        ("urn:e:a", "urn:p:note", "window", True, "", "", "g", "u"),
        ("urn:e:b", "urn:p:abstract", "desert merge", True, "", "", "g", "u"),
        ("urn:e:c", "urn:p:abstract", "nothing relevant",
         True, "", "", "g", "u"),
        # IRI object: excluded from the indexed corpus (flag False)
        ("urn:e:a", "urn:p:knows", "urn:e:merge", False, "", "", "g", "u"),
    ]
    return pa.table({c: pa.array([r[i] for r in rows],
                     pa.bool_() if c == "obj_is_literal" else pa.string())
                     for i, c in enumerate(COLS)})


FTS_Q = """
PREFIX kfts: <urn:kgap:fts:>
SELECT ?e ?score WHERE {
  ?e kfts:searchIndex "merge window" .
  ?e kfts:score ?score .
}
"""


def test_rewrite_rules():
    q2, specs = rewrite_fts_query(parse_sparql(FTS_Q))
    assert len(specs) == 1 and specs[0][1] == "merge window"
    assert len(q2.patterns) == 1
    assert q2.patterns[0].p.value == "urn:kgap:fts:match:merge window"
    with pytest.raises(ValueError, match="without"):
        rewrite_fts_query(parse_sparql(
            "PREFIX kfts: <urn:kgap:fts:>\n"
            "SELECT ?s WHERE { ?e kfts:score ?s . }"))


def test_fts_scores_match_duckdb(ray_session):
    import ray.data as rd

    tbl = _quads()
    res = sparql_select(rd.from_arrow(tbl), FTS_Q)
    eng = sorted((r["e"], r["score"]) for r in res.take_all())
    # N=3 indexed subjects; df(merge)=2, df(window)=1
    # idf(merge) = 3000//2 = 1500; idf(window) = 3000//1 = 3000
    # a: tf(merge)=2, tf(window)=2 -> 2*1500 + 2*3000 = 9000
    # b: tf(merge)=1 -> 1500
    assert eng == [("urn:e:a", "9000"), ("urn:e:b", "1500")]

    q2, specs = rewrite_fts_query(parse_sparql(FTS_Q))
    frag, final = sql_fts_ctes(specs, quads_rel="qv", columns=COLS)
    sql = ("WITH qv AS (SELECT * FROM quads_view),\n" + frag + "\n"
           + sparql_to_sql(q2, quads_rel=final))
    con = duckdb.connect()
    con.register("quads_view", tbl.to_pandas())
    ora = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert ora == eng


def test_fts_joins_with_ordinary_patterns(ray_session):
    """The virtual match pattern participates in a normal BGP join."""
    import ray.data as rd

    q = """
    PREFIX kfts: <urn:kgap:fts:>
    PREFIX p: <urn:p:>
    SELECT ?e ?who WHERE {
      ?e kfts:searchIndex "marine" .
      ?e p:knows ?who .
    }
    """
    res = sparql_select(rd.from_arrow(_quads()), q)
    assert [(r["e"], r["who"]) for r in res.take_all()] == [
        ("urn:e:a", "urn:e:merge")]


def test_fts_over_quad_store_falls_back_to_full(ray_session, tmp_path):
    """An FTS query against a pred-partitioned QuadStore must produce
    the same scores as the in-memory path (the rewrite appends virtual
    match quads, so the engine materializes the full store first)."""
    import ray.data as rd

    from k_gap_ray.state.quadstore import QuadStore, init_quad_store

    tbl = _quads()
    d = str(tmp_path / "store")
    init_quad_store(rd.from_arrow(tbl), d, n_buckets=4)
    mem = sorted((r["e"], r["score"]) for r in
                 sparql_select(rd.from_arrow(tbl), FTS_Q).take_all())
    store = sorted((r["e"], r["score"]) for r in
                   sparql_select(QuadStore(d), FTS_Q).take_all())
    assert store == mem and mem
