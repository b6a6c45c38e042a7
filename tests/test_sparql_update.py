"""SPARQL UPDATE subset (k_gap_ray/sparql_update.py): parser forms,
Dataset-level set semantics vs the chained-CTE DuckDB mirror, the
large-change-set join path, and the bucketed-store integration."""

import duckdb
import pyarrow as pa
import pytest

from k_gap_ray.sparql_update import (QUAD_COLS, apply_update,
                                     apply_update_store,
                                     parse_sparql_update,
                                     sparql_update_cte_sql)

SCRIPT = """
PREFIX p: <urn:p:>
PREFIX e: <urn:e:>
INSERT DATA {
  e:new p:locatedIn "marine lagoon y" .
  e:new p:name "newbie" .
} ;
DELETE WHERE { ?a p:employs ?x } ;
DELETE { ?a p:locatedIn ?loc }
INSERT { ?a p:basedAt ?loc }
WHERE { ?a p:locatedIn ?loc . FILTER (CONTAINS(?loc, "marine")) }
"""


def _quads_table() -> pa.Table:
    rows = [
        ("urn:e:a", "urn:p:locatedIn", "marine station x",
         True, "", "", "g1", "u1"),
        ("urn:e:b", "urn:p:locatedIn", "desert site",
         True, "", "", "g1", "u2"),
        ("urn:e:a", "urn:p:employs", "urn:e:c", False, "", "", "g1", "u1"),
        ("urn:e:c", "urn:p:name", "carol", True, "", "", "g2", "u3"),
    ]
    return pa.table({c: pa.array([r[i] for r in rows],
                     pa.bool_() if c == "obj_is_literal" else pa.string())
                     for i, c in enumerate(QUAD_COLS)})


EXPECTED = sorted([
    ("urn:e:a", "urn:p:basedAt", "marine station x"),
    ("urn:e:b", "urn:p:locatedIn", "desert site"),
    ("urn:e:c", "urn:p:name", "carol"),
    ("urn:e:new", "urn:p:basedAt", "marine lagoon y"),
    ("urn:e:new", "urn:p:name", "newbie"),
])


def test_parse_update_forms():
    ops = parse_sparql_update(SCRIPT)
    assert [(len(o.insert_templates), len(o.delete_templates),
             o.where is not None) for o in ops] == [
        (2, 0, False), (0, 1, True), (1, 1, True)]
    # ground DATA blocks reject variables
    with pytest.raises(ValueError, match="ground"):
        parse_sparql_update("INSERT DATA { ?s <urn:p:x> \"v\" . }")
    # template vars must be WHERE-bound
    with pytest.raises(ValueError, match="not bound"):
        parse_sparql_update(
            "DELETE { ?a <urn:p:x> ?gone } WHERE { ?a <urn:p:x> ?o . }")


def test_apply_update_matches_duckdb_mirror(ray_session):
    import ray.data as rd

    tbl = _quads_table()
    out = apply_update(rd.from_arrow(tbl), SCRIPT)
    eng = sorted((r["subj"], r["pred"], r["obj"]) for r in out.take_all())
    assert eng == EXPECTED

    frag, final = sparql_update_cte_sql(SCRIPT, quads_rel="qbase")
    sql = ("WITH qbase AS (SELECT * FROM quads_view),\n" + frag
           + f"\nSELECT subj, pred, obj FROM {final} ORDER BY 1, 2, 3")
    con = duckdb.connect()
    con.register("quads_view", tbl.to_pandas())
    assert [tuple(r) for r in con.execute(sql).fetchall()] == eng


def test_apply_update_join_path(ray_session):
    """broadcast_cap=0 forces the Bloom-prefiltered marker-join path
    for both the delete and the insert set — same result."""
    import ray.data as rd

    out = apply_update(rd.from_arrow(_quads_table()), SCRIPT,
                       broadcast_cap=0)
    eng = sorted((r["subj"], r["pred"], r["obj"]) for r in out.take_all())
    assert eng == EXPECTED


def test_insert_is_noop_for_existing_triple(ray_session):
    import ray.data as rd

    script = """
    PREFIX p: <urn:p:>
    PREFIX e: <urn:e:>
    INSERT DATA { e:a p:locatedIn "marine station x" . }
    """
    out = apply_update(rd.from_arrow(_quads_table()), script)
    keys = [(r["subj"], r["pred"], r["obj"]) for r in out.take_all()]
    assert keys.count(("urn:e:a", "urn:p:locatedIn",
                       "marine station x")) == 1
    assert len(keys) == 4  # unchanged


def test_delete_data_removes_all_graph_copies(ray_session):
    import ray.data as rd

    script = """
    PREFIX p: <urn:p:>
    PREFIX e: <urn:e:>
    DELETE DATA { e:c p:name "carol" . }
    """
    out = apply_update(rd.from_arrow(_quads_table()), script)
    assert all(r["pred"] != "urn:p:name" for r in out.take_all())


def test_delete_where_wildcard_clears_store(ray_session):
    """The reference faq's clear-all idiom: DELETE WHERE { ?s ?p ?o }
    empties the store (variable predicate included)."""
    import ray.data as rd

    out = apply_update(rd.from_arrow(_quads_table()),
                       "DELETE WHERE { ?s ?p ?o }")
    assert out.count() == 0


def test_workflow_sparql_update_step(ray_session):
    """The UPDATE surface composes as a workflow step: mutate the
    quads in flight, then SELECT over the mutated store in the same
    spec (the sparql step sees the rewritten predicates)."""
    import ray.data as rd

    from k_gap_ray.workflow import run_workflow

    out = run_workflow([
        {"op": "sparql_update", "update": SCRIPT},
        {"op": "sparql", "query": """
            PREFIX p: <urn:p:>
            SELECT ?a ?loc WHERE { ?a p:basedAt ?loc . }
        """},
    ], dataset=rd.from_arrow(_quads_table()))
    rows = sorted((r["a"], r["loc"]) for r in out.take_all())
    assert rows == [("urn:e:a", "marine station x"),
                    ("urn:e:new", "marine lagoon y")]


def test_workflow_sparql_fts_predicate(ray_session):
    """The FTS magic predicate works through the workflow sparql step
    (the planner hook rewrites it transparently)."""
    import ray.data as rd

    from k_gap_ray.workflow import run_workflow

    out = run_workflow([
        {"op": "sparql", "query": """
            PREFIX kfts: <urn:kgap:fts:>
            SELECT ?e ?score WHERE {
              ?e kfts:searchIndex "marine" .
              ?e kfts:score ?score .
            }
        """},
    ], dataset=rd.from_arrow(_quads_table()))
    rows = [(r["e"], r["score"]) for r in out.take_all()]
    # N=3 literal-indexed subjects (a, b, c), df("marine")=1, tf=1
    assert rows == [("urn:e:a", "3000")]


def test_apply_update_store_buckets(ray_session, tmp_path):
    """Store-level UPDATE: only affected subject buckets rewritten,
    statements applied sequentially, set semantics on disk."""
    import ray.data as rd

    from k_gap_ray.state.upsert import init_store, read_store

    store = str(tmp_path / "store")
    init_store(rd.from_arrow(_quads_table()), store)
    apply_update_store(store, SCRIPT)
    back = sorted((r["subj"], r["pred"], r["obj"])
                  for r in read_store(store).take_all())
    assert back == EXPECTED


def test_clear_graph_and_clear_all(ray_session):
    """CLEAR GRAPH drops exactly one named graph (inserted-this-
    sequence rows in other graphs survive); CLEAR ALL empties the
    store but keeps the schema so later statements still apply."""
    import ray.data as rd

    ds = rd.from_arrow(_quads_table())
    out = apply_update(ds, """
        PREFIX p: <urn:p:>
        PREFIX e: <urn:e:>
        INSERT DATA { e:probe p:name "probe" . } ;
        CLEAR GRAPH <g1>
    """).take_all()
    graphs = {r["graph"] for r in out}
    assert "g1" not in graphs
    assert {r["subj"] for r in out} == {"urn:e:c", "urn:e:probe"}

    # CLEAR ALL then insert: only the new row remains
    out2 = apply_update(ds, """
        PREFIX p: <urn:p:>
        PREFIX e: <urn:e:>
        CLEAR ALL ;
        INSERT DATA { e:only p:name "solo" . }
    """).take_all()
    assert [r["subj"] for r in out2] == ["urn:e:only"]

    # SILENT accepted; parser rejects unsupported targets
    ops = parse_sparql_update("CLEAR SILENT GRAPH <g2>")
    assert ops[0].clear_graph == "g2"
    ops = parse_sparql_update("DROP GRAPH <g2> ; DROP SILENT ALL")
    assert [o.clear_graph for o in ops] == ["g2", "*"]
    with pytest.raises(ValueError):
        parse_sparql_update("CLEAR NAMED")


def test_clear_graph_sql_mirror_matches(ray_session):
    import ray.data as rd

    script = """
        PREFIX p: <urn:p:>
        PREFIX e: <urn:e:>
        INSERT DATA { e:probe p:name "probe" . } ;
        CLEAR GRAPH <g1> ;
        DELETE WHERE { ?a p:name ?n }
    """
    got = sorted((r["subj"], r["pred"], r["obj"], r["graph"])
                 for r in apply_update(rd.from_arrow(_quads_table()),
                                       script).take_all())
    frag, final = sparql_update_cte_sql(script, quads_rel="base")
    con = duckdb.connect()
    con.register("base", _quads_table())
    want = sorted(map(tuple, con.execute(
        f"WITH {frag} SELECT subj, pred, obj, graph FROM {final} "
        f"ORDER BY 1, 2, 3").fetchall()))
    assert got == want


def test_apply_update_quadstore_buckets(ray_session, tmp_path):
    """Pred-partitioned-store UPDATE (round 5): same script, same
    result set as the Dataset and subject-store paths, with only the
    touched PRED buckets rewritten on disk."""
    import glob
    import os

    import ray.data as rd

    from k_gap_ray.state.quadstore import (QuadStore,
                                           apply_update_quadstore,
                                           init_quad_store, pred_bucket)

    store = str(tmp_path / "qstore")
    # add a predicate the script never mentions: its bucket must
    # survive the whole script byte-untouched
    base = _quads_table()
    extra = pa.table({c: pa.array(
        [{"subj": "urn:e:z", "pred": "urn:p:keeps", "obj": "zzz",
          "obj_is_literal": True, "obj_datatype": "", "obj_lang": "",
          "graph": "g1", "url": "u9"}[c]],
        pa.bool_() if c == "obj_is_literal" else pa.string())
        for c in QUAD_COLS})
    init_quad_store(rd.from_arrow(pa.concat_tables([base, extra])),
                    store, n_buckets=16)
    touched = {pred_bucket(p, 16) for p in
               ("urn:p:locatedIn", "urn:p:employs", "urn:p:basedAt",
                "urn:p:name")}
    keeps_b = pred_bucket("urn:p:keeps", 16)
    assert keeps_b not in touched  # fixture precondition
    before = {f: os.path.getmtime(f)
              for f in glob.glob(f"{store}/pbucket={keeps_b}/*.parquet")}
    assert before

    n = apply_update_quadstore(store, SCRIPT)
    assert n > 0
    back = sorted((r["subj"], r["pred"], r["obj"])
                  for r in QuadStore(store).full().take_all())
    assert back == sorted(EXPECTED + [("urn:e:z", "urn:p:keeps", "zzz")])
    # the untouched bucket keeps its files byte-identical (same mtime)
    for f, mt in before.items():
        assert os.path.getmtime(f) == mt, f


def test_apply_update_quadstore_clear_graph(ray_session, tmp_path):
    import ray.data as rd

    from k_gap_ray.state.quadstore import (QuadStore,
                                           apply_update_quadstore,
                                           init_quad_store)

    store = str(tmp_path / "qstore_clear")
    init_quad_store(rd.from_arrow(_quads_table()), store, n_buckets=8)
    n = apply_update_quadstore(store, "CLEAR GRAPH <g2>")
    assert n == 1  # carol's name triple lives in g2
    left = {r["graph"] for r in QuadStore(store).full().take_all()}
    assert left == {"g1"}


def test_upsert_store_persists_bucket_count(ray_session, tmp_path):
    """A store built with a non-default bucket count must be updated
    with the SAME mapping even when the caller forgets to repeat it
    (the band-index wrong-mapping failure mode, closed for every
    bucketed store in round 5)."""
    import ray.data as rd

    from k_gap_ray.state.upsert import (apply_set_changes, init_store,
                                        read_store)

    store = str(tmp_path / "nb5")
    init_store(rd.from_arrow(_quads_table()), store, n_buckets=5)
    ins = pa.table({c: pa.array(
        [{"subj": "urn:e:q", "pred": "urn:p:name", "obj": "quinn",
          "obj_is_literal": True, "obj_datatype": "", "obj_lang": "",
          "graph": "g1", "url": ""}[c]],
        pa.bool_() if c == "obj_is_literal" else pa.string())
        for c in QUAD_COLS})
    dels = pa.table({"subj": ["urn:e:c"], "pred": ["urn:p:name"],
                     "obj": ["carol"]})
    # note: NO n_buckets passed — the persisted count must win
    apply_set_changes(store, ins, dels)
    back = sorted((r["subj"], r["obj"])
                  for r in read_store(store).take_all()
                  if r["pred"] == "urn:p:name")
    assert back == [("urn:e:q", "quinn")]
    import glob as _g

    dirs = {int(p.rsplit("=", 1)[1])
            for p in _g.glob(f"{store}/subj_bucket=*")}
    assert dirs and max(dirs) < 5


def test_load_file_into_graph(ray_session, tmp_path):
    """LOAD <file://...> [INTO GRAPH <g>] — the reference's ingestion
    operator with the network transport swapped for file IRIs (the
    only transport this sandbox allows). Set semantics vs the store,
    format dispatch by extension, INTO GRAPH retargets the rows."""
    import ray.data as rd

    ttl = tmp_path / "new.ttl"
    ttl.write_text(
        '@prefix p: <urn:p:> .\n'
        '<urn:e:x> p:name "xavier" .\n'
        '<urn:e:a> p:locatedIn "marine station x" .\n')  # dup: no-op
    out = apply_update(
        rd.from_arrow(_quads_table()),
        f'LOAD <file://{ttl}> INTO GRAPH <urn:g:loaded>')
    rows = out.take_all()
    assert len(rows) == 5  # 4 base + 1 new (dup suppressed)
    new = [r for r in rows if r["subj"] == "urn:e:x"][0]
    assert (new["obj"], new["graph"]) == ("xavier", "urn:g:loaded")

    nt = tmp_path / "more.nt"
    nt.write_text('<urn:e:y> <urn:p:name> "yana" .\n')
    out2 = apply_update(out, f'LOAD <file://{nt}>')
    assert out2.count() == 6

    with pytest.raises(ValueError, match="file://"):
        apply_update(rd.from_arrow(_quads_table()),
                     'LOAD <http://example.org/doc.ttl>')
    with pytest.raises(NotImplementedError, match="no SQL mirror"):
        sparql_update_cte_sql(f'LOAD <file://{ttl}>')


def test_load_into_quadstore_buckets(ray_session, tmp_path):
    import ray.data as rd

    from k_gap_ray.state.quadstore import (QuadStore,
                                           apply_update_quadstore,
                                           init_quad_store)

    store = str(tmp_path / "qload")
    init_quad_store(rd.from_arrow(_quads_table()), store, n_buckets=8)
    ttl = tmp_path / "new.ttl"
    ttl.write_text('@prefix p: <urn:p:> .\n'
                   '<urn:e:x> p:name "xavier" .\n')
    n = apply_update_quadstore(store, f'LOAD <file://{ttl}>')
    assert n == 1
    names = sorted(r["obj"] for r in QuadStore(store).full().take_all()
                   if r["pred"] == "urn:p:name")
    assert names == ["carol", "xavier"]


def test_quadstore_clear_all_then_insert(ray_session, tmp_path):
    """CLEAR ALL empties every bucket but the store stays openable and
    refillable in the same script (schema persisted in the meta)."""
    import ray.data as rd

    from k_gap_ray.state.quadstore import (QuadStore,
                                           apply_update_quadstore,
                                           init_quad_store)

    store = str(tmp_path / "qclr")
    init_quad_store(rd.from_arrow(_quads_table()), store, n_buckets=8)
    apply_update_quadstore(store, """
        PREFIX p: <urn:p:>
        PREFIX e: <urn:e:>
        CLEAR ALL ;
        INSERT DATA { e:only p:name "solo" . }
    """)
    rows = QuadStore(store).full().take_all()
    assert [(r["subj"], r["obj"]) for r in rows] == [("urn:e:only",
                                                      "solo")]
