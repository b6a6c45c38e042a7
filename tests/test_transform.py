"""Tests: RDF I/O, CONSTRUCT remap, shape validation, LDES member
semantics, workflow spec, upsert store (SURVEY.md 2.1/2.2/2.8/2.9)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


TRIPLES = pa.table({
    "subj": ["urn:a", "urn:b", "urn:c", "urn:a"],
    "pred": ["urn:old:name", "urn:old:name", "urn:kgap:pred:funds", "urn:old:loc"],
    "obj": ["Alice", "Bob", "urn:b", "urn:x"],
    "obj_is_literal": [True, True, False, False],
    "obj_datatype": ["", "", "", ""],
    "obj_lang": ["", "", "", ""],
    "graph": ["g1", "g1", "g2", "g2"],
    "url": ["u1", "u2", "u3", "u4"],
})


def test_ntriples_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from k_gap_ray.sources.rdfio import read_ntriples, write_ntriples

    ds = rd.from_arrow(TRIPLES)
    out = write_ntriples(ds, str(tmp_path / "nt"))
    assert out.count() >= 1
    files = [str(p) for p in (tmp_path / "nt").glob("*.nt")]
    back = read_ntriples(files)
    rows = {(r["subj"], r["pred"], r["obj"], r["obj_is_literal"], r["graph"])
            for r in back.take_all()}
    want = {(s, p, o, lit, g) for s, p, o, lit, g in zip(
        TRIPLES["subj"].to_pylist(), TRIPLES["pred"].to_pylist(),
        TRIPLES["obj"].to_pylist(), TRIPLES["obj_is_literal"].to_pylist(),
        TRIPLES["graph"].to_pylist())}
    assert rows == want


def test_ntriples_literal_escapes(ray_session, tmp_path):
    import ray.data as rd

    from k_gap_ray.sources.rdfio import read_ntriples, write_ntriples

    tricky = pa.table({
        "subj": ["urn:s"], "pred": ["urn:p"],
        "obj": ['line1\nline2 "quoted" \\backslash\t.'],
        "obj_is_literal": [True], "obj_datatype": [""], "obj_lang": ["en"],
        "graph": [""], "url": [""],
    })
    write_ntriples(rd.from_arrow(tricky), str(tmp_path / "nt")).count()
    files = [str(p) for p in (tmp_path / "nt").glob("*.nt")]
    r = read_ntriples(files).take_all()[0]
    assert r["obj"] == 'line1\nline2 "quoted" \\backslash\t.'
    assert r["obj_lang"] == "en"


def test_construct_remap(ray_session):
    import ray.data as rd

    from k_gap_ray.ops.transform import construct_remap

    out = construct_remap(rd.from_arrow(TRIPLES),
                          {"urn:old:name": "urn:new:label"})
    preds = [r["pred"] for r in out.take_all()]
    assert preds.count("urn:new:label") == 2
    assert "urn:old:name" not in preds
    assert preds.count("urn:old:loc") == 1  # unmapped kept


def test_shape_validation_side_channel(ray_session):
    import ray.data as rd

    from k_gap_ray.ops.transform import ShapeRule, split_valid, validate_shapes

    rules = [ShapeRule("urn:old:name", obj_is_iri=False,
                       obj_pattern=r"^[A-Z]")]
    validated = validate_shapes(rd.from_arrow(TRIPLES), rules)
    passing, rejects = split_valid(validated)
    assert passing.count() == 4  # Alice, Bob pass the rule; others unaffected
    assert rejects.count() == 0
    # now a failing rule
    rules = [ShapeRule("urn:old:name", obj_pattern=r"^X")]
    validated = validate_shapes(rd.from_arrow(TRIPLES), rules)
    passing, rejects = split_valid(validated)
    assert passing.count() == 2
    assert rejects.count() == 2
    assert all(r["shape_error"] for r in rejects.take_all())


def test_materialize_latest_and_replay_dedup(ray_session):
    import ray.data as rd

    from k_gap_ray.ops.transform import (
        dedup_replayed_batches,
        feed_watermarks,
        materialize_latest,
        synth_feed_members,
    )

    members = synth_feed_members(n_entities=10, versions=3)
    ds = rd.from_arrow(members)

    latest = materialize_latest(ds)
    rows = latest.take_all()
    # exactly one version (the max ts) per entity
    per_entity: dict[str, set] = {}
    for r in rows:
        per_entity.setdefault(r["entity_uri"], set()).add(r["version_ts"])
    assert all(len(v) == 1 for v in per_entity.values())
    import pandas as pd

    full = members.to_pandas()
    for uri, tss in per_entity.items():
        assert tss == {full[full.entity_uri == uri].version_ts.max()}

    # replay of already-ingested batches yields zero new rows
    seen = set(full.batch_no.unique().tolist())
    assert dedup_replayed_batches(ds, seen).count() == 0
    part = set(list(seen)[:1])
    n_after = dedup_replayed_batches(ds, part).count()
    assert n_after == len(full[~full.batch_no.isin(part)])

    wm = {r["feed"]: r["watermark"] for r in feed_watermarks(ds).take_all()}
    for feed, ts in wm.items():
        assert ts == full[full.feed == feed].version_ts.max()


def test_workflow_spec(ray_session, tmp_path, sf_dir):
    from k_gap_ray.workflow import run_workflow

    out = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/documents.parquet",
         "columns": ["doc_id", "lang", "n_chars"]},
        {"op": "filter", "expr": "lang == '${lang}'"},
        {"op": "groupby_agg", "keys": ["lang"],
         "aggs": [{"fn": "Count", "alias": "n"},
                  {"fn": "Max", "on": "n_chars", "alias": "max_chars"}]},
    ], params={"lang": "en"})
    rows = out.take_all()
    assert len(rows) == 1 and rows[0]["lang"] == "en" and rows[0]["n"] > 0

    # sink step + user-fn step (X2)
    import pyarrow.compute as pc

    def double(t: pa.Table) -> pa.Table:
        return t.append_column("n2", pc.multiply(t.column("n_chars"), 2))

    run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/documents.parquet",
         "columns": ["doc_id", "n_chars"]},
        {"op": "map_batches", "fn": double},
        {"op": "write_parquet", "path": str(tmp_path / "wf_out")},
    ])
    assert os.listdir(tmp_path / "wf_out")


def test_upsert_store(ray_session, tmp_path):
    import ray.data as rd

    from k_gap_ray.state.upsert import init_store, read_store, upsert

    store = str(tmp_path / "store")
    init_store(rd.from_arrow(TRIPLES), store)
    assert read_store(store).count() == 4

    changes = pa.table({
        "subj": ["urn:a", "urn:new"],
        "pred": ["urn:old:name", "urn:kgap:pred:funds"],
        "obj": ["Alicia", "urn:c"],
        "obj_is_literal": [True, False],
        "obj_datatype": ["", ""], "obj_lang": ["", ""],
        "graph": ["g1", "g2"], "url": ["u9", "u10"],
    })
    deletes = pa.table({"subj": ["urn:b"], "pred": ["urn:old:name"],
                        "graph": ["g1"]})
    upsert(store, rd.from_arrow(changes), rd.from_arrow(deletes))

    rows = {(r["subj"], r["pred"], r["graph"]): r["obj"]
            for r in read_store(store).take_all()}
    assert rows[("urn:a", "urn:old:name", "g1")] == "Alicia"   # updated
    assert ("urn:new", "urn:kgap:pred:funds", "g2") in rows     # inserted
    assert ("urn:b", "urn:old:name", "g1") not in rows          # deleted
    assert rows[("urn:c", "urn:kgap:pred:funds", "g2")] == "urn:b"  # untouched


def test_error_side_channel_rows(ray_session):
    """W5: a row whose annotation raises becomes a kind='error' row
    (never fatal) and surfaces in the lineage error count."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.ops.annotate import annotate_stage

    pages = rd.from_arrow(pa.table({
        "url": ["https://ok.example/1", "https://bad.example/2"],
        "text": ["Marine Institute operates RV Belgica.", None],
    }))
    out = annotate_stage(pages).take_all()
    kinds = {}
    for r in out:
        kinds.setdefault(r["kind"], []).append(r)
    assert "triple" in kinds and "mention" in kinds
    assert len(kinds["error"]) == 1
    err = kinds["error"][0]
    assert err["url"] == "https://bad.example/2"
    assert "Error" in err["error"] or "error" in err["error"].lower() or err["error"]


def test_workflow_new_ops(ray_session, sf_dir):
    """X1 coverage of the round-2 operators: hash_sample ->
    grouped_topk chained declaratively, and a terminal hll_count."""
    from k_gap_ray.workflow import run_workflow

    out = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/orders.parquet",
         "columns": ["o_orderkey", "o_orderpriority", "o_totalprice"]},
        {"op": "hash_sample", "id_col": "o_orderkey", "keep_pct": 50},
        {"op": "grouped_topk", "key": "o_orderpriority",
         "value": "o_totalprice", "k": 2, "tiebreak": "o_orderkey"},
    ])
    rows = out.take_all()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["o_orderpriority"], []).append(r["rank"])
    assert per_key and all(sorted(v) == list(range(1, len(v) + 1))
                           for v in per_key.values())
    assert all(len(v) <= 2 for v in per_key.values())

    est = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/events.parquet",
         "columns": ["user_id"]},
        {"op": "hll_count", "col": "user_id"},
    ])
    assert est.column("n_est")[0].as_py() > 0


def test_workflow_runtime_overrides(ray_session, tmp_path, sf_dir):
    """X5: per-step 'runtime' blocks (the reference's per-component
    image/resources selection, ldes-consumer/app.py:610-611) reach the
    underlying Ray call; non-worker ops reject them loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from k_gap_ray.functions.multimodal import synth_media
    from k_gap_ray.workflow import run_workflow

    path = str(tmp_path / "media.parquet")
    pq.write_table(synth_media(6), path)
    out = run_workflow([
        {"op": "read_parquet", "path": path},
        # scheduling override on an actor-pool media stage
        {"op": "decode_media", "mode": "stat",
         "runtime": {"num_cpus": 0.5, "memory": 64 * 1024 * 1024}},
    ])
    assert out.count() == 6

    # generic user map_batches: runtime merges into the Ray call
    out2 = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/nation.parquet",
         "columns": ["n_nationkey"]},
        {"op": "map_batches",
         "fn": lambda t: pa.table(
             {"k": pa.compute.add(t.column("n_nationkey"), 1)}),
         "runtime": {"num_cpus": 0.5}},
    ])
    assert out2.count() == 25

    # annotate model stage takes runtime via its ray_remote_args hook
    from k_gap_ray.synth import gen_pages

    pages = __import__("ray").data.from_arrow(
        gen_pages(20).select(["url", "text"]))
    out3 = run_workflow(
        [{"op": "annotate", "runtime": {"num_cpus": 0.5}}], dataset=pages)
    assert out3.count() > 0

    # a shuffle op runs no per-stage worker code: loud config error
    with pytest.raises(ValueError, match="runtime"):
        run_workflow([
            {"op": "read_parquet", "path": f"{sf_dir}/nation.parquet"},
            {"op": "limit", "n": 3, "runtime": {"num_cpus": 1}},
        ])


def test_workflow_shacl_step(ray_session):
    """X1 + M9: declarative SHACL validation step over a quads
    Dataset, shapes inline or from a file."""
    import ray.data as rd

    from k_gap_ray.workflow import run_workflow

    quads = rd.from_items([
        {"subj": "a", "pred": "urn:p:employs", "obj": "12",
         "obj_is_literal": True,
         "obj_datatype": "http://www.w3.org/2001/XMLSchema#integer",
         "obj_lang": "", "graph": "", "url": ""},
        {"subj": "b", "pred": "urn:p:employs", "obj": "x",
         "obj_is_literal": True,
         "obj_datatype": "http://www.w3.org/2001/XMLSchema#string",
         "obj_lang": "", "graph": "", "url": ""},
    ])
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
<urn:s> a sh:NodeShape ; sh:targetSubjectsOf <urn:p:employs> ;
  sh:property [ sh:path <urn:p:employs> ; sh:datatype xsd:integer ] .
"""
    out = run_workflow([{"op": "shacl_validate", "shapes_ttl": ttl}],
                       dataset=quads)
    rows = out.take_all()
    assert {(r["focus"], r["component"]) for r in rows} == {
        ("b", "datatype")}


def test_workflow_media_chain(ray_session, tmp_path):
    """X1 media chain: synth media written to parquet, then a
    declarative read -> resize -> decode workflow."""
    import pyarrow.parquet as pq

    from k_gap_ray.functions.multimodal import synth_media
    from k_gap_ray.workflow import run_workflow

    path = str(tmp_path / "media.parquet")
    pq.write_table(synth_media(9), path)
    out = run_workflow([
        {"op": "read_parquet", "path": path},
        {"op": "resize_media", "target_w": 32, "target_h": 64},
        {"op": "decode_media", "mode": "fake"},
    ])
    rows = out.take_all()
    assert len(rows) == 9
    assert {r["n_bytes"] for r in rows} == {32 * 64 // 64}


def test_mixture_sample_stratified(ray_session):
    """Per-group keep rates: group rate 100 keeps everything, rate 0
    drops everything, unknown groups take default_pct; selection is
    the same multiplicative hash as hash_sample (layout-invariant)."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.ops.transform import hash_sample, mixture_sample

    n = 400
    langs = ["en", "de", "fr", None]
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([langs[i % 4] for i in range(n)]),
    })
    ds = rd.from_arrow(t).repartition(3)
    out = mixture_sample(ds, "lang", {"en": 100, "de": 0}, "doc_id",
                         default_pct=30).to_pandas()
    assert (out["lang"] == "en").sum() == 100      # all en kept
    assert (out["lang"] == "de").sum() == 0        # all de dropped
    # fr + null rows follow the default 30% hash rule == hash_sample
    base = hash_sample(ds, "doc_id", keep_pct=30).to_pandas()
    for grp in ["fr", None]:
        got = set(out[out["lang"].isna() if grp is None
                      else out["lang"] == grp]["doc_id"])
        exp = set(base[base["lang"].isna() if grp is None
                       else base["lang"] == grp]["doc_id"])
        assert got == exp


def test_workflow_late_round2_steps(ray_session, sf_dir):
    """X1 coverage of the late-round-2 operators chained declaratively:
    dup_ngram_spans, fuzzy_name_pairs, label_centroids, emb_dedup, and
    the sparql step (SELECT and CONSTRUCT dispatch)."""
    import pyarrow as pa

    from k_gap_ray.workflow import run_workflow

    spans = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/documents.parquet",
         "columns": ["doc_id", "text"]},
        {"op": "dup_ngram_spans", "n": 8, "min_docs": 2},
    ])
    assert {"gram", "n_docs"} == set(spans.schema().names)

    fz = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/part.parquet",
         "columns": ["p_name"]},
        {"op": "fuzzy_name_pairs", "col": "p_name", "max_dist": 2},
    ])
    assert {"name_a", "name_b"} == set(fz.schema().names)

    cen = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/embeddings.parquet",
         "columns": ["label", "embedding"]},
        {"op": "label_centroids"},
    ])
    assert cen.count() > 0

    surv = run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/embeddings.parquet",
         "columns": ["vec_id", "embedding", "label"]},
        {"op": "emb_dedup", "threshold": 0.4},
    ])
    assert 0 < surv.count() <= 500

    quads = pa.table({
        "subj": ["e:a", "e:b", "e:a"],
        "pred": ["p:knows", "p:knows", "p:loc"],
        "obj": ["e:b", "e:a", "l:bay"]})
    import ray.data as rd

    sel = run_workflow(
        [{"op": "sparql",
          "query": "SELECT ?x WHERE { ?x <p:loc> ?l . }"}],
        dataset=rd.from_arrow(quads))
    assert [r["x"] for r in sel.take_all()] == ["e:a"]
    con = run_workflow(
        [{"op": "sparql",
          "query": "CONSTRUCT { ?y <p:knownBy> ?x . } WHERE "
                   "{ ?x <p:knows> ?y . }"}],
        dataset=rd.from_arrow(quads))
    got = {(r["subj"], r["pred"], r["obj"]) for r in con.take_all()}
    assert got == {("e:b", "p:knownBy", "e:a"), ("e:a", "p:knownBy", "e:b")}


def test_workflow_bloom_and_graph_steps(ray_session):
    """New declarative steps: bloom_semi_join pre-filter and
    triangle_count terminal reduce through the workflow engine."""
    import ray.data as rd

    from k_gap_ray.workflow import run_workflow

    left = rd.from_arrow(pa.table(
        {"k": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]}))
    right = rd.from_arrow(pa.table({"k": ["b", "d", "d"]}))
    out = run_workflow([
        {"op": "bloom_semi_join", "right": right, "on": "k",
         "num_partitions": 2},
    ], dataset=left)
    assert sorted(r["v"] for r in out.take_all()) == [2, 4]

    tri = run_workflow([
        {"op": "triangle_count"},
    ], dataset=rd.from_arrow(pa.table(
        {"src": ["1", "1", "2"], "dst": ["2", "3", "3"]})))
    assert tri.take_all() == [{"n_triangles": 1}]


def test_workflow_yaml_file(ray_session, tmp_path, sf_dir):
    """X1 parity: the sembench-shaped YAML spec file drives the same
    step compiler, with file params overridable at the call."""
    from k_gap_ray.workflow import run_workflow_file

    spec = tmp_path / "wf.yml"
    spec.write_text(
        "params:\n"
        "  lang: en\n"
        "steps:\n"
        f"  - op: read_parquet\n    path: {sf_dir}/documents.parquet\n"
        "    columns: [doc_id, lang]\n"
        "  - op: filter\n    expr: lang == '${lang}'\n"
        "  - op: groupby_count\n    keys: [lang]\n")
    out = run_workflow_file(str(spec)).take_all()
    assert len(out) == 1 and out[0]["lang"] == "en"
    # override the file's param at the call site
    out2 = run_workflow_file(str(spec), lang="de").take_all()
    assert len(out2) == 1 and out2[0]["lang"] == "de"


def test_workflow_yaml_callable_param(ray_session, tmp_path):
    """A full-match ${var} substitutes the RAW param value, so YAML
    specs can reference callables (X2 user fns) via params."""
    import ray.data as rd

    from k_gap_ray.workflow import load_workflow, run_workflow_file

    spec = tmp_path / "wf_fn.yml"
    spec.write_text(
        "steps:\n"
        "  - op: map_batches\n    fn: ${double}\n")

    def double(t: pa.Table) -> pa.Table:
        return t.append_column(
            "v2", pa.compute.multiply(t.column("v"), 2))

    ds = rd.from_arrow(pa.table({"v": [1, 2]}))
    out = run_workflow_file(str(spec), dataset=ds, double=double)
    assert sorted(r["v2"] for r in out.take_all()) == [2, 4]

    bad = tmp_path / "bad.yml"
    bad.write_text("steps:\n")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="steps"):
        load_workflow(str(bad))


def test_workflow_sparql_ask_step(ray_session):
    """The sparql workflow step routes ASK queries to a one-row
    boolean dataset."""
    import ray.data as rd

    from k_gap_ray.workflow import run_workflow

    quads = rd.from_arrow(pa.table({
        "subj": ["a"], "pred": ["p"], "obj": ["b"], "graph": ["g"]}))
    out = run_workflow([
        {"op": "sparql", "query": "ASK { <a> <p> <b> . }"},
    ], dataset=quads)
    assert out.take_all() == [{"ask": True}]


def test_assign_splits(ray_session, sf_dir):
    """80/10/10 split labels: disjoint+exhaustive, deterministic
    across layouts, hash-sample-consistent, bad pcts rejected."""
    import pytest
    import ray.data as rd

    from k_gap_ray.ops.transform import assign_splits, hash_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    out = {r["doc_id"]: r["split"]
           for r in assign_splits(docs, "doc_id").take_all()}
    n = len(out)
    assert n == docs.count()  # every row labeled exactly once
    frac_train = sum(1 for s in out.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    # block layout must not change the assignment
    out2 = {r["doc_id"]: r["split"]
            for r in assign_splits(docs.repartition(7),
                                   "doc_id").take_all()}
    assert out2 == out
    # the train bucket IS hash_sample(keep_pct=80)'s selection
    kept = {r["doc_id"]
            for r in hash_sample(docs, "doc_id", 80).take_all()}
    assert kept == {d for d, s in out.items() if s == "train"}
    with pytest.raises(ValueError, match="sum"):
        assign_splits(docs, "doc_id", splits=[("a", 50), ("b", 20)])


def test_weighted_hash_sample_is_proportional_and_deterministic(
        ray_session):
    """Weighted Bernoulli keep: weight 0 drops everything, the
    modulus keeps everything, a mid weight keeps roughly its share
    over many ids; two runs agree row-for-row (no RNG state), the
    SQL keep-predicate matches exactly."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.ops.transform import (sql_weighted_hash_sample,
                                         weighted_hash_sample)

    n = 2000
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "w": pa.array([0, 250, 1000] * (n // 3) +
                                [0] * (n % 3), pa.int64())})
    kept = weighted_hash_sample(rd.from_arrow(t).repartition(3),
                                "doc_id", "w", seed=2).take_all()
    by_w = {}
    for r in kept:
        by_w.setdefault(r["w"], []).append(r["doc_id"])
    assert 0 not in by_w                       # w=0: never kept
    assert len(by_w[1000]) == n // 3           # w=modulus: always kept
    frac = len(by_w[250]) / (n // 3)
    assert 0.15 < frac < 0.35                  # ~25% of the w=250 rows

    con = duckdb.connect()
    con.register("t", t)
    keep = sql_weighted_hash_sample("w", id_col="doc_id", seed=2)
    want = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM t WHERE {keep}").fetchall())
    assert sorted(r["doc_id"] for r in kept) == want
    again = sorted(r["doc_id"] for r in
                   weighted_hash_sample(rd.from_arrow(t), "doc_id",
                                        "w", seed=2).take_all())
    assert again == want
