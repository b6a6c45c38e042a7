"""Pred-hash-partitioned quad store (state/quadstore.py): pruning
contract + engine parity with the in-memory Dataset path."""

import os

import pyarrow as pa
import pytest

from k_gap_ray.state.quadstore import (PRED_BUCKETS, QuadStore,
                                       init_quad_store, pred_bucket)

KP = "urn:kgap:pred:"


def _quads_table() -> pa.Table:
    rows = []
    for i in range(40):
        rows.append((f"urn:e:{i}", f"{KP}funds", f"urn:e:{(i * 7) % 40}"))
    for i in range(30):
        rows.append((f"urn:e:{i}", f"{KP}monitors", f"urn:site:{i % 5}"))
    for i in range(20):
        rows.append((f"urn:e:{i}", f"{KP}locatedIn", f"loc {i % 3}"))
    return pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string())})


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("qstore") / "quads")
    init_quad_store(rd.from_arrow(_quads_table()), d, n_buckets=16)
    return QuadStore(d)


def test_meta_persisted_and_reread(store):
    # n_buckets travels with the directory — a store built with a
    # non-default count can never be probed with the wrong mapping
    assert store.n_buckets == 16
    s2 = QuadStore(store.store_dir)
    assert s2.n_buckets == 16


def test_bound_pred_scan_reads_only_its_buckets(store):
    all_files = set(store._files)
    funds_files = set(store.bucket_files([f"{KP}funds"]))
    assert funds_files and funds_files < all_files
    ds = store.scan_for_preds([f"{KP}funds"])
    assert set(ds.input_files()) == funds_files
    # every row of the FULL funds relation is inside the pruned read
    got = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("pred"),
                                            f"{KP}funds")),
        batch_format="pyarrow").count()
    assert got == 40


def test_unknown_pred_scans_nothing_but_stays_typed(store):
    ds = store.scan_for_preds([f"{KP}neverWritten"])
    # the pred's bucket may exist (shared with a real pred) — but a
    # pred hashing to an absent bucket must yield a typed empty ds
    assert ds.schema().names == ["subj", "pred", "obj"]


def test_full_reads_everything(store):
    assert store.full().count() == 90
    assert store.schema().names == ["subj", "pred", "obj"]


def test_bucket_fn_is_stable(store):
    assert pred_bucket(f"{KP}funds", PRED_BUCKETS) == \
        pred_bucket(f"{KP}funds", PRED_BUCKETS)


SEL = f"""
PREFIX kp: <{KP}>
SELECT DISTINCT ?x ?site WHERE {{
  ?x kp:funds ?y .
  ?y kp:monitors ?site .
}}
"""

SEL_VARPRED = """
SELECT ?p WHERE { ?s ?p ?o . FILTER (CONTAINS(?p, "locatedIn")) }
"""

SEL_PATH = f"""
PREFIX kp: <{KP}>
SELECT DISTINCT ?b WHERE {{ <urn:e:1> kp:funds+ ?b . }}
"""


def _run(quads, query) -> list[tuple]:
    from k_gap_ray.sparql import sparql_select

    res = sparql_select(quads, query)
    rows = res.to_pylist() if isinstance(res, pa.Table) \
        else res.take_all()
    return sorted(tuple(r[k] for k in sorted(r)) for r in rows)


@pytest.mark.parametrize("query", [SEL, SEL_VARPRED, SEL_PATH],
                         ids=["bgp_join", "var_pred", "path_plus"])
def test_engine_parity_store_vs_dataset(store, query):
    import ray.data as rd

    mem = _run(rd.from_arrow(_quads_table()), query)
    assert mem  # non-degenerate fixture
    assert _run(store, query) == mem


def test_ask_over_store(store):
    from k_gap_ray.sparql import sparql_ask

    assert sparql_ask(
        store, f'PREFIX kp: <{KP}> ASK {{ ?x kp:locatedIn "loc 1" . }}')
    assert not sparql_ask(
        store, f'PREFIX kp: <{KP}> ASK {{ ?x kp:locatedIn "loc 9" . }}')


def test_append_quads_uses_persisted_bucket_count(ray_session,
                                                  tmp_path_factory):
    import glob as _glob

    import ray.data as rd

    from k_gap_ray.state.quadstore import append_quads

    d = str(tmp_path_factory.mktemp("qstore_app") / "quads")
    base = _quads_table()
    init_quad_store(rd.from_arrow(base), d, n_buckets=16)
    extra = pa.table({
        "subj": pa.array([f"urn:x:{i}" for i in range(10)], pa.string()),
        "pred": pa.array([f"{KP}funds"] * 10, pa.string()),
        "obj": pa.array([f"urn:e:{i}" for i in range(10)], pa.string())})
    n = append_quads(rd.from_arrow(extra), d)
    assert n == 10
    # the append respected the store's n_buckets=16, not the module
    # default of 32: no bucket directory at or above 16
    dirs = {int(p.split("=")[1]) for p in _glob.glob(f"{d}/pbucket=*")}
    assert dirs and max(dirs) < 16
    # a FRESH handle (handles snapshot the file list) sees old + new
    s = QuadStore(d)
    got = s.scan_for_preds([f"{KP}funds"]).map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("pred"),
                                            f"{KP}funds")),
        batch_format="pyarrow").count()
    assert got == 50
    # engine parity: append-grown store == store rebuilt from the union
    d2 = str(tmp_path_factory.mktemp("qstore_app") / "rebuilt")
    init_quad_store(rd.from_arrow(pa.concat_tables([base, extra])), d2,
                    n_buckets=16)
    assert _run(s, SEL) == _run(QuadStore(d2), SEL)


def test_compact_reclaims_append_files(ray_session, tmp_path_factory):
    import glob as _glob

    import ray.data as rd

    from k_gap_ray.state.fingerprints import compact_store
    from k_gap_ray.state.quadstore import append_quads

    d = str(tmp_path_factory.mktemp("qstore_cmp") / "quads")
    init_quad_store(rd.from_arrow(_quads_table()), d, n_buckets=8)
    for _ in range(3):
        append_quads(rd.from_arrow(_quads_table().slice(0, 5)), d)
    before = len(_glob.glob(f"{d}/pbucket=*/*.parquet"))
    stats = compact_store(d, partition_prefix="pbucket=")
    after = len(_glob.glob(f"{d}/pbucket=*/*.parquet"))
    assert stats["files_after"] == after < before
    # bag semantics preserved: 90 base + 15 appended
    assert QuadStore(d).full().count() == 105


def test_column_pruned_scans(ray_session, tmp_path_factory):
    """Pattern scans over a WIDE quads table (extra url column) read
    only the columns they bind; results match the in-memory engine."""
    import ray.data as rd

    wide = _quads_table().append_column(
        "url", pa.array([f"u{i}" for i in range(90)], pa.string()))
    d = str(tmp_path_factory.mktemp("qstore_w") / "quads")
    init_quad_store(rd.from_arrow(wide), d, n_buckets=8)
    s = QuadStore(d)
    pruned = s.scan_for_preds([f"{KP}funds"],
                              columns=["subj", "pred", "obj"])
    assert pruned.schema().names == ["subj", "pred", "obj"]
    with pytest.raises(KeyError):
        s.scan_for_preds([f"{KP}funds"], columns=["nope"])
    # engine parity on the wide store (scans prune away url)
    assert _run(s, SEL) == _run(rd.from_arrow(wide), SEL)
    assert _run(s, SEL_PATH) == _run(rd.from_arrow(wide), SEL_PATH)


def test_construct_and_describe_over_store(ray_session,
                                           tmp_path_factory):
    import ray.data as rd

    from k_gap_ray.sparql import sparql_construct, sparql_describe

    # describe needs the obj_is_literal metadata column
    base = _quads_table()
    wide = base.append_column(
        "obj_is_literal",
        pa.array([o.startswith("loc") for o in
                  base.column("obj").to_pylist()], pa.bool_()))
    d = str(tmp_path_factory.mktemp("qstore_cd") / "quads")
    init_quad_store(rd.from_arrow(wide), d, n_buckets=8)
    s = QuadStore(d)

    q = (f"PREFIX kp: <{KP}> CONSTRUCT {{ ?a kp:near ?s }} "
         f"WHERE {{ ?a kp:monitors ?s . }}")
    mem = sorted(tuple(sorted(r.items())) for r in
                 sparql_construct(rd.from_arrow(wide), q).take_all())
    sto = sorted(tuple(sorted(r.items())) for r in
                 sparql_construct(s, q).take_all())
    assert sto == mem and mem

    dq = "DESCRIBE <urn:e:1>"
    mem_d = sorted(tuple(sorted(r.items())) for r in
                   sparql_describe(rd.from_arrow(wide), dq).take_all())
    sto_d = sorted(tuple(sorted(r.items())) for r in
                   sparql_describe(s, dq).take_all())
    assert sto_d == mem_d and mem_d
