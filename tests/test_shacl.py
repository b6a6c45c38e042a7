"""SHACL subset: shape parsing, distributed validation, SQL-backend
parity, and the validate_shapes wiring (M9)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from k_gap_ray.ops.shacl import (
    SH,
    conforming_focus,
    parse_shacl_text,
    shacl_to_sql,
    shacl_validate,
    shapes_to_rules,
)

XSD = "http://www.w3.org/2001/XMLSchema#"

# the reference's per-feed shape idiom (ldes-consumer/app.py:344,
# data/ldes-feeds-example.yml:21): a NodeShape with bracketed
# sh:property constraints
SHAPE_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix kp: <urn:kgap:pred:> .

<urn:kgap:shape:Org> a sh:NodeShape ;
  sh:targetSubjectsOf kp:employs ;
  sh:property [
    sh:path kp:employs ;
    sh:minCount 1 ;
    sh:maxCount 2 ;
    sh:datatype xsd:integer ;
    sh:pattern "^[0-9]+$" ;
  ] ;
  sh:property [
    sh:path kp:locatedIn ;
    sh:nodeKind sh:IRI ;
    sh:minCount 1 ;
  ] .
"""

KP = "urn:kgap:pred:"


def _quad(s, p, o, lit=False, dt="", graph="g1"):
    return {"subj": s, "pred": p, "obj": o, "obj_is_literal": lit,
            "obj_datatype": dt, "obj_lang": "", "graph": graph, "url": ""}


QUADS = [
    # orgA: conforming (1 integer employs, located at an IRI)
    _quad("orgA", KP + "employs", "12", lit=True, dt=XSD + "integer"),
    _quad("orgA", KP + "locatedIn", "urn:place:1"),
    # duplicate of the employs value in another graph: must collapse
    _quad("orgA", KP + "employs", "12", lit=True, dt=XSD + "integer",
          graph="g2"),
    # orgB: 3 employs values (maxCount), one with the wrong datatype
    # (datatype + pattern), and NO locatedIn (minCount)
    _quad("orgB", KP + "employs", "7", lit=True, dt=XSD + "integer"),
    _quad("orgB", KP + "employs", "8", lit=True, dt=XSD + "integer"),
    _quad("orgB", KP + "employs", "many", lit=True, dt=XSD + "string"),
    # orgC: literal-valued locatedIn (nodeKind IRI violation)
    _quad("orgC", KP + "employs", "5", lit=True, dt=XSD + "integer"),
    _quad("orgC", KP + "locatedIn", "somewhere", lit=True,
          dt=XSD + "string"),
    # not a focus node (no employs): never validated
    _quad("other", KP + "locatedIn", "also literal", lit=True,
          dt=XSD + "string"),
]

EXPECTED = {
    ("orgB", KP + "employs", "maxCount", 3),
    ("orgB", KP + "employs", "datatype", 1),
    ("orgB", KP + "employs", "pattern", 1),
    ("orgB", KP + "locatedIn", "minCount", 0),
    ("orgC", KP + "locatedIn", "nodeKind", 1),
}


def test_parse_shacl_text():
    shapes = parse_shacl_text(SHAPE_TTL)
    assert len(shapes) == 1
    s = shapes[0]
    assert s.iri == "urn:kgap:shape:Org"
    assert s.target_subjects_of == KP + "employs"
    assert s.target_class is None
    by_path = {p.path: p for p in s.properties}
    emp = by_path[KP + "employs"]
    assert (emp.min_count, emp.max_count) == (1, 2)
    assert emp.datatype == XSD + "integer"
    assert emp.pattern == "^[0-9]+$"
    loc = by_path[KP + "locatedIn"]
    assert loc.node_kind == "IRI" and loc.min_count == 1


def test_parse_shacl_target_class_and_errors():
    shapes = parse_shacl_text("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
<urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
  sh:property [ sh:path <urn:p> ; sh:minCount 1 ] .
""")
    assert shapes[0].target_class == "urn:C"
    with pytest.raises(ValueError):
        parse_shacl_text("@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
                         "<urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;"
                         " sh:property [ sh:minCount 1 ] .")
    with pytest.raises(ValueError):
        parse_shacl_text("<urn:s> <urn:p> <urn:o> .")


def test_shacl_validate(ray_session):
    shapes = parse_shacl_text(SHAPE_TTL)
    quads = rd.from_items(QUADS)
    viol = shacl_validate(quads, shapes)
    got = {(r["focus"], r["path"], r["component"], r["n"])
           for r in viol.take_all()}
    assert got == EXPECTED

    ok = {r["focus"] for r in conforming_focus(quads, shapes).take_all()}
    assert ok == {"orgA"}


def test_shacl_sql_backend_parity(ray_session):
    """The independent DuckDB compilation over the same quads must
    produce the identical violation set."""
    shapes = parse_shacl_text(SHAPE_TTL)
    con = duckdb.connect()
    con.register("quads_df", pd.DataFrame(QUADS))
    # lead="," continues an open WITH chain after our quads CTE
    sql = ("WITH quads AS (SELECT * FROM quads_df)"
           + shacl_to_sql(shapes, quads_rel="quads", lead=","))
    df = con.execute(sql).fetchdf()
    got = {(r.focus, r.path, r.component, int(r.n))
           for r in df.itertuples()}
    assert got == EXPECTED


def test_shacl_target_class(ray_session):
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
<urn:s> a sh:NodeShape ; sh:targetClass <urn:C> ;
  sh:property [ sh:path <urn:p> ; sh:minCount 2 ] .
"""
    rows = [
        _quad("x", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
              "urn:C"),
        _quad("x", "urn:p", "v1", lit=True),
        _quad("y", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
              "urn:C"),
        _quad("y", "urn:p", "v1", lit=True),
        _quad("y", "urn:p", "v2", lit=True),
        _quad("z", "urn:p", "v1", lit=True),  # not typed: not focus
    ]
    shapes = parse_shacl_text(ttl)
    viol = shacl_validate(rd.from_items(rows), shapes)
    got = {(r["focus"], r["component"], r["n"]) for r in viol.take_all()}
    assert got == {("x", "minCount", 1)}


def test_shapes_to_rules_wiring(ray_session):
    """Parsed per-triple constraints drive the existing
    validate_shapes / split_valid reject side-channel."""
    from k_gap_ray.ops.transform import split_valid, validate_shapes

    shapes = parse_shacl_text(SHAPE_TTL)
    rules = shapes_to_rules(shapes)
    preds = {r.pred for r in rules}
    assert preds == {KP + "employs", KP + "locatedIn"}

    quads = rd.from_items(QUADS)
    validated = validate_shapes(quads, rules)
    passing, rejects = split_valid(validated)
    bad = {(r["subj"], r["obj"]) for r in rejects.take_all()}
    # per-triple rejects: the wrong-datatype/pattern employs value and
    # the two literal locatedIn values (nodeKind IRI)
    assert bad == {("orgB", "many"), ("orgC", "somewhere"),
                   ("other", "also literal")}
    assert passing.count() + rejects.count() == len(QUADS)
