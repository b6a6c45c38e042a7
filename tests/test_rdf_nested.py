"""Nested JSON-LD and nested RDF/XML import (sources/rdfio.py —
the reference accepts both at bulk load, graphdb.md:249-263):
recursive node objects, blank nodes, named graphs, parseType=Resource."""

import pyarrow as pa

from k_gap_ray.sources.rdfio import parse_jsonld_obj, parse_rdfxml_text


def _spo(rows):
    return sorted((r["subj"], r["pred"], r["obj"]) for r in rows)


def test_jsonld_nested_node_objects():
    doc = {
        "@context": {"kp": "urn:kgap:pred:"},
        "@id": "urn:d:1",
        "kp:source": {
            "@id": "urn:s:1",
            "kp:label": {"@value": "station", "@language": "en"},
            "kp:region": {"@id": "urn:r:9"},
        },
    }
    rows = parse_jsonld_obj(doc)
    assert _spo(rows) == [
        ("urn:d:1", "urn:kgap:pred:source", "urn:s:1"),
        ("urn:s:1", "urn:kgap:pred:label", "station"),
        ("urn:s:1", "urn:kgap:pred:region", "urn:r:9"),
    ]
    lab = [r for r in rows if r["pred"] == "urn:kgap:pred:label"][0]
    assert lab["obj_lang"] == "en" and lab["obj_is_literal"]


def test_jsonld_blank_nodes_and_prefix():
    doc = {
        "@id": "urn:d:1",
        "urn:p:meta": {"urn:p:n": 3},
    }
    rows = parse_jsonld_obj(doc, bnode_prefix="7_")
    link = [r for r in rows if r["pred"] == "urn:p:meta"][0]
    assert link["obj"] == "_:b7_0" and not link["obj_is_literal"]
    leaf = [r for r in rows if r["pred"] == "urn:p:n"][0]
    assert leaf["subj"] == "_:b7_0" and leaf["obj"] == "3"
    assert leaf["obj_datatype"].endswith("integer")


def test_jsonld_named_graph_object():
    doc = {
        "@graph": [
            {"@id": "urn:g:1", "@graph": [
                {"@id": "urn:d:1", "urn:p:x": "v"}]},
            {"@id": "urn:d:2", "urn:p:y": "w"},
        ],
    }
    rows = parse_jsonld_obj(doc)
    by_pred = {r["pred"]: r for r in rows}
    assert by_pred["urn:p:x"]["graph"] == "urn:g:1"
    assert by_pred["urn:p:y"]["graph"] == ""


def test_rdfxml_nested_descriptions():
    text = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:kp="urn:kgap:pred:">
      <rdf:Description rdf:about="urn:d:1">
        <kp:source>
          <rdf:Description rdf:about="urn:s:1">
            <kp:label xml:lang="en">station</kp:label>
            <kp:region rdf:resource="urn:r:9"/>
          </rdf:Description>
        </kp:source>
      </rdf:Description>
    </rdf:RDF>"""
    rows, skipped = parse_rdfxml_text(text)
    assert skipped == 0
    assert _spo(rows) == [
        ("urn:d:1", "urn:kgap:pred:source", "urn:s:1"),
        ("urn:s:1", "urn:kgap:pred:label", "station"),
        ("urn:s:1", "urn:kgap:pred:region", "urn:r:9"),
    ]


def test_rdfxml_blank_nodes_and_parsetype_resource():
    text = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:kp="urn:kgap:pred:">
      <rdf:Description rdf:about="urn:d:1">
        <kp:author rdf:nodeID="a1"/>
        <kp:meta rdf:parseType="Resource">
          <kp:n rdf:datatype="urn:xsd:int">3</kp:n>
        </kp:meta>
        <kp:item>
          <kp:Widget>
            <kp:size>big</kp:size>
          </kp:Widget>
        </kp:item>
      </rdf:Description>
      <rdf:Description rdf:nodeID="a1">
        <kp:name>carol</kp:name>
      </rdf:Description>
    </rdf:RDF>"""
    rows, skipped = parse_rdfxml_text(text, bnode_prefix="2_")
    assert skipped == 0
    spo = _spo(rows)
    assert ("urn:d:1", "urn:kgap:pred:author", "_:a1") in spo
    assert ("_:a1", "urn:kgap:pred:name", "carol") in spo
    # parseType=Resource anonymous node
    meta = [r for r in rows if r["pred"] == "urn:kgap:pred:meta"][0]
    assert meta["obj"].startswith("_:b2_")
    assert (meta["obj"], "urn:kgap:pred:n", "3") in spo
    # typed anonymous nested node element
    item = [r for r in rows if r["pred"] == "urn:kgap:pred:item"][0]
    typ = [r for r in rows if r["subj"] == item["obj"]
           and r["pred"].endswith("#type")]
    assert typ and typ[0]["obj"] == "urn:kgap:pred:Widget"
    assert (item["obj"], "urn:kgap:pred:size", "big") in spo


def test_trig_writer_roundtrip(ray_session, tmp_path):
    """S8 quad-preserving dump: write_trig shards parse straight back
    through read_turtle with graphs, datatypes and language tags
    intact (the reference's backup/restore cycle, graphdb.md:410-428)."""
    import ray.data as rd

    from k_gap_ray.sources.rdfio import read_turtle, write_trig

    rows = [
        ("urn:s:1", "urn:p:a", "urn:o:1", False, "", "", "urn:g:1"),
        ("urn:s:1", "urn:p:b", "hello \"q\"", True, "", "en", "urn:g:1"),
        ("urn:s:2", "urn:p:c", "42", True,
         "http://www.w3.org/2001/XMLSchema#integer", "", "urn:g:2"),
    ]
    cols = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
            "obj_lang", "graph"]
    tbl = pa.table({c: pa.array([r[i] for r in rows],
                    pa.bool_() if c == "obj_is_literal" else pa.string())
                    for i, c in enumerate(cols)})
    out = str(tmp_path / "dump")
    manifest = write_trig(rd.from_arrow(tbl), out).take_all()
    assert sum(m["n_blocks"] for m in manifest) >= 2

    back = read_turtle(out).take_all()
    got = sorted((r["subj"], r["pred"], r["obj"], r["obj_is_literal"],
                  r["obj_datatype"], r["obj_lang"], r["graph"])
                 for r in back)
    assert got == sorted(rows)


def test_nested_readers_roundtrip_files(ray_session, tmp_path):
    """read_jsonld / read_rdfxml over nested fixture files: per-file
    blank prefixes keep document-scoped labels apart after the merge."""
    import json

    from k_gap_ray.sources.rdfio import read_jsonld, read_rdfxml

    for i in range(2):
        (tmp_path / f"f{i}.jsonld").write_text(json.dumps(
            {"@id": f"urn:d:{i}", "urn:p:meta": {"urn:p:n": i}}))
    rows = read_jsonld(str(tmp_path)).take_all()
    blanks = {r["obj"] for r in rows if r["pred"] == "urn:p:meta"}
    assert len(blanks) == 2  # renamed apart across files

    xml = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:kp="urn:kgap:pred:">
      <rdf:Description rdf:about="urn:d:{i}">
        <kp:meta rdf:parseType="Resource"><kp:n>{i}</kp:n></kp:meta>
      </rdf:Description>
    </rdf:RDF>"""
    xdir = tmp_path / "xml"
    xdir.mkdir()
    for i in range(2):
        (xdir / f"g{i}.rdf").write_text(xml.replace("{i}", str(i)))
    xrows = read_rdfxml(str(xdir)).take_all()
    xblanks = {r["obj"] for r in xrows if r["pred"] == "urn:kgap:pred:meta"}
    assert len(xblanks) == 2
