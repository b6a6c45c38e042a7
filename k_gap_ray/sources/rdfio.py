"""N-Triples/N-Quads text <-> triples-table conversion (S2/S8).

The reference bulk-loads and dumps RDF as text over HTTP
(/root/reference/docs/components/graphdb.md:249-277,410-428). Here the
same capability is a pair of vectorized-enough map_batches kernels
over ``ray.data.read_text`` lines / formatted text rows. One compiled
regex per worker; no driver-side row loops.
"""

from __future__ import annotations

import re

import pyarrow as pa

# <s> <p> <o|"lit"[^^<dt>|@lang]> [<graph>] .
_NT_RE = re.compile(
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
    r'(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?)'
    r'(?:\s+<([^>]*)>)?\s*\.\s*$')

_ESCAPES = {"\\n": "\n", "\\r": "\r", "\\t": "\t", '\\"': '"', "\\\\": "\\"}
_UNESC_RE = re.compile(r'\\[nrt"\\]')
_ESC_RE = re.compile(r'[\n\r\t"\\]')
_ESC_MAP = {"\n": "\\n", "\r": "\\r", "\t": "\\t", '"': '\\"', "\\": "\\\\"}


def _unescape(s: str) -> str:
    return _UNESC_RE.sub(lambda m: _ESCAPES[m.group(0)], s)


def _escape(s: str) -> str:
    return _ESC_RE.sub(lambda m: _ESC_MAP[m.group(0)], s)


def parse_ntriples_batch(batch: pa.Table) -> pa.Table:
    """text lines -> triples rows (bad lines dropped, counted in-row)."""
    cols: dict[str, list] = {k: [] for k in
                             ("subj", "pred", "obj", "obj_is_literal",
                              "obj_datatype", "obj_lang", "graph", "url")}
    for line in batch.column("text").to_pylist():
        m = _NT_RE.match(line or "")
        if not m:
            continue
        s, p, o_iri, o_lit, dt, lang, g = m.groups()
        cols["subj"].append(s)
        cols["pred"].append(p)
        if o_iri is not None:
            cols["obj"].append(o_iri)
            cols["obj_is_literal"].append(False)
            cols["obj_datatype"].append("")
            cols["obj_lang"].append("")
        else:
            cols["obj"].append(_unescape(o_lit))
            cols["obj_is_literal"].append(True)
            cols["obj_datatype"].append(dt or "")
            cols["obj_lang"].append(lang or "")
        cols["graph"].append(g or "")
        cols["url"].append("")
    return pa.table({
        "subj": pa.array(cols["subj"], pa.string()),
        "pred": pa.array(cols["pred"], pa.string()),
        "obj": pa.array(cols["obj"], pa.string()),
        "obj_is_literal": pa.array(cols["obj_is_literal"], pa.bool_()),
        "obj_datatype": pa.array(cols["obj_datatype"], pa.string()),
        "obj_lang": pa.array(cols["obj_lang"], pa.string()),
        "graph": pa.array(cols["graph"], pa.string()),
        "url": pa.array(cols["url"], pa.string()),
    })


def read_ntriples(paths):
    """N-Triples/N-Quads file(s) -> triples Dataset."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(parse_ntriples_batch,
                                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Turtle (subset) — S2 parity with the reference's bulk-load formats
# (/root/reference/docs/components/graphdb.md:249-263). Supported:
# @prefix/PREFIX, prefixed names, <IRI>s, 'a' for rdf:type, string
# literals with @lang / ^^datatype, numeric and boolean literals, and
# ';' / ',' predicate/object continuation. Blank nodes and collections
# are skipped (counted per batch). Turtle is stateful (prefixes +
# multi-line statements), so the parallel unit is one FILE per task —
# files shard across the cluster, bytes inside a file do not.
# ---------------------------------------------------------------------------

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_TTL_TOKEN = re.compile(
    r"""(?x)
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<string>\"(?:[^"\\]|\\.)*\")
    | (?P<keyword>@prefix\b|@base\b|(?i:\bPREFIX|\bBASE|\bGRAPH)\b
                  |\ba\b|\btrue\b|\bfalse\b)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtmark>\^\^)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.-]*)
    | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<punct>[.;,{}\[\]()])
    """)


def parse_turtle_text(text: str) -> tuple[list[dict], int]:
    """Parse one Turtle document -> (triple rows, n_skipped_tokens).

    Blank nodes: ``_:label`` and anonymous ``[ ... ]`` property lists
    (nested ok) are supported — SHACL shape files lean on the
    bracketed idiom for sh:property (ops/shacl.py)."""
    prefixes: dict[str, str] = {}
    rows: list[dict] = []
    skipped = 0
    bn_counter = 0
    bn_stack: list[tuple] = []  # (subj, pred) saved across [ ... ]

    tokens: list[tuple[str, tuple]] = []
    for m in _TTL_TOKEN.finditer(text):
        kind = m.lastgroup
        if m.group("comment"):
            continue
        if m.group("iri"):
            tokens.append(("iri", (m.group("iri")[1:-1],)))
        elif m.group("string"):
            tokens.append(("string", (_unescape(m.group("string")[1:-1]),)))
        elif m.group("langtag"):
            tokens.append(("lang", (m.group("langtag")[1:],)))
        elif m.group("dtmark"):
            tokens.append(("dtmark", ()))
        elif m.group("local") is not None and kind in ("pname", "local"):
            tokens.append(("pname", (m.group("pname") or "",
                                     m.group("local"))))
        elif m.group("keyword"):
            tokens.append(("kw", (m.group("keyword"),)))
        elif m.group("number"):
            tokens.append(("number", (m.group("number"),)))
        elif m.group("punct"):
            tokens.append(("punct", (m.group("punct"),)))

    i, n = 0, len(tokens)

    def resolve(tok) -> str | None:
        kind, args = tok
        if kind == "iri":
            return args[0]
        if kind == "pname":
            if args[0] == "_":  # labeled blank node, not a prefix
                return "_:" + args[1]
            base = prefixes.get(args[0])
            return None if base is None else base + args[1]
        return None

    subj = pred = None
    graph = ""  # TriG: non-empty inside a GRAPH <g> { ... } block
    while i < n:
        kind, args = tokens[i]
        # TriG graph blocks: [GRAPH] <g> { ... }  /  { ... } (default)
        if kind == "kw" and args[0].lower() == "graph":
            i += 1
            continue  # label + '{' handled below
        if kind == "punct" and args[0] == "{":
            # an IRI/pname we just stored as subj was the graph LABEL
            if subj is not None and pred is None:
                graph, subj = subj, None
            i += 1
            continue
        if kind == "punct" and args[0] == "}":
            graph = ""
            subj = pred = None
            i += 1
            continue
        # anonymous blank node [ ... ]
        if kind == "punct" and args[0] == "[":
            bn_counter += 1
            node = f"_:anon{bn_counter}"
            if subj is None:
                # subject-position bracket: parse its property list,
                # then resume the outer statement with it as subject
                bn_stack.append((node, None))
                subj = node
            elif pred is not None:
                rows.append({
                    "subj": subj, "pred": pred, "obj": node,
                    "obj_is_literal": False, "obj_datatype": "",
                    "obj_lang": "", "graph": graph, "url": "",
                })
                bn_stack.append((subj, pred))
                subj, pred = node, None
            else:
                skipped += 1  # '[' in predicate position: malformed
            i += 1
            continue
        if kind == "punct" and args[0] == "]":
            subj, pred = bn_stack.pop() if bn_stack else (None, None)
            i += 1
            # statement continuation after the bracketed node (only
            # when it sat in object position, i.e. pred was saved)
            if pred is not None and i < n and tokens[i][0] == "punct":
                p = tokens[i][1][0]
                if p == ".":
                    subj = pred = None
                    i += 1
                elif p == ";":
                    pred = None
                    i += 1
                elif p == ",":
                    i += 1
            elif pred is None and i < n and tokens[i] == ("punct", (".",)):
                # bare [ ... ] . statement: consume the terminator
                subj = None
                i += 1
            continue
        # prefix declaration: @prefix p: <iri> .   /   PREFIX p: <iri>
        if kind == "kw" and args[0].lower() in ("@prefix", "prefix"):
            if (i + 2 < n and tokens[i + 1][0] == "pname"
                    and tokens[i + 2][0] == "iri"):
                prefixes[tokens[i + 1][1][0]] = tokens[i + 2][1][0]
                i += 3
                if i < n and tokens[i] == ("punct", (".",)):
                    i += 1
                continue
            skipped += 1
            i += 1
            continue
        if kind == "kw" and args[0].lower() in ("@base", "base"):
            skipped += 1
            i += 2 if i + 1 < n else 1
            continue
        if subj is None:
            subj = resolve(tokens[i])
            if subj is None:
                skipped += 1
            i += 1
            continue
        if pred is None:
            if kind == "kw" and args[0] == "a":
                pred = _RDF_TYPE
            else:
                pred = resolve(tokens[i])
                if pred is None:
                    skipped += 1
                    pred = None
            i += 1
            continue
        # object position
        obj = lit = dt = lang = None
        if kind == "string":
            lit = args[0]
            if i + 1 < n and tokens[i + 1][0] == "lang":
                lang = tokens[i + 1][1][0]
                i += 1
            elif (i + 2 < n and tokens[i + 1][0] == "dtmark"):
                dt = resolve(tokens[i + 2]) or ""
                i += 2
        elif kind == "number":
            lit = args[0]
            dt = ("http://www.w3.org/2001/XMLSchema#decimal"
                  if "." in args[0] or "e" in args[0].lower()
                  else "http://www.w3.org/2001/XMLSchema#integer")
        elif kind == "kw" and args[0] in ("true", "false"):
            lit = args[0]
            dt = "http://www.w3.org/2001/XMLSchema#boolean"
        else:
            obj = resolve(tokens[i])
        i += 1
        if obj is None and lit is None:
            skipped += 1
        else:
            rows.append({
                "subj": subj, "pred": pred,
                "obj": lit if obj is None else obj,
                "obj_is_literal": obj is None,
                "obj_datatype": dt or "", "obj_lang": lang or "",
                "graph": graph, "url": "",
            })
        # statement continuation
        if i < n and tokens[i][0] == "punct":
            p = tokens[i][1][0]
            if p == ".":
                subj = pred = None
                i += 1
            elif p == ";":
                pred = None
                i += 1
            elif p == ",":
                i += 1
        else:
            # bare end: reset to be safe
            subj = pred = None
    return rows, skipped


_TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()), ("obj_datatype", pa.string()),
    ("obj_lang", pa.string()), ("graph", pa.string()), ("url", pa.string()),
])


def read_turtle(paths):
    """Turtle file(s) -> triples Dataset (one file per task; Turtle's
    statefulness makes the file the parallel unit, unlike N-Triples
    where any byte-range of lines parses independently)."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    if isinstance(paths, str):
        files = sorted(_glob.glob(_os.path.join(paths, "*.ttl"))
                       + _glob.glob(_os.path.join(paths, "*.trig"))) \
            if _os.path.isdir(paths) else [paths]
    else:
        files = sorted(paths)

    def parse_files(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path in t.column("path").to_pylist():
            with open(path, encoding="utf-8") as f:
                file_rows, _ = parse_turtle_text(f.read())
            rows.extend(file_rows)
        return pa.Table.from_pylist(rows, schema=_TRIPLE_SCHEMA)

    return rd.from_items([{"path": p} for p in files]) \
        .map_batches(parse_files, batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------------------
# RDF/XML (subset) — rdf:RDF/rdf:Description trees with rdf:about,
# typed node elements, property elements carrying rdf:resource or a
# text literal (xml:lang / rdf:datatype). Blank nodes (rdf:nodeID,
# anonymous nesting) and rdf:parseType are skipped with a count.
# ---------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_NS = "http://www.w3.org/XML/1998/namespace"


def _xml_expand(tag: str) -> str:
    return tag[1:].replace("}", "") if tag.startswith("{") else tag


def parse_rdfxml_text(text: str,
                      bnode_prefix: str = "") -> tuple[list[dict], int]:
    """Parse one RDF/XML document -> (triple rows, n_skipped_nodes).

    Nested subset (reference import surface,
    docs/components/graphdb.md:249-263): node elements nest inside
    property elements arbitrarily deep (link emitted, child walked),
    ``rdf:nodeID`` and anonymous node elements become blank nodes
    (``_:`` + nodeID, or ``_:b{prefix}{n}`` in document order), and
    ``rdf:parseType="Resource"`` property elements open an anonymous
    node whose children are property elements. Only reification and
    rdf:parseType="Collection"/"Literal" remain skipped-with-count."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    rows: list[dict] = []
    skipped = 0
    counter = [0]

    def fresh_bnode() -> str:
        counter[0] += 1
        return f"_:b{bnode_prefix}{counter[0] - 1}"

    def node_subj(node) -> str:
        subj = node.attrib.get(f"{{{_RDF_NS}}}about")
        if subj is not None:
            return subj
        node_id = node.attrib.get(f"{{{_RDF_NS}}}nodeID")
        if node_id is not None:
            return "_:" + node_id
        return fresh_bnode()

    def link(subj, pred, obj):
        rows.append({"subj": subj, "pred": pred, "obj": obj,
                     "obj_is_literal": False, "obj_datatype": "",
                     "obj_lang": "", "graph": "", "url": ""})

    def walk_props(subj: str, props) -> None:
        nonlocal skipped
        for prop in props:
            pred = _xml_expand(prop.tag)
            res = prop.attrib.get(f"{{{_RDF_NS}}}resource")
            node_id = prop.attrib.get(f"{{{_RDF_NS}}}nodeID")
            ptype = prop.attrib.get(f"{{{_RDF_NS}}}parseType")
            if res is not None:
                link(subj, pred, res)
            elif node_id is not None:
                link(subj, pred, "_:" + node_id)
            elif ptype == "Resource":
                # anonymous node: the property element's children are
                # ITS property elements
                child = fresh_bnode()
                link(subj, pred, child)
                walk_props(child, prop)
            elif ptype is not None:
                skipped += 1  # Collection / Literal: out of subset
            elif len(prop) == 0:
                rows.append({
                    "subj": subj, "pred": pred, "obj": prop.text or "",
                    "obj_is_literal": True,
                    "obj_datatype": prop.attrib.get(
                        f"{{{_RDF_NS}}}datatype", ""),
                    "obj_lang": prop.attrib.get(f"{{{_XML_NS}}}lang", ""),
                    "graph": "", "url": ""})
            else:
                # nested node element(s): link + recurse
                for child in prop:
                    link(subj, pred, walk_node(child))

    def walk_node(node) -> str:
        subj = node_subj(node)
        node_type = _xml_expand(node.tag)
        if node_type != _RDF_NS + "Description":
            link(subj, _RDF_TYPE, node_type)
        walk_props(subj, node)
        return subj

    nodes = list(root) if _xml_expand(root.tag) == _RDF_NS + "RDF" else [root]
    for node in nodes:
        walk_node(node)
    return rows, skipped


def read_rdfxml(paths):
    """RDF/XML file(s) -> triples Dataset (file-per-task)."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    if isinstance(paths, str):
        files = sorted(_glob.glob(_os.path.join(paths, "*.rdf"))
                       + _glob.glob(_os.path.join(paths, "*.xml"))) \
            if _os.path.isdir(paths) else [paths]
    else:
        files = sorted(paths)

    def parse_files(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path, idx in zip(t.column("path").to_pylist(),
                             t.column("idx").to_pylist()):
            with open(path, encoding="utf-8") as f:
                # per-file blank prefix: labels are document-scoped
                file_rows, _ = parse_rdfxml_text(f.read(),
                                                 bnode_prefix=f"{idx}_")
            rows.extend(file_rows)
        return pa.Table.from_pylist(rows, schema=_TRIPLE_SCHEMA)

    return rd.from_items([{"path": p, "idx": i}
                          for i, p in enumerate(files)]) \
        .map_batches(parse_files, batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------------------
# JSON-LD (nested subset) — the other bulk-load format the reference
# accepts (docs/faq.md export section). Supported: top-level node
# objects or @graph arrays, @context prefix/term maps (string values),
# @id/@type, predicate values as strings, {"@id"}, {"@value"
# [,@language|@type]}, or lists thereof. Nested node objects and
# full @context semantics are out of scope (documented subset).
# ---------------------------------------------------------------------------

def _jsonld_expand(term: str, ctx: dict[str, str]) -> str:
    if term in ctx:
        return ctx[term]
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in ctx:
            return ctx[pfx] + local
    return term


def parse_jsonld_obj(doc: dict, graph: str = "",
                     bnode_prefix: str = "") -> list[dict]:
    """One parsed JSON-LD document -> triple rows.

    Nested subset (reference import surface,
    docs/components/graphdb.md:249-263): node objects may nest other
    node objects arbitrarily deep (the link triple is emitted and the
    nested node is walked with its own @id as subject), nodes without
    an @id become blank nodes labelled ``_:b{prefix}{n}`` in document
    walk order (blank labels are document-scoped in RDF; callers
    merging many files pass a per-file ``bnode_prefix`` to keep them
    apart), and a nested ``{"@id": g, "@graph": [...]}`` object scopes
    its contained nodes to the named graph ``g``."""
    ctx_raw = doc.get("@context") or {}
    ctx = {k: v for k, v in ctx_raw.items()
           if isinstance(v, str)} if isinstance(ctx_raw, dict) else {}
    rows: list[dict] = []
    counter = [0]

    def fresh_bnode() -> str:
        counter[0] += 1
        return f"_:b{bnode_prefix}{counter[0] - 1}"

    def emit(subj, pred, value, g):
        base = {"subj": subj, "pred": pred, "graph": g, "url": "",
                "obj_datatype": "", "obj_lang": ""}
        if isinstance(value, dict):
            if "@value" in value:
                rows.append({**base, "obj": str(value["@value"]),
                             "obj_is_literal": True,
                             "obj_datatype": _jsonld_expand(
                                 value.get("@type", ""), ctx)
                             if value.get("@type") else "",
                             "obj_lang": value.get("@language", "")})
            else:
                # nested node object (named or blank): link + recurse
                child = walk_node(value, g)
                rows.append({**base, "obj": child,
                             "obj_is_literal": False})
        elif isinstance(value, list):
            for v in value:
                emit(subj, pred, v, g)
        elif isinstance(value, bool):
            rows.append({**base, "obj": "true" if value else "false",
                         "obj_is_literal": True,
                         "obj_datatype":
                         "http://www.w3.org/2001/XMLSchema#boolean"})
        elif isinstance(value, (int, float)):
            rows.append({**base, "obj": str(value), "obj_is_literal": True,
                         "obj_datatype":
                         "http://www.w3.org/2001/XMLSchema#integer"
                         if isinstance(value, int) else
                         "http://www.w3.org/2001/XMLSchema#decimal"})
        else:
            rows.append({**base, "obj": str(value), "obj_is_literal": True})

    def walk_node(node: dict, g: str) -> str:
        subj = (_jsonld_expand(node["@id"], ctx) if "@id" in node
                else fresh_bnode())
        if "@graph" in node:
            # named-graph object: contained nodes live in graph `subj`
            inner_g = subj if "@id" in node else g
            for child in node["@graph"]:
                if isinstance(child, dict):
                    walk_node(child, inner_g)
        for key, value in node.items():
            if key == "@type":
                for tv in value if isinstance(value, list) else [value]:
                    rows.append({
                        "subj": subj, "pred": _RDF_TYPE,
                        "obj": _jsonld_expand(tv, ctx),
                        "obj_is_literal": False, "obj_datatype": "",
                        "obj_lang": "", "graph": g, "url": ""})
            elif not key.startswith("@"):
                emit(subj, _jsonld_expand(key, ctx), value, g)
        return subj

    top = doc.get("@graph")
    if top is not None:
        for node in top:
            if isinstance(node, dict):
                walk_node(node, graph)
    elif "@id" in doc or any(not k.startswith("@") for k in doc):
        walk_node(doc, graph)
    return rows


def read_jsonld(paths):
    """JSON-LD file(s) -> triples Dataset (file-per-task, like Turtle)."""
    import glob as _glob
    import json as _json
    import os as _os

    import ray.data as rd

    if isinstance(paths, str):
        files = sorted(_glob.glob(_os.path.join(paths, "*.jsonld"))
                       + _glob.glob(_os.path.join(paths, "*.json"))) \
            if _os.path.isdir(paths) else [paths]
    else:
        files = sorted(paths)

    def parse_files(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path, idx in zip(t.column("path").to_pylist(),
                             t.column("idx").to_pylist()):
            with open(path, encoding="utf-8") as f:
                doc = _json.load(f)
            docs = doc if isinstance(doc, list) else [doc]
            for j, d in enumerate(docs):
                # blank labels are document-scoped: a per-(file, doc)
                # prefix keeps merged graphs renamed apart
                rows.extend(parse_jsonld_obj(d, bnode_prefix=f"{idx}_{j}_"))
        return pa.Table.from_pylist(rows, schema=_TRIPLE_SCHEMA)

    return rd.from_items([{"path": p, "idx": i}
                          for i, p in enumerate(files)]) \
        .map_batches(parse_files, batch_format="pyarrow", batch_size=1)


def format_ntriples_batch(batch: pa.Table) -> pa.Table:
    """triples rows -> one N-Quads line per row (text column)."""
    lines = []
    graphs = (batch.column("graph").to_pylist()
              if "graph" in batch.column_names else [None] * batch.num_rows)
    for s, p, o, is_lit, dt, lang, g in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
            batch.column("obj_is_literal").to_pylist(),
            batch.column("obj_datatype").to_pylist(),
            batch.column("obj_lang").to_pylist(),
            graphs):
        if is_lit:
            term = f'"{_escape(o)}"'
            if dt:
                term += f"^^<{dt}>"
            elif lang:
                term += f"@{lang}"
        else:
            term = f"<{o}>"
        gpart = f" <{g}>" if g else ""
        lines.append(f"<{s}> <{p}> {term}{gpart} .")
    return pa.table({"text": pa.array(lines, pa.string())})


def format_trig_batch(batch: pa.Table) -> pa.Table:
    """triples rows -> TriG text (one named-graph block per graph
    value appearing in the batch; graphless rows emit bare triples).
    The reference's backup format (graphdb.md:410-428 exports
    application/x-trig)."""
    by_graph: dict[str, list[str]] = {}
    graphs = (batch.column("graph").to_pylist()
              if "graph" in batch.column_names else [""] * batch.num_rows)
    for s, p, o, is_lit, dt, lang, g in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
            batch.column("obj_is_literal").to_pylist(),
            batch.column("obj_datatype").to_pylist(),
            batch.column("obj_lang").to_pylist(),
            graphs):
        if is_lit:
            term = f'"{_escape(o)}"'
            if dt:
                term += f"^^<{dt}>"
            elif lang:
                term += f"@{lang}"
        else:
            term = f"<{o}>"
        by_graph.setdefault(g or "", []).append(
            f"  <{s}> <{p}> {term} .")
    chunks = []
    for g in sorted(by_graph):
        lines = "\n".join(by_graph[g])
        if g:
            chunks.append(f"<{g}> {{\n{lines}\n}}")
        else:
            chunks.append("\n".join(ln.lstrip() for ln in by_graph[g]))
    return pa.table({"text": pa.array(chunks, pa.string())})


def write_trig(triples_ds, out_dir: str):
    """triples Dataset -> directory of .trig shard files, one
    named-graph block per graph per shard (S8's quad-preserving twin:
    the reference backs its store up as TriG and restores by POSTing
    it back — our read_turtle parses these shards straight back into
    the same quads). Content-addressed shard names, retry-safe."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        t = format_trig_batch(batch)
        body = "\n".join(t.column("text").to_pylist()) + "\n"
        name = hashlib.blake2b(body.encode("utf-8"),
                               digest_size=10).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.trig")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(body)
        os.replace(tmp, path)
        return pa.table({"path": [path], "n_blocks": [t.num_rows]})

    return triples_ds.map_batches(write_shard, batch_format="pyarrow")


def write_ntriples(triples_ds, out_dir: str):
    """triples Dataset -> directory of .nt shard files (graph dump S8).

    Each batch writes one deterministic content-addressed shard (safe
    under task retries: a rerun overwrites the same file with the same
    bytes). Returns the shard-manifest Dataset (path, n_lines)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        t = format_ntriples_batch(batch)
        body = "\n".join(t.column("text").to_pylist()) + "\n"
        name = hashlib.blake2b(body.encode("utf-8"), digest_size=10).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.nt")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(body)
        os.replace(tmp, path)
        return pa.table({"path": [path], "n_lines": [t.num_rows]})

    return triples_ds.map_batches(write_shard, batch_format="pyarrow")
