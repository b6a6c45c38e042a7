"""SPARQL 1.1 UPDATE subset over a quads Dataset — the reference's
user-facing mutation surface (docs/quick-reference.md:227-243,
docs/faq.md:208-211; Sync-mode ingestion IS SPARQL UPDATE,
ldes-consumer/README.md:147-148).

Supported statements (a shared ``PREFIX`` prologue, then statements
separated by ``;``)::

    INSERT DATA { ground triples }
    DELETE DATA { ground triples }
    DELETE WHERE { bgp }
    DELETE { tmpl } INSERT { tmpl } WHERE { bgp [FILTER ...] }
        (either the DELETE or the INSERT part may be omitted)
    CLEAR [SILENT] GRAPH <iri>   (drop every quad of one graph)
    CLEAR [SILENT] ALL           (empty the store, schema preserved)
    DROP  [SILENT] GRAPH <iri> | ALL   (== CLEAR: no empty-graph state)

Engine subset, defined so BOTH backends implement the same rule:

- The store is a SET of quads keyed by ``(subj, pred, obj)``: a
  delete removes every graph's copy of a matched triple; an insert of
  an ``(s, p, o)`` already present is a no-op. GRAPH-scoped update is
  out of scope (the reference's repo is likewise one store).
- Within one statement, deletes apply first, then inserts (both
  instantiated from bindings over the PRE-statement store — SPARQL
  1.1 modify semantics); statements in a sequence see the results of
  the statements before them.
- Inserted rows carry ``graph = 'urn:kgap:graph:update'``, ``url =
  ''``. Ground literals get datatype ``''`` (plain) or the xsd
  integer/decimal type for numeric tokens.
- A template OBJECT variable inherits ``(obj_is_literal,
  obj_datatype, obj_lang)`` from the store rows of the WHERE pattern
  that binds it, grouped by obj value with per-column MIN when
  sources disagree — deterministic and SQL-mirrorable. Template
  subject/predicate variables bind IRIs (predicates in templates must
  be constant IRIs or WHERE-bound vars; objects may be either).

Execution is Ray-Data-native: the WHERE part runs on the existing
SPARQL engine (sparql_select), instantiation is vectorized
map_batches, and the set arithmetic is either a broadcast key filter
(small change sets, the common case: one scan, no shuffle) or a
Bloom-prefiltered marker join (functions/bloom.py) above
``broadcast_cap`` — the same two-tier shape as the repo's anti joins.

The independent oracle backend (:func:`sparql_update_cte_sql`)
compiles the same statement sequence to chained DuckDB CTEs (NOT
EXISTS anti joins mirror the multiplicity-preserving engine filters).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from k_gap_ray.sparql import (Pattern, SparqlQuery, Term, _P, _sql_str,
                              _tokenize, sparql_select, sparql_to_sql)

GRAPH_UPDATE = "urn:kgap:graph:update"
_XSD = "http://www.w3.org/2001/XMLSchema#"
#: quads column order shared by the engine store and the SQL mirror
QUAD_COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
             "obj_lang", "graph", "url"]


@dataclass
class UpdateOp:
    insert_templates: list[Pattern] = field(default_factory=list)
    delete_templates: list[Pattern] = field(default_factory=list)
    where: SparqlQuery | None = None  # None => ground DATA form
    clear_graph: str | None = None    # iri, or "*" for CLEAR ALL
    # LOAD <file://...> [INTO GRAPH <g>]: (source iri, target graph)
    load: tuple[str, str | None] | None = None


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------

def _parse_triple_block(p: _P, ground: bool) -> list[Pattern]:
    """``{ s p o . s p o . }`` — plain terms only (no property paths
    in templates; ``a`` expands to rdf:type)."""
    from k_gap_ray.sparql import _RDF_TYPE

    p.expect_op("{")
    pats: list[Pattern] = []
    while p.peek() != ("op", "}"):
        s = p.term()
        if p.peek() == ("kw", "a"):
            p.next()
            pr = Term("iri", _RDF_TYPE)
        else:
            pr = p.term()
        o = p.term()
        if pr.kind not in ("iri", "var"):
            raise ValueError("template predicate must be an IRI or var")
        if ground and any(t.kind == "var" for t in (s, pr, o)):
            raise ValueError("INSERT/DELETE DATA needs ground triples")
        pats.append(Pattern(s, pr, o))
        if p.peek() == ("op", "."):
            p.next()
    p.next()  # }
    return pats


def _parse_group(p: _P) -> tuple[list[Pattern], list[tuple]]:
    """WHERE group subset for UPDATE: triple patterns + FILTERs (the
    full SELECT grammar — OPTIONAL/UNION/… — is out of the UPDATE
    subset; compose a SELECT first if you need it)."""
    p.expect_op("{")
    pats: list[Pattern] = []
    flts: list[tuple] = []
    while p.peek() != ("op", "}"):
        if p.kw("FILTER"):
            p.expect_op("(")
            flts.append(p.expr())
            p.expect_op(")")
        else:
            pats.extend(p.triple_patterns())
        if p.peek() == ("op", "."):
            p.next()
    p.next()  # }
    return pats, flts


def _mk_where(pats: list[Pattern], flts: list[tuple],
              templates: list[Pattern]) -> SparqlQuery:
    tvars: list[str] = []
    for t in templates:
        for v in t.vars():
            if v not in tvars:
                tvars.append(v)
    where_vars = {v for pat in pats for v in pat.vars()}
    missing = [v for v in tvars if v not in where_vars]
    if missing:
        raise ValueError(f"template vars not bound by WHERE: {missing}")
    q = SparqlQuery(select_vars=sorted(tvars), distinct=True,
                    patterns=pats, filters=flts)
    return q


def parse_sparql_update(text: str) -> list[UpdateOp]:
    p = _P(_tokenize(text))
    while p.kw("PREFIX"):
        k, v = p.next()
        if k != "pname":
            raise ValueError(f"bad PREFIX name {v!r}")
        pfx = v[: v.index(":")]
        ik, iv = p.next()
        if ik != "iri":
            raise ValueError("PREFIX needs an <iri>")
        p.prefixes[pfx] = iv[1:-1]
    ops: list[UpdateOp] = []
    while p.i < len(p.toks):
        if p.kw("INSERT"):
            if p.kw("DATA"):
                ops.append(UpdateOp(
                    insert_templates=_parse_triple_block(p, ground=True)))
            else:
                ins = _parse_triple_block(p, ground=False)
                if not p.kw("WHERE"):
                    raise ValueError("INSERT {…} needs WHERE {…}")
                pats, flts = _parse_group(p)
                ops.append(UpdateOp(insert_templates=ins,
                                    where=_mk_where(pats, flts, ins)))
        elif p.kw("DELETE"):
            if p.kw("DATA"):
                ops.append(UpdateOp(
                    delete_templates=_parse_triple_block(p, ground=True)))
            elif p.kw("WHERE"):
                pats, flts = _parse_group(p)
                ops.append(UpdateOp(delete_templates=pats,
                                    where=_mk_where(pats, flts, pats)))
            else:
                dels = _parse_triple_block(p, ground=False)
                ins: list[Pattern] = []
                if p.kw("INSERT"):
                    ins = _parse_triple_block(p, ground=False)
                if not p.kw("WHERE"):
                    raise ValueError("DELETE {…} needs WHERE {…}")
                pats, flts = _parse_group(p)
                ops.append(UpdateOp(
                    insert_templates=ins, delete_templates=dels,
                    where=_mk_where(pats, flts, dels + ins)))
        elif p.kw("LOAD"):
            # the reference ingests documents over HTTP; this build is
            # network-free by the driver contract, so only file:// (or
            # bare-path) sources are accepted — the operator itself,
            # format dispatch and graph targeting are the real thing
            p.kw("SILENT")
            k, v = p.next()
            if k != "iri":
                raise ValueError("LOAD needs an <iri> source")
            tgt = None
            if p.kw("INTO"):
                if not p.kw("GRAPH"):
                    raise ValueError("LOAD ... INTO needs GRAPH <g>")
                tk, tv = p.next()
                if tk != "iri":
                    raise ValueError("LOAD target graph must be an IRI")
                tgt = tv[1:-1]
            ops.append(UpdateOp(load=(v[1:-1], tgt)))
        elif p.kw("CLEAR") or p.kw("DROP"):
            # DROP == CLEAR here: the store tracks no empty graphs, so
            # removing a graph's quads IS removing the graph
            p.kw("SILENT")  # accepted and ignored (store never errors)
            if p.kw("ALL"):
                ops.append(UpdateOp(clear_graph="*"))
            elif p.kw("GRAPH"):
                g = p.term()
                if g.kind != "iri":
                    raise ValueError("CLEAR/DROP GRAPH needs an IRI")
                ops.append(UpdateOp(clear_graph=g.value))
            else:
                k, v = p.peek()
                raise ValueError(
                    f"CLEAR/DROP supports GRAPH <iri> or ALL, got {v!r}")
        else:
            k, v = p.peek()
            raise ValueError(f"expected INSERT, DELETE or CLEAR, "
                             f"got {v!r}")
        if p.i < len(p.toks) and p.peek() == ("op", ";"):
            p.next()
    return ops


# ---------------------------------------------------------------------------
# Engine execution
# ---------------------------------------------------------------------------

def _const_obj_flags(t: Term) -> tuple[bool, str, str]:
    if t.kind == "iri":
        return False, "", ""
    if t.kind == "num":
        dt = _XSD + ("decimal" if "." in t.value else "integer")
        return True, dt, ""
    return True, "", ""


def _flags_source_pred(where: SparqlQuery, var: str) -> str:
    """The constant predicate of the WHERE pattern binding `var` in
    object position — the flags-inheritance source."""
    for pat in where.patterns:
        if pat.o.kind == "var" and pat.o.value == var:
            if pat.p.kind != "iri":
                raise ValueError(
                    "flags inheritance needs a constant-predicate "
                    f"WHERE pattern for object var ?{var}")
            return pat.p.value
    raise ValueError(f"no WHERE pattern binds ?{var} in object position")


_FLAGS_CAP = 2_000_000


def _flags_lookup(quads, pred: str):
    """(obj -> min flags) for one predicate, as driver-broadcastable
    arrays: per-batch group-min partials, merged on the driver under
    an explicit cap (the distinct-object vocabulary of one predicate —
    the same bounded-driver-merge pattern as dedup.ngram_prefix_bands)."""
    import pandas as pd
    import ray

    def partial(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("pred"), pa.scalar(pred)))
        df = pa.table({
            "obj": sel.column("obj"),
            "f_lit": pc.cast(sel.column("obj_is_literal"), pa.int8()),
            "f_dt": sel.column("obj_datatype"),
            "f_lang": sel.column("obj_lang")}).to_pandas()
        g = df.groupby("obj", as_index=False).min()
        return pa.Table.from_pandas(g, preserve_index=False)

    raw = ray.get(quads.map_batches(
        partial, batch_format="pyarrow").to_arrow_refs())
    # zero-row upstream blocks pass through map_batches UNTOUCHED and
    # may still be pandas blocks (BENCH/NOTES.md) — normalize
    parts = []
    for p in raw:
        if isinstance(p, pa.Table):
            if p.num_rows:
                parts.append(p)
        elif len(p):
            parts.append(pa.Table.from_pandas(p, preserve_index=False))
    merged = pa.concat_tables(parts, promote_options="default") \
        if parts else None
    if merged is None:
        return (pa.array([], pa.string()), pa.array([], pa.bool_()),
                pa.array([], pa.string()), pa.array([], pa.string()))
    if merged.num_rows > _FLAGS_CAP:
        raise ValueError(
            f"flags vocabulary for {pred!r} exceeds {_FLAGS_CAP} distinct "
            "objects; raise _FLAGS_CAP or restrict the template")
    df = merged.to_pandas().groupby("obj", as_index=False).min()
    return (pa.array(df["obj"], pa.string()),
            pa.array(df["f_lit"].astype(bool)),
            pa.array(df["f_dt"], pa.string()),
            pa.array(df["f_lang"], pa.string()))


def _term_col(t: Term, batch: pa.Table, n: int) -> pa.Array:
    if t.kind == "var":
        return pc.cast(batch.column(t.value).combine_chunks(), pa.string())
    return pa.array([t.value] * n, pa.string())


def _instantiate_keys(bindings, templates: list[Pattern]):
    """bindings Dataset -> (subj, pred, obj) delete-key Dataset."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        outs = [pa.table({"subj": _term_col(tp.s, t, n),
                          "pred": _term_col(tp.p, t, n),
                          "obj": _term_col(tp.o, t, n)})
                for tp in templates]
        return pa.concat_tables(outs)

    return bindings.map_batches(f, batch_format="pyarrow")


def _instantiate_rows(bindings, templates: list[Pattern],
                      where: SparqlQuery, quads, columns: list[str]):
    """bindings Dataset -> full-schema insert-row Dataset (flags for
    object vars via a broadcast (obj -> flags) lookup per template)."""
    import ray

    refs = []
    for tp in templates:
        if tp.o.kind == "var":
            pred = _flags_source_pred(where, tp.o.value)
            refs.append(ray.put(_flags_lookup(quads, pred)))
        else:
            refs.append(None)

    def f(t: pa.Table) -> pa.Table:
        import ray as _r

        n = t.num_rows
        outs = []
        for tp, ref in zip(templates, refs):
            obj = _term_col(tp.o, t, n)
            if ref is None:
                lit, dt, lang = _const_obj_flags(tp.o)
                f_lit = pa.array([lit] * n, pa.bool_())
                f_dt = pa.array([dt] * n, pa.string())
                f_lang = pa.array([lang] * n, pa.string())
            else:
                keys, a_lit, a_dt, a_lang = _r.get(ref)
                idx = pc.index_in(obj, value_set=keys)
                f_lit = pc.take(a_lit, idx)
                f_dt = pc.take(a_dt, idx)
                f_lang = pc.take(a_lang, idx)
            cols = {"subj": _term_col(tp.s, t, n),
                    "pred": _term_col(tp.p, t, n),
                    "obj": obj, "obj_is_literal": f_lit,
                    "obj_datatype": f_dt, "obj_lang": f_lang,
                    "graph": pa.array([GRAPH_UPDATE] * n, pa.string()),
                    "url": pa.array([""] * n, pa.string())}
            outs.append(pa.table({c: cols[c] for c in columns}))
        return pa.concat_tables(outs)

    return bindings.map_batches(f, batch_format="pyarrow")


def _dedupe_min(ins: pa.Table, columns: list[str]) -> pa.Table:
    """One row per (subj, pred, obj): per-column MIN over colliding
    payloads — the same deterministic rule as the SQL mirror's
    GROUP BY subj, pred, obj with min() aggregates."""
    import pandas as pd

    df = ins.to_pandas()
    g = df.groupby(["subj", "pred", "obj"], as_index=False, sort=False).min()
    schema = pa.schema([(c, pa.bool_() if c == "obj_is_literal"
                         else pa.string()) for c in columns])
    return pa.Table.from_pandas(g[columns], schema=schema,
                                preserve_index=False)


def _collect(ds, columns: list[str]) -> pa.Table:
    """Driver-side concat of a small Dataset's blocks, skipping the
    zero-row EMPTY-SCHEMA blocks Ray 2.49 map_batches passes through
    untouched (BENCH/NOTES.md join rule — they break concat too).
    Those pass-through blocks can also still be PANDAS blocks from an
    upstream map_groups stage (to_arrow_refs hands them back
    unconverted — the intermittent 'DataFrame has no num_rows')."""
    import ray

    parts = []
    for p in ray.get(ds.to_arrow_refs()):
        if isinstance(p, pa.Table):
            if p.num_rows:
                parts.append(p)
        elif len(p):
            parts.append(pa.Table.from_pandas(p, preserve_index=False))
    if not parts:
        return pa.table({c: pa.array([], pa.string()) for c in columns})
    return pa.concat_tables(parts).combine_chunks()


_SEP = "\x1f"


def _key_expr(t: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        pc.cast(t.column("subj"), pa.string()),
        pc.cast(t.column("pred"), pa.string()),
        pc.cast(t.column("obj"), pa.string()), _SEP)


def _ground_table(templates: list[Pattern], columns: list[str]) -> pa.Table:
    rows = {c: [] for c in columns}
    for tp in templates:
        lit, dt, lang = _const_obj_flags(tp.o)
        vals = {"subj": tp.s.value, "pred": tp.p.value, "obj": tp.o.value,
                "obj_is_literal": lit, "obj_datatype": dt,
                "obj_lang": lang, "graph": GRAPH_UPDATE, "url": ""}
        for c in columns:
            rows[c].append(vals[c])
    typed = {c: (pa.array(rows[c], pa.bool_()) if c == "obj_is_literal"
                 else pa.array(rows[c], pa.string())) for c in columns}
    return pa.table(typed)


def apply_update(quads, ops, broadcast_cap: int = 100_000):
    """Apply a parsed (or textual) UPDATE sequence to a quads Dataset;
    returns the mutated Dataset (the input is not modified)."""
    if isinstance(ops, str):
        ops = parse_sparql_update(ops)
    for op in ops:
        quads = _apply_one(quads, op, broadcast_cap)
    return quads


def _load_quads_table(load: tuple[str, str | None],
                      columns: list[str]) -> "pa.Table":
    """Parse a LOAD source document into an insert-row table matching
    the store's columns. file:// (or bare path) only — the network
    transport is out of this sandbox's scope; format dispatch is by
    extension over the repo's own parsers (sources/rdfio.py)."""
    import os

    src, tgt = load
    if src.startswith("file://"):
        path = src[len("file://"):]
    elif "://" not in src:
        path = src
    else:
        raise ValueError(
            f"LOAD source {src!r}: only file:// IRIs are supported in "
            "this build (network ingestion is out of scope)")
    ext = os.path.splitext(path)[1].lower()
    if ext in (".nt", ".nq"):
        from k_gap_ray.sources.rdfio import parse_ntriples_batch

        with open(path, encoding="utf-8") as f:
            lines = [ln for ln in f.read().split("\n") if ln.strip()]
        rows = parse_ntriples_batch(pa.table({"text": lines})).to_pylist()
    elif ext in (".ttl", ".trig"):
        from k_gap_ray.sources.rdfio import parse_turtle_text

        with open(path, encoding="utf-8") as f:
            rows, skipped = parse_turtle_text(f.read())
        if skipped:
            raise ValueError(f"LOAD {path}: {skipped} unparseable lines")
    elif ext in (".rdf", ".xml"):
        from k_gap_ray.sources.rdfio import parse_rdfxml_text

        with open(path, encoding="utf-8") as f:
            rows, skipped = parse_rdfxml_text(f.read())
        if skipped:
            raise ValueError(f"LOAD {path}: {skipped} skipped nodes")
    elif ext in (".jsonld", ".json"):
        import json as _json

        from k_gap_ray.sources.rdfio import parse_jsonld_obj

        with open(path, encoding="utf-8") as f:
            doc = _json.load(f)
        docs = doc if isinstance(doc, list) else [doc]
        rows = []
        for d in docs:
            rows.extend(parse_jsonld_obj(d))
    else:
        raise ValueError(f"LOAD: unsupported extension {ext!r} "
                         "(.nt/.nq/.ttl/.trig/.rdf/.xml/.jsonld)")
    defaults = {"obj_is_literal": False, "obj_datatype": "",
                "obj_lang": "", "graph": "", "url": src}
    out = {}
    for c in columns:
        if c == "obj_is_literal":
            out[c] = pa.array(
                [bool(r.get(c, False)) for r in rows], pa.bool_())
        elif c == "graph" and tgt is not None:
            out[c] = pa.array([tgt] * len(rows), pa.string())
        else:
            out[c] = pa.array(
                [str(r.get(c, defaults.get(c, "")) or "")
                 for r in rows], pa.string())
    return pa.table(out)


def _apply_one(quads, op: UpdateOp, broadcast_cap: int):
    import ray.data as rd

    columns = [c for c in QUAD_COLS if c in quads.schema().names]

    if op.clear_graph is not None:
        if op.clear_graph == "*":
            # typed-empty blocks (schema preserved) — downstream ops
            # keep their count() probes happy
            return quads.map_batches(lambda t: t.slice(0, 0),
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)
        g = op.clear_graph
        return quads.map_batches(
            lambda t, _g=g: t.filter(
                pc.not_equal(pc.fill_null(t.column("graph"), ""),
                             pa.scalar(_g))),
            batch_format="pyarrow", zero_copy_batch=True)

    if op.where is None:
        if op.load is not None:
            del_ds = None
            ins_ds = rd.from_arrow(_load_quads_table(op.load, columns))
        else:
            del_tbl = (_ground_table(op.delete_templates,
                                     ["subj", "pred", "obj"])
                       if op.delete_templates else None)
            ins_tbl = (_ground_table(op.insert_templates, columns)
                       if op.insert_templates else None)
            del_ds = rd.from_arrow(del_tbl) if del_tbl is not None else None
            ins_ds = rd.from_arrow(ins_tbl) if ins_tbl is not None else None
    else:
        bindings = sparql_select(quads, op.where)
        del_ds = (_instantiate_keys(bindings, op.delete_templates)
                  if op.delete_templates else None)
        ins_ds = (_instantiate_rows(bindings, op.insert_templates,
                                    op.where, quads, columns)
                  if op.insert_templates else None)

    # ---- delete phase (multiplicity-preserving filter) ----
    kept = quads
    if del_ds is not None:
        del_ds = del_ds.materialize()
        n_del = del_ds.count()
        if n_del == 0:
            pass
        elif n_del <= broadcast_cap:
            import ray

            keys = _collect(del_ds, ["subj", "pred", "obj"])
            del_ref = ray.put(pc.unique(_key_expr(keys)))

            # bind the ref as a default arg: the closure executes
            # LAZILY (when the chained dataset is consumed), long
            # after this function has moved on — a by-name capture
            # would see whatever `*_ref` holds by then
            def drop(t: pa.Table, _ref=del_ref) -> pa.Table:
                import ray as _r

                mask = pc.invert(pc.is_in(_key_expr(t),
                                          value_set=_r.get(_ref)))
                return t.filter(mask)

            kept = quads.map_batches(drop, batch_format="pyarrow",
                                     zero_copy_batch=True)
        else:
            from k_gap_ray.functions.bloom import bloom_semi_join

            def with_key(t: pa.Table) -> pa.Table:
                return t.append_column("__k", _key_expr(t))

            kept = bloom_semi_join(
                quads.map_batches(with_key, batch_format="pyarrow"),
                del_ds.map_batches(with_key, batch_format="pyarrow"),
                on="__k", anti=True).drop_columns(["__k"])

    # ---- insert phase (set semantics vs the post-delete store) ----
    if ins_ds is None:
        return kept
    ins_ds = ins_ds.materialize()
    n_ins = ins_ds.count()
    if n_ins == 0:
        return kept
    if n_ins <= broadcast_cap:
        import ray

        ins = _collect(ins_ds, columns)
        # dedupe the insert set itself on (s,p,o) — multiple templates
        # (or bindings projected onto a template's var subset) can
        # instantiate the same triple; per-column MIN within a key
        # matches the oracle's rule when payloads disagree
        ins = _dedupe_min(ins, columns)
        ikeys = _key_expr(ins)
        ins_ref = ray.put(ikeys)

        # one scan of the post-delete store collects which keys exist
        def probe(t: pa.Table, _ref=ins_ref) -> pa.Table:
            import ray as _r

            k = _key_expr(t)
            return pa.table(
                {"k": k.filter(pc.is_in(k, value_set=_r.get(_ref)))})

        existing = set()
        kept = kept.materialize()
        for b in kept.map_batches(probe, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            existing.update(b.column("k").to_pylist())
        mask = pa.array([k not in existing for k in ikeys.to_pylist()])
        new = ins.filter(mask)
        if new.num_rows == 0:
            return kept
        return kept.union(rd.from_arrow(new.select(columns)))
    # large insert set: Bloom-prefiltered anti join against the store
    from k_gap_ray.functions.bloom import bloom_semi_join

    def with_key(t: pa.Table) -> pa.Table:
        return t.append_column("__k", _key_expr(t))

    ins_k = ins_ds.map_batches(with_key, batch_format="pyarrow")
    kept = kept.materialize()
    kept_k = kept.map_batches(with_key, batch_format="pyarrow")
    new = bloom_semi_join(ins_k, kept_k, on="__k", anti=True)
    # cross-template duplicate removal within the surviving inserts
    # (same per-column-MIN rule as the broadcast path / SQL mirror)
    new = new.groupby("__k").map_groups(
        lambda df: df.min(axis=0).to_frame().T, batch_format="pandas")
    return kept.union(new.drop_columns(["__k"]).select_columns(columns))


# ---------------------------------------------------------------------------
# SQL mirror (independent oracle backend)
# ---------------------------------------------------------------------------

def _sql_term(t: Term, bind: str = "b") -> str:
    return f"{bind}.{t.value}" if t.kind == "var" else _sql_str(t.value)


def _sql_values(templates: list[Pattern], with_flags: bool) -> str:
    rows = []
    for tp in templates:
        lit, dt, lang = _const_obj_flags(tp.o)
        cells = [_sql_str(tp.s.value), _sql_str(tp.p.value),
                 _sql_str(tp.o.value)]
        if with_flags:
            cells += [("TRUE" if lit else "FALSE"), _sql_str(dt),
                      _sql_str(lang)]
        rows.append("(" + ", ".join(cells) + ")")
    return ",\n              ".join(rows)


def sparql_update_cte_sql(ops, quads_rel: str = "quads",
                          columns: list[str] | None = None
                          ) -> tuple[str, str]:
    """Compile an UPDATE sequence to chained DuckDB CTE definitions
    (returned WITHOUT a leading WITH — append to an existing CTE
    chain with a leading comma, as docs_kg's oracles do). Returns
    ``(cte_fragment, final_relation_name)``; run the follow-up SELECT
    with ``sparql_to_sql(select, quads_rel=final_relation_name)``."""
    if isinstance(ops, str):
        ops = parse_sparql_update(ops)
    if any(o.load is not None for o in ops):
        raise NotImplementedError(
            "LOAD has no SQL mirror (file parsing is engine-side); "
            "suite-test it via apply_update result comparison instead")
    cols = columns or QUAD_COLS
    col_list = ", ".join(cols)
    parts: list[str] = []
    # every store-level CTE in the chain is MATERIALIZED: each level
    # is referenced several times (union branch, NOT EXISTS probe,
    # bindings scan, flags lookup), and DuckDB would otherwise INLINE
    # the whole upstream reconstruction — including the docs-KG
    # recursive connected-components CTE — once per reference, which
    # blows up multiplicatively across chained statements (measured:
    # the 3-statement docs oracle went from >400 s to sub-second)
    parts.append(f"qU0 AS MATERIALIZED (SELECT {col_list} "
                 f"FROM {quads_rel})")
    prev = "qU0"
    for i, op in enumerate(ops, start=1):
        if op.clear_graph is not None:
            cond = ("FALSE" if op.clear_graph == "*"
                    else f"coalesce(graph, '') <> "
                         f"{_sql_str(op.clear_graph)}")
            parts.append(f"qU{i} AS MATERIALIZED (SELECT {col_list} "
                         f"FROM {prev} WHERE {cond})")
            prev = f"qU{i}"
            continue
        if op.where is not None:
            bsql = sparql_to_sql(op.where, quads_rel=prev)
            parts.append(f"b{i} AS MATERIALIZED (\n{bsql})")

        # delete-key relation
        dk = None
        if op.delete_templates:
            dk = f"d{i}"
            if op.where is None:
                parts.append(
                    f"{dk}(subj, pred, obj) AS (VALUES\n              "
                    f"{_sql_values(op.delete_templates, False)})")
            else:
                sels = [
                    f"SELECT {_sql_term(tp.s)} AS subj, "
                    f"{_sql_term(tp.p)} AS pred, "
                    f"{_sql_term(tp.o)} AS obj FROM b{i} b"
                    for tp in op.delete_templates]
                parts.append(f"{dk} AS (\n" + "\nUNION ALL\n".join(sels)
                             + ")")
        kept = f"k{i}" if dk else prev
        if dk:
            parts.append(
                f"k{i} AS MATERIALIZED (SELECT {col_list} FROM {prev} q\n"
                f"  WHERE NOT EXISTS (SELECT 1 FROM {dk} d WHERE "
                "d.subj = q.subj AND d.pred = q.pred AND d.obj = q.obj))")

        # insert relation
        if op.insert_templates:
            ins_sels = []
            for j, tp in enumerate(op.insert_templates):
                if op.where is None:
                    continue
                if tp.o.kind == "var":
                    pred = _flags_source_pred(op.where, tp.o.value)
                    parts.append(
                        f"fl{i}_{j} AS (SELECT obj, "
                        "min(obj_is_literal) AS f_lit, "
                        "min(obj_datatype) AS f_dt, "
                        "min(obj_lang) AS f_lang "
                        f"FROM {prev} WHERE pred = {_sql_str(pred)} "
                        "GROUP BY obj)")
                    ins_sels.append(
                        f"SELECT {_sql_term(tp.s)} AS subj, "
                        f"{_sql_term(tp.p)} AS pred, "
                        f"{_sql_term(tp.o)} AS obj, "
                        "fl.f_lit AS obj_is_literal, "
                        "fl.f_dt AS obj_datatype, fl.f_lang AS obj_lang, "
                        f"{_sql_str(GRAPH_UPDATE)} AS graph, '' AS url "
                        f"FROM b{i} b JOIN fl{i}_{j} fl "
                        f"ON fl.obj = {_sql_term(tp.o)}")
                else:
                    lit, dt, lang = _const_obj_flags(tp.o)
                    ins_sels.append(
                        f"SELECT {_sql_term(tp.s)} AS subj, "
                        f"{_sql_term(tp.p)} AS pred, "
                        f"{_sql_str(tp.o.value)} AS obj, "
                        f"{'TRUE' if lit else 'FALSE'} AS obj_is_literal, "
                        f"{_sql_str(dt)} AS obj_datatype, "
                        f"{_sql_str(lang)} AS obj_lang, "
                        f"{_sql_str(GRAPH_UPDATE)} AS graph, '' AS url "
                        f"FROM b{i} b")
            if op.where is None:
                parts.append(
                    f"n{i}(subj, pred, obj, obj_is_literal, obj_datatype, "
                    "obj_lang) AS (VALUES\n              "
                    f"{_sql_values(op.insert_templates, True)})")
                ins_src = (f"SELECT subj, pred, obj, obj_is_literal, "
                           f"obj_datatype, obj_lang, "
                           f"{_sql_str(GRAPH_UPDATE)} AS graph, '' AS url "
                           f"FROM n{i}")
            else:
                ins_src = "\nUNION ALL\n".join(ins_sels)
            # one row per inserted (s,p,o): per-column MIN over
            # colliding payloads — the engine's _dedupe_min rule
            flag_mins = ", ".join(
                f"min({c}) AS {c}" for c in cols
                if c not in ("subj", "pred", "obj"))
            parts.append(
                f"qU{i} AS MATERIALIZED (\n"
                f"  SELECT {col_list} FROM {kept}\n"
                "  UNION ALL\n"
                f"  SELECT subj, pred, obj, {flag_mins} "
                f"FROM ({ins_src}) t\n"
                f"  WHERE NOT EXISTS (SELECT 1 FROM {kept} q WHERE "
                "q.subj = t.subj AND q.pred = t.pred AND q.obj = t.obj)\n"
                "  GROUP BY subj, pred, obj)")
            prev = f"qU{i}"
        else:
            prev = kept
    return ",\n".join(parts), prev


# ---------------------------------------------------------------------------
# Persisted-store integration (state/upsert.py bucketed store)
# ---------------------------------------------------------------------------

def apply_update_store(store_dir: str, text: str) -> int:
    """Apply an UPDATE script to a bucketed upsert store on disk, one
    statement at a time (each statement's WHERE sees the store state
    left by the previous one): the change set is computed
    Dataset-side, then only the affected subject buckets are
    rewritten (state/upsert.py set-semantics rewrite). Returns the
    total rows touched across rewritten buckets."""
    import ray

    from k_gap_ray.state.upsert import apply_set_changes, read_store

    total = 0
    for op in parse_sparql_update(text):
        quads = read_store(store_dir)
        cols = [c for c in quads.schema().names if c != "subj_bucket"]
        base = quads.map_batches(
            lambda t, c=tuple(cols): t.select(list(c)),
            batch_format="pyarrow")
        columns = [c for c in QUAD_COLS if c in cols]
        if op.where is None:
            if op.load is not None:
                dels = None
                ins = _load_quads_table(op.load, columns)
            else:
                dels = (_ground_table(op.delete_templates,
                                      ["subj", "pred", "obj"])
                        if op.delete_templates else None)
                ins = (_ground_table(op.insert_templates, columns)
                       if op.insert_templates else None)
        else:
            bindings = sparql_select(base, op.where)
            dels = ins = None
            if op.delete_templates:
                dels = _collect(_instantiate_keys(
                    bindings, op.delete_templates),
                    ["subj", "pred", "obj"])
            if op.insert_templates:
                ins = _collect(_instantiate_rows(
                    bindings, op.insert_templates, op.where, base,
                    columns), columns)
        if ins is not None:
            ins = _dedupe_min(ins, columns)
        total += apply_set_changes(store_dir, ins, dels)
    return total
