"""SHACL-subset shape parsing + distributed validation (M9).

Reference parity: each LDES feed can name a SHACL shape file and
members failing validation are counted/rejected, not fatal
(FAILURE_IS_FATAL=false) — /root/reference/ldes-consumer/app.py:342-344,
/root/reference/data/ldes-feeds-example.yml:10,21. The reference ships
the file to a closed validator; this module parses the shape TTL with
the repo's own Turtle reader (sources/rdfio.py) and validates the quad
Dataset natively on Ray Data, with an independent SQL backend
(:func:`shacl_to_sql`) as the DuckDB oracle.

Supported vocabulary (the subset feed shape files use):
``sh:NodeShape``, ``sh:targetClass`` / ``sh:targetSubjectsOf``,
``sh:property`` with ``sh:path``, ``sh:minCount``, ``sh:maxCount``,
``sh:datatype``, ``sh:pattern``, ``sh:nodeKind`` (``sh:IRI`` /
``sh:Literal``).

Validation semantics (per W3C SHACL, restricted to this subset):
focus nodes are selected by the shape's target; per property shape the
value nodes are the DISTINCT objects of (focus, path, ?) triples in
the union graph (named-graph copies collapse); one violation row
``(focus, path, component, n)`` is emitted per failed constraint
component, where ``n`` is the value count for minCount/maxCount and
the offending-value count for datatype/pattern/nodeKind. sh:pattern
is a partial (search) match, as in the spec.

Scale shape: no driver-side state — per (shape, path) one distinct
pass (composite-key groupby) and one subject groupby over the union
of flagged value rows and zero-flag focus rows; the focus/value merge
is that union + Sum, not a join, so the Ray-2.49 empty-side join
crash cannot arise.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SEP = "\x1f"


@dataclass
class PropertyShape:
    path: str
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    pattern: str | None = None
    node_kind: str | None = None  # "IRI" | "Literal"


@dataclass
class NodeShape:
    iri: str
    target_class: str | None = None
    target_subjects_of: str | None = None
    properties: list[PropertyShape] = field(default_factory=list)


def parse_shacl_text(ttl: str) -> list[NodeShape]:
    """Shape TTL -> NodeShape list, via the repo's Turtle parser
    (shape files are tiny: parsed on the driver)."""
    from k_gap_ray.sources.rdfio import parse_turtle_text

    rows, _ = parse_turtle_text(ttl)
    by_subj: dict[str, list[dict]] = {}
    for r in rows:
        by_subj.setdefault(r["subj"], []).append(r)

    shapes: list[NodeShape] = []
    for subj, triples in by_subj.items():
        is_shape = any(t["pred"] == RDF_TYPE and t["obj"] == SH + "NodeShape"
                       for t in triples)
        if not is_shape:
            continue
        shape = NodeShape(iri=subj)
        for t in triples:
            if t["pred"] == SH + "targetClass":
                shape.target_class = t["obj"]
            elif t["pred"] == SH + "targetSubjectsOf":
                shape.target_subjects_of = t["obj"]
            elif t["pred"] == SH + "property":
                props = {p["pred"]: p for p in by_subj.get(t["obj"], [])}
                path_t = props.get(SH + "path")
                if path_t is None:
                    raise ValueError(
                        f"property shape {t['obj']} has no sh:path")
                ps = PropertyShape(path=path_t["obj"])
                if SH + "minCount" in props:
                    ps.min_count = int(props[SH + "minCount"]["obj"])
                if SH + "maxCount" in props:
                    ps.max_count = int(props[SH + "maxCount"]["obj"])
                if SH + "datatype" in props:
                    ps.datatype = props[SH + "datatype"]["obj"]
                if SH + "pattern" in props:
                    ps.pattern = props[SH + "pattern"]["obj"]
                if SH + "nodeKind" in props:
                    kind = props[SH + "nodeKind"]["obj"]
                    if kind not in (SH + "IRI", SH + "Literal"):
                        raise ValueError(f"unsupported sh:nodeKind {kind}")
                    ps.node_kind = kind[len(SH):]
                shape.properties.append(ps)
        if shape.target_class is None and shape.target_subjects_of is None:
            raise ValueError(
                f"shape {subj}: need sh:targetClass or sh:targetSubjectsOf")
        shapes.append(shape)
    if not shapes:
        raise ValueError("no sh:NodeShape found in shape document")
    return shapes


def parse_shacl(path: str) -> list[NodeShape]:
    """Shape file path -> NodeShape list (the SHAPE env idiom,
    ldes-consumer/app.py:344)."""
    with open(path, encoding="utf-8") as f:
        return parse_shacl_text(f.read())


def _value_flags(t: pa.Table, ps: PropertyShape) -> dict[str, pa.Array]:
    """Per-value 0/1 violation flags, all Arrow kernels."""
    n = len(t)
    zeros = np.zeros(n, dtype=np.int64)
    out = {"bad_dt": zeros, "bad_pat": zeros, "bad_kind": zeros}
    is_lit = t.column("obj_is_literal")
    if ps.datatype is not None:
        ok = pc.and_(is_lit, pc.equal(t.column("obj_datatype"),
                                      pa.scalar(ps.datatype)))
        out["bad_dt"] = pc.if_else(ok, 0, 1).cast(pa.int64())
    if ps.pattern is not None:
        ok = pc.match_substring_regex(t.column("obj"), pattern=ps.pattern)
        out["bad_pat"] = pc.if_else(pc.fill_null(ok, False), 0, 1) \
            .cast(pa.int64())
    if ps.node_kind is not None:
        ok = is_lit if ps.node_kind == "Literal" else pc.invert(is_lit)
        out["bad_kind"] = pc.if_else(ok, 0, 1).cast(pa.int64())
    return {k: (pa.array(v, pa.int64()) if isinstance(v, np.ndarray) else v)
            for k, v in out.items()}


def _emit_violations(t: pa.Table, ps: PropertyShape) -> pa.Table:
    """Per-focus aggregate row -> violation rows for each failed
    constraint component."""
    focus = t.column("focus")
    nv = t.column("n")
    parts = []

    def piece(mask, component, n_col):
        sel = t.filter(mask)
        if len(sel) == 0:
            return
        parts.append(pa.table({
            "focus": sel.column("focus"),
            "path": pa.array([ps.path] * len(sel), pa.string()),
            "component": pa.array([component] * len(sel), pa.string()),
            "n": sel.column(n_col).cast(pa.int64()),
        }))

    if ps.min_count is not None:
        piece(pc.less(nv, pa.scalar(ps.min_count)), "minCount", "n")
    if ps.max_count is not None:
        piece(pc.greater(nv, pa.scalar(ps.max_count)), "maxCount", "n")
    if ps.datatype is not None:
        piece(pc.greater(t.column("bad_dt"), pa.scalar(0)),
              "datatype", "bad_dt")
    if ps.pattern is not None:
        piece(pc.greater(t.column("bad_pat"), pa.scalar(0)),
              "pattern", "bad_pat")
    if ps.node_kind is not None:
        piece(pc.greater(t.column("bad_kind"), pa.scalar(0)),
              "nodeKind", "bad_kind")
    if not parts:
        return _EMPTY_VIOLATIONS
    return pa.concat_tables(parts)


_EMPTY_VIOLATIONS = pa.table({
    "focus": pa.array([], pa.string()), "path": pa.array([], pa.string()),
    "component": pa.array([], pa.string()), "n": pa.array([], pa.int64())})


def _focus_rows(quads_ds, shape: NodeShape):
    """Focus-candidate rows (focus, zero flags, is_focus=1)."""
    if shape.target_class is not None:
        cls = shape.target_class

        def pick(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.equal(t.column("pred"), pa.scalar(RDF_TYPE)),
                        pc.equal(t.column("obj"), pa.scalar(cls)))
            return pa.table({"focus": t.filter(m).column("subj")})
    else:
        target = shape.target_subjects_of

        def pick(t: pa.Table) -> pa.Table:
            m = pc.equal(t.column("pred"), pa.scalar(target))
            return pa.table({"focus": t.filter(m).column("subj")})

    def widen(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(t), dtype=np.int64), pa.int64())
        return pa.table({"focus": t.column("focus"), "n": z, "bad_dt": z,
                         "bad_pat": z, "bad_kind": z,
                         "is_focus": pa.array(np.ones(len(t), np.int64))})

    return (quads_ds.map_batches(pick, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .map_batches(widen, batch_format="pyarrow"))


def shacl_validate(quads_ds, shapes: list[NodeShape]):
    """Quads + shapes -> violation Dataset
    (focus, path, component, n) — FAILURE_IS_FATAL=false semantics:
    nothing is dropped, callers route/count rejects (e.g. via
    :func:`conforming_focus`)."""
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks

    quads_ds = quads_ds.materialize()  # one scan source per shape/path
    outs = []
    for shape in shapes:
        focus = _focus_rows(quads_ds, shape)
        for ps in shape.properties:
            path = ps.path

            def distinct_key(t: pa.Table, _ps=ps, _path=path) -> pa.Table:
                sel = t.filter(pc.equal(t.column("pred"), pa.scalar(_path)))
                flags = _value_flags(sel, _ps)
                subj = sel.column("subj")
                # union-graph distinct: named-graph copies collapse on
                # (subj, obj); flags are functions of the value so any
                # surviving row carries the right ones
                key = pc.binary_join_element_wise(
                    subj.cast(pa.string()), sel.column("obj"), _SEP)
                return pa.table({
                    "vkey": key, "subj_v": subj,
                    "bad_dt": flags["bad_dt"], "bad_pat": flags["bad_pat"],
                    "bad_kind": flags["bad_kind"]})

            from ray.data.aggregate import Max, Min

            vals = (quads_ds.map_batches(distinct_key,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
                    .groupby("vkey")
                    .aggregate(Min(on="subj_v", alias_name="focus"),
                               Max(on="bad_dt", alias_name="bad_dt"),
                               Max(on="bad_pat", alias_name="bad_pat"),
                               Max(on="bad_kind", alias_name="bad_kind")))

            def widen_vals(t: pa.Table) -> pa.Table:
                ones = pa.array(np.ones(len(t), np.int64))
                return pa.table({
                    "focus": t.column("focus"), "n": ones,
                    "bad_dt": t.column("bad_dt"),
                    "bad_pat": t.column("bad_pat"),
                    "bad_kind": t.column("bad_kind"),
                    "is_focus": pa.array(np.zeros(len(t), np.int64))})

            # scrub: groupby output can carry zero-row EMPTY-SCHEMA
            # blocks that survive map_batches untouched (BENCH/NOTES.md)
            vals = drop_empty_blocks(vals.materialize())
            merged = focus.union(
                vals.map_batches(widen_vals, batch_format="pyarrow")
                .select_columns(["focus", "n", "bad_dt", "bad_pat",
                                 "bad_kind", "is_focus"]))
            agg = (merged.groupby("focus")
                   .aggregate(Sum(on="n", alias_name="n"),
                              Sum(on="bad_dt", alias_name="bad_dt"),
                              Sum(on="bad_pat", alias_name="bad_pat"),
                              Sum(on="bad_kind", alias_name="bad_kind"),
                              Sum(on="is_focus", alias_name="is_focus")))

            def finish(t: pa.Table, _ps=ps) -> pa.Table:
                if len(t) == 0 or "focus" not in t.schema.names:
                    return _EMPTY_VIOLATIONS
                t = t.filter(pc.greater(t.column("is_focus"), pa.scalar(0)))
                return _emit_violations(t, _ps)

            outs.append(drop_empty_blocks(
                agg.map_batches(finish, batch_format="pyarrow")
                .materialize()))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def conforming_focus(quads_ds, shapes: list[NodeShape]):
    """Focus nodes with zero violations (the members the reference
    would ingest), as a Dataset of (focus)."""
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks

    quads_ds = quads_ds.materialize()
    viol = shacl_validate(quads_ds, shapes)

    def mark_bad(t: pa.Table) -> pa.Table:
        return pa.table({
            "focus": t.column("focus"),
            "good": pa.array(np.zeros(len(t), np.int64)),
            "seen": pa.array(np.ones(len(t), np.int64))})

    focus_parts = []
    for shape in shapes:
        focus_parts.append(
            _focus_rows(quads_ds, shape).map_batches(
                lambda t: pa.table({
                    "focus": t.column("focus"),
                    "good": pa.array(np.ones(len(t), np.int64)),
                    "seen": pa.array(np.ones(len(t), np.int64))}),
                batch_format="pyarrow"))
    focus = focus_parts[0]
    for f in focus_parts[1:]:
        focus = focus.union(f)
    merged = focus.union(viol.map_batches(mark_bad, batch_format="pyarrow"))
    agg = (merged.groupby("focus")
           .aggregate(Sum(on="good", alias_name="good"),
                      Sum(on="seen", alias_name="seen")))

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "focus" not in t.schema.names:
            return pa.table({"focus": pa.array([], pa.string())})
        ok = pc.and_(pc.greater(t.column("good"), pa.scalar(0)),
                     pc.equal(t.column("good"), t.column("seen")))
        return pa.table({"focus": t.filter(ok).column("focus")})

    return drop_empty_blocks(
        agg.map_batches(keep, batch_format="pyarrow").materialize())


def shapes_to_rules(shapes: list[NodeShape]):
    """Per-TRIPLE constraints (datatype/pattern/nodeKind) as
    ops.transform.ShapeRule rows, wiring parsed shapes into the
    existing validate_shapes / split_valid reject side-channel.
    Count constraints are per-focus-node and need
    :func:`shacl_validate`. ShapeRule.obj_pattern is start-anchored
    (pandas str.match), sh:pattern is a search — wrapped to keep SHACL
    semantics."""
    from k_gap_ray.ops.transform import ShapeRule

    rules = []
    for shape in shapes:
        for ps in shape.properties:
            kw = {}
            if ps.datatype is not None:
                kw["obj_datatype"] = ps.datatype
            if ps.pattern is not None:
                kw["obj_pattern"] = f".*(?:{ps.pattern})"
            if ps.node_kind is not None:
                # ShapeRule.obj_is_iri=True == "object must be an IRI"
                # (validate_shapes flags rows whose obj_is_literal
                # equals the flag)
                kw["obj_is_iri"] = ps.node_kind == "IRI"
            if kw:
                rules.append(ShapeRule(ps.path, **kw))
    return rules


# ---------------------------------------------------------------------------
# Independent SQL backend (DuckDB oracle)
# ---------------------------------------------------------------------------

def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def shacl_to_sql(shapes: list[NodeShape], quads_rel: str = "quads",
                 lead: str = "WITH") -> str:
    """Compile the same shapes to DuckDB SQL over a quads relation —
    the natural LEFT-JOIN formulation, deliberately different plumbing
    from the Ray union+Sum plan, producing the identical
    (focus, path, component, n) violation set. ``lead=','`` continues
    an open WITH chain (the docs-KG oracle CTEs)."""
    ctes, selects = [], []
    for i, shape in enumerate(shapes):
        if shape.target_class is not None:
            f_where = (f"pred = {_q(RDF_TYPE)} AND obj = "
                       f"{_q(shape.target_class)}")
        else:
            f_where = f"pred = {_q(shape.target_subjects_of)}"
        ctes.append(f"f_{i} AS (SELECT DISTINCT subj AS focus FROM "
                    f"{quads_rel} WHERE {f_where})")
        for j, ps in enumerate(shape.properties):
            flag_dt = ("CASE WHEN NOT v.obj_is_literal OR v.obj_datatype <> "
                       f"{_q(ps.datatype)} THEN 1 ELSE 0 END"
                       if ps.datatype is not None else "0")
            flag_pat = ("CASE WHEN NOT regexp_matches(v.obj, "
                        f"{_q(ps.pattern)}) THEN 1 ELSE 0 END"
                        if ps.pattern is not None else "0")
            if ps.node_kind == "IRI":
                flag_kind = "CASE WHEN v.obj_is_literal THEN 1 ELSE 0 END"
            elif ps.node_kind == "Literal":
                flag_kind = "CASE WHEN v.obj_is_literal THEN 0 ELSE 1 END"
            else:
                flag_kind = "0"
            ctes.append(
                f"v_{i}_{j} AS (SELECT DISTINCT subj, obj, obj_is_literal, "
                f"obj_datatype FROM {quads_rel} WHERE pred = {_q(ps.path)})")
            ctes.append(
                f"a_{i}_{j} AS (SELECT f.focus, count(v.obj) AS n, "
                f"CAST(coalesce(sum({flag_dt}), 0) AS BIGINT) AS bad_dt, "
                f"CAST(coalesce(sum({flag_pat}), 0) AS BIGINT) AS bad_pat, "
                f"CAST(coalesce(sum({flag_kind}), 0) AS BIGINT) AS bad_kind "
                f"FROM f_{i} f LEFT JOIN v_{i}_{j} v ON v.subj = f.focus "
                f"GROUP BY f.focus)")
            if ps.min_count is not None:
                selects.append(
                    f"SELECT focus, {_q(ps.path)} AS path, 'minCount' AS "
                    f"component, n FROM a_{i}_{j} WHERE n < {ps.min_count}")
            if ps.max_count is not None:
                selects.append(
                    f"SELECT focus, {_q(ps.path)} AS path, 'maxCount' AS "
                    f"component, n FROM a_{i}_{j} WHERE n > {ps.max_count}")
            if ps.datatype is not None:
                selects.append(
                    f"SELECT focus, {_q(ps.path)} AS path, 'datatype' AS "
                    f"component, bad_dt AS n FROM a_{i}_{j} WHERE bad_dt > 0")
            if ps.pattern is not None:
                selects.append(
                    f"SELECT focus, {_q(ps.path)} AS path, 'pattern' AS "
                    f"component, bad_pat AS n FROM a_{i}_{j} "
                    f"WHERE bad_pat > 0")
            if ps.node_kind is not None:
                selects.append(
                    f"SELECT focus, {_q(ps.path)} AS path, 'nodeKind' AS "
                    f"component, bad_kind AS n FROM a_{i}_{j} "
                    f"WHERE bad_kind > 0")
    body = " UNION ALL ".join(selects) if selects \
        else ("SELECT '' AS focus, '' AS path, '' AS component, "
              "0 AS n WHERE FALSE")
    return f"{lead}\n" + ",\n".join(ctes) + "\n" + body
