"""Declarative workflow specs -> Ray Data op chains (X1-X3).

The reference's sembench runs YAML workflows of typed steps
(query/extract/transform/load/validate/report,
/root/reference/docs/components/sembench.md:128-223) on a schedule,
with ${var} template substitution in query templates
(/root/reference/jupyter/kgap/notebooks/kgap_tools.py:17-19) and
arbitrary user scripts as transform steps (sembench.md:216).

Here a workflow is a list of step dicts compiled onto a Dataset:

    run_workflow([
        {"op": "read_parquet", "path": ...},
        {"op": "filter", "expr": "lang == 'en'"},
        {"op": "map_batches", "fn": my_fn},          # X2 user transform
        {"op": "select", "columns": [...]},
        {"op": "groupby_count", "keys": ["lang"]},
        {"op": "sort", "key": "count()", "descending": True},
        {"op": "limit", "n": 10},
        {"op": "write_parquet", "path": ...},
    ], params={"lang": "en"})                        # X3 ${var} substitution

Unknown step kwargs are passed through to the underlying Ray call
(X4 env-passthrough analogue).
"""

from __future__ import annotations

import re
from typing import Any

_VAR_RE = re.compile(r"\$\{(\w+)\}")


def _subst(value: Any, params: dict[str, Any]) -> Any:
    """${var} substitution in strings, recursively through containers.

    A string that is EXACTLY one ``${var}`` reference substitutes to
    the raw param value (callables, datasets, numbers survive — this
    is how YAML specs reference non-YAML values like user transform
    fns); embedded references stringify."""
    if isinstance(value, str):
        m = _VAR_RE.fullmatch(value)
        if m:
            return params[m.group(1)]
        return _VAR_RE.sub(lambda m: str(params[m.group(1)]), value)
    if isinstance(value, list):
        return [_subst(v, params) for v in value]
    if isinstance(value, dict):
        return {k: _subst(v, params) for k, v in value.items()}
    return value


def load_workflow(path: str) -> tuple[list[dict], dict[str, Any]]:
    """Parse a YAML workflow file -> (steps, params).

    File shape mirrors the reference's sembench YAML specs
    (/root/reference/docs/components/sembench.md:128-141):

        params: {lang: en}         # optional defaults, ${var} targets
        steps:
          - op: read_parquet
            path: /data/documents.parquet
          - op: filter
            expr: lang == '${lang}'

    Callable step values (user transform fns, X2) cannot live in YAML;
    reference them via params passed to :func:`run_workflow_file`.
    """
    import yaml

    with open(path) as f:
        spec = yaml.safe_load(f)
    if not isinstance(spec, dict) \
            or not isinstance(spec.get("steps"), list) \
            or not all(isinstance(s, dict) for s in spec["steps"]):
        raise ValueError(
            f"workflow file {path!r} needs a 'steps' list of step dicts")
    return spec["steps"], dict(spec.get("params") or {})


def run_workflow_file(path: str, dataset=None, **extra_params):
    """Load a YAML workflow spec and run it; ``extra_params`` override
    the file's ``params`` block (and may carry non-YAML values such as
    callables for ``${fn}``-style references)."""
    steps, params = load_workflow(path)
    params.update(extra_params)
    return run_workflow(steps, params=params, dataset=dataset)


def run_workflow(steps: list[dict], params: dict[str, Any] | None = None,
                 dataset=None):
    """Compile+run a step list; returns the final Dataset (or the
    write result for sink steps)."""
    import ray.data as rd

    params = params or {}
    ds = dataset
    for raw in steps:
        step = _subst(dict(raw), params)
        op = step.pop("op")
        # X5: per-step scheduling/runtime overrides — runtime_env
        # (container image / pip deps), num_cpus, num_gpus, memory,
        # resources — the reference's per-component image selection
        # (ldes-consumer/app.py:610-611) as a spec block:
        #     - op: decode_media
        #       runtime: {num_cpus: 2, runtime_env: {image_uri: ...}}
        # Applied to ops that run user/model code on workers; any
        # other op with a runtime block is a loud config error.
        runtime = step.pop("runtime", None)
        if runtime is not None:
            if op == "map_batches":
                step.update(runtime)
            elif op in ("decode_media", "resize_media", "frame_sample",
                        "annotate"):
                step["ray_remote_args"] = dict(runtime)
            else:
                raise ValueError(
                    f"workflow op {op!r} does not run per-stage worker "
                    "code; 'runtime' overrides are not applicable")
        if op == "read_parquet":
            ds = rd.read_parquet(step.pop("path"), **step)
        elif op == "read_csv":
            # S4 read half of the CSV I/O step (write_csv below);
            # Arrow's CSV reader infers int64/float64/string per column
            ds = rd.read_csv(step.pop("path"), **step)
        elif op == "read_json":
            ds = rd.read_json(step.pop("path"), **step)
        elif op == "read_ntriples":
            from k_gap_ray.sources.rdfio import read_ntriples

            ds = read_ntriples(step.pop("path"))
        elif op == "filter":
            ds = ds.filter(expr=step.pop("expr"))
        elif op == "map_batches":
            fn = step.pop("fn")
            step.setdefault("batch_format", "pyarrow")
            ds = ds.map_batches(fn, **step)
        elif op == "select":
            ds = ds.select_columns(step.pop("columns"))
        elif op == "rename":
            ds = ds.rename_columns(step.pop("columns"))
        elif op == "groupby_count":
            ds = ds.groupby(step.pop("keys")).count()
        elif op == "groupby_agg":
            from ray.data import aggregate as agg

            keys = step.pop("keys")
            aggs = [getattr(agg, a["fn"])(a.get("on"),
                                          alias_name=a.get("alias"))
                    for a in step.pop("aggs")]
            ds = ds.groupby(keys).aggregate(*aggs)
        elif op == "sort":
            ds = ds.sort(step.pop("key"), descending=step.pop("descending",
                                                             False))
        elif op == "limit":
            ds = ds.limit(step.pop("n"))
        elif op == "union":
            ds = ds.union(step.pop("other"))
        elif op == "grouped_topk":
            from k_gap_ray.relational import grouped_topk

            ds = grouped_topk(ds, step.pop("key"), step.pop("value"),
                              step.pop("k"), step.pop("tiebreak"))
        elif op == "assign_splits":
            from k_gap_ray.ops.transform import assign_splits

            splits = step.pop("splits", None)
            if splits is not None:
                splits = [tuple(s) for s in splits]
            ds = assign_splits(ds, step.pop("id_col"), splits=splits,
                               **step)
        elif op == "hash_sample":
            from k_gap_ray.ops.transform import hash_sample

            ds = hash_sample(ds, step.pop("id_col"),
                             step.pop("keep_pct"), **step)
        elif op == "redact":
            from k_gap_ray.functions.redact import redact

            ds = redact(ds, [tuple(r) for r in step.pop("rules")], **step)
        elif op == "normalize_text":
            from k_gap_ray.functions.redact import normalize_text

            ds = normalize_text(ds, **step)
        elif op == "tfidf_search":
            from k_gap_ray.functions.search import tfidf_search

            ds = tfidf_search(ds, step.pop("terms"), **step)
        elif op == "build_search_index":
            from k_gap_ray.functions.search import write_inverted_index

            write_inverted_index(ds, step.pop("path"), **step)
        elif op == "search_index":
            from k_gap_ray.functions.search import search_inverted_index

            ds = search_inverted_index(step.pop("path"),
                                       step.pop("terms"), **step)
        elif op == "vocab_df":
            from k_gap_ray.functions.textstats import vocab_df

            ds = vocab_df(ds, **step)
        elif op == "hll_count":
            from k_gap_ray.functions.sketch import hll_count

            ds = hll_count(ds, step.pop("col"))
        elif op == "resize_media":
            from k_gap_ray.functions.multimodal import resize_stage

            ds = resize_stage(ds, **step)
        elif op == "decode_media":
            from k_gap_ray.functions.multimodal import decode_stage

            ds = decode_stage(ds, **step)
        elif op == "frame_sample":
            from k_gap_ray.functions.multimodal import frame_sample_stage

            ds = frame_sample_stage(ds, **step)
        elif op == "dup_ngram_spans":
            from k_gap_ray.functions.textstats import dup_ngram_spans

            ds = dup_ngram_spans(ds, **step)
        elif op == "fuzzy_name_pairs":
            from k_gap_ray.functions.dedup import fuzzy_name_pairs

            ds = fuzzy_name_pairs(ds, step.pop("col"), **step)
        elif op == "label_centroids":
            from k_gap_ray.functions.similarity import label_centroids_fx

            ds = label_centroids_fx(ds, **step)
        elif op == "emb_dedup":
            from k_gap_ray.functions.dedup import near_dup_survivors_emb

            ds = near_dup_survivors_emb(ds, **step)
        elif op == "parse_urls":
            from k_gap_ray.functions.urlstats import parse_urls

            ds = parse_urls(ds, **step)
        elif op == "normalize_urls":
            from k_gap_ray.functions.urlstats import normalize_urls

            ds = normalize_urls(ds, **step)
        elif op == "domain_stats":
            from k_gap_ray.functions.urlstats import domain_stats

            ds = domain_stats(ds, **step)
        elif op == "asof_join":
            from k_gap_ray.functions.asof import asof_join

            ds = asof_join(ds, step.pop("right"), step.pop("on"), **step)
        elif op == "bloom_semi_join":
            from k_gap_ray.functions.bloom import bloom_semi_join

            ds = bloom_semi_join(ds, step.pop("right"), step.pop("on"),
                                 **step)
        elif op == "triangle_count":
            import ray.data as _rd

            from k_gap_ray.functions.graph import triangle_count

            ds = _rd.from_arrow(triangle_count(ds, **step))
        elif op == "bfs_depths":
            from k_gap_ray.functions.graph import bfs_depths

            ds = bfs_depths(ds, step.pop("seeds"), **step)
        elif op == "sparql":
            import pyarrow as _pa
            import ray.data as _rd

            from k_gap_ray.sparql import (parse_sparql, sparql_ask,
                                          sparql_construct, sparql_select)

            parsed = parse_sparql(step.pop("query"))
            if parsed.construct:
                ds = sparql_construct(ds, parsed)
            elif parsed.ask:
                ds = _rd.from_arrow(_pa.table(
                    {"ask": _pa.array([sparql_ask(ds, parsed)],
                                      _pa.bool_())}))
            else:
                out = sparql_select(ds, parsed)
                # sparql_select returns a pyarrow.Table when the query
                # has LIMIT/OFFSET; re-wrap so downstream steps (and
                # run_workflow's Dataset return contract) keep working
                ds = (_rd.from_arrow(out) if isinstance(out, _pa.Table)
                      else out)
        elif op == "init_quad_store":
            # persist the in-flight quads as the pred-hash-partitioned
            # store (state/quadstore.py); pass-through: downstream
            # steps keep seeing the quads Dataset
            from k_gap_ray.state.quadstore import init_quad_store

            init_quad_store(ds, step.pop("path"), **step)
        elif op == "sparql_store":
            # run a SPARQL query against a PERSISTED quad store with
            # bucket-pruned bound-predicate scans (no in-flight ds
            # needed — this step can open a workflow)
            import pyarrow as _pa
            import ray.data as _rd

            from k_gap_ray.sparql import sparql_select
            from k_gap_ray.state.quadstore import QuadStore

            out = sparql_select(QuadStore(step.pop("path")),
                                step.pop("query"))
            ds = (_rd.from_arrow(out) if isinstance(out, _pa.Table)
                  else out)
        elif op == "sparql_update":
            # the reference's mutation surface as a pipeline step:
            # apply an UPDATE script to the quads Dataset in flight
            from k_gap_ray.sparql_update import apply_update

            ds = apply_update(ds, step.pop("update"), **step)
        elif op == "construct_remap":
            from k_gap_ray.ops.transform import construct_remap

            ds = construct_remap(ds, step.pop("pred_map"), **step)
        elif op == "annotate":
            from k_gap_ray.ops.annotate import annotate_stage

            ds = annotate_stage(ds, **step)
        elif op == "validate_shapes":
            from k_gap_ray.ops.transform import ShapeRule, validate_shapes

            rules = [r if isinstance(r, ShapeRule) else ShapeRule(**r)
                     for r in step.pop("rules")]
            ds = validate_shapes(ds, rules)
        elif op == "shacl_validate":
            from k_gap_ray.ops.shacl import parse_shacl, parse_shacl_text, \
                shacl_validate

            shapes = (parse_shacl(step.pop("shape_file"))
                      if "shape_file" in step
                      else parse_shacl_text(step.pop("shapes_ttl")))
            ds = shacl_validate(ds, shapes)
        elif op == "write_parquet":
            ds.write_parquet(step.pop("path"), **step)
        elif op == "write_csv":
            ds.write_csv(step.pop("path"), **step)
        elif op == "write_json":
            ds.write_json(step.pop("path"), **step)
        elif op == "write_xlsx":
            # small-result Excel sink (reference's notebook to_excel
            # edge, jupyter.md:575-585); driver-side by contract
            from k_gap_ray.sources.xlsx import write_xlsx

            write_xlsx(ds, step.pop("path"), **step)
        elif op == "write_ntriples":
            from k_gap_ray.sources.rdfio import write_ntriples

            ds = write_ntriples(ds, step.pop("path"))
        elif op == "write_trig":
            from k_gap_ray.sources.rdfio import write_trig

            ds = write_trig(ds, step.pop("path"))
            ds = ds.materialize()
        else:
            raise ValueError(f"unknown workflow op: {op}")
    return ds
