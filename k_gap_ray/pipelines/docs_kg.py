"""End-to-end KG construction over a corpus derived from `documents`.

The flagship extract -> annotate -> canonicalize -> materialize path
normally runs over the synthetic pages corpus, whose generator uses
Python ``random`` — so the driver gate can only row-count it. This
module closes that gap: it derives a pages corpus *deterministically
from the registered ``documents`` table* (every consecutive triple of
text tokens becomes one "{subject} {verb} {object}." sentence via a
rolling-codepoint token hash), runs the REAL pipeline over it, and
ships a pure-SQL DuckDB oracle that reconstructs the exact canonical
quad set independently — making the north-star triple output
value-hash-verified, not just row-counted.

The oracle replicates canonicalization exactly without executing LSH:
block membership per surface depends only on the surface string (band
keys of its own minhash signature) and the per-block pair cap
(MAX_BLOCK=64) can never bind for the <=64-surface gazetteer alias
vocabulary, so the verified-pair graph over alias norms is STATIC. The
SQL inlines that edge list and computes connected components over the
subgraph induced by the norms that actually appear (recursive-CTE
transitive closure), with lexicographic-min roots — precisely the
pipeline's union-find semantics (oracle/canon.py).

Reference parity: the reference materializes deduplicated named-graph
quads per feed (/root/reference/ldes-consumer/app.py:309-317); graph =
per-source named graph, provenance url = lexicographic-min page url.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from k_gap_ray.oracle.kernel import (
    GAZETTEER,
    LITERAL_VERB_MAP,
    VERB_MAP,
    norm_surface,
)

HASH_B = 31
HASH_M = 1_000_000_007

# Flat alias list in gazetteer order; sentence construction indexes it
# by token hash. Includes every case/spacing/typo variant, so the
# canonicalization stage has real clustering work to do.
ALIAS_LIST: list[str] = [f for _, _, forms in GAZETTEER for f in forms]
N_ALIAS = len(ALIAS_LIST)

# Entity verbs first, then literal verbs — the last two indices emit
# literal-object sentences (~1/6 of sentences).
VERB_LIST: list[str] = sorted(VERB_MAP) + sorted(LITERAL_VERB_MAP)
N_VERB = len(VERB_LIST)
_N_ENT_VERB = len(VERB_MAP)
# (lit_base, lit_mod) per literal verb, in VERB_LIST order.
_LIT_PARAMS = {"employs": (5, 5000), "was founded in": (1900, 125)}


def token_hash(tok: str) -> int:
    """Rolling codepoint hash, identical to the DuckDB ``list_reduce``
    expression in :func:`sql_docs_kg` (proven-exact pattern: both sides
    fold (a*31 + codepoint) mod 1e9+7 left-to-right)."""
    h = 0
    for c in tok:
        h = (h * HASH_B + ord(c)) % HASH_M
    return h


# ---------------------------------------------------------------------------
# Engine side: documents -> pages (vectorized), then the real pipeline.
# ---------------------------------------------------------------------------

def _build_pages_batch(t: pa.Table) -> pa.Table:
    """One Arrow batch of documents -> pages rows (url, warc_ts, html,
    text, lang). Token hashing goes through the per-batch unique-value
    pattern (vocab is tiny under Zipf repetition); all string assembly
    is Arrow/numpy kernels — no per-row Python in the loop."""
    from k_gap_ray.schema import PAGES

    toks = pc.split_pattern(
        pc.fill_null(t.column("text"), ""), pattern=" ").combine_chunks()
    values = toks.values
    offsets = toks.offsets.to_numpy().astype(np.int64)
    uniq = pc.unique(values)
    uniq_h = np.fromiter((token_hash(u) for u in uniq.to_pylist()),
                         dtype=np.int64, count=len(uniq))
    hv = uniq_h[pc.index_in(values, uniq).to_numpy(zero_copy_only=False)]

    n_tok = np.diff(offsets)
    n_sent = n_tok // 3
    total = int(n_sent.sum())
    doc_of = np.repeat(np.arange(len(n_sent)), n_sent)
    cum = np.concatenate(([0], np.cumsum(n_sent)))
    sno = np.arange(total) - cum[doc_of]
    starts = offsets[:-1][doc_of] + 3 * sno
    h_s, h_v, h_o = hv[starts], hv[starts + 1], hv[starts + 2]

    alias_arr = np.asarray(ALIAS_LIST, dtype=object)
    verb_arr = np.asarray(VERB_LIST, dtype=object)
    i_v = h_v % N_VERB
    subj = alias_arr[h_s % N_ALIAS]
    verb = verb_arr[i_v]
    obj = alias_arr[h_o % N_ALIAS].copy()
    for li, v in enumerate(VERB_LIST[_N_ENT_VERB:], start=_N_ENT_VERB):
        base, mod = _LIT_PARAMS[v]
        m = i_v == li
        obj[m] = (base + h_o[m] % mod).astype(np.int64).astype(str)

    sent = pc.binary_join_element_wise(
        pc.binary_join_element_wise(
            pa.array(subj, pa.string()), pa.array(verb, pa.string()),
            pa.array(obj, pa.string()), " "),
        ".", "")
    para = pc.binary_join_element_wise("<p>", sent, "</p>", "")

    def _per_doc_join(flat, sep: str) -> pa.Array:
        lst = pa.ListArray.from_arrays(pa.array(cum, pa.int32()), flat)
        return pc.binary_join(lst, sep)

    text = _per_doc_join(sent, "\n")
    paras = _per_doc_join(para, "")

    doc_id_s = pc.cast(t.column("doc_id"), pa.string())
    src = t.column("source")
    url = pc.binary_join_element_wise(
        "https://", src, ".example/doc/", doc_id_s, "")
    html = pc.binary_join_element_wise(
        "<html><head><title>Doc ", doc_id_s, "</title></head><body>",
        "<nav>Home | About | Data | Contact</nav>",
        '<div class="content">', paras, "</div>",
        "<footer>(c) 2024 ", src, ".example</footer></body></html>", "")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    warc = base + t.column("doc_id").to_numpy(
        zero_copy_only=False).astype("timedelta64[s]")
    return pa.table({
        "url": url,
        "warc_ts": pa.array(warc, pa.timestamp("us")),
        "html": pc.cast(html, pa.binary()),
        "text": text,
        "lang": t.column("lang"),
    }, schema=PAGES)


def build_pages_from_docs(docs_ds):
    """documents(doc_id, text, lang, source) -> pages Dataset in the
    input_hint shape. One zero-shuffle map_batches pass."""
    return docs_ds.map_batches(_build_pages_batch, batch_format="pyarrow",
                               zero_copy_batch=True)


def run_docs_pipeline(docs_ds):
    """Full in-memory KG pipeline over the derived corpus; returns the
    product dict (triples/mentions/entities/mapping...). Callers that
    need several products should run this ONCE and pass the dict to
    the kg_*_from_docs helpers via ``res=`` instead of paying a full
    pipeline execution per product."""
    from k_gap_ray.pipeline import run_pipeline

    return run_pipeline(build_pages_from_docs(docs_ds))


def kg_from_docs(docs_ds, res=None):
    """Run the full in-memory KG pipeline over the derived corpus and
    return the canonical quad Dataset (subject-deduped, min-url
    provenance)."""
    return (res or run_docs_pipeline(docs_ds))["triples"]


def kg_mention_counts_from_docs(docs_ds, res=None):
    """Mentions per canonical entity over the derived corpus — the
    skew-prone combiner aggregate (ops/canonicalize.mention_counts),
    value-verifiable because mention emission is deterministic here:
    one subject mention per sentence plus one object mention when the
    verb is non-literal (oracle/kernel.py extract_from_text)."""
    import ray

    from k_gap_ray.ops.canonicalize import mention_counts

    res = res or run_docs_pipeline(docs_ds)
    mapping = res["mapping"]
    ref = ray.put(mapping) if isinstance(mapping, dict) else mapping
    return mention_counts(res["mentions"], ref)


def kg_entities_from_docs(docs_ds, res=None) -> pa.Table:
    """The pipeline's canonical entity table over the derived corpus,
    with the two list columns flattened to "|"-joined strings (both
    engine paths emit them pre-sorted; the oracle's ``string_agg``
    mirrors the join) so the driver's astype(str) value hash is
    layout-independent."""
    ents = (res or run_docs_pipeline(docs_ds))["entities"]
    if not isinstance(ents, pa.Table):  # distributed-CC path: Dataset
        import ray

        ents = pa.concat_tables(
            ray.get(ents.to_arrow_refs())).combine_chunks()
    return pa.table({
        "entity_id": ents.column("entity_id"),
        "members": pc.binary_join(
            ents.column("members").combine_chunks(), "|"),
        "surface_forms": pc.binary_join(
            ents.column("surface_forms").combine_chunks(), "|"),
        "n_members": ents.column("size"),
    })


# ---------------------------------------------------------------------------
# Oracle side: pure DuckDB SQL over the registered `documents` view.
# ---------------------------------------------------------------------------

def _slug(norm: str) -> str:
    import re

    return re.sub(r"[^a-z0-9]+", "-", norm).strip("-")


def static_alias_edges() -> tuple[list[str], list[tuple[str, str]]]:
    """(distinct alias norms, verified-pair edges) — the static LSH
    candidate graph over the gazetteer vocabulary. Valid because band
    keys are a pure function of each surface and MAX_BLOCK(64) >= the
    alias-norm vocabulary size, so no per-block truncation can occur."""
    from k_gap_ray.oracle.canon import (
        MAX_BLOCK,
        band_keys,
        minhash_signatures,
        verify_pair,
    )

    norms = sorted({norm_surface(f) for f in ALIAS_LIST})
    assert len(norms) <= MAX_BLOCK, "static edge list needs cap-free blocks"
    keys = [set(band_keys(s)) for s in minhash_signatures(norms)]
    edges = [
        (norms[i], norms[j])
        for i in range(len(norms))
        for j in range(i + 1, len(norms))
        if (keys[i] & keys[j]) and verify_pair(norms[i], norms[j])
    ]
    return norms, edges


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_ctes(docs_table: str) -> str:
    """Shared oracle CTE prefix: documents -> token hashes -> sentences
    -> appearing alias norms -> live static pair graph -> recursive-CTE
    connected components (``reach``) -> per-norm entity IRIs (``iri``)."""
    alias_rows = ", ".join(
        f"({i}, {_q(norm_surface(s))}, {_q(s)})"
        for i, s in enumerate(ALIAS_LIST))
    norms, edges = static_alias_edges()
    norm_rows = ", ".join(f"({_q(n)}, {_q(_slug(n))})" for n in norms)
    if edges:
        edge_src = "SELECT * FROM (VALUES " + ", ".join(
            f"({_q(a)}, {_q(b)})" for a, b in edges) + ") e(x, y)"
    else:
        edge_src = "SELECT NULL::VARCHAR AS x, NULL::VARCHAR AS y WHERE FALSE"
    verb_rows = []
    for i, v in enumerate(VERB_LIST):
        if v in LITERAL_VERB_MAP:
            pred, dtype = LITERAL_VERB_MAP[v]
            base, mod = _LIT_PARAMS[v]
            verb_rows.append(
                f"({i}, {_q(pred)}, TRUE, {_q(dtype)}, {base}, {mod})")
        else:
            verb_rows.append(
                f"({i}, {_q(VERB_MAP[v])}, FALSE, '', 0, 1)")
    # list_filter drops the '' char that string_split('','') emits
    # (DuckDB unicode('') is -1, Python ord has no such char): an empty
    # token hashes to 0 on both sides.
    thash = ("list_reduce(list_prepend(0, list_transform(list_filter("
             "string_split(tok, ''), c -> c <> ''), c -> "
             "unicode(c)::BIGINT)), "
             f"(a, b) -> ((a::HUGEINT * {HASH_B} + b) % {HASH_M})::BIGINT)")
    return f"""
WITH RECURSIVE
alias(idx, norm, form) AS (VALUES {alias_rows}),
norms(norm, slug) AS (VALUES {norm_rows}),
verbs(idx, pred, is_lit, dtype, lit_base, lit_mod) AS (VALUES {", ".join(verb_rows)}),
sp AS (SELECT doc_id, source, string_split(COALESCE(text, ''), ' ') AS toks
       FROM {docs_table}),
tok AS (SELECT doc_id, source, unnest(toks) AS tok,
               unnest(generate_series(1, len(toks))) AS ord FROM sp),
h AS (SELECT doc_id, source, (ord - 1) // 3 AS sno, (ord - 1) % 3 AS pos,
             {thash} AS hv FROM tok),
sent AS (SELECT doc_id, source, sno,
                MAX(CASE WHEN pos = 0 THEN hv END) AS h_s,
                MAX(CASE WHEN pos = 1 THEN hv END) AS h_v,
                MAX(CASE WHEN pos = 2 THEN hv END) AS h_o,
                COUNT(*) AS n
         FROM h GROUP BY doc_id, source, sno),
fs AS (SELECT doc_id, source, (h_s % {N_ALIAS})::INT AS i_s,
              (h_v % {N_VERB})::INT AS i_v, h_o
       FROM sent WHERE n = 3),
appearing(norm) AS (
  SELECT DISTINCT a.norm FROM fs JOIN alias a ON a.idx = fs.i_s
  UNION
  SELECT DISTINCT a.norm FROM fs
  JOIN verbs v ON v.idx = fs.i_v AND NOT v.is_lit
  JOIN alias a ON a.idx = (fs.h_o % {N_ALIAS})::INT),
live AS (SELECT e.x, e.y FROM ({edge_src}) e
         JOIN appearing ax ON ax.norm = e.x
         JOIN appearing ay ON ay.norm = e.y),
sym AS (SELECT x, y FROM live UNION SELECT y, x FROM live
        UNION SELECT norm, norm FROM appearing),
reach(a, b) AS (SELECT x, y FROM sym
                UNION
                SELECT r.a, s.y FROM reach r JOIN sym s ON s.x = r.b),
comp AS (SELECT a AS norm, MIN(b) AS root FROM reach GROUP BY a),
iri AS (SELECT c.norm, 'urn:kgap:entity:' || n.slug AS entity
        FROM comp c JOIN norms n ON n.norm = c.root)"""


def sql_docs_kg(docs_table: str = "documents") -> str:
    """DuckDB oracle reproducing :func:`kg_from_docs` exactly."""
    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + "\nSELECT * FROM quads")


def sql_docs_sparql(sparql: str, docs_table: str = "documents") -> str:
    """DuckDB oracle for a SPARQL SELECT run over the docs-derived
    canonical quad set: the shared KG-reconstruction CTEs feed the
    ``quads`` relation, and the query itself is compiled by the
    independent SQL backend (k_gap_ray.sparql.sparql_to_sql)."""
    from k_gap_ray.sparql import sparql_to_sql

    return (_sql_ctes(docs_table) + _sql_quads_cte() + "\n"
            + sparql_to_sql(sparql, quads_rel="quads"))


def sql_docs_triangles(preds: tuple[str, ...],
                       docs_table: str = "documents") -> str:
    """DuckDB oracle for a triangle count over the docs-derived quads
    restricted to ``preds`` (undirected): the shared KG-reconstruction
    CTEs feed ``quads``, then functions/graph.py:sql_triangles appends
    its canonical-pair CTE and the a<b<c triple self-join."""
    from k_gap_ray.functions.graph import sql_triangles

    in_list = ", ".join("'" + p.replace("'", "''") + "'" for p in preds)
    edges = ("SELECT subj AS src, obj AS dst FROM quads "
             f"WHERE pred IN ({in_list})")
    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_triangles(edges, lead=","))


def sql_docs_bfs(edge_pred: str, seed_pred: str, max_depth: int = 32,
                 docs_table: str = "documents") -> str:
    """DuckDB oracle for multi-source BFS min-depths over the
    docs-derived quads: seeds = distinct subjects of ``seed_pred``
    edges, graph = ``edge_pred`` edges, closed by the depth-bounded
    recursive CTE from functions/graph.py:sql_bfs_depths (appended to
    the shared WITH RECURSIVE reconstruction chain)."""
    from k_gap_ray.functions.graph import sql_bfs_depths

    edges = ("SELECT subj AS src, obj AS dst FROM quads WHERE pred = "
             + _q(edge_pred))
    seeds = ("SELECT DISTINCT subj AS node FROM quads WHERE pred = "
             + _q(seed_pred))
    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_bfs_depths(edges, seeds, max_depth=max_depth, lead=","))


def sql_docs_shacl(shape_ttl: str, docs_table: str = "documents") -> str:
    """DuckDB oracle for SHACL validation over the docs-derived quads:
    the shared KG-reconstruction CTEs feed ``quads``, and the shape is
    compiled by the independent SQL backend (ops/shacl.py:shacl_to_sql
    — LEFT-JOIN formulation vs the Ray union+Sum plan)."""
    from k_gap_ray.ops.shacl import parse_shacl_text, shacl_to_sql

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + shacl_to_sql(parse_shacl_text(shape_ttl), quads_rel="quads",
                           lead=","))


def sql_docs_describe(sparql: str, docs_table: str = "documents") -> str:
    """DuckDB oracle for a SPARQL DESCRIBE run over the docs-derived
    canonical quad set (same CTE plumbing as :func:`sql_docs_sparql`;
    the DESCRIBE compiler appends its MATERIALIZED resource-set CTE
    with ``lead=','``)."""
    from k_gap_ray.sparql import sparql_describe_to_sql

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sparql_describe_to_sql(sparql, quads_rel="quads",
                                     lead=","))


def sql_docs_construct(sparql: str, docs_table: str = "documents") -> str:
    """DuckDB oracle for a SPARQL CONSTRUCT run over the docs-derived
    canonical quad set (same CTE plumbing as :func:`sql_docs_sparql`,
    compiled by the independent CONSTRUCT SQL backend)."""
    from k_gap_ray.sparql import sparql_construct_to_sql

    return (_sql_ctes(docs_table) + _sql_quads_cte() + "\n"
            + sparql_construct_to_sql(sparql, quads_rel="quads"))


def _sql_quads_cte() -> str:
    return f""",
trip AS (
  SELECT si.entity AS subj, v.pred AS pred,
         CASE WHEN v.is_lit
              THEN CAST(v.lit_base + fs.h_o % v.lit_mod AS VARCHAR)
              ELSE oi.entity END AS obj,
         v.is_lit AS obj_is_literal,
         CASE WHEN v.is_lit THEN v.dtype ELSE '' END AS obj_datatype,
         '' AS obj_lang,
         'urn:kgap:web:' || fs.source || '.example' AS graph,
         'https://' || fs.source || '.example/doc/' ||
             CAST(fs.doc_id AS VARCHAR) AS url
  FROM fs
  JOIN verbs v ON v.idx = fs.i_v
  JOIN alias sa ON sa.idx = fs.i_s
  JOIN iri si ON si.norm = sa.norm
  LEFT JOIN alias oa ON oa.idx = (fs.h_o % {N_ALIAS})::INT AND NOT v.is_lit
  LEFT JOIN iri oi ON oi.norm = oa.norm),
quads AS (
  SELECT subj, pred, obj, obj_is_literal, obj_datatype, obj_lang, graph,
         MIN(url) AS url
  FROM trip
  GROUP BY subj, pred, obj, obj_is_literal, obj_datatype, obj_lang, graph)"""


def sql_docs_entities(docs_table: str = "documents") -> str:
    """DuckDB oracle reproducing :func:`kg_entities_from_docs`:
    one row per connected component of appearing norms, list columns
    flattened to sorted "|"-joined strings."""
    return _sql_ctes(docs_table) + f""",
app_forms AS (
  SELECT DISTINCT a.norm, a.form FROM fs JOIN alias a ON a.idx = fs.i_s
  UNION
  SELECT DISTINCT a.norm, a.form FROM fs
  JOIN verbs v ON v.idx = fs.i_v AND NOT v.is_lit
  JOIN alias a ON a.idx = (fs.h_o % {N_ALIAS})::INT),
mem AS (SELECT root, string_agg(norm, '|' ORDER BY norm) AS members,
               COUNT(*) AS n_members
        FROM comp GROUP BY root),
frm AS (SELECT DISTINCT c.root, f.form
        FROM comp c JOIN app_forms f ON f.norm = c.norm),
fa AS (SELECT root, string_agg(form, '|' ORDER BY form) AS surface_forms
       FROM frm GROUP BY root)
SELECT 'urn:kgap:entity:' || n.slug AS entity_id, m.members,
       fa.surface_forms, m.n_members
FROM mem m JOIN fa ON fa.root = m.root JOIN norms n ON n.norm = m.root
"""


def sql_docs_mention_counts(docs_table: str = "documents") -> str:
    """DuckDB oracle reproducing :func:`kg_mention_counts_from_docs`:
    one subject mention per complete sentence, plus one object mention
    when the verb is non-literal, counted per canonical entity."""
    return _sql_ctes(docs_table) + f""",
men AS (
  SELECT si.entity FROM fs
  JOIN alias sa ON sa.idx = fs.i_s
  JOIN iri si ON si.norm = sa.norm
  UNION ALL
  SELECT oi.entity FROM fs
  JOIN verbs v ON v.idx = fs.i_v AND NOT v.is_lit
  JOIN alias oa ON oa.idx = (fs.h_o % {N_ALIAS})::INT
  JOIN iri oi ON oi.norm = oa.norm)
SELECT entity AS entity_id, COUNT(*) AS n_mentions
FROM men GROUP BY entity
"""


def sql_docs_sssp(edge_pred: str, seed_pred: str, max_hops: int = 12,
                  docs_table: str = "documents") -> str:
    """DuckDB oracle for weighted shortest paths over the docs-derived
    quads: graph = ``edge_pred`` edges with the deterministic integer
    weight ``1 + (length(src) + length(dst)) % 9`` (pinned identically
    on the Ray side — codepoint lengths of the endpoint IRIs), seeds =
    distinct subjects of ``seed_pred``, closed by the hop-bounded
    recursive CTE from functions/graph.py:sql_sssp."""
    from k_gap_ray.functions.graph import sql_sssp

    edges = ("SELECT subj AS src, obj AS dst, "
             "1 + (length(subj) + length(obj)) % 9 AS w "
             "FROM quads WHERE pred = " + _q(edge_pred))
    seeds = ("SELECT DISTINCT subj AS node FROM quads WHERE pred = "
             + _q(seed_pred))
    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_sssp(edges, seeds, max_hops=max_hops, lead=","))



def _edges_in(preds: tuple[str, ...]) -> str:
    in_list = ", ".join(_q(p) for p in preds)
    return ("SELECT subj AS src, obj AS dst FROM quads "
            f"WHERE pred IN ({in_list})")


def sql_docs_kcore(preds: tuple[str, ...], k: int = 2, rounds: int = 6,
                   docs_table: str = "documents") -> str:
    """DuckDB oracle for fixed-round k-core peeling over the
    docs-derived quads restricted to ``preds`` (undirected): the shared
    KG-reconstruction CTEs feed ``quads``, then
    functions/graph.py:sql_kcore appends its chained peeling rounds."""
    from k_gap_ray.functions.graph import sql_kcore

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_kcore(_edges_in(preds), k=k, rounds=rounds, lead=","))


def sql_docs_clustering(preds: tuple[str, ...], scale: int = 1000,
                        docs_table: str = "documents") -> str:
    """DuckDB oracle for per-node local clustering coefficients over
    the docs-derived quads restricted to ``preds``."""
    from k_gap_ray.functions.graph import sql_clustering_coef

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_clustering_coef(_edges_in(preds), scale=scale,
                                  lead=","))


def sql_docs_link_pred(preds: tuple[str, ...], topk: int = 20,
                       scale: int = 1_000_000, center_cap: int = 100_000,
                       docs_table: str = "documents") -> str:
    """DuckDB oracle for resource-allocation link prediction over the
    docs-derived quads restricted to ``preds``."""
    from k_gap_ray.functions.graph import sql_ra_link_pred

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_ra_link_pred(_edges_in(preds), topk=topk, scale=scale,
                               center_cap=center_cap, lead=","))


def sql_docs_walks(preds: tuple[str, ...], seed_pred: str,
                   steps: int = 5, seed: int = 0,
                   docs_table: str = "documents") -> str:
    """DuckDB oracle for deterministic hash-argmin walks over the
    docs-derived quads restricted to ``preds``, seeded at the distinct
    subjects of ``seed_pred`` edges."""
    from k_gap_ray.functions.graph import sql_deterministic_walks

    seeds = ("SELECT DISTINCT subj AS node FROM quads WHERE pred = "
             + _q(seed_pred))
    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_deterministic_walks(_edges_in(preds), seeds,
                                      steps=steps, seed=seed, lead=","))


def sql_docs_negatives(seed: int = 0, n_buckets: int = 64,
                       docs_table: str = "documents") -> str:
    """DuckDB oracle for deterministic negative sampling over the full
    docs-derived quad set."""
    from k_gap_ray.functions.graph import sql_negative_samples

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_negative_samples(
                "SELECT subj, pred, obj FROM quads",
                seed=seed, n_buckets=n_buckets, lead=","))


def sql_docs_ktruss(preds: tuple[str, ...], k: int = 4,
                    rounds: int = 3,
                    docs_table: str = "documents") -> str:
    """DuckDB oracle for fixed-round k-truss peeling over the
    docs-derived quads restricted to ``preds``."""
    from k_gap_ray.functions.graph import sql_ktruss

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_ktruss(_edges_in(preds), k=k, rounds=rounds,
                         lead=","))


def sql_docs_lpa(preds: tuple[str, ...], rounds: int = 4,
                 docs_table: str = "documents") -> str:
    """DuckDB oracle for deterministic synchronous label propagation
    over the docs-derived quads restricted to ``preds``."""
    from k_gap_ray.functions.graph import sql_label_propagation

    return (_sql_ctes(docs_table) + _sql_quads_cte()
            + sql_label_propagation(_edges_in(preds), rounds=rounds,
                                    lead=","))
