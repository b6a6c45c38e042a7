"""Full-text search as a SPARQL magic predicate — the reference's
Lucene-connector idiom (``luc:searchIndex`` / ``luc:score``,
docs/quick-reference.md:214-221; FTS enabled in the repo config,
docs/index.md:117,268) re-expressed over the repo's integer-TF-IDF
search machinery (functions/search.py scoring recurrence).

Query surface::

    PREFIX kfts: <urn:kgap:fts:>
    SELECT ?e ?score WHERE {
      ?e kfts:searchIndex "merge window" .
      ?e kfts:score ?score .
    }

Semantics (identical on both backends):

- The indexed "document" of an entity is the multiset of
  space-separated tokens across its object values — rows with
  ``obj_is_literal`` when the store carries the flag, every row
  otherwise (the documents-direct quads have no flag).
- ``score(e) = sum_t tf(e, t) * ((N * 1000) // df(t))`` over the
  query's space-separated terms — the float-free integer recurrence
  of functions/search.py, so the value hash matches DuckDB exactly.
  ``N`` = number of distinct indexed subjects; entities with no
  matching term simply don't bind (no zero rows).
- The rewrite replaces the two magic patterns with ONE ordinary
  pattern ``?e <urn:kgap:fts:match:TERM> ?score`` and unions
  equally-shaped virtual quads rows (score as its decimal string)
  into the store — after that, planning, joins, FILTERs and the SQL
  compilation are the unmodified engine. ``kfts:score`` without a
  paired ``kfts:searchIndex`` on the same subject var is an error;
  magic predicates inside OPTIONAL/UNION/... groups are out of the
  subset.

Scale shape: the postings stream is O(entities matching a query term
x query terms) — term-filtered IN-BATCH before any shuffle — and the
per-term df table collected to the driver is query-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from k_gap_ray.sparql import _INTERNAL, Pattern, SparqlQuery, Term

FTS_NS = "urn:kgap:fts:"
FTS_SEARCH = FTS_NS + "searchIndex"
FTS_SCORE = FTS_NS + "score"
FTS_MATCH = FTS_NS + "match:"
FTS_GRAPH = "urn:kgap:graph:fts"
IDF_SCALE = 1000


def rewrite_fts_query(q: SparqlQuery) -> tuple[SparqlQuery, list[tuple]]:
    """Pure query rewrite (shared by engine and oracle): returns the
    rewritten query and ``[(subj_var, term, match_pred, score_var)]``
    specs (score_var may be an internal fresh var)."""
    searches: dict[str, str] = {}
    scores: dict[str, str] = {}
    rest: list[Pattern] = []
    for pat in q.patterns:
        if pat.p.kind == "iri" and pat.p.value == FTS_SEARCH:
            if pat.s.kind != "var" or pat.o.kind not in ("lit", "num"):
                raise ValueError(
                    "kfts:searchIndex needs `?var kfts:searchIndex "
                    "\"terms\"`")
            if pat.s.value in searches:
                raise ValueError(
                    f"?{pat.s.value} has two kfts:searchIndex patterns")
            searches[pat.s.value] = pat.o.value
        elif pat.p.kind == "iri" and pat.p.value == FTS_SCORE:
            if pat.s.kind != "var" or pat.o.kind != "var":
                raise ValueError(
                    "kfts:score needs `?var kfts:score ?score`")
            scores[pat.s.value] = pat.o.value
        else:
            rest.append(pat)
    unmatched = set(scores) - set(searches)
    if unmatched:
        raise ValueError(
            f"kfts:score without kfts:searchIndex for {sorted(unmatched)}")
    specs: list[tuple] = []
    new_pats = list(rest)
    for i, (svar, term) in enumerate(sorted(searches.items())):
        score_var = scores.get(svar, f"{_INTERNAL}fts{i}")
        match_pred = FTS_MATCH + term
        specs.append((svar, term, match_pred, score_var))
        new_pats.append(Pattern(Term("var", svar),
                                Term("iri", match_pred),
                                Term("var", score_var)))
    import copy

    q2 = copy.copy(q)
    q2.patterns = new_pats
    return q2, specs


def fts_scores(quads, term: str):
    """-> Dataset(entity: string, score: int64) for one query string
    (space-separated terms), over the store's indexed corpus."""
    names = quads.schema().names
    has_flag = "obj_is_literal" in names
    terms = sorted(set(term.split(" ")))
    terms_arr = pa.array(terms, pa.string())

    def lit_rows(t: pa.Table) -> pa.Table:
        return t.filter(t.column("obj_is_literal")) if has_flag else t

    def postings_partial(t: pa.Table) -> pa.Table:
        from k_gap_ray.functions.textstats import _tokens_of

        t = lit_rows(t)
        empty = pa.table({"key": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        flat, counts, _ = _tokens_of(t.column("obj"))
        if len(flat) == 0:
            return empty
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        keep = pc.is_in(flat, value_set=terms_arr) \
            .to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        if len(parent) == 0:
            return empty
        subj = pc.cast(t.column("subj"), pa.string()).combine_chunks()
        keys = pc.binary_join_element_wise(subj.take(pa.array(parent)),
                                           flat, "\x1f")
        vc = pc.value_counts(keys)
        return pa.table({"key": vc.field("values"),
                         "tf": pc.cast(vc.field("counts"), pa.int64())})

    from k_gap_ray.dsutil import drop_empty_blocks

    post = drop_empty_blocks(
        quads.map_batches(postings_partial, batch_format="pyarrow")
        .groupby("key").sum("tf").materialize())

    def split_key(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("key").combine_chunks(),
                                 pattern="\x1f")
        return pa.table({"entity": pc.list_element(parts, 0),
                         "term": pc.list_element(parts, 1),
                         "tf": t.column("sum(tf)")})

    post = post.map_batches(split_key, batch_format="pyarrow") \
        .materialize()

    # df per term — query-sized on the driver
    df_rows = post.groupby("term").count().take_all()
    df = {r["term"]: r["count()"] for r in df_rows}

    # N = distinct indexed subjects
    n_docs = (quads.map_batches(
        lambda t: pa.table({"subj": pc.unique(pc.cast(
            lit_rows(t).column("subj"), pa.string()).combine_chunks())}),
        batch_format="pyarrow")
        .groupby("subj").count().count())

    idf_terms = pa.array(list(df.keys()), pa.string())
    idf_vals = pa.array([(n_docs * IDF_SCALE) // df[t] for t in df],
                        pa.int64())

    def score(t: pa.Table) -> pa.Table:
        pos = pc.index_in(t.column("term"), value_set=idf_terms)
        return pa.table({
            "entity": t.column("entity"),
            "s": pc.multiply(t.column("tf"), pc.take(idf_vals, pos))})

    scored = post.map_batches(score, batch_format="pyarrow") \
        .groupby("entity").sum("s")
    return scored.map_batches(
        lambda t: pa.table({"entity": t.column("entity"),
                            "score": t.column("sum(s)")}),
        batch_format="pyarrow")


def inject_fts(quads, specs: list[tuple]):
    """Union per-spec virtual match rows (entity, match-pred, score
    string) into the store; every spec scores against the ORIGINAL
    store."""
    from k_gap_ray.dsutil import drop_empty_blocks

    columns = [c for c in ("subj", "pred", "obj", "obj_is_literal",
                           "obj_datatype", "obj_lang", "graph", "url")
               if c in quads.schema().names]
    out = quads
    for _, term, match_pred, _ in specs:
        scores = fts_scores(quads, term)

        def rows(t: pa.Table, _pred=match_pred) -> pa.Table:
            n = t.num_rows
            vals = {
                "subj": pc.cast(t.column("entity"), pa.string()),
                "pred": pa.array([_pred] * n, pa.string()),
                "obj": pc.cast(t.column("score"), pa.string()),
                "obj_is_literal": pa.array([True] * n, pa.bool_()),
                "obj_datatype": pa.array([""] * n, pa.string()),
                "obj_lang": pa.array([""] * n, pa.string()),
                "graph": pa.array([FTS_GRAPH] * n, pa.string()),
                "url": pa.array([""] * n, pa.string()),
            }
            return pa.table({c: vals[c] for c in columns})

        virt = drop_empty_blocks(
            scores.map_batches(rows, batch_format="pyarrow")
            .materialize())
        out = out.union(virt)
    return out


def rewrite_fts(quads, q: SparqlQuery):
    """Engine hook: rewrite the query and union the virtual match
    rows. No-op (returns inputs) when no magic predicate appears."""
    if not any(p.p.kind == "iri" and p.p.value.startswith(FTS_NS)
               for p in q.patterns):
        return quads, q
    q2, specs = rewrite_fts_query(q)
    return inject_fts(quads, specs), q2


# ---------------------------------------------------------------------------
# SQL mirror
# ---------------------------------------------------------------------------

def sql_fts_ctes(specs: list[tuple], quads_rel: str = "quads",
                 columns: list[str] | None = None) -> tuple[str, str]:
    """Chained DuckDB CTEs reproducing inject_fts over ``quads_rel``
    (returned WITHOUT a leading WITH): per spec the term-filtered
    postings, query-sized df, distinct-subject N and the integer
    score, then one UNION ALL of virtual rows. Returns
    ``(fragment, final_relation)``."""
    from k_gap_ray.sparql import _sql_str

    cols = columns or ["subj", "pred", "obj", "obj_is_literal",
                       "obj_datatype", "obj_lang", "graph", "url"]
    col_list = ", ".join(cols)
    has_flag = "obj_is_literal" in cols
    lit_where = " WHERE obj_is_literal" if has_flag else ""
    parts = [f"qf0 AS MATERIALIZED (SELECT {col_list} FROM {quads_rel})"]
    virt_sels = []
    for i, (_, term, match_pred, _) in enumerate(specs):
        terms = sorted(set(term.split(" ")))
        in_list = ", ".join(_sql_str(t) for t in terms)
        parts.append(
            f"f{i}q AS MATERIALIZED (\n"
            "  SELECT subj, term FROM (\n"
            "    SELECT subj, unnest(string_split(obj, ' ')) AS term\n"
            f"    FROM qf0{lit_where})\n"
            f"  WHERE term IN ({in_list}))")
        parts.append(
            f"f{i}s AS (\n"
            f"  SELECT subj, SUM(tf * ((n.n * {IDF_SCALE}) // df.df))"
            "::BIGINT AS score\n"
            "  FROM (SELECT subj, term, count(*)::BIGINT AS tf\n"
            f"        FROM f{i}q GROUP BY subj, term) tf\n"
            "  JOIN (SELECT term, count(DISTINCT subj)::BIGINT AS df\n"
            f"        FROM f{i}q GROUP BY term) df USING (term)\n"
            "  CROSS JOIN (SELECT count(DISTINCT subj)::BIGINT AS n\n"
            f"              FROM qf0{lit_where}) n\n"
            "  GROUP BY subj)")
        defaults = {"subj": "subj", "pred": _sql_str(match_pred),
                    "obj": "CAST(score AS VARCHAR)",
                    "obj_is_literal": "TRUE", "obj_datatype": "''",
                    "obj_lang": "''", "graph": _sql_str(FTS_GRAPH),
                    "url": "''"}
        virt_sels.append("SELECT "
                         + ", ".join(f"{defaults[c]} AS {c}" for c in cols)
                         + f" FROM f{i}s")
    parts.append("qfts AS (\n  SELECT " + col_list + " FROM qf0\n"
                 + "".join("  UNION ALL\n  " + s + "\n" for s in virt_sels)
                 + ")")
    return ",\n".join(parts), "qfts"
