"""Inverted-index keyword search over the documents table.

The reference platform's most-used interactive surface is querying the
store from notebooks (``jupyter/kgap/notebooks/kgap_tools.py`` drives
parameterized SPARQL text lookups); this module is that capability over
a Ray Dataset corpus: build a term-partitioned postings table once,
then answer keyword queries touching only the matching partitions.

Scoring is integer TF-IDF, deliberately float-free:

    idf_int(t) = (N * idf_scale) // df(t)        (int64 floor div)
    score(d)   = sum_{t in query} tf(d, t) * idf_int(t)

Every operation is an order-independent int64 sum, so results are
bit-identical to the DuckDB oracle (:func:`sql_tfidf_search`) with no
float-boundary coin flips; ties at the cutoff break on ``doc_id`` on
both sides.

Scale shape: the per-batch partial computes (term, doc_id, tf) with
tokens filtered to the query IN-BATCH, so the shuffled stream is
O(matching docs x query terms), never O(corpus tokens).  The df lookup
collected to the driver is bounded by the QUERY length (a handful of
rows), not the corpus.  The persisted index hash-partitions postings
by term into ``n_buckets`` parquet directories; a query reads only the
buckets its terms hash into.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from k_gap_ray.functions.textstats import H1_BASE, H1_MOD, hash_tokens

IDF_SCALE = 1000


def _postings_partial(t: pa.Table, id_col: str, text_col: str,
                      terms: list[str] | None) -> pa.Table:
    """In-batch (term, doc_id, tf) — exact, because each document
    lives wholly in one row."""
    from k_gap_ray.functions.textstats import _tokens_of

    flat, counts, _ = _tokens_of(t.column(text_col))
    empty = pa.table({"term": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "tf": pa.array([], pa.int64())})
    if len(flat) == 0:
        return empty
    doc_ids = pc.cast(t.column(id_col), pa.int64()).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if terms is not None:
        keep = pc.is_in(flat, value_set=pa.array(terms, pa.string())) \
            .to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        if len(flat) == 0:
            return empty
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    pair = doc_idx * len(vocab) + codes
    uniq, tf = np.unique(pair, return_counts=True)
    return pa.table({
        "term": pc.take(vocab, pa.array(uniq % len(vocab))),
        "doc_id": pa.array(doc_ids[uniq // len(vocab)], pa.int64()),
        "tf": pa.array(tf.astype(np.int64), pa.int64())})


def build_postings(ds, id_col: str = "doc_id", text_col: str = "text",
                   terms: list[str] | None = None):
    """Dataset(term, doc_id, tf) — one map_batches pass, no shuffle.
    With ``terms`` given, only those terms' postings are emitted."""
    return ds.map_batches(
        lambda t: _postings_partial(t, id_col, text_col, terms),
        batch_format="pyarrow", zero_copy_batch=True)


def tfidf_search(ds, terms: list[str], k: int = 10,
                 id_col: str = "doc_id", text_col: str = "text",
                 idf_scale: int = IDF_SCALE, n_docs: int | None = None):
    """Top-k documents by integer TF-IDF for ``terms`` ->
    Dataset(doc_id, score), score desc / doc_id asc, deterministic.

    ``n_docs`` defaults to ``ds.count()`` (parquet metadata count).
    Two rounds by necessity (idf needs global df before scoring); the
    df pass collects len(terms) rows — query-sized, never corpus-sized.
    """
    if n_docs is None:
        n_docs = ds.count()
    post = build_postings(ds, id_col, text_col, terms).materialize()
    return _score_postings(post, terms, k, idf_scale, n_docs)


def _score_postings(post, terms: list[str], k: int, idf_scale: int,
                    n_docs: int):
    from ray.data.aggregate import Sum

    df_rows = post.groupby("term").count().take_all()
    idf = {r["term"]: (n_docs * idf_scale) // r["count()"]
           for r in df_rows}
    terms_arr = pa.array(list(idf.keys()), pa.string())
    idf_arr = pa.array([idf[t] for t in idf], pa.int64())

    def score(t: pa.Table) -> pa.Table:
        pos = pc.index_in(t.column("term"), value_set=terms_arr)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "s": pc.multiply(t.column("tf"),
                             pc.take(idf_arr, pos))})

    scored = (post.map_batches(score, batch_format="pyarrow")
              .groupby("doc_id").aggregate(Sum("s", alias_name="score")))
    return (scored.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "score": t.column("score")}),
        batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False]).limit(k))


def term_bucket(terms, n_buckets: int) -> np.ndarray:
    """Stable term -> partition bucket (vectorized rolling hash)."""
    arr = terms if isinstance(terms, pa.Array) \
        else pa.array(list(terms), pa.string())
    return (hash_tokens(arr, H1_BASE, H1_MOD)
            % np.uint64(n_buckets)).astype(np.int64)


def write_inverted_index(ds, path: str, id_col: str = "doc_id",
                         text_col: str = "text", n_buckets: int = 64):
    """Persist the FULL postings table hash-partitioned by term:
    ``<path>/bucket=<b>/*.parquet`` plus ``<path>/_meta.json``
    (n_docs, n_buckets).  Build once, query many times — queries read
    only their terms' buckets (same pattern as the persisted ANN
    index).  Returns n_docs."""
    import json
    import os

    n_docs = ds.count()
    post = build_postings(ds, id_col, text_col)

    def addbucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pa.array(term_bucket(t.column("term").combine_chunks(),
                                           n_buckets), pa.int64()))

    post.map_batches(addbucket, batch_format="pyarrow") \
        .write_parquet(path, partition_cols=["bucket"])
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump({"n_docs": n_docs, "n_buckets": n_buckets}, f)
    return n_docs


def search_inverted_index(path: str, terms: list[str], k: int = 10,
                          idf_scale: int = IDF_SCALE):
    """Query a persisted index: reads ONLY the parquet partitions the
    query terms hash into, then scores as :func:`tfidf_search`."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    buckets = sorted(set(term_bucket(terms, meta["n_buckets"]).tolist()))
    dirs = [os.path.join(path, f"bucket={b}") for b in buckets]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "score": pa.array([], pa.int64())}))
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    tset = pa.array(terms, pa.string())
    post = rd.read_parquet(files, columns=["term", "doc_id", "tf"]) \
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("term"), value_set=tset)),
            batch_format="pyarrow", zero_copy_batch=True)
    return _score_postings(post.materialize(), terms, k, idf_scale,
                           meta["n_docs"])


def sql_tfidf_search(terms: list[str], k: int = 10,
                     idf_scale: int = IDF_SCALE,
                     docs_table: str = "documents") -> str:
    """DuckDB oracle with the identical integer recurrence."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM {docs_table}),
        qt AS (SELECT doc_id, term FROM toks WHERE term IN ({in_list})),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
               FROM qt GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
               FROM qt GROUP BY term),
        n AS (SELECT count(*)::BIGINT AS n FROM {docs_table})
        SELECT tf.doc_id,
               SUM(tf.tf * ((n.n * {idf_scale}) // df.df))::BIGINT AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id
        LIMIT {k}
    """


def phrase_search(ds, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Exact phrase match over the pinned space tokenization: docs
    containing the CONSECUTIVE token sequence ``phrase``, with the
    occurrence count — the quoted-query operator of any search
    surface (and the FTS idiom TF-IDF ranking can't express).

    One zero-shuffle vectorized pass: the corpus's token |phrase|-gram
    stream (textstats._batch_ngram_positions — shifted flat-slice
    joins, doc-boundary-masked) is compared against the single query
    gram and counted per doc.  -> Dataset (doc_id, n_hits) for
    matching docs, sorted by doc_id.
    """
    import numpy as np

    from .textstats import _batch_ngram_positions

    toks = phrase.split(" ")
    n = len(toks)
    if n == 0 or any(t == "" for t in toks):
        raise ValueError("phrase must be non-empty space-separated "
                         "tokens")
    target = " ".join(toks)

    def f(t: pa.Table) -> pa.Table:
        pos, grams = _batch_ngram_positions(t, n, text_col)
        if len(pos) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        hit = pc.equal(grams, pa.scalar(target)) \
            .to_numpy(zero_copy_only=False)
        nrows = t.num_rows
        per_doc = np.bincount(pos[hit], minlength=nrows).astype(np.int64)
        docs = np.nonzero(per_doc)[0]
        ids = pc.take(t.column(id_col), pa.array(docs, pa.int64()))
        return pa.table({id_col: pc.cast(ids, pa.int64()),
                         "n_hits": pa.array(per_doc[docs], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True).sort(id_col)


def sql_phrase_search(phrase: str, id_col: str = "doc_id",
                      text_col: str = "text",
                      rel: str = "documents") -> str:
    """DuckDB mirror of :func:`phrase_search` (list-slice n-grams,
    same doc-boundary semantics)."""
    toks = phrase.split(" ")
    n = len(toks)
    lit = " ".join(toks).replace("'", "''")
    return f"""
        WITH toks AS (
          SELECT {id_col}, string_split({text_col}, ' ') AS l
          FROM {rel}
        ), grams AS (
          SELECT {id_col},
                 unnest(list_transform(
                     generate_series(1, len(l) - {n - 1}),
                     i -> array_to_string(l[i:i + {n - 1}], ' ')))
                     AS gram
          FROM toks WHERE len(l) >= {n}
        )
        SELECT {id_col}, count(*)::BIGINT AS n_hits
        FROM grams WHERE gram = '{lit}'
        GROUP BY {id_col} ORDER BY {id_col}
    """


def _gram_postings_partial(t: pa.Table, id_col: str, text_col: str,
                           n: int) -> pa.Table:
    """In-batch (term, doc_id, tf) over token ``n``-gram shingles —
    exact, because each document lives wholly in one row."""
    from k_gap_ray.functions.textstats import _batch_ngram_positions

    empty = pa.table({"term": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "tf": pa.array([], pa.int64())})
    row_idx, grams = _batch_ngram_positions(t, n, text_col)
    if len(grams) == 0:
        return empty
    doc_ids = pc.cast(t.column(id_col), pa.int64()).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(grams)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    pair = row_idx * len(vocab) + codes
    uniq, tf = np.unique(pair, return_counts=True)
    return pa.table({
        "term": pc.take(vocab, pa.array(uniq % len(vocab))),
        "doc_id": pa.array(doc_ids[uniq // len(vocab)], pa.int64()),
        "tf": pa.array(tf.astype(np.int64), pa.int64())})


def tfidf_sim_pairs(ds, topk: int = 20, df_cap: int = 100, n: int = 3,
                    idf_scale: int = 1000,
                    id_col: str = "doc_id", text_col: str = "text",
                    num_partitions: int | None = None):
    """TF-IDF weighted document-similarity join over token ``n``-gram
    SHINGLES: the top ``topk`` doc pairs by the exact-integer
    WEIGHTED-OVERLAP score

        score(a, b) = sum over shared shingles t of
                      min(tf(a,t), tf(b,t)) * idf_int(t)
        idf_int(t)  = (N * idf_scale) // df(t)

    ordered by (score DESC, doc_id_a, doc_id_b) — a total order, so
    the cutoff is unambiguous on both engines.  ``min`` (not the tf
    product) keeps every partial sum bounded by doc_len * tf * idf —
    int64-safe at any corpus size, where a dot product of integer
    tf-idf weights overflows at ~10^5 docs.  Shingles (not unigrams)
    are the term space because near-dup similarity needs phrase-level
    evidence — and a web-ish corpus's unigram df is boilerplate-heavy
    (on the synthetic docs table EVERY unigram exceeds any useful
    df_cap at the 5000-doc tier, leaving zero candidate pairs).
    Returns a driver-sized pa.Table(doc_id_a, doc_id_b, n_shared,
    score).

    Scale shape: the postings stream is exact per batch (each doc
    lives wholly in its row), df is one slim (term) shuffle, and the
    pair join only touches shingles with 2 <= df <= ``df_cap`` — the
    PPJoin-style frequency cut that bounds each shingle's pair fan-out
    at df_cap^2 and drops boilerplate that carries no signal
    (identical cut in the SQL mirror :func:`sql_tfidf_sim_pairs`).
    Pair partials pre-reduce per batch on the composite key before the
    one (pair) shuffle.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    _S = "\x1f"
    empty = pa.table({"doc_id_a": pa.array([], pa.int64()),
                      "doc_id_b": pa.array([], pa.int64()),
                      "n_shared": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
    n_docs = ds.count()
    if n_docs == 0:
        return empty
    posts = ds.map_batches(
        lambda t: _gram_postings_partial(t, id_col, text_col, n),
        batch_format="pyarrow").materialize()
    if posts.count() == 0:
        return empty
    posts = drop_empty_blocks(posts)

    def idf_of(t: pa.Table) -> pa.Table:
        dfv = pc.cast(t.column("count()"), pa.int64())
        m = pc.and_(pc.greater_equal(dfv, pa.scalar(2, pa.int64())),
                    pc.less_equal(dfv, pa.scalar(df_cap, pa.int64())))
        t = t.filter(m)
        dfv = pc.cast(t.column("count()"), pa.int64())
        return pa.table({
            "term": t.column("term"),
            "idf": pc.divide(pa.scalar(n_docs * idf_scale, pa.int64()),
                             dfv)})

    idf = (posts.groupby("term").count()
           .map_batches(idf_of, batch_format="pyarrow")).materialize()
    if idf.count() == 0:
        return empty
    idf = drop_empty_blocks(idf)

    wp = join_datasets(posts, idf, on="term",
                       num_partitions=num_partitions,
                       scrub_left=False, scrub_right=False)
    wp = drop_empty_blocks(wp.materialize())
    left = wp.map_batches(lambda t: pa.table(
        {"term": t.column("term"), "da": t.column(id_col),
         "tfa": t.column("tf"), "idf": t.column("idf")}),
        batch_format="pyarrow")
    right = wp.map_batches(lambda t: pa.table(
        {"term": t.column("term"), "db": t.column(id_col),
         "tfb": t.column("tf")}), batch_format="pyarrow")
    pairs = join_datasets(left, right, on="term",
                          num_partitions=num_partitions,
                          scrub_left=False, scrub_right=False)

    def pair_partials(t: pa.Table) -> pa.Table:
        da = pc.cast(t.column("da"), pa.int64())
        db = pc.cast(t.column("db"), pa.int64())
        m = pc.less(da, db)
        t = t.filter(m)
        if t.num_rows == 0:
            return pa.table({"__k": pa.array([], pa.string()),
                             "np_": pa.array([], pa.int64()),
                             "sp": pa.array([], pa.int64())})
        da = pc.cast(t.column("da"), pa.int64())
        db = pc.cast(t.column("db"), pa.int64())
        key = pc.binary_join_element_wise(
            pc.cast(da, pa.string()), pc.cast(db, pa.string()), _S)
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) \
            else key
        contrib = pc.multiply(
            pc.min_element_wise(pc.cast(t.column("tfa"), pa.int64()),
                                pc.cast(t.column("tfb"), pa.int64())),
            pc.cast(t.column("idf"), pa.int64()))
        enc = pc.dictionary_encode(key)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnp = contrib.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(contrib, pa.ChunkedArray) \
            else contrib.to_numpy(zero_copy_only=False)
        n = len(enc.dictionary)
        npx = np.bincount(codes, minlength=n).astype(np.int64)
        sp = np.zeros(n, dtype=np.int64)
        np.add.at(sp, codes, cnp.astype(np.int64))
        return pa.table({"__k": enc.dictionary,
                         "np_": pa.array(npx, pa.int64()),
                         "sp": pa.array(sp, pa.int64())})

    sc = (pairs.map_batches(pair_partials, batch_format="pyarrow")
          .groupby("__k").aggregate(Sum("np_", alias_name="n_shared"),
                                    Sum("sp", alias_name="score")))
    sc = sc.materialize()
    if sc.count() == 0:
        return empty
    sc = drop_empty_blocks(sc)

    def finish(t: pa.Table) -> pa.Table:
        key = t.column("__k").combine_chunks() \
            if isinstance(t.column("__k"), pa.ChunkedArray) \
            else t.column("__k")
        split = pc.split_pattern(key, _S)
        return pa.table({
            "doc_id_a": pc.cast(pc.list_element(split, 0), pa.int64()),
            "doc_id_b": pc.cast(pc.list_element(split, 1), pa.int64()),
            "n_shared": pc.cast(t.column("n_shared"), pa.int64()),
            "score": pc.cast(t.column("score"), pa.int64())})

    ranked = (sc.map_batches(finish, batch_format="pyarrow")
              .sort(["score", "doc_id_a", "doc_id_b"],
                    descending=[True, False, False])
              .limit(topk))
    rows = ranked.take_all()
    if not rows:
        return empty
    return pa.table({
        "doc_id_a": pa.array([r["doc_id_a"] for r in rows], pa.int64()),
        "doc_id_b": pa.array([r["doc_id_b"] for r in rows], pa.int64()),
        "n_shared": pa.array([r["n_shared"] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.int64())})


def sql_tfidf_sim_pairs(topk: int = 20, df_cap: int = 100, n: int = 3,
                        idf_scale: int = 1000, id_col: str = "doc_id",
                        text_col: str = "text",
                        rel: str = "documents") -> str:
    """DuckDB oracle for :func:`tfidf_sim_pairs`: the identical
    shingle postings, df window, integer idf and min-tf weighted
    overlap."""
    return f"""
    WITH __toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {rel}
    ), __grams AS (
      SELECT {id_col},
             unnest(list_transform(
                 generate_series(1, len(l) - {n - 1}),
                 i -> array_to_string(l[i:i + {n - 1}], ' '))) AS term
      FROM __toks WHERE len(l) >= {n}
    ), __posts AS MATERIALIZED (
      SELECT term, {id_col} AS d, COUNT(*)::BIGINT AS tf
      FROM __grams GROUP BY term, {id_col}
    ), __idf AS (
      SELECT term,
             ((SELECT COUNT(*) FROM {rel}) * {idf_scale}
              // COUNT(*))::BIGINT AS idf
      FROM __posts GROUP BY term
      HAVING COUNT(*) BETWEEN 2 AND {df_cap}
    )
    SELECT a.d AS doc_id_a, b.d AS doc_id_b,
           COUNT(*)::BIGINT AS n_shared,
           SUM(LEAST(a.tf, b.tf) * i.idf)::BIGINT AS score
    FROM __posts a
    JOIN __posts b ON a.term = b.term AND a.d < b.d
    JOIN __idf i ON i.term = a.term
    GROUP BY a.d, b.d
    ORDER BY score DESC, doc_id_a, doc_id_b LIMIT {topk}
    """


def kwic(ds, term: str, window: int = 3, id_col: str = "doc_id",
         text_col: str = "text"):
    """Keyword-in-context concordance — the notebook analyst's 'show
    me every mention with surrounding words' surface: every position
    whose token equals ``term``, with up to ``window`` tokens of left
    and right context (clamped at document edges).  Returns
    Dataset(id_col, pos, left_ctx, right_ctx) with 1-based positions
    pinned to the SQL mirror's generate_series.

    Scale shape: one stateless map_batches pass, no shuffle; the hit
    mask is a vectorized equality over the flat token array, and only
    HIT rows pay the per-hit context join (bounded by term frequency,
    not corpus size)."""
    from k_gap_ray.functions.textstats import _tokens_of

    def f(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "left_ctx": pa.array([], pa.string()),
                          "right_ctx": pa.array([], pa.string())})
        flat, counts, starts = _tokens_of(t.column(text_col))
        n = len(flat)
        if n == 0:
            return empty
        hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        hit_idx = np.flatnonzero(hit)
        if len(hit_idx) == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        ids = pc.cast(t.column(id_col), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        docs = doc_idx[hit_idx]
        pos1 = hit_idx - starts[docs] + 1
        # context joins only for hit rows (term-frequency-bounded):
        # slice the flat token list around each hit, clamped to the
        # document's own [start, start+count) range
        toks = flat.to_pylist()
        lefts, rights = [], []
        for h, d in zip(hit_idx.tolist(), docs.tolist()):
            s0, c0 = int(starts[d]), int(counts[d])
            lo = max(s0, h - window)
            hi = min(s0 + c0, h + window + 1)
            lefts.append(" ".join(toks[lo:h]))
            rights.append(" ".join(toks[h + 1:hi]))
        return pa.table({
            id_col: pa.array(ids[docs], pa.int64()),
            "pos": pa.array(pos1, pa.int64()),
            "left_ctx": pa.array(lefts, pa.string()),
            "right_ctx": pa.array(rights, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def sql_kwic(term: str, window: int = 3, id_col: str = "doc_id",
             text_col: str = "text", rel: str = "documents") -> str:
    """DuckDB oracle for :func:`kwic`: list slices clamped with
    greatest(), the identical 1-based positions."""
    lit = term.replace("'", "''")
    return f"""
    WITH __toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {rel}
    ), __hits AS (
      SELECT {id_col}, l,
             unnest(generate_series(1, len(l))) AS pos
      FROM __toks
    )
    SELECT {id_col}, pos,
           COALESCE(array_to_string(
               l[greatest(1, pos - {window}):pos - 1], ' '), '')
               AS left_ctx,
           COALESCE(array_to_string(l[pos + 1:pos + {window}], ' '),
                    '') AS right_ctx
    FROM __hits WHERE l[pos] = '{lit}'
    """


def bm25_search(ds, terms: list[str], k: int = 10,
                id_col: str = "doc_id", text_col: str = "text",
                idf_scale: int = 100):
    """Exact-integer BM25 ranking (the rational-constant variant):
    k1 = 6/5 and b = 3/4 are kept as EXACT fractions, so with
    T = total corpus tokens and N = docs the per-term score

        s(t, d) = idf_int(t) * tf * 44 * T
                  // (20*T*tf + 6*T + 18*dl*N)

    is one int64 floor division (the algebra: 44 = 20*(k1+1), the
    denominator is 20*T*(tf + k1*(1-b) + k1*b*dl*N/T) cleared of
    fractions), and the document score is the per-term sum — exact on
    both engines, no float-boundary coin flips.  idf_int is the house
    rational idf ``(N * idf_scale) // df`` (BM25's log-idf is
    float-valued; the rational form preserves the df ordering and the
    oracle exactness).  int64 bound: idf * tf * 44 * T must fit —
    safe to T ≈ 2*10^8 corpus tokens at the default scale; shrink
    ``idf_scale`` for larger corpora (the ranking is scale-invariant
    in T).

    Scale shape: ONE map_batches pass emits matched-term postings
    (term, doc, tf, dl) — the stream is O(matching docs x query
    terms) — plus per-batch (docs, tokens) totals; df/T/N collect
    query-sized driver state; scoring is vectorized with the
    broadcast idf table and the top-k is a tiny sort.  Returns
    pa.Table(doc_id, score) (k rows).
    """
    import ray
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks
    from k_gap_ray.functions.textstats import _tokens_of

    tset = pa.array(sorted(set(terms)), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        ids = pc.cast(t.column(id_col), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        base = pa.table({
            "term": pa.array([None], pa.string()),
            "d": pa.array([None], pa.int64()),
            "tf": pa.array([None], pa.int64()),
            "dl": pa.array([None], pa.int64()),
            "docs_p": pa.array([t.num_rows], pa.int64()),
            "toks_p": pa.array([int(counts.sum())], pa.int64())})
        if len(flat) == 0:
            return base
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        keep = pc.is_in(flat, value_set=tset).to_numpy(
            zero_copy_only=False)
        flat_m = flat.filter(pa.array(keep))
        doc_m = doc_idx[keep]
        if len(flat_m) == 0:
            return base
        enc = pc.dictionary_encode(flat_m)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = enc.dictionary
        pair = doc_m * len(vocab) + codes
        uniq, tf = np.unique(pair, return_counts=True)
        docs_u = uniq // len(vocab)
        n = len(uniq)
        pad = pa.nulls(max(0, n - 1), pa.int64())
        return pa.table({
            "term": pc.take(vocab, pa.array(uniq % len(vocab))),
            "d": pa.array(ids[docs_u], pa.int64()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "dl": pa.array(counts[docs_u], pa.int64()),
            "docs_p": pa.concat_arrays([
                pa.array([t.num_rows], pa.int64()), pad]),
            "toks_p": pa.concat_arrays([
                pa.array([int(counts.sum())], pa.int64()), pad])})

    posts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    # totals: one row per block; df: a <= |terms|-row groupby — both
    # query-sized driver state, never the postings stream
    tot_rows = posts.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("docs_p")))
        .select(["docs_p", "toks_p"]), batch_format="pyarrow") \
        .take_all()
    n_docs = sum(r["docs_p"] for r in tot_rows)
    t_tokens = sum(r["toks_p"] for r in tot_rows)
    df_rows = posts.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("term")))
        .select(["term"]), batch_format="pyarrow") \
        .groupby("term").count().take_all()
    df = {r["term"]: r["count()"] for r in df_rows}
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
    if not df or t_tokens == 0:
        return empty
    terms_arr = pa.array(sorted(df), pa.string())
    idf_arr = pa.array([(n_docs * idf_scale) // df[t]
                        for t in sorted(df)], pa.int64())
    idf_ref = ray.put((terms_arr, idf_arr, n_docs, t_tokens))

    def score(t: pa.Table) -> pa.Table:
        import ray as _r

        ta, ia, N, T = _r.get(idf_ref)
        t = t.filter(pc.is_valid(t.column("term")))
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sp": pa.array([], pa.int64())})
        pos = pc.index_in(t.column("term"), value_set=ta)
        idf = pc.take(ia, pos).to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        dl = t.column("dl").to_numpy(zero_copy_only=False)
        num = idf * tf * 44 * T
        den = 20 * T * tf + 6 * T + 18 * dl * N
        return pa.table({id_col: t.column("d"),
                         "sp": pa.array(num // den, pa.int64())})

    scored = (posts.map_batches(score, batch_format="pyarrow")
              .groupby(id_col).aggregate(Sum("sp", alias_name="score")))
    # scored descends from a groupby: scrub the zero-row empty-schema
    # blocks before the SORT shuffle (BENCH/NOTES.md sharp edge —
    # map_batches passes them through untouched)
    scored = drop_empty_blocks(scored.materialize())
    if scored.count() == 0:
        return empty
    top = (scored.map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            "score": pc.cast(t.column("score"),
                                             pa.int64())}),
        batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False]).limit(k))
    rows = top.take_all()
    if not rows:
        return empty
    return pa.table({
        id_col: pa.array([r[id_col] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.int64())})


def sql_bm25_search(terms: list[str], k: int = 10,
                    id_col: str = "doc_id", text_col: str = "text",
                    rel: str = "documents",
                    idf_scale: int = 100) -> str:
    """DuckDB oracle for :func:`bm25_search`: identical postings,
    totals, rational idf and the cleared-fraction BM25 division."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'"
                        for t in sorted(set(terms)))
    return f"""
    WITH __tot AS (
      SELECT count(*)::BIGINT AS n_docs,
             SUM(len(string_split({text_col}, ' ')))::BIGINT AS t_toks
      FROM {rel}
    ), __toks AS (
      SELECT {id_col}, len(l)::BIGINT AS dl, unnest(l) AS term
      FROM (SELECT {id_col}, string_split({text_col}, ' ') AS l
            FROM {rel}) __x
    ), __posts AS (
      SELECT term, {id_col} AS d, COUNT(*)::BIGINT AS tf,
             MIN(dl)::BIGINT AS dl
      FROM __toks WHERE term IN ({in_list})
      GROUP BY term, {id_col}
    ), __df AS (
      SELECT term, COUNT(*)::BIGINT AS df FROM __posts GROUP BY term
    )
    SELECT d AS {id_col}, SUM(
        ((SELECT n_docs FROM __tot) * {idf_scale} // f.df)
        * p.tf * 44 * (SELECT t_toks FROM __tot)
        // (20 * (SELECT t_toks FROM __tot) * p.tf
            + 6 * (SELECT t_toks FROM __tot)
            + 18 * p.dl * (SELECT n_docs FROM __tot)))::BIGINT AS score
    FROM __posts p JOIN __df f ON f.term = p.term
    GROUP BY d
    ORDER BY score DESC, d LIMIT {k}
    """


def best_snippets(ds, terms: list[str], window: int = 8,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Search-result snippet extraction: for every document containing
    at least one query term, the ``window``-token span with the most
    query-term hits (leftmost on ties — the pinned argmax).  Documents
    shorter than the window use their whole text as the single
    candidate span.  Returns Dataset(id_col, start_pos, n_hits,
    snippet) with 1-based start positions.

    Scale shape: one stateless map_batches pass — the hit indicator is
    a vectorized is_in, window sums are one cumulative-sum difference
    over the flat token array (doc-boundary-masked), and the per-doc
    leftmost argmax is a lexsort + first-per-group cut; only winning
    spans pay the snippet string join."""
    from k_gap_ray.functions.textstats import _tokens_of

    tset = pa.array(sorted(set(terms)), pa.string())

    def f(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "start_pos": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64()),
                          "snippet": pa.array([], pa.string())})
        flat, counts, starts = _tokens_of(t.column(text_col))
        n = len(flat)
        if n == 0:
            return empty
        ids = pc.cast(t.column(id_col), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        ind = pc.is_in(flat, value_set=tset).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ind, out=cum[1:])
        # candidate windows: full windows [i, i+W-1] inside one doc,
        # plus the whole-doc window for docs shorter than W
        cand_doc, cand_pos, cand_s = [], [], []
        if n >= window:
            i = np.arange(n - window + 1)
            full = doc_idx[i] == doc_idx[i + window - 1]
            fi = i[full]
            cand_doc.append(doc_idx[fi])
            cand_pos.append(fi - starts[doc_idx[fi]] + 1)
            cand_s.append(cum[fi + window] - cum[fi])
        short = np.flatnonzero(counts < window)
        if len(short):
            s0 = starts[short]
            cand_doc.append(short)
            cand_pos.append(np.ones(len(short), dtype=np.int64))
            cand_s.append(cum[s0 + counts[short]] - cum[s0])
        if not cand_doc:
            return empty
        cd = np.concatenate(cand_doc)
        cp = np.concatenate(cand_pos)
        cs = np.concatenate(cand_s)
        keep = cs > 0
        cd, cp, cs = cd[keep], cp[keep], cs[keep]
        if len(cd) == 0:
            return empty
        order = np.lexsort((cp, -cs, cd))      # doc, hits desc, pos
        cd, cp, cs = cd[order], cp[order], cs[order]
        first = np.ones(len(cd), dtype=bool)
        first[1:] = cd[1:] != cd[:-1]
        cd, cp, cs = cd[first], cp[first], cs[first]
        toks = flat.to_pylist()
        snippets = []
        for d, p in zip(cd.tolist(), cp.tolist()):
            s0, c0 = int(starts[d]), int(counts[d])
            a = s0 + p - 1
            b = min(s0 + c0, a + window)
            snippets.append(" ".join(toks[a:b]))
        return pa.table({
            id_col: pa.array(ids[cd], pa.int64()),
            "start_pos": pa.array(cp, pa.int64()),
            "n_hits": pa.array(cs, pa.int64()),
            "snippet": pa.array(snippets, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def sql_best_snippets(terms: list[str], window: int = 8,
                      id_col: str = "doc_id", text_col: str = "text",
                      rel: str = "documents") -> str:
    """DuckDB oracle for :func:`best_snippets`: indicator + window
    sum + leftmost per-doc argmax + the clamped list-slice join."""
    in_list = ", ".join("'" + t.replace("'", "''") + "'"
                        for t in sorted(set(terms)))
    return f"""
    WITH __toks AS MATERIALIZED (
      SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {rel}
    ), __pos AS (
      SELECT {id_col}, l, len(l) AS n,
             unnest(generate_series(1, len(l))) AS pos
      FROM __toks
    ), __win AS (
      SELECT {id_col}, pos, n,
             SUM(CASE WHEN l[pos] IN ({in_list}) THEN 1 ELSE 0 END)
                 OVER (PARTITION BY {id_col} ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                       AND {window - 1} FOLLOWING) AS s
      FROM __pos
    ), __valid AS (
      SELECT * FROM __win WHERE pos <= greatest(1, n - {window - 1})
    ), __ranked AS (
      SELECT {id_col}, pos, s,
             MAX(s) OVER (PARTITION BY {id_col}) AS ms
      FROM __valid
    ), __best AS (
      SELECT {id_col}, MIN(pos)::BIGINT AS start_pos,
             MIN(ms)::BIGINT AS n_hits
      FROM __ranked WHERE s = ms AND ms > 0
      GROUP BY {id_col}
    )
    SELECT b.{id_col}, b.start_pos, b.n_hits,
           array_to_string(
               t.l[b.start_pos:b.start_pos + {window - 1}], ' ')
               AS snippet
    FROM __best b JOIN __toks t ON t.{id_col} = b.{id_col}
    """


def more_like_this(ds, source_doc_id: int, topk: int = 10,
                   df_cap: int = 100, n: int = 3,
                   idf_scale: int = 1000, id_col: str = "doc_id",
                   text_col: str = "text"):
    """More-like-this retrieval: the per-query form of
    :func:`tfidf_sim_pairs` — given ONE source document, the top-k
    most similar documents by the exact-integer weighted shingle
    overlap sum(min(tf_d, tf_src) * idf_int) over shared ``n``-gram
    shingles with 2 <= df <= ``df_cap``.  Unlike the all-pairs join,
    the source's shingle profile is QUERY state: it broadcasts once
    (ray.put) and every batch scores against it in place — no pair
    join at all, one df shuffle plus one scoring pass.

    Returns pa.Table(doc_id, n_shared, score) ordered by
    (score DESC, doc_id), source excluded; mirror
    :func:`sql_more_like_this`."""
    import ray
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "n_shared": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
    n_docs = ds.count()
    if n_docs == 0:
        return empty
    src_rows = ds.map_batches(
        lambda t: t.filter(pc.equal(
            pc.cast(t.column(id_col), pa.int64()),
            pa.scalar(source_doc_id, pa.int64()))),
        batch_format="pyarrow").take_all()
    if not src_rows:
        return empty
    src_tbl = pa.table({id_col: pa.array([source_doc_id], pa.int64()),
                        text_col: pa.array([src_rows[0][text_col]])})
    src_posts = _gram_postings_partial(src_tbl, id_col, text_col, n)
    src_tf = {r["term"]: r["tf"] for r in src_posts.to_pylist()}
    if not src_tf:
        return empty

    # df over the SOURCE's shingles only: the postings partial filters
    # to the broadcast source vocabulary, so the shuffled stream is
    # O(docs sharing a source shingle), never the corpus shingle space
    src_terms = pa.array(sorted(src_tf), pa.string())
    terms_ref = ray.put(src_terms)

    def matched(t: pa.Table) -> pa.Table:
        import ray as _r

        posts = _gram_postings_partial(t, id_col, text_col, n)
        keep = pc.is_in(posts.column("term"),
                        value_set=_r.get(terms_ref))
        return posts.filter(keep)

    posts = ds.map_batches(matched, batch_format="pyarrow") \
        .materialize()
    if posts.count() == 0:
        return empty
    posts = drop_empty_blocks(posts)
    df_rows = posts.groupby("term").count().take_all()
    dfm = {r["term"]: r["count()"] for r in df_rows
           if 2 <= r["count()"] <= df_cap}
    if not dfm:
        return empty
    keep_terms = pa.array(sorted(dfm), pa.string())
    idf_arr = pa.array([(n_docs * idf_scale) // dfm[t]
                        for t in sorted(dfm)], pa.int64())
    stf_arr = pa.array([src_tf[t] for t in sorted(dfm)], pa.int64())
    score_ref = ray.put((keep_terms, idf_arr, stf_arr))

    def score(t: pa.Table) -> pa.Table:
        import ray as _r

        ka, ia, sa = _r.get(score_ref)
        m = pc.is_in(t.column("term"), value_set=ka)
        t = t.filter(m)
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "np_": pa.array([], pa.int64()),
                             "sp": pa.array([], pa.int64())})
        pos = pc.index_in(t.column("term"), value_set=ka)
        idf = pc.take(ia, pos)
        stf = pc.take(sa, pos)
        contrib = pc.multiply(
            pc.min_element_wise(pc.cast(t.column("tf"), pa.int64()),
                                pc.cast(stf, pa.int64())),
            pc.cast(idf, pa.int64()))
        return pa.table({id_col: t.column(id_col),
                         "np_": pa.array([1] * t.num_rows, pa.int64()),
                         "sp": contrib})

    sc = (posts.map_batches(score, batch_format="pyarrow")
          .groupby(id_col).aggregate(Sum("np_", alias_name="n_shared"),
                                     Sum("sp", alias_name="score")))
    sc = drop_empty_blocks(sc.materialize())
    ranked = (sc.map_batches(
        lambda t: t.filter(pc.not_equal(
            pc.cast(t.column(id_col), pa.int64()),
            pa.scalar(source_doc_id, pa.int64()))),
        batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False]).limit(topk))
    rows = ranked.take_all()
    if not rows:
        return empty
    return pa.table({
        id_col: pa.array([r[id_col] for r in rows], pa.int64()),
        "n_shared": pa.array([pc.cast(pa.scalar(r["n_shared"]),
                                      pa.int64()).as_py()
                              for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.int64())})


def sql_more_like_this(source_doc_id: int, topk: int = 10,
                       df_cap: int = 100, n: int = 3,
                       idf_scale: int = 1000, id_col: str = "doc_id",
                       text_col: str = "text",
                       rel: str = "documents") -> str:
    """DuckDB oracle for :func:`more_like_this`: identical shingle
    postings restricted to the source's vocabulary, df window over the
    matched stream, min-tf weighted overlap."""
    return f"""
    WITH __toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {rel}
    ), __grams AS (
      SELECT {id_col},
             unnest(list_transform(
                 generate_series(1, len(l) - {n - 1}),
                 i -> array_to_string(l[i:i + {n - 1}], ' '))) AS term
      FROM __toks WHERE len(l) >= {n}
    ), __posts AS MATERIALIZED (
      SELECT term, {id_col} AS d, COUNT(*)::BIGINT AS tf
      FROM __grams GROUP BY term, {id_col}
    ), __src AS MATERIALIZED (
      SELECT term, tf AS stf FROM __posts
      WHERE d = {source_doc_id}
    ), __matched AS MATERIALIZED (
      SELECT p.term, p.d, p.tf, s.stf FROM __posts p
      JOIN __src s ON s.term = p.term
    ), __idf AS (
      SELECT term,
             ((SELECT COUNT(*) FROM {rel}) * {idf_scale}
              // COUNT(*))::BIGINT AS idf
      FROM __matched GROUP BY term
      HAVING COUNT(*) BETWEEN 2 AND {df_cap}
    )
    SELECT m.d AS {id_col}, COUNT(*)::BIGINT AS n_shared,
           SUM(LEAST(m.tf, m.stf) * i.idf)::BIGINT AS score
    FROM __matched m JOIN __idf i ON i.term = m.term
    WHERE m.d <> {source_doc_id}
    GROUP BY m.d
    ORDER BY score DESC, {id_col} LIMIT {topk}
    """
