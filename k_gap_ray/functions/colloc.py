"""PMI collocation mining: the corpus's most-associated adjacent word
pairs ("new york"-style multiword expressions), the classic statistic
a phrase-aware tokenizer or boilerplate detector is seeded with.

Score contract (pinned on BOTH engines, exact-integer end to end):

    score = ((c_xy * SCALE) // c_x) * n_bigrams // c_y

a fixed-point monotone proxy for pointwise mutual information
``log(c_xy * N / (c_x * c_y))`` where ``c_xy`` is the corpus count of
the adjacent pair, ``c_x``/``c_y`` are total term frequencies and
``n_bigrams`` the corpus bigram total.  The NESTED division order is
part of the contract: ``(c_xy * SCALE) // c_x <= SCALE`` because
``c_x >= c_xy``, so every intermediate stays below ``SCALE * N`` —
int64-safe (DuckDB BIGINT errors on overflow, no wraparound) up to
~4.6e12 corpus bigrams, where the naive ``c_xy * N * SCALE``
overflows at ~2e6.  Ties rank by (tok1, tok2) ascending.

100-TB shape: bigram and unigram counts are per-batch Arrow hash-agg
partials followed by one single-key groupby-sum each (the shuffle
carries batch-distinct grams, not occurrences); the unigram table
joins back by broadcast dict below ``broadcast_cap`` rows and by two
distributed hash joins above it; the corpus total is an O(blocks)
driver merge.  Tokenization is the repo-pinned space split
(textstats._tokens_of == SQL ``string_split(text, ' ')``); bigrams
never cross document boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 1_000_000


def _block_sum(ds, col: str) -> int:
    """Exact global sum via per-block partials + an O(blocks) driver
    merge (cheaper than a global Dataset.aggregate, which carries a
    multi-second fixed cost — BENCH/NOTES.md round-3)."""
    parts = ds.map_batches(
        lambda t, _c=col: pa.table(
            {"s": pa.array([pc.sum(t.column(_c)).as_py() or 0],
                           pa.int64())}),
        batch_format="pyarrow").take_all()
    return sum(r["s"] for r in parts)


def collocations(ds, k: int = 30, id_col: str = "doc_id",
                 text_col: str = "text",
                 broadcast_cap: int = 2_000_000) -> pa.Table:
    """Top-``k`` adjacent-pair collocations by the pinned fixed-point
    PMI score.  -> pa.Table (tok1, tok2, c_xy, c_x, c_y, score),
    ordered score desc, then (tok1, tok2) asc.
    """
    import ray.data as rd  # noqa: F401  (Dataset ops below)

    from ray.data.aggregate import Sum

    from .textstats import _tokens_of

    def bigram_partial(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        total = len(flat)
        if total < 2:
            return pa.table({"gram": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        valid = doc_idx[: total - 1] == doc_idx[1:]
        grams = pc.filter(
            pc.binary_join_element_wise(flat.slice(0, total - 1),
                                        flat.slice(1, total - 1), " "),
            pa.array(valid))
        vc = pc.value_counts(grams)
        return pa.table({"gram": vc.field("values"),
                         "c_p": pc.cast(vc.field("counts"), pa.int64())})

    def tf_partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _tokens_of(t.column(text_col))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "tf_p": pc.cast(vc.field("counts"), pa.int64())})

    bi = (ds.map_batches(bigram_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
          .groupby("gram").aggregate(Sum("c_p", alias_name="c_xy"))
          .materialize())
    tf = (ds.map_batches(tf_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
          .groupby("token").aggregate(Sum("tf_p", alias_name="tf"))
          .materialize())
    n_bigrams = _block_sum(bi, "c_xy")
    if n_bigrams > (1 << 62) // SCALE:
        # numpy int64 would silently wrap where DuckDB errors — refuse
        # loudly instead of diverging (raise SCALE granularity or shard
        # the corpus before mining at that size)
        raise ValueError(f"corpus bigram total {n_bigrams} exceeds the "
                         f"int64-exact score range for SCALE={SCALE}")
    if n_bigrams == 0:
        return pa.table({"tok1": pa.array([], pa.string()),
                         "tok2": pa.array([], pa.string()),
                         "c_xy": pa.array([], pa.int64()),
                         "c_x": pa.array([], pa.int64()),
                         "c_y": pa.array([], pa.int64()),
                         "score": pa.array([], pa.int64())})

    def split_grams(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("gram"), pattern=" ",
                                 max_splits=1)
        return pa.table({
            "tok1": pc.list_element(parts, 0),
            "tok2": pc.list_element(parts, 1),
            "c_xy": pc.cast(t.column("c_xy"), pa.int64())})

    pairs = bi.map_batches(split_grams, batch_format="pyarrow")

    def score_of(c_xy: np.ndarray, c_x: np.ndarray,
                 c_y: np.ndarray) -> np.ndarray:
        return ((c_xy * SCALE) // c_x) * n_bigrams // c_y

    if tf.count() <= broadcast_cap:
        import pandas as pd
        import ray

        tf_rows = tf.take_all()
        tf_map = {r["token"]: int(r["tf"]) for r in tf_rows}
        ref = ray.put(tf_map)

        def attach(t: pa.Table, _ref=ref) -> pa.Table:
            import ray as _r

            m = _r.get(_ref)
            c_x = pd.Series(t.column("tok1").to_pylist()).map(m) \
                .to_numpy(np.int64)
            c_y = pd.Series(t.column("tok2").to_pylist()).map(m) \
                .to_numpy(np.int64)
            c_xy = t.column("c_xy").to_numpy(zero_copy_only=False)
            return pa.table({
                "tok1": t.column("tok1"), "tok2": t.column("tok2"),
                "c_xy": t.column("c_xy"),
                "c_x": pa.array(c_x, pa.int64()),
                "c_y": pa.array(c_y, pa.int64()),
                "score": pa.array(score_of(c_xy, c_x, c_y), pa.int64())})

        scored = pairs.map_batches(attach, batch_format="pyarrow")
    else:
        from .. import dsutil

        t1 = tf.map_batches(
            lambda t: t.rename_columns(["tok1", "c_x"]),
            batch_format="pyarrow")
        t2 = tf.map_batches(
            lambda t: t.rename_columns(["tok2", "c_y"]),
            batch_format="pyarrow")
        # tf descends from a groupby -> scrub those sides
        j = dsutil.join_datasets(pairs, t1, on="tok1",
                                 scrub_left=False, scrub_right=True)
        j = dsutil.join_datasets(dsutil.drop_empty_blocks(j.materialize()),
                                 t2, on="tok2",
                                 scrub_left=False, scrub_right=True)

        def score_batch(t: pa.Table) -> pa.Table:
            c_xy = pc.cast(t.column("c_xy"), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            c_x = pc.cast(t.column("c_x"), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            c_y = pc.cast(t.column("c_y"), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "tok1": t.column("tok1"), "tok2": t.column("tok2"),
                "c_xy": pa.array(c_xy, pa.int64()),
                "c_x": pa.array(c_x, pa.int64()),
                "c_y": pa.array(c_y, pa.int64()),
                "score": pa.array(score_of(c_xy, c_x, c_y), pa.int64())})

        scored = j.map_batches(score_batch, batch_format="pyarrow")

    top = (scored.sort(["score", "tok1", "tok2"],
                       descending=[True, False, False]).limit(k))
    return pa.Table.from_pylist(
        top.take_all(),
        schema=pa.schema([("tok1", pa.string()), ("tok2", pa.string()),
                          ("c_xy", pa.int64()), ("c_x", pa.int64()),
                          ("c_y", pa.int64()), ("score", pa.int64())]))


def sql_collocations(k: int = 30, table: str = "documents",
                     text_col: str = "text") -> str:
    """DuckDB mirror of :func:`collocations` — same nested integer
    divisions, same tokenization, same tie order."""
    return f"""
    WITH toks AS (
      SELECT string_split({text_col}, ' ') AS l FROM {table}
    ), grams AS (
      SELECT l[i] AS tok1, l[i + 1] AS tok2
      FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
            FROM toks WHERE len(l) >= 2)
    ), bi AS (
      SELECT tok1, tok2, count(*)::BIGINT AS c_xy
      FROM grams GROUP BY 1, 2
    ), tf AS (
      SELECT tok, count(*)::BIGINT AS c
      FROM (SELECT unnest(string_split({text_col}, ' ')) AS tok
            FROM {table}) GROUP BY 1
    ), n AS (SELECT sum(c_xy)::BIGINT AS nb FROM bi)
    SELECT b.tok1, b.tok2, b.c_xy, t1.c AS c_x, t2.c AS c_y,
           ((b.c_xy * {SCALE} // t1.c) * n.nb) // t2.c AS score
    FROM bi b
    JOIN tf t1 ON b.tok1 = t1.tok
    JOIN tf t2 ON b.tok2 = t2.tok
    CROSS JOIN n
    ORDER BY score DESC, b.tok1, b.tok2
    LIMIT {k}
    """


def bigram_lm_score(ds, top_pairs: int = 2000, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Corpus-trained BIGRAM conditional-probability score — the next
    rung above textstats.unigram_lm_score on the KenLM-stand-in
    ladder: fluent word ORDER scores high even when a unigram model
    can't tell scrambled text from prose.

    Model: the ``top_pairs`` most frequent adjacent pairs (ties by
    gram ascending — the repo's pinned top-K tiebreak).  Each kept
    pair contributes the exact integer ``length(bin(q))`` with
    ``q = (c_xy * 1024) // c_first`` — a log-bucketed conditional
    probability P(tok2 | tok1); unseen pairs contribute 0.  Per doc:
    ``n_bigrams`` (adjacent pairs, doc-internal), ``blm_score`` (sum)
    and ``blm_permille = blm_score * 1000 // n_bigrams`` (0 for docs
    under two tokens).  No float logs anywhere.

    Shape: training is the collocations counting pass (per-batch
    partials, single-key groupby-sums) cut to ``top_pairs`` rows on
    the driver; the first-token frequencies attach by filtering the
    tf STREAM against the broadcast kept-token set (only matching
    vocabulary rows ever leave their batch); scoring is one
    zero-shuffle vectorized pass (index_in gather + per-doc bincount).
    """
    import ray
    from ray.data.aggregate import Sum

    from .textstats import _tokens_of

    def bigram_partial(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        total = len(flat)
        if total < 2:
            return pa.table({"gram": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        valid = doc_idx[: total - 1] == doc_idx[1:]
        grams = pc.filter(
            pc.binary_join_element_wise(flat.slice(0, total - 1),
                                        flat.slice(1, total - 1), " "),
            pa.array(valid))
        vc = pc.value_counts(grams)
        return pa.table({"gram": vc.field("values"),
                         "c_p": pc.cast(vc.field("counts"), pa.int64())})

    kept = (ds.map_batches(bigram_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("gram").aggregate(Sum("c_p", alias_name="c_xy"))
            .sort(["c_xy", "gram"], descending=[True, False])
            .limit(top_pairs)
            .take_all())
    grams = [r["gram"] for r in kept]
    c_xy = np.array([r["c_xy"] for r in kept], dtype=np.int64)
    first_toks = sorted({g.split(" ", 1)[0] for g in grams})
    first_set = pa.array(first_toks, pa.string())
    first_ref = ray.put(first_set)

    def tf_first_partial(t: pa.Table, _ref=first_ref) -> pa.Table:
        import ray as _r

        keep_set = _r.get(_ref)
        flat, _, _ = _tokens_of(t.column(text_col))
        hit = pc.is_in(flat, value_set=keep_set)
        vc = pc.value_counts(pc.filter(flat, hit))
        return pa.table({"token": vc.field("values"),
                         "tf_p": pc.cast(vc.field("counts"), pa.int64())})

    tf_rows = (ds.map_batches(tf_first_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("token").aggregate(Sum("tf_p", alias_name="tf"))
               .take_all())                     # <= |first_toks| rows
    tf_map = {r["token"]: int(r["tf"]) for r in tf_rows}
    c_first = np.array([tf_map[g.split(" ", 1)[0]] for g in grams],
                       dtype=np.int64)
    q = (c_xy * 1024) // c_first
    # length(bin(q)) with bin(0)='0': frexp(max(q,1)) (no float logs)
    _, e = np.frexp(np.maximum(q, 1).astype(np.float64))
    buckets = np.concatenate([e.astype(np.int64), [0]])   # [-1] = unseen
    gram_keys = pa.array(grams, pa.string())

    def score(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        total = len(flat)
        n_bi = np.maximum(counts - 1, 0)
        if total < 2:
            z = np.zeros(len(counts), dtype=np.int64)
            return pa.table({id_col: t.column(id_col),
                             "n_bigrams": pa.array(n_bi, pa.int64()),
                             "blm_score": pa.array(z, pa.int64()),
                             "blm_permille": pa.array(z, pa.int64())})
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        valid = doc_idx[: total - 1] == doc_idx[1:]
        g = pc.filter(
            pc.binary_join_element_wise(flat.slice(0, total - 1),
                                        flat.slice(1, total - 1), " "),
            pa.array(valid))
        idx = pc.index_in(g, value_set=gram_keys) \
            .to_numpy(zero_copy_only=False, writable=True)
        w = buckets[np.nan_to_num(idx, nan=-1).astype(np.int64)]
        sc = np.bincount(doc_idx[: total - 1][valid], weights=w,
                         minlength=len(counts)).astype(np.int64)
        permille = np.where(n_bi > 0, sc * 1000 // np.maximum(n_bi, 1), 0)
        return pa.table({
            id_col: t.column(id_col),
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "blm_score": pa.array(sc, pa.int64()),
            "blm_permille": pa.array(permille, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def sql_bigram_lm_score(top_pairs: int = 2000, id_col: str = "doc_id",
                        text_col: str = "text",
                        rel: str = "documents") -> str:
    """DuckDB mirror of :func:`bigram_lm_score` (same top-K tiebreak,
    ``length(bin(q))`` == the engine's frexp bucket)."""
    return f"""
    WITH docs AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS l,
             len(string_split({text_col}, ' ')) AS nl
      FROM {rel}
    ), grams AS (
      SELECT {id_col}, l[i] AS t1, l[i + 1] AS t2
      FROM (SELECT {id_col}, l, unnest(generate_series(1, nl - 1)) AS i
            FROM docs WHERE nl >= 2)
    ), bi AS (
      SELECT t1, t2, count(*)::BIGINT AS c_xy
      FROM grams GROUP BY 1, 2
    ), kept AS (
      SELECT b.t1, b.t2,
             length(bin((b.c_xy * 1024) // tf.c))::BIGINT AS bucket
      FROM (SELECT t1, t2, c_xy FROM bi
            ORDER BY c_xy DESC, t1 || ' ' || t2 ASC
            LIMIT {top_pairs}) b
      JOIN (SELECT tok, count(*)::BIGINT AS c
            FROM (SELECT unnest(string_split({text_col}, ' ')) AS tok
                  FROM {rel}) GROUP BY 1) tf
        ON b.t1 = tf.tok
    ), sc AS (
      SELECT g.{id_col},
             count(*)::BIGINT AS n_bigrams,
             CAST(sum(coalesce(k.bucket, 0)) AS BIGINT) AS blm_score
      FROM grams g
      LEFT JOIN kept k ON g.t1 = k.t1 AND g.t2 = k.t2
      GROUP BY 1
    )
    SELECT d.{id_col},
           coalesce(sc.n_bigrams, 0) AS n_bigrams,
           coalesce(sc.blm_score, 0) AS blm_score,
           CASE WHEN coalesce(sc.n_bigrams, 0) > 0
                THEN sc.blm_score * 1000 // sc.n_bigrams
                ELSE 0 END AS blm_permille
    FROM docs d LEFT JOIN sc USING ({id_col})
    """
