"""Text-analysis operators over a document table (doc_id, text, ...).

Every kernel here is (a) vectorized — Arrow/numpy over flat token
arrays, no per-row Python in hot paths — and (b) *SQL-mirrored*: the
exact same value is expressible in ANSI-ish DuckDB SQL (list_reduce /
list_filter / regexp functions), so each operator has a value-level
oracle in ``__ray_entry__.oracle_sql`` instead of a rows-only check.

Hashing scheme (shared with functions.dedup):
- per-token rolling hash over codepoints: ``h = (h*BASE + cp) % MOD``
  with (257, 4294967291) for h1 and (131, 4294967279) for h2 — both
  fit 32 bits, so DuckDB's HUGEINT intermediate never overflows and
  numpy uint64 arithmetic is exact.
- document fingerprint: Horner over the h1 token-hash sequence with
  (1000003, 999999937) — equals DuckDB
  ``list_reduce(list_prepend(0, hs), (a,b) -> (a*B+b) % M)``.
- simhash: 32 bit-majority votes over h1 (``simhash_lo``) and 32 over
  h2 (``simhash_hi``); two int64 columns < 2^32 sidestep BIGINT sign
  issues in the SQL mirror.

The byte-level vectorized path assumes ASCII text (codepoint == byte);
non-ASCII tokens take a per-token codepoint fallback so the kernel
contract (codepoints) holds for any input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

H1_BASE, H1_MOD = 257, 4294967291
H2_BASE, H2_MOD = 131, 4294967279
FP_BASE, FP_MOD = 1000003, 999999937

_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"],
}
# GPT-2-ish pretokenizer shape: letter runs, digit runs, punct runs.
# Explicit ASCII classes (no \d, \s, \w) so Python re and DuckDB's RE2
# agree character-for-character.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"
PUNCT_STRIP_PATTERN = "[^A-Za-z0-9 ]"


def _tokens_of(text_col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split a string column on single spaces (== SQL string_split).

    Returns (flat token StringArray, per-doc token counts int64,
    per-doc start offsets into the flat array). Empty/null text yields
    one empty token, mirroring ``string_split('', ' ') = ['']``.
    """
    col = text_col.combine_chunks() if isinstance(text_col, pa.ChunkedArray) \
        else text_col
    toks = pc.split_pattern(pc.fill_null(col, ""), pattern=" ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return toks.flatten(), counts, starts


def hash_tokens(flat, base: int, mod: int) -> np.ndarray:
    """Vectorized per-token rolling codepoint hash (uint64).

    Iterates over character POSITIONS (max token length, ~10), not
    tokens — each step is one numpy gather + fused multiply-add over
    every still-active token.
    """
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    n = len(flat)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    bufs = flat.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        flat.offset:flat.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    acc = np.zeros(n, dtype=np.uint64)
    starts, lens = off[:-1], off[1:] - off[:-1]
    if lens.size and (data[off[0]:off[-1]] >= 128).any():
        # non-ASCII fallback: hash true codepoints per token (slow
        # path; contract is codepoints, byte path is the ASCII fast path)
        b, m = np.uint64(base), np.uint64(mod)
        for i, tok in enumerate(flat.to_pylist()):
            h = np.uint64(0)
            for cp in tok or "":
                h = (h * b + np.uint64(ord(cp))) % m
            acc[i] = h
        return acc
    maxlen = int(lens.max()) if n else 0
    ubase, umod = np.uint64(base), np.uint64(mod)
    for j in range(maxlen):
        mask = lens > j
        c = data[starts[mask] + j].astype(np.uint64)
        acc[mask] = (acc[mask] * ubase + c) % umod
    return acc


def token_counts(ds):
    """(doc_id, text) -> (doc_id, n_tokens). Single-space-separated
    token count, fully vectorized: #spaces + 1 (0 tokens for '')."""

    def f(t: pa.Table) -> pa.Table:
        text = t.column("text")
        spaces = pc.count_substring(text, pattern=" ")
        nonempty = pc.cast(pc.greater(pc.utf8_length(text), 0), pa.int64())
        n = pc.add(spaces, nonempty)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _batch_ngram_positions(t: pa.Table, n: int, text_col: str):
    """(batch, n) -> (row positions np.int64 aligned per gram, grams
    pa.StringArray).  Documents shorter than ``n`` tokens contribute
    nothing.  Fully vectorized: shifted flat-token slices joined
    element-wise."""
    flat, counts, _ = _tokens_of(t.column(text_col))
    total = len(flat)
    if total < n:
        return np.zeros(0, dtype=np.int64), pa.array([], pa.string())
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # gram starting at flat position i is valid iff position i+n-1
    # still belongs to the same document
    valid = doc_idx[: total - n + 1] == doc_idx[n - 1:]
    parts = [flat.slice(k, total - n + 1) for k in range(n)]
    grams_all = pc.binary_join_element_wise(*parts, " ")
    grams = pc.filter(grams_all, pa.array(valid))
    return doc_idx[: total - n + 1][valid], grams


def batch_token_ngrams(t: pa.Table, n: int, id_col: str, text_col: str):
    """Vectorized token n-grams for every row of a batch.

    Returns (doc_ids: pa.Array aligned per gram, grams: pa.Array of
    space-joined n-gram strings).  Shared by the decontamination scan
    and the repetition-quality scorer.
    """
    pos, grams = _batch_ngram_positions(t, n, text_col)
    if len(pos) == 0:
        return pa.array([], t.column(id_col).type), grams
    return pc.take(t.column(id_col), pa.array(pos)), grams


def vocab_df(ds, id_col: str = "doc_id", text_col: str = "text",
             min_df: int = 1):
    """Corpus vocabulary table: (token, df, tf) — document frequency
    and total term frequency per distinct token.  The input a
    tokenizer trainer or an IDF-weighted quality filter wants.

    Exactness: each document lives wholly in one row, so the per-batch
    partial (in-batch distinct (doc, token) pairs for df, raw token
    counts for tf) followed by one groupby-sum over tokens is exact —
    the shuffle moves O(batch vocabulary), not O(total tokens).
    Vectorized via dictionary-encoding: tokens -> int codes, (doc,
    token) dedup as a single int64 key array through np.unique.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df_p": pa.array([], pa.int64()),
                             "tf_p": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        tf = np.bincount(codes, minlength=len(vocab))
        pair_codes = np.unique(doc_idx * len(vocab) + codes)
        df = np.bincount(pair_codes % len(vocab), minlength=len(vocab))
        return pa.table({"token": vocab,
                         "df_p": pa.array(df, pa.int64()),
                         "tf_p": pa.array(tf, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("token").aggregate(Sum("df_p", alias_name="df"),
                                       Sum("tf_p", alias_name="tf")))
    out = agg.map_batches(
        lambda t: t.select(["token", "df", "tf"]), batch_format="pyarrow")
    if min_df > 1:
        out = out.filter(expr=f"df >= {min_df}")
    return out


def oov_rate(ds, vocab_size: int = 1000,
             id_col: str = "doc_id", text_col: str = "text"):
    """Per-document out-of-vocabulary stats against the corpus top-K
    vocabulary — the vocabulary-coverage quality filter (docs with a
    high OOV share are noise/foreign/binary junk).

    Two corpus passes, both streaming: (1) :func:`vocab_df` partials →
    one vocab-scale shuffle, top-K cut by (tf DESC, token ASC) — the
    full tiebreak makes the cut set deterministic on both backends —
    K rows to the driver (bounded by ``vocab_size``), broadcast; (2)
    one ``map_batches`` pass counting per-doc tokens outside the set
    (vectorized ``is_in`` over the flat token array, segment-summed
    by doc). The rate is integer-exact per-mille (``n_oov * 1000 //
    n_tokens``) so the SQL oracle hashes bit-identically.

    ``n_tokens`` here is ``len(string_split(text, ' '))`` — empty
    text counts ONE empty token, matching the SQL unnest row count
    (unlike :func:`token_counts`, which reports 0 for '').
    """
    vocab = (vocab_df(ds, id_col=id_col, text_col=text_col)
             .sort(["tf", "token"], descending=[True, False])
             .limit(vocab_size)
             .take_all())
    keep = pa.array([r["token"] for r in vocab], pa.string())

    def f(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        oov = pc.invert(pc.is_in(flat, value_set=keep)) \
            .to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        n_oov = np.bincount(doc_idx, weights=oov,
                            minlength=len(counts)).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
            "oov_permille": pa.array(n_oov * 1000 // counts,
                                     pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True)


def sql_oov_rate(vocab_size: int = 1000, id_col: str = "doc_id",
                 text_col: str = "text",
                 rel: str = "documents") -> str:
    """DuckDB mirror of :func:`oov_rate` (same top-K tiebreak, same
    integer per-mille)."""
    return f"""
        WITH toks AS (
            SELECT {id_col},
                   unnest(string_split({text_col}, ' ')) AS token
            FROM {rel}),
        vocab AS (
            SELECT token FROM (
                SELECT token, count(*) AS tf FROM toks GROUP BY token)
            ORDER BY tf DESC, token ASC LIMIT {vocab_size}),
        oov AS (
            SELECT t.{id_col},
                   count(*)::BIGINT AS n_tokens,
                   CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS n_oov
            FROM toks t LEFT JOIN vocab v USING (token)
            GROUP BY t.{id_col})
        SELECT {id_col}, n_tokens, n_oov,
               n_oov * 1000 // n_tokens AS oov_permille
        FROM oov
    """


_TFDIST_CAP = 4_000_000


def vocab_coverage(ds, permilles=(500, 900, 950, 990),
                   id_col: str = "doc_id", text_col: str = "text"):
    """Tokenizer-design coverage curve: the minimal vocabulary size
    (ranked tf DESC, token ASC) whose tokens cover >= X per-mille of
    all token occurrences, for each threshold.

    Scale shape — NO vocabulary-scale sort and NO hot keys: the
    vocabulary Dataset is reduced to its **tf-distribution**
    ``(tf_value -> number_of_tokens_with_that_tf)`` by per-batch
    ``np.unique`` partials merged on the driver.  Distinct tf values
    are <= ~2*sqrt(N) by construction (their sum is N), so driver
    state is bounded far below vocabulary size; the threshold
    crossing INSIDE a constant-tf run is solved arithmetically
    (``ceil((need - cum_prev) / tf)``) — rank order within a run
    (token ASC) cannot change counts.  All integers; the DuckDB
    window-sum oracle (:func:`sql_vocab_coverage`) hashes
    identically.

    -> pa.Table (permille, vocab_needed, cum_tf)."""
    vd = vocab_df(ds, id_col=id_col, text_col=text_col)

    def partial(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, cnt = np.unique(tf, return_counts=True)
        return pa.table({"tfv": pa.array(uniq, pa.int64()),
                         "n_at": pa.array(cnt, pa.int64())})

    import ray

    dist: dict[int, int] = {}
    for p in ray.get(vd.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True).to_arrow_refs()):
        if not isinstance(p, pa.Table):
            p = pa.Table.from_pandas(p, preserve_index=False)
        if p.num_rows == 0:
            continue
        for v, c in zip(p.column("tfv").to_pylist(),
                        p.column("n_at").to_pylist()):
            dist[v] = dist.get(v, 0) + c
        if len(dist) > _TFDIST_CAP:
            raise ValueError(
                f"tf-distribution exceeds {_TFDIST_CAP} distinct values")
    n_total = sum(v * c for v, c in dist.items())
    out_p, out_k, out_c = [], [], []
    if n_total:
        runs = sorted(dist.items(), reverse=True)    # tf DESC
        for p_mille in sorted(permilles):
            need = -(-p_mille * n_total // 1000)     # ceil
            rank = cum = 0
            for v, c in runs:
                if cum + v * c >= need:
                    took = -(-(need - cum) // v)     # ceil
                    rank += took
                    cum += took * v
                    break
                rank += c
                cum += v * c
            out_p.append(p_mille)
            out_k.append(rank)
            out_c.append(cum)
    return pa.table({"permille": pa.array(out_p, pa.int64()),
                     "vocab_needed": pa.array(out_k, pa.int64()),
                     "cum_tf": pa.array(out_c, pa.int64())})


def sql_vocab_coverage(permilles=(500, 900, 950, 990),
                       text_col: str = "text",
                       rel: str = "documents") -> str:
    """DuckDB mirror of :func:`vocab_coverage` via an explicit ranked
    window sum (cum is strictly increasing, so the crossing row is
    ``min(r)`` / ``min(cum)`` among qualifying rows)."""
    vals = ", ".join(f"({int(p)})" for p in sorted(permilles))
    return f"""
        WITH tf AS (
            SELECT token, count(*)::BIGINT AS tf
            FROM (SELECT unnest(string_split(coalesce({text_col}, ''),
                                             ' ')) AS token
                  FROM {rel})
            GROUP BY token),
        ranked AS (
            SELECT row_number() OVER
                       (ORDER BY tf DESC, token ASC) AS r,
                   sum(tf) OVER (ORDER BY tf DESC, token ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum
            FROM tf),
        n AS (SELECT sum(tf) AS n FROM tf)
        SELECT p.permille::BIGINT AS permille,
               min(ranked.r)::BIGINT AS vocab_needed,
               min(ranked.cum)::BIGINT AS cum_tf
        FROM (VALUES {vals}) p(permille), ranked, n
        WHERE ranked.cum * 1000 >= p.permille * n.n
        GROUP BY p.permille
    """


def unigram_lm_score(ds, vocab_size: int = 500,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-trained unigram log-frequency score — the cheap
    KenLM-stand-in quality signal: documents made of common words
    score high, gibberish/junk scores low.

    Each in-vocabulary token occurrence contributes the exact INTEGER
    ``bit_length(tf(token))`` (= floor(log2 tf) + 1, the log-frequency
    bucket; no float logs, so the DuckDB ``length(bin(tf))`` mirror is
    bit-identical); OOV tokens contribute 0. Reported per doc:
    ``lm_score`` (the sum), ``n_tokens``, and the integer per-token
    mean ``lm_permille = lm_score * 1000 // n_tokens``.

    Same two-pass shape as :func:`oov_rate`: one vocab-scale shuffle
    cut to the top-``vocab_size`` by (tf DESC, token ASC), broadcast;
    then one vectorized scoring pass (``index_in`` gather + per-doc
    segment sum). Training and scoring both stream."""
    vocab = (vocab_df(ds, id_col=id_col, text_col=text_col)
             .sort(["tf", "token"], descending=[True, False])
             .limit(vocab_size)
             .take_all())
    keep = pa.array([r["token"] for r in vocab], pa.string())
    tf = np.array([r["tf"] for r in vocab], dtype=np.int64)
    # exact bit_length via frexp (values < 2^53): no float-log rounding
    _, e = np.frexp(np.maximum(tf, 1).astype(np.float64))
    buckets = np.concatenate([e.astype(np.int64), [0]])  # [-1] = OOV

    def f(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        idx = pc.index_in(flat, value_set=keep) \
            .to_numpy(zero_copy_only=False, writable=True)
        w = buckets[np.nan_to_num(idx, nan=-1).astype(np.int64)]
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        score = np.bincount(doc_idx, weights=w,
                            minlength=len(counts)).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(counts, pa.int64()),
            "lm_score": pa.array(score, pa.int64()),
            "lm_permille": pa.array(score * 1000 // counts, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True)


def sql_unigram_lm_score(vocab_size: int = 500, id_col: str = "doc_id",
                         text_col: str = "text",
                         rel: str = "documents") -> str:
    """DuckDB mirror of :func:`unigram_lm_score` (same top-K tiebreak,
    ``length(bin(tf))`` == bit_length)."""
    return f"""
        WITH toks AS (
            SELECT {id_col},
                   unnest(string_split({text_col}, ' ')) AS token
            FROM {rel}),
        vocab AS (
            SELECT token, length(bin(tf))::BIGINT AS bucket FROM (
                SELECT token, count(*) AS tf FROM toks GROUP BY token
                ORDER BY tf DESC, token ASC LIMIT {vocab_size})),
        sc AS (
            SELECT t.{id_col},
                   count(*)::BIGINT AS n_tokens,
                   CAST(sum(coalesce(v.bucket, 0)) AS BIGINT) AS lm_score
            FROM toks t LEFT JOIN vocab v USING (token)
            GROUP BY t.{id_col})
        SELECT {id_col}, n_tokens, lm_score,
               lm_score * 1000 // n_tokens AS lm_permille
        FROM sc
    """


def doc_keywords(ds, k: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Per-document top-``k`` TF-IDF keywords (topic tagging /
    salient-term extraction), integer-exact on both backends: the
    score is ``tf_doc(token) * bit_length(N // df(token))`` — the
    float-free IDF surrogate (monotone in log2(N/df); stopwords with
    df ~ N get weight 1) — with ties broken token ASC.

    100-TB shape, three bounded exchanges and no broadcast cap:
    (1) per-batch vectorized (doc, token, tf) pairs (docs are
    row-contained, so in-batch counts are globally exact); (2) df via
    per-batch token partials -> one groupby-sum at |batch vocab| *
    n_batches rows (the pairs themselves don't reshuffle); (3) a hash
    join pairs x idf — both sides streams, no driver state — then one
    groupby(doc) whose groups are bounded by document vocabulary (no
    hot key possible).  -> Dataset[(id_col, token, score)].
    """
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import join_datasets

    n_docs = ds.count()
    if n_docs == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "score": pa.array([], pa.int64())}))

    def pairs(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        if len(flat) == 0:
            return pa.table({
                id_col: pa.array([], t.column(id_col).type),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = enc.dictionary
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        key = doc_idx * len(vocab) + codes
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            id_col: t.column(id_col).take(pa.array(uniq // len(vocab))),
            "token": vocab.take(pa.array(uniq % len(vocab))),
            "tf": pa.array(cnt, pa.int64())})

    dt = ds.map_batches(pairs, batch_format="pyarrow",
                        zero_copy_batch=True)

    def df_partial(t: pa.Table) -> pa.Table:
        # dt rows are globally distinct (doc, token) pairs, so a row
        # count per token is an exact df partial under ANY re-batching
        g = (pa.table({"token": t.column("token")})
             .group_by(["token"]).aggregate([([], "count_all")]))
        return pa.table({
            "token": g.column("token"),
            "df_p": pc.cast(g.column("count_all"), pa.int64())})

    dfa = (dt.map_batches(df_partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("df_p", alias_name="df")))

    def idf_of(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "df" not in t.column_names:
            return pa.table({"token": pa.array([], pa.string()),
                             "idf_b": pa.array([], pa.int64())})
        dfv = t.column("df").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _, e = np.frexp(np.maximum(n_docs // dfv, 1).astype(np.float64))
        return pa.table({"token": t.column("token"),
                         "idf_b": pa.array(e.astype(np.int64),
                                           pa.int64())})

    idf = dfa.map_batches(idf_of, batch_format="pyarrow")
    joined = join_datasets(dt, idf, on="token", scrub_left=False)

    def topk(df):
        df = df.assign(score=df["tf"] * df["idf_b"]) \
            .sort_values(["score", "token"], ascending=[False, True],
                         kind="mergesort").head(k)
        return df[[id_col, "token", "score"]]

    return joined.groupby(id_col).map_groups(topk,
                                             batch_format="pandas")


def sql_doc_keywords(k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text",
                     rel: str = "documents") -> str:
    """DuckDB mirror of :func:`doc_keywords` (``length(bin(x))`` ==
    bit_length; same DESC/ASC tiebreak)."""
    return f"""
        WITH toks AS (
            SELECT {id_col},
                   unnest(string_split(coalesce({text_col}, ''), ' '))
                       AS token
            FROM {rel}),
        dt AS (SELECT {id_col}, token, count(*)::BIGINT AS tf
               FROM toks GROUP BY {id_col}, token),
        dfq AS (SELECT token, count(*)::BIGINT AS df
                FROM dt GROUP BY token),
        n AS (SELECT count(*)::BIGINT AS n FROM {rel}),
        sc AS (SELECT dt.{id_col}, dt.token,
                      dt.tf * length(bin(n.n // dfq.df))::BIGINT
                          AS score
               FROM dt JOIN dfq USING (token), n)
        SELECT {id_col}, token, score FROM (
            SELECT {id_col}, token, score,
                   row_number() OVER (PARTITION BY {id_col}
                                      ORDER BY score DESC, token ASC)
                       AS rn
            FROM sc)
        WHERE rn <= {int(k)}
    """


def dup_ngram_spans(ds, n: int = 8, min_docs: int = 2,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Cross-document duplicated n-gram spans: (gram, n_docs) for every
    token n-gram that occurs in >= ``min_docs`` DISTINCT documents —
    the evidence table an ExactSubstr-style cross-doc deduplicator
    consumes (repeated boilerplate/spans shared across pages).

    Exactness at scale: each document lives wholly in one row, so the
    per-batch distinct (gram, doc) pairs are GLOBALLY distinct; a
    per-batch count per gram is an exact partial, and one
    gram-keyed groupby-sum finishes it. The shuffle carries one row
    per (gram, batch), not one per occurrence.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ids, grams = batch_token_ngrams(t, n, id_col, text_col)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "nd_p": pa.array([], pa.int64())})
        # distinct (gram, doc) pairs, then docs-per-gram, in one arrow
        # C++ two-key hash aggregate (no per-row python)
        pairs = pa.table({"gram": grams, "d": ids}) \
            .group_by(["gram", "d"]).aggregate([])
        per_gram = pairs.group_by(["gram"]).aggregate([("d", "count")])
        return pa.table({
            "gram": per_gram.column("gram"),
            "nd_p": pc.cast(per_gram.column("d_count"), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("gram").aggregate(Sum("nd_p", alias_name="n_docs")))
    out = agg.map_batches(
        lambda t: pa.table({"gram": t.column("gram"),
                            "n_docs": pc.cast(t.column("n_docs"),
                                              pa.int64())}),
        batch_format="pyarrow")
    if min_docs > 1:
        out = out.filter(expr=f"n_docs >= {min_docs}")
    return out


def sql_dup_ngram_spans(n: int = 8, min_docs: int = 2,
                        table: str = "documents") -> str:
    """DuckDB oracle for :func:`dup_ngram_spans` (list-slice n-grams)."""
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM {table}
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(l) - {n - 1}),
                    i -> array_to_string(l[i:i + {n - 1}], ' '))) AS gram
      FROM toks WHERE len(l) >= {n}
    )
    SELECT gram, count(DISTINCT doc_id)::BIGINT AS n_docs
    FROM grams GROUP BY gram
    HAVING count(DISTINCT doc_id) >= {min_docs}
    """


def repetition_scores(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style within-document repetition evidence, per doc:

    - ``n_tokens`` / ``n_distinct_tokens`` and ``top_token_count``
      (count of the most frequent token) — the "top word fraction"
      numerators/denominators,
    - ``n_2grams`` / ``n_distinct_2grams`` and ``n_3grams`` /
      ``n_distinct_3grams`` — duplicate-n-gram-fraction evidence.

    All columns are exact integers (the oracle compares counts, never
    float ratios); callers derive fractions downstream.  One
    ``map_batches`` pass, no shuffle: every document lives wholly in
    its row, so per-batch dictionary-encode + unique-pair counting is
    globally exact.
    """

    def stats(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        ndocs = t.num_rows
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        out = {id_col: t.column(id_col),
               "n_tokens": pa.array(counts, pa.int64())}

        def distinct_and_top(ids_np, vals, want_top: bool):
            """per-doc distinct count (and max multiplicity) of vals."""
            enc = pc.dictionary_encode(vals)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            nv = max(1, len(enc.dictionary))
            pairs, pair_counts = np.unique(ids_np * nv + codes,
                                           return_counts=True)
            docs_of_pair = pairs // nv
            distinct = np.bincount(docs_of_pair, minlength=ndocs)
            if not want_top:
                return distinct, None
            top = np.zeros(ndocs, dtype=np.int64)
            np.maximum.at(top, docs_of_pair, pair_counts)
            return distinct, top

        d1, top = distinct_and_top(doc_idx, flat, True)
        out["n_distinct_tokens"] = pa.array(d1, pa.int64())
        out["top_token_count"] = pa.array(top, pa.int64())
        for n in (2, 3):
            gids, grams = _batch_ngram_positions(t, n, text_col)
            total = np.bincount(gids, minlength=ndocs)
            if len(grams):
                dn, _ = distinct_and_top(gids, grams, False)
            else:
                dn = np.zeros(ndocs, dtype=np.int64)
            out[f"n_{n}grams"] = pa.array(total, pa.int64())
            out[f"n_distinct_{n}grams"] = pa.array(dn, pa.int64())
        return pa.table(out)

    return ds.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True)


class BpeishTokenCounter:
    """Token counting with a BPE-ish regex (actor-pool stage: the
    pattern — a stand-in for a real tokenizer load — is staged once per
    actor). Arrow RE2 kernel, zero pandas conversion; the pattern's
    alternatives cover disjoint character classes so RE2
    leftmost-longest == Python leftmost-first == the oracle's
    regexp_extract_all pattern."""

    def __init__(self) -> None:
        self.pat = BPE_PATTERN

    def __call__(self, t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"), pattern=self.pat)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bpe_tokens": pc.fill_null(n.cast(pa.int64()), 0),
        })


def bpe_token_counts(ds, concurrency=(1, 4)):
    return ds.map_batches(BpeishTokenCounter, batch_format="pyarrow",
                          batch_size=1024, concurrency=concurrency,
                          zero_copy_batch=True)


def lang_id(ds, keep_cols: tuple[str, ...] = ()):
    """Stopword-count language ID over space-split lowercase tokens.

    Vectorized: one is_in per language over the flat token array, then
    a segmented sum per doc. Prediction = alphabetically-first language
    with the max score when positive, else 'und' — mirrored by the
    CASE chain in the SQL oracle. ``keep_cols`` pass through unchanged
    (e.g. the declared lang for a confusion matrix)."""
    langs = sorted(_STOPWORDS)
    stop_arrs = {lg: pa.array(sorted(_STOPWORDS[lg]), pa.string())
                 for lg in langs}

    def f(t: pa.Table) -> pa.Table:
        flat, counts, starts = _tokens_of(pc.utf8_lower(t.column("text")))
        n_docs = len(counts)
        scores = np.zeros((n_docs, len(langs)), dtype=np.int64)
        for li, lg in enumerate(langs):
            hits = pc.is_in(flat, value_set=stop_arrs[lg]) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            if n_docs:
                scores[:, li] = np.add.reduceat(hits, starts)
        best = np.argmax(scores, axis=1)  # first max wins (alphabetical)
        top = scores[np.arange(n_docs), best] if n_docs else best
        pred = np.where(top > 0, np.array(langs, dtype=object)[best], "und")
        out = pa.table({"doc_id": t.column("doc_id"),
                        "pred_lang": pa.array(pred, pa.string())})
        for c in keep_cols:
            out = out.append_column(c, t.column(c))
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(ds):
    """Length / punctuation / stopword-ratio quality signals.

    All Arrow/numpy; every expression is reproduced operation-for-
    operation in the SQL oracle (same IEEE double evaluation order),
    so values compare exactly without rounding."""
    en_stop = pa.array(sorted(_STOPWORDS["en"]), pa.string())

    def f(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_spaces = pc.count_substring(text, pattern=" ") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_tokens = n_spaces + (n_chars > 0)
        stripped = pc.utf8_length(pc.replace_substring_regex(
            text, pattern=PUNCT_STRIP_PATTERN, replacement="")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_punct = n_chars - stripped

        flat, counts, starts = _tokens_of(pc.utf8_lower(text))
        hits = pc.is_in(flat, value_set=en_stop) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_stop = (np.add.reduceat(hits, starts) if len(counts)
                  else np.zeros(0, np.int64))

        denom_c = np.maximum(n_chars, 1)
        denom_t = np.maximum(n_tokens, 1)
        punct_ratio = n_punct / denom_c
        stopword_ratio = n_stop / denom_t
        mean_tok_len = (n_chars - n_spaces) / denom_t
        quality = (
            (np.minimum(n_tokens, 200) / 200.0) * 0.4
            + (1.0 - np.minimum(punct_ratio, 1.0)) * 0.2
            + np.minimum(stopword_ratio, 0.5) * 2.0 * 0.2
            + (1.0 - np.minimum(np.abs(mean_tok_len - 5.0), 5.0) / 5.0) * 0.2
        )
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
            "stopword_ratio": pa.array(stopword_ratio, pa.float64()),
            "quality": pa.array(quality, pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _doc_fingerprints(h1: np.ndarray, counts: np.ndarray,
                      starts: np.ndarray) -> np.ndarray:
    """Horner fingerprint per doc, vectorized across docs.

    fp = sum_i h_i * FP_BASE^(n-1-i) mod FP_MOD == sequential Horner.
    Per-term mod keeps every intermediate < 2^63."""
    if len(counts) == 0:
        return np.zeros(0, dtype=np.int64)
    maxn = int(counts.max())
    pows = np.ones(max(maxn, 1), dtype=np.uint64)
    for i in range(1, maxn):
        pows[i] = (pows[i - 1] * np.uint64(FP_BASE)) % np.uint64(FP_MOD)
    ends = starts + counts
    expo = np.repeat(ends, counts) - 1 - np.arange(len(h1), dtype=np.int64)
    contrib = ((h1 % np.uint64(FP_MOD)) * pows[expo]) % np.uint64(FP_MOD)
    sums = np.add.reduceat(contrib, starts) % np.uint64(FP_MOD)
    sums[counts == 0] = 0  # defensive; split always yields >=1 token
    return sums.astype(np.int64)


def fingerprints(ds):
    """Deterministic rolling-hash document fingerprint (content id)."""

    def f(t: pa.Table) -> pa.Table:
        flat, counts, starts = _tokens_of(t.column("text"))
        h1 = hash_tokens(flat, H1_BASE, H1_MOD)
        fp = _doc_fingerprints(h1, counts, starts)
        return pa.table({"doc_id": t.column("doc_id"),
                         "fingerprint": pa.array(fp, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _majority_bits(h: np.ndarray, counts: np.ndarray,
                   starts: np.ndarray) -> np.ndarray:
    """32-bit majority vote per doc over a token-hash array (int64).

    Bit b is set iff strictly more than half the doc's tokens have bit
    b set (ties -> 0), matching the SQL list_filter count mirror."""
    out = np.zeros(len(counts), dtype=np.int64)
    if len(counts) == 0 or len(h) == 0:
        return out
    for b in range(32):
        bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bit, starts)
        out |= ((ones * 2 > counts).astype(np.int64)) << b
    return out


def simhash64(ds):
    """64-bit SimHash as two 32-bit halves (simhash_lo from h1 votes,
    simhash_hi from h2 votes) — near-dup signature."""

    def f(t: pa.Table) -> pa.Table:
        flat, counts, starts = _tokens_of(t.column("text"))
        lo = _majority_bits(hash_tokens(flat, H1_BASE, H1_MOD), counts, starts)
        hi = _majority_bits(hash_tokens(flat, H2_BASE, H2_MOD), counts, starts)
        return pa.table({"doc_id": t.column("doc_id"),
                         "simhash_lo": pa.array(lo, pa.int64()),
                         "simhash_hi": pa.array(hi, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SQL mirrors (used by __ray_entry__.oracle_sql; generated, not typed)
# ---------------------------------------------------------------------------

def sql_token_hash_expr(token_var: str, base: int, mod: int) -> str:
    """DuckDB expression: rolling codepoint hash of one token string.

    The inner list_filter drops the [''] artifact of splitting an
    empty token (DuckDB's unicode('') is -1, not 0), so empty tokens
    hash to 0 exactly like the numpy kernel."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(list_filter(string_split({token_var}, ''), "
        f"c -> c <> ''), "
        f"c -> unicode(c)::BIGINT)), "
        f"(a, b) -> ((a::HUGEINT * {base} + b) % {mod})::BIGINT)"
    )


def sql_token_hash_list(text_col: str, base: int, mod: int) -> str:
    """DuckDB expression: list of token hashes for a text column."""
    inner = sql_token_hash_expr("w", base, mod)
    return (f"list_transform(string_split({text_col}, ' '), w -> {inner})")


def sql_fingerprint_expr(hs_var: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, {hs_var}), "
        f"(a, b) -> ((a::HUGEINT * {FP_BASE} + b) % {FP_MOD})::BIGINT)"
    )


def sql_majority_expr(hs_var: str) -> str:
    """DuckDB expression: 32-bit majority-vote value over a hash list."""
    terms = [
        f"(CASE WHEN len(list_filter({hs_var}, "
        f"h -> ((h >> {b}) & 1) = 1)) * 2 > len({hs_var}) "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(32)
    ]
    return "(" + "\n + ".join(terms) + ")::BIGINT"


def sql_stopword_count(text_col: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))
    return (f"len(list_filter(string_split(lower({text_col}), ' '), "
            f"w -> w IN ({words})))")


_WINNOW_POS_CAP = 1 << 20


def winnow_fingerprints(ds, k: int = 4, w: int = 5,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS scheme): hash every token ``k``-gram, then
    in each window of ``w`` consecutive gram hashes select the MINIMUM,
    breaking ties by RIGHTMOST position.  Guarantees at least one
    fingerprint per window (unlike 0-mod-p sampling) while selecting
    ~2/(w+1) of all grams — the standard near-dup sketch when position
    coverage matters.  Returns Dataset(id_col, n_fp, fp_sum): the count
    of selected (distinct) positions and the int64 sum of their gram
    hashes; docs with fewer than ``k + w - 1`` tokens (no full window)
    are absent.

    Exact-integer contract: gram hash = the pinned rolling codepoint
    hash (H1_BASE/H1_MOD, < 2^32); the rightmost-min tie-break is
    encoded in one composite int64 key ``h * 2^20 + (2^20 - 1 - pos)``
    whose per-window MIN selects (min h, max pos) — the identical key
    the SQL mirror (:func:`sql_winnow_fingerprints`) minimizes, so the
    selected sets are value-identical.  Documents above 2^20 grams
    would corrupt the tie-break and raise (structural guard; split
    such docs upstream with functions/chunking).

    Scale shape: ONE stateless map_batches pass, no shuffle — each
    document lives wholly in its row, the sliding-window min is a
    vectorized stride-trick view masked at doc boundaries, and the
    per-doc aggregation is two bincounts.
    """

    def fp(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], t.column(id_col).type),
                          "n_fp": pa.array([], pa.int64()),
                          "fp_sum": pa.array([], pa.int64())})
        row_idx, grams = _batch_ngram_positions(t, k, text_col)
        n = len(grams)
        if n < w:
            return empty
        h = hash_tokens(grams, H1_BASE, H1_MOD).astype(np.int64)
        # 1-based gram position WITHIN its doc (pinned to the SQL
        # mirror's generate_series(1, ...))
        new_doc = np.flatnonzero(np.diff(row_idx)) + 1
        run_start = np.zeros(n, dtype=np.int64)
        run_start[new_doc] = new_doc
        np.maximum.accumulate(run_start, out=run_start)
        pos1 = np.arange(n, dtype=np.int64) - run_start + 1
        if pos1.max() >= _WINNOW_POS_CAP:
            raise ValueError(
                f"winnow_fingerprints: a document has >= "
                f"{_WINNOW_POS_CAP} {k}-grams; the composite rightmost-"
                f"min key needs pos < 2^20 — chunk the document first")
        key = h * _WINNOW_POS_CAP + (_WINNOW_POS_CAP - 1 - pos1)
        swv = np.lib.stride_tricks.sliding_window_view(key, w)
        mins = swv.min(axis=1)
        # window starting at flat i is a real window iff its last gram
        # is still in the same document
        valid = row_idx[: n - w + 1] == row_idx[w - 1:]
        mins = mins[valid]
        docs = row_idx[: n - w + 1][valid]
        if len(mins) == 0:
            return empty
        # distinct (doc, selected key): the key embeds the position,
        # so distinct keys == distinct selected positions
        order = np.lexsort((mins, docs))
        docs, mins = docs[order], mins[order]
        keep = np.ones(len(mins), dtype=bool)
        keep[1:] = (docs[1:] != docs[:-1]) | (mins[1:] != mins[:-1])
        docs, mins = docs[keep], mins[keep]
        sel_h = mins // _WINNOW_POS_CAP
        n_fp = np.bincount(docs, minlength=t.num_rows).astype(np.int64)
        fp_sum = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(fp_sum, docs, sel_h)
        m = n_fp > 0
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(m)),
            "n_fp": pa.array(n_fp[m], pa.int64()),
            "fp_sum": pa.array(fp_sum[m], pa.int64())})

    return ds.map_batches(fp, batch_format="pyarrow")


def sql_winnow_fingerprints(k: int = 4, w: int = 5,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            table: str = "documents") -> str:
    """DuckDB oracle for :func:`winnow_fingerprints`: positions via
    generate_series, the identical composite key, per-window MIN as a
    window function, DISTINCT selected keys, then the per-doc count +
    hash sum."""
    gram_hash = sql_token_hash_expr("gram", H1_BASE, H1_MOD)
    cap = _WINNOW_POS_CAP
    return f"""
    WITH __toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {table}
    ), __grams AS (
      SELECT {id_col}, pos,
             array_to_string(l[pos:pos + {k - 1}], ' ') AS gram
      FROM (SELECT {id_col}, l,
                   unnest(generate_series(1, len(l) - {k - 1})) AS pos
            FROM __toks WHERE len(l) >= {k}) __g
    ), __keyed AS (
      SELECT {id_col}, pos,
             ({gram_hash}) * {cap} + ({cap} - 1 - pos) AS key
      FROM __grams
    ), __wmin AS (
      SELECT {id_col},
             min(key) OVER (PARTITION BY {id_col} ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {w - 1} FOLLOWING) AS mk,
             pos,
             count(*) OVER (PARTITION BY {id_col}) AS cnt
      FROM __keyed
    ), __sel AS (
      SELECT DISTINCT {id_col}, mk
      FROM __wmin WHERE pos <= cnt - {w - 1}
    )
    SELECT {id_col}, count(*)::BIGINT AS n_fp,
           SUM(mk // {cap})::BIGINT AS fp_sum
    FROM __sel GROUP BY {id_col}
    """


def top_terms_by_group(ds, k: int = 5, group_col: str = "lang",
                       text_col: str = "text"):
    """Per-group top-``k`` tokens by count (the per-language
    vocabulary report): returns a driver-sized pa.Table(group, token,
    c, rank) with rank 1..k per group under the pinned total order
    (count DESC, token ASC) — ties at the cutoff are unambiguous on
    both engines.

    Scale shape: per-batch (group, token) partial counts (one
    composite dictionary-encode + bincount, no Python loop) feed ONE
    composite-key groupby sum; after that exact aggregation every
    (group, token) appears exactly once, so a per-batch top-k cut is
    a SOUND superset filter (k rows per group per batch) and the
    driver merge handles at most k x groups x blocks rows — never the
    vocabulary.  The multi-key groupby is avoided per the house rule:
    the shuffle key is the joined (group, token) string.
    """
    from ray.data.aggregate import Sum

    _S = "\x1f"

    def partials(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column(text_col))
        if len(flat) == 0:
            return pa.table({"__k": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        grp = pc.cast(t.column(group_col), pa.string()).combine_chunks()
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        key = pc.binary_join_element_wise(
            pc.take(grp, pa.array(doc_idx)), flat, _S)
        enc = pc.dictionary_encode(key.combine_chunks()
                                   if isinstance(key, pa.ChunkedArray)
                                   else key)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        c = np.bincount(codes,
                        minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"__k": enc.dictionary,
                         "c": pa.array(c, pa.int64())})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("__k").aggregate(Sum("c", alias_name="c")))

    def batch_topk(t: pa.Table) -> pa.Table:
        key = t.column("__k").combine_chunks() \
            if isinstance(t.column("__k"), pa.ChunkedArray) \
            else t.column("__k")
        split = pc.split_pattern(key, _S)
        g = pc.list_element(split, 0).to_numpy(zero_copy_only=False)
        tok = pc.list_element(split, 1).to_numpy(zero_copy_only=False)
        c = pc.cast(t.column("c"), pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((tok, -c, g))      # g asc, c desc, tok asc
        g, tok, c = g[order], tok[order], c[order]
        new_g = np.ones(len(g), dtype=bool)
        new_g[1:] = g[1:] != g[:-1]
        run_start = np.zeros(len(g), dtype=np.int64)
        idx = np.flatnonzero(new_g)
        run_start[idx] = idx
        np.maximum.accumulate(run_start, out=run_start)
        rank = np.arange(len(g), dtype=np.int64) - run_start + 1
        m = rank <= k
        return pa.table({"group": pa.array(g[m]),
                         "token": pa.array(tok[m]),
                         "c": pa.array(c[m], pa.int64())})

    cut = agg.map_batches(batch_topk, batch_format="pyarrow")
    rows = cut.take_all()
    if not rows:
        return pa.table({group_col: pa.array([], pa.string()),
                         "token": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    rows.sort(key=lambda r: (r["group"], -r["c"], r["token"]))
    out_g, out_t, out_c, out_r = [], [], [], []
    prev, rnk = None, 0
    for r in rows:
        rnk = rnk + 1 if r["group"] == prev else 1
        prev = r["group"]
        if rnk <= k:
            out_g.append(r["group"])
            out_t.append(r["token"])
            out_c.append(r["c"])
            out_r.append(rnk)
    return pa.table({group_col: pa.array(out_g, pa.string()),
                     "token": pa.array(out_t, pa.string()),
                     "c": pa.array(out_c, pa.int64()),
                     "rank": pa.array(out_r, pa.int64())})


def sql_top_terms_by_group(k: int = 5, group_col: str = "lang",
                           text_col: str = "text",
                           table: str = "documents") -> str:
    """DuckDB oracle for :func:`top_terms_by_group`: window row_number
    under the identical (count DESC, token ASC) order."""
    return f"""
    WITH __t AS (
      SELECT {group_col}, unnest(string_split({text_col}, ' ')) AS token
      FROM {table}
    ), __c AS (
      SELECT {group_col}, token, COUNT(*)::BIGINT AS c
      FROM __t GROUP BY {group_col}, token
    ), __r AS (
      SELECT {group_col}, token, c,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY c DESC, token) AS rnk
      FROM __c
    )
    SELECT {group_col}, token, c, rnk::BIGINT AS rank
    FROM __r WHERE rnk <= {k}
    """
