"""Distributed BPE merge learning over the corpus vocabulary.

Learns the first N byte-pair-encoding merges (Sennrich et al. 2016,
the standard subword-tokenizer training step) from a document corpus:
aggregate the corpus into a (token, freq) vocabulary ONCE (the same
partial-agg shuffle as textstats.vocab_df — the shuffle moves batch
vocabularies, not tokens), then iterate: count adjacent symbol pairs
weighted by word frequency, take the best pair, merge it everywhere.

Cross-engine exactness pins two conventions explicitly:

- Tie-break: best pair = max by (count DESC, left ASC, right ASC).
- Merge application: leftmost non-overlapping `replace` on the
  space-joined, space-sentineled symbol string, ITERATED TO FIXPOINT.
  For left != right one pass is already the classic greedy merge; for
  self-adjacent pairs (x,x) over odd runs the fixpoint differs from
  single-pass greedy in WHERE it leaves the unpaired symbol, so both
  engines (Python str.replace here, SQL replace() in the oracle's
  recursive CTE) use the identical iterated rule.

Scale shape: the vocabulary table is the aggregated small side. Below
``driver_cap`` distinct tokens the merge loop runs on the driver over
the pulled vocabulary (zero further Dataset executions — the
dedup.ngram_prefix_bands pattern); above it, a documented distributed
loop keeps words as a Dataset and does one pair-count shuffle + one
top-1 sort per merge with the winning pair broadcast into a
vectorized-per-word apply. No path ever materializes the corpus.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow as pa

_M = "__pair"  # packed single groupby key (never multi-key aggregates)

OUT_SCHEMA = pa.schema([
    pa.field("rank", pa.int64()),
    pa.field("lhs", pa.string()),
    pa.field("rhs", pa.string()),
    pa.field("merged", pa.string()),
    pa.field("pair_count", pa.int64()),
])


def _sentinel(token: str) -> str:
    return " " + " ".join(token) + " "


def _fixpoint_replace(s: str, pat: str, rep: str) -> str:
    while True:
        u = s.replace(pat, rep)
        if u == s:
            return s
        s = u


def _merge_table(rows: list[tuple[str, str, int]]) -> pa.Table:
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "lhs": pa.array([r[0] for r in rows], pa.string()),
        "rhs": pa.array([r[1] for r in rows], pa.string()),
        "merged": pa.array([r[0] + r[1] for r in rows], pa.string()),
        "pair_count": pa.array([r[2] for r in rows], pa.int64()),
    })


def _train_driver(words: dict[str, int], n_merges: int):
    out = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for s, f in words.items():
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((a, b, c))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        nxt: dict[str, int] = defaultdict(int)
        for s, f in words.items():
            nxt[_fixpoint_replace(s, pat, rep)] += f
        words = nxt
    return out


def bpe_train(ds, n_merges: int = 8, text_col: str = "text",
              driver_cap: int = 2_000_000,
              force_distributed: bool = False) -> pa.Table:
    """-> the learned merge table (rank, lhs, rhs, merged, pair_count).

    ``ds`` is a documents Dataset with a space-separated ``text_col``
    (the repo's standard tokenization, shared with vocab_df and its
    q_doc_vocab oracle).
    """
    from ray.data.aggregate import Sum

    from k_gap_ray.functions.textstats import vocab_df

    vocab = vocab_df(ds, text_col=text_col).select_columns(
        ["token", "tf"]).materialize()
    if not force_distributed and vocab.count() <= driver_cap:
        words = {_sentinel(r["token"]): int(r["tf"])
                 for r in vocab.take_all()}
        return _merge_table(_train_driver(words, n_merges))

    # distributed path: words stay a Dataset; each merge costs one
    # pair-count shuffle and one k=1 top-k, with the winner broadcast
    def seed(t: pa.Table) -> pa.Table:
        return pa.table({
            "syms": pa.array([_sentinel(tok) for tok in
                              t.column("token").to_pylist()],
                             pa.string()),
            "freq": t.column("tf")})

    words_ds = vocab.map_batches(seed, batch_format="pyarrow")
    out = []
    for _ in range(n_merges):
        def partial(t: pa.Table) -> pa.Table:
            counts: Counter = Counter()
            for s, f in zip(t.column("syms").to_pylist(),
                            t.column("freq").to_pylist()):
                syms = s.split()
                for pair in zip(syms, syms[1:]):
                    counts[pair] += f
            ks = [f"{a} {b}" for a, b in counts]
            return pa.table({_M: pa.array(ks, pa.string()),
                             "c": pa.array(list(counts.values()),
                                           pa.int64())})

        agg = (words_ds.map_batches(partial, batch_format="pyarrow")
               .groupby(_M).aggregate(Sum("c", alias_name="c")))
        # top-1 by (count DESC, pair ASC): lexicographic pair order
        # equals (lhs, rhs) order because ' ' sorts below every
        # non-space symbol character
        top = agg.sort([_M], descending=[False]) \
                 .sort(["c"], descending=[True]).limit(1).take_all()
        if not top:
            break
        a, b = top[0][_M].split(" ", 1)
        c = int(top[0]["c"])
        out.append((a, b, c))
        pat, rep = f" {a} {b} ", f" {a}{b} "

        def apply(t: pa.Table, _pat=pat, _rep=rep) -> pa.Table:
            return pa.table({
                "syms": pa.array(
                    [_fixpoint_replace(s, _pat, _rep)
                     for s in t.column("syms").to_pylist()],
                    pa.string()),
                "freq": t.column("freq")})

        words_ds = words_ds.map_batches(
            apply, batch_format="pyarrow").materialize()
    return _merge_table(out)


def _sql_merge_ctes(n_merges: int, table: str, text_col: str) -> list:
    """The shared CTE chain: tok/w0 plus (p_i, b_i, w_i) per level.

    Every w level carries the originating ``token`` so a consumer can
    join the final segmentation back to documents (bpe ENCODE); the
    train oracle simply ignores the column. All levels MATERIALIZED —
    non-materialized CTEs inline once per reference and the recursive
    levels reference each other 3x (the chained-UPDATE-CTE lesson,
    BENCH/NOTES.md)."""
    ctes = [f"""tok AS MATERIALIZED (
        SELECT token, count(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split({text_col}, ' ')) AS token
              FROM {table})
        GROUP BY token),
    w0 AS MATERIALIZED (
        SELECT token,
               ' ' || array_to_string(string_split(token, ''), ' ')
               || ' ' AS syms, freq
        FROM tok)"""]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""p{i} AS MATERIALIZED (
        SELECT l[j] AS a, l[j + 1] AS b, SUM(freq)::BIGINT AS c
        FROM (SELECT string_split(trim(syms), ' ') AS l, freq
              FROM {prev} WHERE trim(syms) <> '') t,
             unnest(generate_series(1, len(l) - 1)) u(j)
        GROUP BY 1, 2),
    b{i} AS MATERIALIZED (
        SELECT a, b, c FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
    w{i} AS MATERIALIZED (
        SELECT token, syms, freq FROM (
            WITH RECURSIVE r(token, syms, freq) AS (
                SELECT token, syms, freq FROM {prev}
                UNION ALL
                SELECT r.token,
                       replace(r.syms, ' ' || b.a || ' ' || b.b || ' ',
                               ' ' || b.a || b.b || ' '), r.freq
                FROM r, b{i} b
                WHERE replace(r.syms, ' ' || b.a || ' ' || b.b || ' ',
                              ' ' || b.a || b.b || ' ') <> r.syms
            )
            SELECT r.token, r.syms, r.freq FROM r, b{i} b
            WHERE replace(r.syms, ' ' || b.a || ' ' || b.b || ' ',
                          ' ' || b.a || b.b || ' ') = r.syms))""")
    return ctes


def _apply_merges(token: str, merges: list) -> int:
    """Subword count of one token under the learned merges (applied
    in rank order, each to fixpoint — identical to what the training
    loop did to the word, since the per-word transform is independent
    of the rest of the vocabulary)."""
    s = _sentinel(token)
    for a, b, _ in merges:
        s = _fixpoint_replace(s, f" {a} {b} ", f" {a}{b} ")
    return len(s.split())


def bpe_encode(ds, n_merges: int = 8, text_col: str = "text",
               id_col: str = "doc_id", driver_cap: int = 2_000_000,
               force_distributed: bool = False):
    """-> Dataset[(id_col, n_subwords, n_tokens)]: per-document
    subword counts under the corpus-learned BPE merges (train +
    apply in one pass over the vocabulary — the downstream 'token
    count with a learned tokenizer' statistic).

    Documents with no non-empty tokens emit nothing (mirrors the
    oracle's join). Below ``driver_cap`` the token->subword-count map
    broadcasts and the corpus pass is one vectorized-per-doc lookup;
    above it the segmented vocabulary stays a Dataset and the corpus
    explodes into (doc, token) for a hash join + per-doc sum — the
    honest path when the vocabulary itself outgrows a worker.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from k_gap_ray.functions.textstats import vocab_df

    vocab = vocab_df(ds, text_col=text_col).select_columns(
        ["token", "tf"]).materialize()
    if not force_distributed and vocab.count() <= driver_cap:
        toks = {r["token"]: int(r["tf"]) for r in vocab.take_all()}
        words: dict[str, int] = defaultdict(int)
        for tkn, f in toks.items():
            words[_sentinel(tkn)] += f
        merges = _train_driver(dict(words), n_merges)
        nsub = {tkn: _apply_merges(tkn, merges) for tkn in toks
                if tkn != ""}
        ref = ray.put(nsub)

        def count(t: pa.Table, _ref=ref) -> pa.Table:
            m = ray.get(_ref)
            ids, ns, nt = [], [], []
            for did, tx in zip(t.column(id_col).to_pylist(),
                               t.column(text_col).to_pylist()):
                tokens = [x for x in tx.split(" ") if x]
                if not tokens:
                    continue
                ids.append(did)
                ns.append(sum(m[x] for x in tokens))
                nt.append(len(tokens))
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "n_subwords": pa.array(ns, pa.int64()),
                             "n_tokens": pa.array(nt, pa.int64())})

        return ds.map_batches(count, batch_format="pyarrow")

    # above-cap path: train distributedly (token carried through),
    # then join the exploded corpus to the segmented vocabulary
    from k_gap_ray.dsutil import join_datasets

    def seed(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pylist()
        return pa.table({
            "token": t.column("token"),
            "syms": pa.array([_sentinel(tok) for tok in toks],
                             pa.string()),
            "freq": t.column("tf")})

    words_ds = vocab.map_batches(seed, batch_format="pyarrow")
    for _ in range(n_merges):
        def partial(t: pa.Table) -> pa.Table:
            counts: Counter = Counter()
            for s, f in zip(t.column("syms").to_pylist(),
                            t.column("freq").to_pylist()):
                syms = s.split()
                for pair in zip(syms, syms[1:]):
                    counts[pair] += f
            return pa.table({_M: pa.array([f"{a} {b}" for a, b in
                                           counts], pa.string()),
                             "c": pa.array(list(counts.values()),
                                           pa.int64())})

        from ray.data.aggregate import Sum as _Sum

        agg = (words_ds.map_batches(partial, batch_format="pyarrow")
               .groupby(_M).aggregate(_Sum("c", alias_name="c")))
        top = agg.sort([_M], descending=[False]) \
                 .sort(["c"], descending=[True]).limit(1).take_all()
        if not top:
            break
        a, b = top[0][_M].split(" ", 1)
        pat, rep = f" {a} {b} ", f" {a}{b} "

        def apply(t: pa.Table, _pat=pat, _rep=rep) -> pa.Table:
            return pa.table({
                "token": t.column("token"),
                "syms": pa.array(
                    [_fixpoint_replace(s, _pat, _rep)
                     for s in t.column("syms").to_pylist()],
                    pa.string()),
                "freq": t.column("freq")})

        words_ds = words_ds.map_batches(
            apply, batch_format="pyarrow").materialize()

    def subcounts(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pylist()
        syms = t.column("syms").to_pylist()
        keep = [i for i, tok in enumerate(toks) if tok != ""]
        return pa.table({
            "token": pa.array([toks[i] for i in keep], pa.string()),
            "n_sub": pa.array([len(syms[i].split()) for i in keep],
                              pa.int64())})

    subs = words_ds.map_batches(subcounts, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids, toks = [], []
        for did, tx in zip(t.column(id_col).to_pylist(),
                           t.column(text_col).to_pylist()):
            for x in tx.split(" "):
                if x:
                    ids.append(did)
                    toks.append(x)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    joined = join_datasets(exploded, subs, on="token",
                           scrub_left=False, scrub_right=False)
    return (joined.groupby(id_col)
            .aggregate(Sum("n_sub", alias_name="n_subwords"),
                       Count("n_sub", alias_name="n_tokens")))


def sql_bpe_train(n_merges: int = 8, table: str = "documents",
                  text_col: str = "text") -> str:
    """DuckDB oracle: the same N merges as chained MATERIALIZED CTE
    levels, each applying the winning pair with the identical
    fixpoint-replace recursion."""
    ctes = _sql_merge_ctes(n_merges, table, text_col)
    finals = [f"SELECT {i}::BIGINT AS rank, a AS lhs, b AS rhs,"
              f" a || b AS merged, c AS pair_count FROM b{i}"
              for i in range(1, n_merges + 1)]
    return ("WITH " + ",\n    ".join(ctes) + "\n"
            + "\nUNION ALL\n".join(finals))


def sql_bpe_encode(n_merges: int = 8, table: str = "documents",
                   text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`bpe_encode`: learn the same N merges,
    then join every document token to its final segmentation and sum
    subword counts per document."""
    ctes = _sql_merge_ctes(n_merges, table, text_col)
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT d.{id_col},
           SUM(len(string_split(trim(w.syms), ' ')))::BIGINT
               AS n_subwords,
           COUNT(*)::BIGINT AS n_tokens
    FROM (SELECT {id_col},
                 unnest(string_split({text_col}, ' ')) AS token
          FROM {table}) d
    JOIN w{n_merges} w USING (token)
    WHERE trim(w.syms) <> ''
    GROUP BY d.{id_col}""")
