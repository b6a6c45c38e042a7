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


def sql_bpe_train(n_merges: int = 8, table: str = "documents",
                  text_col: str = "text") -> str:
    """DuckDB oracle: the same N merges as chained MATERIALIZED CTE
    levels (non-materialized CTEs inline once per reference and the
    recursive levels reference each other 3x), each applying the
    winning pair with the identical fixpoint-replace recursion."""
    ctes = [f"""tok AS MATERIALIZED (
        SELECT token, count(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split({text_col}, ' ')) AS token
              FROM {table})
        GROUP BY token),
    w0 AS MATERIALIZED (
        SELECT ' ' || array_to_string(string_split(token, ''), ' ')
               || ' ' AS syms, freq
        FROM tok)"""]
    finals = []
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
        SELECT syms, freq FROM (
            WITH RECURSIVE r(syms, freq) AS (
                SELECT syms, freq FROM {prev}
                UNION ALL
                SELECT replace(r.syms, ' ' || b.a || ' ' || b.b || ' ',
                               ' ' || b.a || b.b || ' '), r.freq
                FROM r, b{i} b
                WHERE replace(r.syms, ' ' || b.a || ' ' || b.b || ' ',
                              ' ' || b.a || b.b || ' ') <> r.syms
            )
            SELECT r.syms, r.freq FROM r, b{i} b
            WHERE replace(r.syms, ' ' || b.a || ' ' || b.b || ' ',
                          ' ' || b.a || b.b || ' ') = r.syms))""")
        finals.append(f"SELECT {i}::BIGINT AS rank, a AS lhs, b AS rhs,"
                      f" a || b AS merged, c AS pair_count FROM b{i}")
    return ("WITH " + ",\n    ".join(ctes) + "\n"
            + "\nUNION ALL\n".join(finals))
