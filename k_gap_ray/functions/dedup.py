"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Shared shape: signature per item (vectorized map_batches) -> explode to
bucket keys -> per-bucket member lists (groupby + SafeUnique hash
aggregate, no per-group Python) -> capped in-bucket candidate pairs ->
verification by JOINING the candidate pairs back to the item table
(two hash joins on id_a then id_b) -> pairs/survivors. Nothing
materializes the corpus on the driver: pair verification ships only
the (rare) candidate rows through the join, never an id->payload dict.

Verification emits integer evidence (n_common/n_union shingle counts,
Hamming distance) and compares thresholds in exact integer arithmetic,
so the DuckDB brute-force oracles in ``__ray_entry__.oracle_sql``
match value-for-value.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from k_gap_ray.dsutil import (
    SafeUnique,
    join_datasets,
    pack_floats,
    unpack_floats,
)
from k_gap_ray.functions.textstats import H1_BASE, H1_MOD, _tokens_of, hash_tokens

MAX_BUCKET = 256  # candidate cap per bucket; drops are counted in-row

# --- doc-level MinHash config -------------------------------------------
# 64 bands x 2 rows: P(candidate | jaccard s) = 1-(1-s^2)^64 -> miss
# probability ~1e-8 at s=0.5, so the verified pair set equals the
# brute-force all-pairs oracle with overwhelming probability (the
# driver-gate gate relies on this; recall is also pinned by tests).
DOC_NUM_PERM = 128
DOC_ROWS_PER_BAND = 2
DOC_BANDS = DOC_NUM_PERM // DOC_ROWS_PER_BAND
_MERSENNE = np.uint64((1 << 61) - 1)
_SHINGLE_MOD = np.uint64(4398046511093)  # prime < 2^42 (overflow headroom)
_COMBINE = np.uint64(1000003)
_rngd = np.random.RandomState(20240817)
_DOC_PERM_A = _rngd.randint(1, (1 << 61) - 1, size=DOC_NUM_PERM).astype(np.uint64)
_DOC_PERM_B = _rngd.randint(0, (1 << 61) - 1, size=DOC_NUM_PERM).astype(np.uint64)


def exact_dedup(ds, key_col: str = "text", id_col: str = "doc_id"):
    """First (min id) row per distinct key + multiplicity.

    Hash-aggregate shuffle (partial pre-agg), no per-group Python —
    reference D1 'no duplicate ingestion' semantics."""
    from ray.data.aggregate import Count, Min

    out = ds.groupby(key_col).aggregate(
        Min(id_col, alias_name=id_col),
        Count(alias_name="n_copies"))
    return out.select_columns([id_col, "n_copies"])


def _word_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct k-token shingle strings; mirrors the SQL oracle's CASE:
    fewer than k tokens -> the single whole-text shingle (note that
    ''.split(' ') == [''] so even empty text yields one shingle)."""
    toks = (text or "").split(" ")
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _segment_horner(h: np.ndarray, counts: np.ndarray, starts: np.ndarray,
                    base: np.uint64, mod: np.uint64) -> np.ndarray:
    """Per-segment Horner combine of a flat uint64 array (vectorized
    across segments via a positional power table)."""
    if len(counts) == 0:
        return np.zeros(0, dtype=np.uint64)
    maxn = int(counts.max())
    pows = np.ones(max(maxn, 1), dtype=np.uint64)
    for i in range(1, maxn):
        pows[i] = (pows[i - 1] * base) % mod
    ends = starts + counts
    expo = np.repeat(ends, counts) - 1 - np.arange(len(h), dtype=np.int64)
    contrib = ((h % mod) * pows[expo]) % mod
    return np.add.reduceat(contrib, starts) % mod


def _doc_shingle_hashes(texts_col, k: int):
    """Hashed k-token shingles per doc, vectorized.

    Returns (shingle uint64 array for docs with >=k tokens ordered by
    doc, window counts per such doc, boolean mask of which docs they
    are, single-shingle hash per small doc). Shingle hash = rolling
    combine of token hashes — used only for LSH banding; verification
    uses exact shingle STRINGS."""
    flat, counts, starts = _tokens_of(texts_col)
    h = hash_tokens(flat, H1_BASE, H1_MOD)
    T, D = len(h), len(counts)
    big = counts >= k
    n_win = np.where(big, counts - k + 1, 0).astype(np.int64)
    if T >= k:
        W = T - k + 1
        acc = h[:W].copy()
        for j in range(1, k):
            acc = (acc % _SHINGLE_MOD) * _COMBINE + h[j:W + j]
        acc %= _SHINGLE_MOD
        doc_of = np.repeat(np.arange(D), counts)[:W]
        pos = np.arange(W) - starts[doc_of]
        valid = (pos + k) <= counts[doc_of]
        windows = acc[valid]
    else:
        windows = np.zeros(0, dtype=np.uint64)
    if (~big).any():
        # compact the small docs' tokens so segment offsets align with
        # the sliced hash array (_segment_horner assumes contiguity)
        doc_of_all = np.repeat(np.arange(D), counts)
        h_small = h[~big[doc_of_all]]
        c_small = counts[~big]
        s_small = np.zeros(len(c_small), dtype=np.int64)
        np.cumsum(c_small[:-1], out=s_small[1:])
        small_sh = _segment_horner(h_small, c_small, s_small,
                                   _COMBINE, _SHINGLE_MOD)
    else:
        small_sh = np.zeros(0, dtype=np.uint64)
    return windows, n_win[big], big, small_sh


def minhash_doc_bands(ds, shingle_k: int = 3, id_col: str = "doc_id"):
    """(doc_id, text) -> (band_key:int64, doc_id) rows via word-shingle
    MinHash. Fully vectorized: token hashes -> rolling-window shingle
    hashes -> per-permutation min via segmented reduce -> numeric band
    keys (no per-doc Python, no string keys)."""

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        D = len(ids)
        if D == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        windows, win_counts, big, small_sh = _doc_shingle_hashes(
            t.column("text"), shingle_k)
        sig = np.empty((D, DOC_NUM_PERM), dtype=np.uint64)
        big_idx = np.nonzero(big)[0]
        small_idx = np.nonzero(~big)[0]
        if big_idx.size:
            w_starts = np.zeros(len(win_counts), dtype=np.int64)
            np.cumsum(win_counts[:-1], out=w_starts[1:])
            for p in range(DOC_NUM_PERM):
                vals = (_DOC_PERM_A[p] * windows + _DOC_PERM_B[p]) % _MERSENNE
                sig[big_idx, p] = np.minimum.reduceat(vals, w_starts)
        if small_idx.size:
            vals = (np.multiply.outer(small_sh, _DOC_PERM_A)
                    + _DOC_PERM_B[None, :]) % _MERSENNE
            sig[small_idx, :] = vals
        # numeric band keys: combine the r rows of each band, tag with
        # the band index (int64-safe: 55-bit value * 64 + band)
        keys = np.empty((D, DOC_BANDS), dtype=np.int64)
        for b in range(DOC_BANDS):
            comb = sig[:, DOC_ROWS_PER_BAND * b].copy()
            for r in range(1, DOC_ROWS_PER_BAND):
                comb = comb * _COMBINE + sig[:, DOC_ROWS_PER_BAND * b + r]
            keys[:, b] = ((comb % np.uint64(1 << 55)) * np.uint64(DOC_BANDS)
                          + np.uint64(b)).astype(np.int64)
        return pa.table({
            "band_key": pa.array(keys.reshape(-1), pa.int64()),
            id_col: pa.array(np.repeat(ids, DOC_BANDS), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _pairs_table(blocks: pa.Table, id_col: str,
                 max_bucket: int | None) -> pa.Table:
    a_out, b_out = [], []
    for members in blocks.column("members").to_pylist():
        if members is None or len(members) < 2:
            continue
        ms = sorted(set(members))
        if max_bucket is not None:
            ms = ms[:max_bucket]
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a_out.append(ms[i])
                b_out.append(ms[j])
    return pa.table({f"{id_col}_a": pa.array(a_out, pa.int64()),
                     f"{id_col}_b": pa.array(b_out, pa.int64())})


def lsh_candidate_pairs(band_ds, id_col: str = "doc_id",
                        max_bucket: int | None = MAX_BUCKET):
    """(band_key, id) -> distinct candidate id pairs (a < b).

    ``max_bucket`` caps per-bucket pair expansion for the
    PROBABILISTIC callers (minhash/simhash/embedding LSH, where an
    oversized bucket signals a degenerate band, not signal). EXACT
    callers (the prefix-filter Jaccard join) must pass None: a bucket
    of 300 mutually-duplicate boilerplate pages is real signal there,
    and capping would silently drop pairs the recall-1.0 contract
    promises."""
    blocks = (band_ds.groupby("band_key")
              .aggregate(SafeUnique(id_col, alias_name="members")))
    pairs = blocks.map_batches(
        lambda t: _pairs_table(t, id_col, max_bucket),
        batch_format="pyarrow")
    return (pairs.groupby([f"{id_col}_a", f"{id_col}_b"]).count()
            .select_columns([f"{id_col}_a", f"{id_col}_b"]))


def attach_pair_payload(pairs_ds, items_ds, id_col: str, payload_cols: list,
                        num_partitions: int | None = None):
    """Join both endpoints' payload columns onto a candidate-pair set.

    Two hash joins on id_a then id_b — the scale-safe replacement for
    broadcasting an id->payload dict of the whole corpus (round-1
    review finding). Only candidate rows flow through the shuffle."""

    def rename(side: str):
        mapping = {id_col: f"{id_col}_{side}"}
        mapping.update({c: f"{c}_{side}" for c in payload_cols})
        return items_ds.select_columns([id_col] + payload_cols) \
            .rename_columns(mapping)

    # the pairs side needs the empty-block scrub (it came out of a
    # groupby) — and so does the FIRST join's output feeding the
    # second join: an empty hash partition emits a zero-row
    # EMPTY-SCHEMA block, and a second-join partition receiving only
    # those crashes with "No match ... FieldRef" (guaranteed whenever
    # the candidate set is smaller than num_partitions; the scrub rule
    # from BENCH/NOTES.md). Cost is one materialize of candidates x
    # payload_a — bounded by the candidate set.
    out = join_datasets(pairs_ds, rename("a"), on=f"{id_col}_a",
                        num_partitions=num_partitions, scrub_right=False)
    return join_datasets(out, rename("b"), on=f"{id_col}_b",
                         num_partitions=num_partitions,
                         scrub_left=True, scrub_right=False)


def verify_jaccard_pairs(pairs_ds, docs_ds, threshold: float = 0.8,
                         shingle_k: int = 3, id_col: str = "doc_id"):
    """Exact n-gram-Jaccard verification of candidate pairs via joins.

    Emits integer (n_common, n_union) evidence and keeps a pair iff
    den*n_common >= num*n_union where num/den is the exact binary
    fraction of ``threshold`` — integer arithmetic on both engine and
    oracle sides, so no float-boundary coin flips."""
    num, den = float(threshold).as_integer_ratio()
    joined = attach_pair_payload(pairs_ds, docs_ds, id_col, ["text"])

    def verify(t: pa.Table) -> pa.Table:
        a_ids = t.column(f"{id_col}_a").to_pylist()
        b_ids = t.column(f"{id_col}_b").to_pylist()
        keep_a, keep_b, commons, unions = [], [], [], []
        for a, b, ta, tb in zip(a_ids, b_ids,
                                t.column("text_a").to_pylist(),
                                t.column("text_b").to_pylist()):
            sa = _word_shingles(ta or "", shingle_k)
            sb = _word_shingles(tb or "", shingle_k)
            c = len(sa & sb)
            u = len(sa) + len(sb) - c
            if den * c >= num * u:
                keep_a.append(a)
                keep_b.append(b)
                commons.append(c)
                unions.append(u)
        return pa.table({f"{id_col}_a": pa.array(keep_a, pa.int64()),
                         f"{id_col}_b": pa.array(keep_b, pa.int64()),
                         "n_common": pa.array(commons, pa.int64()),
                         "n_union": pa.array(unions, pa.int64())})

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_dedup_pairs(docs_ds, threshold: float = 0.8, shingle_k: int = 3):
    """Full MinHash+LSH near-dup pipeline -> verified
    (doc_id_a, doc_id_b, n_common, n_union)."""
    docs_ds = docs_ds.materialize()  # consumed by banding AND verify join
    bands = minhash_doc_bands(docs_ds, shingle_k)
    pairs = lsh_candidate_pairs(bands)
    return verify_jaccard_pairs(pairs, docs_ds, threshold, shingle_k)


def _distinct_doc_shingles(t: pa.Table, shingle_k: int, id_col: str):
    """One batch -> (ids, d_u, h_u, n): per-doc DISTINCT shingle
    hashes, doc-contiguous, fully vectorized. ``d_u`` indexes into
    ``ids``; ``n[d]`` is doc d's distinct-shingle count."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    D = len(ids)
    if D == 0:
        z = np.zeros(0, dtype=np.int64)
        return ids, z, z, z
    windows, win_counts, big, small_sh = _doc_shingle_hashes(
        t.column("text"), shingle_k)
    doc_of_w = np.repeat(np.nonzero(big)[0], win_counts)
    all_doc = np.concatenate([doc_of_w, np.nonzero(~big)[0]])
    all_hash = np.concatenate([windows, small_sh]).astype(np.int64)
    order = np.lexsort((all_hash, all_doc))
    d_s, h_s = all_doc[order], all_hash[order]
    first = np.ones(len(d_s), dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    d_u, h_u = d_s[first], h_s[first]
    n = np.bincount(d_u, minlength=D).astype(np.int64)
    return ids, d_u, h_u, n


def _explode_doc_shingles(ds, shingle_k: int, id_col: str):
    """(doc_id, text) -> (shingle:int64 hash, doc_id, n_shingles) rows,
    one per DISTINCT shingle per doc, fully vectorized."""

    def f(t: pa.Table) -> pa.Table:
        ids, d_u, h_u, n = _distinct_doc_shingles(t, shingle_k, id_col)
        if len(ids) == 0:
            return pa.table({"shingle": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "n_shingles": pa.array([], pa.int64())})
        return pa.table({"shingle": pa.array(h_u, pa.int64()),
                         id_col: pa.array(ids[d_u], pa.int64()),
                         "n_shingles": pa.array(n[d_u], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _prefix_lengths(n: np.ndarray, num: int, den: int) -> np.ndarray:
    """p = n - ceil(t*n) + 1 per doc, computed with PYTHON ints per
    unique size: for non-dyadic thresholds as_integer_ratio yields
    num ~ 10^15 and `num * n` in int64 numpy silently overflows past
    ~2.5k shingles, corrupting the prefix bound (review finding)."""
    uniq, inv = np.unique(n, return_inverse=True)
    p_u = np.array([int(v) - (num * int(v) + den - 1) // den + 1
                    for v in uniq], dtype=np.int64)
    return p_u[inv]


def _prefix_keep_mask(d_u: np.ndarray, h_u: np.ndarray, dfv: np.ndarray,
                      n: np.ndarray, num: int, den: int) -> np.ndarray:
    """Vectorized per-doc prefix cut: order each doc's shingles by
    (df asc, hash asc) and keep the first n - ceil(t*n) + 1."""
    p = _prefix_lengths(n, num, den)
    order = np.lexsort((h_u, dfv, d_u))
    d_o = d_u[order]
    # position within doc after the (df, hash) ordering
    starts = np.ones(len(d_o), dtype=bool)
    starts[1:] = d_o[1:] != d_o[:-1]
    idx = np.arange(len(d_o), dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(starts, idx, 0))
    pos = idx - run_start
    keep = np.zeros(len(d_u), dtype=bool)
    keep[order] = pos < np.maximum(p, 1)[d_o]
    return keep


def ngram_prefix_bands(docs_ds, threshold: float = 0.75, shingle_k: int = 4,
                       id_col: str = "doc_id",
                       broadcast_cap: int = 2_000_000):
    """Prefix-filtered shingle index for the EXACT n-gram-Jaccard join.

    PPJoin-style prefix filtering (Bayardo et al., WWW'07; Xiao et al.,
    WWW'08 — public algorithms): order each doc's distinct shingles by
    GLOBAL rarity (document frequency asc, hash asc as the tiebreak)
    and index only the first ``n - ceil(t*n) + 1``. Any pair with
    Jaccard >= t must share a prefix shingle (pigeonhole on the
    overlap lower bound ceil(t*max(|a|,|b|))), so candidate recall is
    1.0 BY CONSTRUCTION — unlike MinHash banding there is no
    probabilistic miss. The rarity ordering is what makes it scale: a
    shingle's bucket can only contain docs that rank it inside their
    prefix, which frequent shingles almost never are, so bucket sizes
    track document frequency of RARE shingles instead of corpus size.

    Plan: explode distinct (shingle, doc) -> df = groupby(shingle)
    count -> attach df -> per-doc prefix cut. The df table is
    dictionary-scale (distinct shingles), far smaller than the corpus;
    below ``broadcast_cap`` rows it is broadcast once via ray.put as a
    sorted (hash, df) array pair and the prefix cut happens inside the
    SAME map_batches that explodes the doc (docs are batch-contiguous,
    so the cut is one lexsort — no join, no groupby(doc) shuffle).
    Above the cap: hash-join the df back and re-group by doc — the
    all-Dataset scale path, two extra shuffles.
    """
    num, den = float(threshold).as_integer_ratio()
    exploded = _explode_doc_shingles(docs_ds, shingle_k, id_col).materialize()
    n_exploded = exploded.count()

    from k_gap_ray.dsutil import drop_empty_blocks

    ref = None
    if n_exploded <= broadcast_cap:
        # The whole distinct-(shingle, doc) stream is no bigger than
        # the broadcast cap, so the df histogram (strictly smaller)
        # merges on the driver in one np.unique over the pulled
        # shingle column — skipping the distributed aggregate, whose
        # fixed cost dominates at benchmark scale (measured 5.8s for
        # 256k slim rows vs ~30ms for the driver merge).
        import ray

        parts = ray.get(exploded.select_columns(["shingle"])
                        .to_arrow_refs())
        flat = (pa.concat_tables(parts).column("shingle")
                .to_numpy(zero_copy_only=False))
        hs, cs = np.unique(flat, return_counts=True)  # sorted by hash
        ref = ray.put((hs, cs.astype(np.int64)))
    else:
        df = (exploded.groupby("shingle").count()
              .rename_columns({"count()": "df"}))
        df = drop_empty_blocks(df.materialize())
        if df.count() <= broadcast_cap:
            import ray

            dft = pa.concat_tables(ray.get(df.to_arrow_refs()))
            hashes = dft.column("shingle").to_numpy(zero_copy_only=False)
            counts = dft.column("df").to_numpy(zero_copy_only=False)
            o = np.argsort(hashes)
            ref = ray.put((hashes[o], counts[o]))

    if ref is not None:

        def cut_local(t: pa.Table) -> pa.Table:
            import ray as _r

            ids, d_u, h_u, n = _distinct_doc_shingles(t, shingle_k, id_col)
            if len(ids) == 0:
                return pa.table({"band_key": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64())})
            hs, cs = _r.get(ref)
            dfv = cs[np.searchsorted(hs, h_u)]
            keep = _prefix_keep_mask(d_u, h_u, dfv, n, num, den)
            return pa.table({
                "band_key": pa.array(h_u[keep], pa.int64()),
                id_col: pa.array(ids[d_u[keep]], pa.int64())})

        return docs_ds.map_batches(cut_local, batch_format="pyarrow",
                                   zero_copy_batch=True)

    joined = join_datasets(exploded, df, on="shingle",
                           scrub_left=False, scrub_right=True)

    def prefix_cut(t: pa.Table) -> pa.Table:
        # one group = one doc's (shingle, df) rows
        n = int(t.column("n_shingles")[0].as_py())
        p = n - (num * n + den - 1) // den + 1
        dfv = t.column("df").to_numpy(zero_copy_only=False)
        hv = t.column("shingle").to_numpy(zero_copy_only=False)
        keep = np.lexsort((hv, dfv))[:max(int(p), 1)]
        return pa.table({
            "band_key": pa.array(hv[keep], pa.int64()),
            id_col: t.column(id_col).take(pa.array(keep))})

    return joined.groupby(id_col).map_groups(prefix_cut,
                                             batch_format="pyarrow")


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.75, shingle_k: int = 4,
                        broadcast_cap: int = 2_000_000):
    """EXACT n-gram-Jaccard near-dup pairs (no LSH, no probabilistic
    recall): prefix-filtered candidate generation + exact shingle-set
    verification through the pair join. Same output contract as
    ``minhash_dedup_pairs`` — (id_a, id_b, n_common, n_union) with the
    threshold compared in exact integer arithmetic.

    CONFIG GOVERNS SCALE, measured at 5,000 docs (sf0.1): prefix
    filtering prunes by RARE shingles, so candidates collapse only
    when the shingle space is rich relative to the corpus — k=4 at
    t=0.75 yields candidates == true pairs (256) in 8 s, k=3 ~160k
    candidates, while k=2 (tiny shared bigram vocabulary) degenerates
    toward all-pairs (7.5M). Low thresholds or small shingle spaces
    are MinHash-LSH territory (`minhash_dedup_pairs`); the exact join
    is the high-threshold path. Prefer exactly-representable
    thresholds (0.75 = 3/4) so the integer comparison stays tiny on
    the SQL oracle side."""
    docs_ds = docs_ds.materialize()  # banding AND verify join consume it
    bands = ngram_prefix_bands(docs_ds, threshold, shingle_k,
                               broadcast_cap=broadcast_cap)
    # max_bucket=None: exactness requires UNCAPPED pair expansion — a
    # giant bucket here is a real mutual-duplicate cluster, and its
    # quadratic pair count is the answer's intrinsic size
    pairs = lsh_candidate_pairs(bands, max_bucket=None)
    return verify_jaccard_pairs(pairs, docs_ds, threshold, shingle_k)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) \
        + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def simhash_dup_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs with pigeonhole-complete banding.

    The 64-bit simhash is cut into ``max_hamming + 1`` chunks — any
    pair within the Hamming budget must agree exactly on >=1 chunk, so
    banding recall is 1.0 BY CONSTRUCTION for the requested radius
    (round-1 advice: the old fixed 4x16-bit scheme silently lost
    distance 4..8 pairs). True distance is verified by joining the
    signature table back onto the candidate pairs."""
    from k_gap_ray.functions.textstats import simhash64

    n_chunks = max_hamming + 1
    bounds = np.linspace(0, 64, n_chunks + 1).astype(np.int64)
    widths = bounds[1:] - bounds[:-1]
    max_w = int(widths.max())

    sh = simhash64(docs_ds).materialize()  # banding + verify join share it

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lo = t.column("simhash_lo").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        hi = t.column("simhash_hi").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        u = lo | (hi << np.uint64(32))
        D = len(ids)
        keys = np.empty((D, n_chunks), dtype=np.int64)
        for c in range(n_chunks):
            w = int(widths[c])
            chunk = (u >> np.uint64(bounds[c])) & np.uint64((1 << w) - 1)
            keys[:, c] = ((np.uint64(c) << np.uint64(max_w)) | chunk) \
                .astype(np.int64)
        return pa.table({
            "band_key": pa.array(keys.reshape(-1), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, n_chunks), pa.int64())})

    bands = sh.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)
    pairs = lsh_candidate_pairs(bands)
    joined = attach_pair_payload(pairs, sh, "doc_id",
                                 ["simhash_lo", "simhash_hi"])

    def verify(t: pa.Table) -> pa.Table:
        def u64(col_lo, col_hi):
            lo = t.column(col_lo).to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            hi = t.column(col_hi).to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            return lo | (hi << np.uint64(32))

        d = _popcount64(u64("simhash_lo_a", "simhash_hi_a")
                        ^ u64("simhash_lo_b", "simhash_hi_b"))
        keep = d <= max_hamming
        return pa.table({
            "doc_id_a": t.column("doc_id_a").filter(pa.array(keep)),
            "doc_id_b": t.column("doc_id_b").filter(pa.array(keep)),
            "hamming": pa.array(d[keep], pa.int64())})

    return joined.map_batches(verify, batch_format="pyarrow")


# --- embedding near-dup -------------------------------------------------

_PLANE_CACHE: dict = {}


def _hyperplanes(dim: int, n_planes: int, n_tables: int,
                 seed: int) -> np.ndarray:
    """(dim, n_tables*n_planes) fixed-seed planes, cached per worker."""
    key = (dim, n_planes, n_tables, seed)
    if key not in _PLANE_CACHE:
        _PLANE_CACHE[key] = np.hstack([
            np.random.RandomState(seed + l).randn(dim, n_planes)
            for l in range(n_tables)])
    return _PLANE_CACHE[key]


def embedding_bands(emb_ds, n_planes: int = 8, n_tables: int = 24,
                    seed: int = 777, id_col: str = "vec_id"):
    """(vec_id, embedding) -> (band_key:int64, vec_id) rows.

    OR-amplified random-hyperplane LSH: n_tables independent plane
    sets; a pair is a candidate if it agrees on ALL n_planes signs of
    ANY table. Miss probability at cos 0.9 with 8x24:
    (1 - 0.857^8)^24 ~ 2e-4 (round-1 advice: one 12-plane table had
    ~16% recall). One matmul per batch covers every table."""

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        from k_gap_ray.dsutil import list_col_matrix

        embs = list_col_matrix(t.column("embedding"))
        planes = _hyperplanes(embs.shape[1], n_planes, n_tables, seed)
        signs = (embs @ planes) >= 0  # (D, n_tables*n_planes)
        po2 = (1 << np.arange(n_planes, dtype=np.int64))
        keys = np.empty((len(ids), n_tables), dtype=np.int64)
        for l in range(n_tables):
            packed = signs[:, l * n_planes:(l + 1) * n_planes] @ po2
            keys[:, l] = (l << n_planes) | packed
        return pa.table({
            "band_key": pa.array(keys.reshape(-1), pa.int64()),
            id_col: pa.array(np.repeat(ids, n_tables), pa.int64())})

    return emb_ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)


def _pack_embeddings(emb_ds, id_col: str = "vec_id"):
    """(vec_id, embedding:list<float>) -> (vec_id, emb:fixed_binary):
    joins reject list payloads, fixed-size binary passes zero-copy."""

    def f(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column(id_col),
                         "emb": pack_floats(t.column("embedding"))})

    return emb_ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)


def _verify_cosine_pairs(pairs_ds, packed_ds, threshold: float,
                         id_col: str = "vec_id",
                         emit_cosine: bool = False):
    """Join both endpoint vectors onto candidate pairs, keep exact
    cosine >= threshold. Vectorized: one fused multiply-add per batch."""
    joined = attach_pair_payload(pairs_ds, packed_ds, id_col, ["emb"])

    def verify(t: pa.Table) -> pa.Table:
        va = unpack_floats(t.column("emb_a")).astype(np.float64)
        vb = unpack_floats(t.column("emb_b")).astype(np.float64)
        if len(va) == 0:
            cos = np.zeros(0)
        else:
            na = np.linalg.norm(va, axis=1)
            nb = np.linalg.norm(vb, axis=1)
            denom = np.where(na * nb == 0, 1.0, na * nb)
            cos = (va * vb).sum(axis=1) / denom
        keep = cos >= threshold
        cols = {
            f"{id_col}_a": t.column(f"{id_col}_a").filter(pa.array(keep)),
            f"{id_col}_b": t.column(f"{id_col}_b").filter(pa.array(keep)),
        }
        if emit_cosine:
            cols["cosine"] = pa.array(np.round(cos[keep], 4), pa.float64())
        return pa.table(cols)

    return joined.map_batches(verify, batch_format="pyarrow")


def embedding_near_dup_pairs(emb_ds, threshold: float = 0.95,
                             n_planes: int = 8, n_tables: int = 24):
    """Embedding-cosine near-dup via OR-amplified hyperplane LSH,
    verified by exact cosine through a pair join (no driver-side
    id->vector dict). Returns (vec_id_a, vec_id_b)."""
    emb_ds = emb_ds.materialize()
    bands = embedding_bands(emb_ds, n_planes=n_planes, n_tables=n_tables)
    pairs = lsh_candidate_pairs(bands, id_col="vec_id")
    return _verify_cosine_pairs(pairs, _pack_embeddings(emb_ds), threshold)


def cosine_pairs_exact(emb_ds, threshold: float, n_buckets: int = 8,
                       id_col: str = "vec_id", emit_cosine: bool = False):
    """EXACT all-pairs cosine similarity join (the brute-force path).

    Each vector is replicated to its n_buckets unordered bucket-pair
    groups (bucket = vec_id % n_buckets); each group computes the full
    cross product for its two buckets with one numpy matmul, keeping
    only pairs whose bucket multiset matches the group (so every pair
    is emitted exactly once). O(n^2/B) work per group, B*(B+1)/2-way
    parallel — the documented quadratic fallback for thresholds too
    low for LSH pruning."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"pair_key": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "emb": pack_floats(t.column("embedding"))})
        packed = pack_floats(t.column("embedding"))
        own = ids % n_buckets
        key_list, id_idx = [], []
        for j in range(n_buckets):
            lo = np.minimum(own, j)
            hi = np.maximum(own, j)
            key_list.append(lo * n_buckets + hi)
            id_idx.append(np.arange(len(ids)))
        keys = np.concatenate(key_list)
        idx = np.concatenate(id_idx)
        return pa.table({
            "pair_key": pa.array(keys, pa.int64()),
            id_col: pa.array(ids[idx], pa.int64()),
            "emb": packed.take(pa.array(idx))})

    def group_pairs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            cols = {f"{id_col}_a": pa.array([], pa.int64()),
                    f"{id_col}_b": pa.array([], pa.int64())}
            if emit_cosine:
                cols["cosine"] = pa.array([], pa.float64())
            return pa.table(cols)
        key = int(t.column("pair_key")[0].as_py())
        blo, bhi = key // n_buckets, key % n_buckets
        # drop replicated duplicates of the same vector in this group
        _, first = np.unique(ids, return_index=True)
        ids = ids[first]
        V = unpack_floats(t.column("emb").take(pa.array(first))) \
            .astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        C = Vn @ Vn.T
        ai, bi = np.nonzero(np.triu(C >= threshold, k=1))
        a, b = ids[ai], ids[bi]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        mset_ok = (np.minimum(a2 % n_buckets, b2 % n_buckets) == blo) \
            & (np.maximum(a2 % n_buckets, b2 % n_buckets) == bhi)
        cols = {f"{id_col}_a": pa.array(a2[mset_ok], pa.int64()),
                f"{id_col}_b": pa.array(b2[mset_ok], pa.int64())}
        if emit_cosine:
            cols["cosine"] = pa.array(
                np.round(C[ai, bi][mset_ok], 4), pa.float64())
        return pa.table(cols)

    exploded = emb_ds.map_batches(explode, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return exploded.groupby("pair_key").map_groups(
        group_pairs, batch_format="pyarrow")


def content_hash(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def near_dup_survivors_emb(emb_ds, threshold: float = 0.4,
                           n_buckets: int = 8,
                           keep_cols: tuple = ("label",)):
    """SemDeDup-style embedding near-dup DEDUP: drop every vector whose
    exact cosine with some LOWER-id vector is >= ``threshold``; return
    the survivors (vec_id + ``keep_cols``).

    Deterministic drop rule (the min-id side of every near pair always
    survives) so the result is engine-independent: survivors == rows
    with NO earlier neighbor, exactly SQL's NOT EXISTS formulation.
    Pairs come from :func:`cosine_pairs_exact` (full recall), the drop
    set is applied as a distributed left-anti join — no driver-side
    id set at any corpus size.
    """
    import pyarrow.compute as pc

    from k_gap_ray.dsutil import join_datasets

    emb_ds = emb_ds.materialize()
    pairs = cosine_pairs_exact(
        emb_ds.select_columns(["vec_id", "embedding"]),
        threshold=threshold, n_buckets=n_buckets)
    # one row per dropped id (greater side of any near pair); comes out
    # of a sort-based groupby -> may carry empty-schema blocks, so the
    # join below scrubs that side
    drops = pairs.groupby("vec_id_b").count().map_batches(
        lambda t: pa.table({
            "vec_id": t.column("vec_id_b"),
            "dropped": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")
    keep = emb_ds.select_columns(["vec_id", *keep_cols])
    joined = join_datasets(keep, drops, on="vec_id",
                           join_type="left_outer",
                           scrub_left=False, scrub_right=True)
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("dropped")))
        .select(["vec_id", *keep_cols]),
        batch_format="pyarrow")


def _levenshtein_vec(a_codes, a_len, b_codes, b_len, k: int):
    """Levenshtein distance for P string pairs at once: the classic DP
    with both index loops in Python (O(maxlen^2) iterations) but every
    cell update vectorized across the P pairs. Pads never match (-1 vs
    -2 sentinels chosen by the caller). Returns (P,) int64 distances
    clamped at k+1 (exact for all d <= k)."""
    P, La = a_codes.shape
    Lb = b_codes.shape[1]
    cap = np.int64(k + 1)
    prev = np.tile(np.minimum(np.arange(Lb + 1, dtype=np.int64), cap),
                   (P, 1))
    out = np.where(a_len == 0, np.minimum(b_len, cap), cap)
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = min(i, int(cap))
        ai = a_codes[:, i - 1][:, None]
        cost = (ai != b_codes).astype(np.int64)  # (P, Lb)
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum.reduce([
                prev[:, j] + 1, cur[:, j - 1] + 1,
                prev[:, j - 1] + cost[:, j - 1]])
        np.minimum(cur, cap, out=cur)
        hit = a_len == i
        if hit.any():
            out[hit] = cur[hit, b_len[hit]]
        prev = cur
    return out


def fuzzy_name_pairs(ds, col: str, max_dist: int = 2, n_buckets: int = 4):
    """Edit-distance fuzzy join over the DISTINCT values of a string
    column: (name_a, name_b) with name_a < name_b and
    levenshtein <= ``max_dist`` — the typo/variant surface-matching
    operator of the dedup family.

    Scale shape: the quadratic join runs over the DISTINCT value
    vocabulary (one slim groupby), not the rows; the vocabulary is
    bucket-pair replicated exactly like :func:`cosine_pairs_exact`
    (deterministic content hash % n_buckets, every unordered bucket
    pair computed once, B(B+1)/2-way parallel), with a length-window
    prefilter (|len(a)-len(b)| <= max_dist is necessary) before the
    vectorized DP."""
    import pyarrow.compute as pc

    from k_gap_ray.functions.textstats import hash_tokens

    def distinct_partial(t: pa.Table) -> pa.Table:
        return pa.table({"name": pc.unique(
            t.column(col).combine_chunks())})

    names = (ds.map_batches(distinct_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("name").count()
             .map_batches(lambda t: pa.table({"name": t.column("name")}),
                          batch_format="pyarrow"))

    def explode(t: pa.Table) -> pa.Table:
        arr = t.column("name")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        if n == 0:
            return pa.table({"pair_key": pa.array([], pa.int64()),
                             "name": pa.array([], pa.string())})
        own = (hash_tokens(arr, 1000003, (1 << 61) - 1)
               % np.uint64(n_buckets)).astype(np.int64)
        keys, idx = [], []
        for j in range(n_buckets):
            lo = np.minimum(own, j)
            hi = np.maximum(own, j)
            keys.append(lo * n_buckets + hi)
            idx.append(np.arange(n))
        return pa.table({
            "pair_key": pa.array(np.concatenate(keys), pa.int64()),
            "name": arr.take(pa.array(np.concatenate(idx)))})

    def group_pairs(t: pa.Table) -> pa.Table:
        from k_gap_ray.functions.textstats import hash_tokens as _ht

        vals = t.column("name")
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        names_np = np.array(vals.to_pylist(), dtype=object)
        names_np = np.unique(names_np)  # drop replicated copies
        n = len(names_np)
        empty = pa.table({"name_a": pa.array([], pa.string()),
                          "name_b": pa.array([], pa.string())})
        if n < 2:
            return empty
        key = int(t.column("pair_key")[0].as_py())
        blo, bhi = key // n_buckets, key % n_buckets
        lens = np.array([len(s) for s in names_np], dtype=np.int64)
        ai, bi = np.nonzero(
            np.abs(lens[:, None] - lens[None, :]) <= max_dist)
        keep = ai < bi  # unordered pair once (names are sorted unique)
        ai, bi = ai[keep], bi[keep]
        if len(ai) == 0:
            return empty
        # pair emitted only by its own bucket-multiset group
        hb = (_ht(pa.array(list(names_np), pa.string()), 1000003,
                  (1 << 61) - 1) % np.uint64(n_buckets)).astype(np.int64)
        mset = (np.minimum(hb[ai], hb[bi]) == blo) \
            & (np.maximum(hb[ai], hb[bi]) == bhi)
        ai, bi = ai[mset], bi[mset]
        if len(ai) == 0:
            return empty
        # codepoint matrices for the vocab once, indexed per pair;
        # different pad sentinels so pads never count as equal
        L = int(lens.max())
        A = np.full((n, L), -1, dtype=np.int64)
        B = np.full((n, L), -2, dtype=np.int64)
        for r, s in enumerate(names_np):
            cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
                .astype(np.int64)
            A[r, :len(cps)] = cps
            B[r, :len(cps)] = cps
        d = _levenshtein_vec(A[ai], lens[ai], B[bi], lens[bi], max_dist)
        ok = d <= max_dist
        return pa.table({"name_a": pa.array(names_np[ai[ok]], pa.string()),
                         "name_b": pa.array(names_np[bi[ok]], pa.string())})

    exploded = names.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby("pair_key").map_groups(
        group_pairs, batch_format="pyarrow")
