"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on the
sf0.001-scale synthetic pages corpus (input_hint shape). ``queries()``
exposes one callable per implemented operator/pipeline from SURVEY.md
section 2 plus the training-data ops; ``oracle_sql()`` gives the DuckDB
oracle for every SQL-expressible one (the rest get rows-only checks).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init / ray.shutdown anywhere below.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

from k_gap_ray import relational as rel
from k_gap_ray.dsutil import read_parquet_clean as _read_pq


# ---------------------------------------------------------------------------
# Synthetic pages corpus scaled to the sf tier (KG pipeline input; the
# driver's tables have no html column, so the engine's primary input is
# synthesized deterministically per the FIXTURES.md F1 rule).
# ---------------------------------------------------------------------------

def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.001


def _pages_dir(sf_dir: str) -> str:
    from k_gap_ray.synth import write_pages

    sf = _sf_of(sf_dir)
    n = max(500, int(1_000_000 * sf))
    out = f"/tmp/kgap_pages/sf{sf}"
    write_pages(out, n)  # idempotent (manifest-guarded)
    return out


_PIPELINE_CACHE: dict[str, dict[str, Any]] = {}


def _pipeline(sf_dir: str) -> dict[str, Any]:
    """Run (once per sf tier) the full in-memory KG pipeline."""
    key = _pages_dir(sf_dir)
    if key not in _PIPELINE_CACHE:
        from k_gap_ray.pipeline import run_pipeline

        _PIPELINE_CACHE[key] = run_pipeline(key)
    return _PIPELINE_CACHE[key]


def entry() -> Any:
    """Flagship pipeline at the smoke tier; returns the canonical
    triples Dataset (stable schema, >=0 rows)."""
    return _pipeline("/root/testdata/sf0.001")["triples"]


# ---------------------------------------------------------------------------
# query catalog
# ---------------------------------------------------------------------------

def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return _read_pq(f"{sf_dir}/documents.parquet", columns=columns)


def _doc_langid(sf_dir: str):
    from k_gap_ray.functions.textstats import lang_id

    return lang_id(_docs(sf_dir, ["doc_id", "text"]))


def _doc_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: declared lang vs stopword-count
    prediction, counted. Per-batch Arrow pair counts merge on the
    driver (<= |langs|^2 x blocks slim rows — a Ray groupby would only
    add its fixed aggregate cost)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from k_gap_ray.functions.textstats import lang_id

    preds = lang_id(_docs(sf_dir, ["doc_id", "text", "lang"]),
                    keep_cols=("lang",))

    def part(t: _pa.Table) -> _pa.Table:
        g = (_pa.table({"lang": t.column("lang"),
                        "pred_lang": t.column("pred_lang")})
             .group_by(["lang", "pred_lang"])
             .aggregate([([], "count_all")]))
        return _pa.table({
            "lang": g.column("lang"),
            "pred_lang": g.column("pred_lang"),
            "n_p": _pc.cast(g.column("count_all"), _pa.int64())})

    rows = preds.map_batches(part, batch_format="pyarrow").take_all()
    agg: dict[tuple[str, str], int] = {}
    for r in rows:
        k = (r["lang"], r["pred_lang"])
        agg[k] = agg.get(k, 0) + int(r["n_p"])
    out = sorted(agg.items())
    return _pa.table({
        "lang": _pa.array([k[0] for k, _ in out], _pa.string()),
        "pred_lang": _pa.array([k[1] for k, _ in out], _pa.string()),
        "n": _pa.array([v for _, v in out], _pa.int64())})


def _doc_quality(sf_dir: str):
    from k_gap_ray.functions.textstats import quality_scores

    return quality_scores(_docs(sf_dir, ["doc_id", "text"]))


def _doc_token_counts(sf_dir: str):
    from k_gap_ray.functions.textstats import token_counts

    return token_counts(_docs(sf_dir, ["doc_id", "text"]))


def _doc_bpe_tokens(sf_dir: str):
    from k_gap_ray.functions.textstats import bpe_token_counts

    return bpe_token_counts(_docs(sf_dir, ["doc_id", "text"]))


def _doc_fingerprints(sf_dir: str):
    from k_gap_ray.functions.textstats import fingerprints

    return fingerprints(_docs(sf_dir, ["doc_id", "text"]))


def _doc_simhash(sf_dir: str):
    from k_gap_ray.functions.textstats import simhash64

    return simhash64(_docs(sf_dir, ["doc_id", "text"]))


def _doc_exact_dedup(sf_dir: str):
    from k_gap_ray.functions.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def _doc_minhash_pairs(sf_dir: str):
    from k_gap_ray.functions.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)


def _doc_simhash_pairs(sf_dir: str):
    from k_gap_ray.functions.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=8)


def _doc_ngram_jaccard(sf_dir: str):
    """EXACT n-gram Jaccard similarity join (prefix-filtered, not
    probabilistic) — word-4-GRAM shingles at threshold 0.75, vs the
    minhash query's trigrams at 0.5: a distinct result set whose
    recall is 1.0 by construction, so the brute-force oracle matches
    exactly. k=4 / t=0.75 is the measured scale-sane config
    (candidates == true pairs at sf0.1; see the
    ngram_jaccard_pairs docstring for the k/t scaling tradeoff)."""
    from k_gap_ray.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               threshold=0.75, shingle_k=4)


def _doc_cluster_labels(docs_ds, pairs_ds):
    """(docs, near-dup pairs) -> Dataset(doc_id, cluster_id) via
    connected components. Numeric-min label semantics through
    zero-padded string nodes (CC labels are lexicographic-min);
    shared by the dup-clusters query and the clean-corpus
    composition so the two can never diverge."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.ops.canonicalize import connected_components

    def pad(col):
        return pc.utf8_lpad(pc.cast(col, pa.string()), 12, padding="0")

    nodes = docs_ds.map_batches(
        lambda t: pa.table({"node": pad(t.column("doc_id"))}),
        batch_format="pyarrow")
    edges = pairs_ds.map_batches(
        lambda t: pa.table({"a": pad(t.column("doc_id_a")),
                            "b": pad(t.column("doc_id_b"))}),
        batch_format="pyarrow")
    labels = connected_components(nodes, edges)
    return labels.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t.column("node"), pa.int64()),
            "cluster_id": pc.cast(t.column("label"), pa.int64())}),
        batch_format="pyarrow")


_DOC_CLUSTERS_CACHE: dict[str, Any] = {}


def _doc_dup_clusters(sf_dir: str):
    """A8 connected components over the exact 4-gram-Jaccard dup
    pairs: every doc labeled with the min doc_id of its duplicate
    cluster (singletons label themselves). Built once per sf tier —
    q_doc_dup_clusters and q_doc_neardup_dedup consume the same
    labels, so the pair join + CC would otherwise run twice."""
    from k_gap_ray.functions.dedup import ngram_jaccard_pairs

    if sf_dir not in _DOC_CLUSTERS_CACHE:
        docs = _docs(sf_dir, ["doc_id", "text"]).materialize()
        pairs = ngram_jaccard_pairs(docs, threshold=0.75, shingle_k=4)
        _DOC_CLUSTERS_CACHE[sf_dir] = \
            _doc_cluster_labels(docs, pairs).materialize()
    return _DOC_CLUSTERS_CACHE[sf_dir]


def _doc_neardup_dedup(sf_dir: str):
    """The end-to-end near-dup DEDUP operation (cluster -> keep the
    min-id representative): documents surviving 4-gram-Jaccard
    deduplication at threshold 0.75."""
    import pyarrow.compute as pc

    labels = _doc_dup_clusters(sf_dir)
    return labels.map_batches(
        lambda t: t.filter(pc.equal(t.column("doc_id"),
                                    t.column("cluster_id")))
        .select(["doc_id"]),
        batch_format="pyarrow")


def _doc_clean_corpus(sf_dir: str):
    """Flagship training-data-prep COMPOSITION, one streaming chain:
    predicted-English + quality-floor filter -> exact dedup (keep min
    doc_id per text) -> exact 4-gram-Jaccard near-dup dedup (keep
    cluster min) -> surviving (doc_id, n_tokens). Every stage is an
    operator verified on its own elsewhere; this query verifies the
    COMPOSITION against one chained SQL oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.dedup import exact_dedup, ngram_jaccard_pairs
    from k_gap_ray.functions.textstats import lang_id, quality_scores

    docs = _docs(sf_dir, ["doc_id", "text"]).materialize()
    lang = lang_id(docs)
    qual = quality_scores(docs)

    # quality_scores emits integer evidence columns; the quality score
    # itself is float — filter on an integer-safe predicate instead
    # (n_tokens window) plus the language prediction, both joinable
    keep_lang = lang.map_batches(
        lambda t: t.filter(pc.equal(t.column("pred_lang"),
                                    pa.scalar("en")))
        .select(["doc_id"]),
        batch_format="pyarrow")
    keep_qual = qual.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("n_tokens"), pa.scalar(20)),
            pc.less_equal(t.column("n_tokens"), pa.scalar(400))))
        .select(["doc_id", "n_tokens"]),
        batch_format="pyarrow")

    from k_gap_ray.dsutil import join_datasets

    kept = join_datasets(keep_qual, keep_lang, on="doc_id",
                         scrub_left=False, scrub_right=False)
    kept_docs = join_datasets(
        kept.select_columns(["doc_id", "n_tokens"]),
        docs, on="doc_id", scrub_left=False, scrub_right=False) \
        .materialize()

    # exact dedup: keep min doc_id per text among the kept docs.
    # scrub_left=True: survivors came out of a sort-based groupby and
    # can carry empty-schema blocks that crash a hash join
    # (join_datasets contract; review finding)
    survivors = exact_dedup(kept_docs).select_columns(["doc_id"])
    surv_docs = join_datasets(survivors, kept_docs.select_columns(
        ["doc_id", "text", "n_tokens"]), on="doc_id",
        scrub_left=True, scrub_right=False).materialize()

    # near-dup dedup within the exact-dedup survivors: same pair +
    # cluster pipeline as q_doc_dup_clusters (shared helper)
    pairs = ngram_jaccard_pairs(surv_docs, threshold=0.75, shingle_k=4)
    labels = _doc_cluster_labels(surv_docs, pairs)
    reps = labels.map_batches(
        lambda t: t.filter(pc.equal(t.column("doc_id"),
                                    t.column("cluster_id")))
        .select(["doc_id"]),
        batch_format="pyarrow")
    return join_datasets(reps, surv_docs.select_columns(
        ["doc_id", "n_tokens"]), on="doc_id",
        scrub_left=False, scrub_right=False)


def _doc_hash_sample(sf_dir: str):
    """O5 deterministic hash sampling: 30% of documents selected by a
    multiplicative id hash — block-layout- and cluster-size-invariant,
    hence value-verifiable against the SQL oracle."""
    from k_gap_ray.ops.transform import hash_sample

    return hash_sample(_docs(sf_dir, ["doc_id", "lang"]),
                       "doc_id", keep_pct=30)


def _doc_mixture(sf_dir: str):
    """Data-mixture reweighting: stratified deterministic sampling
    with per-language keep rates (en 60%, de 30%, rest 10%) — the
    source/language up/down-weighting step of a training-data
    pipeline, layout-invariant and value-verifiable."""
    from k_gap_ray.ops.transform import mixture_sample

    return mixture_sample(_docs(sf_dir, ["doc_id", "lang"]),
                          "lang", {"en": 60, "de": 30}, "doc_id",
                          default_pct=10)


def _doc_vocab(sf_dir: str):
    """Corpus vocabulary with per-token document frequency and term
    frequency — the tokenizer-training / IDF-weighting input.  Exact
    distributed aggregate: per-batch dictionary-encoded partials, one
    token-keyed groupby-sum shuffle."""
    from k_gap_ray.functions.textstats import vocab_df

    return vocab_df(_docs(sf_dir, ["doc_id", "text"]))


def _doc_decontam(sf_dir: str):
    """Benchmark decontamination: documents sharing a token 3-gram
    with the held-out eval slice (doc_id % 97 == 0), with the count of
    DISTINCT matching grams as integer evidence.  Eval gram set is
    small-side broadcast (ray.put once); the corpus streams.  n=3 on
    the 31-word synthetic vocabulary plays the role 13-grams play on
    real text: small enough to produce cross-doc overlap, so the
    result is non-trivially non-empty."""
    import numpy as np
    import pyarrow as pa

    from k_gap_ray.functions.decontam import (eval_ngram_set,
                                              ngram_decontaminate)

    docs = _docs(sf_dir, ["doc_id", "text"]).materialize()

    def mod_filter(keep_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 97 == 0) if keep_eval else (ids % 97 != 0)
            return t.filter(pa.array(m))
        return f

    ev = docs.map_batches(mod_filter(True), batch_format="pyarrow")
    sc = docs.map_batches(mod_filter(False), batch_format="pyarrow")
    return ngram_decontaminate(sc, eval_ngram_set(ev, n=3), n=3)


def _doc_repetition(sf_dir: str):
    """Gopher-style within-doc repetition evidence (top-token count,
    distinct token / 2-gram / 3-gram counts) as exact integers — the
    inputs to duplicate-fraction quality filters."""
    from k_gap_ray.functions.textstats import repetition_scores

    return repetition_scores(_docs(sf_dir, ["doc_id", "text"]))


def _doc_packing(sf_dir: str):
    """Concat-and-chunk sequence packing: each doc's span in the
    doc_id-ordered global token stream and the 512-token training
    sequences it overlaps.  Two-pass distributed prefix sum (bucket
    totals -> broadcast offsets -> per-bucket local cumsum); driver
    state is O(buckets), never O(docs)."""
    from k_gap_ray.functions.packing import pack_sequences
    from k_gap_ray.functions.textstats import token_counts

    tc = token_counts(_docs(sf_dir, ["doc_id", "text"]))
    return pack_sequences(tc, seq_len=512)


def _events_hourly_users(sf_dir: str):
    """Grouped COUNT DISTINCT (A2 x A3): distinct users per hour as a
    two-level aggregate — in-batch pair dedup (vectorized) shrinks the
    stream, groupby(hour,user) finishes the global distinct, and a
    second tiny groupby counts per hour. The exact companion to the
    HLL sketch query."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.relational import _read

    def distinct_pairs(t: pa.Table) -> pa.Table:
        h = pc.floor_temporal(t.column("ts"), unit="hour")
        he = pc.cast(h, pa.int64()).to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, he))
        he_s, u_s = he[order], u[order]
        first = np.ones(len(he_s), dtype=bool)
        first[1:] = (he_s[1:] != he_s[:-1]) | (u_s[1:] != u_s[:-1])
        keep = pa.array(order[first])
        return pa.table({"window_start": h.take(keep),
                         "user_id": t.column("user_id").take(keep)})

    ev = _read(sf_dir, "events", ["ts", "user_id"])
    pairs = ev.map_batches(distinct_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    distinct = pairs.groupby(["window_start", "user_id"]).count()
    return (distinct.select_columns(["window_start"])
            .groupby("window_start").count()
            .rename_columns({"count()": "n_users"}))


def _events_hll_users(sf_dir: str):
    """HyperLogLog distinct-user estimate over events — the mergeable
    cardinality sketch, SQL-mirrored exactly (see functions/sketch.py):
    even the approximate operator is value-verified."""
    from k_gap_ray.functions.sketch import hll_count
    from k_gap_ray.relational import _read

    return hll_count(_read(sf_dir, "events", ["user_id"]), "user_id")


_CMS_PROBES = list(range(40))


def _events_cms_users(sf_dir: str):
    """Count-min frequency sketch over event user_ids, point-queried
    for a fixed probe set (ids 0-39; some absent at small tiers, so
    the zero-cell path is exercised).  Mergeable like the HLL: <= D*W
    rows leave any batch, driver merge bounded by 4096 ints — and the
    31-bit-mix hashes make the whole sketch SQL-mirrorable, so the
    APPROXIMATE estimates are still exactly verified."""
    from k_gap_ray.functions.sketch import cms_estimates
    from k_gap_ray.relational import _read

    return cms_estimates(_read(sf_dir, "events", ["user_id"]),
                         "user_id", _CMS_PROBES)


def _events_props_stats(sf_dir: str):
    """Semi-structured payload analytics (the get_json_object idiom):
    extract the integer `k` field from the flat-JSON props column with
    ONE vectorized RE2 pass fused into the per-batch partial
    aggregate, then a 5-row groupby(event_type) shuffle — the payload
    strings never leave their read batch."""
    from k_gap_ray.functions.jsonx import json_field_stats
    from k_gap_ray.relational import _read

    return json_field_stats(_read(sf_dir, "events",
                                  ["event_type", "props"]),
                            "props", "k", by="event_type")


_FUNNEL_STEPS = ["signup", "view", "purchase"]


def _events_funnel(sf_dir: str):
    """Ordered conversion funnel (signup < view < purchase): greedy
    earliest-completion is exact for the unlimited-window contract, so
    the per-user sequence scan becomes k linear passes of filter ->
    per-batch partial min -> small user-keyed groupby, with the
    reached-set broadcast below cap and hash-joined above it."""
    from k_gap_ray.functions.funnel import funnel_counts
    from k_gap_ray.relational import _read

    return funnel_counts(_read(sf_dir, "events",
                               ["user_id", "event_type", "ts"]),
                         _FUNNEL_STEPS)


_FUNNEL_WINDOW_US = 48 * 3_600_000_000


def _events_funnel_windowed(sf_dir: str):
    """Funnel with a 48h conversion window: greedy-earliest is NOT
    exact under expiry, so each pass carries the full feasible-time
    set (bounded by the step's event count) and gates the next step
    by a two-key searchsorted against the broadcast arrays."""
    from k_gap_ray.functions.funnel import funnel_windowed
    from k_gap_ray.relational import _read

    return funnel_windowed(_read(sf_dir, "events",
                                 ["user_id", "event_type", "ts"]),
                           _FUNNEL_STEPS, window_us=_FUNNEL_WINDOW_US)


def _events_retention(sf_dir: str):
    """Retention cohorts: first-event epoch-day cohort x day-offset
    distinct-active-user counts. Distinct (user, day) rides a
    composite int key (no multi-key groupby); day arithmetic is
    epoch_us // 86.4e9 on both engines — no float rounding."""
    from k_gap_ray.functions.funnel import retention_cohorts
    from k_gap_ray.relational import _read

    return retention_cohorts(_read(sf_dir, "events", ["user_id", "ts"]))


def _events_gap_hist(sf_dir: str):
    """Inter-arrival-time histogram: log-bucketed per-user consecutive
    gaps (bucket = bit_length(gap_seconds + 1)) via the sort+seam
    shape — one range shuffle, vectorized diffs, O(batches) stitch."""
    from k_gap_ray.functions.windows import interevent_gap_hist
    from k_gap_ray.relational import _read

    return interevent_gap_hist(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        "user_id", "ts", "event_id")


def _events_bursts(sf_dir: str):
    """Burst detection: per (type, day) counts vs the trailing 7-day
    baseline as an exact integer permille ratio; one composite-key
    count shuffle, trailing sums folded over <= types x days slim
    rows."""
    from k_gap_ray.functions.funnel import burst_scores
    from k_gap_ray.relational import _read

    return burst_scores(_read(sf_dir, "events", ["event_type", "ts"]))


_PHRASE = "table hash"


def _doc_phrase(sf_dir: str):
    """Quoted-phrase search (the FTS idiom TF-IDF ranking can't
    express): per-doc occurrence counts of a consecutive token
    sequence, one zero-shuffle vectorized n-gram equality pass."""
    from k_gap_ray.functions.search import phrase_search
    from k_gap_ray.relational import _read

    return phrase_search(_read(sf_dir, "documents", ["doc_id", "text"]),
                         _PHRASE)


def _events_wau(sf_dir: str):
    """Rolling 7-day active users: distinct (user, day) and distinct
    (user, window-end) both ride single composite int keys; every
    exchange is bounded by users x days x window, the payload never
    moves."""
    from k_gap_ray.functions.funnel import rolling_active_users
    from k_gap_ray.relational import _read

    return rolling_active_users(_read(sf_dir, "events",
                                      ["user_id", "ts"]), window_days=7)


def _events_transitions(sf_dir: str):
    """User-journey Markov matrix: (prev_type, next_type) counts over
    each user's (ts, id)-ordered stream. Hot-key-safe via the
    (user, day-bucket) pre-split — at most |types|^2 slim rows leave a
    bucket, seams stitched from O(users x buckets) summaries."""
    from k_gap_ray.functions.windows import transition_counts
    from k_gap_ray.relational import _read

    return transition_counts(
        _read(sf_dir, "events",
              ["event_id", "user_id", "event_type", "ts"]),
        "user_id", "ts", "event_id", "event_type")


def _emb_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over int8-quantized vectors, exact
    integers end to end (trunc-division centroid means — DuckDB's
    native // — composite argmin tie rule, empty clusters keep their
    centroid). Each round is one streaming pass emitting a (k x dim)
    partial-sum table per batch."""
    from k_gap_ray.functions.similarity import kmeans_int8
    from k_gap_ray.relational import _read

    return kmeans_int8(_read(sf_dir, "embeddings",
                             ["vec_id", "embedding"]), k=8, iters=2)


def _emb_medoids(sf_dir: str):
    """Cluster exemplars: per k-means cluster the vector closest to
    its centroid (ties to lowest id) — the inspection/labeling handle
    for each cluster. One composite argmin over the streaming
    assignments: min(dist2 * 2^20 + vec_id) per cluster, decomposed
    back; dist2 < 64 * 254^2 and vec_id < 2^20 keep the key exact."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from k_gap_ray.functions.similarity import kmeans_int8
    from k_gap_ray.relational import _read
    from ray.data.aggregate import Min

    assigns = kmeans_int8(_read(sf_dir, "embeddings",
                                ["vec_id", "embedding"]), k=8, iters=2)

    def pack(t: _pa.Table) -> _pa.Table:
        if t.num_rows and (_pc.max(t.column("vec_id")).as_py()
                           >= 1 << 20):
            raise ValueError("vec_id outside the 2^20 composite range")
        comp = _pc.add(_pc.multiply(t.column("dist2"),
                                    _pa.scalar(1 << 20, _pa.int64())),
                       t.column("vec_id"))
        return _pa.table({"cluster": t.column("cluster"), "comp": comp})

    agg = (assigns.map_batches(pack, batch_format="pyarrow")
           .groupby("cluster").aggregate(Min("comp", alias_name="comp")))

    def unpack(t: _pa.Table) -> _pa.Table:
        comp = _pc.cast(t.column("comp"), _pa.int64())
        return _pa.table({
            "cluster": _pc.cast(t.column("cluster"), _pa.int64()),
            "vec_id": _pc.bit_wise_and(comp,
                                       _pa.scalar((1 << 20) - 1,
                                                  _pa.int64())),
            "dist2": _pc.shift_right(comp, _pa.scalar(20, _pa.int64()))})

    return (agg.map_batches(unpack, batch_format="pyarrow")
            .sort("cluster"))


def _emb_cluster_sample(sf_dir: str):
    """Cluster-balanced sampling (the SemDeDup/DoReMi curation move):
    k-means assignments stream straight into the per-stratum cap
    sampler — at most 40 vectors per cluster by seeded 31-bit mix
    rank. Pure composition of two verified operators; the oracle
    nests the kmeans CTE under the window-rank cap."""
    from k_gap_ray.functions.shuffle import stratified_cap
    from k_gap_ray.functions.similarity import kmeans_int8
    from k_gap_ray.relational import _read

    assigns = kmeans_int8(_read(sf_dir, "embeddings",
                                ["vec_id", "embedding"]), k=8, iters=2)
    return stratified_cap(assigns, key_col="cluster", id_col="vec_id",
                          cap=40, seed=11)


def _doc_snapshot_diff(sf_dir: str):
    """Incremental-crawl delta: both engines derive the same OLD
    (drop ids %10==2) and NEW (drop %10==8, append ' v2' to %10==5)
    snapshots from the corpus, then diff by the pinned double rolling
    hash — only (id, h1, h2) enters the full-outer join, never the
    payload."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from k_gap_ray.functions.snapshot import snapshot_diff
    from k_gap_ray.relational import _read

    base = _read(sf_dir, "documents", ["doc_id", "text"])

    def _mod10(col):
        # doc_id % 10 (non-negative ids; pc has no modulo kernel)
        return _pc.subtract(col, _pc.multiply(
            _pc.divide(col, _pa.scalar(10)), _pa.scalar(10)))

    def mk_old(t: _pa.Table) -> _pa.Table:
        return t.filter(_pc.not_equal(_mod10(t.column("doc_id")),
                                      _pa.scalar(2)))

    def mk_new(t: _pa.Table) -> _pa.Table:
        t = t.filter(_pc.not_equal(_mod10(t.column("doc_id")),
                                   _pa.scalar(8)))
        mod = _mod10(t.column("doc_id"))
        txt = _pc.if_else(_pc.equal(mod, _pa.scalar(5)),
                          _pc.binary_join_element_wise(
                              _pc.fill_null(t.column("text"), ""),
                              _pa.scalar(" v2"), ""),
                          t.column("text"))
        return _pa.table({"doc_id": t.column("doc_id"), "text": txt})

    old = base.map_batches(mk_old, batch_format="pyarrow",
                           zero_copy_batch=True)
    new = base.map_batches(mk_new, batch_format="pyarrow",
                           zero_copy_batch=True)
    return snapshot_diff(old, new)


def _doc_bigram_lm(sf_dir: str):
    """Bigram conditional-probability quality score (the word-ORDER
    rung above q_doc_unigram_score): top-2000 adjacent pairs bucketed
    by length(bin((c_xy*1024)//c_first)), scored in one zero-shuffle
    vectorized pass — no float logs on either engine."""
    from k_gap_ray.functions.colloc import bigram_lm_score
    from k_gap_ray.relational import _read

    return bigram_lm_score(_read(sf_dir, "documents", ["doc_id", "text"]),
                           top_pairs=2000)


def _doc_nfc(sf_dir: str):
    """Unicode NFC canonicalization audit. The corpus is pure ASCII,
    so BOTH engines first append the same decomposed suffix (combining
    acute / ring) to fr/de docs — identical construction, then each
    engine runs its own normalizer (unicodedata vs utf8proc) and must
    agree on lengths and changed flags byte-for-byte."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from k_gap_ray.functions.textnorm import nfc_stats
    from k_gap_ray.relational import _read

    # decomposed on purpose: e + COMBINING ACUTE, A + COMBINING RING
    suffix = " cafe\u0301 A\u030a"

    def inject(t: _pa.Table) -> _pa.Table:
        s = _pc.fill_null(t.column("text"), "")
        hit = _pc.is_in(t.column("lang"),
                        value_set=_pa.array(["fr", "de"]))
        raw = _pc.if_else(hit, _pc.binary_join_element_wise(
            s, _pa.scalar(suffix), ""), s)
        return _pa.table({"doc_id": t.column("doc_id"), "raw": raw})

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"]) \
        .map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
    return nfc_stats(ds, "raw", "doc_id")


def _events_hll_by_type(sf_dir: str):
    """Grouped cardinality sketch: one HLL per event type. Register
    partials ride a single composite key (group + register), the
    shuffle is bounded by |groups| * 4096 rows, and the SQL mirror
    reproduces registers AND estimates value-for-value."""
    from k_gap_ray.functions.sketch import hll_count_by
    from k_gap_ray.relational import _read

    return hll_count_by(_read(sf_dir, "events", ["event_type", "user_id"]),
                        "user_id", by="event_type")


def _doc_collocations(sf_dir: str):
    """PMI collocation mining: top adjacent word pairs by a pinned
    fixed-point PMI (nested integer divisions keep every intermediate
    < SCALE * n_bigrams — int64-exact on both engines to ~4.6e12
    corpus bigrams where the naive c*N*SCALE overflows at ~2e6)."""
    from k_gap_ray.functions.colloc import collocations
    from k_gap_ray.relational import _read

    return collocations(_read(sf_dir, "documents", ["doc_id", "text"]),
                        k=30)


def _doc_stratified_sample(sf_dir: str):
    """Per-language cap sampling (corpus balancing): at most 60 docs
    per lang, chosen by seeded 31-bit mix order — per-batch prune
    bounds the shuffle at cap*n_batches rows per key regardless of
    stratum skew, and the SQL window-rank oracle reproduces the exact
    survivor set."""
    from k_gap_ray.functions.shuffle import stratified_cap

    return stratified_cap(_docs(sf_dir, ["doc_id", "lang"]),
                          "lang", "doc_id", cap=60, seed=7)


def _doc_keywords(sf_dir: str):
    """Per-doc top-3 TF-IDF keywords, integer-exact: score = tf *
    bit_length(N//df).  Pairs/df/join/topk are all bounded exchanges
    (no broadcast cap, no driver state); doc-keyed groups are bounded
    by document vocabulary so no hot key exists."""
    from k_gap_ray.functions.textstats import doc_keywords

    return doc_keywords(_docs(sf_dir, ["doc_id", "text"]), k=3)


def _deref_reachable(sf_dir: str):
    """J5 dereference loop driven through the oracle gate: iterative
    cycle-safe frontier expansion over a customer->nation->region edge
    graph, vs a recursive-CTE transitive closure in SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.relational import _read, dereference

    def tag(prefix: str, col):
        return pc.binary_join_element_wise(
            pa.scalar(prefix), pc.cast(col, pa.string()), "")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: pa.table({
            "subj": tag("customer:", t.column("c_custkey")),
            "obj": tag("nation:", t.column("c_nationkey"))}),
            batch_format="pyarrow")
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]) \
        .map_batches(lambda t: pa.table({
            "subj": tag("nation:", t.column("n_nationkey")),
            "obj": tag("region:", t.column("n_regionkey"))}),
            batch_format="pyarrow")
    edges = cust.union(nat)
    seeds = [f"customer:{i}" for i in range(6)]  # c_custkey 0..5
    # depth 3 > graph depth 2: the visited-set cycle guard, not the
    # depth cap, is what terminates the walk
    hops = dereference(edges, seeds, depth=3)
    reached = hops.map_batches(
        lambda t: pa.table({"node": t.column("obj")}),
        batch_format="pyarrow")
    import ray.data as rd

    seed_ds = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.string())}))
    return (reached.union(seed_ds).groupby("node").count()
            .select_columns(["node"]))


SEARCH_TERMS = ["hash", "join", "filter"]
REDACT_RULES = [(r"\bjoin\b", "[OP]"), (r"hash|scan|merge", "[X]")]


def _doc_redact(sf_dir: str):
    """Regex scrubbing pass (PII-masking stand-in): sequential RE2
    rules over the text column, per-rule match counts as integer
    evidence; redacted text + counts compare exactly vs the oracle."""
    import ray.data as rd

    from k_gap_ray.functions.redact import redact

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return redact(ds, REDACT_RULES)


def _doc_search(sf_dir: str):
    """Inverted-index keyword search: top-10 documents by integer
    TF-IDF for a fixed query, bit-identical to the SQL oracle."""
    import ray.data as rd

    from k_gap_ray.functions.search import tfidf_search

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return tfidf_search(ds, SEARCH_TERMS, k=10)


def _pagerank(sf_dir: str):
    """A8-family iterative graph analytics: exact-integer PageRank over
    the order->part bipartite graph (node id = key*2 / key*2+1 so both
    sides share one int64 space).  Fixed 3 iterations, int64 floor-div
    arithmetic -> bit-identical to the chained-CTE DuckDB oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import pagerank_int
    from k_gap_ray.relational import _read

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(lambda t: pa.table({
            "src": pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()),
                               pa.scalar(2, pa.int64())),
            "dst": pc.add(
                pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()),
                            pa.scalar(2, pa.int64())),
                pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow")
    return pagerank_int(edges, iters=3, num_partitions=8)


def _ppr(sf_dir: str):
    """Personalized PageRank (seed-biased ranking, the entity-
    recommendation idiom): teleport mass and initial rank land only on
    the seed nodes — every 97th order — so rank flows outward from the
    personalization set; nodes unreachable from seeds rank 0. Same
    exact-integer recurrence and chained-CTE oracle as q_pagerank."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import pagerank_int
    from k_gap_ray.relational import _read

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(lambda t: pa.table({
            "src": pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()),
                               pa.scalar(2, pa.int64())),
            "dst": pc.add(
                pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()),
                            pa.scalar(2, pa.int64())),
                pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow")

    def seed_scan(t: pa.Table) -> pa.Table:
        col = t.column("l_orderkey")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        k = pc.cast(col, pa.int64())
        mod = pc.subtract(k, pc.multiply(
            pc.divide(k, pa.scalar(97, pa.int64())),
            pa.scalar(97, pa.int64())))
        hit = pc.filter(k, pc.equal(mod, pa.scalar(0, pa.int64())))
        return pa.table({"node": pc.unique(pc.multiply(
            hit, pa.scalar(2, pa.int64())))})

    # the personalization vector is by contract driver-provided
    # (inherently query-sized); derive it here deterministically
    seed_rows = _read(sf_dir, "lineitem", ["l_orderkey"]) \
        .map_batches(seed_scan, batch_format="pyarrow").take_all()
    seeds = sorted({r["node"] for r in seed_rows})
    return pagerank_int(edges, iters=3, num_partitions=8, seeds=seeds)


def _part_affinity(sf_dir: str):
    """Market-basket association rules over order->part baskets:
    top pairs by support with integer confidence/lift (nested
    divisions, int64-exact to ~4.6e15 baskets). Co-occurrence is a
    distributed self hash join on the basket key — no per-basket
    task, no seams; pair counts pre-reduce per batch."""
    from k_gap_ray.functions.basket import association_rules
    from k_gap_ray.relational import _read

    return association_rules(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        "l_orderkey", "l_partkey", k=20)


def _hits(sf_dir: str):
    """Unnormalized integer HITS over the order->part bipartite graph
    (hubs = diversified orders, authorities = popular parts): exact
    int64 recurrence, chained-CTE mirror, same node-id space as
    q_pagerank."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import hits_int
    from k_gap_ray.relational import _read

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(lambda t: pa.table({
            "src": pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()),
                               pa.scalar(2, pa.int64())),
            "dst": pc.add(
                pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()),
                            pa.scalar(2, pa.int64())),
                pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow")
    return hits_int(edges, iters=3, num_partitions=8)


def _emb_near_dup(sf_dir: str):
    import ray.data as rd

    from k_gap_ray.functions.dedup import embedding_near_dup_pairs

    import pyarrow as pa

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(ds, threshold=0.9)
    # near-dup pair sets are tiny by construction; collect into a TYPED
    # table because Ray's Dataset.to_pandas drops the schema of a
    # fully-empty result (and 0 rows is the correct answer here)
    return pa.Table.from_pylist(
        pairs.take_all(),
        schema=pa.schema([("vec_id_a", pa.int64()),
                          ("vec_id_b", pa.int64())]))


def _emb_sim_join(sf_dir: str):
    """Exact all-pairs cosine-similarity join at a threshold too low
    for LSH pruning — the bucketed quadratic path, oracle-verified."""
    import ray.data as rd

    from k_gap_ray.functions.dedup import cosine_pairs_exact

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return cosine_pairs_exact(ds, threshold=0.4, n_buckets=8)


def _emb_dedup_survivors(sf_dir: str):
    """SemDeDup-style embedding dedup: survivors (vec_id, label) after
    dropping every vector with an exact cosine >= 0.4 to a lower-id
    vector. Pair discovery is the bucketed exact quadratic join; the
    drop set is applied as a distributed anti join (no driver-side id
    set). Deterministic min-id-survives rule == SQL NOT EXISTS."""
    import ray.data as rd

    from k_gap_ray.functions.dedup import near_dup_survivors_emb

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    return near_dup_survivors_emb(ds, threshold=0.4, n_buckets=8)


def _emb_centroids(sf_dir: str):
    """Per-label fixed-point centroid evidence (the class-prototype /
    k-means-E-step vector aggregate): (label, dim, sum_fx, n_vecs)
    with sum_fx = sum of floor(component * 1e6) — order-independent
    exact int64, bit-identical to the SQL unnest oracle."""
    import ray.data as rd

    from k_gap_ray.functions.similarity import label_centroids_fx

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    return label_centroids_fx(ds)


def _doc_len_hist(sf_dir: str):
    """Sequence-length histogram (training-data length profiling):
    docs per 50-token bucket. One vectorized token count + one tiny
    bucket-keyed groupby."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.textstats import token_counts

    tc = token_counts(_docs(sf_dir, ["doc_id", "text"]))
    bucketed = tc.map_batches(
        lambda t: pa.table({"bucket": pc.multiply(
            pc.divide(t.column("n_tokens"), pa.scalar(50, pa.int64())),
            pa.scalar(50, pa.int64()))}),
        batch_format="pyarrow")
    return (bucketed.groupby("bucket").count()
            .rename_columns({"count()": "n_docs"}))


def _doc_len_quantiles(sf_dir: str):
    """Exact corpus length percentiles (training-data profiling):
    per-batch value-count partials, one histogram-scale shuffle, a
    streamed cumulative walk. DuckDB quantile_disc semantics."""
    from k_gap_ray.functions.quantiles import exact_quantiles

    return exact_quantiles(_docs(sf_dir, ["n_chars"]), "n_chars")


def _doc_len_quantiles_by_lang(sf_dir: str):
    """Per-language exact length percentiles: keyed histogram
    partials, one groupby(lang) shuffle at histogram scale, the
    cumulative walk inside map_groups."""
    from k_gap_ray.functions.quantiles import grouped_quantiles

    return grouped_quantiles(_docs(sf_dir, ["lang", "n_chars"]),
                             "lang", "n_chars")


def _doc_winnow(sf_dir: str):
    """Winnowing fingerprints (the MOSS sketch, Schleimer et al. 2003)
    per document: rightmost-min selection over 5-gram-hash windows,
    composite-key exact on both engines; output = per-doc fingerprint
    count + hash sum. One stateless map_batches pass, no shuffle."""
    from k_gap_ray.functions.textstats import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir, ["doc_id", "text"]),
                               k=4, w=5)


def _doc_sim_pairs(sf_dir: str):
    """TF-IDF weighted document-similarity join over 4-gram shingles:
    top-20 pairs by the integer weighted-overlap score
    sum(min(tf_a, tf_b) * idf_int) over shared shingles with
    2 <= df <= 100 (the PPJoin-style frequency cut that bounds pair
    fan-out and drops boilerplate). The min-tf form stays int64-exact
    where an integer tf-idf dot product overflows at ~1e5 docs. n=4
    (not 3) is the scale choice: 3-gram df on this corpus is dense
    enough that the pair join degenerates toward all-pairs at the
    5000-doc tier (measured 38.8s vs 5.8s, both oracle-identical)."""
    from k_gap_ray.functions.search import tfidf_sim_pairs

    return tfidf_sim_pairs(_docs(sf_dir, ["doc_id", "text"]),
                           topk=20, df_cap=100, n=4)


def _doc_incr_neardup(sf_dir: str):
    """Incremental NEAR-dup against a persisted MinHash band index:
    'yesterday's' docs (doc_id % 3 != 0) are banded into
    bucket-partitioned parquet, 'today's' batch probes it with one
    band_key hash join, and only candidates reach the exact-Jaccard
    verification (threshold 0.5, 3-gram shingles — the pinned minhash
    shape). Oracle: brute-force exact Jaccard across the split; LSH
    recall at 64x2 banding is full on this corpus, the same contract
    q_doc_minhash_pairs relies on."""
    import tempfile

    import pyarrow.compute as pc

    from k_gap_ray.state.fingerprints import (incremental_near_dup,
                                              init_band_index)

    def split(want_zero: bool):
        def f(t):
            import pyarrow as pa

            k = pc.cast(t.column("doc_id"), pa.int64())
            mod = pc.subtract(k, pc.multiply(
                pc.divide(k, pa.scalar(3, pa.int64())),
                pa.scalar(3, pa.int64())))
            m = pc.equal(mod, pa.scalar(0, pa.int64()))
            return t.filter(m if want_zero else pc.invert(m))
        return _docs(sf_dir, ["doc_id", "text"]).map_batches(
            f, batch_format="pyarrow")

    index = tempfile.mkdtemp(prefix="kgap_band_index_")
    init_band_index(split(False), index)
    return incremental_near_dup(split(True), index,
                                _docs(sf_dir, ["doc_id", "text"]),
                                threshold=0.5, append=False)


def _events_kmv(sf_dir: str):
    """KMV (bottom-k) distinct sketches with the SET OPERATION HLL
    registers cannot express: distinct clickers, distinct purchasers,
    and the estimated overlap between them — k=64 so both sketches
    run the real estimation path at every tier (the exact-undersized
    branch is pytest-pinned). Deterministic murmur mix, integer
    estimates, value-identical SQL mirror."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.sketch import (kmv_estimate,
                                            kmv_intersect_estimate,
                                            kmv_sketch)
    from k_gap_ray.relational import _read

    def subset(etype: str):
        return _read(sf_dir, "events", ["user_id", "event_type"]) \
            .map_batches(
                lambda t, e=etype: t.filter(pc.equal(
                    t.column("event_type"), e)).select(["user_id"]),
                batch_format="pyarrow")

    k = 64
    sa = kmv_sketch(subset("click"), "user_id", k=k)
    sb = kmv_sketch(subset("purchase"), "user_id", k=k)
    return pa.table({
        "est_a": pa.array([kmv_estimate(sa, k)], pa.int64()),
        "est_b": pa.array([kmv_estimate(sb, k)], pa.int64()),
        "est_common": pa.array([kmv_intersect_estimate(sa, sb, k)],
                               pa.int64())})


def _customer_deciles(sf_dir: str):
    """Revenue-concentration (Pareto) report: customers decile'd by
    total order revenue DESC (global NTILE(10) via the hot-key-safe
    value-bucket machinery — one key holding every customer is
    exactly the skew it pre-splits), then per-decile customer count +
    exact fixed-point revenue. Answers 'what share do the top 10%
    hold' with no float drift."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets
    from k_gap_ray.functions.windows import ntile_bucketed
    from k_gap_ray.relational import _read, scaled_int_col

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cents = orders.map_batches(
        lambda t: scaled_int_col(
            pa.table({"o_custkey": pc.cast(t.column("o_custkey"),
                                           pa.int64())}),
            "rev_p", t.column("o_totalprice"), 100),
        batch_format="pyarrow")
    per_cust = (cents.groupby("o_custkey")
                .aggregate(Sum("rev_p", alias_name="rev_s")))
    base = per_cust.map_batches(
        lambda t: pa.table({
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "rev_s": pc.cast(t.column("rev_s"), pa.int64()),
            "negv": pc.negate(pc.cast(t.column("rev_s"), pa.int64())),
            "__g": pa.array(["all"] * t.num_rows, pa.string())}),
        batch_format="pyarrow")
    base = drop_empty_blocks(base.materialize())
    tiles = ntile_bucketed(base, key_col="__g", value_col="negv",
                           id_col="o_custkey", k=10,
                           out_col="decile", scale=1,
                           bucket_width=1 << 20)
    tiles = drop_empty_blocks(tiles.materialize())
    joined = join_datasets(tiles, base.select_columns(
        ["o_custkey", "rev_s"]), on="o_custkey",
        scrub_left=False, scrub_right=False)
    out = (joined.groupby("decile")
           .aggregate(Count(alias_name="n_customers"),
                      Sum("rev_s", alias_name="rev_s")))
    return out.map_batches(
        lambda t: pa.table({
            "decile": pc.cast(t.column("decile"), pa.int64()),
            "n_customers": pc.cast(t.column("n_customers"), pa.int64()),
            "revenue": pc.divide(
                pc.cast(t.column("rev_s"), pa.float64()),
                pa.scalar(100.0))}),
        batch_format="pyarrow")


def _profile_orders(sf_dir: str):
    """ANALYZE-style per-column profile of the orders table (A7
    statistics-report family): row/null/exact-distinct counts and
    min/max in one pinned int64 encoding (floats as cents, timestamps
    as epoch micros; strings report min_str/max_str). ONE streaming
    pass, no shuffle; distinct sets driver-merged under an explicit
    cap."""
    import ray.data as rd

    from k_gap_ray.functions.profile import profile_table

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    ds = _read_pq(f"{sf_dir}/orders.parquet", columns=cols)
    return profile_table(ds, cols)


def _doc_weighted_sample(sf_dir: str):
    """Per-row weighted Bernoulli downsampling (the CCNet-style
    quality-proportional keep, here length-proportional): keep
    probability permille = min(1000, 10 * n_tokens), decided by the
    seeded 31-bit mix of doc_id — deterministic, shuffle-free, and
    re-derivable per row for audits."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.ops.transform import weighted_hash_sample

    def add_w(t: pa.Table) -> pa.Table:
        text = t.column("text")
        spaces = pc.count_substring(text, pattern=" ")
        nonempty = pc.cast(pc.greater(pc.utf8_length(text), 0),
                           pa.int64())
        n = pc.add(pc.cast(spaces, pa.int64()), nonempty)
        w = pc.min_element_wise(pa.scalar(1000, pa.int64()),
                                pc.multiply(n, pa.scalar(10, pa.int64())))
        return pa.table({"doc_id": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "w": w})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_w, batch_format="pyarrow")
    return weighted_hash_sample(ds, "doc_id", "w", seed=5)


def _doc_bm25(sf_dir: str):
    """BM25-rational top-10 for the shared SEARCH_TERMS query: k1=6/5
    and b=3/4 kept as exact fractions, the per-term score one int64
    floor division with fractions cleared — the IR ranking function
    tfidf_search's linear weighting cannot express (document-length
    normalization + tf saturation), exact on both engines."""
    from k_gap_ray.functions.search import bm25_search

    return bm25_search(_docs(sf_dir, ["doc_id", "text"]),
                       SEARCH_TERMS, k=10)


def _doc_mlt(sf_dir: str):
    """More-like-this retrieval for doc 7: top-10 docs by the
    min-tf-weighted shared-shingle score — the per-query form of
    q_doc_sim_pairs with the source's shingle profile broadcast as
    query state (no pair join: one df shuffle over the matched stream
    plus one scoring pass)."""
    from k_gap_ray.functions.search import more_like_this

    return more_like_this(_docs(sf_dir, ["doc_id", "text"]),
                          source_doc_id=7, topk=10)


def _doc_facets(sf_dir: str):
    """Faceted search counts — the facet panel beside the result
    list: for documents matching ANY of the shared SEARCH_TERMS,
    match counts by language. One pass: the per-doc any-term test is
    a vectorized token is_in + per-doc window-any, the facet rollup a
    tiny (lang) groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from k_gap_ray.functions.textstats import _tokens_of

    tset = pa.array(sorted(set(SEARCH_TERMS)), pa.string())

    def f(t: pa.Table) -> pa.Table:
        flat, counts, _ = _tokens_of(t.column("text"))
        if len(flat) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "np_": pa.array([], pa.int64())})
        hit = pc.is_in(flat, value_set=tset).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64),
                            counts)
        per_doc = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(per_doc, doc_idx, hit)
        m = per_doc > 0
        langs = pc.cast(t.column("lang"), pa.string()).combine_chunks() \
            .to_numpy(zero_copy_only=False)[m]
        uniq, c = np.unique(langs, return_counts=True)
        return pa.table({"lang": pa.array(uniq, pa.string()),
                         "np_": pa.array(c.astype(np.int64),
                                         pa.int64())})

    return (_docs(sf_dir, ["doc_id", "lang", "text"])
            .map_batches(f, batch_format="pyarrow")
            .groupby("lang").aggregate(Sum("np_",
                                           alias_name="n_matches")))


def _doc_snippets(sf_dir: str):
    """Search-result snippet extraction for the shared SEARCH_TERMS:
    per matching doc, the 8-token span with the most query-term hits
    (leftmost tie). One shuffle-free pass: vectorized indicator,
    cumulative-sum window scores, lexsort argmax; only winning spans
    pay the string join."""
    from k_gap_ray.functions.search import best_snippets

    return best_snippets(_docs(sf_dir, ["doc_id", "text"]),
                         SEARCH_TERMS, window=8)


def _doc_kwic(sf_dir: str):
    """Keyword-in-context concordance for 'spark' with ±3 tokens of
    clamped context — the notebook analyst's mention-inspection
    surface. One shuffle-free map_batches pass; only hit rows pay the
    context join (term-frequency-bounded)."""
    from k_gap_ray.functions.search import kwic

    return kwic(_docs(sf_dir, ["doc_id", "text"]), "spark", window=3)


def _doc_top_terms(sf_dir: str):
    """Per-language top-5 tokens by count (the grouped heavy-hitters
    report): composite-key partial counts -> one groupby sum; after
    that exact aggregation a per-batch top-k cut is a sound superset
    filter, so the driver merge sees k x groups x blocks rows, never
    the vocabulary. Rank pinned by (count DESC, token ASC) on both
    engines."""
    from k_gap_ray.functions.textstats import top_terms_by_group

    return top_terms_by_group(_docs(sf_dir, ["lang", "text"]), k=5)


def _doc_incr_dedup(sf_dir: str):
    """Incremental dedup against a PERSISTED fingerprint store (the
    cross-poll D1 'no duplicate ingestion' semantics): the store is
    built from 'yesterday's' docs (doc_id % 3 != 0) as hash-bucketed
    parquet, then 'today's' batch (doc_id % 3 == 0) streams against it
    — one store hash join + one first-occurrence groupby — and novel
    fingerprints are appended. Fingerprint = sha256 of the first-8-
    token head key (bit-identical to DuckDB's sha256), statuses pinned
    to dup_store > novel/dup_batch."""
    import tempfile

    import pyarrow.compute as pc

    from k_gap_ray.state.fingerprints import (incremental_dedup,
                                              init_fingerprint_store)

    def split(want_zero: bool):
        def f(t):
            import pyarrow as pa

            k = pc.cast(t.column("doc_id"), pa.int64())
            mod = pc.subtract(k, pc.multiply(
                pc.divide(k, pa.scalar(3, pa.int64())),
                pa.scalar(3, pa.int64())))
            m = pc.equal(mod, pa.scalar(0, pa.int64()))
            return t.filter(m if want_zero else pc.invert(m))
        return _docs(sf_dir, ["doc_id", "text"]).map_batches(
            f, batch_format="pyarrow")

    old = split(False)
    new = split(True)
    store = tempfile.mkdtemp(prefix="kgap_fp_store_")
    init_fingerprint_store(old, store, prefix_tokens=8)
    return incremental_dedup(new, store, prefix_tokens=8)


def _doc_oov(sf_dir: str):
    """Per-doc out-of-vocabulary stats vs the corpus top-500
    vocabulary (vocabulary-coverage quality filter): two streaming
    passes, the top-K cut broadcast, integer-exact per-mille rate."""
    from k_gap_ray.functions.textstats import oov_rate

    return oov_rate(_docs(sf_dir, ["doc_id", "text"]), vocab_size=500)


def _doc_vocab_coverage(sf_dir: str):
    """Tokenizer coverage curve: minimal vocab size covering 50/90/
    95/99% of token occurrences.  The vocabulary stream is reduced to
    its tf-DISTRIBUTION (<= ~2*sqrt(N) rows by construction) via
    per-batch np.unique partials, so no vocabulary-scale sort and no
    driver state at vocabulary scale; in-run crossings are solved
    arithmetically."""
    from k_gap_ray.functions.textstats import vocab_coverage

    return vocab_coverage(_docs(sf_dir, ["doc_id", "text"]))


def _doc_chunks(sf_dir: str):
    """Sliding-window token chunking (RAG / context packing): 32-token
    windows advancing by 24 (8-token overlap), tail chunks kept.  One
    vectorized map_batches — no shuffle; expansion bounded by
    ~size/stride by construction."""
    from k_gap_ray.functions.chunking import chunk_spans

    return chunk_spans(_docs(sf_dir, ["doc_id", "text"]),
                       size=32, stride=24)


def _doc_unigram_score(sf_dir: str):
    """Corpus-trained unigram log-frequency quality score (the cheap
    KenLM stand-in): integer bit_length(tf) buckets, top-500
    vocabulary broadcast, one vectorized scoring pass — exact on both
    backends (no float logs anywhere)."""
    from k_gap_ray.functions.textstats import unigram_lm_score

    return unigram_lm_score(_docs(sf_dir, ["doc_id", "text"]),
                            vocab_size=500)


def _doc_heavy_hitters(sf_dir: str):
    """EXACT top-20 corpus tokens via Misra-Gries candidate pruning +
    a broadcast exact-verify pass: <= `counters` rows leave any batch
    in pass A regardless of vocabulary size, and the result is
    certified against the integer pruning bound (full-vocabulary
    fallback when the bound isn't beaten — exactness never depends on
    tuning)."""
    from k_gap_ray.functions.heavy import heavy_hitters

    return heavy_hitters(_docs(sf_dir, ["doc_id", "text"]),
                         k=20, counters=64)


def _doc_dup_spans(sf_dir: str):
    """Cross-document duplicated 8-gram spans (ExactSubstr-style
    boilerplate evidence): token 8-grams occurring in >= 2 distinct
    documents, with their document frequency."""
    from k_gap_ray.functions.textstats import dup_ngram_spans

    return dup_ngram_spans(_docs(sf_dir, ["doc_id", "text"]),
                           n=8, min_docs=2)


def _part_fuzzy_pairs(sf_dir: str):
    """Edit-distance fuzzy join over the DISTINCT part-name vocabulary
    (typo/variant surface matching): name pairs within Levenshtein 2.
    Bucket-pair-replicated exact quadratic over the vocabulary, banded
    vectorized DP; the oracle is DuckDB's levenshtein()."""
    import ray.data as rd

    from k_gap_ray.functions.dedup import fuzzy_name_pairs

    ds = _read_pq(f"{sf_dir}/part.parquet", columns=["p_name"])
    return fuzzy_name_pairs(ds, "p_name", max_dist=2)


def _knn(sf_dir: str):
    from k_gap_ray.functions.similarity import knn_by_id

    return knn_by_id(sf_dir, query_vec_id=0, k=10)


def _knn_filtered(sf_dir: str):
    """Filtered vector search (the metadata-predicate ANN idiom):
    exact quantized top-10 among vectors with label IN (1, 2), the
    predicate applied INSIDE the per-batch scoring pass (pre-filter —
    exact recall over the filtered set, unlike post-filtering a global
    top-k)."""
    import numpy as np
    import pyarrow as _pa
    import ray.data as rd

    from k_gap_ray.functions.similarity import knn_filtered

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    qrow = ds.map_batches(
        lambda t: t.filter(_pa.compute.equal(t.column("vec_id"),
                                             _pa.scalar(0))),
        batch_format="pyarrow").take_all()
    q = np.asarray(qrow[0]["embedding"], np.float64)
    return knn_filtered(ds, q, labels=(1, 2), k=10, exclude_ids={0})


def _knn_mmr(sf_dir: str):
    """MMR diverse top-5 over the int8 top-20 retrieval (query =
    vector 0): greedy rel-minus-max-sim re-ranking with exact integer
    scores — the coverage-over-redundancy re-ranker, deterministic on
    both engines via the pinned tie order."""
    import numpy as np
    import pyarrow as _pa
    import ray.data as rd

    from k_gap_ray.functions.similarity import mmr_select

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = ds.map_batches(
        lambda t: t.filter(_pa.compute.equal(t.column("vec_id"),
                                             _pa.scalar(0))),
        batch_format="pyarrow").take_all()
    q = np.asarray(qrow[0]["embedding"], np.float64)
    return mmr_select(ds, q, k_candidates=20, k_select=5,
                      exclude_ids={0})


def _knn_rrf(sf_dir: str):
    """Reciprocal Rank Fusion of two int8 retrievals (query vectors 0
    and 1, top-20 each): the multi-query hybrid-search combiner —
    integer RRF_SCALE // (60 + rank) partial scores summed per id,
    fused top-10 by (score DESC, id). Rank-only fusion needs no score
    calibration between the lists."""
    import numpy as np
    import pyarrow as _pa
    import ray.data as rd

    from k_gap_ray.functions.similarity import knn_quantized, rrf_fuse

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qs = {}
    for qid in (0, 1):
        row = ds.map_batches(
            lambda t, q=qid: t.filter(
                _pa.compute.equal(t.column("vec_id"), _pa.scalar(q))),
            batch_format="pyarrow").take_all()
        qs[qid] = np.asarray(row[0]["embedding"], np.float64)
    lists = [knn_quantized(ds, qs[qid], k=20, exclude_ids={0, 1})
             for qid in (0, 1)]
    return rrf_fuse(lists, topk=10)


def _knn_quantized(sf_dir: str):
    """int8-quantized top-k (the 4x-memory scale path): exact integer
    dot products over floor-quantized vectors, value-hash-identical to
    the DuckDB list_inner_product oracle — the quantization scheme is
    defined to be bit-identical across engines
    (functions/similarity.py:quantize_int8)."""
    import numpy as np
    import pyarrow as _pa
    import ray.data as rd

    from k_gap_ray.functions.similarity import knn_quantized

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = ds.map_batches(
        lambda t: t.filter(_pa.compute.equal(t.column("vec_id"),
                                             _pa.scalar(0))),
        batch_format="pyarrow").take_all()
    q = np.asarray(qrow[0]["embedding"], np.float64)
    return knn_quantized(ds, q, k=10, exclude_ids={0})


def _knn_lsh(sf_dir: str):
    """LSH ANN top-10: fixed-point hyperplane signatures over
    int8-quantized vectors, Hamming-radius-1 multi-probe, exact
    integer scoring inside the probed buckets — every step is
    integer-exact, so the DuckDB mirror (sql_knn_lsh) recomputes the
    identical result and the gate is a full value-hash check."""
    import numpy as np
    import pyarrow as _pa
    import ray.data as rd

    from k_gap_ray.functions.similarity import knn_lsh

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = ds.map_batches(
        lambda t: t.filter(_pa.compute.equal(t.column("vec_id"),
                                             _pa.scalar(0))),
        batch_format="pyarrow").take_all()
    q = np.asarray(qrow[0]["embedding"], np.float64)
    return knn_lsh(ds, q, k=10, radius=1, exclude_ids={0})


def _knn_ivf(sf_dir: str):
    """IVF ANN query over a persisted centroid-partitioned index
    (built once per sf tier under /tmp) using the DETERMINISTIC int8
    quantizer (centroids = vectors with vec_id < 8, max-inner-product
    assignment): the query reads only its n_probe partitions, and the
    DuckDB mirror (sql_knn_ivf) recomputes assignment + probe + top-k
    in exact integer arithmetic — full value-hash at the gate. The
    k-means trainer (build_ivf_index) remains the scale path, pinned
    by tests/test_functions.py::test_ivf_index_build_and_query."""
    import numpy as np
    import pyarrow as _pa
    import ray.data as rd

    from k_gap_ray.functions.similarity import (build_ivf_index_int8,
                                                knn_ivf_int8)

    idx_dir = f"/tmp/kgap_ivf8/sf{_sf_of(sf_dir)}"
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    if not os.path.exists(f"{idx_dir}/centroids_int8.npz"):
        # build into a fresh temp dir, publish with one atomic rename:
        # a crash mid-build must never leave partial partition files
        # that a rebuild would APPEND to (write_parquet doesn't clear
        # the dir -> duplicate vec_ids in every probe; review finding)
        tmp = f"{idx_dir}.build.{os.getpid()}"
        import shutil as _sh

        _sh.rmtree(idx_dir, ignore_errors=True)  # stale partial build
        _sh.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        build_ivf_index_int8(ds, tmp, n_centroids=8)
        os.makedirs(os.path.dirname(idx_dir), exist_ok=True)
        try:
            os.rename(tmp, idx_dir)
        except OSError:
            _sh.rmtree(tmp, ignore_errors=True)  # lost a concurrent race
    qrow = ds.map_batches(
        lambda t: t.filter(_pa.compute.equal(t.column("vec_id"),
                                             _pa.scalar(0))),
        batch_format="pyarrow").take_all()
    q = np.asarray(qrow[0]["embedding"], np.float64)
    return knn_ivf_int8(idx_dir, q, k=10, n_probe=4, exclude_ids={0})


def _doc_lang_stats(sf_dir: str):
    """Grouped doc stats (A5/A3). avg_chars is an exact int64 sum over
    integral values divided once — bit-identical to the SQL oracle."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Count, Max, Sum

    out = (_docs(sf_dir, ["lang", "n_chars"])
           .groupby("lang").aggregate(
               Count(alias_name="n_docs"),
               Sum("n_chars", alias_name="avg_chars"),
               Max("n_chars", alias_name="max_chars")))

    def finish(t: pa.Table) -> pa.Table:
        avg = (t.column("avg_chars").to_numpy(zero_copy_only=False)
               .astype(np.float64)
               / t.column("n_docs").to_numpy(zero_copy_only=False))
        return t.set_column(t.column_names.index("avg_chars"), "avg_chars",
                            pa.array(avg, pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow")


def _doc_source_counts(sf_dir: str):
    import ray.data as rd

    return (_docs(sf_dir, ["source"]).groupby("source").count()
            .rename_columns({"count()": "n"}))


_DOCS_KG_CACHE: dict[str, Any] = {}


def _docs_kg_run(sf_dir: str) -> dict[str, Any]:
    """Docs-derived KG pipeline products, built ONCE per sf tier:
    seven gate queries (kg_docs_* + the four SPARQL queries) consume
    the same run, so re-executing the full extract->annotate->
    canonicalize pipeline per query would multiply gate wall time by
    7 for no information."""
    import ray.data as rd

    from k_gap_ray.pipelines.docs_kg import run_docs_pipeline

    if sf_dir not in _DOCS_KG_CACHE:
        docs = _read_pq(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])
        res = run_docs_pipeline(docs)
        res["triples"] = res["triples"].materialize()
        _DOCS_KG_CACHE[sf_dir] = res
    return _DOCS_KG_CACHE[sf_dir]


def _docs_quads(sf_dir: str):
    return _docs_kg_run(sf_dir)["triples"]


def _kg_docs_triples(sf_dir: str):
    """The REAL extract->annotate->canonicalize->materialize pipeline
    over a pages corpus derived deterministically from the registered
    documents table — the one KG product the gate can value-hash
    against a pure-SQL reconstruction (pipelines/docs_kg.py)."""
    return _docs_quads(sf_dir)


DOCS_SPARQL = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?b ?loc WHERE {
  ?a kp:collaboratesWith ?b .
  ?a kp:locatedIn ?loc .
  FILTER (CONTAINS(?loc, "marine") || CONTAINS(?loc, "okafor"))
}
"""


def _sparql_docs(sf_dir: str):
    """S3 SPARQL SELECT executed natively on Ray Data (k_gap_ray.sparql)
    over the docs-derived canonical quad set; the oracle compiles the
    SAME query to SQL over the quads reconstruction
    (pipelines/docs_kg.py:sql_docs_sparql). Reference parity:
    jupyter/kgap/notebooks/kgap_tools.py:22-31 (SPARQL SELECT against
    the graph store)."""
    from k_gap_ray.sparql import sparql_select

    import pyarrow as _pa

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL)
    # DISTINCT result is result-set-scale; pin the schema through the
    # driver edge (an empty Dataset loses its schema in to_pandas)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("b", _pa.string()),
                           ("loc", _pa.string())]))


DOCS_SPARQL_AGG = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?loc (COUNT(?a) AS ?n) WHERE {
  ?a kp:locatedIn ?loc .
  OPTIONAL { ?a kp:employs ?emp . }
} GROUP BY ?loc
"""


def _sparql_docs_agg(sf_dir: str):
    """SPARQL OPTIONAL (left join) + grouped COUNT over the
    docs-derived quads, against the same compiled-SQL oracle."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_AGG)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("loc", _pa.string()), ("n", _pa.int64())]))


DOCS_SPARQL_UNION = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?v WHERE {
  { ?a kp:funds ?v . }
  UNION
  { ?a kp:manages ?v . FILTER (REGEX(?v, "marine|fund")) }
}
"""


def _sparql_docs_union(sf_dir: str):
    """SPARQL UNION (bag union of two BGP branches) with a REGEX
    branch filter over the docs-derived quads; the oracle compiles the
    SAME query to UNION ALL SQL (sparql_to_sql)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_UNION)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("v", _pa.string())]))


DOCS_SPARQL_NOTEXISTS = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?b WHERE {
  ?a kp:funds ?b .
  FILTER NOT EXISTS { ?b kp:funds ?a . }
}
"""


def _sparql_docs_notexists(sf_dir: str):
    """SPARQL FILTER NOT EXISTS (correlated anti-join on BOTH vars —
    the composite-key path) over the docs-derived quads: non-mutual
    funding pairs; the oracle is the compiled NOT EXISTS SQL."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_NOTEXISTS)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("b", _pa.string())]))


DOCS_SPARQL_PATH = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?loc WHERE {
  ?a kp:funds+/kp:locatedIn ?loc .
}
"""


def _sparql_docs_path(sf_dir: str):
    """SPARQL property path over the docs-derived quads: the funds+
    transitive closure (semi-naive Dataset iteration, cycle-safe)
    composed with a locatedIn hop (sequence-path desugaring). The
    oracle compiles the SAME query to a recursive-CTE SQL closure
    (sparql.py:_group_sql). Reference parity: GraphDB property-path
    queries, jupyter/kgap/notebooks/kgap_tools.py:22-31."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_PATH)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("loc", _pa.string())]))


_TRI_PREDS = ("urn:kgap:pred:collaboratesWith",
              "urn:kgap:pred:partnersWith")


def _triangles(sf_dir: str):
    """A8-family graph analytics #3 (after connected components and
    PageRank): exact triangle count over the docs-derived
    collaboration graph (collaboratesWith ∪ partnersWith, undirected).
    Ray side = degree-ordered compact-forward wedge join
    (functions/graph.py:triangle_count); oracle = orientation-free
    a<b<c triple self-join over the SQL quads reconstruction — two
    independent algorithms, one exact count."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import triangle_count

    edges = _docs_quads(sf_dir).map_batches(
        lambda t: (lambda m: pa.table(
            {"src": t.column("subj").filter(m),
             "dst": t.column("obj").filter(m)}))(
            pc.is_in(t.column("pred"),
                     value_set=pa.array(_TRI_PREDS))),
        batch_format="pyarrow")
    return triangle_count(edges)


def _collab_edges(sf_dir: str):
    """The docs-derived collaboration graph (collaboratesWith ∪
    partnersWith) as a (src, dst) Dataset — the shared edge set of the
    undirected-structure family (triangles / k-core / clustering /
    link prediction)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return _docs_quads(sf_dir).map_batches(
        lambda t: (lambda m: pa.table(
            {"src": t.column("subj").filter(m),
             "dst": t.column("obj").filter(m)}))(
            pc.is_in(t.column("pred"),
                     value_set=pa.array(_TRI_PREDS))),
        batch_format="pyarrow")


def _kcore(sf_dir: str):
    """A8-family graph analytics: fixed-round k-core peeling over the
    collaboration graph (the dense-collaborator subgraph a KG analyst
    extracts before community analysis). k=2, 6 peeling rounds pinned
    on both engines; output = degree table of the surviving subgraph.
    Oracle: chained peeling CTEs (pipelines/docs_kg.sql_docs_kcore)."""
    from k_gap_ray.functions.graph import kcore_nodes

    return kcore_nodes(_collab_edges(sf_dir), k=2, rounds=6)


def _clustering(sf_dir: str):
    """Per-node local clustering coefficient (integer permille) over
    the collaboration graph: degree-ordered compact-forward wedge join
    crediting all three triangle nodes. Oracle: orientation-free
    triple self-join (pipelines/docs_kg.sql_docs_clustering) — a
    different algorithm, identical integers."""
    from k_gap_ray.functions.graph import clustering_coef

    return clustering_coef(_collab_edges(sf_dir))


_LP_PREDS = ("urn:kgap:pred:employs", "urn:kgap:pred:foundedIn")


def _link_pred(sf_dir: str):
    """Resource-Allocation link prediction over the employs∪foundedIn
    affiliation graph (org—person/place incidence, so distance-2
    candidates are orgs sharing staff or founders — the classic
    who-should-link suggestion): top-20 non-adjacent pairs by the
    exact-integer RA score sum(scale // deg(w)). The denser
    collaboration graph is the WRONG input here — at 15 entities it is
    near-complete, leaving no non-adjacent distance-2 pairs. Hub
    centers above center_cap are skipped on both engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import ra_link_pred

    edges = _docs_quads(sf_dir).map_batches(
        lambda t: (lambda m: pa.table(
            {"src": t.column("subj").filter(m),
             "dst": t.column("obj").filter(m)}))(
            pc.is_in(t.column("pred"),
                     value_set=pa.array(_LP_PREDS))),
        batch_format="pyarrow")
    return ra_link_pred(edges, topk=20)


def _walks(sf_dir: str):
    """Deterministic hash-argmin 'random' walks (the reproducible
    node2vec/DeepWalk sampling primitive) over the directed
    collaboration graph, seeded at the manager entities: at step i the
    walk moves to the out-neighbor minimizing the seeded 31-bit mix of
    (node-hash, step, neighbor-hash), ties to the lexicographically
    smallest — bit-identical trajectories on any engine or cluster
    size. Oracle: chained candidate-join/argmin CTEs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import deterministic_walks

    quads = _docs_quads(sf_dir)
    seeds = quads.map_batches(
        lambda t: pa.table({"node": t.column("subj").filter(
            pc.equal(t.column("pred"), "urn:kgap:pred:manages"))}),
        batch_format="pyarrow")
    return deterministic_walks(_collab_edges(sf_dir), seeds,
                               steps=5, seed=4)


def _degree_hist(sf_dir: str):
    """Log2-bucketed degree histogram over the order-part bipartite
    graph — the power-law shape report run before sizing shuffles and
    hub caps on a new graph. Exact integer buckets (shift-verified
    log2 on the engine, length(bin(deg))-1 in SQL)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import degree_histogram
    from k_gap_ray.relational import _read

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(lambda t: pa.table({
            "src": pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()),
                               pa.scalar(2, pa.int64())),
            "dst": pc.add(
                pc.multiply(pc.cast(t.column("l_partkey"), pa.int64()),
                            pa.scalar(2, pa.int64())),
                pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow")
    return degree_histogram(edges)


def _communities(sf_dir: str):
    """Deterministic synchronous label-propagation communities over
    the employs∪foundedIn affiliation graph: fixed 4 rounds, most-
    frequent-neighbor-label updates with min-label ties — the
    reproducible form of the classic LPA community detector (random
    order/tie-breaks would defeat the two-engine value hash)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import label_propagation

    edges = _docs_quads(sf_dir).map_batches(
        lambda t: (lambda m: pa.table(
            {"src": t.column("subj").filter(m),
             "dst": t.column("obj").filter(m)}))(
            pc.is_in(t.column("pred"),
                     value_set=pa.array(_LP_PREDS))),
        batch_format="pyarrow")
    return label_propagation(edges, rounds=4)


def _ktruss(sf_dir: str):
    """Fixed-round k-truss peeling over the collaboration graph — the
    EDGE-cohesion complement to q_kcore (edges must sit in >= k-2
    triangles to survive): the densest-collaboration backbone a KG
    community analysis keeps. Compact-forward support counting on the
    engine, orientation-free triple-join recount in the mirror."""
    from k_gap_ray.functions.graph import ktruss_edges

    return ktruss_edges(_collab_edges(sf_dir), k=4, rounds=3)


def _kg_negatives(sf_dir: str):
    """Deterministic corrupted-triple negative sampling over the docs
    KG (the TransE/DistMult training-data op): object vocabulary
    hash-bucketed, each triple draws its corruption bucket from the
    seeded mix of its own hashes, filtered setting drops true-triple
    collisions — reproducible on any engine or cluster size."""
    from k_gap_ray.functions.graph import negative_samples

    return negative_samples(_docs_quads(sf_dir), seed=11, n_buckets=16)


def _bfs_depths(sf_dir: str):
    """J5-family multi-source BFS with min-depth labels over the
    docs-derived funding graph: seeds = all managers (subjects of
    `manages` edges, depth 0), edges = `funds`. Ray side = semi-naive
    frontier iteration with Dataset-resident seeds
    (functions/graph.py:bfs_depths); oracle = depth-bounded recursive
    CTE + GROUP BY min over the SQL quads reconstruction."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import bfs_depths

    quads = _docs_quads(sf_dir)

    def edge_scan(pred):
        def scan(t):
            m = pc.equal(t.column("pred"), pred)
            return pa.table({"src": t.column("subj").filter(m),
                             "dst": t.column("obj").filter(m)})
        return scan

    edges = quads.map_batches(edge_scan("urn:kgap:pred:funds"),
                              batch_format="pyarrow")
    seeds = quads.map_batches(
        lambda t: pa.table({"node": t.column("subj").filter(
            pc.equal(t.column("pred"), "urn:kgap:pred:manages"))}),
        batch_format="pyarrow")
    # the saturated docs entity graph is small at every tier: size the
    # per-round shuffles to the graph, not the host CPU count
    return bfs_depths(edges, seeds, num_partitions=4)


DOCS_SPARQL_ALTPATH = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?b WHERE {
  ?a (kp:funds|kp:manages)+ ?b .
  FILTER (?a != ?b)
}
"""


def _sparql_docs_altpath(sf_dir: str):
    """SPARQL alternative-set property path: the transitive closure
    over the UNION of the funds and manages edge sets (direct or
    indirect control), excluding self-reaches via cycles. Oracle =
    the same query compiled to a pred-IN recursive CTE."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_ALTPATH)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("b", _pa.string())]))


DOCS_SPARQL_BIND = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?tag WHERE {
  ?a kp:manages ?v .
  ?a kp:locatedIn ?loc .
  BIND(CONCAT(?a, "@", ?loc) AS ?tag)
}
"""


def _sparql_docs_bind(sf_dir: str):
    """SPARQL BIND computed column (M4 inside the query engine):
    manager@location tags via CONCAT over required-group vars; the
    oracle compiles the SAME query to a ||-concatenation expression."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_BIND)
    return _pa.Table.from_pylist(
        res.take_all(), schema=_pa.schema([("tag", _pa.string())]))


DOCS_SPARQL_STRFN = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?loc ?site ?tag ?clip ?thin WHERE {
  ?a kp:locatedIn ?loc .
  BIND(STRAFTER(?loc, " ") AS ?site)
  BIND(UCASE(?site) AS ?tag)
  BIND(SUBSTR(?loc, 2, 9) AS ?clip)
  BIND(REPLACE(?loc, "[aeiou]", "") AS ?thin)
}
"""


def _sparql_docs_strfn(sf_dir: str):
    """SPARQL string-function BINDs (round 4): UCASE / SUBSTR /
    REPLACE / STRAFTER — including a bind CHAINED off an earlier bind
    target — vectorized Arrow kernels on the Ray side vs the compiled
    upper/substr/regexp_replace/strpos-CASE SQL (sparql._strfn_sql).
    Reference parity: the SPARQL 1.1 string builtins GraphDB serves
    (docs/components/graphdb.md query surface)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_STRFN)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("loc", _pa.string()), ("site", _pa.string()),
                           ("tag", _pa.string()), ("clip", _pa.string()),
                           ("thin", _pa.string())]))


DOCS_SPARQL_COALESCE = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?rel (COUNT(?a) AS ?n) WHERE {
  ?a kp:locatedIn ?loc .
  OPTIONAL { ?a kp:employs ?emp . }
  OPTIONAL { ?a kp:manages ?m . }
  BIND(COALESCE(?emp, ?m, "none") AS ?rel)
} GROUP BY ?rel
"""


def _sparql_docs_coalesce(sf_dir: str):
    """SPARQL COALESCE over TWO chained OPTIONAL groups (round 4) —
    exercises both the post-OPTIONAL COALESCE bind (pc.coalesce vs SQL
    COALESCE) and the broadcast left-outer OPTIONAL join path that
    replaced the chained-hash-join crash (sparql.py optionals loop).
    The grouped COUNT pins the full multi-valued-OPTIONAL row bag
    (multi-valued optionals multiply rows identically on both
    backends) while keeping the gate result result-set-scale."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_COALESCE)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("rel", _pa.string()), ("n", _pa.int64())]))


DOCS_SPARQL_TERMS = """
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT ?p (COUNT(?o) AS ?n) WHERE {
  ?s ?p ?o .
  FILTER (isIRI(?o) || DATATYPE(?o) = xsd:gYear)
  FILTER (?p NOT IN ("urn:kgap:pred:monitors"))
} GROUP BY ?p
"""


def _sparql_docs_terms(sf_dir: str):
    """SPARQL term inspection (round 4): isIRI over the quads'
    obj_is_literal metadata, DATATYPE equality over obj_datatype, and
    a NOT IN membership filter — per-predicate counts pin the full
    filtered bag on both backends (sparql.py single-binder metadata
    projections vs the compiled boolean/IN SQL)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_TERMS)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("p", _pa.string()), ("n", _pa.int64())]))


DOCS_SPARQL_SUBQUERY = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?loc (MAX(?n) AS ?busiest) WHERE {
  ?a kp:locatedIn ?loc .
  { SELECT ?a (COUNT(?b) AS ?n) WHERE { ?a kp:collaboratesWith ?b }
    GROUP BY ?a }
} GROUP BY ?loc
"""


def _sparql_docs_subquery(sf_dir: str):
    """SPARQL aggregate subquery (round 4): the per-subject
    collaboration degree computed in a { SELECT ... GROUP BY }
    WHERE element, inner-joined to the locatedIn scan, then MAX'd
    per location — the engine's recursive-plan + broadcast-join path
    vs the compiled derived-table JOIN SQL."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_SUBQUERY)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("loc", _pa.string()),
                           ("busiest", _pa.int64())]))


DOCS_SPARQL_GRAPH = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?g (COUNT(?a) AS ?n) WHERE {
  GRAPH ?g { ?a kp:locatedIn ?loc . }
} GROUP BY ?g
"""


def _sparql_docs_graph(sf_dir: str):
    """SPARQL GRAPH clause: per-named-graph accounting over the
    docs-derived quads — the reference's per-feed/per-graph count
    idiom (docs/components/ldes-consumer.md:330-336) as a native
    query; the graph variable binds the quad table's graph column."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_GRAPH)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("g", _pa.string()), ("n", _pa.int64())]))


DOCS_SPARQL_ASK = """
PREFIX kp: <urn:kgap:pred:>
ASK { ?a kp:funds ?b . ?b kp:funds ?a . }
"""


def _sparql_docs_ask(sf_dir: str):
    """SPARQL ASK (J4 existence test): does any MUTUAL funding pair
    exist? The plan stops at the first surviving row; the oracle is
    the compiled SELECT EXISTS(...) SQL."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_ask

    val = sparql_ask(_docs_quads(sf_dir), DOCS_SPARQL_ASK)
    return _pa.table({"ask": _pa.array([val], _pa.bool_())})


DOCS_SPARQL_ARITH = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a ?dbl ?dist WHERE {
  ?a kp:employs ?emp .
  BIND(?emp * 2 AS ?dbl)
  BIND(?emp - 3000 AS ?d)
  BIND(ABS(?d) AS ?dist)
  FILTER (?dist < 1500)
}
"""


def _sparql_docs_arith(sf_dir: str):
    """Numeric BINDs: integer-exact * and - arithmetic plus ABS,
    chained through earlier bind targets, with a numeric FILTER over
    the bound result. Reference parity: computed numeric bindings in
    analytical queries (docs/advanced-topics.md:398-414)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_ARITH)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("dbl", _pa.string()),
                           ("dist", _pa.string())]))


DOCS_SPARQL_NUMERIC = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a ?emp WHERE {
  ?a kp:employs ?emp .
  FILTER (?emp > 2500 && ?emp <= 4000)
}
"""


def _sparql_docs_numeric(sf_dir: str):
    """Numeric FILTER comparisons over string-stored xsd:integer
    objects — values coerce string→double with the TRY_CAST-mirror
    rule on both backends. Reference parity: numeric range filters
    over qudt:numericValue (docs/advanced-topics.md:398-414)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_NUMERIC)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("emp", _pa.string())]))


DOCS_SPARQL_TYPED = """
PREFIX kp: <urn:kgap:pred:>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT ?a ?y WHERE {
  ?a kp:foundedIn ?y .
  FILTER (?y >= "1950"^^xsd:gYear && ?y < "2000"^^xsd:gYear)
}
"""


def _sparql_docs_typed(sf_dir: str):
    """Typed-literal range FILTER: non-numeric xsd datatypes (gYear
    here, dateTime in q_sparql_docs_datetime) compare as strings —
    correct for zero-padded ISO forms. Reference parity: xsd:dateTime
    range filters (docs/advanced-topics.md:330-340)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_TYPED)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("y", _pa.string())]))


DOCS_SPARQL_SUM = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?loc (SUM(?emp) AS ?total) WHERE {
  ?a kp:locatedIn ?loc .
  ?a kp:employs ?emp .
} GROUP BY ?loc
"""


def _sparql_docs_sum(sf_dir: str):
    """Grouped SUM over numeric-coerced values (integer inputs keep
    the double sum exact on both backends). Reference parity: numeric
    aggregation stats (docs/components/jupyter.md:178-180)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_SUM)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("loc", _pa.string()),
                           ("total", _pa.float64())]))


DOCS_SPARQL_AVG = """
PREFIX kp: <urn:kgap:pred:>
SELECT (AVG(?emp) AS ?memp) WHERE { ?a kp:employs ?emp . }
"""


def _sparql_docs_avg(sf_dir: str):
    """Global AVG: one exact integer sum divided by an exact count on
    each backend — bit-identical doubles."""
    from k_gap_ray.sparql import sparql_select

    return sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_AVG)


DOCS_SPARQL_GROUPCONCAT = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a (GROUP_CONCAT(?loc; SEPARATOR="|") AS ?locs) WHERE {
  ?a kp:locatedIn ?loc .
} GROUP BY ?a
"""


def _sparql_docs_groupconcat(sf_dir: str):
    """GROUP_CONCAT with a custom separator; values concatenate in
    sorted order on both backends (string_agg ... ORDER BY mirror)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_GROUPCONCAT)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("locs", _pa.string())]))


DOCS_SPARQL_BOUND = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a ?emp2 WHERE {
  ?a kp:locatedIn ?loc .
  OPTIONAL { ?a kp:employs ?emp . FILTER (?emp > 2500) }
  BIND(IF(!BOUND(?emp), "none", ?emp) AS ?emp2)
}
"""


def _sparql_docs_bound(sf_dir: str):
    """BOUND()/IF over an OPTIONAL var (with a numeric filter inside
    the optional group): the IF bind runs after the left join on both
    backends. Reference parity: BIND(IF(!BOUND(?result), ...))
    (docs/components/sembench.md:176-180)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_BOUND)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("emp2", _pa.string())]))


DOCS_SPARQL_MULTIAGG = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a (COUNT(?n) AS ?cnt) (SUM(?n) AS ?total) (AVG(?n) AS ?m)
       (MAX(?n) AS ?hi)
WHERE { ?a kp:employs ?n . } GROUP BY ?a
"""


def _sparql_docs_multiagg(sf_dir: str):
    """Multiple aggregates (COUNT+SUM+AVG+MAX) in ONE grouped pass —
    the reference's stats-report idiom (jupyter.md:178-180) without a
    query per statistic."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_MULTIAGG)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("cnt", _pa.int64()),
                           ("total", _pa.float64()), ("m", _pa.float64()),
                           ("hi", _pa.string())]))


DOCS_SPARQL_HAVING = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a (COUNT(?n) AS ?cnt) (SUM(?n) AS ?total)
WHERE { ?a kp:employs ?n . } GROUP BY ?a
HAVING (?cnt >= 2 && ?total > 45000)
"""


def _sparql_docs_having(sf_dir: str):
    """HAVING over aggregate aliases (post-aggregation filter on the
    grouped plan; DuckDB HAVING on the SQL side)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_HAVING)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("cnt", _pa.int64()),
                           ("total", _pa.float64())]))


DOCS_SPARQL_MINUS = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?loc WHERE {
  ?a kp:locatedIn ?loc .
  MINUS { ?a kp:employs ?n . FILTER (?n > 4500) }
}
"""


def _sparql_docs_minus(sf_dir: str):
    """MINUS with a numeric filter inside the group (located entities
    with no large employs value): the engine routes it through the
    NOT EXISTS shared-var anti-join — our dedup-to-shared-tuples plan
    IS the MINUS-compatible one — with the spec's no-shared-var no-op
    rule. Cross-backend tested incl. the no-op case
    (tests/test_sparql.py). Non-empty at every tier (the entity graph
    saturates, so an unfiltered MINUS would legitimately drop all)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_MINUS)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("loc", _pa.string())]))


DOCS_SPARQL_EXISTS = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?b WHERE {
  ?a kp:collaboratesWith ?b .
  FILTER EXISTS { ?b kp:funds ?v . }
}
"""


def _sparql_docs_exists(sf_dir: str):
    """FILTER EXISTS (collaborators whose partner funds something):
    the semi-join twin of NOT EXISTS — matched-marker rows survive."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_EXISTS)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("b", _pa.string())]))


DOCS_SPARQL_VALUES = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a ?b WHERE {
  ?a kp:collaboratesWith ?b .
  VALUES (?a ?b) {
    ("urn:kgap:entity:marine-institute" "urn:kgap:entity:ocean-observatory")
    ("urn:kgap:entity:doctor-okafor" "urn:kgap:entity:marine-institute")
    ("urn:kgap:entity:rv-belgica" "urn:kgap:entity:flanders-bay")
    ("urn:kgap:entity:marine-institute" "urn:kgap:entity:no-such-entity")
  }
}
"""


def _sparql_docs_values(sf_dir: str):
    """Multi-variable VALUES: composite-tuple membership (is_in over a
    joined key on the Ray side, OR-of-ANDs on the SQL side)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_VALUES)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("b", _pa.string())]))


DOCS_SPARQL_STAR = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?x ?y WHERE { ?x kp:funds* ?y . }
"""


def _sparql_docs_star(sf_dir: str):
    """Zero-or-more property path: the funds+ closure seeded with the
    zero-hop identity over the graph's node set (semi-naive Dataset
    rounds vs an identity-seeded recursive CTE). Reference parity:
    recursive expansion including the zero hop
    (docs/advanced-topics.md:226-285)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_STAR)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("x", _pa.string()), ("y", _pa.string())]))


DOCS_SPARQL_OPTPATH = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?x ?y WHERE { ?x kp:manages? ?y . }
"""


def _sparql_docs_optpath(sf_dir: str):
    """Zero-or-one property path: node-set identity ∪ the single-hop
    manages edges (set semantics on both backends)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_OPTPATH)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("x", _pa.string()), ("y", _pa.string())]))


DOCS_SPARQL_LANG = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?d WHERE {
  ?d kp:abstract ?t .
  FILTER (LANG(?t) = "en" && STRLEN(?t) > 200)
}
"""

DOCS_SPARQL_DATETIME = """
PREFIX kp: <urn:kgap:pred:>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT ?d ?ts WHERE {
  ?d kp:fetched ?ts .
  ?d kp:nchars ?n .
  FILTER (?ts >= "2024-01-01T00:02:00"^^xsd:dateTime && ?n >= 500)
}
"""


def _docs_direct_quads(sf_dir: str):
    """documents -> a quads Dataset that carries language tags and
    typed-literal lexical forms DIRECTLY (one zero-shuffle
    map_batches; the docs-KG quads have no language tags): abstract
    (text @ the document's lang), fetched (xsd:dateTime lexical form,
    2024-01-01T00:00:00 + doc_id seconds), nchars (xsd:integer). The
    SQL mirror is _sql_docs_direct_quads()."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc
    import ray.data as rd

    def to_quads(t: _pa.Table) -> _pa.Table:
        did = _pc.cast(t.column("doc_id"), _pa.string())
        subj = _pc.binary_join_element_wise("urn:kgap:doc:", did, "")
        n = t.num_rows
        base = _np.datetime64("2024-01-01T00:00:00", "s")
        fetched = base + t.column("doc_id").to_numpy(
            zero_copy_only=False).astype("timedelta64[s]")
        fetched_str = _pc.strftime(
            _pa.array(fetched, _pa.timestamp("s")),
            format="%Y-%m-%dT%H:%M:%S")
        blank = _pa.array([""] * n, _pa.string())

        def rel(pred: str, obj, lang) -> _pa.Table:
            return _pa.table({
                "subj": subj,
                "pred": _pa.array([pred] * n, _pa.string()),
                "obj": obj, "obj_lang": lang})

        return _pa.concat_tables([
            rel("urn:kgap:pred:abstract", t.column("text"),
                t.column("lang")),
            rel("urn:kgap:pred:fetched", fetched_str, blank),
            rel("urn:kgap:pred:nchars",
                _pc.cast(t.column("n_chars"), _pa.string()), blank),
        ])

    return _read_pq(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"]).map_batches(
            to_quads, batch_format="pyarrow", zero_copy_batch=True)


def _sparql_docs_lang(sf_dir: str):
    """LANG() + STRLEN() filter over language-tagged literals: the
    object scan also projects obj_lang (internal __pplang column on
    both backends). Reference parity: FILTER(LANG(?label) = 'en')
    (docs/components/jupyter.md:437-439), STRLEN
    (docs/components/sembench.md:210)."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_direct_quads(sf_dir), DOCS_SPARQL_LANG)
    return _pa.Table.from_pylist(
        res.take_all(), schema=_pa.schema([("d", _pa.string())]))


def _sparql_docs_datetime(sf_dir: str):
    """xsd:dateTime range filter (ISO-8601 lexical order == temporal
    order) combined with a numeric filter on a second pattern.
    Reference parity: docs/advanced-topics.md:330-340."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_direct_quads(sf_dir), DOCS_SPARQL_DATETIME)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("d", _pa.string()), ("ts", _pa.string())]))


DOCS_SPARQL_COUNTDISTINCT = """
SELECT (COUNT(DISTINCT ?s) as ?count) WHERE { ?s ?p ?o . }
"""


def _sparql_docs_countdistinct(sf_dir: str):
    """COUNT(DISTINCT ?s) over the full wildcard pattern — the
    reference's graph-size idiom VERBATIM
    (docs/components/sembench.md:242). Ray side: distinct via one
    groupby, then a row count (sparql.py COUNT_DISTINCT branch)."""
    from k_gap_ray.sparql import sparql_select

    return sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_COUNTDISTINCT)


DOCS_SPARQL_UPDATE = """
PREFIX kp: <urn:kgap:pred:>
PREFIX ke: <urn:kgap:entity:>
INSERT DATA {
  ke:update_probe kp:locatedIn "marine update probe site" .
  ke:update_probe kp:employs ke:update_staff .
} ;
DELETE WHERE { ?a kp:employs ?e } ;
DELETE { ?a kp:locatedIn ?loc }
INSERT { ?a kp:basedAt ?loc }
WHERE { ?a kp:locatedIn ?loc . FILTER (CONTAINS(?loc, "marine")) }
"""

DOCS_SPARQL_AFTER_UPDATE = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?a ?loc ?emp WHERE {
  ?a kp:basedAt ?loc .
  OPTIONAL { ?a kp:employs ?emp . }
}
"""


def _sparql_docs_update(sf_dir: str):
    """SPARQL UPDATE (the reference's mutation surface,
    docs/quick-reference.md:227-243): an INSERT DATA / DELETE WHERE /
    DELETE-INSERT-WHERE sequence applied to the docs-derived quads
    (k_gap_ray/sparql_update.py), then a SELECT over the mutated
    store. The SELECT is sensitive to all three statements: the
    inserted entity is rewritten into ?loc rows by the modify, the
    modify's basedAt rows are the required pattern, and the OPTIONAL
    employs column is all-null iff the DELETE WHERE emptied it. The
    oracle replays the same statements as chained NOT-EXISTS /
    UNION-ALL CTEs (sparql_update_cte_sql) over the SQL quads
    reconstruction."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select
    from k_gap_ray.sparql_update import apply_update

    mutated = apply_update(_docs_quads(sf_dir), DOCS_SPARQL_UPDATE)
    res = sparql_select(mutated, DOCS_SPARQL_AFTER_UPDATE)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("loc", _pa.string()),
                           ("emp", _pa.string())]))


DOCS_SPARQL_CLEAR = """
PREFIX kp: <urn:kgap:pred:>
PREFIX ke: <urn:kgap:entity:>
INSERT DATA {
  ke:clear_probe kp:locatedIn "marine clear probe site" .
} ;
CLEAR GRAPH <urn:kgap:web:src3.example> ;
DELETE WHERE { ?a kp:coordinates ?c }
"""

DOCS_SPARQL_AFTER_CLEAR = """
SELECT ?g (COUNT(?s) AS ?n) WHERE {
  GRAPH ?g { ?s ?p ?o . }
} GROUP BY ?g ORDER BY ?g
"""


def _sparql_docs_clear(sf_dir: str):
    """CLEAR GRAPH (the 'clear my graph' mutation the round-3 verdict
    flagged as a k-gap user's first UPDATE): insert a probe, drop one
    source's named graph, delete a predicate store-wide, then count
    quads per graph — sensitive to all three statements. The engine
    CLEAR is one vectorized graph filter; the oracle mirrors it as a
    WHERE-filter CTE in the chained-update compilation."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select
    from k_gap_ray.sparql_update import apply_update

    mutated = apply_update(_docs_quads(sf_dir), DOCS_SPARQL_CLEAR)
    res = sparql_select(mutated, DOCS_SPARQL_AFTER_CLEAR)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("g", _pa.string()), ("n", _pa.int64())]))


DOCS_SPARQL_FTS = """
PREFIX kfts: <urn:kgap:fts:>
SELECT ?e ?score WHERE {
  ?e kfts:searchIndex "merge window" .
  ?e kfts:score ?score .
}
"""


def _sparql_docs_fts(sf_dir: str):
    """Full-text search as a SPARQL magic predicate (the reference's
    luc:searchIndex/luc:score idiom, docs/quick-reference.md:214-221)
    over the documents-direct quads: the engine rewrites the two
    magic patterns into one virtual-match pattern backed by an
    integer-TF-IDF scoring pass (k_gap_ray/sparql_fts.py); the oracle
    replays the identical rewrite + scoring recurrence in SQL."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select

    res = sparql_select(_docs_direct_quads(sf_dir), DOCS_SPARQL_FTS)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("e", _pa.string()), ("score", _pa.string())]))


DOCS_SPARQL_CONSTRUCT = """
PREFIX kp: <urn:kgap:pred:>
CONSTRUCT {
  ?a <urn:kgap:pred:partner> ?b .
  ?b <urn:kgap:pred:partner> ?a .
}
WHERE { { ?a kp:funds ?b . } UNION { ?a kp:manages ?b . } }
"""


def _sparql_docs_construct(sf_dir: str):
    """SPARQL CONSTRUCT (M6 vocabulary remap as a query): fold the
    funds/manages predicates into one symmetric `partner` relation
    over the docs-derived quads; the oracle is the compiled
    UNION-ALL-of-templates DISTINCT SQL."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_construct

    res = sparql_construct(_docs_quads(sf_dir), DOCS_SPARQL_CONSTRUCT)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("subj", _pa.string()), ("pred", _pa.string()),
                           ("obj", _pa.string())]))


DOCS_SPARQL_DESCRIBE = """
PREFIX kp: <urn:kgap:pred:>
DESCRIBE ?x WHERE { ?x kp:manages ?y .
                    FILTER (STRENDS(?x, "-institute")) }
"""


def _sparql_docs_describe(sf_dir: str):
    """SPARQL DESCRIBE — the fourth query form (GraphDB serves
    SELECT/CONSTRUCT/ASK/DESCRIBE, docs/components/graphdb.md): the
    symmetric description (subject triples + IRI-object backlinks) of
    every managing entity whose IRI ends in '-institute' (STRENDS also
    gets its gate signal here). Oracle: the MATERIALIZED resource-set
    CTE compiled by sparql_describe_to_sql over the same quads
    reconstruction."""
    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_describe

    res = sparql_describe(_docs_quads(sf_dir), DOCS_SPARQL_DESCRIBE)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("subj", _pa.string()), ("pred", _pa.string()),
                           ("obj", _pa.string())]))


DOCS_SPARQL_SAMPLE = """
PREFIX kp: <urn:kgap:pred:>
SELECT ?loc (SAMPLE(?a) AS ?rep) (COUNT(?a) AS ?n)
WHERE { ?a kp:locatedIn ?loc . } GROUP BY ?loc
"""


def _sparql_docs_sample(sf_dir: str):
    """SPARQL SAMPLE aggregate mixed with COUNT in one grouped pass;
    SAMPLE is pinned to MIN on both backends (the spec leaves the pick
    undefined — the smallest value is the deterministic choice)."""
    from k_gap_ray.sparql import sparql_select

    return sparql_select(_docs_quads(sf_dir), DOCS_SPARQL_SAMPLE)


def _kg_docs_mention_counts(sf_dir: str):
    """Mentions per canonical entity over the documents-derived corpus
    (the skew-prone combiner aggregate), value-hash-verified
    (pipelines/docs_kg.py:sql_docs_mention_counts)."""
    from k_gap_ray.pipelines.docs_kg import kg_mention_counts_from_docs

    return kg_mention_counts_from_docs(None, res=_docs_kg_run(sf_dir))


def _kg_docs_entities(sf_dir: str):
    """The pipeline's canonical entity table over the documents-derived
    corpus, list columns flattened to sorted "|"-joined strings —
    value-hash-verified against the recursive-CTE component oracle
    (pipelines/docs_kg.py:sql_docs_entities)."""
    from k_gap_ray.pipelines.docs_kg import kg_entities_from_docs

    return kg_entities_from_docs(None, res=_docs_kg_run(sf_dir))


DOCS_SHACL_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix kp: <urn:kgap:pred:> .

<urn:kgap:shape:Employer> a sh:NodeShape ;
  sh:targetSubjectsOf kp:employs ;
  sh:property [
    sh:path kp:employs ;
    sh:datatype xsd:integer ;
    sh:pattern "^[0-9]+$" ;
    sh:maxCount 3 ;
  ] ;
  sh:property [
    sh:path kp:locatedIn ;
    sh:nodeKind sh:IRI ;
    sh:minCount 1 ;
  ] ;
  sh:property [
    sh:path kp:foundedIn ;
    sh:minCount 1 ;
    sh:datatype xsd:integer ;
  ] .
"""


def _shacl_docs(sf_dir: str):
    """M9 SHACL validation over the docs-derived quads: the shape TTL
    is parsed by the repo's Turtle reader (the reference's per-feed
    SHAPE file idiom, ldes-consumer/app.py:344) and validated natively
    on Ray Data (ops/shacl.py); the oracle compiles the SAME shapes to
    SQL over the quads reconstruction (docs_kg.py:sql_docs_shacl).
    foundedIn is typed xsd:gYear in the KG, so its xsd:integer
    constraint guarantees datatype violations alongside the
    minCount/maxCount ones."""
    import pyarrow as _pa

    from k_gap_ray.ops.shacl import parse_shacl_text, shacl_validate

    viol = shacl_validate(_docs_quads(sf_dir),
                          parse_shacl_text(DOCS_SHACL_TTL))
    return _pa.Table.from_pylist(
        viol.take_all(),
        schema=_pa.schema([("focus", _pa.string()), ("path", _pa.string()),
                           ("component", _pa.string()),
                           ("n", _pa.int64())]))


def _doc_bpe_train(sf_dir: str):
    """Distributed BPE merge learning (functions/bpe.py): the first 8
    subword merges learned from the corpus vocabulary — ONE
    vocabulary shuffle (vocab_df partial-agg), then the merge loop on
    the pulled vocabulary below driver_cap / as per-merge pair-count
    shuffles above it. Tie-break and merge application are pinned
    conventions mirrored exactly by the oracle's chained MATERIALIZED
    CTE levels with fixpoint-replace recursions."""
    from k_gap_ray.functions.bpe import bpe_train

    return bpe_train(_docs(sf_dir, ["doc_id", "text"]), n_merges=8)


def _doc_bpe_encode(sf_dir: str):
    """BPE apply (functions/bpe.py): per-document subword counts
    under the corpus-learned merges — train + encode in one pass over
    the vocabulary, the downstream 'token count with a learned
    tokenizer' statistic. Oracle: the same merge levels with the
    token carried through, joined back to the exploded corpus."""
    from k_gap_ray.functions.bpe import bpe_encode

    return bpe_encode(_docs(sf_dir, ["doc_id", "text"]), n_merges=8)


def _doc_epoch_shuffle(sf_dir: str):
    """Seeded epoch shuffle (functions/shuffle.py): deterministic
    corpus permutation + NTILE shard assignment for training-epoch
    ordering. The permutation key is a 31-bit seeded integer mix
    (SQL-exact: every intermediate < 2**62, so DuckDB's no-wraparound
    BIGINT computes the identical value); global positions come from
    one uniform bucket shuffle + a driver carry of <=8192 summary
    rows. Oracle: the same mix expression under ROW_NUMBER/NTILE."""
    from k_gap_ray.functions.shuffle import epoch_shuffle

    return epoch_shuffle(_docs(sf_dir, ["doc_id"]), "doc_id",
                         seed=3, n_shards=8)


def _kg_docs_report(sf_dir: str):
    """A7 dataset-statistics bundle over the docs-derived KG (the
    pages-corpus twin was retired with the rows-only kg_* family in
    round 5). Same REAL pipeline as kg_docs_triples
    (extract->annotate->canonicalize->materialize, cached per
    sf_dir), reduced to the report scalars; the oracle nests the
    pure-SQL quad and entity reconstructions (pipelines/docs_kg.py)
    under the same aggregates, so a drift anywhere in the pipeline
    moves at least one counter."""
    import pyarrow as pa

    res = _docs_kg_run(sf_dir)
    triples = res["triples"]

    def n_distinct(col: str) -> int:
        # NOT Dataset.unique(): Ray 2.49's Unique aggregate crashes in
        # merge on multi-block data; groupby(col).count().count() is
        # the safe equivalent (same pattern as q_count_distinct).
        return triples.select_columns([col]).groupby(col).count().count()

    ents = res["entities"]
    n_entities = ents.num_rows if hasattr(ents, "num_rows") \
        else ents.count()
    return pa.table({
        "n_triples": pa.array([triples.count()], pa.int64()),
        "n_distinct_subjects": pa.array([n_distinct("subj")], pa.int64()),
        "n_named_graphs": pa.array([n_distinct("graph")], pa.int64()),
        "n_predicates": pa.array([n_distinct("pred")], pa.int64()),
        "n_entities": pa.array([n_entities], pa.int64()),
    })


def _workflow_lang_en(sf_dir: str):
    """X1-X3: declarative workflow spec (sembench analogue) compiled to
    a Ray op chain, with ${var} template substitution."""
    from k_gap_ray.workflow import run_workflow

    return run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/documents.parquet",
         "columns": ["doc_id", "lang", "n_chars"]},
        {"op": "filter", "expr": "lang == '${lang}'"},
        {"op": "groupby_agg", "keys": ["lang"],
         "aggs": [{"fn": "Count", "alias": "n"},
                  {"fn": "Max", "on": "n_chars", "alias": "max_chars"}]},
    ], params={"lang": "en"})


def _media_features(sf_dir: str):
    """Binary-payload decode plumbing over a media table derived from
    documents (payload = utf-8 text bytes). mode='stat' emits pure byte
    statistics, so the actor-pool stage is value-verified by the SQL
    oracle; mode='fake'/'real' (sha256 dims / codec slot) are covered
    by pytest."""
    from k_gap_ray.functions.multimodal import decode_stage, docs_as_media

    media = docs_as_media(_docs(sf_dir, ["doc_id", "text"]))
    return decode_stage(media, mode="stat")


def _media_png(sf_dir: str):
    """REAL PNG decode path: documents -> deterministic synthesized
    PNGs (functions/multimodal.docs_as_png) -> actor-pool
    decode_stage(mode='real') -> decoded geometry. The engine
    round-trips actual zlib/chunk/filter bytes (functions/png.py, a
    pure-stdlib codec); the oracle predicts width/height from doc_id
    by the same integer functions — a decoder bug surfaces as a
    dimension (or crash) mismatch."""
    import pyarrow as _pa

    from k_gap_ray.functions.multimodal import decode_stage, docs_as_png

    feats = decode_stage(docs_as_png(_docs(sf_dir, ["doc_id"])),
                         mode="real")
    return feats.map_batches(
        lambda t: _pa.table({
            "media_id": t.column("media_id"),
            "width": t.column("width").cast(_pa.int64()),
            "height": t.column("height").cast(_pa.int64())}),
        batch_format="pyarrow")


def _media_gif(sf_dir: str):
    """REAL GIF decode path with FULL-BITMAP verification: documents
    -> deterministic GIF87a payloads (variable-width LZW streams,
    functions/gif.py) -> actor-pool decode -> (width, height, px_sum).
    The oracle predicts the exact pixel SUM from doc_id by the
    generate_series closed form, so any LZW bug — width bumps, KwKwK,
    dictionary resets — surfaces as a value mismatch, a stricter
    contract than the PNG/JPEG dimension checks."""
    from k_gap_ray.functions.multimodal import docs_as_gif, gif_px_stats

    return gif_px_stats(docs_as_gif(_docs(sf_dir, ["doc_id"])))


def _media_gif_frames(sf_dir: str):
    """ANIMATED GIF decode with every frame's bitmap verified:
    documents -> multi-image GIF89a payloads -> actor-pool
    decode_gif_frames -> (media_id, frame_idx, width, height,
    px_sum); the oracle unrolls the per-frame closed form — the
    animation analogue of the AVI/MP4 frame tables, with pixel-exact
    (not just count/geometry) verification."""
    from k_gap_ray.functions.multimodal import (docs_as_gif_anim,
                                                gif_frame_stats)

    return gif_frame_stats(docs_as_gif_anim(_docs(sf_dir, ["doc_id"])))


def _media_jpeg(sf_dir: str):
    """REAL JPEG decode path: documents -> deterministic synthesized
    baseline JPEGs (functions/multimodal.docs_as_jpeg) -> actor-pool
    decode_stage(mode='real') -> decoded geometry. The engine runs a
    full pure-stdlib baseline decoder (functions/jpeg.py: markers,
    canonical Huffman, dequant, IDCT; validated against real libjpeg
    output incl. 4:2:0 in pytest); the oracle predicts width/height
    from doc_id by the same integer functions — a parse/entropy bug
    surfaces as a dimension (or crash) mismatch."""
    import pyarrow as _pa

    from k_gap_ray.functions.multimodal import decode_stage, docs_as_jpeg

    feats = decode_stage(docs_as_jpeg(_docs(sf_dir, ["doc_id"])),
                         mode="real")
    return feats.map_batches(
        lambda t: _pa.table({
            "media_id": t.column("media_id"),
            "width": t.column("width").cast(_pa.int64()),
            "height": t.column("height").cast(_pa.int64())}),
        batch_format="pyarrow")


def _media_mjpeg_frames(sf_dir: str):
    """REAL video frame-sampling path: documents -> deterministic
    MJPEG streams (3+id%4 concatenated baseline-JPEG frames) ->
    actor-pool frame_sample_stage(mode='real', n_frames=2) -> each
    sampled frame REALLY decoded (functions/jpeg.py) to its geometry.
    The oracle predicts the even sampler's picks ({0, n_total // 2})
    and each picked frame's width/height from doc_id by the same
    integer functions."""
    import pyarrow as _pa

    from k_gap_ray.functions.jpeg import decode_jpeg
    from k_gap_ray.functions.multimodal import (docs_as_mjpeg,
                                                frame_sample_stage)

    frames = frame_sample_stage(docs_as_mjpeg(_docs(sf_dir, ["doc_id"])),
                                n_frames=2, mode="real")

    def geom(t: _pa.Table) -> _pa.Table:
        ws, hs = [], []
        for p in t.column("payload").to_pylist():
            w, h, _c, _px = decode_jpeg(p)
            ws.append(w)
            hs.append(h)
        return _pa.table({
            "media_id": t.column("media_id"),
            "frame_idx": _pa.compute.cast(t.column("frame_idx"),
                                          _pa.int64()),
            "width": _pa.array(ws, _pa.int64()),
            "height": _pa.array(hs, _pa.int64())})

    return frames.map_batches(geom, batch_format="pyarrow")


def _media_avi_frames(sf_dir: str):
    """REAL container-video path: documents -> deterministic AVI/MJPG
    containers (functions/riffavi.py: RIFF hdrl/movi/idx1 layout,
    2+id%3 frames) -> actor-pool frame_sample_stage(mode='real',
    n_frames=2) walking the chunk tree -> each sampled frame REALLY
    Huffman-decoded (functions/jpeg.py) to its geometry. The oracle
    predicts the even sampler's picks ({0, n_total // 2}) and each
    picked frame's width/height from doc_id by the same integer
    functions — a chunk-walk or alignment bug shifts frame bytes and
    surfaces as a geometry (or decode-crash) mismatch."""
    import pyarrow as _pa

    from k_gap_ray.functions.jpeg import decode_jpeg
    from k_gap_ray.functions.multimodal import (docs_as_avi,
                                                frame_sample_stage)

    frames = frame_sample_stage(docs_as_avi(_docs(sf_dir, ["doc_id"])),
                                n_frames=2, mode="real")

    def geom(t: _pa.Table) -> _pa.Table:
        ws, hs = [], []
        for p in t.column("payload").to_pylist():
            w, h, _c, _px = decode_jpeg(p)
            ws.append(w)
            hs.append(h)
        return _pa.table({
            "media_id": t.column("media_id"),
            "frame_idx": _pa.compute.cast(t.column("frame_idx"),
                                          _pa.int64()),
            "width": _pa.array(ws, _pa.int64()),
            "height": _pa.array(hs, _pa.int64())})

    return frames.map_batches(geom, batch_format="pyarrow")


def _media_mp4_frames(sf_dir: str):
    """REAL MP4 container path: documents -> deterministic ISO BMFF
    containers (functions/isobmff.py: ftyp/mdat/moov with full
    stsd/stts/stsc/stsz/stco sample tables, 2+(id+1)%3 jpeg samples)
    -> actor-pool frame_sample_stage(mode='real', n_frames=2)
    resolving the sample tables -> each sampled frame REALLY
    Huffman-decoded (functions/jpeg.py) to its geometry. The oracle
    predicts the even sampler's picks ({0, n_total // 2}) and each
    picked frame's width/height from doc_id by the same integer
    functions — a box-walk or sample-table bug shifts frame bytes and
    surfaces as a geometry (or decode-crash) mismatch."""
    import pyarrow as _pa

    from k_gap_ray.functions.jpeg import decode_jpeg
    from k_gap_ray.functions.multimodal import (docs_as_mp4,
                                                frame_sample_stage)

    frames = frame_sample_stage(docs_as_mp4(_docs(sf_dir, ["doc_id"])),
                                n_frames=2, mode="real")

    def geom(t: _pa.Table) -> _pa.Table:
        ws, hs = [], []
        for p in t.column("payload").to_pylist():
            w, h, _c, _px = decode_jpeg(p)
            ws.append(w)
            hs.append(h)
        return _pa.table({
            "media_id": t.column("media_id"),
            "frame_idx": _pa.compute.cast(t.column("frame_idx"),
                                          _pa.int64()),
            "width": _pa.array(ws, _pa.int64()),
            "height": _pa.array(hs, _pa.int64())})

    return frames.map_batches(geom, batch_format="pyarrow")


def _media_webm(sf_dir: str):
    """REAL WebM container path: documents -> deterministic EBML/
    Matroska containers (functions/ebml.py: header/Segment/Info/
    Tracks/Cluster layout, vint framing) -> per-batch decode_webm
    walking the element tree. The oracle predicts the PARSED
    geometry, block count, summed block payload bytes and last block
    timestamp from doc_id by the same integer functions — a vint or
    SimpleBlock-framing bug shifts payload boundaries and surfaces as
    a byte-count (or parse-crash) mismatch. The VP8-slot payloads
    stay coded: pixel decode is the declared ffmpeg slot, the
    container walk is the real surface under test."""
    import pyarrow as _pa

    from k_gap_ray.functions.ebml import decode_webm
    from k_gap_ray.functions.multimodal import docs_as_webm

    media = docs_as_webm(_docs(sf_dir, ["doc_id"]))

    def parse(t: _pa.Table) -> _pa.Table:
        cols = {"media_id": t.column("media_id"), "width": [],
                "height": [], "n_frames": [], "total_bytes": [],
                "last_ts_ms": []}
        for p in t.column("payload").to_pylist():
            m = decode_webm(p)
            cols["width"].append(m["width"])
            cols["height"].append(m["height"])
            cols["n_frames"].append(m["n_frames"])
            cols["total_bytes"].append(sum(len(f) for f in m["frames"]))
            cols["last_ts_ms"].append(m["ts_ms"][-1] if m["ts_ms"]
                                      else 0)
        return _pa.table({"media_id": cols["media_id"],
                          **{k: _pa.array(cols[k], _pa.int64())
                             for k in ("width", "height", "n_frames",
                                       "total_bytes", "last_ts_ms")}})

    return media.map_batches(parse, batch_format="pyarrow")


def _media_wav(sf_dir: str):
    """REAL WAV decode path: documents -> deterministic synthesized
    RIFF PCM files (functions/multimodal.docs_as_wav) -> per-batch
    decode (functions/wav.py, pure-stdlib RIFF/fmt/data parser) ->
    decoded channel count, frame count AND the full PCM sample sum.
    The oracle predicts all three from doc_id by the same integer
    functions (lateral generate_series), so a byte-level decode bug
    surfaces as a sum (or crash) mismatch — stronger than geometry
    alone because every sample participates."""
    import numpy as _np
    import pyarrow as _pa

    from k_gap_ray.functions.multimodal import docs_as_wav
    from k_gap_ray.functions.wav import decode_wav

    media = docs_as_wav(_docs(sf_dir, ["doc_id"]))

    def f(t: "_pa.Table") -> "_pa.Table":
        ids, chs, nfr, ssum = [], [], [], []
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            _sr, c, frames = decode_wav(payload)
            ids.append(mid)
            chs.append(c)
            nfr.append(frames.shape[0])
            ssum.append(int(frames.astype(_np.int64).sum()))
        return _pa.table({
            "media_id": _pa.array(ids, _pa.int64()),
            "channels": _pa.array(chs, _pa.int64()),
            "n_frames": _pa.array(nfr, _pa.int64()),
            "sample_sum": _pa.array(ssum, _pa.int64()),
        })

    return media.map_batches(f, batch_format="pyarrow")


def _doc_line_dedup(sf_dir: str):
    """CCNet-style line-level boilerplate removal
    (functions/lines.strip_boilerplate). The corpus has no newlines,
    so the query first derives a deterministic multi-line view: body =
    the text re-wrapped at every 8th word (one RE2 pass), plus an
    injected 'subscribe...' header for doc_id % 3 == 0 docs and a
    'copyright...' footer for doc_id % 4 == 0 docs — boilerplate BY
    CONSTRUCTION, present in ~1/3 / ~1/4 of documents. Lines in >= 2
    distinct docs (the injected ones, plus bodies of exact-duplicate
    docs) are stripped everywhere; the oracle recomputes the same
    lines with string_split + 8-word regrouping in SQL."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from k_gap_ray.functions.lines import strip_boilerplate

    def f(t: "_pa.Table") -> "_pa.Table":
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        body = _pc.replace_substring_regex(
            t.column("text"), pattern=r"(\S+(?: \S+){7}) ",
            replacement="\\1\n")
        prefix = _np.where(ids % 3 == 0,
                           "subscribe to our newsletter\n", "")
        suffix = _np.where(ids % 4 == 0,
                           "\ncopyright example corp", "")
        text = _pc.binary_join_element_wise(
            _pa.array(prefix, _pa.string()), body,
            _pa.array(suffix, _pa.string()), "")
        return _pa.table({"doc_id": t.column("doc_id"), "text": text})

    multi = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)
    return strip_boilerplate(multi, min_docs=2)


def _docs_urls(sf_dir: str):
    """documents -> deterministic synthesized crawl URLs: every
    component (scheme, www/cdn subdomains, host, tld, path depth,
    trailing slash, query params, fragment) is a pure function of
    doc_id/source, so the SQL oracle predicts the PARSED features
    while the engine actually parses the assembled strings
    (functions/urlstats.py) — same pattern as q_media_png."""
    import numpy as np

    docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def f(t):
        import pyarrow as _pa0
        import pyarrow.compute as pc

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)

        def pool(values, idx):
            return pc.take(_pa0.array(values, _pa0.string()),
                           _pa0.array(idx.astype(np.int64)))

        scheme = pool(["http", "https"], (ids % 7 != 0).astype(np.int64))
        www = pool(["", "www."], (ids % 3 == 0).astype(np.int64))
        sub = pool(["", "cdn."], (ids % 9 == 0).astype(np.int64))
        hostnum = pool([f"-{k}" for k in range(5)], ids % 5)
        tld = pool([".com", ".org"], ids % 2)
        path = pool(["", "/p1", "/p1/p2", "/p1/p2/p3"], ids % 4)
        trail = pool(["", "/"],
                     ((ids % 6 == 0) & (ids % 4 != 0)).astype(np.int64))
        query = pool(["", "?a=1", "?a=1&b=2"], ids % 3)
        frag = pool(["", "#top"], (ids % 5 == 0).astype(np.int64))
        url = pc.binary_join_element_wise(
            scheme, _pa0.array(["://"] * len(ids)), www, sub,
            t.column("source"), hostnum, tld, path, trail, query, frag, "")
        return _pa0.table({"doc_id": t.column("doc_id"),
                           "n_chars": t.column("n_chars"), "url": url})

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _url_features(sf_dir: str):
    """Vectorized URL parsing (extract_regex + string kernels): the
    webtext crawl-accounting feature set, value-verified against
    doc_id/source formulas."""
    from k_gap_ray.functions.urlstats import parse_urls

    out = parse_urls(_docs_urls(sf_dir), keep=["doc_id"])
    return out.map_batches(
        lambda t: t.select(["doc_id", "scheme", "domain", "reg_domain",
                            "tld", "path_depth", "n_params", "is_https",
                            "has_fragment"]),
        batch_format="pyarrow")


def _domain_stats(sf_dir: str):
    """Per-registrable-domain rollup (count + total chars) over the
    parsed URLs — per-batch partial aggregation, one small groupby."""
    from k_gap_ray.functions.urlstats import domain_stats, parse_urls

    return domain_stats(parse_urls(_docs_urls(sf_dir)),
                        chars_col="n_chars")


def _doc_splits(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment
    (ops/transform.assign_splits): one multiplicative-hash bucket per
    doc, disjoint+exhaustive by construction, SQL CASE oracle."""
    from k_gap_ray.ops.transform import assign_splits

    return assign_splits(_docs(sf_dir, ["doc_id"]), "doc_id")


def _url_normalize(sf_dir: str):
    """Canonical URL form for exact dedup (lowercase scheme/host, drop
    fragment, strip one trailing slash from non-root paths)."""
    from k_gap_ray.functions.urlstats import normalize_urls

    out = normalize_urls(_docs_urls(sf_dir))
    return out.select_columns(["doc_id", "url_norm"])


def _rdf_turtle(sf_dir: str):
    """S2 Turtle bulk-load parity: the nation table rendered as a
    Turtle document (prefixes, 'a', ';'-continuation), parsed back by
    sources.rdfio.read_turtle, then aggregated — value-verified against
    SQL over the original table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ttl_dir = f"/tmp/kgap_ttl/sf{_sf_of(sf_dir)}"
    path = os.path.join(ttl_dir, "nation.ttl")
    if not os.path.exists(path):
        os.makedirs(ttl_dir, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name", "n_regionkey"])
        lines = ["@prefix ex: <urn:kgap:ex:> ."]
        for nk, name, rk in zip(t.column("n_nationkey").to_pylist(),
                                t.column("n_name").to_pylist(),
                                t.column("n_regionkey").to_pylist()):
            lines.append(
                f"ex:nation-{nk} a ex:Nation ;\n"
                f'    ex:name "{name}" ;\n'
                f"    ex:inRegion ex:region-{rk} .")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)

    from k_gap_ray.sources.rdfio import read_turtle

    ds = read_turtle(path)
    inreg = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("pred"),
                                    pa.scalar("urn:kgap:ex:inRegion"))),
        batch_format="pyarrow")
    return (inreg.select_columns(["obj"]).groupby("obj").count()
            .rename_columns({"obj": "region_iri", "count()": "n_nations"}))


def _rdf_jsonld_nested(sf_dir: str):
    """S2 nested JSON-LD bulk-load parity: the documents table
    rendered as NESTED JSON-LD (node objects inside node objects,
    language-tagged @value, numeric literals), parsed back by
    sources.rdfio.read_jsonld's recursive walker, returned as the raw
    triple set — value-verified against a SQL reconstruction of the
    same five triple shapes per document."""
    import json as _json

    import pyarrow as _pa
    import pyarrow.parquet as pq

    jdir = f"/tmp/kgap_jsonld_nested/sf{_sf_of(sf_dir)}"
    done = os.path.join(jdir, "_DONE")
    if not os.path.exists(done):
        tmp = f"{jdir}.build.{os.getpid()}"
        import shutil as _sh

        _sh.rmtree(jdir, ignore_errors=True)
        _sh.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "lang", "source", "n_chars"])
        buckets: dict[int, list] = {b: [] for b in range(4)}
        for did, lang, src, nch in zip(t.column("doc_id").to_pylist(),
                                       t.column("lang").to_pylist(),
                                       t.column("source").to_pylist(),
                                       t.column("n_chars").to_pylist()):
            buckets[did % 4].append({
                "@id": f"urn:kgap:doc:{did}",
                "@type": "kp:Document",
                "kp:lang": lang,
                "kp:source": {
                    "@id": f"urn:kgap:src:{src}",
                    "kp:label": {"@value": src, "@language": "en"},
                },
                "kp:nchars": int(nch),
            })
        for b, nodes in buckets.items():
            with open(os.path.join(tmp, f"f{b}.jsonld"), "w",
                      encoding="utf-8") as f:
                _json.dump({"@context": {"kp": "urn:kgap:pred:"},
                            "@graph": nodes}, f)
        open(os.path.join(tmp, "_DONE"), "w").close()
        try:
            os.rename(tmp, jdir)
        except OSError:
            _sh.rmtree(tmp, ignore_errors=True)  # lost a concurrent race

    from k_gap_ray.sources.rdfio import read_jsonld

    ds = read_jsonld(jdir)
    return ds.map_batches(
        lambda t: t.select(["subj", "pred", "obj", "obj_is_literal",
                            "obj_datatype", "obj_lang"]),
        batch_format="pyarrow")


_SQL_JSONLD_NESTED = """
    WITH t AS (SELECT doc_id, lang, source, n_chars FROM documents)
    SELECT 'urn:kgap:doc:' || CAST(doc_id AS VARCHAR) AS subj,
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
           'urn:kgap:pred:Document' AS obj,
           FALSE AS obj_is_literal, '' AS obj_datatype, '' AS obj_lang
    FROM t
    UNION ALL
    SELECT 'urn:kgap:doc:' || CAST(doc_id AS VARCHAR),
           'urn:kgap:pred:lang', lang, TRUE, '', '' FROM t
    UNION ALL
    SELECT 'urn:kgap:doc:' || CAST(doc_id AS VARCHAR),
           'urn:kgap:pred:source', 'urn:kgap:src:' || source,
           FALSE, '', '' FROM t
    UNION ALL
    SELECT 'urn:kgap:src:' || source, 'urn:kgap:pred:label', source,
           TRUE, '', 'en' FROM t
    UNION ALL
    SELECT 'urn:kgap:doc:' || CAST(doc_id AS VARCHAR),
           'urn:kgap:pred:nchars', CAST(n_chars AS VARCHAR), TRUE,
           'http://www.w3.org/2001/XMLSchema#integer', '' FROM t
"""


DOCS_SPARQL_STORE = """
PREFIX kp: <urn:kgap:pred:>
SELECT DISTINCT ?a ?b ?loc WHERE {
  ?a kp:collaboratesWith ?b .
  ?b kp:locatedIn ?loc .
}
"""


def _sparql_docs_store(sf_dir: str):
    """S3 over the PRED-HASH-PARTITIONED persisted quad store
    (state/quadstore.py): the docs-KG quads are written once as
    pbucket=K/ parquet and every bound-predicate pattern scan reads
    ONLY the buckets its predicate hashes into — the storage-side fix
    for the round-4 verdict's last scale tax (an n-pattern BGP paying
    n full-corpus scans). The oracle compiles the SAME query to SQL
    over the quads reconstruction, so a wrong bucket mapping (silently
    missed rows) cannot pass the gate."""
    import shutil

    import pyarrow as _pa

    from k_gap_ray.sparql import sparql_select
    from k_gap_ray.state.quadstore import QuadStore, init_quad_store

    store_dir = f"/tmp/kgap_quadstore/sf{_sf_of(sf_dir)}"
    if not os.path.isdir(store_dir):
        tmp = store_dir + ".build"
        shutil.rmtree(tmp, ignore_errors=True)
        init_quad_store(_docs_quads(sf_dir), tmp)
        os.makedirs(os.path.dirname(store_dir), exist_ok=True)
        try:
            os.rename(tmp, store_dir)
        except OSError:
            # a parallel builder won the rename; its store is
            # byte-equivalent (deterministic quads, same bucket fn)
            shutil.rmtree(tmp, ignore_errors=True)
    res = sparql_select(QuadStore(store_dir), DOCS_SPARQL_STORE)
    return _pa.Table.from_pylist(
        res.take_all(),
        schema=_pa.schema([("a", _pa.string()), ("b", _pa.string()),
                           ("loc", _pa.string())]))


def _rdf_trig_roundtrip(sf_dir: str):
    """S8 graph dump + restore at the driver gate: deterministic quads
    derived from the documents table (language-tagged, typed-integer
    and IRI objects, per-source named graphs) are dumped as TriG
    shards (sources/rdfio.py:write_trig) and parsed straight back by
    read_turtle; the gate value-hashes the round-tripped quad set
    against a pure-SQL reconstruction, so any loss of graph scoping,
    datatypes or language tags breaks the hash. Reference parity:
    graphdb.md:410-428 (application/x-trig backup/restore cycle)."""
    import shutil

    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from k_gap_ray.sources.rdfio import read_turtle, write_trig

    out = f"/tmp/kgap_trig_rt/sf{_sf_of(sf_dir)}"
    # always rewrite: content-addressed shard names depend on batch
    # partitioning, and stale shards from a differently-partitioned
    # earlier run would re-parse as duplicate triples
    shutil.rmtree(out, ignore_errors=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang", "source", "n_chars"])
    subj = _pc.binary_join_element_wise(
        _pa.array(["urn:kgap:doc:"] * t.num_rows, _pa.string()),
        _pc.cast(t.column("doc_id"), _pa.string()), "")
    graph = _pc.binary_join_element_wise(
        _pa.array(["urn:kgap:graph:"] * t.num_rows, _pa.string()),
        _pc.cast(t.column("source"), _pa.string()), "")

    def shape(pred, obj, is_lit, dt, lang):
        n = t.num_rows
        return _pa.table({
            "subj": subj, "pred": _pa.array([pred] * n, _pa.string()),
            "obj": obj,
            "obj_is_literal": _pa.array([is_lit] * n, _pa.bool_()),
            "obj_datatype": _pa.array([dt] * n, _pa.string()),
            "obj_lang": lang if not isinstance(lang, str)
            else _pa.array([lang] * n, _pa.string()),
            "graph": graph})

    quads = _pa.concat_tables([
        shape("urn:kgap:pred:lang", t.column("lang"), True, "",
              t.column("lang")),
        shape("urn:kgap:pred:nchars",
              _pc.cast(t.column("n_chars"), _pa.string()), True,
              "http://www.w3.org/2001/XMLSchema#integer", ""),
        shape("urn:kgap:pred:from", _pc.binary_join_element_wise(
            _pa.array(["urn:kgap:src:"] * t.num_rows, _pa.string()),
            _pc.cast(t.column("source"), _pa.string()), ""),
            False, "", "")])
    write_trig(rd.from_arrow(quads), out).materialize()
    cols = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
            "obj_lang", "graph"]
    # read_turtle appends the source shard path (url) — not a quad col
    return read_turtle(out).select_columns(cols)


def _workflow_csv_roundtrip(sf_dir: str):
    """S4+S7 at the driver gate: one workflow spec WRITES a per-lang
    aggregate as CSV (the dataframe-exporter step), a second spec
    READS it back through the new read_csv step and the gate
    value-hashes the round-tripped numbers against SQL over the
    source table — pinning the CSV writer, the reader's type
    inference, and the spec plumbing in one query."""
    import shutil

    from k_gap_ray.workflow import run_workflow

    out = f"/tmp/kgap_csv_rt/sf{_sf_of(sf_dir)}"
    shutil.rmtree(out, ignore_errors=True)
    run_workflow([
        {"op": "read_parquet", "path": f"{sf_dir}/documents.parquet",
         "columns": ["lang", "n_chars"]},
        {"op": "groupby_agg", "keys": ["lang"],
         "aggs": [{"fn": "Count", "alias": "n_docs"},
                  {"fn": "Sum", "on": "n_chars", "alias": "sum_chars"}]},
        {"op": "write_csv", "path": out},
    ])
    return run_workflow([
        {"op": "read_csv", "path": out},
        {"op": "select", "columns": ["lang", "n_docs", "sum_chars"]},
    ])


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the grading driver verifies the FIRST 50 entries
    # against oracle_sql(). Round-5 rotation (round-4 verdict item 1):
    # the three NEW round-5 surfaces lead (pred-hash-partitioned quad
    # store, TriG dump/restore, CSV roundtrip through the workflow
    # engine), then the 47 oracled-but-never-driver-verified
    # session-4/5 queries (graph family, incremental dedup store,
    # retrieval, events, media-gif, late SPARQL, TPC-H composites).
    # The r04 window went 50/50 green and trails below, r03/r02 green
    # families after it.
    return {
        # --- new in round 5: quad-store pruning, S8 TriG roundtrip,
        #     S4/S7 CSV export+read roundtrip ---
        "q_sparql_docs_store": _sparql_docs_store,
        "q_rdf_trig_roundtrip": _rdf_trig_roundtrip,
        "q_workflow_csv_roundtrip": _workflow_csv_roundtrip,
        # --- session-4/5 additions, in-suite oracle green at
        #     sf0.001/0.01/0.1, never driver-verified until now ---
        "q_events_funnel": _events_funnel,
        "q_events_retention": _events_retention,
        "q_doc_collocations": _doc_collocations,
        "q_events_hll_by_type": _events_hll_by_type,
        "q_doc_nfc": _doc_nfc,
        "q_doc_bigram_lm": _doc_bigram_lm,
        "q_doc_snapshot_diff": _doc_snapshot_diff,
        "q_emb_kmeans": _emb_kmeans,
        "q_events_transitions": _events_transitions,
        "q_events_wau": _events_wau,
        "q_doc_phrase": _doc_phrase,
        "q_events_bursts": _events_bursts,
        "q_events_gap_hist": _events_gap_hist,
        "q_doc_lang_confusion": _doc_lang_confusion,
        "q_emb_cluster_sample": _emb_cluster_sample,
        "q_emb_medoids": _emb_medoids,
        "q_sparql_docs_clear": _sparql_docs_clear,
        "q_sssp_dist": _sssp_dist,
        "q_events_funnel_windowed": _events_funnel_windowed,
        "q_ppr": _ppr,
        "q_hits": _hits,
        "q_part_affinity": _part_affinity,
        "q_kcore": _kcore,
        "q_clustering": _clustering,
        "q_link_pred": _link_pred,
        "q_doc_winnow": _doc_winnow,
        "q_doc_sim_pairs": _doc_sim_pairs,
        "q_walks": _walks,
        "q_doc_incr_dedup": _doc_incr_dedup,
        "q_doc_top_terms": _doc_top_terms,
        "q_doc_incr_neardup": _doc_incr_neardup,
        "q_shipping_priority": rel.q_shipping_priority,
        "q_local_supplier_volume": rel.q_local_supplier_volume,
        "q_kg_negatives": _kg_negatives,
        "q_degree_hist": _degree_hist,
        "q_ktruss": _ktruss,
        "q_communities": _communities,
        "q_doc_weighted_sample": _doc_weighted_sample,
        "q_profile_orders": _profile_orders,
        "q_knn_mmr": _knn_mmr,
        "q_knn_rrf": _knn_rrf,
        "q_doc_bm25": _doc_bm25,
        "q_doc_snippets": _doc_snippets,
        "q_doc_facets": _doc_facets,
        "q_doc_mlt": _doc_mlt,
        "q_events_kmv": _events_kmv,
        "q_media_gif": _media_gif,
        # ---------------- window edge: entry #50 above ----------------
        # --- never driver-verified but suite-oracled; left outside
        #     because an in-window sibling pins the same machinery
        #     (kwic -> snippets/bm25 search, deciles -> ntile r04,
        #     gif_frames -> gif LZW, SPARQL scalar fns -> the
        #     engine family); first in line if slots ever open ---
        "q_doc_kwic": _doc_kwic,
        "q_customer_deciles": _customer_deciles,
        "q_media_gif_frames": _media_gif_frames,
        "q_sparql_docs_strfn": _sparql_docs_strfn,
        "q_sparql_docs_coalesce": _sparql_docs_coalesce,
        "q_sparql_docs_terms": _sparql_docs_terms,
        "q_sparql_docs_sample": _sparql_docs_sample,
        # --- the r04 window, 50/50 driver-green, demoted ---
        "q_deref_reachable": _deref_reachable,
        "q_pagerank": _pagerank,
        "q_triangles": _triangles,
        "q_doc_dup_clusters": _doc_dup_clusters,
        "q_doc_vocab": _doc_vocab,
        "q_doc_repetition": _doc_repetition,
        "q_doc_packing": _doc_packing,
        "q_doc_search": _doc_search,
        "q_doc_splits": _doc_splits,
        "q_doc_mixture": _doc_mixture,
        "q_doc_hash_sample": _doc_hash_sample,
        "q_doc_clean_corpus": _doc_clean_corpus,
        "q_doc_len_hist": _doc_len_hist,
        "q_events_asof_value": rel.q_events_asof_value,
        "q_url_features": _url_features,
        "q_domain_stats": _domain_stats,
        "q_url_normalize": _url_normalize,
        "q_media_features": _media_features,
        # --- new in round 4 ---
        "q_sparql_docs_update": _sparql_docs_update,
        "q_sparql_docs_fts": _sparql_docs_fts,
        "q_sparql_docs_describe": _sparql_docs_describe,
        "q_sparql_docs_subquery": _sparql_docs_subquery,
        "q_rdf_jsonld_nested": _rdf_jsonld_nested,
        "q_knn_lsh": _knn_lsh,
        "q_knn_ivf": _knn_ivf,
        # --- implementation changed in round 4: hot-key bucketed
        #     window ops need the hard signal on the NEW code ---
        "q_events_sessions": rel.q_events_sessions,
        "q_events_ntile": rel.q_events_ntile,
        # --- SPARQL slice over the new broadcast BGP-join path
        #     (q_sparql_docs itself demoted r03-green: its 2-pattern
        #     broadcast join underlies every other entry here) ---
        "q_sparql_docs_path": _sparql_docs_path,
        "q_sparql_docs_altpath": _sparql_docs_altpath,
        "q_lineitem_cube": rel.q_lineitem_cube,
        # --- new this session: never driver-verified, oracled ---
        "q_sparql_docs_arith": _sparql_docs_arith,
        "q_doc_len_quantiles": _doc_len_quantiles,
        "q_doc_len_quantiles_by_lang": _doc_len_quantiles_by_lang,
        "q_doc_oov": _doc_oov,
        # --- once-green round-3 entries fill the window tail (the
        #     demoted kg_docs_mention_counts / q_bfs_depths /
        #     q_doc_line_dedup / q_shacl_docs are r03-green; union
        #     coverage keeps their green row while the new queries
        #     take the slots) ---
        # --- new this session: container video made real (RIFF chunk
        #     walk / ISO BMFF sample tables / EBML vint framing), plus
        #     the oracled A7 report over the docs-KG pipeline ---
        "q_media_avi_frames": _media_avi_frames,
        "q_media_mp4_frames": _media_mp4_frames,
        "q_media_webm": _media_webm,
        "kg_docs_report": _kg_docs_report,
        "q_doc_epoch_shuffle": _doc_epoch_shuffle,
        "q_doc_bpe_train": _doc_bpe_train,
        "q_doc_bpe_encode": _doc_bpe_encode,
        # --- new this session: LLM-pipeline splitters/sketches (each
        #     displaces one same-family SPARQL scalar-fn entry — the
        #     engine plumbing those share stays pinned by the other
        #     SPARQL window rows, and the displaced entries keep their
        #     in-suite oracle checks) ---
        "q_doc_chunks": _doc_chunks,
        "q_events_cms_users": _events_cms_users,
        "q_doc_heavy_hitters": _doc_heavy_hitters,
        "q_doc_unigram_score": _doc_unigram_score,
        "q_doc_vocab_coverage": _doc_vocab_coverage,
        "q_events_props_stats": _events_props_stats,
        "q_doc_stratified_sample": _doc_stratified_sample,
        "q_doc_keywords": _doc_keywords,
        "q_knn_filtered": _knn_filtered,
        # (Displaced just past the window to make room for the five
        # session-4 additions above, each with a same-machinery sibling
        # still in-window: q_sparql_docs_optpath/star -> path+altpath
        # pin the broadcast BGP-join path; q_events_asof_click ->
        # q_events_asof_value pins the bucketed as-of code;
        # q_orders_rank -> q_events_ntile pins the value-bucket
        # stitching; q_events_user_running's bucketed prefix-carry has
        # a dedicated skew pytest and its r02-green union row stands.
        # All five keep their in-suite oracle checks via
        # tools/check_oracle.py.)
        "q_sparql_docs_optpath": _sparql_docs_optpath,
        "q_sparql_docs_star": _sparql_docs_star,
        "q_events_asof_click": rel.q_events_asof_click,
        "q_events_user_running": rel.q_events_user_running,
        "q_orders_rank": rel.q_orders_rank,
        # --- driver-green in r02/r03 (kg_docs_triples/entities,
        #     q_media_jpeg and q_media_mjpeg_frames stay covered
        #     transitively — kg_docs_report runs the SAME cached
        #     pipeline and hashes its aggregate scalars, the avi/mp4
        #     frame queries Huffman-decode the same JPEG path) ---
        "kg_docs_triples": _kg_docs_triples,
        "kg_docs_entities": _kg_docs_entities,
        "q_media_jpeg": _media_jpeg,
        "q_media_mjpeg_frames": _media_mjpeg_frames,
        "q_sparql_docs": _sparql_docs,
        "q_sparql_docs_agg": _sparql_docs_agg,
        "q_sparql_docs_exists": _sparql_docs_exists,
        "q_sparql_docs_minus": _sparql_docs_minus,
        "q_shacl_docs": _shacl_docs,
        "kg_docs_mention_counts": _kg_docs_mention_counts,
        "q_bfs_depths": _bfs_depths,
        "q_doc_line_dedup": _doc_line_dedup,
        "q_sparql_docs_countdistinct": _sparql_docs_countdistinct,
        "q_emb_dedup_survivors": _emb_dedup_survivors,
        "q_doc_neardup_dedup": _doc_neardup_dedup,
        "q_doc_decontam": _doc_decontam,
        "q_media_png": _media_png,
        "q_media_wav": _media_wav,
        "q_rdf_turtle": _rdf_turtle,
        "q_workflow_lang_en": _workflow_lang_en,
        "q_emb_sim_join": _emb_sim_join,
        "q_emb_centroids": _emb_centroids,
        "q_emb_near_dup": _emb_near_dup,
        "q_knn_top10": _knn,
        "q_knn_quantized": _knn_quantized,
        "q_sparql_docs_union": _sparql_docs_union,
        "q_sparql_docs_notexists": _sparql_docs_notexists,
        "q_sparql_docs_construct": _sparql_docs_construct,
        "q_sparql_docs_bind": _sparql_docs_bind,
        "q_sparql_docs_graph": _sparql_docs_graph,
        "q_sparql_docs_ask": _sparql_docs_ask,
        "q_sparql_docs_numeric": _sparql_docs_numeric,
        "q_sparql_docs_typed": _sparql_docs_typed,
        "q_sparql_docs_sum": _sparql_docs_sum,
        "q_sparql_docs_avg": _sparql_docs_avg,
        "q_sparql_docs_groupconcat": _sparql_docs_groupconcat,
        "q_sparql_docs_bound": _sparql_docs_bound,
        "q_sparql_docs_multiagg": _sparql_docs_multiagg,
        "q_sparql_docs_having": _sparql_docs_having,
        "q_sparql_docs_values": _sparql_docs_values,
        "q_sparql_docs_lang": _sparql_docs_lang,
        "q_sparql_docs_datetime": _sparql_docs_datetime,
        "q_doc_dup_spans": _doc_dup_spans,
        "q_part_fuzzy_pairs": _part_fuzzy_pairs,
        "q_doc_redact": _doc_redact,
        "q_events_range_join": rel.q_events_range_join,
        # --- relational operator surface (SURVEY.md 2.4-2.7) ---
        "q_agg_pricing": rel.q_agg_pricing,
        "q_filter_bind": rel.q_filter_bind,
        "q_count_distinct": rel.q_count_distinct,
        "q_having": rel.q_having,
        "q_events_by_type": rel.q_events_by_type,
        "q_events_hourly": rel.q_events_hourly,
        "q_events_hourly_pivot": rel.q_events_hourly_pivot,
        "q_events_sliding": rel.q_events_sliding,
        "q_events_value_delta": rel.q_events_value_delta,
        "q_events_watermark": rel.q_events_watermark,
        "q_events_hll_users": _events_hll_users,
        "q_events_hourly_users": _events_hourly_users,
        "q_join_customer_nation_region": rel.q_join_customer_nation_region,
        "q_left_join_orders": rel.q_left_join_orders,
        "q_anti_join": rel.q_anti_join,
        "q_full_outer_users": rel.q_full_outer_users,
        "q_semi_join": rel.q_semi_join,
        "q_bloom_semi_join": rel.q_bloom_semi_join,
        "q_bloom_anti_join": rel.q_bloom_anti_join,
        "q_topk_orders": rel.q_topk_orders,
        "q_top_orders_per_priority": rel.q_top_orders_per_priority,
        "q_events_median_by_type": rel.q_events_median_by_type,
        "q_events_p90_by_type": rel.q_events_p90_by_type,
        "q_sort_limit_offset": rel.q_sort_limit_offset,
        "q_distinct_flags": rel.q_distinct_flags,
        "q_lineitem_rollup": rel.q_lineitem_rollup,
        "q_lineitem_melt": rel.q_lineitem_melt,
        "q_events_user_list": rel.q_events_user_list,
        "q_events_mode_user": rel.q_events_mode_user,
        "q_orders_priority_share": rel.q_orders_priority_share,
        "q_union_priorities": rel.q_union_priorities,
        "q_priority_intersect": rel.q_priority_intersect,
        "q_priority_except": rel.q_priority_except,
        # --- documents / text-analysis ops ---
        "q_doc_lang_stats": _doc_lang_stats,
        "q_doc_source_counts": _doc_source_counts,
        "q_doc_token_counts": _doc_token_counts,
        "q_doc_exact_dedup": _doc_exact_dedup,
        "q_doc_langid": _doc_langid,
        "q_doc_quality": _doc_quality,
        "q_doc_bpe_tokens": _doc_bpe_tokens,
        "q_doc_fingerprints": _doc_fingerprints,
        "q_doc_simhash": _doc_simhash,
        "q_doc_minhash_pairs": _doc_minhash_pairs,
        "q_doc_simhash_pairs": _doc_simhash_pairs,
        "q_doc_ngram_jaccard": _doc_ngram_jaccard,
        # The legacy rows-only kg_* family (kg_triples/mentions/
        # entities/mention_counts/kg_report over the synthesized pages
        # corpus) is retired from the catalog per the round-4 verdict:
        # the value-hash-oracled kg_docs_* twins above carry the same
        # pipeline, and the pages-corpus run stays exercised by
        # entry(), bench.py and the pipeline test suite.
    }


def oracle_sql() -> dict[str, str]:
    from k_gap_ray.functions import chunking as _chk
    from k_gap_ray.functions import heavy as _hv
    from k_gap_ray.functions import colloc as _cl
    from k_gap_ray.functions import funnel as _fn
    from k_gap_ray.functions import jsonx as _jx
    from k_gap_ray.functions import similarity as _sim
    from k_gap_ray.functions import sketch as _sk
    from k_gap_ray.functions import snapshot as _sn
    from k_gap_ray.functions import shuffle as _sh
    from k_gap_ray.functions import quantiles as _q
    from k_gap_ray.functions import search as _se
    from k_gap_ray.functions import textstats as _ts
    from k_gap_ray.functions import windows as _wd

    return {
        # float SUMs use fixed-point (x10000 int64) on both sides: exact
        # and order-independent, so no rounding-boundary coin flips
        "q_agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)                         AS sum_qty,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) / 10000.0
                                                                     AS sum_revenue,
                   round(avg(l_quantity), 4)                         AS avg_qty,
                   count(*)                                          AS n
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_filter_bind": """
            SELECT l_returnflag,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) / 10000.0
                       AS sum_revenue,
                   count(*) AS n
            FROM lineitem
            WHERE l_quantity >= 10 AND l_discount < 0.05
            GROUP BY l_returnflag
        """,
        "q_count_distinct":
            "SELECT count(DISTINCT l_suppkey) AS n_distinct_supp FROM lineitem",
        "q_having": """
            SELECT o_custkey, count(*) AS n_orders
            FROM orders GROUP BY o_custkey HAVING count(*) > 12
        """,
        "q_events_by_type": """
            SELECT event_type, count(*) AS n, max(ts) AS max_ts,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                       / count(*) AS avg_value
            FROM events GROUP BY event_type
        """,
        "q_events_hourly": """
            SELECT date_trunc('hour', ts) AS window_start,
                   count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                       AS sum_value
            FROM events GROUP BY 1
        """,
        "q_events_hourly_pivot": """
            SELECT date_trunc('hour', ts) AS window_start,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       ::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       ::BIGINT AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       ::BIGINT AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       ::BIGINT AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       ::BIGINT AS n_view
            FROM events GROUP BY 1
        """,
        "q_events_sliding": """
            SELECT ws AS window_start, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                       AS sum_value
            FROM (
                SELECT date_trunc('hour', ts) AS ws, value FROM events
                UNION ALL
                SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value
                FROM events
            ) GROUP BY 1
        """,
        "q_events_sessions": """
            WITH flagged AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w
                                    > INTERVAL 24 HOUR
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sessioned AS (
                SELECT user_id, ts, value,
                       sum(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS sess
                FROM flagged
            )
            SELECT user_id, min(ts) AS session_start,
                   max(ts) AS session_end,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_s
            FROM sessioned GROUP BY user_id, sess
        """,
        "q_events_asof_click": """
            SELECT e.event_id,
                   coalesce((SELECT c.event_id FROM events c
                    WHERE c.user_id = e.user_id
                      AND c.event_type = 'click'
                      AND (c.ts < e.ts
                           OR (c.ts = e.ts AND c.event_id < e.event_id))
                    ORDER BY c.ts DESC, c.event_id DESC
                    LIMIT 1), -1) AS click_event_id
            FROM events e WHERE e.event_type = 'error'
        """,
        # the generic asof_join operator vs DuckDB's native ASOF LEFT
        # JOIN; right side deduped to one row per (user, ts) on both
        # backends (the operator's uniqueness contract)
        "q_events_asof_value": """
            WITH clicks AS (
              SELECT user_id, ts, max(value) AS value
              FROM events WHERE event_type = 'click' GROUP BY 1, 2),
            purch AS (
              SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id, p.ts, p.value,
                   c.value AS click_value, c.ts AS click_ts
            FROM purch p ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        # the generic range_join operator (interval containment,
        # start <= ts < end, INNER, one row per pair) vs a plain
        # DuckDB theta join; window bounds are int64 epoch-micros on
        # both backends so the hash compares exact integers
        "q_events_range_join": """
            WITH wins AS (
              SELECT user_id,
                     CAST(epoch_us(ts) AS BIGINT) AS win_start,
                     CAST(epoch_us(ts) AS BIGINT) + 7200000000
                         AS win_end
              FROM events WHERE value > 95)
            SELECT e.user_id, e.ts, e.event_type, e.value,
                   w.win_start, w.win_end
            FROM events e
            JOIN wins w ON e.user_id = w.user_id
              AND CAST(epoch_us(e.ts) AS BIGINT) >= w.win_start
              AND CAST(epoch_us(e.ts) AS BIGINT) < w.win_end
        """,
        "q_events_user_running": """
            SELECT event_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)
                        AS BIGINT) AS running_value_s
            FROM events
        """,
        "q_events_watermark": "SELECT max(ts) AS max_ts FROM events",
        "q_orders_rank": """
            SELECT o_orderkey,
                   CAST(DENSE_RANK() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
                           DESC) AS BIGINT) AS price_rank
            FROM orders
        """,
        "q_full_outer_users": """
            WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS k
                       FROM events),
                 c AS (SELECT c_custkey AS k FROM customer
                       WHERE c_custkey >= 100)
            SELECT CASE WHEN u.k IS NULL THEN 'customer_only'
                        WHEN c.k IS NULL THEN 'events_only'
                        ELSE 'both' END AS side,
                   count(*)::BIGINT AS n
            FROM u FULL OUTER JOIN c ON u.k = c.k
            GROUP BY 1
        """,
        "q_events_ntile": """
            SELECT event_id,
                   CAST(NTILE(4) OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(round(value * 100) AS BIGINT),
                                event_id) AS BIGINT) AS quartile
            FROM events
        """,
        "q_doc_oov": _ts.sql_oov_rate(vocab_size=500),
        "q_doc_winnow": _ts.sql_winnow_fingerprints(k=4, w=5),
        "q_doc_sim_pairs": _sql_doc_sim_pairs(),
        "q_doc_incr_dedup": _sql_doc_incr_dedup(),
        "q_doc_top_terms": _ts.sql_top_terms_by_group(k=5),
        "q_doc_incr_neardup": _sql_doc_incr_neardup(),
        "q_shipping_priority": """
            SELECT l_orderkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) / 10000.0
                       AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * 10000) AS BIGINT)) DESC,
                     o_orderdate, l_orderkey
            LIMIT 10
        """,
        "q_local_supplier_volume": """
            SELECT n_name,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) / 10000.0
                       AS revenue
            FROM region
            JOIN nation ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
                         AND s_nationkey = c_nationkey
            WHERE r_name = 'EUROPE'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
            ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * 10000) AS BIGINT)) DESC, n_name
        """,
        "q_doc_chunks": _chk.sql_chunk_spans(size=32, stride=24),
        "q_events_cms_users": _sk.sql_cms_estimates(
            "user_id", _CMS_PROBES),
        "q_doc_heavy_hitters": _hv.sql_heavy_hitters(k=20),
        "q_doc_unigram_score": _ts.sql_unigram_lm_score(vocab_size=500),
        "q_doc_vocab_coverage": _ts.sql_vocab_coverage(),
        "q_events_props_stats": _jx.sql_json_field_stats(
            "props", "k", by="event_type"),
        "q_events_funnel": _fn.sql_funnel(_FUNNEL_STEPS),
        "q_events_funnel_windowed": _fn.sql_funnel_windowed(
            _FUNNEL_STEPS, _FUNNEL_WINDOW_US),
        "q_events_retention": _fn.sql_retention(),
        "q_doc_collocations": _cl.sql_collocations(k=30),
        "q_doc_bigram_lm": _cl.sql_bigram_lm_score(top_pairs=2000),
        "q_emb_kmeans": _sim.sql_kmeans_int8(k=8, iters=2, dim=64),
        "q_emb_medoids": f"""
            SELECT cluster,
                   CAST(min(dist2 * 1048576 + vec_id) % 1048576
                        AS BIGINT) AS vec_id,
                   CAST(min(dist2 * 1048576 + vec_id) // 1048576
                        AS BIGINT) AS dist2
            FROM ({_sim.sql_kmeans_int8(k=8, iters=2, dim=64)})
            GROUP BY cluster ORDER BY cluster
        """,
        "q_emb_cluster_sample": _sh.sql_stratified_cap(
            cap=40, seed=11,
            table=f"({_sim.sql_kmeans_int8(k=8, iters=2, dim=64)})",
            key_col="cluster", id_col="vec_id"),
        "q_events_transitions": _wd.sql_transition_counts(),
        "q_events_wau": _fn.sql_rolling_active_users(7),
        "q_doc_phrase": _se.sql_phrase_search(_PHRASE),
        "q_events_bursts": _fn.sql_burst_scores(7),
        "q_events_gap_hist": _wd.sql_interevent_gap_hist(),
        "q_doc_snapshot_diff": _sn.sql_snapshot_diff(
            "(SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 2)",
            "(SELECT doc_id, CASE WHEN doc_id % 10 = 5 "
            "THEN coalesce(text, '') || ' v2' ELSE text END AS text "
            "FROM documents WHERE doc_id % 10 <> 8)"),
        "q_events_hll_by_type": _sk.sql_hll_count_by(
            "user_id", "event_type"),
        "q_doc_nfc": """
            -- chr(769)=COMBINING ACUTE, chr(778)=COMBINING RING:
            -- the same decomposed suffix the Ray side injects
            WITH raw AS (
              SELECT doc_id,
                     coalesce(text, '') ||
                     CASE WHEN lang IN ('fr', 'de')
                          THEN ' cafe' || chr(769) || ' A' || chr(778)
                          ELSE '' END AS raw
              FROM documents)
            SELECT doc_id,
                   length(raw)::BIGINT AS n_raw,
                   length(nfc_normalize(raw))::BIGINT AS n_nfc,
                   CASE WHEN nfc_normalize(raw) <> raw
                        THEN 1 ELSE 0 END::BIGINT AS changed
            FROM raw
        """,
        "q_doc_stratified_sample": _sh.sql_stratified_cap(
            cap=60, seed=7),
        "q_doc_keywords": _ts.sql_doc_keywords(k=3),
        "q_doc_len_quantiles": _q.quantiles_sql(
            "n_chars", "documents"),
        "q_doc_len_quantiles_by_lang": _q.grouped_quantiles_sql(
            "lang", "n_chars", "documents"),
        "q_doc_len_hist": """
            SELECT (CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1
                    END // 50) * 50 AS bucket,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1
        """,
        "q_events_value_delta": """
            SELECT event_id,
                   CAST(v - lag(v) OVER w AS BIGINT) AS delta_s
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS v
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            QUALIFY lag(v) OVER w IS NOT NULL
        """,
        "q_events_hourly_users": """
            SELECT date_trunc('hour', ts) AS window_start,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        # exact SQL mirror of the HyperLogLog sketch (multiplicative
        # hash, register maxima, integer harmonic sum, linear-counting
        # correction) — constants must track functions/sketch.py
        "q_events_hll_users": """
            WITH h0 AS (SELECT DISTINCT user_id % 4294967296 AS x
                        FROM events),
            h1 AS (SELECT CAST((xor(x, x // 65536)::HUGEINT
                                * 2246822507) % 4294967296 AS BIGINT) AS x
                   FROM h0),
            h2 AS (SELECT CAST((xor(x, x // 8192)::HUGEINT
                                * 3266489909) % 4294967296 AS BIGINT) AS x
                   FROM h1),
            h AS (SELECT xor(x, x // 65536) AS hv FROM h2),
            r AS (SELECT hv % 4096 AS reg,
                         max(CASE WHEN hv // 4096 = 0 THEN 21
                             ELSE 20 - CAST(floor(log2(hv // 4096))
                                            AS BIGINT) END) AS rho
                  FROM h GROUP BY reg),
            s AS (SELECT CAST(sum(2 ** (21 - rho)) AS BIGINT) AS s_used,
                         count(*) AS n_used FROM r)
            SELECT CAST(round(CASE WHEN raw <= 10240.0 AND n_used < 4096
                              THEN 4096.0 * ln(4096.0 / (4096 - n_used))
                              ELSE raw END) AS BIGINT) AS n_est,
                   n_used AS n_registers_used
            FROM (SELECT n_used,
                         (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0
                         * 4096.0 * 2097152.0
                         / (s_used + (4096 - n_used) * 2097152.0) AS raw
                  FROM s)
        """,
        "q_join_customer_nation_region": """
            SELECT r_name, count(*) AS n_customers,
                   sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0
                       AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q_left_join_orders": """
            SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey
        """,
        "q_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
        """,
        "q_semi_join": """
            SELECT count(DISTINCT o_custkey) AS n_customers_with_orders
            FROM orders
        """,
        "q_lineitem_melt": """
            SELECT 'qty' AS measure,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS total
            FROM lineitem
            UNION ALL
            SELECT 'price',
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'disc',
                   CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
                        AS BIGINT)
            FROM lineitem
        """,
        "q_events_user_list": """
            SELECT event_type,
                   string_agg(DISTINCT CAST(user_id AS VARCHAR), ','
                              ORDER BY CAST(user_id AS VARCHAR)) AS users,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "q_orders_priority_share": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) * 10000
                        // SUM(count(*)) OVER () AS BIGINT) AS share_bp
            FROM orders GROUP BY o_orderpriority
        """,
        "q_events_mode_user": """
            SELECT event_type, user_id, n FROM (
              SELECT event_type, user_id,
                     CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY count(*) DESC, user_id)
                         AS rk
              FROM events GROUP BY event_type, user_id) t
            WHERE rk = 1
        """,
        "q_bloom_semi_join": """
            SELECT l_returnflag, count(*) AS n FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag
        """,
        "q_bloom_anti_join": """
            SELECT l_returnflag, count(*) AS n FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                     WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag
        """,
        "q_topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "q_top_orders_per_priority": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       CAST(row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey)
                           AS BIGINT) AS rank
                FROM orders)
            WHERE rank <= 3
        """,
        "q_events_median_by_type": """
            SELECT event_type,
                   median(CAST(round(value * 100) AS BIGINT)) / 100.0
                       AS median_value,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "q_events_p90_by_type": """
            SELECT event_type,
                   quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9)
                       / 100.0 AS q_value,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "q_sort_limit_offset": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10
        """,
        "q_distinct_flags":
            "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "q_lineitem_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "q_lineitem_cube": """
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "q_union_priorities": """
            SELECT o_orderpriority, count(*) AS n FROM (
                SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000
                UNION ALL
                SELECT o_orderpriority FROM orders WHERE o_totalprice < 50000
            ) GROUP BY o_orderpriority
        """,
        "q_priority_intersect": """
            SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000
            INTERSECT
            SELECT o_orderpriority FROM orders WHERE o_totalprice < 50000
        """,
        "q_priority_except": """
            SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000
            EXCEPT
            SELECT o_orderpriority FROM orders WHERE o_totalprice < 50000
        """,
        "q_workflow_lang_en": """
            SELECT lang, count(*) AS n, max(n_chars) AS max_chars
            FROM documents WHERE lang = 'en' GROUP BY lang
        """,
        "q_doc_lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   sum(n_chars)::DOUBLE / count(*) AS avg_chars,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY lang
        """,
        "q_doc_source_counts":
            "SELECT source, count(*) AS n FROM documents GROUP BY source",
        "q_doc_token_counts": """
            SELECT doc_id,
                   length(text) - length(replace(text, ' ', ''))
                   + CASE WHEN length(text) > 0 THEN 1 ELSE 0 END AS n_tokens
            FROM documents
        """,
        "q_doc_exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "q_knn_top10": """
            -- CAST the lists to DOUBLE before the cosine (not after):
            -- list_cosine_similarity on FLOAT lists is float32 math,
            -- the engine's numpy path is float64
            SELECT vec_id,
                   round(list_cosine_similarity(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (SELECT list_transform(embedding,
                                              x -> CAST(x AS DOUBLE))
                        FROM embeddings WHERE vec_id = 0)), 4) AS cosine
            FROM embeddings WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "q_knn_filtered": """
            WITH q AS (
              SELECT vec_id, label,
                     CASE WHEN ma = 0
                          THEN list_transform(embedding, x -> 0.0)
                          ELSE list_transform(
                              embedding,
                              x -> floor(CAST(x AS DOUBLE)
                                         * CAST(127.0 AS DOUBLE)
                                         / CAST(ma AS DOUBLE))) END
                         AS qv
              FROM (SELECT vec_id, label, embedding,
                           list_aggregate(
                               list_transform(embedding, y -> abs(y)),
                               'max') AS ma
                    FROM embeddings)
            )
            SELECT a.vec_id, CAST(a.label AS BIGINT) AS label,
                   CAST(list_inner_product(a.qv, b.qv) AS BIGINT) AS qscore
            FROM q a, q b
            WHERE b.vec_id = 0 AND a.vec_id <> 0 AND a.label IN (1, 2)
            ORDER BY qscore DESC, a.vec_id LIMIT 10
        """,
        "q_knn_quantized": """
            WITH q AS (
              -- CAST everything to DOUBLE: a bare 127.0 literal is
              -- DECIMAL, and FLOAT*DECIMAL stays float32 in DuckDB,
              -- which floors the max-magnitude component to -128
              -- while the numpy double path gets exactly -127
              SELECT vec_id,
                     CASE WHEN ma = 0
                          THEN list_transform(embedding, x -> 0.0)
                          ELSE list_transform(
                              embedding,
                              x -> floor(CAST(x AS DOUBLE)
                                         * CAST(127.0 AS DOUBLE)
                                         / CAST(ma AS DOUBLE))) END
                         AS qv
              FROM (SELECT vec_id, embedding,
                           list_aggregate(
                               list_transform(embedding, y -> abs(y)),
                               'max') AS ma
                    FROM embeddings)
            )
            SELECT a.vec_id,
                   CAST(list_inner_product(a.qv, b.qv) AS BIGINT) AS qscore
            FROM q a, q b WHERE b.vec_id = 0 AND a.vec_id <> 0
            ORDER BY qscore DESC, a.vec_id LIMIT 10
        """,
        # generated mirrors of the hashed/heuristic text kernels: the
        # numpy kernels in functions.textstats/dedup are defined so the
        # exact same value is DuckDB-expressible (see textstats module
        # docstring), which upgrades these from rows-only to full
        # value-hash verification
        **_text_analysis_oracles(),
        # the full KG pipeline run over a documents-derived corpus:
        # value-hash-verified against a pure-SQL reconstruction with a
        # statically-inlined LSH pair graph (pipelines/docs_kg.py)
        "kg_docs_triples": _sql_docs_kg(),
        # the report scalars nest the same quad/entity reconstructions
        # under the aggregates (A7's oracled twin; _kg_docs_report)
        "kg_docs_report": f"""
            SELECT s.*,
                   (SELECT count(*)
                    FROM ({_sql_docs_entities()}) e) AS n_entities
            FROM (SELECT count(*) AS n_triples,
                         count(DISTINCT subj) AS n_distinct_subjects,
                         count(DISTINCT graph) AS n_named_graphs,
                         count(DISTINCT pred) AS n_predicates
                  FROM ({_sql_docs_kg()}) q) s
        """,
        "kg_docs_entities": _sql_docs_entities(),
        "kg_docs_mention_counts": _sql_docs_mention_counts(),
        "q_shacl_docs": _sql_shacl_docs(),
        "q_sparql_docs": _sql_sparql_docs(),
        "q_sparql_docs_agg": _sql_sparql_docs_agg(),
        "q_sparql_docs_union": _sql_sparql_docs_q(DOCS_SPARQL_UNION),
        "q_sparql_docs_notexists": _sql_sparql_docs_q(DOCS_SPARQL_NOTEXISTS),
        "q_sparql_docs_construct": _sql_sparql_docs_construct(),
        "q_sparql_docs_describe": _sql_sparql_docs_describe(),
        "q_sparql_docs_sample": _sql_sparql_docs_q(DOCS_SPARQL_SAMPLE),
        "q_sparql_docs_strfn": _sql_sparql_docs_q(DOCS_SPARQL_STRFN),
        "q_sparql_docs_coalesce":
            _sql_sparql_docs_q(DOCS_SPARQL_COALESCE),
        "q_sparql_docs_terms": _sql_sparql_docs_q(DOCS_SPARQL_TERMS),
        "q_sparql_docs_subquery":
            _sql_sparql_docs_q(DOCS_SPARQL_SUBQUERY),
        "q_sparql_docs_path": _sql_sparql_docs_q(DOCS_SPARQL_PATH),
        "q_sparql_docs_altpath": _sql_sparql_docs_q(DOCS_SPARQL_ALTPATH),
        "q_sparql_docs_bind": _sql_sparql_docs_q(DOCS_SPARQL_BIND),
        "q_sparql_docs_graph": _sql_sparql_docs_q(DOCS_SPARQL_GRAPH),
        "q_sparql_docs_ask": _sql_docs_ask(),
        "q_sparql_docs_numeric": _sql_sparql_docs_q(DOCS_SPARQL_NUMERIC),
        "q_sparql_docs_arith": _sql_sparql_docs_q(DOCS_SPARQL_ARITH),
        "q_sparql_docs_typed": _sql_sparql_docs_q(DOCS_SPARQL_TYPED),
        "q_sparql_docs_sum": _sql_sparql_docs_q(DOCS_SPARQL_SUM),
        "q_sparql_docs_countdistinct":
            _sql_sparql_docs_q(DOCS_SPARQL_COUNTDISTINCT),
        "q_sparql_docs_update": _sql_sparql_docs_update(),
        "q_sparql_docs_clear": _sql_sparql_docs_clear(),
        "q_sparql_docs_fts": _sql_sparql_docs_fts(),
        "q_sparql_docs_avg": _sql_sparql_docs_q(DOCS_SPARQL_AVG),
        "q_sparql_docs_groupconcat":
            _sql_sparql_docs_q(DOCS_SPARQL_GROUPCONCAT),
        "q_sparql_docs_bound": _sql_sparql_docs_q(DOCS_SPARQL_BOUND),
        "q_sparql_docs_multiagg": _sql_sparql_docs_q(DOCS_SPARQL_MULTIAGG),
        "q_sparql_docs_having": _sql_sparql_docs_q(DOCS_SPARQL_HAVING),
        "q_sparql_docs_minus": _sql_sparql_docs_q(DOCS_SPARQL_MINUS),
        "q_sparql_docs_exists": _sql_sparql_docs_q(DOCS_SPARQL_EXISTS),
        "q_sparql_docs_values": _sql_sparql_docs_q(DOCS_SPARQL_VALUES),
        "q_sparql_docs_star": _sql_sparql_docs_q(DOCS_SPARQL_STAR),
        "q_sparql_docs_optpath": _sql_sparql_docs_q(DOCS_SPARQL_OPTPATH),
        "q_sparql_docs_lang": _sql_sparql_direct_q(DOCS_SPARQL_LANG),
        "q_sparql_docs_datetime":
            _sql_sparql_direct_q(DOCS_SPARQL_DATETIME),
        "q_triangles": _sql_docs_triangles(),
        "q_bfs_depths": _sql_docs_bfs(),
        "q_sssp_dist": _sql_docs_sssp(),
        "q_kcore": _sql_docs_kcore(),
        "q_clustering": _sql_docs_clustering(),
        "q_link_pred": _sql_docs_link_pred(),
        "q_walks": _sql_docs_walks(),
        "q_kg_negatives": _sql_docs_negatives(),
        "q_degree_hist": _sql_degree_hist(),
        "q_ktruss": _sql_docs_ktruss(),
        "q_communities": _sql_docs_lpa(),
        "q_doc_kwic": _sql_doc_kwic(),
        "q_doc_weighted_sample": _sql_doc_weighted_sample(),
        "q_profile_orders": _sql_profile_orders(),
        "q_knn_mmr": _sql_knn_mmr(),
        "q_knn_rrf": _sql_knn_rrf(),
        "q_doc_bm25": _sql_doc_bm25(),
        "q_doc_snippets": _sql_doc_snippets(),
        "q_doc_mlt": _sql_doc_mlt(),
        "q_events_kmv": _sql_events_kmv(),
        "q_media_gif": """
            SELECT doc_id AS media_id,
                   (6 + doc_id % 23)::BIGINT AS width,
                   (5 + (doc_id // 3) % 13)::BIGINT AS height,
                   list_aggregate(
                       list_transform(
                           generate_series(
                               0,
                               (6 + doc_id % 23)
                               * (5 + (doc_id // 3) % 13) - 1),
                           i -> (doc_id * 7 + i * 13) % 256),
                       'sum')::BIGINT AS px_sum
            FROM documents
        """,
        "q_media_gif_frames": """
            SELECT media_id, frame_idx::BIGINT AS frame_idx,
                   width::BIGINT AS width, height::BIGINT AS height,
                   list_aggregate(
                       list_transform(
                           generate_series(0, width * height - 1),
                           i -> (media_id * 7 + frame_idx * 29
                                 + i * 13) % 256),
                       'sum')::BIGINT AS px_sum
            FROM (SELECT doc_id AS media_id,
                         unnest(generate_series(0, 1 + doc_id % 4))
                             AS frame_idx,
                         (6 + doc_id % 17) AS width,
                         (4 + doc_id % 9) AS height
                  FROM documents) __f
        """,
        "q_customer_deciles": """
            WITH __pc AS (
              SELECT o_custkey,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                         AS rev_s
              FROM orders GROUP BY o_custkey
            ), __t AS (
              SELECT o_custkey, rev_s,
                     NTILE(10) OVER (ORDER BY rev_s DESC, o_custkey)
                         AS decile
              FROM __pc
            )
            SELECT decile::BIGINT AS decile,
                   count(*)::BIGINT AS n_customers,
                   SUM(rev_s) / 100.0 AS revenue
            FROM __t GROUP BY decile
        """,
        "q_doc_facets": """
            SELECT lang, count(*)::BIGINT AS n_matches
            FROM documents
            WHERE len(list_intersect(
                string_split(text, ' '),
                ['filter', 'hash', 'join'])) > 0
            GROUP BY lang
        """,
        # ANN mirrors: the LSH signature and the IVF assignment are
        # exact integer arithmetic on both engines (fixed-point
        # planes / int8 quantization), so both are full value-hash
        # oracles. dim=64 is the testdata embedding width at every
        # tier (TESTDATA.md); the plane literals are generated from
        # the same cached matrix the engine uses.
        "q_knn_lsh": _sql_knn_lsh(),
        "q_knn_ivf": _sql_knn_ivf(),
        # kg_* (computed over the synthesized pages corpus, not the
        # driver's tables) remain rows-only.
    }


def _sql_knn_lsh() -> str:
    from k_gap_ray.functions.similarity import sql_knn_lsh

    return sql_knn_lsh(dim=64, query_vec_id=0, k=10, radius=1)


def _sql_knn_ivf() -> str:
    from k_gap_ray.functions.similarity import sql_knn_ivf

    return sql_knn_ivf(n_centroids=8, n_probe=4, query_vec_id=0, k=10)


def _sql_bpe_train() -> str:
    from k_gap_ray.functions.bpe import sql_bpe_train

    return sql_bpe_train(n_merges=8)


def _sql_bpe_encode() -> str:
    from k_gap_ray.functions.bpe import sql_bpe_encode

    return sql_bpe_encode(n_merges=8)


def _sql_epoch_shuffle() -> str:
    from k_gap_ray.functions.shuffle import sql_epoch_shuffle

    return sql_epoch_shuffle(seed=3, n_shards=8)


def _sql_docs_kg() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_kg

    return sql_docs_kg()


def _sql_docs_entities() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_entities

    return sql_docs_entities()


def _sql_docs_mention_counts() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_mention_counts

    return sql_docs_mention_counts()


def _sql_shacl_docs() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_shacl

    return sql_docs_shacl(DOCS_SHACL_TTL)


def _sql_sparql_docs() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_sparql

    return sql_docs_sparql(DOCS_SPARQL)


def _sql_sparql_docs_q(sparql: str) -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_sparql

    return sql_docs_sparql(sparql)


def _sql_sparql_docs_update() -> str:
    from k_gap_ray.pipelines.docs_kg import _sql_ctes, _sql_quads_cte
    from k_gap_ray.sparql import sparql_to_sql
    from k_gap_ray.sparql_update import sparql_update_cte_sql

    frag, final = sparql_update_cte_sql(DOCS_SPARQL_UPDATE,
                                        quads_rel="quads")
    return (_sql_ctes("documents") + _sql_quads_cte() + ",\n" + frag
            + "\n" + sparql_to_sql(DOCS_SPARQL_AFTER_UPDATE,
                                   quads_rel=final))


def _sql_sparql_docs_clear() -> str:
    from k_gap_ray.pipelines.docs_kg import _sql_ctes, _sql_quads_cte
    from k_gap_ray.sparql import sparql_to_sql
    from k_gap_ray.sparql_update import sparql_update_cte_sql

    frag, final = sparql_update_cte_sql(DOCS_SPARQL_CLEAR,
                                        quads_rel="quads")
    return (_sql_ctes("documents") + _sql_quads_cte() + ",\n" + frag
            + "\n" + sparql_to_sql(DOCS_SPARQL_AFTER_CLEAR,
                                   quads_rel=final))


def _sql_sparql_direct_q(sparql: str) -> str:
    """Oracle for SPARQL over the documents-DIRECT quads
    (_docs_direct_quads): the quads CTE mirrors the map_batches
    construction exactly, then the independent SQL backend compiles
    the same query over it."""
    from k_gap_ray.sparql import sparql_to_sql

    return _DIRECT_QUADS_CTE + sparql_to_sql(sparql, quads_rel="quads")


_DIRECT_QUADS_CTE = """WITH quads AS (
  SELECT 'urn:kgap:doc:' || CAST(doc_id AS VARCHAR) AS subj,
         'urn:kgap:pred:abstract' AS pred, text AS obj,
         lang AS obj_lang
  FROM documents
  UNION ALL
  SELECT 'urn:kgap:doc:' || CAST(doc_id AS VARCHAR),
         'urn:kgap:pred:fetched',
         strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                  '%Y-%m-%dT%H:%M:%S'), ''
  FROM documents
  UNION ALL
  SELECT 'urn:kgap:doc:' || CAST(doc_id AS VARCHAR),
         'urn:kgap:pred:nchars', CAST(n_chars AS VARCHAR), ''
  FROM documents
)
"""


def _sql_sparql_docs_fts() -> str:
    """Oracle for the FTS magic predicate over the documents-direct
    quads: the SAME pure rewrite as the engine (sparql_fts.
    rewrite_fts_query), the virtual match rows reconstructed as
    integer-TF-IDF CTEs, then the ordinary SQL compilation of the
    rewritten query over the unioned relation."""
    from k_gap_ray.sparql import parse_sparql, sparql_to_sql
    from k_gap_ray.sparql_fts import rewrite_fts_query, sql_fts_ctes

    q2, specs = rewrite_fts_query(parse_sparql(DOCS_SPARQL_FTS))
    frag, final = sql_fts_ctes(
        specs, quads_rel="quads",
        columns=["subj", "pred", "obj", "obj_lang"])
    return (_DIRECT_QUADS_CTE.replace("WITH quads AS (",
                                      "WITH quads AS MATERIALIZED (")
            + ",\n" + frag + "\n" + sparql_to_sql(q2, quads_rel=final))


def _sql_docs_triangles() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_triangles

    return sql_docs_triangles(_TRI_PREDS)


def _sssp_dist(sf_dir: str):
    """Weighted shortest paths (semi-naive Bellman-Ford) over the
    docs funding graph: weights are the pinned deterministic
    1 + (|src| + |dst|) % 9 so a cheaper-but-longer route can beat
    the hop-minimal one (the case BFS cannot express); per round one
    frontier⋈edges join + one groupby-Min + one improved-node left
    join. Oracle: hop-bounded recursive CTE + GROUP BY min."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from k_gap_ray.functions.graph import sssp_int

    quads = _docs_quads(sf_dir)

    def edge_scan(t):
        m = pc.equal(t.column("pred"), "urn:kgap:pred:funds")
        s = t.column("subj").filter(m)
        o = t.column("obj").filter(m)
        tot = pc.cast(pc.add(pc.utf8_length(s), pc.utf8_length(o)),
                      pa.int64())
        mod9 = pc.subtract(tot, pc.multiply(
            pc.divide(tot, pa.scalar(9, pa.int64())),
            pa.scalar(9, pa.int64())))
        return pa.table({"src": s, "dst": o,
                         "w": pc.add(mod9, pa.scalar(1, pa.int64()))})

    edges = quads.map_batches(edge_scan, batch_format="pyarrow")
    seeds = quads.map_batches(
        lambda t: pa.table({"node": t.column("subj").filter(
            pc.equal(t.column("pred"), "urn:kgap:pred:manages"))}),
        batch_format="pyarrow")
    return sssp_int(edges, seeds, num_partitions=4).sort("node")


def _sql_docs_bfs() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_bfs

    return sql_docs_bfs("urn:kgap:pred:funds", "urn:kgap:pred:manages")


def _sql_docs_sssp() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_sssp

    return sql_docs_sssp("urn:kgap:pred:funds", "urn:kgap:pred:manages")


def _sql_doc_incr_neardup() -> str:
    from k_gap_ray.state.fingerprints import sql_incremental_near_dup

    return sql_incremental_near_dup("doc_id % 3 <> 0", "doc_id % 3 = 0")


def _sql_doc_incr_dedup() -> str:
    from k_gap_ray.state.fingerprints import sql_incremental_dedup

    return sql_incremental_dedup("doc_id % 3 <> 0", "doc_id % 3 = 0",
                                 prefix_tokens=8)


def _sql_doc_sim_pairs() -> str:
    from k_gap_ray.functions.search import sql_tfidf_sim_pairs

    return sql_tfidf_sim_pairs(topk=20, df_cap=100, n=4)


def _sql_events_kmv() -> str:
    from k_gap_ray.functions.sketch import sql_kmv_sets

    return sql_kmv_sets("user_id", "event_type = 'click'",
                        "event_type = 'purchase'", k=64)


def _sql_doc_mlt() -> str:
    from k_gap_ray.functions.search import sql_more_like_this

    return sql_more_like_this(source_doc_id=7, topk=10)


def _sql_doc_snippets() -> str:
    from k_gap_ray.functions.search import sql_best_snippets

    return sql_best_snippets(SEARCH_TERMS, window=8)


def _sql_doc_bm25() -> str:
    from k_gap_ray.functions.search import sql_bm25_search

    return sql_bm25_search(SEARCH_TERMS, k=10)


def _sql_knn_rrf() -> str:
    from k_gap_ray.functions.similarity import sql_rrf_fuse

    def arm(qid: int) -> str:
        return f"""
        SELECT vec_id,
               row_number() OVER (ORDER BY qscore DESC, vec_id) AS rank
        FROM (
          SELECT a.vec_id,
                 CAST(list_inner_product(a.qv, b.qv) AS BIGINT)
                     AS qscore
          FROM (SELECT vec_id,
                       CASE WHEN ma = 0
                            THEN list_transform(embedding, x -> 0.0)
                            ELSE list_transform(
                                embedding,
                                x -> floor(CAST(x AS DOUBLE)
                                           * CAST(127.0 AS DOUBLE)
                                           / CAST(ma AS DOUBLE))) END
                           AS qv
                FROM (SELECT vec_id, embedding,
                             list_aggregate(
                                 list_transform(embedding,
                                                y -> abs(y)),
                                 'max') AS ma
                      FROM embeddings)) a,
               (SELECT vec_id,
                       CASE WHEN ma = 0
                            THEN list_transform(embedding, x -> 0.0)
                            ELSE list_transform(
                                embedding,
                                x -> floor(CAST(x AS DOUBLE)
                                           * CAST(127.0 AS DOUBLE)
                                           / CAST(ma AS DOUBLE))) END
                           AS qv
                FROM (SELECT vec_id, embedding,
                             list_aggregate(
                                 list_transform(embedding,
                                                y -> abs(y)),
                                 'max') AS ma
                      FROM embeddings)) b
          WHERE b.vec_id = {qid} AND a.vec_id NOT IN (0, 1)
          ORDER BY qscore DESC, a.vec_id LIMIT 20)
        """

    return sql_rrf_fuse([arm(0), arm(1)], topk=10)


def _sql_knn_mmr() -> str:
    from k_gap_ray.functions.similarity import sql_mmr_select

    return sql_mmr_select(k_candidates=20, k_select=5, query_vec_id=0)


def _sql_profile_orders() -> str:
    from k_gap_ray.functions.profile import sql_profile_table

    return sql_profile_table("orders", {
        "o_orderkey": "int", "o_custkey": "int",
        "o_orderstatus": "str", "o_totalprice": "float",
        "o_orderdate": "ts", "o_orderpriority": "str"})


def _sql_doc_weighted_sample() -> str:
    from k_gap_ray.ops.transform import sql_weighted_hash_sample

    w = ("least(1000, 10 * (length(text) - "
         "length(replace(text, ' ', '')) "
         "+ CASE WHEN length(text) > 0 THEN 1 ELSE 0 END))")
    keep = sql_weighted_hash_sample(w, id_col="doc_id", seed=5)
    return f"""
        SELECT doc_id, {w}::BIGINT AS w
        FROM documents WHERE {keep}
    """


def _sql_doc_kwic() -> str:
    from k_gap_ray.functions.search import sql_kwic

    return sql_kwic("spark", window=3)


def _sql_docs_lpa() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_lpa

    return sql_docs_lpa(_LP_PREDS, rounds=4)


def _sql_docs_ktruss() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_ktruss

    return sql_docs_ktruss(_TRI_PREDS, k=4, rounds=3)


def _sql_degree_hist() -> str:
    from k_gap_ray.functions.graph import sql_degree_histogram

    return sql_degree_histogram(
        "SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst "
        "FROM lineitem")


def _sql_docs_negatives() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_negatives

    return sql_docs_negatives(seed=11, n_buckets=16)


def _sql_docs_walks() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_walks

    return sql_docs_walks(_TRI_PREDS, "urn:kgap:pred:manages",
                          steps=5, seed=4)


def _sql_docs_kcore() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_kcore

    return sql_docs_kcore(_TRI_PREDS, k=2, rounds=6)


def _sql_docs_clustering() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_clustering

    return sql_docs_clustering(_TRI_PREDS)


def _sql_docs_link_pred() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_link_pred

    return sql_docs_link_pred(_LP_PREDS, topk=20)


def _sql_docs_ask() -> str:
    from k_gap_ray.pipelines.docs_kg import _sql_ctes, _sql_quads_cte
    from k_gap_ray.sparql import sparql_ask_to_sql

    return (_sql_ctes("documents") + _sql_quads_cte() + "\n"
            + sparql_ask_to_sql(DOCS_SPARQL_ASK, quads_rel="quads"))


def _sql_sparql_docs_construct() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_construct

    return sql_docs_construct(DOCS_SPARQL_CONSTRUCT)


def _sql_sparql_docs_describe() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_describe

    return sql_docs_describe(DOCS_SPARQL_DESCRIBE)


def _sql_sparql_docs_agg() -> str:
    from k_gap_ray.pipelines.docs_kg import sql_docs_sparql

    return sql_docs_sparql(DOCS_SPARQL_AGG)


def _text_analysis_oracles() -> dict[str, str]:
    from k_gap_ray.functions.basket import sql_association_rules
    from k_gap_ray.functions.graph import sql_hits, sql_pagerank
    from k_gap_ray.functions.redact import sql_redact
    from k_gap_ray.functions.search import sql_tfidf_search
    from k_gap_ray.functions.textstats import (
        BPE_PATTERN,
        H1_BASE,
        H1_MOD,
        H2_BASE,
        H2_MOD,
        PUNCT_STRIP_PATTERN,
        sql_fingerprint_expr,
        sql_majority_expr,
        sql_stopword_count,
        sql_token_hash_list,
    )

    langid = f"""
        WITH s AS (
            SELECT doc_id,
                   {sql_stopword_count('text', 'de')} AS s_de,
                   {sql_stopword_count('text', 'en')} AS s_en,
                   {sql_stopword_count('text', 'es')} AS s_es,
                   {sql_stopword_count('text', 'fr')} AS s_fr
            FROM documents)
        SELECT doc_id,
               CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
                         AND s_de > 0 THEN 'de'
                    WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                    WHEN s_fr > 0 THEN 'fr'
                    ELSE 'und' END AS pred_lang
        FROM s
    """
    quality = f"""
        WITH b AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(text) - length(replace(text, ' ', ''))
                   + CASE WHEN length(text) > 0 THEN 1 ELSE 0 END AS n_tokens,
                   length(text) - length(regexp_replace(
                       text, '{PUNCT_STRIP_PATTERN}', '', 'g')) AS n_punct,
                   {sql_stopword_count('text', 'en')} AS n_stop,
                   length(replace(text, ' ', '')) AS n_nonspace
            FROM documents)
        SELECT doc_id, n_chars, n_tokens,
               n_punct / greatest(n_chars, 1) AS punct_ratio,
               n_stop / greatest(n_tokens, 1) AS stopword_ratio,
               (least(n_tokens, 200) / 200.0) * 0.4
               + (1.0 - least(n_punct / greatest(n_chars, 1), 1.0)) * 0.2
               + least(n_stop / greatest(n_tokens, 1), 0.5) * 2.0 * 0.2
               + (1.0 - least(abs(n_nonspace / greatest(n_tokens, 1) - 5.0),
                              5.0) / 5.0) * 0.2 AS quality
        FROM b
    """
    bpe = f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens
        FROM documents
    """
    h1s = sql_token_hash_list("text", H1_BASE, H1_MOD)
    h2s = sql_token_hash_list("text", H2_BASE, H2_MOD)
    fingerprint = f"""
        WITH th AS (SELECT doc_id, {h1s} AS h1s FROM documents)
        SELECT doc_id, {sql_fingerprint_expr('h1s')} AS fingerprint FROM th
    """
    simhash_cte = f"""
        WITH th AS (SELECT doc_id, {h1s} AS h1s, {h2s} AS h2s
                    FROM documents),
        sim AS (SELECT doc_id,
                       {sql_majority_expr('h1s')} AS simhash_lo,
                       {sql_majority_expr('h2s')} AS simhash_hi
                FROM th)
    """
    simhash = simhash_cte + "SELECT doc_id, simhash_lo, simhash_hi FROM sim"
    simhash_pairs = simhash_cte + """
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               bit_count(xor(a.simhash_lo, b.simhash_lo))
               + bit_count(xor(a.simhash_hi, b.simhash_hi)) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash_lo, b.simhash_lo))
              + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 8
    """
    # word-3-gram shingle sets; <3 tokens -> the single whole-text
    # shingle (mirrors dedup._word_shingles); threshold 0.5 compared in
    # exact integers (2*common >= union)
    minhash_pairs = """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(tk) >= 3 THEN
                          list_distinct(list_transform(
                              range(1, len(tk) - 1),
                              i -> array_to_string(tk[i:i+2], ' ')))
                      ELSE [array_to_string(tk, ' ')] END AS s
               FROM toks)
        SELECT doc_id_a, doc_id_b, n_common, n_union FROM (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   len(list_intersect(a.s, b.s)) AS n_common,
                   len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
                       AS n_union
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        WHERE 2 * n_common >= n_union
    """
    # flagship composition: lang filter -> token-window filter ->
    # exact dedup -> 4-gram near-dup dedup, one chained oracle
    clean_corpus = f"""
        WITH RECURSIVE s AS (
            SELECT doc_id,
                   {sql_stopword_count('text', 'de')} AS s_de,
                   {sql_stopword_count('text', 'en')} AS s_en,
                   {sql_stopword_count('text', 'es')} AS s_es,
                   {sql_stopword_count('text', 'fr')} AS s_fr
            FROM documents),
        lang AS (SELECT doc_id,
               CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
                         AND s_de > 0 THEN 'de'
                    WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                    WHEN s_fr > 0 THEN 'fr'
                    ELSE 'und' END AS pred_lang
            FROM s),
        tok AS (SELECT doc_id, text,
                       length(text) - length(replace(text, ' ', ''))
                       + CASE WHEN length(text) > 0 THEN 1 ELSE 0 END
                           AS n_tokens
                FROM documents),
        kept AS (SELECT t.doc_id, t.text, t.n_tokens
                 FROM tok t JOIN lang l ON l.doc_id = t.doc_id
                 WHERE l.pred_lang = 'en'
                   AND t.n_tokens BETWEEN 20 AND 400),
        ex AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
        surv AS (SELECT k.doc_id, k.text, k.n_tokens
                 FROM kept k JOIN ex ON ex.doc_id = k.doc_id),
        t2 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM surv),
        sh AS (SELECT doc_id,
                      CASE WHEN len(tk) >= 4 THEN
                          list_distinct(list_transform(
                              range(1, len(tk) - 2),
                              i -> array_to_string(tk[i:i+3], ' ')))
                      ELSE [array_to_string(tk, ' ')] END AS ss
               FROM t2),
        p AS (SELECT a.doc_id AS pa, b.doc_id AS pb
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE 4 * len(list_intersect(a.ss, b.ss))
                    >= 3 * (len(a.ss) + len(b.ss)
                            - len(list_intersect(a.ss, b.ss)))),
        e AS (SELECT pa AS a, pb AS b FROM p
              UNION ALL SELECT pb, pa FROM p),
        reach(node, r) AS (
            SELECT a, b FROM e
            UNION
            SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b)
        SELECT sv.doc_id, sv.n_tokens
        FROM surv sv
        LEFT JOIN (SELECT node, min(r) AS mn FROM reach GROUP BY node) m
            ON m.node = sv.doc_id
        WHERE least(sv.doc_id, coalesce(m.mn, sv.doc_id)) = sv.doc_id
    """
    # word-4-GRAM shingles (the exact prefix-filter join's measured
    # scale-sane config); same integer-threshold comparison (0.75 =
    # 3/4 exactly), brute-force all pairs
    ngram4_sh = """
        WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS tk
                      FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(tk) >= 4 THEN
                          list_distinct(list_transform(
                              range(1, len(tk) - 2),
                              i -> array_to_string(tk[i:i+3], ' ')))
                      ELSE [array_to_string(tk, ' ')] END AS s
               FROM toks),
        p AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   len(list_intersect(a.s, b.s)) AS n_common,
                   len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
                       AS n_union
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    """
    ngram_jaccard = ngram4_sh + """
        SELECT doc_id_a, doc_id_b, n_common, n_union FROM p
        WHERE 4 * n_common >= 3 * n_union
    """
    # transitive closure over the verified pair edges -> per-doc min
    # reachable id = duplicate-cluster label (singletons label
    # themselves)
    dup_clusters = ngram4_sh + """,
        kept AS (SELECT doc_id_a AS a, doc_id_b AS b FROM p
                 WHERE 4 * n_common >= 3 * n_union),
        e AS (SELECT a, b FROM kept UNION ALL SELECT b, a FROM kept),
        reach(node, r) AS (
            SELECT a, b FROM e
            UNION
            SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b)
        SELECT d.doc_id,
               least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
        FROM documents d
        LEFT JOIN (SELECT node, min(r) AS mn FROM reach GROUP BY node) m
            ON m.node = d.doc_id
    """
    hash_sample = """
        SELECT doc_id, lang FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 % 100 < 30
    """
    deref = """
        WITH RECURSIVE edges AS (
            SELECT 'customer:' || c_custkey AS src,
                   'nation:' || c_nationkey AS dst FROM customer
            UNION ALL
            SELECT 'nation:' || n_nationkey,
                   'region:' || n_regionkey FROM nation
        ), reach(node) AS (
            SELECT 'customer:' || c_custkey FROM customer
            WHERE c_custkey <= 5
            UNION
            SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node FROM reach
    """
    # list_cosine_similarity on the raw FLOAT lists does float32
    # arithmetic; the engine computes float64 cosines, so a pair at the
    # threshold boundary could flip between engines. CAST to DOUBLE
    # first (same convention as the quantized-kNN oracle).
    emb_cos_dbl = ("list_cosine_similarity("
                   "list_transform({a}, x -> CAST(x AS DOUBLE)), "
                   "list_transform({b}, x -> CAST(x AS DOUBLE)))")
    emb_near_dup = f"""
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {emb_cos_dbl.format(a='a.embedding', b='b.embedding')} >= 0.9
    """
    emb_sim_join = f"""
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {emb_cos_dbl.format(a='a.embedding', b='b.embedding')} >= 0.4
    """
    # ASCII payloads: byte == codepoint, so the byte statistics the
    # decode actor computes from the binary payload equal these
    # codepoint aggregates over the source text
    media = """
        WITH b AS (
            SELECT doc_id AS media_id,
                   'media/' || (doc_id % 3) AS mime,
                   length(text) AS n_bytes,
                   coalesce(list_aggregate(list_transform(
                       list_filter(string_split(text, ''), c -> c <> ''),
                       c -> unicode(c)::BIGINT), 'sum'), 0)::BIGINT
                       AS byte_sum
            FROM documents)
        SELECT media_id, mime, n_bytes, byte_sum,
               16 + byte_sum % 240 AS width,
               16 + (byte_sum // 240) % 240 AS height
        FROM b
    """
    turtle = """
        SELECT 'urn:kgap:ex:region-' || n_regionkey AS region_iri,
               count(*) AS n_nations
        FROM nation GROUP BY 1
    """
    trig_rt = """
        WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents)
        SELECT 'urn:kgap:doc:' || doc_id AS subj,
               'urn:kgap:pred:lang' AS pred, lang AS obj,
               TRUE AS obj_is_literal, '' AS obj_datatype,
               lang AS obj_lang,
               'urn:kgap:graph:' || source AS graph FROM d
        UNION ALL
        SELECT 'urn:kgap:doc:' || doc_id, 'urn:kgap:pred:nchars',
               CAST(n_chars AS VARCHAR), TRUE,
               'http://www.w3.org/2001/XMLSchema#integer', '',
               'urn:kgap:graph:' || source FROM d
        UNION ALL
        SELECT 'urn:kgap:doc:' || doc_id, 'urn:kgap:pred:from',
               'urn:kgap:src:' || source, FALSE, '', '',
               'urn:kgap:graph:' || source FROM d
    """
    csv_rt = """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """
    return {
        "q_doc_clean_corpus": clean_corpus,
        "q_rdf_turtle": turtle,
        "q_rdf_trig_roundtrip": trig_rt,
        "q_workflow_csv_roundtrip": csv_rt,
        "q_sparql_docs_store": _sql_sparql_docs_q(DOCS_SPARQL_STORE),
        "q_rdf_jsonld_nested": _SQL_JSONLD_NESTED,
        "q_media_features": media,
        # geometry functions mirror functions/multimodal.docs_as_png;
        # the engine side derives them by actually decoding the PNGs
        "q_media_png": """
            SELECT doc_id AS media_id,
                   4 + doc_id % 29 AS width,
                   4 + (doc_id // 7) % 17 AS height
            FROM documents
        """,
        "q_media_jpeg": """
            SELECT doc_id AS media_id,
                   8 + doc_id % 25 AS width,
                   8 + (doc_id // 5) % 21 AS height
            FROM documents
        """,
        "q_media_mjpeg_frames": """
            WITH f AS (SELECT doc_id, 3 + doc_id % 4 AS nt
                       FROM documents),
            p AS (SELECT doc_id,
                         unnest([0, nt // 2]) AS frame_idx
                  FROM f)
            SELECT doc_id AS media_id,
                   CAST(frame_idx AS BIGINT) AS frame_idx,
                   8 + (doc_id + frame_idx) % 13 AS width,
                   6 + (doc_id * 2 + frame_idx) % 11 AS height
            FROM p
        """,
        # frame count / picks / geometry mirror multimodal.docs_as_avi
        # (2+id%3 frames; nt//2 is never 0 so the two picks are
        # always distinct)
        "q_media_avi_frames": """
            WITH f AS (SELECT doc_id, 2 + doc_id % 3 AS nt
                       FROM documents),
            p AS (SELECT doc_id,
                         unnest([0, nt // 2]) AS frame_idx
                  FROM f)
            SELECT doc_id AS media_id,
                   CAST(frame_idx AS BIGINT) AS frame_idx,
                   9 + (doc_id * 3 + frame_idx) % 12 AS width,
                   7 + (doc_id + 2 * frame_idx) % 9 AS height
            FROM p
        """,
        # geometry / block count / payload bytes / last timestamp
        # mirror multimodal.docs_as_webm (3+id%4 blocks, block k of
        # length 30+(id+k)%50, fps 10+id%6, ms timestamps k*1000//fps)
        "q_media_webm": """
            WITH f AS (SELECT doc_id, 3 + doc_id % 4 AS nt,
                              10 + doc_id % 6 AS fps
                       FROM documents),
            b AS (SELECT doc_id, nt, fps, unnest(range(nt)) AS k
                  FROM f)
            SELECT doc_id AS media_id,
                   64 + (doc_id * 7) % 192 AS width,
                   48 + (doc_id * 5) % 144 AS height,
                   CAST(nt AS BIGINT) AS n_frames,
                   CAST(SUM(30 + (doc_id + k) % 50) AS BIGINT)
                       AS total_bytes,
                   CAST((nt - 1) * 1000 // fps AS BIGINT) AS last_ts_ms
            FROM b GROUP BY doc_id, nt, fps
        """,
        # frame count / picks / geometry mirror multimodal.docs_as_mp4
        # (2+(id+1)%3 jpeg samples; nt//2 is never 0 so the two picks
        # are always distinct)
        "q_media_mp4_frames": """
            WITH f AS (SELECT doc_id, 2 + (doc_id + 1) % 3 AS nt
                       FROM documents),
            p AS (SELECT doc_id,
                         unnest([0, nt // 2]) AS frame_idx
                  FROM f)
            SELECT doc_id AS media_id,
                   CAST(frame_idx AS BIGINT) AS frame_idx,
                   8 + (doc_id * 5 + frame_idx) % 13 AS width,
                   6 + (doc_id * 3 + frame_idx) % 7 AS height
            FROM p
        """,
        # lines mirror __ray_entry__._doc_line_dedup's multi-line
        # view (8-word wrap + injected header/footer); the engine side
        # computes doc frequencies and strips via functions/lines.py
        "q_doc_line_dedup": """
            WITH w AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS word,
                       unnest(generate_series(
                           1, len(string_split(text, ' ')))) AS wi
                FROM documents
            ), lines AS (
                SELECT doc_id, (wi - 1) // 8 AS line_no,
                       string_agg(word, ' ' ORDER BY wi) AS line
                FROM w GROUP BY 1, 2
                UNION ALL
                SELECT doc_id, -1, 'subscribe to our newsletter'
                FROM documents WHERE doc_id % 3 = 0
                UNION ALL
                SELECT doc_id, 1000000, 'copyright example corp'
                FROM documents WHERE doc_id % 4 = 0
            ), df AS (
                SELECT line, count(DISTINCT doc_id) AS nd
                FROM lines GROUP BY 1
            )
            SELECT l.doc_id,
                   coalesce(string_agg(
                       CASE WHEN d.nd < 2 THEN l.line END,
                       chr(10) ORDER BY l.line_no), '') AS text_clean,
                   CAST(count(*) FILTER (WHERE d.nd < 2)
                        AS BIGINT) AS n_kept,
                   CAST(count(*) FILTER (WHERE d.nd >= 2)
                        AS BIGINT) AS n_dropped
            FROM lines l JOIN df d USING (line)
            GROUP BY 1
        """,
        # audio parameters and PCM samples mirror
        # functions/multimodal.docs_as_wav; the engine side derives
        # them by actually decoding the RIFF bytes (functions/wav.py)
        "q_media_wav": """
            SELECT d.doc_id AS media_id,
                   1 + d.doc_id % 2 AS channels,
                   64 + d.doc_id % 193 AS n_frames,
                   CAST(sum(((d.doc_id * 31 + g.i * 7 + c.ch * 11)
                             % 4001) - 2000) AS BIGINT) AS sample_sum
            FROM documents d,
                 generate_series(0, 256) AS g(i),
                 generate_series(0, 1) AS c(ch)
            WHERE g.i < 64 + d.doc_id % 193
              AND c.ch < 1 + d.doc_id % 2
            GROUP BY 1, 2, 3
        """,
        # URL components mirror __ray_entry__._docs_urls generation;
        # the engine side derives them by actually PARSING the
        # assembled URL strings (functions/urlstats.py)
        "q_url_features": """
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN 'http'
                        ELSE 'https' END AS scheme,
                   (CASE WHEN doc_id % 9 = 0 THEN 'cdn.' ELSE '' END)
                     || source || '-' || (doc_id % 5)
                     || (CASE WHEN doc_id % 2 = 1 THEN '.org'
                              ELSE '.com' END) AS domain,
                   source || '-' || (doc_id % 5)
                     || (CASE WHEN doc_id % 2 = 1 THEN '.org'
                              ELSE '.com' END) AS reg_domain,
                   CASE WHEN doc_id % 2 = 1 THEN 'org'
                        ELSE 'com' END AS tld,
                   doc_id % 4 AS path_depth,
                   CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1
                        ELSE 2 END AS n_params,
                   doc_id % 7 <> 0 AS is_https,
                   doc_id % 5 = 0 AS has_fragment
            FROM documents
        """,
        "q_domain_stats": """
            SELECT source || '-' || (doc_id % 5)
                     || (CASE WHEN doc_id % 2 = 1 THEN '.org'
                              ELSE '.com' END) AS reg_domain,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY 1
        """,
        "q_url_normalize": """
            SELECT doc_id,
                   (CASE WHEN doc_id % 7 = 0 THEN 'http'
                         ELSE 'https' END) || '://'
                   || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                   || (CASE WHEN doc_id % 9 = 0 THEN 'cdn.' ELSE '' END)
                   || source || '-' || (doc_id % 5)
                   || (CASE WHEN doc_id % 2 = 1 THEN '.org'
                            ELSE '.com' END)
                   || (CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/p1'
                        WHEN 2 THEN '/p1/p2' ELSE '/p1/p2/p3' END)
                   || (CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN '?a=1'
                        ELSE '?a=1&b=2' END) AS url_norm
            FROM documents
        """,
        # the SAME 31-bit mix expression under ROW_NUMBER/NTILE
        # (functions/shuffle.sql_epoch_shuffle; seed/shards match
        # _doc_epoch_shuffle)
        "q_doc_epoch_shuffle": _sql_epoch_shuffle(),
        # the same 8 merges as chained MATERIALIZED CTE levels with
        # fixpoint-replace recursions (functions/bpe.sql_bpe_train)
        "q_doc_bpe_train": _sql_bpe_train(),
        "q_doc_bpe_encode": _sql_bpe_encode(),
        "q_doc_splits": """
            SELECT doc_id,
                   CASE WHEN (doc_id * 2654435761) % 4294967296
                             % 100 < 80 THEN 'train'
                        WHEN (doc_id * 2654435761) % 4294967296
                             % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "q_doc_langid": langid,
        "q_doc_lang_confusion": f"""
            SELECT d.lang, p.pred_lang, count(*)::BIGINT AS n
            FROM documents d JOIN ({langid}) p USING (doc_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q_doc_quality": quality,
        "q_doc_bpe_tokens": bpe,
        "q_doc_fingerprints": fingerprint,
        "q_doc_simhash": simhash,
        "q_doc_simhash_pairs": simhash_pairs,
        "q_doc_minhash_pairs": minhash_pairs,
        "q_doc_ngram_jaccard": ngram_jaccard,
        "q_doc_dup_clusters": dup_clusters,
        "q_doc_neardup_dedup":
            f"SELECT doc_id FROM ({dup_clusters}) "
            f"WHERE doc_id = cluster_id",
        "q_doc_hash_sample": hash_sample,
        "q_doc_mixture": """
            SELECT doc_id, lang FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 % 100 <
                  (CASE WHEN lang = 'en' THEN 60
                        WHEN lang = 'de' THEN 30 ELSE 10 END)
        """,
        "q_doc_vocab": """
            SELECT token, count(DISTINCT doc_id)::BIGINT AS df,
                   count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY token
        """,
        "q_doc_decontam": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
            idx AS (SELECT doc_id, t,
                           unnest(generate_series(1, len(t) - 2)) AS i
                    FROM toks),
            grams AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
                      FROM idx),
            ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
            sc AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
            SELECT sc.doc_id, count(DISTINCT sc.g)::BIGINT AS n_contaminated
            FROM sc JOIN ev USING (g)
            GROUP BY sc.doc_id
        """,
        "q_doc_repetition": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
            wcnt AS (SELECT doc_id, w, count(*) AS cnt
                     FROM (SELECT doc_id, unnest(t) AS w FROM toks)
                     GROUP BY doc_id, w),
            wstats AS (SELECT doc_id, sum(cnt)::BIGINT AS n_tokens,
                              count(*)::BIGINT AS n_distinct_tokens,
                              max(cnt)::BIGINT AS top_token_count
                       FROM wcnt GROUP BY doc_id),
            i2 AS (SELECT doc_id, t,
                          unnest(generate_series(1, len(t) - 1)) AS i
                   FROM toks),
            g2 AS (SELECT doc_id, count(*)::BIGINT AS n_2grams,
                          count(DISTINCT array_to_string(t[i:i+1], ' ')
                                )::BIGINT AS n_distinct_2grams
                   FROM i2 GROUP BY doc_id),
            i3 AS (SELECT doc_id, t,
                          unnest(generate_series(1, len(t) - 2)) AS i
                   FROM toks),
            g3 AS (SELECT doc_id, count(*)::BIGINT AS n_3grams,
                          count(DISTINCT array_to_string(t[i:i+2], ' ')
                                )::BIGINT AS n_distinct_3grams
                   FROM i3 GROUP BY doc_id)
            SELECT w.doc_id, w.n_tokens, w.n_distinct_tokens,
                   w.top_token_count,
                   COALESCE(g2.n_2grams, 0)::BIGINT AS n_2grams,
                   COALESCE(g2.n_distinct_2grams, 0)::BIGINT
                       AS n_distinct_2grams,
                   COALESCE(g3.n_3grams, 0)::BIGINT AS n_3grams,
                   COALESCE(g3.n_distinct_3grams, 0)::BIGINT
                       AS n_distinct_3grams
            FROM wstats w LEFT JOIN g2 USING (doc_id)
                          LEFT JOIN g3 USING (doc_id)
        """,
        "q_doc_packing": """
            WITH tc AS (SELECT doc_id,
                   (CASE WHEN length(text) = 0 THEN 0
                         ELSE length(text) - length(replace(text, ' ', ''))
                              + 1 END)::BIGINT AS n_tokens
                 FROM documents),
            cum AS (SELECT doc_id, n_tokens,
                           SUM(n_tokens) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND
                               CURRENT ROW)::BIGINT AS c
                    FROM tc)
            SELECT doc_id, n_tokens, (c - n_tokens) AS tok_start,
                   c AS tok_end,
                   ((c - n_tokens) // 512) AS seq_first,
                   (greatest(c - n_tokens, c - 1) // 512) AS seq_last
            FROM cum
        """,
        "q_deref_reachable": deref,
        "q_doc_search": sql_tfidf_search(SEARCH_TERMS, k=10),
        "q_doc_redact": sql_redact(REDACT_RULES),
        "q_pagerank": sql_pagerank(
            "SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst "
            "FROM lineitem", iters=3),
        "q_ppr": sql_pagerank(
            "SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst "
            "FROM lineitem", iters=3,
            seeds_sql="SELECT DISTINCT l_orderkey * 2 AS node "
                      "FROM lineitem WHERE l_orderkey % 97 = 0"),
        "q_hits": sql_hits(
            "SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst "
            "FROM lineitem", iters=3),
        "q_part_affinity": sql_association_rules(
            "l_orderkey", "l_partkey", k=20),
        "q_emb_near_dup": emb_near_dup,
        "q_emb_sim_join": emb_sim_join,
        "q_emb_dedup_survivors": f"""
            SELECT a.vec_id, a.label FROM embeddings a
            WHERE NOT EXISTS (
                SELECT 1 FROM embeddings b
                WHERE b.vec_id < a.vec_id
                  AND {emb_cos_dbl.format(a='a.embedding',
                                          b='b.embedding')} >= 0.4)
        """,
        "q_emb_centroids": _sql_emb_centroids(),
        "q_doc_dup_spans": _sql_doc_dup_spans(),
        "q_part_fuzzy_pairs": """
            WITH names AS (SELECT DISTINCT p_name AS name FROM part)
            SELECT a.name AS name_a, b.name AS name_b
            FROM names a JOIN names b ON a.name < b.name
            WHERE abs(len(a.name) - len(b.name)) <= 2
              AND levenshtein(a.name, b.name) <= 2
        """,
    }


def _sql_emb_centroids() -> str:
    from k_gap_ray.functions.similarity import sql_label_centroids_fx

    return sql_label_centroids_fx()


def _sql_doc_dup_spans() -> str:
    from k_gap_ray.functions.textstats import sql_dup_ngram_spans

    return sql_dup_ngram_spans(n=8, min_docs=2)
