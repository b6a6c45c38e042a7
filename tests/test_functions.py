"""Tests: dedup family, similarity search, text analysis, multimodal
plumbing (training-data operator suite)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    docs = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",   # near-dup of 0
            "the quick brown fox jumps over the lazy dog",   # exact dup of 0
            "completely different content about marine biology research",
            "spark join merge sort filter table scan",
            "",                                               # empty
            "one",                                            # single token
            "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        ],
    })
    return rd.from_arrow(docs)


def test_exact_dedup(docs_ds):
    from k_gap_ray.functions.dedup import exact_dedup

    rows = {r["doc_id"]: r["n_copies"] for r in exact_dedup(docs_ds).take_all()}
    assert rows[0] == 3          # docs 0,2,7 identical -> min id 0
    assert 2 not in rows and 7 not in rows
    assert rows[1] == 1


def test_minhash_near_dup(docs_ds):
    from k_gap_ray.functions.dedup import minhash_dedup_pairs

    pairs = {(r["doc_id_a"], r["doc_id_b"])
             for r in minhash_dedup_pairs(docs_ds, threshold=0.5).take_all()}
    # the exact-dup triangle must be found, and the near-dup pair 0-1
    assert (0, 2) in pairs and (0, 7) in pairs and (2, 7) in pairs
    assert (0, 1) in pairs
    assert (0, 4) not in pairs


def test_simhash_pairs(docs_ds):
    from k_gap_ray.functions.dedup import simhash_dup_pairs

    pairs = {(r["doc_id_a"], r["doc_id_b"])
             for r in simhash_dup_pairs(docs_ds, max_hamming=3).take_all()}
    assert (0, 2) in pairs and (0, 7) in pairs
    assert (0, 4) not in pairs


def test_token_counts_and_quality(docs_ds):
    from k_gap_ray.functions.textstats import quality_scores, token_counts

    toks = {r["doc_id"]: r["n_tokens"] for r in token_counts(docs_ds).take_all()}
    assert toks[0] == 9 and toks[5] == 0 and toks[6] == 1

    q = {r["doc_id"]: r for r in quality_scores(docs_ds).take_all()}
    assert q[0]["stopword_ratio"] > q[4]["stopword_ratio"]
    assert q[5]["n_tokens"] == 0


def test_langid(docs_ds, ray_session):
    import ray.data as rd

    from k_gap_ray.functions.textstats import lang_id

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["the cat is in the house and it is lazy",
                 "der Hund ist ein Tier und das ist gut",
                 "el gato es un animal y no es grande"],
    }))
    langs = {r["doc_id"]: r["pred_lang"] for r in lang_id(ds).take_all()}
    assert langs == {0: "en", 1: "de", 2: "es"}


def test_fingerprint_deterministic(docs_ds):
    from k_gap_ray.functions.textstats import fingerprints

    a = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs_ds).take_all()}
    b = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs_ds).take_all()}
    assert a == b
    assert a[0] == a[2] == a[7]      # identical text -> identical fp
    assert a[0] != a[1]


def test_knn_bruteforce_and_lsh(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.similarity import knn_bruteforce, knn_lsh

    rng = np.random.RandomState(3)
    base = rng.randn(50, 16)
    base[7] = base[3] * 0.9 + rng.randn(16) * 0.01   # 7 ~ 3
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in base],
                              pa.list_(pa.float32())),
    }))
    q = base[3]
    exact = knn_bruteforce(emb, q, k=5, exclude_ids={3})
    ids = exact["vec_id"].to_pylist()
    assert ids[0] == 7
    sims = exact["cosine"].to_pylist()
    assert sims == sorted(sims, reverse=True)

    approx = knn_lsh(emb, q, k=5, radius=1, exclude_ids={3})
    assert 7 in approx["vec_id"].to_pylist()  # near-identical vector found


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(5)
    base = rng.randn(30, 16)
    base[9] = base[2] + rng.randn(16) * 1e-3
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in base],
                              pa.list_(pa.float32())),
    }))
    pairs = {(r["vec_id_a"], r["vec_id_b"])
             for r in embedding_near_dup_pairs(emb, threshold=0.99).take_all()}
    assert (2, 9) in pairs


def test_multimodal_decode_stage(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.multimodal import MediaDecoder, decode_stage, synth_media

    media = rd.from_arrow(synth_media(50))
    feats = decode_stage(media, mode="fake").take_all()
    assert len(feats) == 50
    for r in feats[:5]:
        assert r["n_bytes"] > 0 and len(r["sha256"]) == 64
        assert 16 <= r["width"] < 256 and 16 <= r["height"] < 256
        assert len(r["feature"]) == MediaDecoder.FEATURE_DIM

    # real mode raises at the stubbed decode callsite
    dec = MediaDecoder(mode="real")
    with pytest.raises(NotImplementedError):
        dec(synth_media(1))


def test_decode_deterministic(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.multimodal import decode_stage, synth_media

    a = {r["media_id"]: r["sha256"] for r in
         decode_stage(rd.from_arrow(synth_media(20))).take_all()}
    b = {r["media_id"]: r["sha256"] for r in
         decode_stage(rd.from_arrow(synth_media(20))).take_all()}
    assert a == b


def test_mention_counts_skew_partial_agg(ray_session, pages_table):
    """Zipf head-entity skew: the mention-count aggregate pre-combines
    per batch, so the groupby shuffles per-batch partials, and the
    result equals a naive exact count."""
    import collections

    import ray
    import ray.data as rd

    from k_gap_ray.ops.canonicalize import canonicalize, mention_counts
    from k_gap_ray.pipeline import run_pipeline

    res = run_pipeline(rd.from_arrow(pages_table).repartition(4))
    counts = {r["entity_id"]: r["n_mentions"]
              for r in mention_counts(res["mentions"],
                                      ray.put(res["mapping"])).take_all()}
    # naive exact count from the raw mention rows
    naive = collections.Counter(
        res["mapping"].get(r["norm_surface"], "urn:kgap:entity:unknown")
        for r in res["mentions"].take_all())
    assert counts == dict(naive)
    # the head entity dominates (Zipf fixture is actually skewed)
    top = max(counts.values())
    assert top > 3 * sorted(counts.values())[len(counts) // 2]
