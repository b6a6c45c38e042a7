"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Shared shape: signature per item (vectorized map_batches) -> explode to
bucket keys -> groupby(bucket) member lists via hash aggregate (no
per-group Python) -> capped in-bucket candidate pairs -> verify ->
pairs/survivors. Same partitioning story as entity canonicalization
(SURVEY.md 7.4); the LSH machinery is shared with oracle.canon.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from k_gap_ray.oracle import canon

MAX_BUCKET = 256  # candidate cap per bucket; drops are counted in-row


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
    toks = text.split(" ") if text else []
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def minhash_doc_bands(ds, shingle_k: int = 3, id_col: str = "doc_id"):
    """(doc_id, text) -> (band_key, doc_id) rows via word-shingle MinHash."""

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column("text").to_pylist()
        band_out, id_out = [], []
        for i, text in zip(ids, texts):
            sh = _word_shingles(text or "", shingle_k)
            if not sh:
                continue
            h = canon._base_hashes(sh)
            vals = (np.multiply.outer(canon._PERM_A, h, dtype=np.int64)
                    + canon._PERM_B[:, None]) % canon._MERSENNE
            sig = vals.min(axis=1)
            for key in canon.band_keys(sig):
                band_out.append(key)
                id_out.append(i)
        return pa.table({"band_key": band_out, id_col: id_out})

    return ds.map_batches(f, batch_format="pyarrow")


def _pairs_table(blocks: pa.Table, id_col: str) -> pa.Table:
    a_out, b_out = [], []
    for members in blocks.column("members").to_pylist():
        if members is None or len(members) < 2:
            continue
        ms = sorted(set(members))[:MAX_BUCKET]
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a_out.append(ms[i])
                b_out.append(ms[j])
    return pa.table({f"{id_col}_a": a_out, f"{id_col}_b": b_out})


def lsh_candidate_pairs(band_ds, id_col: str = "doc_id"):
    """(band_key, id) -> distinct candidate id pairs (a < b)."""
    from ray.data.aggregate import Unique

    blocks = (band_ds.groupby("band_key").aggregate(Unique(id_col))
              .rename_columns({f"unique({id_col})": "members"}))
    pairs = blocks.map_batches(lambda t: _pairs_table(t, id_col),
                               batch_format="pyarrow")
    return (pairs.groupby([f"{id_col}_a", f"{id_col}_b"]).count()
            .select_columns([f"{id_col}_a", f"{id_col}_b"]))


def verify_jaccard_pairs(pairs_ds, docs_ds, threshold: float = 0.8,
                         shingle_k: int = 3, id_col: str = "doc_id"):
    """Exact n-gram-Jaccard verification of candidate pairs.

    The docs side is broadcast once via ray.put (id -> text); at true
    scale this becomes a two-round join on id — documented trade-off."""
    import ray

    texts = {}
    for batch in docs_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        texts.update(zip(batch.column(id_col).to_pylist(),
                         batch.column("text").to_pylist()))
    ref = ray.put(texts)

    def verify(t: pa.Table) -> pa.Table:
        import ray as _r

        lookup = _r.get(ref)
        a_col = t.column(f"{id_col}_a").to_pylist()
        b_col = t.column(f"{id_col}_b").to_pylist()
        keep_a, keep_b, sims = [], [], []
        for a, b in zip(a_col, b_col):
            sa = _word_shingles(lookup.get(a, "") or "", shingle_k)
            sb = _word_shingles(lookup.get(b, "") or "", shingle_k)
            j = canon.jaccard(sa, sb)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(round(j, 4))
        return pa.table({f"{id_col}_a": pa.array(keep_a, pa.int64()),
                         f"{id_col}_b": pa.array(keep_b, pa.int64()),
                         "jaccard": pa.array(sims, pa.float64())})

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def minhash_dedup_pairs(docs_ds, threshold: float = 0.8, shingle_k: int = 3):
    """Full MinHash+LSH near-dup pipeline -> verified (a, b, jaccard)."""
    bands = minhash_doc_bands(docs_ds, shingle_k)
    pairs = lsh_candidate_pairs(bands)
    return verify_jaccard_pairs(pairs, docs_ds, threshold, shingle_k)


def simhash_dup_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup: band the 64-bit simhash into 4 x 16-bit chunks
    (any pair within Hamming distance 3 shares >=1 exact chunk),
    groupby chunk, verify true Hamming distance."""
    from ray.data.aggregate import Unique

    from k_gap_ray.functions.textstats import simhash64

    sh = simhash64(docs_ds)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hashes = t.column("simhash").to_pylist()
        keys, id_out, h_out = [], [], []
        for i, h in zip(ids, hashes):
            u = np.uint64(np.int64(h).astype(np.uint64))
            for c in range(4):
                chunk = int((u >> np.uint64(16 * c)) & np.uint64(0xFFFF))
                keys.append(f"c{c}:{chunk}")
                id_out.append(i)
                h_out.append(h)
        return pa.table({"band_key": keys, "doc_id": id_out, "simhash": h_out})

    bands = sh.map_batches(explode, batch_format="pyarrow")
    blocks = (bands.groupby("band_key").aggregate(Unique("doc_id"))
              .rename_columns({"unique(doc_id)": "members"}))
    pairs = (blocks.map_batches(lambda t: _pairs_table(t, "doc_id"),
                                batch_format="pyarrow")
             .groupby(["doc_id_a", "doc_id_b"]).count()
             .select_columns(["doc_id_a", "doc_id_b"]))

    # verify hamming distance via a broadcast id->simhash map
    import ray

    id2hash = {r["doc_id"]: r["simhash"] for r in sh.take_all()}
    ref = ray.put(id2hash)

    def verify(t: pa.Table) -> pa.Table:
        import ray as _r

        lookup = _r.get(ref)
        keep_a, keep_b, dists = [], [], []
        for a, b in zip(t.column("doc_id_a").to_pylist(),
                        t.column("doc_id_b").to_pylist()):
            d = bin(np.uint64(np.int64(lookup[a]).astype(np.uint64))
                    ^ np.uint64(np.int64(lookup[b]).astype(np.uint64))).count("1")
            if d <= max_hamming:
                keep_a.append(a)
                keep_b.append(b)
                dists.append(d)
        return pa.table({"doc_id_a": pa.array(keep_a, pa.int64()),
                         "doc_id_b": pa.array(keep_b, pa.int64()),
                         "hamming": pa.array(dists, pa.int64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def embedding_near_dup_pairs(emb_ds, threshold: float = 0.95,
                             n_planes: int = 12):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets.

    Vectors agreeing on all n_planes signs land in one bucket; within a
    bucket, exact cosine (numpy matmul) filters by threshold. Scale
    path: buckets shrink quadratic pair cost to per-bucket cost."""
    from ray.data.aggregate import Unique

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_pylist()
        embs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        if embs.size == 0:
            return pa.table({"band_key": pa.array([], pa.string()),
                             "vec_id": pa.array([], pa.int64())})
        # fresh fixed-seed generator per batch -> same planes everywhere
        planes = np.random.RandomState(777).randn(embs.shape[1], n_planes)
        signs = (embs @ planes) >= 0
        keys = ["".join("1" if b else "0" for b in row) for row in signs]
        return pa.table({"band_key": pa.array(keys, pa.string()),
                         "vec_id": pa.array(ids, pa.int64())})

    bands = emb_ds.map_batches(explode, batch_format="pyarrow")
    blocks = (bands.groupby("band_key").aggregate(Unique("vec_id"))
              .rename_columns({"unique(vec_id)": "members"}))
    pairs = (blocks.map_batches(lambda t: _pairs_table(t, "vec_id"),
                                batch_format="pyarrow")
             .groupby(["vec_id_a", "vec_id_b"]).count()
             .select_columns(["vec_id_a", "vec_id_b"]))

    import ray

    vecs = {}
    for batch in emb_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for i, e in zip(batch.column("vec_id").to_pylist(),
                        batch.column("embedding").to_pylist()):
            vecs[i] = np.asarray(e, dtype=np.float64)
    ref = ray.put(vecs)

    def verify(t: pa.Table) -> pa.Table:
        import ray as _r

        lookup = _r.get(ref)
        keep_a, keep_b, sims = [], [], []
        for a, b in zip(t.column("vec_id_a").to_pylist(),
                        t.column("vec_id_b").to_pylist()):
            va, vb = lookup[a], lookup[b]
            denom = np.linalg.norm(va) * np.linalg.norm(vb)
            c = float(va @ vb / denom) if denom else 0.0
            if c >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                sims.append(round(c, 4))
        return pa.table({"vec_id_a": pa.array(keep_a, pa.int64()),
                         "vec_id_b": pa.array(keep_b, pa.int64()),
                         "cosine": pa.array(sims, pa.float64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def content_hash(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
