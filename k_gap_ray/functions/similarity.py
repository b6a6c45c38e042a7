"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — numpy matmul per Arrow
  batch against a broadcast query matrix (``ray.put`` once), partial
  top-k per batch, tiny global sort at the end. The baseline.
- ``knn_lsh``: random-hyperplane-bucketed approximate variant — the
  scale path: only buckets matching the query signature (within a
  Hamming radius) are scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(t: pa.Table) -> tuple[list[int], np.ndarray]:
    from k_gap_ray.dsutil import list_col_matrix

    ids = t.column("vec_id").to_pylist()
    return ids, list_col_matrix(t.column("embedding"))


def knn_bruteforce(emb_ds, query_vec: np.ndarray, k: int = 10,
                   exclude_ids: set[int] | None = None):
    """Exact top-k by cosine: returns pa.Table (vec_id, cosine) sorted
    desc with vec_id tie-break. Per-batch partial top-k keeps the
    shuffle tiny (k rows per batch, not the corpus)."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)
    excl = frozenset(exclude_ids or ())

    def partial_topk(t: pa.Table) -> pa.Table:
        import ray as _r

        qv = _r.get(q_ref)
        ids, embs = _batch_matrix(t)
        if not ids:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        # rank on the ROUNDED similarity (+ vec_id tie-break) so the
        # selection matches an oracle that orders by the rounded value
        sims = np.round((embs @ qv) / norms, 4)
        # filter exclusions BEFORE truncating to k: the excluded query
        # vector ranks first in its own batch (cosine 1.0), and slicing
        # the order first would silently drop that batch's rank-(k+1)
        # candidate even when it belongs in the global top-k
        order = np.lexsort((ids, -sims))
        keep: list[tuple[int, float]] = []
        for i in order:
            if ids[i] in excl:
                continue
            keep.append((ids[i], float(sims[i])))
            if len(keep) == k:
                break
        return pa.table({"vec_id": pa.array([i for i, _ in keep], pa.int64()),
                         "cosine": pa.array([round(s, 4) for _, s in keep],
                                            pa.float64())})

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow")
    top = partials.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)
    return pa.Table.from_pylist(top.take_all())


def knn_by_id(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Top-k most-similar vectors to the vector with `query_vec_id`."""
    import ray.data as rd

    from k_gap_ray.dsutil import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    qrow = [r for r in ds.map_batches(
        lambda t, qid=query_vec_id: t.filter(
            pa.compute.equal(t.column("vec_id"), pa.scalar(qid))),
        batch_format="pyarrow").take_all()]
    q = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    return knn_bruteforce(ds, q, k=k, exclude_ids={query_vec_id})


N_PLANES = 8
_PLANE_SEED = 4242
_PLANE_SCALE = 1_000_000
_PLANE_CACHE: dict[int, np.ndarray] = {}


def _planes_fx(dim: int) -> np.ndarray:
    """Fixed-point random hyperplanes, cached per dim (regenerating a
    Gaussian matrix per batch was a measured hot spot — the dedup
    module's _PLANE_CACHE pattern). Integer entries so the sign-dot
    signature is EXACT integer arithmetic on both engines: a sign dot
    of int8-quantized vectors (|x| <= 127) against these planes
    (|p| <= ~6e6) over dim <= 4096 stays far below 2^53, so DuckDB's
    double-accumulated list_inner_product reproduces it bit-for-bit."""
    P = _PLANE_CACHE.get(dim)
    if P is None:
        raw = np.random.RandomState(_PLANE_SEED).randn(dim, N_PLANES)
        P = np.round(raw * _PLANE_SCALE).astype(np.int64)
        _PLANE_CACHE[dim] = P
    return P


def _signature_bucket(embs: np.ndarray) -> np.ndarray:
    """int64 packed LSH bucket per row: bit j of the bucket is
    sign(dot(quantize_int8(v), plane_j)) — deterministic, exact, and
    SQL-mirrorable (sql_knn_lsh below builds the same expression)."""
    q8 = quantize_int8(embs)
    bits = (q8 @ _planes_fx(embs.shape[1])) >= 0
    return bits @ (1 << np.arange(N_PLANES, dtype=np.int64))


def build_lsh_buckets(emb_ds):
    """embedding -> (bucket:int64, vec_id, embedding): the ANN index
    as a Dataset, groupable/partitionable by bucket (packed-bit int64
    keys, not per-row joined strings)."""

    def f(t: pa.Table) -> pa.Table:
        ids, embs = _batch_matrix(t)
        if not ids:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": t.column("embedding")})
        buckets = _signature_bucket(embs)
        return pa.table({"bucket": pa.array(buckets, pa.int64()),
                         "vec_id": pa.array(ids, pa.int64()),
                         "embedding": t.column("embedding")})

    return emb_ds.map_batches(f, batch_format="pyarrow")


def _probe_buckets(query_vec: np.ndarray, radius: int) -> list[int]:
    """Bucket ids to scan: the query's signature + all signatures
    within `radius` bit flips (multi-probe)."""
    qb = int(_signature_bucket(np.asarray(query_vec, np.float64)[None, :])[0])
    want = {qb}
    if radius >= 1:
        for i in range(N_PLANES):
            want.add(qb ^ (1 << i))
    if radius >= 2:
        for i in range(N_PLANES):
            for j in range(i + 1, N_PLANES):
                want.add(qb ^ (1 << i) ^ (1 << j))
    return sorted(want)


def write_lsh_index(emb_ds, index_dir: str):
    """Persist the ANN index as bucket-partitioned Parquet.

    One directory per bucket (hive partitioning), so a query touching
    B buckets opens exactly B partitions — the corpus is scanned once
    at BUILD time, never per query."""
    build_lsh_buckets(emb_ds).write_parquet(index_dir,
                                            partition_cols=["bucket"])
    return index_dir


def knn_lsh_indexed(index_dir: str, query_vec: np.ndarray, k: int = 10,
                    radius: int = 1, exclude_ids: set[int] | None = None):
    """Approximate top-k against a PERSISTED index: reads only the
    bucket partitions matching the (multi-probed) query signature —
    no corpus rescan per query."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    q = np.asarray(query_vec, dtype=np.float64)
    files = [f for b in _probe_buckets(q, radius)
             for f in _glob.glob(_os.path.join(index_dir, f"bucket={b}",
                                               "*.parquet"))]
    if not files:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    cand = rd.read_parquet(files, columns=["vec_id", "embedding"])
    return knn_bruteforce(cand, q, k=k, exclude_ids=exclude_ids)


def train_ivf_centroids(emb_ds, n_centroids: int = 16, sample_rows: int = 8192,
                        n_iters: int = 10, seed: int = 99) -> np.ndarray:
    """k-means coarse quantizer trained on a BOUNDED sample.

    The sample (not the corpus) comes to the driver; Lloyd iterations
    run in numpy. Returns L2-normalized (n_centroids, dim) centroids."""
    from k_gap_ray.dsutil import list_col_matrix

    sample = emb_ds.limit(sample_rows).select_columns(["embedding"])
    X = np.vstack([list_col_matrix(b.column("embedding"))
                   for b in sample.iter_batches(batch_format="pyarrow",
                                                batch_size=4096)])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on normalized rows
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def build_ivf_index(emb_ds, index_dir: str, n_centroids: int = 16,
                    **train_kwargs) -> np.ndarray:
    """Assign every vector to its nearest centroid (one matmul per
    batch against the broadcast centroids) and persist as
    centroid-partitioned Parquet. Returns the centroids (persist them
    alongside for reuse)."""
    import ray

    from k_gap_ray.dsutil import list_col_matrix

    C = train_ivf_centroids(emb_ds, n_centroids=n_centroids, **train_kwargs)
    c_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        import ray as _r

        cents = _r.get(c_ref)
        V = list_col_matrix(t.column("embedding"))
        if len(V) == 0:
            return pa.table({"centroid": pa.array([], pa.int32()),
                             "vec_id": t.column("vec_id"),
                             "embedding": t.column("embedding")})
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        a = np.argmax(Vn @ cents.T, axis=1).astype(np.int32)
        return pa.table({"centroid": pa.array(a, pa.int32()),
                         "vec_id": t.column("vec_id"),
                         "embedding": t.column("embedding")})

    emb_ds.map_batches(assign, batch_format="pyarrow",
                       zero_copy_batch=True) \
        .write_parquet(index_dir, partition_cols=["centroid"])
    np.save(f"{index_dir}/centroids.npy", C)
    return C


def knn_ivf(index_dir: str, query_vec: np.ndarray, k: int = 10,
            n_probe: int = 4, exclude_ids: set[int] | None = None,
            centroids: np.ndarray | None = None):
    """IVF query: score the query against the centroids, read ONLY the
    n_probe nearest centroid partitions, exact top-k within them."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    C = centroids if centroids is not None \
        else np.load(f"{index_dir}/centroids.npy")
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ qn))[:n_probe]
    files = [f for c in probe
             for f in _glob.glob(_os.path.join(index_dir, f"centroid={c}",
                                               "*.parquet"))]
    if not files:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    cand = rd.read_parquet(files, columns=["vec_id", "embedding"])
    return knn_bruteforce(cand, q, k=k, exclude_ids=exclude_ids)


def _ivf8_centroids(emb_ds, n_centroids: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic coarse quantizer: the int8-quantized vectors of
    vec_id < n_centroids (seedless, SQL-recomputable — the k-means
    trainer above stays the scale path when verifiability isn't
    needed). Returns (cids sorted asc, C8 rows aligned to cids)."""
    rows = emb_ds.map_batches(
        lambda t, n=n_centroids: t.filter(
            pa.compute.less(t.column("vec_id"), pa.scalar(n))),
        batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    if not rows:
        raise ValueError("ivf_int8: no vectors with vec_id < n_centroids")
    cids = np.array([r["vec_id"] for r in rows], np.int64)
    C8 = quantize_int8(np.array([r["embedding"] for r in rows], np.float64))
    return cids, C8


def build_ivf_index_int8(emb_ds, index_dir: str, n_centroids: int = 8):
    """IVF index with the deterministic int8 quantizer: every vector
    is assigned to the centroid maximizing the EXACT integer inner
    product (ties -> smallest centroid id), persisted as
    centroid-partitioned Parquet. Same pruned-read query shape as the
    k-means index; additionally value-hash verifiable (sql_knn_ivf)."""
    import ray

    cids, C8 = _ivf8_centroids(emb_ds, n_centroids)
    ref = ray.put((cids, C8))

    def assign(t: pa.Table) -> pa.Table:
        import ray as _r

        ids, embs = _batch_matrix(t)
        if not ids:
            return pa.table({"centroid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": t.column("embedding")})
        ks, C = _r.get(ref)
        S = quantize_int8(embs) @ C.T  # exact integer-valued doubles
        # argmax picks the FIRST maximal column; rows of C are sorted
        # by cid asc, so ties resolve to the smallest centroid id —
        # the same rule as the oracle's ROW_NUMBER(ORDER BY ip DESC,
        # cid ASC)
        a = ks[np.argmax(S, axis=1)]
        return pa.table({"centroid": pa.array(a, pa.int64()),
                         "vec_id": pa.array(ids, pa.int64()),
                         "embedding": t.column("embedding")})

    emb_ds.map_batches(assign, batch_format="pyarrow",
                       zero_copy_batch=True) \
        .write_parquet(index_dir, partition_cols=["centroid"])
    np.savez(f"{index_dir}/centroids_int8.npz", cids=cids, C8=C8)
    return cids, C8


def knn_ivf_int8(index_dir: str, query_vec: np.ndarray, k: int = 10,
                 n_probe: int = 4, exclude_ids: set[int] | None = None,
                 centroids: tuple[np.ndarray, np.ndarray] | None = None):
    """Query the deterministic int8 IVF index: reads ONLY the n_probe
    centroid partitions with the highest exact integer inner product
    to the quantized query, then exact quantized top-k within them."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    if centroids is not None:
        cids, C8 = centroids
    else:
        z = np.load(f"{index_dir}/centroids_int8.npz")
        cids, C8 = z["cids"], z["C8"]
    q = np.asarray(query_vec, dtype=np.float64)
    q8 = quantize_int8(q[None, :])[0]
    scores = C8 @ q8
    probe = cids[np.lexsort((cids, -scores))[:n_probe]]
    files = [f for c in probe
             for f in _glob.glob(_os.path.join(index_dir, f"centroid={c}",
                                               "*.parquet"))]
    if not files:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "qscore": pa.array([], pa.int64())})
    cand = rd.read_parquet(files, columns=["vec_id", "embedding"])
    return knn_quantized(cand, q, k=k, exclude_ids=exclude_ids)


def sql_knn_ivf(n_centroids: int = 8, n_probe: int = 4,
                query_vec_id: int = 0, k: int = 10) -> str:
    """Self-contained DuckDB mirror of build_ivf_index_int8 +
    knn_ivf_int8 over the `embeddings` view: quantize, assign every
    vector to its max-inner-product centroid (ties -> smallest cid),
    probe the n_probe best centroids for the query, exact integer
    top-k within the probed lists."""
    return f"""
        WITH q AS ({_sql_quantize_cte()}),
        cent AS (SELECT vec_id AS cid, qv AS cv FROM q
                 WHERE vec_id < {n_centroids}),
        assign AS (
            SELECT vec_id, qv, cid FROM (
                SELECT a.vec_id, a.qv, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY list_inner_product(a.qv, c.cv) DESC,
                                    c.cid ASC) AS rn
                FROM q a, cent c) WHERE rn = 1),
        qq AS (SELECT qv FROM q WHERE vec_id = {query_vec_id}),
        probe AS (
            SELECT cid FROM (
                SELECT c.cid,
                       ROW_NUMBER() OVER (
                           ORDER BY list_inner_product(qq.qv, c.cv) DESC,
                                    c.cid ASC) AS rn
                FROM cent c, qq) WHERE rn <= {n_probe})
        SELECT a.vec_id,
               CAST(list_inner_product(a.qv, qq.qv) AS BIGINT) AS qscore
        FROM assign a JOIN probe p ON a.cid = p.cid, qq
        WHERE a.vec_id <> {query_vec_id}
        ORDER BY qscore DESC, a.vec_id LIMIT {k}
    """


def knn_lsh(emb_ds, query_vec: np.ndarray, k: int = 10, radius: int = 1,
            exclude_ids: set[int] | None = None):
    """Approximate top-k: scan only buckets whose signature is within
    `radius` bit flips of the query's signature. Builds the bucket
    assignment in-flight; for repeated queries, persist once with
    write_lsh_index and use knn_lsh_indexed.

    Candidates are scored with the EXACT int8-quantized dot product
    (same contract as knn_quantized), and the bucket signature is
    exact integer arithmetic — so the whole query is value-hash
    verifiable against the pure-SQL mirror from sql_knn_lsh()."""
    q = np.asarray(query_vec, dtype=np.float64)
    want_arr = pa.array(_probe_buckets(q, radius), pa.int64())
    buckets = build_lsh_buckets(emb_ds)
    cand = buckets.map_batches(
        lambda t, w=want_arr: t.filter(
            pa.compute.is_in(t.column("bucket"), value_set=w)),
        batch_format="pyarrow").select_columns(["vec_id", "embedding"])
    return knn_quantized(cand, q, k=k, exclude_ids=exclude_ids)


def _sql_quantize_cte(table: str = "embeddings") -> str:
    """The int8 floor-quantization CTE shared by every quantized-space
    oracle (mirror of quantize_int8; see q_knn_quantized's oracle)."""
    return f"""
        SELECT vec_id,
               CASE WHEN ma = 0
                    THEN list_transform(embedding, x -> 0.0)
                    ELSE list_transform(
                        embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(127.0 AS DOUBLE)
                                   / CAST(ma AS DOUBLE))) END AS qv
        FROM (SELECT vec_id, embedding,
                     list_aggregate(
                         list_transform(embedding, y -> abs(y)),
                         'max') AS ma
              FROM {table})
    """


def _sql_bucket_expr(dim: int, qv: str = "qv") -> str:
    """DuckDB expression for the packed int64 LSH bucket of a
    quantized vector column — the same planes (inlined as integer
    literals) and the same packed-bit key as _signature_bucket."""
    P = _planes_fx(dim)
    terms = []
    for j in range(N_PLANES):
        col = ", ".join(str(int(v)) for v in P[:, j])
        terms.append(f"(CASE WHEN list_inner_product({qv}, "
                     f"[{col}]) >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + "\n + ".join(terms) + ")"


def sql_knn_lsh(dim: int, query_vec_id: int = 0, k: int = 10,
                radius: int = 1) -> str:
    """Self-contained DuckDB mirror of knn_lsh over the `embeddings`
    view: recomputes the int8 quantization, the fixed-point
    hyperplane signatures, the Hamming-radius probe set (bit_count of
    XOR) and the exact integer top-k — every step integer-exact, so
    the value hash matches the engine bit-for-bit."""
    return f"""
        WITH q AS ({_sql_quantize_cte()}),
        sig AS (
            SELECT vec_id, qv,
                   {_sql_bucket_expr(dim)} AS bucket
            FROM q),
        qq AS (SELECT qv, bucket FROM sig WHERE vec_id = {query_vec_id})
        SELECT s.vec_id,
               CAST(list_inner_product(s.qv, qq.qv) AS BIGINT) AS qscore
        FROM sig s, qq
        WHERE bit_count(CAST(xor(s.bucket, qq.bucket) AS BIGINT))
                  <= {radius}
          AND s.vec_id <> {query_vec_id}
        ORDER BY qscore DESC, s.vec_id LIMIT {k}
    """


def label_centroids_fx(emb_ds, scale: int = 1_000_000,
                       label_col: str = "label",
                       emb_col: str = "embedding"):
    """Per-label elementwise centroid evidence over an embedding
    column — the class-prototype / k-means-E-step vector aggregate.

    Returns (label, dim, sum_fx, n_vecs) long-form, dim 1-based;
    centroid[dim] = sum_fx / (scale * n_vecs).  Each component is
    floored to int64 fixed-point (``floor(x * scale)``) BEFORE
    summation, so the sums are order-independent exact integers —
    bit-identical on any engine, no float-accumulation tolerance.

    Scale shape: the per-batch partial collapses D rows x dim floats
    into (labels-in-batch x dim) integer rows, so the single groupby
    shuffle moves O(labels * dim) per batch regardless of corpus size.
    """
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import list_col_matrix

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"ck": z, "sum_p": z, "cnt_p": z})
        labels = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        M = list_col_matrix(t.column(emb_col), dtype=np.float64)
        F = np.floor(M * scale).astype(np.int64)
        dims = F.shape[1]
        if dims >= 4096:
            raise ValueError("label_centroids_fx: dim must be < 4096 "
                             "(composite-key packing)")
        if len(labels) and labels.min() < 0:
            # pc.divide truncates toward zero, so a negative label
            # silently corrupts BOTH label and dim on unpack
            raise ValueError("label_centroids_fx: labels must be >= 0 "
                             "(composite-key packing)")
        if len(labels) and int(labels.max()) >= (1 << 51):
            raise ValueError("label_centroids_fx: label too large for "
                             "int64 composite-key packing (< 2^51)")
        ul, inv = np.unique(labels, return_inverse=True)
        S = np.zeros((len(ul), dims), dtype=np.int64)
        np.add.at(S, inv, F)
        cnt = np.bincount(inv).astype(np.int64)
        # composite shuffle key (single-key groupby; dim 1-based)
        ck = (np.repeat(ul, dims) * 4096
              + np.tile(np.arange(1, dims + 1, dtype=np.int64), len(ul)))
        return pa.table({"ck": pa.array(ck, pa.int64()),
                         "sum_p": pa.array(S.reshape(-1), pa.int64()),
                         "cnt_p": pa.array(np.repeat(cnt, dims), pa.int64())})

    agg = (emb_ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("ck").aggregate(Sum("sum_p", alias_name="sum_fx"),
                                    Sum("cnt_p", alias_name="n_vecs")))

    def unpack(t: pa.Table) -> pa.Table:
        ck = t.column("ck")
        k4096 = pa.scalar(4096, pa.int64())
        return pa.table({
            "label": pa.compute.divide(ck, k4096),
            "dim": pa.compute.subtract(
                ck, pa.compute.multiply(
                    pa.compute.divide(ck, k4096), k4096)),
            "sum_fx": pa.compute.cast(t.column("sum_fx"), pa.int64()),
            "n_vecs": pa.compute.cast(t.column("n_vecs"), pa.int64())})

    return agg.map_batches(unpack, batch_format="pyarrow")


def sql_label_centroids_fx(scale: int = 1_000_000,
                           table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`label_centroids_fx` (parallel unnest)."""
    return f"""
    WITH ex AS (
      SELECT label,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * {scale})
                              AS BIGINT))) AS fx
      FROM {table})
    SELECT label, dim, CAST(SUM(fx) AS BIGINT) AS sum_fx,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM ex GROUP BY label, dim
    """


def quantize_int8(embs: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 floor-quantization, defined to be
    bit-identical to its SQL mirror: ``q = floor(x * 127.0 / ma)``
    with ``ma = max(abs(x))`` per vector (all-double arithmetic,
    left-associative like the SQL expression; ma == 0 -> all-zero).
    Floor (not round) so no half-way tie rule can diverge between
    engines. 4x memory vs float32; dot products of 127-bounded
    integers are exact in int64 (and in the double accumulator up to
    ~2^45 terms)."""
    m = embs.astype(np.float64, copy=False)
    ma = np.abs(m).max(axis=1)
    safe = np.where(ma == 0, 1.0, ma)
    q = np.floor((m * 127.0) / safe[:, None])
    q[ma == 0] = 0.0
    return q


def knn_quantized(emb_ds, query_vec: np.ndarray, k: int = 10,
                  exclude_ids: set[int] | None = None):
    """Top-k by EXACT integer dot product over int8-quantized vectors
    — the memory-bound scale path (4x smaller resident vectors, SIMD
    int8 dot products on real hardware). Same per-batch partial-top-k
    + tiny-global-sort shape as knn_bruteforce; scores are exact
    int64, so the DuckDB list_inner_product oracle value-hash matches
    exactly (no float tolerance)."""
    import ray

    q = quantize_int8(np.asarray(query_vec, np.float64)[None, :])[0]
    q_ref = ray.put(q)
    excl = frozenset(exclude_ids or ())

    def partial_topk(t: pa.Table) -> pa.Table:
        import ray as _r

        qv = _r.get(q_ref)
        ids, embs = _batch_matrix(t)
        if not ids:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "qscore": pa.array([], pa.int64())})
        scores = (quantize_int8(embs) @ qv).astype(np.int64)
        order = np.lexsort((ids, -scores))
        keep: list[tuple[int, int]] = []
        for i in order:
            if ids[i] in excl:
                continue
            keep.append((ids[i], int(scores[i])))
            if len(keep) == k:
                break
        return pa.table({"vec_id": pa.array([i for i, _ in keep], pa.int64()),
                         "qscore": pa.array([s for _, s in keep], pa.int64())})

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow")
    top = partials.sort(["qscore", "vec_id"],
                        descending=[True, False]).limit(k)
    return pa.Table.from_pylist(
        top.take_all(),
        schema=pa.schema([("vec_id", pa.int64()), ("qscore", pa.int64())]))


def knn_filtered(emb_ds, query_vec: np.ndarray, labels, k: int = 10,
                 label_col: str = "label",
                 exclude_ids: set[int] | None = None):
    """Filtered vector search: exact quantized top-k restricted to
    rows whose ``label_col`` is in ``labels`` — the metadata-predicate
    search every vector store exposes (`WHERE label IN (...) ORDER BY
    score`).

    The predicate is applied INSIDE the per-batch scoring pass
    (PRE-filter): recall over the filtered set is exact by
    construction, unlike post-filtering a global top-k, which loses
    matches whenever fewer than k of the global top-k satisfy the
    predicate.  Same 100-TB shape as :func:`knn_quantized` — k rows
    leave each batch, one k*n_batches global sort; the filter only
    shrinks the scoring matmul.  -> pa.Table (vec_id, label, qscore).
    """
    import ray

    q = quantize_int8(np.asarray(query_vec, np.float64)[None, :])[0]
    q_ref = ray.put(q)
    excl = frozenset(exclude_ids or ())
    lab_set = pa.array(sorted({int(x) for x in labels}), pa.int64())

    def partial_topk(t: pa.Table, _q=q_ref) -> pa.Table:
        import ray as _r

        mask = pc.is_in(pc.cast(t.column(label_col), pa.int64()),
                        value_set=lab_set)
        t = t.filter(mask)
        qv = _r.get(_q)
        ids, embs = _batch_matrix(t)
        labs = pc.cast(t.column(label_col), pa.int64()).to_pylist()
        if not ids:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "qscore": pa.array([], pa.int64())})
        scores = (quantize_int8(embs) @ qv).astype(np.int64)
        order = np.lexsort((ids, -scores))
        keep: list[tuple[int, int, int]] = []
        for i in order:
            if ids[i] in excl:
                continue
            keep.append((ids[i], labs[i], int(scores[i])))
            if len(keep) == k:
                break
        return pa.table({
            "vec_id": pa.array([r[0] for r in keep], pa.int64()),
            "label": pa.array([r[1] for r in keep], pa.int64()),
            "qscore": pa.array([r[2] for r in keep], pa.int64())})

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow")
    top = partials.sort(["qscore", "vec_id"],
                        descending=[True, False]).limit(k)
    return pa.Table.from_pylist(
        top.take_all(),
        schema=pa.schema([("vec_id", pa.int64()),
                          ("label", pa.int64()),
                          ("qscore", pa.int64())]))


def _trunc_div(s: np.ndarray, c) -> np.ndarray:
    """Integer division truncating toward zero — DuckDB's native
    ``//`` semantics for signed values (numpy's ``//`` FLOORS; -7//2
    is -4 in numpy but -3 in DuckDB — measured, BENCH/NOTES.md)."""
    s = s.astype(np.int64)
    return np.where(s >= 0, s // c, -((-s) // c))


def kmeans_int8(emb_ds, k: int = 8, iters: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed Lloyd k-means over int8-quantized vectors, exact
    integers end to end — the clustering primitive of data-curation
    pipelines (cluster-balanced sampling, SemDeDup-style pruning,
    IVF coarse quantizers).

    Pinned contract (identical on both engines, no floats anywhere
    after quantization):
    - vectors quantized per-row by :func:`quantize_int8`;
    - initial centroids = the quantized vectors of the ``k`` smallest
      ids, numbered 0..k-1 in id order;
    - assignment = argmin integer squared L2, ties to the lowest
      cluster (one ``min(d2 * k + cl)`` composite);
    - update = elementwise trunc-division mean (DuckDB ``//``
      semantics via :func:`_trunc_div`); empty clusters keep their
      previous centroid;
    - ``iters`` update rounds, then one final assignment.

    100-TB shape: each round is ONE streaming pass — per batch a
    (k x dim) int64 partial-sum table leaves (never rows), merged on
    the driver at O(blocks * k) cost; centroids travel by ray.put.
    The final assignment STREAMS (corpus-sized — it must never land
    on the driver).  -> Dataset (id, cluster, dist2) sorted by id.
    """
    import ray

    def _quant_batch(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        col = t.column(id_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
        from ..dsutil import list_col_matrix

        m = list_col_matrix(t.column(vec_col))
        return ids, quantize_int8(m).astype(np.int64)

    # --- init: the k smallest ids (per-batch prune, tiny global sort)
    def smallest(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t.column(id_col))[:k]
        return t.take(idx).select([id_col, vec_col])

    seed = (emb_ds.map_batches(smallest, batch_format="pyarrow")
            .sort(id_col).limit(k))
    seed_t = pa.Table.from_pylist(seed.take_all())
    _, cent = _quant_batch(seed_t)

    def _round(cent_np: np.ndarray, want_assign: bool):
        ref = ray.put(cent_np)

        def assign_partial(t: pa.Table, _ref=ref) -> pa.Table:
            import ray as _r

            C = _r.get(_ref)
            ids, Q = _quant_batch(t)
            if len(ids) == 0:
                if want_assign:
                    return pa.table({id_col: pa.array([], pa.int64()),
                                     "cluster": pa.array([], pa.int64()),
                                     "dist2": pa.array([], pa.int64())})
                return pa.table({"cl": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.list_(pa.int64()))})
            # ||x-c||^2 for all pairs; composite min pins the tie rule
            d2 = ((Q * Q).sum(1)[:, None]
                  - 2 * (Q @ C.T)
                  + (C * C).sum(1)[None, :])
            comp = (d2 * k + np.arange(k)[None, :]).min(1)
            cl = comp % k
            if want_assign:
                return pa.table({id_col: pa.array(ids, pa.int64()),
                                 "cluster": pa.array(cl, pa.int64()),
                                 "dist2": pa.array(comp // k, pa.int64())})
            sums = np.zeros((k, Q.shape[1]), dtype=np.int64)
            np.add.at(sums, cl, Q)
            n = np.bincount(cl, minlength=k).astype(np.int64)
            used = np.nonzero(n)[0]
            return pa.table({
                "cl": pa.array(used, pa.int64()),
                "n": pa.array(n[used], pa.int64()),
                "s": pa.array([sums[c].tolist() for c in used],
                              pa.list_(pa.int64()))})

        return emb_ds.map_batches(assign_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)

    for _ in range(iters):
        rows = _round(cent, want_assign=False).take_all()
        dim = cent.shape[1]
        sums = np.zeros((k, dim), dtype=np.int64)
        n = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cl"]] += np.asarray(r["s"], dtype=np.int64)
            n[r["cl"]] += r["n"]
        new_cent = cent.copy()
        nz = n > 0
        new_cent[nz] = _trunc_div(sums[nz], n[nz][:, None])
        cent = new_cent

    return _round(cent, want_assign=True).sort(id_col)


def sql_kmeans_int8(k: int = 8, iters: int = 2, dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    rel: str = "embeddings") -> str:
    """DuckDB mirror of :func:`kmeans_int8` — chained MATERIALIZED
    CTE rounds (the BPE-levels pattern), native ``//`` trunc-division
    centroid means, the same composite argmin."""
    quant = f"""
    qi AS MATERIALIZED (
      SELECT {id_col} AS vid,
             list_transform(
               CASE WHEN ma = 0
                    THEN list_transform({vec_col}, x -> 0.0)
                    ELSE list_transform({vec_col},
                         x -> floor(CAST(x AS DOUBLE)
                                    * CAST(127.0 AS DOUBLE)
                                    / CAST(ma AS DOUBLE))) END,
               x -> CAST(x AS BIGINT)) AS qv
      FROM (SELECT {id_col}, {vec_col},
                   list_aggregate(list_transform({vec_col},
                                                 y -> abs(y)), 'max')
                       AS ma
            FROM {rel})),
    c0 AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS cl,
             qv AS cv
      FROM (SELECT vid, qv FROM qi ORDER BY vid LIMIT {k}))"""
    d2 = (f"list_aggregate(list_transform(generate_series(1, {dim}), "
          f"i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])), 'sum')")
    parts = [quant]
    prev_c = "c0"
    for r in range(iters):
        parts.append(f"""
    a{r} AS MATERIALIZED (
      SELECT vid, min(d2 * {k} + cl) % {k} AS cl
      FROM (SELECT q.vid, c.cl, {d2} AS d2
            FROM qi q CROSS JOIN {prev_c} c)
      GROUP BY vid)""")
        parts.append(f"""
    u{r} AS MATERIALIZED (
      SELECT cl, list(sd ORDER BY i) AS cv FROM (
        SELECT a.cl, i.i,
               CAST(CASE WHEN sum(q.qv[i.i]) >= 0
                    THEN sum(q.qv[i.i]) // count(*)
                    ELSE -((-sum(q.qv[i.i])) // count(*)) END
                    AS BIGINT) AS sd
        FROM a{r} a JOIN qi q USING (vid)
        CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) i
        GROUP BY a.cl, i.i) GROUP BY cl)""")
        parts.append(f"""
    c{r + 1} AS MATERIALIZED (
      SELECT p.cl, coalesce(u.cv, p.cv) AS cv
      FROM {prev_c} p LEFT JOIN u{r} u USING (cl))""")
        prev_c = f"c{r + 1}"
    return f"""
    WITH {','.join(parts)}
    SELECT vid AS {id_col},
           CAST(min(d2 * {k} + cl) % {k} AS BIGINT) AS cluster,
           CAST(min(d2 * {k} + cl) // {k} AS BIGINT) AS dist2
    FROM (SELECT q.vid, c.cl, {d2} AS d2
          FROM qi q CROSS JOIN {prev_c} c)
    GROUP BY vid
    ORDER BY vid
    """


def mmr_select(emb_ds, query_vec: np.ndarray, k_candidates: int = 20,
               k_select: int = 5, exclude_ids: set[int] | None = None):
    """Maximal Marginal Relevance diverse top-k (Carbonell/Goldstein
    1998) — the retrieval re-ranker that trades pure relevance for
    coverage: after the distributed int8 top-``k_candidates``
    retrieval, greedily select ``k_select`` items maximizing

        mmr(d) = rel(d) - max over selected s of sim(d, s)

    (the lambda=0.5 form with the 1/2 factored out — argmax-invariant)
    where rel and sim are the EXACT integer quantized dot products, so
    every pick is deterministic (ties to the smaller vec_id) and the
    chained-CTE DuckDB mirror (:func:`sql_mmr_select`) value-matches.

    Scale shape: the distributed part is the knn_quantized partial
    top-k; the greedy loop runs on the driver over k_candidates rows
    and their fetched vectors — O(k^2) integer dots, query-sized.
    Returns pa.Table(rank, vec_id, rel, mmr); the first pick's mmr is
    its relevance (empty selected set).
    """
    cand_rows = knn_quantized(emb_ds, query_vec, k=k_candidates,
                              exclude_ids=exclude_ids).to_pylist()
    if not cand_rows:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rel": pa.array([], pa.int64()),
                         "mmr": pa.array([], pa.int64())})
    rel = {r["vec_id"]: r["qscore"] for r in cand_rows}
    ids = [r["vec_id"] for r in cand_rows]
    idset = pa.array(ids, pa.int64())
    vec_rows = emb_ds.map_batches(
        lambda t: t.filter(pc.is_in(
            pc.cast(t.column("vec_id"), pa.int64()), value_set=idset)),
        batch_format="pyarrow").take_all()
    q8 = {r["vec_id"]: quantize_int8(
        np.asarray(r["embedding"], np.float64)[None, :])[0]
        for r in vec_rows}
    selected: list[int] = []
    out = []
    remaining = sorted(ids)
    for rank in range(1, min(k_select, len(ids)) + 1):
        best = None
        for d in remaining:
            if selected:
                ms = max(int(q8[d] @ q8[s]) for s in selected)
                score = rel[d] - ms
            else:
                score = rel[d]
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, score)
        _, pick, score = best
        selected.append(pick)
        remaining.remove(pick)
        out.append((rank, pick, rel[pick], score))
    return pa.table({
        "rank": pa.array([r[0] for r in out], pa.int64()),
        "vec_id": pa.array([r[1] for r in out], pa.int64()),
        "rel": pa.array([r[2] for r in out], pa.int64()),
        "mmr": pa.array([r[3] for r in out], pa.int64())})


def sql_mmr_select(k_candidates: int = 20, k_select: int = 5,
                   query_vec_id: int = 0,
                   table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`mmr_select` with the query = the
    embedding of ``query_vec_id``: the q_knn_quantized quantization
    CTE, the same pinned top-k candidate cut, then one chained
    (pick, selected-set) CTE pair per greedy step with the identical
    integer mmr and tie order."""
    parts = [f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             CASE WHEN ma = 0
                  THEN list_transform(embedding, x -> 0.0)
                  ELSE list_transform(
                      embedding,
                      x -> floor(CAST(x AS DOUBLE)
                                 * CAST(127.0 AS DOUBLE)
                                 / CAST(ma AS DOUBLE))) END AS qv
      FROM (SELECT vec_id, embedding,
                   list_aggregate(
                       list_transform(embedding, y -> abs(y)),
                       'max') AS ma
            FROM {table})
    ), cand AS MATERIALIZED (
      SELECT a.vec_id,
             CAST(list_inner_product(a.qv, b.qv) AS BIGINT) AS rel,
             a.qv
      FROM q a, q b
      WHERE b.vec_id = {query_vec_id} AND a.vec_id <> {query_vec_id}
      ORDER BY rel DESC, a.vec_id LIMIT {k_candidates}
    ), s1 AS MATERIALIZED (
      SELECT 1::BIGINT AS rank, vec_id, rel, rel AS mmr, qv
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ), sel1 AS (SELECT * FROM s1)"""]
    for i in range(2, k_select + 1):
        parts.append(f""",
    s{i} AS MATERIALIZED (
      SELECT {i}::BIGINT AS rank, c.vec_id, c.rel,
             c.rel - (SELECT max(CAST(
                 list_inner_product(c.qv, s.qv) AS BIGINT))
                      FROM sel{i - 1} s) AS mmr,
             c.qv
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      ORDER BY mmr DESC, c.vec_id LIMIT 1
    ), sel{i} AS (SELECT * FROM sel{i - 1}
                  UNION ALL SELECT * FROM s{i})""")
    parts.append(f"""
    SELECT rank, vec_id, rel, mmr FROM sel{k_select}""")
    return "".join(parts)


RRF_SCALE = 1_000_000


def rrf_fuse(rankings: list, topk: int = 10, k: int = 60,
             id_col: str = "vec_id"):
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) — the
    hybrid-search combiner: given N ranked candidate tables (each a
    driver-sized top-k retrieval, rank = 1-based position), fuse by

        score(d) = sum over lists containing d of RRF_SCALE // (k + rank_d)

    (integer floor division — the float 1/(k+rank) made exact), then
    top-``topk`` by (score DESC, id).  RRF needs no score calibration
    between lists — only ranks — which is why it is the standard
    lexical+vector fusion; the integer form keeps the mirror
    (:func:`sql_rrf_fuse`) value-identical.

    Scale shape: the heavy work is the input retrievals (already
    distributed); fusion itself is O(sum of list lengths) driver
    arithmetic.  Returns pa.Table(id, score, n_lists).
    """
    scores: dict = {}
    hits: dict = {}
    for tbl in rankings:
        ids = tbl.column(id_col).to_pylist()
        for rank, d in enumerate(ids, start=1):
            scores[d] = scores.get(d, 0) + RRF_SCALE // (k + rank)
            hits[d] = hits.get(d, 0) + 1
    order = sorted(scores, key=lambda d: (-scores[d], d))[:topk]
    return pa.table({
        id_col: pa.array(order, pa.int64()),
        "score": pa.array([scores[d] for d in order], pa.int64()),
        "n_lists": pa.array([hits[d] for d in order], pa.int64())})


def sql_rrf_fuse(ranking_sqls: list, topk: int = 10, k: int = 60,
                 id_col: str = "vec_id") -> str:
    """DuckDB oracle for :func:`rrf_fuse`: each ranking SQL must yield
    rows in its OWN ranked order's defining columns — pass queries of
    the form 'SELECT id, ... ORDER BY ...' wrapped so row_number()
    reproduces the rank — here each arm is (id_col, rank) directly."""
    arms = []
    for i, rsql in enumerate(ranking_sqls):
        arms.append(f"__r{i} AS MATERIALIZED ({rsql})")
    unions = "\nUNION ALL\n".join(
        f"SELECT {id_col}, {RRF_SCALE} // ({k} + rank) AS part, "
        f"1::BIGINT AS hit FROM __r{i}"
        for i in range(len(ranking_sqls)))
    return f"""
    WITH {', '.join(arms)},
    __parts AS ({unions})
    SELECT {id_col}, SUM(part)::BIGINT AS score,
           SUM(hit)::BIGINT AS n_lists
    FROM __parts GROUP BY {id_col}
    ORDER BY score DESC, {id_col} LIMIT {topk}
    """
