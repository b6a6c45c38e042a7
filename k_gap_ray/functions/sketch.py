"""Distributed cardinality sketch: HyperLogLog (Flajolet et al. 2007,
public algorithm) with the linear-counting small-range correction.

Ray-Data shape: one vectorized map_batches computes PER-BATCH register
maxima (at most m=4096 rows leave a batch regardless of its row
count), a groupby(register).max merge combines them — the shuffle is
bounded by m x n_blocks, never by row count — and a driver finisher
folds the 4096-row register table into the estimate. That is the
canonical mergeable-sketch pattern: partial per block, tiny merge,
O(m) finish; register tables from different datasets/partitions can
be unioned before the merge for cross-shard or sliding-window counts.

The hash is the murmur3 32-bit finalizer (public domain), chosen
because xor / shift-as-integer-division / multiply-mod-2^32 are all
expressible in plain SQL, so the DuckDB oracle reproduces the SKETCH
(registers, scaled integer harmonic sum, estimate) value-for-value —
the approximate operator is still exactly verifiable. (A plain
multiplicative-mod hash was tried first and failed the error-bound
test: no avalanche, so consecutive ids break the geometric
register-max statistics.) The 32-bit window (20 rho bits) is plenty
below ~10^5 true cardinality; at real scale swap in a 64-bit hash
(the register/merge plumbing is unchanged) and lose the SQL mirror,
keeping the pytest error-bound check. Estimator error
~1.04/sqrt(4096) = 1.6%.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HLL_P = 12                      # 4096 registers
HLL_M = 1 << HLL_P
_W = 20                         # bits in the rho window (32 - p)
_RHO_MAX = _W + 1
_SCALE = 1 << _RHO_MAX          # 2^21: integer weight of an EMPTY register
_M32 = np.uint64(0xFFFFFFFF)


def _mix32(v: np.ndarray) -> np.ndarray:
    """murmur3 fmix32 over the low 32 bits, in uint64 lanes."""
    h = v.astype(np.uint64) & _M32
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & _M32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & _M32
    h ^= h >> np.uint64(16)
    return h


def _floor_log2(v: np.ndarray) -> np.ndarray:
    """Exact floor(log2(v)) for v >= 1 (values < 2^53): frexp exponent
    minus one — no float-log rounding anywhere."""
    _, e = np.frexp(v.astype(np.float64))
    return (e - 1).astype(np.int64)


def hll_partials(ds, col: str):
    """Dataset -> (reg, rho) per-batch register maxima rows."""

    def f(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return pa.table({"reg": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = _mix32(v).astype(np.int64)
        reg = h % HLL_M
        rest = h // HLL_M                      # < 2^20
        rho = np.where(rest == 0, _RHO_MAX, _W - _floor_log2(
            np.maximum(rest, 1)))
        maxes = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(maxes, reg, rho)
        used = np.nonzero(maxes)[0]
        return pa.table({"reg": pa.array(used, pa.int64()),
                         "rho": pa.array(maxes[used], pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def hll_count(ds, col: str):
    """Distinct-count estimate -> 1-row table
    (n_est:int64, n_registers_used:int64).

    The harmonic sum is kept as an exact INTEGER (each register
    contributes 2^(21-rho), empties 2^21; total < 2^33), so the final
    estimate is one exact-integer division in doubles — deterministic
    and bit-identical to the SQL oracle's expression."""
    merged = (hll_partials(ds, col)
              .groupby("reg").max("rho")
              .rename_columns({"max(rho)": "rho"}))
    rows = merged.take_all()                  # <= 4096 rows by construction
    n_used = len(rows)
    s_used = sum(1 << (_RHO_MAX - r["rho"]) for r in rows)
    return pa.table({
        "n_est": pa.array([_estimate(n_used, s_used)], pa.int64()),
        "n_registers_used": pa.array([n_used], pa.int64())})


def _estimate(n_used: int, s_used: int) -> int:
    """The shared HLL finisher: exact-integer harmonic total -> one
    double division (+ linear counting below 2.5m) — bit-identical to
    the SQL mirror's expression."""
    zeros = HLL_M - n_used
    total = s_used + zeros * _SCALE
    raw = (0.7213 / (1.0 + 1.079 / HLL_M)) * float(HLL_M) * float(HLL_M) \
        * float(_SCALE) / float(total)
    if raw <= 2.5 * HLL_M and zeros > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / zeros)
    else:
        est = raw
    return int(round(est))


def hll_count_by(ds, col: str, by: str, driver_cap: int = 2_000_000):
    """Grouped distinct-count sketch: one HLL per value of ``by``.
    -> pa.Table (by, n_est, n_registers_used) ordered by ``by``.

    Intended for DIMENSION-cardinality group columns (event types,
    languages, sources): per batch the register table is a dense
    (groups-in-batch x m) array, the merge shuffle carries at most
    |groups| * m rows keyed by a single composite string key (no
    multi-key groupby), and the finisher folds <= |groups| * m rows on
    the driver under ``driver_cap`` — a loud guard, not a silent
    truncation.  For per-USER distinct counts use the exact
    composite-key reductions (functions/funnel.py retention shape)
    instead; a sketch per high-cardinality key inverts the economics.
    """

    def f(t: pa.Table) -> pa.Table:
        g = t.column(by).combine_chunks() \
            if isinstance(t.column(by), pa.ChunkedArray) else t.column(by)
        enc = g.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        groups = enc.dictionary.to_pylist()
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0 or not groups:
            return pa.table({"gkey": pa.array([], pa.string()),
                             "rho": pa.array([], pa.int64())})
        h = _mix32(v).astype(np.int64)
        reg = h % HLL_M
        rest = h // HLL_M
        rho = np.where(rest == 0, _RHO_MAX, _W - _floor_log2(
            np.maximum(rest, 1)))
        maxes = np.zeros(len(groups) * HLL_M, dtype=np.int64)
        np.maximum.at(maxes, codes * HLL_M + reg, rho)
        used = np.nonzero(maxes)[0]
        gkey = [f"{groups[i // HLL_M]}\x00{i % HLL_M:04d}" for i in used]
        return pa.table({"gkey": pa.array(gkey, pa.string()),
                         "rho": pa.array(maxes[used], pa.int64())})

    merged = (ds.map_batches(f, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("gkey").max("rho")
              .rename_columns({"max(rho)": "rho"}))
    rows = merged.take_all()
    if len(rows) > driver_cap:
        raise ValueError(f"{len(rows)} (group, register) rows exceed "
                         f"driver_cap={driver_cap}; group cardinality "
                         f"too high for the sketch-per-group shape")
    per: dict[str, tuple[int, int]] = {}
    for r in rows:
        gval = r["gkey"].rsplit("\x00", 1)[0]
        n, s = per.get(gval, (0, 0))
        per[gval] = (n + 1, s + (1 << (_RHO_MAX - r["rho"])))
    out = sorted(per.items())
    return pa.table({
        by: pa.array([g for g, _ in out], pa.string()),
        "n_est": pa.array([_estimate(n, s) for _, (n, s) in out],
                          pa.int64()),
        "n_registers_used": pa.array([n for _, (n, _) in out],
                                     pa.int64())})


def sql_hll_count_by(col: str, by: str, rel: str = "events") -> str:
    """DuckDB mirror of :func:`hll_count_by` — the global q_events_hll
    sketch SQL with the group column carried through every CTE."""
    return f"""
        WITH h0 AS (SELECT DISTINCT {by} AS g, {col} % 4294967296 AS x
                    FROM {rel}),
        h1 AS (SELECT g, CAST((xor(x, x // 65536)::HUGEINT
                               * 2246822507) % 4294967296 AS BIGINT) AS x
               FROM h0),
        h2 AS (SELECT g, CAST((xor(x, x // 8192)::HUGEINT
                               * 3266489909) % 4294967296 AS BIGINT) AS x
               FROM h1),
        h AS (SELECT g, xor(x, x // 65536) AS hv FROM h2),
        r AS (SELECT g, hv % 4096 AS reg,
                     max(CASE WHEN hv // 4096 = 0 THEN 21
                         ELSE 20 - CAST(floor(log2(hv // 4096))
                                        AS BIGINT) END) AS rho
              FROM h GROUP BY g, reg),
        s AS (SELECT g, CAST(sum(2 ** (21 - rho)) AS BIGINT) AS s_used,
                     count(*) AS n_used FROM r GROUP BY g)
        SELECT g AS {by},
               CAST(round(CASE WHEN raw <= 10240.0 AND n_used < 4096
                          THEN 4096.0 * ln(4096.0 / (4096 - n_used))
                          ELSE raw END) AS BIGINT) AS n_est,
               n_used AS n_registers_used
        FROM (SELECT g, n_used,
                     (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0
                     * 4096.0 * 2097152.0
                     / (s_used + (4096 - n_used) * 2097152.0) AS raw
              FROM s)
        ORDER BY {by}
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, public algorithm)
# ---------------------------------------------------------------------------
#
# Frequency estimation with one-sided error: est(v) >= true(v) always,
# est(v) <= true(v) + N/W per row w.h.p., min over D rows. Mergeable
# exactly like the HLL above: a vectorized map_batches emits at most
# D*W = 4096 (cell, count) rows per batch regardless of batch size, and
# the partials ADD — per-block partial tables are merged on the driver
# under the hard D*W bound (the ngram_prefix_bands driver-merge shape;
# a groupby-sum would pay Ray's fixed aggregate cost for a result that
# lands on the driver anyway). Cross-shard / sliding-window sketches
# are elementwise sums of the (D, W) tables.
#
# The per-row hashes reuse functions/shuffle.py's seeded 31-bit mix —
# every intermediate stays below 2**62, so the DuckDB oracle
# reproduces cells AND estimates value-for-value (BIGINT has no
# wraparound; see BENCH/NOTES.md round-4).

CMS_D = 4                       # hash rows
CMS_W = 1024                    # cells per row


def _cms_seed(r: int) -> int:
    return (1_000_003 * r + 12_345) % (1 << 31)


def cms_table(ds, col: str) -> np.ndarray:
    """Dataset -> the full (CMS_D, CMS_W) int64 count table.

    Values in ``col`` must be non-negative int64 (the 31-bit mix's
    SQL mirror relies on DuckDB's sign-preserving ``%``)."""
    from k_gap_ray.functions.shuffle import _mix

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        ks, cs = [], []
        for r in range(CMS_D):
            cell = _mix(v, _cms_seed(r)) % CMS_W
            cnt = np.bincount(cell, minlength=CMS_W)
            used = np.nonzero(cnt)[0]
            ks.append(r * CMS_W + used)
            cs.append(cnt[used])
        return pa.table({
            "k": pa.array(np.concatenate(ks) if ks else [], pa.int64()),
            "c": pa.array(np.concatenate(cs) if cs else [], pa.int64())})

    import ray

    tab = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for blk in ray.get(ds.map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).to_arrow_refs()):
        if not isinstance(blk, pa.Table):
            blk = pa.Table.from_pandas(blk, preserve_index=False)
        if blk.num_rows == 0:       # zero-row pass-through blocks keep
            continue                # their UPSTREAM schema — skip
        np.add.at(tab, blk.column("k").to_numpy(zero_copy_only=False),
                  blk.column("c").to_numpy(zero_copy_only=False))
    return tab.reshape(CMS_D, CMS_W)


def cms_estimates(ds, col: str, probes: list[int]) -> pa.Table:
    """Point-query the sketch: -> (item:int64, est:int64) per probe."""
    from k_gap_ray.functions.shuffle import _mix

    tab = cms_table(ds, col)
    p = np.asarray(sorted(probes), dtype=np.int64)
    if (p < 0).any():
        raise ValueError("probe items must be non-negative")
    est = np.full(len(p), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        cell = _mix(p, _cms_seed(r)) % CMS_W
        est = np.minimum(est, tab[r, cell])
    return pa.table({"item": pa.array(p, pa.int64()),
                     "est": pa.array(est, pa.int64())})


def sql_cms_estimates(col: str, probes: list[int],
                      rel: str = "events") -> str:
    """The same sketch + point queries as one DuckDB query."""
    from k_gap_ray.functions.shuffle import _mix_sql

    vals = ", ".join(f"({int(v)})" for v in sorted(probes))
    parts, ests = [], []
    for r in range(CMS_D):
        mix_rel = _mix_sql(f"CAST({col} AS BIGINT)", _cms_seed(r))
        mix_probe = _mix_sql("CAST(p.item AS BIGINT)", _cms_seed(r))
        parts.append(f"cells{r} AS (SELECT ({mix_rel}) % {CMS_W} AS cell, "
                     f"count(*)::BIGINT AS c FROM {rel} GROUP BY 1)")
        ests.append(f"SELECT p.item, coalesce(c{r}.c, 0) AS c "
                    f"FROM probes p LEFT JOIN cells{r} c{r} "
                    f"ON c{r}.cell = ({mix_probe}) % {CMS_W}")
    return (f"WITH probes(item) AS (SELECT CAST(v AS BIGINT) FROM "
            f"(VALUES {vals}) t(v)),\n"
            + ",\n".join(parts)
            + "\nSELECT item, min(c)::BIGINT AS est FROM (\n"
            + "\nUNION ALL\n".join(ests)
            + "\n) GROUP BY item")


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch — Bar-Yossef et al. 2002,
# public algorithm.  HLL's registers cannot estimate INTERSECTIONS;
# KMV's bottom-k hash sample supports set operations: keep the k
# smallest distinct murmur-mixed hashes per set, then
#
#     est(|A|)      = (k-1) * 2^32 // (h_k + 1)       (full sketch)
#                   = |sketch|                        (undersized: exact)
#     est(|A ∩ B|)  = |{h in A_k ∩ B_k : h <= θ}| * 2^32 // (θ + 1)
#     θ             = min(θ_A, θ_B), θ_X = h_k of X (2^32-1 if exact)
#
# Every step is integer and deterministic (the mix has no seed state),
# so the DuckDB mirror reproduces the sketches and the estimates
# value-for-value — approximate answers, exactly verifiable.
# ---------------------------------------------------------------------------

KMV_K = 256
_KMV_DOMAIN = 1 << 32


def kmv_sketch(ds, col: str, k: int = KMV_K) -> np.ndarray:
    """Bottom-k sketch of a Dataset column: per-batch distinct mixed
    hashes truncated to their k smallest (at most k rows leave any
    batch), merged on the driver with one np.unique — O(k x blocks)
    driver state, never the column's cardinality."""

    def partial(t: pa.Table) -> pa.Table:
        col_a = t.column(col)
        col_a = col_a.combine_chunks() if isinstance(
            col_a, pa.ChunkedArray) else col_a
        v = pc.unique(pc.cast(col_a, pa.int64())).to_numpy(
            zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        h = np.unique(_mix32(v).astype(np.int64))[:k]
        return pa.table({"h": pa.array(h, pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    hs = np.unique(np.array([r["h"] for r in rows], dtype=np.int64))
    return hs[:k]


def kmv_estimate(sketch: np.ndarray, k: int = KMV_K) -> int:
    if len(sketch) < k:
        return int(len(sketch))
    return ((k - 1) * _KMV_DOMAIN) // int(sketch[k - 1] + 1)


def kmv_theta(sketch: np.ndarray, k: int = KMV_K) -> int:
    return int(sketch[k - 1]) if len(sketch) == k else _KMV_DOMAIN - 1


def kmv_intersect_estimate(sa: np.ndarray, sb: np.ndarray,
                           k: int = KMV_K) -> int:
    theta = min(kmv_theta(sa, k), kmv_theta(sb, k))
    common = np.intersect1d(sa, sb)
    common = common[common <= theta]
    return (len(common) * _KMV_DOMAIN) // (theta + 1)


def _sql_mix32(x: str) -> str:
    """The murmur fmix32 chain as one nested DuckDB expression over a
    NONNEGATIVE 32-bit input expression (// == >> for nonneg)."""
    h = f"({x}) % 4294967296"
    h = f"xor({h}, ({h}) // 65536)"
    h = f"CAST((({h})::HUGEINT * 2246822507) % 4294967296 AS BIGINT)"
    h = f"xor({h}, ({h}) // 8192)"
    h = f"CAST((({h})::HUGEINT * 3266489909) % 4294967296 AS BIGINT)"
    h = f"xor({h}, ({h}) // 65536)"
    return h


def sql_kmv_sets(col: str, where_a: str, where_b: str,
                 k: int = KMV_K, rel: str = "events") -> str:
    """DuckDB oracle for two KMV sketches + their intersection
    estimate: one row (est_a, est_b, est_common)."""
    dom = _KMV_DOMAIN

    def sk(name: str, where: str) -> str:
        return f"""
    __h_{name} AS (SELECT DISTINCT {_sql_mix32(col)} AS h
                   FROM {rel} WHERE {where}),
    __k_{name} AS MATERIALIZED (
      SELECT h FROM __h_{name} ORDER BY h LIMIT {k}),
    __s_{name} AS (
      SELECT count(*) AS n, max(h) AS hk FROM __k_{name})"""

    est = (lambda name:
           f"(SELECT CASE WHEN n < {k} THEN n "
           f"ELSE ({k - 1} * {dom}::BIGINT) // (hk + 1) END "
           f"FROM __s_{name})")
    theta = (lambda name:
             f"(SELECT CASE WHEN n = {k} THEN hk "
             f"ELSE {dom - 1} END FROM __s_{name})")
    return f"""
    WITH {sk('a', where_a)}, {sk('b', where_b)},
    __theta AS (SELECT least({theta('a')}, {theta('b')}) AS th),
    __common AS (
      SELECT count(*)::BIGINT AS c
      FROM __k_a a JOIN __k_b b ON a.h = b.h
      WHERE a.h <= (SELECT th FROM __theta))
    SELECT {est('a')}::BIGINT AS est_a,
           {est('b')}::BIGINT AS est_b,
           ((SELECT c FROM __common) * {dom}::BIGINT
            // ((SELECT th FROM __theta) + 1))::BIGINT AS est_common
    """
