"""Iterative graph analytics over edge-list Datasets: PageRank (and
its personalized variant), HITS, multi-source BFS, weighted shortest
paths, triangle counting.

Complements the connected-components operator (`ops/canonicalize.py`)
with the other classic KG analytics primitive (the reference platform
exposes its store to graph analytics notebooks; rank/centrality over
the materialized adjacency is the canonical follow-on query).

Exact-integer semantics — the whole point of this formulation:

    rank_0(v)   = scale
    contrib(u)  = rank(u) // out_degree(u)          (int64 floor-div)
    rank_i+1(v) = (scale * (den - num)) // den
                  + (num * sum_{u->v} contrib(u)) // den

with ``num/den`` the damping fraction (85/100).  Every operation is
int64 (floor division, order-independent integer sums), so a fixed
iteration count yields BIT-IDENTICAL results on any engine — the
DuckDB oracle (:func:`sql_pagerank`, k chained CTEs) compares values
exactly, no float tolerance.  Dangling nodes contribute nothing (their
mass evaporates), identically on both sides.

Scale shape: out-degrees are one ``groupby(src).count()``; each
iteration is one hash join (ranks onto edges, keyed by src) + one
``groupby(dst)`` integer sum + one left join back onto the node table
— all lazy, so a k-iteration run compiles into ONE streaming DAG
executed once at the end (no per-iteration materialize barrier; only
the reused edge table is materialized once).  Partitioning key is the
node id throughout; hub skew is bounded because a hub's fan-IN
contributions are pre-summed by the groupby combiner, and its fan-OUT
is a single join row replicated by the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _distinct_nodes(edges_ds):
    """All node ids appearing as src or dst (one slim shuffle)."""
    srcs = edges_ds.map_batches(
        lambda t: pa.table({"node": pc.unique(
            t.column("src").combine_chunks())}),
        batch_format="pyarrow")
    dsts = edges_ds.map_batches(
        lambda t: pa.table({"node": pc.unique(
            t.column("dst").combine_chunks())}),
        batch_format="pyarrow")
    return (srcs.union(dsts).groupby("node").count()
            .select_columns(["node"]))


def pagerank_int(edges_ds, iters: int = 5, scale: int = 1_000_000,
                 damping_num: int = 85, damping_den: int = 100,
                 num_partitions: int | None = None,
                 driver_cap: int = 2_000_000,
                 seeds: list[str] | None = None):
    """Edge list Dataset(src, dst) -> Dataset(node, rank) after
    ``iters`` exact-integer PageRank iterations.

    ``scale * damping_num * max_in_degree`` must fit int64 — with the
    default 10^6 scale that allows ~10^11 inbound edges per node.
    ``num_partitions`` sizes every shuffle (default: cluster CPUs);
    size it to the graph, not the cluster, for small graphs.

    Below ``driver_cap`` edges the iterations run as numpy gathers on
    the driver (one collected edge list, identical integer
    recurrence): each distributed iteration costs one hash join + one
    groupby whose multi-second FIXED cost dwarfs the arithmetic at
    gate scale (measured 55.6 s -> ~4 s at sf0.01). The Dataset path
    above the cap is byte-identical in arithmetic.

    ``seeds`` switches to PERSONALIZED PageRank (the seed-biased
    ranking entity recommendation runs): the teleport mass lands only
    on seed nodes and the initial rank is ``scale`` on seeds / 0
    elsewhere — the unnormalized integer variant, pinned identically
    in the SQL mirror. ``None`` keeps classic uniform PageRank,
    bit-for-bit as before.
    """
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import join_datasets

    n_edges = edges_ds.count()
    if n_edges <= driver_cap:
        import ray
        import ray.data as rd

        parts = []
        for p in ray.get(edges_ds.materialize().to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["src", "dst"]))
        teleport = (scale * (damping_den - damping_num)) // damping_den
        if not parts:
            return rd.from_arrow(pa.table({
                "node": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64())}))
        t = pa.concat_tables(parts).combine_chunks()
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.concatenate([src, dst]),
                              return_inverse=True)
        s_idx, d_idx = inv[:len(src)], inv[len(src):]
        deg = np.bincount(s_idx, minlength=len(uniq)).astype(np.int64)
        deg_safe = np.maximum(deg, 1)  # sink nodes never indexed via src
        if seeds is None:
            tp = np.full(len(uniq), teleport, dtype=np.int64)
            ranks = np.full(len(uniq), scale, dtype=np.int64)
        else:
            is_seed = np.isin(uniq, np.array(sorted(set(seeds))))
            tp = np.where(is_seed, teleport, 0).astype(np.int64)
            ranks = np.where(is_seed, scale, 0).astype(np.int64)
        for _ in range(iters):
            contrib = ranks[s_idx] // deg_safe[s_idx]
            insum = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(insum, d_idx, contrib)
            ranks = tp + (damping_num * insum) // damping_den
        return rd.from_arrow(pa.table({
            "node": pa.array(uniq), "rank": pa.array(ranks, pa.int64())}))

    teleport = (scale * (damping_den - damping_num)) // damping_den
    np_kw = {"num_partitions": num_partitions}

    if seeds is None:
        def tp_of(node_col) -> pa.Array:
            return pa.array([teleport] * len(node_col), pa.int64())

        def init_of(node_col) -> pa.Array:
            return pa.array([scale] * len(node_col), pa.int64())
    else:
        import ray as _ray

        _seed_ref = _ray.put(pa.array(sorted(set(seeds)), pa.string()))

        def _member(node_col) -> pa.Array:
            import ray as _r

            col = node_col.combine_chunks() \
                if isinstance(node_col, pa.ChunkedArray) else node_col
            return pc.is_in(col, value_set=_r.get(_seed_ref))

        def tp_of(node_col) -> pa.Array:
            return pc.if_else(_member(node_col),
                              pa.scalar(teleport, pa.int64()),
                              pa.scalar(0, pa.int64()))

        def init_of(node_col) -> pa.Array:
            return pc.if_else(_member(node_col),
                              pa.scalar(scale, pa.int64()),
                              pa.scalar(0, pa.int64()))

    deg = (edges_ds.groupby("src").count()
           .map_batches(lambda t: pa.table({
               "src": t.column("src"), "deg": t.column("count()")}),
               batch_format="pyarrow"))
    # edges ⋈ out-degree, reused every iteration -> materialize ONCE.
    # deg passed through a schema-rebuilding map_batches, so neither
    # side can carry empty-schema blocks: no scrub barriers.
    edges_deg = join_datasets(
        edges_ds, deg, on="src", scrub_left=False,
        scrub_right=False, **np_kw).materialize()
    nodes = _distinct_nodes(edges_ds).materialize()

    # Nodes with NO inbound edge sit at the constant teleport rank from
    # iteration 1 on (insum is identically 0), so instead of a per-
    # iteration left join onto the full node table we precompute them
    # ONCE and union a constant-rank table each round (union is free —
    # no shuffle).  One hash join + one groupby per iteration remain.
    inbound = (edges_ds.groupby("dst").count()
               .map_batches(lambda t: pa.table({
                   "node": t.column("dst"),
                   "has_in": pa.array([1] * t.num_rows, pa.int64())}),
                   batch_format="pyarrow"))
    no_in_tbl = join_datasets(nodes, inbound, on="node",
                              join_type="left_outer", scrub_left=False,
                              scrub_right=False, **np_kw) \
        .map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "rank": tp_of(t.column("node")),
            }).filter(pc.is_null(t.column("has_in"))),
            batch_format="pyarrow").materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "rank": init_of(t.column("node"))}),
        batch_format="pyarrow")

    for _ in range(iters):
        r_src = ranks.map_batches(
            lambda t: pa.table({"src": t.column("node"),
                                "rank": t.column("rank")}),
            batch_format="pyarrow")
        # r_src always comes out of a schema-rebuilding map_batches ->
        # no empty-schema blocks, no scrub barrier
        contrib = join_datasets(edges_deg, r_src, on="src",
                                scrub_left=False, scrub_right=False,
                                **np_kw) \
            .map_batches(
                lambda t: pa.table({
                    "node": t.column("dst"),
                    "c": pc.divide(t.column("rank"), t.column("deg"))}),
                batch_format="pyarrow")
        sums = contrib.groupby("node").aggregate(
            Sum("c", alias_name="insum"))
        with_in = sums.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "rank": pc.add(
                    tp_of(t.column("node")),
                    pc.divide(
                        pc.multiply(
                            pa.scalar(damping_num, pa.int64()),
                            pc.cast(t.column("insum"), pa.int64())),
                        pa.scalar(damping_den, pa.int64())))}),
            batch_format="pyarrow")
        ranks = with_in.union(no_in_tbl)
    return ranks


def sql_pagerank(edges_sql: str, iters: int = 5, scale: int = 1_000_000,
                 damping_num: int = 85, damping_den: int = 100,
                 seeds_sql: str | None = None) -> str:
    """DuckDB oracle for :func:`pagerank_int`: ``iters`` chained CTEs
    with the identical integer recurrence.  ``edges_sql`` is a SELECT
    yielding (src, dst); ``seeds_sql`` (a SELECT yielding (node))
    switches to the personalized variant — seed-only teleport, seed-
    only initial mass — mirroring the engine's ``seeds`` parameter."""
    teleport = (scale * (damping_den - damping_num)) // damping_den
    parts = [f"WITH e AS ({edges_sql}),",
             "nodes AS (SELECT src AS node FROM e UNION "
             "SELECT dst FROM e),",
             "deg AS (SELECT src, count(*)::BIGINT AS deg FROM e "
             "GROUP BY src),"]
    if seeds_sql is None:
        tp = f"{teleport}::BIGINT"
        parts.append(
            f"r0 AS (SELECT node, {scale}::BIGINT AS rank FROM nodes)")
    else:
        parts.append(f"sd AS (SELECT DISTINCT node FROM ({seeds_sql})),")
        tp = (f"(CASE WHEN n.node IN (SELECT node FROM sd) "
              f"THEN {teleport} ELSE 0 END)::BIGINT")
        parts.append(
            f"r0 AS (SELECT n.node, "
            f"(CASE WHEN n.node IN (SELECT node FROM sd) "
            f"THEN {scale} ELSE 0 END)::BIGINT AS rank FROM nodes n)")
    for i in range(1, iters + 1):
        parts.append(f""",
r{i} AS (
  SELECT n.node,
         ({tp}
          + ({damping_num}::BIGINT * COALESCE(s.insum, 0))
            // {damping_den})::BIGINT AS rank
  FROM nodes n LEFT JOIN (
      SELECT e.dst AS node, SUM(p.rank // d.deg)::BIGINT AS insum
      FROM e JOIN r{i - 1} p ON e.src = p.node
             JOIN deg d ON e.src = d.src
      GROUP BY e.dst) s ON n.node = s.node
)""")
    parts.append(f"\nSELECT node, rank FROM r{iters}")
    return "".join(parts)


_TRI_DRIVER_CAP = 2_000_000
_EMPTY_SET: frozenset = frozenset()


def triangle_count(edges_ds, num_partitions: int | None = None,
                   driver_cap: int = _TRI_DRIVER_CAP):
    """Undirected triangle count over an edge-list Dataset(src, dst);
    returns a one-row pa.Table ``{n_triangles: int64}``.

    Degree-ordered orientation (the "compact-forward" scheme): the
    edge set is canonicalized to distinct undirected pairs (self-loops
    and reverse/parallel duplicates dropped), then each edge {u, v} is
    directed from the endpoint that is smaller in the (degree, node)
    total order. Every triangle is counted exactly once — as the wedge
    (a→b, a→c) closed by the oriented edge b→c — and, crucially for
    scale, every out-neighborhood is O(sqrt(m)) even on hub-skewed
    graphs, so the quadratic wedge self-join never explodes on a hot
    node: a celebrity node with 10^6 undirected neighbors keeps only
    the (rare) higher-degree ones as OUT-edges. Partitioning: the
    wedge join is keyed on the wedge center, the closing join on the
    composite (b, c) key — both plain hash shuffles.

    DuckDB oracle: :func:`sql_triangles` (orientation-free triple
    self-join — an intentionally different algorithm, same count).
    """
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    _S = "\x1f"

    def canon(t: pa.Table) -> pa.Table:
        src = pc.cast(t.column("src"), pa.string())
        dst = pc.cast(t.column("dst"), pa.string())
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        lo = pc.if_else(pc.less(src, dst), src, dst)
        hi = pc.if_else(pc.less(src, dst), dst, src)
        return pa.table({"a": lo, "b": hi,
                         "__k": pc.binary_join_element_wise(lo, hi, _S)})

    und = (edges_ds.map_batches(canon, batch_format="pyarrow")
           .groupby("__k").aggregate(Min("a", alias_name="a"),
                                     Min("b", alias_name="b"))
           .map_batches(lambda t: t.select(["a", "b"]),
                        batch_format="pyarrow"))
    und = und.materialize()
    n_und = und.count()
    if n_und == 0:  # Ray 2.49 hash joins crash on empty sides
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    und = drop_empty_blocks(und)

    if n_und <= driver_cap:
        # small-graph fast path: the distributed version pays four
        # hash shuffles of fixed multi-second cost; under the cap the
        # same compact-forward count runs on the collected pair list
        # (measured 16.4 s -> ~4 s at sf0.01, same count)
        import ray

        parts = []
        for p in ray.get(und.to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["a", "b"]))
        t = pa.concat_tables(parts).combine_chunks()
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.concatenate([a, b]),
                              return_inverse=True)
        ai, bi = inv[:len(a)], inv[len(a):]
        d = np.bincount(ai, minlength=len(uniq)) \
            + np.bincount(bi, minlength=len(uniq))
        # orient each {u, v} from the (degree, node-code)-smaller end
        a_first = (d[ai] < d[bi]) | ((d[ai] == d[bi]) & (ai < bi))
        u = np.where(a_first, ai, bi)
        v = np.where(a_first, bi, ai)
        out: dict[int, set] = {}
        for uu, vv in zip(u.tolist(), v.tolist()):
            out.setdefault(uu, set()).add(vv)
        n_tri = 0
        for uu, nbrs in out.items():
            for vv in nbrs:
                n_tri += len(nbrs & out.get(vv, _EMPTY_SET))
        # each triangle counted once: wedge (u->v1, u->v2) closed by
        # the oriented v1->v2 edge — v2 in out[v1] checks exactly that
        return pa.table({"n_triangles": pa.array([n_tri], pa.int64())})

    # degree per node: partial per-batch counts, one slim shuffle
    def node_partials(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t.column("a").combine_chunks(),
                                 t.column("b").combine_chunks()])
        vc = both.value_counts()
        return pa.table({"node": vc.field("values"),
                         "dp": pc.cast(vc.field("counts"), pa.int64())})

    deg = (und.map_batches(node_partials, batch_format="pyarrow")
           .groupby("node").sum("dp").rename_columns({"sum(dp)": "d"}))
    deg = drop_empty_blocks(deg.materialize())

    wa = join_datasets(und, deg, on="a", right_on="node",
                       scrub_left=False, scrub_right=False) \
        .map_batches(lambda t: pa.table(
            {"a": t.column("a"), "b": t.column("b"),
             "da": t.column("d")}), batch_format="pyarrow")
    # wa descends from a join: empty hash partitions emit zero-row
    # EMPTY-SCHEMA blocks, and map_batches passes zero-row blocks
    # through UNTOUCHED — scrub before the next join (sharp edge
    # documented in BENCH/NOTES.md)
    wab = join_datasets(wa, deg, on="b", right_on="node",
                        scrub_left=True, scrub_right=False)

    def orient(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        da, db = t.column("da"), t.column("d")
        a_first = pc.or_(pc.less(da, db),
                         pc.and_(pc.equal(da, db), pc.less(a, b)))
        return pa.table({
            "u": pc.if_else(a_first, a, b),
            "v": pc.if_else(a_first, b, a),
            "dv": pc.if_else(a_first, db, da)})

    ori = drop_empty_blocks(
        wab.map_batches(orient, batch_format="pyarrow").materialize())

    # wedges centered on u: out-neighbor pairs ordered by (deg, node)
    left = ori.map_batches(lambda t: pa.table(
        {"u": t.column("u"), "v1": t.column("v"), "dv1": t.column("dv")}),
        batch_format="pyarrow")
    right = ori.map_batches(lambda t: pa.table(
        {"u": t.column("u"), "v2": t.column("v"), "dv2": t.column("dv")}),
        batch_format="pyarrow")
    wedges = join_datasets(left, right, on="u",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False)

    def wedge_keys(t: pa.Table) -> pa.Table:
        lt = pc.or_(pc.less(t.column("dv1"), t.column("dv2")),
                    pc.and_(pc.equal(t.column("dv1"), t.column("dv2")),
                            pc.less(t.column("v1"), t.column("v2"))))
        t = t.filter(lt)
        return pa.table({"__ek": pc.binary_join_element_wise(
            t.column("v1"), t.column("v2"), _S)})

    # the lt filter can empty EVERY cand block (any wedge-free graph,
    # e.g. a 2-edge path): an all-zero-row side crashes the hash join
    # (the Ray 2.49 sharp edge) — and an empty cand means 0 triangles
    cand = wedges.map_batches(wedge_keys,
                              batch_format="pyarrow").materialize()
    if cand.count() == 0:
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    cand = drop_empty_blocks(cand)
    ekeys = ori.map_batches(lambda t: pa.table(
        {"__ek": pc.binary_join_element_wise(
            t.column("u"), t.column("v"), _S)}), batch_format="pyarrow")
    closed = join_datasets(cand, ekeys, on="__ek",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False)
    return pa.table({"n_triangles": pa.array([closed.count()], pa.int64())})


def sql_triangles(edges_sql: str, lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`triangle_count`: canonicalize to the
    distinct undirected pair set, then the classic a<b<c triple
    self-join — no degree orientation, deliberately a different
    algorithm than the Ray side. ``edges_sql`` yields (src, dst);
    pass ``lead=","`` to append to an existing WITH chain."""
    return f"""{lead} __und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) __e WHERE src <> dst
)
SELECT count(*) AS n_triangles FROM __und e1
JOIN __und e2 ON e1.a = e2.a AND e1.b < e2.b
JOIN __und e3 ON e3.a = e1.b AND e3.b = e2.b"""


def bfs_depths(edges_ds, seeds_ds, max_depth: int = 32,
               num_partitions: int | None = None):
    """Multi-source BFS: minimum hop distance from any seed, as a
    Dataset(node, depth). Seeds are depth 0; unreachable nodes absent.

    Complements :func:`relational.dereference` (reachable SET from a
    driver-side seed list): here the seeds are themselves a Dataset
    (no driver materialization — the seed set may be query-derived and
    huge), and the output carries the min depth label. Each round is
    ONE hash join (frontier ⋈ edges on src) + ONE groupby-Min: the
    round-d hop candidates are tagged depth d, unioned with the
    visited table (union is free — no shuffle) and reduced by
    ``groupby(node).Min(depth)``; rows whose min depth == d are
    exactly the newly-reached nodes and become the next frontier
    (semi-naive — re-reached old nodes keep their smaller depth and
    drop out). Cycles terminate naturally; per-round join work is
    proportional to the frontier, not the graph. ``max_depth`` only
    guards pathological diameters.

    DuckDB oracle: :func:`sql_bfs_depths` (depth-bounded recursive CTE
    + GROUP BY min — a different formulation, same table).
    """
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    def with_depth(ds, d: int):
        return ds.map_batches(lambda t: pa.table(
            {"node": pc.cast(t.column("node"), pa.string()),
             "depth": pa.array([d] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")

    def min_depth(ds):
        return drop_empty_blocks(
            ds.groupby("node").aggregate(Min("depth", alias_name="depth"))
            .map_batches(lambda t: t.select(["node", "depth"]),
                         batch_format="pyarrow").materialize())

    visited = min_depth(with_depth(seeds_ds, 0))
    frontier = visited
    if visited.count() == 0:
        return visited
    edges = drop_empty_blocks(edges_ds.map_batches(
        lambda t: pa.table({"src": pc.cast(t.column("src"), pa.string()),
                            "dst": pc.cast(t.column("dst"), pa.string())}),
        batch_format="pyarrow").materialize())
    if edges.count() == 0:
        return visited
    for d in range(1, max_depth + 1):
        hop = join_datasets(
            frontier.map_batches(lambda t: t.select(["node"]),
                                 batch_format="pyarrow"),
            edges, on="node", right_on="src",
            num_partitions=num_partitions,
            scrub_left=False, scrub_right=False) \
            .map_batches(lambda t: pa.table({"node": t.column("dst")}),
                         batch_format="pyarrow")
        visited = min_depth(visited.union(with_depth(hop, d)))
        frontier = drop_empty_blocks(visited.map_batches(
            lambda t, dd=d: t.filter(pc.equal(t.column("depth"), dd)),
            batch_format="pyarrow").materialize())
        if frontier.count() == 0:
            return visited
    return visited


def sql_bfs_depths(edges_sql: str, seeds_sql: str,
                   max_depth: int = 32,
                   lead: str = "WITH RECURSIVE") -> str:
    """DuckDB oracle for :func:`bfs_depths`: a depth-bounded recursive
    CTE enumerating (node, depth) pairs (UNION set semantics bounds
    the recursion), reduced by GROUP BY min. ``edges_sql`` yields
    (src, dst); ``seeds_sql`` yields (node); pass ``lead=","`` to
    append to an existing WITH RECURSIVE chain."""
    return f"""{lead} __bfs(node, d) AS (
  SELECT DISTINCT CAST(node AS VARCHAR), 0 FROM ({seeds_sql}) __s
  UNION
  SELECT CAST(e.dst AS VARCHAR), b.d + 1
  FROM __bfs b JOIN ({edges_sql}) e ON CAST(e.src AS VARCHAR) = b.node
  WHERE b.d < {max_depth}
)
SELECT node, min(d) AS depth FROM __bfs GROUP BY node"""


def sssp_int(edges_ds, seeds_ds, max_hops: int = 12,
             num_partitions: int | None = None):
    """Weighted shortest paths from a seed SET (semi-naive
    Bellman-Ford): Dataset(node, dist) with the exact minimum integer
    cost over walks of at most ``max_hops`` edges — which IS the true
    shortest-path cost once an iteration improves nothing (standard
    Bellman-Ford convergence), and the engine stops right there.
    Edges carry a non-negative int64 ``w``; seeds are dist 0.

    Same per-round shape as :func:`bfs_depths` — ONE hash join
    (frontier ⋈ edges on src) + ONE groupby-Min — plus one left join
    against the previous distances to find the IMPROVED nodes (the
    weighted case can re-relax an already-visited node, so "new this
    round" is dist-based, not round-tagged).  Per-round work is
    proportional to the frontier; cycles terminate because a cycle of
    non-negative weight never improves a distance.

    DuckDB oracle: :func:`sql_sssp` (hop-bounded recursive CTE with
    UNION set semantics, reduced by GROUP BY min).
    """
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    def min_dist(ds):
        return drop_empty_blocks(
            ds.groupby("node").aggregate(Min("dist", alias_name="dist"))
            .map_batches(lambda t: t.select(["node", "dist"]),
                         batch_format="pyarrow").materialize())

    visited = min_dist(seeds_ds.map_batches(
        lambda t: pa.table({
            "node": pc.cast(t.column("node"), pa.string()),
            "dist": pa.array([0] * t.num_rows, pa.int64())}),
        batch_format="pyarrow"))
    frontier = visited
    if visited.count() == 0:
        return visited
    edges = drop_empty_blocks(edges_ds.map_batches(
        lambda t: pa.table({"src": pc.cast(t.column("src"), pa.string()),
                            "dst": pc.cast(t.column("dst"), pa.string()),
                            "w": pc.cast(t.column("w"), pa.int64())}),
        batch_format="pyarrow").materialize())
    if edges.count() == 0:
        return visited
    for _ in range(max_hops):
        cand = join_datasets(
            frontier, edges, on="node", right_on="src",
            num_partitions=num_partitions,
            scrub_left=False, scrub_right=False) \
            .map_batches(lambda t: pa.table({
                "node": t.column("dst"),
                "dist": pc.add(t.column("dist"), t.column("w"))}),
                batch_format="pyarrow")
        new_visited = min_dist(visited.union(cand))
        old = visited.map_batches(
            lambda t: t.rename_columns(["node", "old"]),
            batch_format="pyarrow")
        j = join_datasets(new_visited, old, on="node",
                          join_type="left_outer",
                          num_partitions=num_partitions,
                          scrub_left=True, scrub_right=True)
        frontier = drop_empty_blocks(j.map_batches(
            lambda t: t.filter(pc.or_(
                pc.is_null(t.column("old")),
                pc.less(t.column("dist"),
                        pc.fill_null(t.column("old"),
                                     pa.scalar(0, pa.int64())))))
            .select(["node", "dist"]),
            batch_format="pyarrow").materialize())
        visited = new_visited
        if frontier.count() == 0:
            break
    return visited


def sql_sssp(edges_sql: str, seeds_sql: str, max_hops: int = 12,
             lead: str = "WITH RECURSIVE") -> str:
    """DuckDB oracle for :func:`sssp_int`: hop-bounded recursive CTE
    over (node, dist, hops) with UNION set semantics, GROUP BY min.
    ``edges_sql`` yields (src, dst, w); ``seeds_sql`` yields (node)."""
    return f"""{lead} __sp(node, dist, h) AS (
  SELECT DISTINCT CAST(node AS VARCHAR), CAST(0 AS BIGINT), 0
  FROM ({seeds_sql}) __s
  UNION
  SELECT CAST(e.dst AS VARCHAR), p.dist + e.w, p.h + 1
  FROM __sp p JOIN ({edges_sql}) e ON CAST(e.src AS VARCHAR) = p.node
  WHERE p.h < {max_hops}
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM __sp GROUP BY node"""


def hits_int(edges_ds, iters: int = 3,
             num_partitions: int | None = None,
             driver_cap: int = 2_000_000):
    """UNNORMALIZED integer HITS (Kleinberg 1999, public algorithm):
    after ``iters`` rounds of  a_t(v) = sum_{u->v} h_{t-1}(u)  and
    h_t(u) = sum_{u->v} a_t(v)  with h_0 = 1 on every node, return
    Dataset(node, hub, auth).  Dropping the classical L2 normalization
    keeps every value an exact int64 (magnitudes grow like
    (d_in * d_out)^iters — with the default 3 rounds that is safe to
    ~10^6 mean degree product), so the chained-CTE DuckDB mirror is
    value-identical; rankings are unchanged by normalization.

    Below ``driver_cap`` edges the rounds run as numpy gathers on the
    driver (the pagerank_int economics — a distributed round is two
    hash joins + two groupbys whose fixed cost dwarfs the arithmetic
    at gate scale); above it, the same recurrence runs as Dataset
    joins, sparse within rounds (absent node == 0 contributes
    nothing) and densified once at the end.
    """
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import join_datasets

    n_edges = edges_ds.count()
    if n_edges <= driver_cap:
        import ray
        import ray.data as rd

        parts = []
        for p in ray.get(edges_ds.materialize().to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["src", "dst"]))
        if not parts:
            return rd.from_arrow(pa.table({
                "node": pa.array([], pa.string()),
                "hub": pa.array([], pa.int64()),
                "auth": pa.array([], pa.int64())}))
        t = pa.concat_tables(parts).combine_chunks()
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.concatenate([src, dst]),
                              return_inverse=True)
        s_idx, d_idx = inv[:len(src)], inv[len(src):]
        h = np.ones(len(uniq), dtype=np.int64)
        a = np.zeros(len(uniq), dtype=np.int64)
        for _ in range(iters):
            a = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(a, d_idx, h[s_idx])
            h = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(h, s_idx, a[d_idx])
        return rd.from_arrow(pa.table({
            "node": pa.array(uniq),
            "hub": pa.array(h, pa.int64()),
            "auth": pa.array(a, pa.int64())}))

    np_kw = {"num_partitions": num_partitions}
    edges = edges_ds.map_batches(
        lambda t: t.select(["src", "dst"]),
        batch_format="pyarrow").materialize()
    nodes = _distinct_nodes(edges).materialize()
    h = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "v": pa.array([1] * t.num_rows, pa.int64())}),
        batch_format="pyarrow")
    a = None
    for _ in range(iters):
        h_src = h.map_batches(
            lambda t: pa.table({"src": t.column("node"),
                                "v": t.column("v")}),
            batch_format="pyarrow")
        a = (join_datasets(edges, h_src, on="src",
                           scrub_left=False, scrub_right=False, **np_kw)
             .map_batches(lambda t: pa.table({"node": t.column("dst"),
                                              "v": t.column("v")}),
                          batch_format="pyarrow")
             .groupby("node").aggregate(Sum("v", alias_name="v"))
             .map_batches(lambda t: pa.table({
                 "node": t.column("node"),
                 "v": pc.cast(t.column("v"), pa.int64())}),
                 batch_format="pyarrow"))
        a_dst = a.map_batches(
            lambda t: pa.table({"dst": t.column("node"),
                                "v": t.column("v")}),
            batch_format="pyarrow")
        h = (join_datasets(edges, a_dst, on="dst",
                           scrub_left=False, scrub_right=False, **np_kw)
             .map_batches(lambda t: pa.table({"node": t.column("src"),
                                              "v": t.column("v")}),
                          batch_format="pyarrow")
             .groupby("node").aggregate(Sum("v", alias_name="v"))
             .map_batches(lambda t: pa.table({
                 "node": t.column("node"),
                 "v": pc.cast(t.column("v"), pa.int64())}),
                 batch_format="pyarrow"))
    h_r = h.map_batches(lambda t: t.rename_columns(["node", "hub"]),
                        batch_format="pyarrow")
    a_r = a.map_batches(lambda t: t.rename_columns(["node", "auth"]),
                        batch_format="pyarrow")
    # h_r/a_r descend from groupbys (zero-row empty-schema blocks
    # bypass the rename map) -> scrub those sides; the second join's
    # left side descends from a join, which cannot carry them
    out = join_datasets(nodes, h_r, on="node", join_type="left_outer",
                        scrub_left=False, scrub_right=True, **np_kw)
    out = join_datasets(out, a_r, on="node", join_type="left_outer",
                        scrub_left=False, scrub_right=True, **np_kw)
    return out.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "hub": pc.fill_null(pc.cast(t.column("hub"), pa.int64()), 0),
            "auth": pc.fill_null(pc.cast(t.column("auth"), pa.int64()),
                                 0)}),
        batch_format="pyarrow")


def sql_hits(edges_sql: str, iters: int = 3) -> str:
    """DuckDB oracle for :func:`hits_int` — the identical integer
    recurrence as chained CTEs."""
    parts = [f"WITH e AS ({edges_sql}),",
             "nodes AS (SELECT src AS node FROM e UNION "
             "SELECT dst FROM e),",
             "h0 AS (SELECT node, 1::BIGINT AS v FROM nodes)"]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i} AS (
  SELECT e.dst AS node, SUM(h.v)::BIGINT AS v
  FROM e JOIN h{i - 1} h ON e.src = h.node GROUP BY e.dst),
h{i} AS (
  SELECT e.src AS node, SUM(a.v)::BIGINT AS v
  FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src)""")
    parts.append(f"""
SELECT n.node,
       COALESCE(h.v, 0)::BIGINT AS hub,
       COALESCE(a.v, 0)::BIGINT AS auth
FROM nodes n
LEFT JOIN h{iters} h ON n.node = h.node
LEFT JOIN a{iters} a ON n.node = a.node""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Undirected-graph structure family: k-core peeling, local clustering
# coefficients, resource-allocation link prediction.  All three share
# the canonical distinct-undirected-pair edge representation (the
# triangle_count canonicalization) and the exact-integer conventions of
# this module: fixed round counts, int64 floor arithmetic, pinned total
# orderings — so each has a value-identical DuckDB mirror.
# ---------------------------------------------------------------------------

def _undirected_pairs(edges_ds):
    """Dataset(src, dst) -> Dataset(a, b): the DISTINCT undirected pair
    set with a < b, self-loops dropped (one slim groupby on the joined
    pair key — the triangle_count canonicalization, factored for the
    k-core / clustering / link-prediction family)."""
    from ray.data.aggregate import Min

    _S = "\x1f"

    def canon(t: pa.Table) -> pa.Table:
        src = pc.cast(t.column("src"), pa.string())
        dst = pc.cast(t.column("dst"), pa.string())
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        lo = pc.if_else(pc.less(src, dst), src, dst)
        hi = pc.if_else(pc.less(src, dst), dst, src)
        return pa.table({"a": lo, "b": hi,
                         "__k": pc.binary_join_element_wise(lo, hi, _S)})

    return (edges_ds.map_batches(canon, batch_format="pyarrow")
            .groupby("__k").aggregate(Min("a", alias_name="a"),
                                      Min("b", alias_name="b"))
            .map_batches(lambda t: t.select(["a", "b"]),
                         batch_format="pyarrow"))


def _pair_degrees(und):
    """Degree per node over an (a, b) pair Dataset: per-batch
    value-count partials, one slim (node, dp) shuffle."""
    def node_partials(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t.column("a").combine_chunks(),
                                 t.column("b").combine_chunks()])
        vc = both.value_counts()
        return pa.table({"node": vc.field("values"),
                         "dp": pc.cast(vc.field("counts"), pa.int64())})

    return (und.map_batches(node_partials, batch_format="pyarrow")
            .groupby("node").sum("dp").rename_columns({"sum(dp)": "deg"}))


def kcore_nodes(edges_ds, k: int = 2, rounds: int = 6,
                num_partitions: int | None = None,
                driver_cap: int = _TRI_DRIVER_CAP):
    """Fixed-round k-core peeling: run EXACTLY ``rounds`` rounds of
    (degree -> keep nodes with deg >= k -> drop edges touching a
    removed node) over the distinct undirected pair set, then return
    Dataset(node, deg) — the degree table of the surviving subgraph.

    A FIXED round count (not run-to-convergence) is the pinned
    contract: both engines execute the same rounds, so outputs are
    value-identical even on adversarial inputs where peeling has not
    stabilized (long path graphs); web-ish graphs stabilize in a few
    rounds, and callers size ``rounds`` to theirs.  Note the output is
    the surviving EDGE set's degree table: a node kept in the final
    round that lost all its edges to removed neighbors simply
    disappears (no zero-degree rows) — identically in the SQL mirror
    (:func:`sql_kcore`).

    Scale shape: each round is one partial-agg degree shuffle plus two
    hash semi-joins keyed on the endpoints; the edge set only shrinks,
    so round cost is monotonically decreasing.  Below ``driver_cap``
    pairs the peeling runs as numpy bincounts on the collected pair
    list (the pagerank_int driver-path economics: a distributed round
    costs three multi-second fixed-cost shuffles at gate scale).
    """
    import ray
    import ray.data as rd

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    empty = pa.table({"node": pa.array([], pa.string()),
                      "deg": pa.array([], pa.int64())})
    und = _undirected_pairs(edges_ds).materialize()
    n_und = und.count()
    if n_und == 0:
        return rd.from_arrow(empty)
    und = drop_empty_blocks(und)

    if n_und <= driver_cap:
        parts = []
        for p in ray.get(und.to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["a", "b"]))
        t = pa.concat_tables(parts).combine_chunks()
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.concatenate([a, b]),
                              return_inverse=True)
        ai, bi = inv[:len(a)], inv[len(a):]
        alive = np.ones(len(ai), dtype=bool)
        for _ in range(rounds):
            deg = (np.bincount(ai[alive], minlength=len(uniq))
                   + np.bincount(bi[alive], minlength=len(uniq)))
            keep = deg >= k
            alive &= keep[ai] & keep[bi]
        deg = (np.bincount(ai[alive], minlength=len(uniq))
               + np.bincount(bi[alive], minlength=len(uniq))
               ).astype(np.int64)
        m = deg > 0
        if not m.any():
            return rd.from_arrow(empty)
        return rd.from_arrow(pa.table({
            "node": pa.array(uniq[m]),
            "deg": pa.array(deg[m], pa.int64())}))

    edges = und
    for _ in range(rounds):
        deg = _pair_degrees(edges)
        keep = deg.map_batches(
            lambda t: pa.table({"node": t.column("node").filter(
                pc.greater_equal(t.column("deg"),
                                 pa.scalar(k, pa.int64())))}),
            batch_format="pyarrow")
        # keep descends from a groupby (and the deg>=k filter can empty
        # every block): scrub + emptiness guard before joining
        keep = keep.materialize()
        if keep.count() == 0:
            return rd.from_arrow(empty)
        keep = drop_empty_blocks(keep)
        edges = join_datasets(edges, keep, on="a", right_on="node",
                              num_partitions=num_partitions,
                              scrub_left=False, scrub_right=False)
        # first join's output feeds the second: scrub_left per the
        # join-descended-side rule (BENCH/NOTES.md)
        edges = join_datasets(edges, keep, on="b", right_on="node",
                              num_partitions=num_partitions,
                              scrub_left=True, scrub_right=False)
        edges = edges.map_batches(lambda t: t.select(["a", "b"]),
                                  batch_format="pyarrow").materialize()
        if edges.count() == 0:
            return rd.from_arrow(empty)
        edges = drop_empty_blocks(edges)
    out = _pair_degrees(edges)
    return out.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "deg": pc.cast(t.column("deg"), pa.int64())}),
        batch_format="pyarrow")


def sql_kcore(edges_sql: str, k: int = 2, rounds: int = 6,
              lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`kcore_nodes`: the identical fixed-round
    peeling as chained CTEs (round i: degree over e{i-1}, keep deg>=k,
    filter both endpoints)."""
    # every __e{i} is referenced 3x by round i+1: without MATERIALIZED
    # DuckDB inlines CTEs and the reference tree back to the base scan
    # grows 3^rounds (measured: file-handle exhaustion at 6 rounds)
    parts = [f"""{lead} __und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) __e WHERE src <> dst
),
__e0 AS MATERIALIZED (SELECT a, b FROM __und)"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
__k{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT a AS node FROM __e{i - 1}
    UNION ALL SELECT b FROM __e{i - 1}) __n
  GROUP BY node HAVING COUNT(*) >= {k}),
__e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM __e{i - 1} e
  JOIN __k{i} x ON e.a = x.node
  JOIN __k{i} y ON e.b = y.node)""")
    parts.append(f"""
SELECT node, COUNT(*)::BIGINT AS deg FROM (
  SELECT a AS node FROM __e{rounds}
  UNION ALL SELECT b FROM __e{rounds}) __f
GROUP BY node""")
    return "".join(parts)


def clustering_coef(edges_ds, scale: int = 1000,
                    num_partitions: int | None = None,
                    driver_cap: int = _TRI_DRIVER_CAP):
    """Local clustering coefficient per node, exact-integer permille:
    Dataset(node, deg, tri, cc_permille) for every node with deg >= 2,
    where ``tri`` is the number of triangles through the node and

        cc_permille = (2 * tri * scale) // (deg * (deg - 1))

    (int64 floor division — ``scale * deg^2`` must fit int64, fine to
    ~10^7-degree hubs at the default scale).  Triangles are found by
    the same degree-ordered compact-forward scheme as
    :func:`triangle_count` (every out-neighborhood O(sqrt(m)) even on
    hub-skewed graphs), but each closed wedge credits all THREE of its
    nodes; the per-node tally is a flat-map to 3 rows + one partial-agg
    shuffle.  DuckDB oracle :func:`sql_clustering_coef` uses the
    orientation-free triple self-join — a different algorithm, the
    same integer outputs.
    """
    import ray
    import ray.data as rd

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    _S = "\x1f"
    empty = pa.table({"node": pa.array([], pa.string()),
                      "deg": pa.array([], pa.int64()),
                      "tri": pa.array([], pa.int64()),
                      "cc_permille": pa.array([], pa.int64())})
    und = _undirected_pairs(edges_ds).materialize()
    n_und = und.count()
    if n_und == 0:
        return rd.from_arrow(empty)
    und = drop_empty_blocks(und)

    if n_und <= driver_cap:
        parts = []
        for p in ray.get(und.to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["a", "b"]))
        t = pa.concat_tables(parts).combine_chunks()
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.concatenate([a, b]),
                              return_inverse=True)
        ai, bi = inv[:len(a)], inv[len(a):]
        deg = (np.bincount(ai, minlength=len(uniq))
               + np.bincount(bi, minlength=len(uniq))).astype(np.int64)
        a_first = (deg[ai] < deg[bi]) | ((deg[ai] == deg[bi]) & (ai < bi))
        u = np.where(a_first, ai, bi)
        v = np.where(a_first, bi, ai)
        out: dict[int, set] = {}
        for uu, vv in zip(u.tolist(), v.tolist()):
            out.setdefault(uu, set()).add(vv)
        tri = np.zeros(len(uniq), dtype=np.int64)
        for uu, nbrs in out.items():
            for vv in nbrs:
                common = nbrs & out.get(vv, _EMPTY_SET)
                if common:
                    c = len(common)
                    tri[uu] += c
                    tri[vv] += c
                    for ww in common:
                        tri[ww] += 1
        m = deg >= 2
        if not m.any():
            return rd.from_arrow(empty)
        d, tr = deg[m], tri[m]
        return rd.from_arrow(pa.table({
            "node": pa.array(uniq[m]),
            "deg": pa.array(d, pa.int64()),
            "tri": pa.array(tr, pa.int64()),
            "cc_permille": pa.array(
                (2 * tr * scale) // (d * (d - 1)), pa.int64())}))

    deg = drop_empty_blocks(_pair_degrees(und).materialize())

    wa = join_datasets(und, deg, on="a", right_on="node",
                       num_partitions=num_partitions,
                       scrub_left=False, scrub_right=False) \
        .map_batches(lambda t: pa.table(
            {"a": t.column("a"), "b": t.column("b"),
             "da": t.column("deg")}), batch_format="pyarrow")
    wab = join_datasets(wa, deg, on="b", right_on="node",
                        num_partitions=num_partitions,
                        scrub_left=True, scrub_right=False)

    def orient(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        da, db = t.column("da"), t.column("deg")
        a_first = pc.or_(pc.less(da, db),
                         pc.and_(pc.equal(da, db), pc.less(a, b)))
        return pa.table({
            "u": pc.if_else(a_first, a, b),
            "v": pc.if_else(a_first, b, a),
            "dv": pc.if_else(a_first, db, da)})

    ori = drop_empty_blocks(
        wab.map_batches(orient, batch_format="pyarrow").materialize())

    left = ori.map_batches(lambda t: pa.table(
        {"u": t.column("u"), "v1": t.column("v"), "dv1": t.column("dv")}),
        batch_format="pyarrow")
    right = ori.map_batches(lambda t: pa.table(
        {"u": t.column("u"), "v2": t.column("v"), "dv2": t.column("dv")}),
        batch_format="pyarrow")
    wedges = join_datasets(left, right, on="u",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False)

    def wedge_rows(t: pa.Table) -> pa.Table:
        lt = pc.or_(pc.less(t.column("dv1"), t.column("dv2")),
                    pc.and_(pc.equal(t.column("dv1"), t.column("dv2")),
                            pc.less(t.column("v1"), t.column("v2"))))
        t = t.filter(lt)
        return pa.table({
            "u": t.column("u"), "v1": t.column("v1"),
            "v2": t.column("v2"),
            "__ek": pc.binary_join_element_wise(
                t.column("v1"), t.column("v2"), _S)})

    def zero_out():
        # no closed wedges: every node's tri is 0, cc_permille is 0
        def f(t: pa.Table) -> pa.Table:
            d = pc.cast(t.column("deg"), pa.int64())
            kept = t.filter(pc.greater_equal(d, pa.scalar(2, pa.int64())))
            zeros = pa.array([0] * kept.num_rows, pa.int64())
            return pa.table({
                "node": kept.column("node"),
                "deg": pc.cast(kept.column("deg"), pa.int64()),
                "tri": zeros, "cc_permille": zeros})
        return deg.map_batches(f, batch_format="pyarrow")

    cand = wedges.map_batches(wedge_rows,
                              batch_format="pyarrow").materialize()
    if cand.count() == 0:
        return zero_out()
    cand = drop_empty_blocks(cand)
    ekeys = ori.map_batches(lambda t: pa.table(
        {"__ek": pc.binary_join_element_wise(
            t.column("u"), t.column("v"), _S)}), batch_format="pyarrow")
    closed = join_datasets(cand, ekeys, on="__ek",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False) \
        .materialize()
    if closed.count() == 0:
        return zero_out()
    closed = drop_empty_blocks(closed)

    def tri_partials(t: pa.Table) -> pa.Table:
        all3 = pa.concat_arrays([t.column("u").combine_chunks(),
                                 t.column("v1").combine_chunks(),
                                 t.column("v2").combine_chunks()])
        vc = all3.value_counts()
        return pa.table({"node": vc.field("values"),
                         "tp": pc.cast(vc.field("counts"), pa.int64())})

    tpn = (closed.map_batches(tri_partials, batch_format="pyarrow")
           .groupby("node").sum("tp").rename_columns({"sum(tp)": "tri"}))
    tpn = drop_empty_blocks(tpn.materialize())

    out = join_datasets(deg, tpn, on="node", join_type="left_outer",
                        num_partitions=num_partitions,
                        scrub_left=False, scrub_right=False)

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("deg"), pa.int64())
        m = pc.greater_equal(d, pa.scalar(2, pa.int64()))
        t = t.filter(m)
        d = pc.cast(t.column("deg"), pa.int64())
        tr = pc.fill_null(pc.cast(t.column("tri"), pa.int64()), 0)
        den = pc.multiply(d, pc.subtract(d, pa.scalar(1, pa.int64())))
        num = pc.multiply(tr, pa.scalar(2 * scale, pa.int64()))
        return pa.table({"node": t.column("node"), "deg": d, "tri": tr,
                         "cc_permille": pc.divide(num, den)})

    return out.map_batches(finish, batch_format="pyarrow")


def sql_clustering_coef(edges_sql: str, scale: int = 1000,
                        lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`clustering_coef`: orientation-free
    a<b<c triple self-join for the triangle list, 3-way unnest for the
    per-node tally, the identical integer permille."""
    return f"""{lead} __und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) __e WHERE src <> dst
),
__deg AS (
  SELECT node, COUNT(*)::BIGINT AS deg FROM (
    SELECT a AS node FROM __und UNION ALL SELECT b FROM __und) __n
  GROUP BY node),
__tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM __und e1
  JOIN __und e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN __und e3 ON e3.a = e1.b AND e3.b = e2.b),
__tpn AS (
  SELECT node, COUNT(*)::BIGINT AS tri FROM (
    SELECT x AS node FROM __tris
    UNION ALL SELECT y FROM __tris
    UNION ALL SELECT z FROM __tris) __t
  GROUP BY node)
SELECT d.node, d.deg, COALESCE(t.tri, 0)::BIGINT AS tri,
       ((2 * COALESCE(t.tri, 0) * {scale})
        // (d.deg * (d.deg - 1)))::BIGINT AS cc_permille
FROM __deg d LEFT JOIN __tpn t ON d.node = t.node
WHERE d.deg >= 2"""


def ra_link_pred(edges_ds, topk: int = 20, scale: int = 1_000_000,
                 center_cap: int = 100_000,
                 num_partitions: int | None = None,
                 driver_cap: int = _TRI_DRIVER_CAP):
    """Resource-Allocation link prediction (Zhou/Lu/Zhang 2009, the
    integer-exact cousin of Adamic-Adar): for every NON-adjacent node
    pair {u, v} at distance 2, count common neighbors and score

        ra_score(u, v) = sum over common neighbors w of scale // deg(w)

    (int64 floor division — order-independent, so value-identical to
    the SQL mirror :func:`sql_ra_link_pred`).  Returns the top
    ``topk`` pairs as a driver-sized pa.Table(u, v, common, ra_score),
    ordered by (ra_score DESC, u, v) — a total order, so the cutoff is
    unambiguous on both engines.

    Skew guard: a wedge center of degree d contributes d^2 pairs, so
    hub centers explode quadratically; centers with degree >
    ``center_cap`` are SKIPPED on BOTH engines (the standard candidate-
    generation cap — a hub shared by everyone carries no signal, the
    same reasoning as the dedup family's df prefix cuts).  The wedge
    join is keyed on the center; pair aggregation pre-reduces per batch
    on the composite key before its one slim shuffle.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    _S = "\x1f"
    empty = pa.table({"u": pa.array([], pa.string()),
                      "v": pa.array([], pa.string()),
                      "common": pa.array([], pa.int64()),
                      "ra_score": pa.array([], pa.int64())})
    und = _undirected_pairs(edges_ds).materialize()
    n_und = und.count()
    if n_und == 0:
        return empty
    und = drop_empty_blocks(und)

    if n_und <= driver_cap:
        parts = []
        for p in ray.get(und.to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["a", "b"]))
        t = pa.concat_tables(parts).combine_chunks()
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(np.concatenate([a, b]),
                              return_inverse=True)
        ai, bi = inv[:len(a)], inv[len(a):]
        deg = (np.bincount(ai, minlength=len(uniq))
               + np.bincount(bi, minlength=len(uniq))).astype(np.int64)
        nbrs: dict[int, list] = {}
        for x, y in zip(ai.tolist(), bi.tolist()):
            nbrs.setdefault(x, []).append(y)
            nbrs.setdefault(y, []).append(x)
        edge_set = set(zip(ai.tolist(), bi.tolist()))
        common: dict[tuple, int] = {}
        ra: dict[tuple, int] = {}
        for w, nb in nbrs.items():
            d = deg[w]
            if d < 2 or d > center_cap:
                continue
            contrib = int(scale // d)
            nb = sorted(nb)
            for i in range(len(nb) - 1):
                ui = nb[i]
                for vj in nb[i + 1:]:
                    key = (ui, vj)
                    common[key] = common.get(key, 0) + 1
                    ra[key] = ra.get(key, 0) + contrib
        cands = [(uniq[p[0]], uniq[p[1]], c, ra[p])
                 for p, c in common.items() if p not in edge_set]
        cands.sort(key=lambda r: (-r[3], r[0], r[1]))
        cands = cands[:topk]
        if not cands:
            return empty
        return pa.table({
            "u": pa.array([r[0] for r in cands]),
            "v": pa.array([r[1] for r in cands]),
            "common": pa.array([r[2] for r in cands], pa.int64()),
            "ra_score": pa.array([r[3] for r in cands], pa.int64())})

    deg = drop_empty_blocks(_pair_degrees(und).materialize())

    # bidirectional (center, neighbor) incidence joined with the
    # center's degree, hub centers cut
    bi = und.map_batches(lambda t: pa.table({
        "s": pa.concat_arrays([t.column("a").combine_chunks(),
                               t.column("b").combine_chunks()]),
        "t": pa.concat_arrays([t.column("b").combine_chunks(),
                               t.column("a").combine_chunks()])}),
        batch_format="pyarrow")
    bid = join_datasets(bi, deg, on="s", right_on="node",
                        num_partitions=num_partitions,
                        scrub_left=False, scrub_right=False) \
        .map_batches(lambda t: (lambda m: pa.table({
            "s": t.column("s").filter(m), "t": t.column("t").filter(m),
            "deg": pc.cast(t.column("deg").filter(m), pa.int64())}))(
            pc.and_(pc.greater_equal(pc.cast(t.column("deg"), pa.int64()),
                                     pa.scalar(2, pa.int64())),
                    pc.less_equal(pc.cast(t.column("deg"), pa.int64()),
                                  pa.scalar(center_cap, pa.int64())))),
            batch_format="pyarrow")
    bid = bid.materialize()
    if bid.count() == 0:
        return empty
    bid = drop_empty_blocks(bid)
    left = bid.map_batches(lambda t: pa.table(
        {"s": t.column("s"), "t1": t.column("t"), "deg": t.column("deg")}),
        batch_format="pyarrow")
    right = bid.map_batches(lambda t: pa.table(
        {"s": t.column("s"), "t2": t.column("t")}),
        batch_format="pyarrow")
    wedges = join_datasets(left, right, on="s",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False)

    def pair_partials(t: pa.Table) -> pa.Table:
        m = pc.less(t.column("t1"), t.column("t2"))
        t = t.filter(m)
        if t.num_rows == 0:
            return pa.table({"__k": pa.array([], pa.string()),
                             "cp": pa.array([], pa.int64()),
                             "rp": pa.array([], pa.int64())})
        key = pc.binary_join_element_wise(
            t.column("t1"), t.column("t2"), _S).combine_chunks()
        contrib = pc.divide(pa.scalar(scale, pa.int64()),
                            pc.cast(t.column("deg"), pa.int64()))
        enc = pc.dictionary_encode(key)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnp = contrib.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(contrib, pa.ChunkedArray) \
            else contrib.to_numpy(zero_copy_only=False)
        n = len(enc.dictionary)
        cp = np.bincount(codes, minlength=n).astype(np.int64)
        # int64-exact partial sums (bincount's weights= path is float64)
        rp = np.zeros(n, dtype=np.int64)
        np.add.at(rp, codes, cnp.astype(np.int64))
        return pa.table({"__k": enc.dictionary,
                         "cp": pa.array(cp, pa.int64()),
                         "rp": pa.array(rp, pa.int64())})

    sc = (wedges.map_batches(pair_partials, batch_format="pyarrow")
          .groupby("__k").aggregate(Sum("cp", alias_name="common"),
                                    Sum("rp", alias_name="ra_score")))
    sc = sc.materialize()
    if sc.count() == 0:
        return empty
    sc = drop_empty_blocks(sc)
    ekeys = und.map_batches(lambda t: pa.table(
        {"__k": pc.binary_join_element_wise(
            t.column("a"), t.column("b"), _S),
         "__adj": pa.array([1] * t.num_rows, pa.int64())}),
        batch_format="pyarrow")
    out = join_datasets(sc, ekeys, on="__k", join_type="left_outer",
                        num_partitions=num_partitions,
                        scrub_left=False, scrub_right=False)
    # join output feeds a SORT shuffle: scrub the empty-schema blocks
    # an empty hash partition can emit (BENCH/NOTES.md sharp edge)
    out = drop_empty_blocks(out.materialize())

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("__adj")))
        key = t.column("__k").combine_chunks() \
            if isinstance(t.column("__k"), pa.ChunkedArray) \
            else t.column("__k")
        split = pc.split_pattern(key, _S)
        return pa.table({
            "u": pc.list_element(split, 0),
            "v": pc.list_element(split, 1),
            "common": pc.cast(t.column("common"), pa.int64()),
            "ra_score": pc.cast(t.column("ra_score"), pa.int64())})

    ranked = (out.map_batches(finish, batch_format="pyarrow")
              .sort(["ra_score", "u", "v"],
                    descending=[True, False, False])
              .limit(topk))
    rows = ranked.take_all()
    if not rows:
        return empty
    return pa.table({
        "u": pa.array([r["u"] for r in rows]),
        "v": pa.array([r["v"] for r in rows]),
        "common": pa.array([r["common"] for r in rows], pa.int64()),
        "ra_score": pa.array([r["ra_score"] for r in rows], pa.int64())})


def sql_ra_link_pred(edges_sql: str, topk: int = 20,
                     scale: int = 1_000_000, center_cap: int = 100_000,
                     lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`ra_link_pred`: bidirectional incidence,
    wedge self-join on the center (same degree window), NOT EXISTS
    adjacency cut, the identical integer RA sum and total order."""
    return f"""{lead} __und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) __e WHERE src <> dst
),
__bi AS MATERIALIZED (SELECT a AS s, b AS t FROM __und
         UNION ALL SELECT b, a FROM __und),
__degc AS (SELECT s AS node, COUNT(*)::BIGINT AS deg
           FROM __bi GROUP BY s),
__w AS (
  SELECT b1.t AS u, b2.t AS v, d.deg AS deg
  FROM __bi b1
  JOIN __bi b2 ON b1.s = b2.s AND b1.t < b2.t
  JOIN __degc d ON d.node = b1.s
  WHERE d.deg >= 2 AND d.deg <= {center_cap}),
__sc AS (
  SELECT u, v, COUNT(*)::BIGINT AS common,
         SUM({scale} // deg)::BIGINT AS ra_score
  FROM __w GROUP BY u, v)
SELECT u, v, common, ra_score FROM __sc
WHERE NOT EXISTS (SELECT 1 FROM __und e
                  WHERE e.a = __sc.u AND e.b = __sc.v)
ORDER BY ra_score DESC, u, v LIMIT {topk}"""


def _node_hash(arr):
    """Pinned 32-bit string hash of node IRIs (the textstats rolling
    codepoint hash, SQL-mirrored by sql_token_hash_expr)."""
    from k_gap_ray.functions.textstats import H1_BASE, H1_MOD, hash_tokens

    return hash_tokens(arr, H1_BASE, H1_MOD).astype(np.int64)


def _walk_key(hv: np.ndarray, step: int, hw: np.ndarray,
              seed: int) -> np.ndarray:
    """Per-candidate selection key: combine (current node, step,
    neighbor) into the 31-bit domain, then the seeded shuffle mix.
    Every intermediate stays < 2**62 (hv < 2**32, so hv*131 < 2**39)
    — the DuckDB mirror runs the identical expression tree with no
    BIGINT overflow."""
    from k_gap_ray.functions.shuffle import _M, _mix

    c = (hv * 131 + step * 7919 + hw) % _M
    return _mix(c, seed)


def deterministic_walks(edges_ds, seeds_ds, steps: int = 5,
                        seed: int = 0,
                        num_partitions: int | None = None,
                        driver_cap: int = _TRI_DRIVER_CAP):
    """Deterministic 'random' walks over a directed edge list — the
    graph-sampling primitive (node2vec/DeepWalk-style corpus walks)
    made REPRODUCIBLE: from each seed node, at step i the walk moves
    to the out-neighbor w minimizing the seeded integer key

        key = mix31((h(v) * 131 + i * 7919 + h(w)) % 2^31, seed)

    with ties broken by lexicographically smallest w — a pure function
    of (graph, seeds, steps, seed), so two engines (or two cluster
    sizes) produce bit-identical trajectories, and the DuckDB mirror
    (:func:`sql_deterministic_walks`) value-matches.  h is the pinned
    rolling codepoint hash, mix31 the seeded 31-bit shuffle mix
    (functions/shuffle.py) — both already SQL-mirrored.

    Returns Dataset(seed_node, step, node): step 0 is the seed itself;
    a walk reaching a sink (no out-edges) simply stops emitting.
    Parallel duplicate edges are harmless (duplicate candidates share
    one key; the argmin is unchanged — identically in SQL).

    Scale shape: one hash join (frontier ⋈ edges on the current node)
    + two slim groupbys (min key per seed, then min-w tie-break) per
    step; the frontier never exceeds |seeds| rows.  Below
    ``driver_cap`` edges the walk runs as numpy/dict steps on the
    driver (the pagerank_int economics).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    out_schema = pa.schema([("seed_node", pa.string()),
                            ("step", pa.int64()),
                            ("node", pa.string())])
    empty = pa.table({"seed_node": pa.array([], pa.string()),
                      "step": pa.array([], pa.int64()),
                      "node": pa.array([], pa.string())})

    def seeds_table():
        parts = []
        for p in ray.get(seeds_ds.materialize().to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["node"]))
        if not parts:
            return None
        t = pa.concat_tables(parts).combine_chunks()
        return np.unique(t.column("node").to_numpy(zero_copy_only=False))

    n_edges = edges_ds.count()
    if n_edges <= driver_cap:
        sd = seeds_table()
        if sd is None:
            return rd.from_arrow(empty)
        parts = []
        for p in ray.get(edges_ds.materialize().to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["src", "dst"]))
        src = np.concatenate(
            [p.column("src").to_numpy(zero_copy_only=False)
             for p in parts]) if parts else np.array([], dtype=object)
        dst = np.concatenate(
            [p.column("dst").to_numpy(zero_copy_only=False)
             for p in parts]) if parts else np.array([], dtype=object)
        uniq = np.unique(np.concatenate([src, dst, sd]))
        hcode = _node_hash(pa.array(uniq, pa.string()))
        code = {n: i for i, n in enumerate(uniq.tolist())}
        adj: dict[int, list] = {}
        for s, d in zip(src.tolist(), dst.tolist()):
            adj.setdefault(code[s], []).append(code[d])
        rows_seed, rows_step, rows_node = [], [], []
        for s in sd.tolist():
            cur = code[s]
            rows_seed.append(s)
            rows_step.append(0)
            rows_node.append(s)
            for i in range(1, steps + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                nb = np.array(nbrs, dtype=np.int64)
                keys = _walk_key(np.full(len(nb), hcode[cur]), i,
                                 hcode[nb], seed)
                kmin = keys.min()
                # tie-break: lexicographically smallest neighbor name
                best = min(uniq[nb[keys == kmin]].tolist())
                cur = code[best]
                rows_seed.append(s)
                rows_step.append(i)
                rows_node.append(best)
        return rd.from_arrow(pa.table({
            "seed_node": pa.array(rows_seed, pa.string()),
            "step": pa.array(rows_step, pa.int64()),
            "node": pa.array(rows_node, pa.string())}))

    # distributed path: frontier ⋈ edges per step + argmin groupbys
    edges = drop_empty_blocks(edges_ds.map_batches(
        lambda t: pa.table({"src": pc.cast(t.column("src"), pa.string()),
                            "dst": pc.cast(t.column("dst"), pa.string())}),
        batch_format="pyarrow").materialize())
    seeds = seeds_ds.map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("node"),
                                            pa.string())}),
        batch_format="pyarrow") \
        .groupby("node").count().select_columns(["node"])
    seeds = seeds.materialize()
    if seeds.count() == 0 or edges.count() == 0:
        if seeds.count() == 0:
            return rd.from_arrow(empty)
    seeds = drop_empty_blocks(seeds)
    frontier = seeds.map_batches(
        lambda t: pa.table({"seed_node": t.column("node"),
                            "node": t.column("node")}),
        batch_format="pyarrow")
    outs = [frontier.map_batches(
        lambda t: pa.table({"seed_node": t.column("seed_node"),
                            "step": pa.array([0] * t.num_rows, pa.int64()),
                            "node": t.column("node")}),
        batch_format="pyarrow")]
    frontier = drop_empty_blocks(frontier.materialize())
    for i in range(1, steps + 1):
        if edges.count() == 0:
            break
        cand = join_datasets(frontier, edges, on="node", right_on="src",
                             num_partitions=num_partitions,
                             scrub_left=False, scrub_right=False)

        def keyed(t: pa.Table, step=i) -> pa.Table:
            hv = _node_hash(t.column("node").combine_chunks())
            hw = _node_hash(t.column("dst").combine_chunks())
            return pa.table({
                "seed_node": t.column("seed_node"),
                "dst": t.column("dst"),
                "h": pa.array(_walk_key(hv, step, hw, seed), pa.int64())})

        cand = cand.map_batches(keyed, batch_format="pyarrow") \
            .materialize()
        if cand.count() == 0:
            break
        cand = drop_empty_blocks(cand)
        m = cand.groupby("seed_node").aggregate(Min("h", alias_name="mh"))
        m = drop_empty_blocks(m.materialize())
        best = join_datasets(cand, m, on="seed_node",
                             num_partitions=num_partitions,
                             scrub_left=False, scrub_right=False)

        def tie(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("h"), t.column("mh"))
            t = t.filter(keep)
            return pa.table({"seed_node": t.column("seed_node"),
                             "dst": t.column("dst")})

        nxt = (best.map_batches(tie, batch_format="pyarrow")
               .groupby("seed_node").aggregate(Min("dst",
                                                   alias_name="node")))
        nxt = nxt.materialize()
        if nxt.count() == 0:
            break
        nxt = drop_empty_blocks(nxt)
        frontier = nxt
        outs.append(frontier.map_batches(
            lambda t, step=i: pa.table({
                "seed_node": t.column("seed_node"),
                "step": pa.array([step] * t.num_rows, pa.int64()),
                "node": t.column("node")}),
            batch_format="pyarrow"))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def sql_deterministic_walks(edges_sql: str, seeds_sql: str,
                            steps: int = 5, seed: int = 0,
                            lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`deterministic_walks`: node hashes once
    in a MATERIALIZED CTE, then per step the identical candidate join,
    per-seed min key, and min-dst tie-break as chained CTEs."""
    from k_gap_ray.functions.shuffle import _M, _mix_sql
    from k_gap_ray.functions.textstats import (H1_BASE, H1_MOD,
                                               sql_token_hash_expr)

    nh = sql_token_hash_expr("node", H1_BASE, H1_MOD)
    parts = [f"""{lead} __e AS MATERIALIZED (SELECT src, dst
  FROM ({edges_sql}) __e0),
__sd AS MATERIALIZED (SELECT DISTINCT node FROM ({seeds_sql}) __s0),
__nodes AS (
  SELECT src AS node FROM __e UNION
  SELECT dst FROM __e UNION SELECT node FROM __sd),
__nh AS MATERIALIZED (SELECT node, ({nh}) AS h FROM __nodes),
__w0 AS (SELECT node AS seed_node, node FROM __sd)"""]
    for i in range(1, steps + 1):
        mix = _mix_sql("c", seed)
        parts.append(f""",
__c{i} AS MATERIALIZED (
  SELECT seed_node, dst, {mix} AS h FROM (
    SELECT w.seed_node, e.dst,
           (hv.h * 131 + {i * 7919} + hd.h) % {_M} AS c
    FROM __w{i - 1} w
    JOIN __e e ON e.src = w.node
    JOIN __nh hv ON hv.node = w.node
    JOIN __nh hd ON hd.node = e.dst) __r),
__m{i} AS (SELECT seed_node, MIN(h) AS mh
           FROM __c{i} GROUP BY seed_node),
__w{i} AS MATERIALIZED (
  SELECT c.seed_node, MIN(c.dst) AS node
  FROM __c{i} c JOIN __m{i} m
    ON c.seed_node = m.seed_node AND c.h = m.mh
  GROUP BY c.seed_node)""")
    sel = ["SELECT seed_node, 0::BIGINT AS step, node FROM __w0"]
    for i in range(1, steps + 1):
        sel.append(f"SELECT seed_node, {i}::BIGINT AS step, node "
                   f"FROM __w{i}")
    parts.append("\n" + "\nUNION ALL\n".join(sel))
    return "".join(parts)


def negative_samples(triples_ds, seed: int = 0, n_buckets: int = 64,
                     num_partitions: int | None = None):
    """Deterministic corrupted-triple generation — the negative-
    sampling op a KG-embedding trainer (TransE/DistMult family) runs
    over the materialized graph, made REPRODUCIBLE and shuffle-light:

    - the distinct object vocabulary is hash-bucketed into
      ``n_buckets`` groups, each represented by its MIN object (one
      slim groupby; the representative table is <= n_buckets rows —
      broadcast state, never vocabulary-scale),
    - each triple (s, p, o) draws its corruption bucket from the
      seeded 31-bit mix of (h(s)*131 + h(p)*257 + h(o)) % 2^31 and
      replaces o with that bucket's representative,
    - the FILTERED setting: corruptions that equal the true object or
      collide with a REAL (s, p, o') triple are dropped (one marker
      left join on the composite key), as are triples whose drawn
      bucket holds no object.

    Returns Dataset(subj, pred, obj, neg_obj).  Diversity note: all
    triples drawing one bucket share its representative — with
    ``n_buckets`` sized to the object vocabulary this is the standard
    determinism-for-uniformity trade (a trainer wanting k negatives
    per triple calls this k times with different seeds).  The DuckDB
    mirror (:func:`sql_negative_samples`) runs the identical hashes,
    bucket min, and NOT-EXISTS filter."""
    import ray
    from ray.data.aggregate import Min

    from k_gap_ray.dsutil import drop_empty_blocks
    from k_gap_ray.functions.shuffle import _M, _mix

    _S = "\x1f"

    def obj_partials(t: pa.Table) -> pa.Table:
        return pa.table({"obj": pc.unique(
            pc.cast(t.column("obj"), pa.string()).combine_chunks())})

    def rep_key(t: pa.Table) -> pa.Table:
        o = t.column("obj").combine_chunks() \
            if isinstance(t.column("obj"), pa.ChunkedArray) \
            else t.column("obj")
        b = _mix(_node_hash(o), seed) % n_buckets
        return pa.table({"b": pa.array(b, pa.int64()), "obj": o})

    reps = (triples_ds.map_batches(obj_partials, batch_format="pyarrow")
            .groupby("obj").count().select_columns(["obj"])
            .map_batches(rep_key, batch_format="pyarrow")
            .groupby("b").aggregate(Min("obj", alias_name="rep")))
    rep_rows = {r["b"]: r["rep"] for r in reps.take_all()}
    rep_arr = pa.array([rep_rows.get(b) for b in range(n_buckets)],
                       pa.string())
    rep_ref = ray.put(rep_arr)

    def corrupt(t: pa.Table) -> pa.Table:
        import ray as _r

        rep = _r.get(rep_ref)
        s = pc.cast(t.column("subj"), pa.string()).combine_chunks()
        p = pc.cast(t.column("pred"), pa.string()).combine_chunks()
        o = pc.cast(t.column("obj"), pa.string()).combine_chunks()
        hs, hp, ho = _node_hash(s), _node_hash(p), _node_hash(o)
        c = (hs * 131 + hp * 257 + ho) % _M
        tb = _mix(c, seed) % n_buckets
        neg = pc.take(rep, pa.array(tb, pa.int64()))
        out = pa.table({"subj": s, "pred": p, "obj": o, "neg_obj": neg})
        keep = pc.and_(pc.is_valid(out.column("neg_obj")),
                       pc.not_equal(out.column("neg_obj"),
                                    out.column("obj")))
        return out.filter(keep)

    cand = triples_ds.map_batches(corrupt, batch_format="pyarrow") \
        .materialize()
    import ray.data as rd

    empty = pa.table({"subj": pa.array([], pa.string()),
                      "pred": pa.array([], pa.string()),
                      "obj": pa.array([], pa.string()),
                      "neg_obj": pa.array([], pa.string())})
    if cand.count() == 0:
        return rd.from_arrow(empty)
    cand = drop_empty_blocks(cand)

    from k_gap_ray.dsutil import join_datasets

    keyed = cand.map_batches(
        lambda t: t.append_column("__k", pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("neg_obj"),
            _S)),
        batch_format="pyarrow")
    real = triples_ds.map_batches(
        lambda t: pa.table({
            "__k": pc.binary_join_element_wise(
                pc.cast(t.column("subj"), pa.string()),
                pc.cast(t.column("pred"), pa.string()),
                pc.cast(t.column("obj"), pa.string()), _S),
            "__real": pa.array([1] * t.num_rows, pa.int64())}),
        batch_format="pyarrow") \
        .groupby("__k").aggregate(Min("__real", alias_name="__real"))
    out = join_datasets(keyed, real, on="__k", join_type="left_outer",
                        num_partitions=num_partitions,
                        scrub_left=False, scrub_right=True)
    out = drop_empty_blocks(out.materialize())
    return out.map_batches(
        lambda t: t.filter(pc.is_null(t.column("__real")))
        .select(["subj", "pred", "obj", "neg_obj"]),
        batch_format="pyarrow")


def sql_negative_samples(triples_sql: str, seed: int = 0,
                         n_buckets: int = 64,
                         lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`negative_samples`: identical hashes,
    bucket representatives, and filtered-setting NOT EXISTS."""
    from k_gap_ray.functions.shuffle import _M, _mix_sql
    from k_gap_ray.functions.textstats import (H1_BASE, H1_MOD,
                                               sql_token_hash_expr)

    oh = sql_token_hash_expr("obj", H1_BASE, H1_MOD)
    mix_ob = _mix_sql("c", seed)
    mix_tb = _mix_sql("c", seed)
    return f"""{lead} __tr AS MATERIALIZED (
  SELECT subj, pred, obj FROM ({triples_sql}) __t0),
__objs AS (SELECT DISTINCT obj FROM __tr),
__obk AS (SELECT obj, ({mix_ob}) % {n_buckets} AS b FROM (
    SELECT obj, ({oh}) % {_M} AS c FROM __objs) __o),
__reps AS MATERIALIZED (
  SELECT b, MIN(obj) AS rep FROM __obk GROUP BY b),
__hh AS (
  SELECT subj, pred, obj,
         (({sql_token_hash_expr('subj', H1_BASE, H1_MOD)}) * 131
          + ({sql_token_hash_expr('pred', H1_BASE, H1_MOD)}) * 257
          + ({oh})) % {_M} AS c
  FROM __tr),
__cand AS (
  SELECT h.subj, h.pred, h.obj, r.rep AS neg_obj
  FROM (SELECT subj, pred, obj,
               ({mix_tb}) % {n_buckets} AS tb FROM __hh) h
  JOIN __reps r ON r.b = h.tb
  WHERE r.rep <> h.obj)
SELECT subj, pred, obj, neg_obj FROM __cand c
WHERE NOT EXISTS (SELECT 1 FROM __tr t
                  WHERE t.subj = c.subj AND t.pred = c.pred
                    AND t.obj = c.neg_obj)"""


def degree_histogram(edges_ds, num_partitions: int | None = None,
                     driver_cap: int = _TRI_DRIVER_CAP):
    """Log2-bucketed degree histogram over the distinct undirected
    pair set — the graph-shape report (power-law check) run before
    sizing shuffles/caps on a new graph.  Returns Dataset(bucket,
    n_nodes) where bucket = floor(log2(degree)), exact-integer via a
    shift-verified correction (and ``length(bin(deg)) - 1`` in the
    DuckDB mirror :func:`sql_degree_histogram`).

    Scale shape: degree partials + one slim (node) shuffle, then
    per-batch bucket partials + one <= 64-row (bucket) shuffle.
    Below ``driver_cap`` edges with integer node ids < 2^31 the whole
    thing is per-batch unique-pair-key partials merged on the driver
    (np.unique + two bincounts — Ray aggregates carry a multi-second
    FIXED cost per shuffle at the gate tiers, and this op needs two;
    measured 15.5 s -> ~4 s at sf0.1, same histogram)."""
    from ray.data.aggregate import Sum

    first = edges_ds.schema()
    int_ids = all(pa.types.is_integer(first.base_schema.field(c).type)
                  for c in ("src", "dst")) \
        if hasattr(first, "base_schema") else False
    if int_ids:
        # integer node ids: canonical pair key = lo * 2^31 + hi
        # (requires ids < 2^31, guarded per batch)
        def canon_int(t: pa.Table) -> pa.Table:
            src = pc.cast(t.column("src"), pa.int64())
            dst = pc.cast(t.column("dst"), pa.int64())
            keep = pc.not_equal(src, dst)
            src, dst = src.filter(keep), dst.filter(keep)
            lo = pc.min_element_wise(src, dst)
            hi = pc.max_element_wise(src, dst)
            if len(hi) and pc.max(hi).as_py() >= (1 << 31):
                raise ValueError("degree_histogram int path needs "
                                 "node ids < 2^31")
            return pa.table({"__k": pc.add(
                pc.multiply(lo, pa.scalar(1 << 31, pa.int64())), hi)})

        if edges_ds.count() <= driver_cap:
            # per-batch unique partials, driver merge: np.unique over
            # the collected unique-key stream, degrees via bincount on
            # re-coded endpoints, histogram in one pass — no shuffle
            import ray
            import ray.data as rd

            part = edges_ds.map_batches(
                lambda t: pa.table({"__k": pc.unique(
                    canon_int(t).column("__k").combine_chunks())}),
                batch_format="pyarrow")
            chunks = []
            for p in ray.get(part.materialize().to_arrow_refs()):
                if not isinstance(p, pa.Table):
                    p = pa.Table.from_pandas(p, preserve_index=False)
                if p.num_rows:
                    chunks.append(p.column("__k").to_numpy(
                        zero_copy_only=False))
            if not chunks:
                return rd.from_arrow(pa.table({
                    "bucket": pa.array([], pa.int64()),
                    "n_nodes": pa.array([], pa.int64())}))
            keys = np.unique(np.concatenate(chunks))
            lo = keys >> 31
            hi = keys & ((1 << 31) - 1)
            uniq, inv = np.unique(np.concatenate([lo, hi]),
                                  return_inverse=True)
            deg = np.bincount(inv, minlength=len(uniq))
            b = np.floor(np.log2(deg)).astype(np.int64)
            b = np.where((np.int64(1) << (b + 1)) <= deg, b + 1, b)
            b = np.where((np.int64(1) << b) > deg, b - 1, b)
            ub, counts = np.unique(b, return_counts=True)
            return rd.from_arrow(pa.table({
                "bucket": pa.array(ub, pa.int64()),
                "n_nodes": pa.array(counts.astype(np.int64),
                                    pa.int64())}))

        und_k = (edges_ds.map_batches(canon_int, batch_format="pyarrow")
                 .groupby("__k").count().select_columns(["__k"]))

        def unpack(t: pa.Table) -> pa.Table:
            k = pc.cast(t.column("__k"), pa.int64())
            lo = pc.divide(k, pa.scalar(1 << 31, pa.int64()))
            hi = pc.subtract(k, pc.multiply(
                lo, pa.scalar(1 << 31, pa.int64())))
            return pa.table({"a": pc.cast(lo, pa.string()),
                             "b": pc.cast(hi, pa.string())})

        und = und_k.map_batches(unpack, batch_format="pyarrow")
    else:
        und = _undirected_pairs(edges_ds)
    deg = _pair_degrees(und)

    def bucket_partials(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("deg"), pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(d) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "np_": pa.array([], pa.int64())})
        b = np.floor(np.log2(d)).astype(np.int64)
        # float-log guard: verify with integer shifts (1<<b <= d < 1<<b+1)
        b = np.where((np.int64(1) << (b + 1)) <= d, b + 1, b)
        b = np.where((np.int64(1) << b) > d, b - 1, b)
        uniq, counts = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "np_": pa.array(counts.astype(np.int64),
                                         pa.int64())})

    return (deg.map_batches(bucket_partials, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("np_",
                                             alias_name="n_nodes")))


def sql_degree_histogram(edges_sql: str, lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`degree_histogram`: the identical pair
    canonicalization and ``length(bin(deg)) - 1`` integer log2."""
    return f"""{lead} __und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) __e WHERE src <> dst
),
__deg AS (
  SELECT node, COUNT(*)::BIGINT AS deg FROM (
    SELECT a AS node FROM __und UNION ALL SELECT b FROM __und) __n
  GROUP BY node)
SELECT (length(bin(deg)) - 1)::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n_nodes
FROM __deg GROUP BY bucket"""


def ktruss_edges(edges_ds, k: int = 4, rounds: int = 3,
                 num_partitions: int | None = None,
                 driver_cap: int = _TRI_DRIVER_CAP):
    """Fixed-round k-truss peeling — the EDGE-cohesion complement to
    k-core: run EXACTLY ``rounds`` rounds of (per-edge triangle
    support -> drop edges with support < k-2) over the distinct
    undirected pair set, then return Dataset(a, b, support) — the
    surviving edges with their support in the FINAL edge set.  As with
    :func:`kcore_nodes`, the FIXED round count is the pinned contract
    (truss peeling usually stabilizes in a few rounds; callers size
    ``rounds``), so both engines compute identical results even
    mid-convergence.

    Support is counted by the same degree-ordered compact-forward
    scheme as :func:`triangle_count` (each closed wedge credits its
    three edges); the mirror :func:`sql_ktruss` recounts with the
    orientation-free triple self-join per round — different
    algorithms, identical integers.  Below ``driver_cap`` pairs the
    peeling runs as adjacency-set rounds on the driver.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    _S = "\x1f"
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "support": pa.array([], pa.int64())})
    und = _undirected_pairs(edges_ds).materialize()
    if und.count() == 0:
        return rd.from_arrow(empty)
    und = drop_empty_blocks(und)
    thresh = k - 2

    if und.count() <= driver_cap:
        parts = []
        for p in ray.get(und.to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["a", "b"]))
        t = pa.concat_tables(parts).combine_chunks()
        edges = set(zip(t.column("a").to_pylist(),
                        t.column("b").to_pylist()))

        def supports(es: set) -> dict:
            nbrs: dict = {}
            for x, y in es:
                nbrs.setdefault(x, set()).add(y)
                nbrs.setdefault(y, set()).add(x)
            sup = {}
            for x, y in es:
                sup[(x, y)] = len(nbrs[x] & nbrs[y])
            return sup

        for _ in range(rounds):
            sup = supports(edges)
            edges = {e for e in edges if sup[e] >= thresh}
            if not edges:
                return rd.from_arrow(empty)
        sup = supports(edges)
        es = sorted(edges)
        return rd.from_arrow(pa.table({
            "a": pa.array([e[0] for e in es], pa.string()),
            "b": pa.array([e[1] for e in es], pa.string()),
            "support": pa.array([sup[e] for e in es], pa.int64())}))

    def edge_supports(cur):
        """(a, b) Dataset -> (a, b, support) via the compact-forward
        triangle pipeline crediting each triangle's three edges."""
        deg = drop_empty_blocks(_pair_degrees(cur).materialize())
        wa = join_datasets(cur, deg, on="a", right_on="node",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False) \
            .map_batches(lambda t: pa.table(
                {"a": t.column("a"), "b": t.column("b"),
                 "da": t.column("deg")}), batch_format="pyarrow")
        wab = join_datasets(wa, deg, on="b", right_on="node",
                            num_partitions=num_partitions,
                            scrub_left=True, scrub_right=False)

        def orient(t: pa.Table) -> pa.Table:
            a, b = t.column("a"), t.column("b")
            da, db = t.column("da"), t.column("deg")
            a_first = pc.or_(pc.less(da, db),
                             pc.and_(pc.equal(da, db), pc.less(a, b)))
            return pa.table({
                "u": pc.if_else(a_first, a, b),
                "v": pc.if_else(a_first, b, a),
                "dv": pc.if_else(a_first, db, da)})

        ori = drop_empty_blocks(
            wab.map_batches(orient, batch_format="pyarrow")
            .materialize())
        left = ori.map_batches(lambda t: pa.table(
            {"u": t.column("u"), "v1": t.column("v"),
             "dv1": t.column("dv")}), batch_format="pyarrow")
        right = ori.map_batches(lambda t: pa.table(
            {"u": t.column("u"), "v2": t.column("v"),
             "dv2": t.column("dv")}), batch_format="pyarrow")
        wedges = join_datasets(left, right, on="u",
                               num_partitions=num_partitions,
                               scrub_left=False, scrub_right=False)

        def wedge_rows(t: pa.Table) -> pa.Table:
            lt = pc.or_(pc.less(t.column("dv1"), t.column("dv2")),
                        pc.and_(pc.equal(t.column("dv1"),
                                         t.column("dv2")),
                                pc.less(t.column("v1"),
                                        t.column("v2"))))
            t = t.filter(lt)
            return pa.table({
                "u": t.column("u"), "v1": t.column("v1"),
                "v2": t.column("v2"),
                "__ek": pc.binary_join_element_wise(
                    t.column("v1"), t.column("v2"), _S)})

        def zero_support():
            return cur.map_batches(
                lambda t: pa.table({
                    "a": t.column("a"), "b": t.column("b"),
                    "support": pa.array([0] * t.num_rows, pa.int64())}),
                batch_format="pyarrow")

        cand = wedges.map_batches(wedge_rows,
                                  batch_format="pyarrow").materialize()
        if cand.count() == 0:
            return zero_support()
        cand = drop_empty_blocks(cand)
        ekeys = ori.map_batches(lambda t: pa.table(
            {"__ek": pc.binary_join_element_wise(
                t.column("u"), t.column("v"), _S)}),
            batch_format="pyarrow")
        closed = join_datasets(cand, ekeys, on="__ek",
                               num_partitions=num_partitions,
                               scrub_left=False, scrub_right=False) \
            .materialize()
        if closed.count() == 0:
            return zero_support()
        closed = drop_empty_blocks(closed)

        def edge_partials(t: pa.Table) -> pa.Table:
            def canon_key(x, y):
                lo = pc.min_element_wise(x, y)
                hi = pc.max_element_wise(x, y)
                joined = pc.binary_join_element_wise(lo, hi, _S)
                return joined.combine_chunks() \
                    if isinstance(joined, pa.ChunkedArray) else joined

            u = t.column("u").combine_chunks()
            v1 = t.column("v1").combine_chunks()
            v2 = t.column("v2").combine_chunks()
            keys = pa.concat_arrays([
                canon_key(u, v1), canon_key(u, v2),
                canon_key(v1, v2)])
            vc = keys.value_counts()
            return pa.table({"__k": vc.field("values"),
                             "sp": pc.cast(vc.field("counts"),
                                           pa.int64())})

        sup = (closed.map_batches(edge_partials, batch_format="pyarrow")
               .groupby("__k").aggregate(Sum("sp", alias_name="sp")))
        sup = drop_empty_blocks(sup.materialize())
        keyed = cur.map_batches(
            lambda t: t.append_column("__k", pc.binary_join_element_wise(
                t.column("a"), t.column("b"), _S)),
            batch_format="pyarrow")
        out = join_datasets(keyed, sup, on="__k",
                            join_type="left_outer",
                            num_partitions=num_partitions,
                            scrub_left=False, scrub_right=False)
        return out.map_batches(
            lambda t: pa.table({
                "a": t.column("a"), "b": t.column("b"),
                "support": pc.fill_null(pc.cast(t.column("sp"),
                                                pa.int64()), 0)}),
            batch_format="pyarrow")

    cur = und
    for _ in range(rounds):
        withsup = edge_supports(cur).materialize()
        cur = withsup.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("support"),
                pa.scalar(thresh, pa.int64())))
            .select(["a", "b"]), batch_format="pyarrow").materialize()
        if cur.count() == 0:
            return rd.from_arrow(empty)
        cur = drop_empty_blocks(cur)
    return edge_supports(cur)


def sql_ktruss(edges_sql: str, k: int = 4, rounds: int = 3,
               lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`ktruss_edges`: per round, triangle
    support via the orientation-free triple self-join credited to all
    three edges, then the support filter — chained MATERIALIZED CTEs
    (each round references its predecessor many times)."""
    thresh = k - 2

    def support_ctes(i: int, src: str) -> str:
        return f"""
__t{i} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {src} e1
  JOIN {src} e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN {src} e3 ON e3.a = e1.b AND e3.b = e2.b),
__s{i} AS MATERIALIZED (
  SELECT a, b, COUNT(*)::BIGINT AS support FROM (
    SELECT x AS a, y AS b FROM __t{i}
    UNION ALL SELECT x, z FROM __t{i}
    UNION ALL SELECT y, z FROM __t{i}) __e
  GROUP BY a, b)"""

    parts = [f"""{lead} __und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) __e0 WHERE src <> dst
),
__e0 AS MATERIALIZED (SELECT a, b FROM __und)"""]
    for i in range(1, rounds + 1):
        parts.append("," + support_ctes(i, f"__e{i - 1}"))
        parts.append(f""",
__e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM __e{i - 1} e
  LEFT JOIN __s{i} s ON s.a = e.a AND s.b = e.b
  WHERE COALESCE(s.support, 0) >= {thresh})""")
    parts.append("," + support_ctes(rounds + 1, f"__e{rounds}"))
    parts.append(f"""
SELECT e.a, e.b, COALESCE(s.support, 0)::BIGINT AS support
FROM __e{rounds} e
LEFT JOIN __s{rounds + 1} s ON s.a = e.a AND s.b = e.b""")
    return "".join(parts)


def label_propagation(edges_ds, rounds: int = 4,
                      num_partitions: int | None = None,
                      driver_cap: int = _TRI_DRIVER_CAP):
    """SYNCHRONOUS label-propagation communities (Raghavan et al.
    2007) made deterministic: labels start as node ids; each round
    every node adopts the MOST FREQUENT label among its neighbors'
    previous-round labels, ties to the lexicographically smallest —
    run for EXACTLY ``rounds`` rounds (the fixed-round pinning of this
    module: classic LPA's random order/tie-breaks make it
    irreproducible, which is exactly what a two-engine value-hash
    cannot tolerate).  Returns Dataset(node, lab) over the undirected
    distinct pair set's nodes.

    Scale shape per round: one hash join (labels onto the
    bidirectional incidence), one composite-key (node, label) count
    with per-batch pre-reduction, one per-node max, one min-label
    tie-break — all label-cardinality-bounded shuffles.  Below
    ``driver_cap`` pairs the rounds run as dict/numpy passes on the
    driver.  Mirror :func:`sql_label_propagation` chains the identical
    count/argmax CTEs."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from k_gap_ray.dsutil import drop_empty_blocks, join_datasets

    _S = "\x1f"
    empty = pa.table({"node": pa.array([], pa.string()),
                      "lab": pa.array([], pa.string())})
    und = _undirected_pairs(edges_ds).materialize()
    if und.count() == 0:
        return rd.from_arrow(empty)
    und = drop_empty_blocks(und)

    if und.count() <= driver_cap:
        parts = []
        for p in ray.get(und.to_arrow_refs()):
            if not isinstance(p, pa.Table):
                p = pa.Table.from_pandas(p, preserve_index=False)
            if p.num_rows:
                parts.append(p.select(["a", "b"]))
        t = pa.concat_tables(parts).combine_chunks()
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        nbrs: dict = {}
        for x, y in zip(a, b):
            nbrs.setdefault(x, []).append(y)
            nbrs.setdefault(y, []).append(x)
        lab = {n: n for n in nbrs}
        for _ in range(rounds):
            new = {}
            for n, ns in nbrs.items():
                cnt: dict = {}
                for w in ns:
                    lw = lab[w]
                    cnt[lw] = cnt.get(lw, 0) + 1
                best = min(cnt, key=lambda L: (-cnt[L], L))
                new[n] = best
            lab = new
        ns = sorted(lab)
        return rd.from_arrow(pa.table({
            "node": pa.array(ns, pa.string()),
            "lab": pa.array([lab[n] for n in ns], pa.string())}))

    bi = und.map_batches(lambda t: pa.table({
        "s": pa.concat_arrays([t.column("a").combine_chunks(),
                               t.column("b").combine_chunks()]),
        "t": pa.concat_arrays([t.column("b").combine_chunks(),
                               t.column("a").combine_chunks()])}),
        batch_format="pyarrow").materialize()
    bi = drop_empty_blocks(bi)
    labels = bi.map_batches(
        lambda t: pa.table({"node": pc.unique(
            t.column("s").combine_chunks())}),
        batch_format="pyarrow") \
        .groupby("node").count() \
        .map_batches(lambda t: pa.table({"node": t.column("node"),
                                         "lab": t.column("node")}),
                     batch_format="pyarrow")
    labels = drop_empty_blocks(labels.materialize())
    for _ in range(rounds):
        nl = join_datasets(bi, labels, on="t", right_on="node",
                           num_partitions=num_partitions,
                           scrub_left=False, scrub_right=False)

        def count_partials(t: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(
                t.column("s"), t.column("lab"), _S)
            key = key.combine_chunks() \
                if isinstance(key, pa.ChunkedArray) else key
            vc = key.value_counts()
            return pa.table({"__k": vc.field("values"),
                             "cp": pc.cast(vc.field("counts"),
                                           pa.int64())})

        cnt = (nl.map_batches(count_partials, batch_format="pyarrow")
               .groupby("__k").aggregate(Sum("cp", alias_name="c")))
        cnt = drop_empty_blocks(cnt.materialize())
        split_cnt = cnt.map_batches(
            lambda t: (lambda sp: pa.table({
                "s": pc.list_element(sp, 0),
                "lab": pc.list_element(sp, 1),
                "c": pc.cast(t.column("c"), pa.int64())}))(
                pc.split_pattern(
                    t.column("__k").combine_chunks()
                    if isinstance(t.column("__k"), pa.ChunkedArray)
                    else t.column("__k"), _S)),
            batch_format="pyarrow")
        m = (split_cnt.groupby("s").aggregate(Max("c",
                                                  alias_name="mc")))
        m = drop_empty_blocks(m.materialize())
        best = join_datasets(split_cnt, m, on="s",
                             num_partitions=num_partitions,
                             scrub_left=False, scrub_right=False)
        labels = (best.map_batches(
            lambda t: (lambda keep: pa.table({
                "s": t.column("s").filter(keep),
                "lab": t.column("lab").filter(keep)}))(
                pc.equal(t.column("c"), t.column("mc"))),
            batch_format="pyarrow")
            .groupby("s").aggregate(Min("lab", alias_name="lab"))
            .map_batches(lambda t: pa.table({"node": t.column("s"),
                                             "lab": t.column("lab")}),
                         batch_format="pyarrow"))
        labels = drop_empty_blocks(labels.materialize())
    return labels


def sql_label_propagation(edges_sql: str, rounds: int = 4,
                          lead: str = "WITH") -> str:
    """DuckDB oracle for :func:`label_propagation`: identical
    synchronous rounds as chained MATERIALIZED count/argmax CTEs."""
    parts = [f"""{lead} __und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) __e WHERE src <> dst
),
__bi AS MATERIALIZED (SELECT a AS s, b AS t FROM __und
                      UNION ALL SELECT b, a FROM __und),
__l0 AS MATERIALIZED (
  SELECT DISTINCT s AS node, s AS lab FROM __bi)"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
__c{i} AS MATERIALIZED (
  SELECT b.s, l.lab, COUNT(*)::BIGINT AS c
  FROM __bi b JOIN __l{i - 1} l ON l.node = b.t
  GROUP BY b.s, l.lab),
__m{i} AS (SELECT s, MAX(c) AS mc FROM __c{i} GROUP BY s),
__l{i} AS MATERIALIZED (
  SELECT c.s AS node, MIN(c.lab) AS lab
  FROM __c{i} c JOIN __m{i} m ON m.s = c.s AND c.c = m.mc
  GROUP BY c.s)""")
    parts.append(f"\nSELECT node, lab FROM __l{rounds}")
    return "".join(parts)
