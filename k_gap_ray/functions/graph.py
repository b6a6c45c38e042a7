"""Iterative graph analytics over edge-list Datasets: PageRank.

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
                 num_partitions: int | None = None):
    """Edge list Dataset(src, dst) -> Dataset(node, rank) after
    ``iters`` exact-integer PageRank iterations.

    ``scale * damping_num * max_in_degree`` must fit int64 — with the
    default 10^6 scale that allows ~10^11 inbound edges per node.
    ``num_partitions`` sizes every shuffle (default: cluster CPUs);
    size it to the graph, not the cluster, for small graphs.
    """
    from ray.data.aggregate import Sum

    from k_gap_ray.dsutil import join_datasets

    teleport = (scale * (damping_den - damping_num)) // damping_den
    np_kw = {"num_partitions": num_partitions}

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
                "rank": pa.array([teleport] * t.num_rows, pa.int64()),
            }).filter(pc.is_null(t.column("has_in"))),
            batch_format="pyarrow").materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "rank": pa.array([scale] * t.num_rows, pa.int64())}),
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
                    pa.scalar(teleport, pa.int64()),
                    pc.divide(
                        pc.multiply(
                            pa.scalar(damping_num, pa.int64()),
                            pc.cast(t.column("insum"), pa.int64())),
                        pa.scalar(damping_den, pa.int64())))}),
            batch_format="pyarrow")
        ranks = with_in.union(no_in_tbl)
    return ranks


def sql_pagerank(edges_sql: str, iters: int = 5, scale: int = 1_000_000,
                 damping_num: int = 85, damping_den: int = 100) -> str:
    """DuckDB oracle for :func:`pagerank_int`: ``iters`` chained CTEs
    with the identical integer recurrence.  ``edges_sql`` is a SELECT
    yielding (src, dst)."""
    teleport = (scale * (damping_den - damping_num)) // damping_den
    parts = [f"WITH e AS ({edges_sql}),",
             "nodes AS (SELECT src AS node FROM e UNION "
             "SELECT dst FROM e),",
             "deg AS (SELECT src, count(*)::BIGINT AS deg FROM e "
             "GROUP BY src),",
             f"r0 AS (SELECT node, {scale}::BIGINT AS rank FROM nodes)"]
    for i in range(1, iters + 1):
        parts.append(f""",
r{i} AS (
  SELECT n.node,
         ({teleport}::BIGINT
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
