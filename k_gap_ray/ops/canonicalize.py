"""Stage 3 — entity canonicalization (SURVEY.md A8/D5, north rule).

    mentions -> unique norm surfaces        (distributed distinct)
             -> minhash + LSH band explode  (stateless map_batches)
             -> per-band member lists       (groupby(band).aggregate(Unique))
             -> verified candidate edges    (map_batches pair gen + Jaccard)
             -> connected components        (driver union-find fast path, or
                                             distributed min-label propagation:
                                             join + groupby.min per round)
             -> entities table + surface->entity mapping

Scale notes (100 TB design):
- Everything up to the edge set is sized by the number of UNIQUE
  normalized surface forms (a vocabulary, orders of magnitude smaller
  than the corpus), not by the corpus itself.
- The per-band aggregate uses Ray's hash aggregate with partial
  pre-aggregation — no per-group Python calls; pair generation is a
  plain map_batches over (band, members-list) rows with a MAX_BLOCK
  cap per block (dropped members are counted, not silently lost).
- Head-entity skew (Zipf surfaces) does NOT create hot keys here
  because blocking runs on unique surfaces; the skew-sensitive
  aggregation (mention counts per entity) is handled by partial
  pre-aggregation in `mention_counts` below.
- The surface->entity mapping is broadcast via ``ray.put`` when small
  (the common case: a vocabulary), with a join-based rewrite as the
  documented scale path.
"""

from __future__ import annotations

import pyarrow as pa

from k_gap_ray.dsutil import drop_empty_blocks
from k_gap_ray.oracle import canon

# Above this many unique surfaces, connected components runs as
# distributed label propagation instead of driver union-find.
DRIVER_CC_MAX = 200_000


def band_explode_batch(batch: pa.Table) -> pa.Table:
    """(norm_surface) -> BANDS rows (band_key, surface) per input row."""
    surfaces = batch.column("norm_surface").to_pylist()
    sigs = canon.minhash_signatures(surfaces)
    out_band: list[str] = []
    out_surf: list[str] = []
    for s, sig in zip(surfaces, sigs):
        for key in canon.band_keys(sig):
            out_band.append(key)
            out_surf.append(s)
    return pa.table({"band_key": out_band, "surface": out_surf})


def edges_from_blocks_batch(batch: pa.Table) -> pa.Table:
    """(band_key, members:list<string>) -> verified undirected edges (a<b)."""
    a_out: list[str] = []
    b_out: list[str] = []
    for members in batch.column("members").to_pylist():
        if members is None or len(members) < 2:
            continue
        for a, b in canon.candidate_pairs_in_block(list(members)):
            if canon.verify_pair(a, b):
                a_out.append(a)
                b_out.append(b)
    return pa.table({"a": a_out, "b": b_out})


def unique_surfaces_ds(mentions_ds):
    """Distributed distinct over norm_surface (shuffle sized by vocab)."""
    return (
        mentions_ds.select_columns(["norm_surface"])
        .groupby("norm_surface").count()
        .select_columns(["norm_surface"])
    )


def distinct_surface_pairs(mentions_ds):
    """Distinct (norm_surface, surface) pairs in ONE streaming pass.

    Combiner pattern: per-batch pandas drop_duplicates shrinks the
    shuffle input from |mentions| rows to |per-batch vocabulary| rows,
    then a small groupby finishes the distinct. This is the only scan
    of the mentions table canonicalization needs."""

    from k_gap_ray.ops.materialize import coalesce_blocks

    def local_distinct(df):
        return df.drop_duplicates(subset=["norm_surface", "surface"])

    # order matters: arrow-cheap projection first (fine over many tiny
    # blocks), THEN coalesce the slim 2-column stream, THEN the pandas
    # combiner over few big blocks (pandas conversion costs ~constant
    # per block), THEN the small groupby
    return (
        coalesce_blocks(mentions_ds.select_columns(["norm_surface",
                                                    "surface"]))
        .map_batches(local_distinct, batch_format="pandas")
        .groupby(["norm_surface", "surface"]).count()
        .select_columns(["norm_surface", "surface"])
    )


def candidate_edges_ds(surfaces_ds):
    """unique surfaces -> verified candidate edge Dataset (a, b), deduped."""
    from k_gap_ray.dsutil import SafeUnique

    bands = surfaces_ds.map_batches(band_explode_batch, batch_format="pyarrow",
                                    zero_copy_batch=True)
    blocks = bands.groupby("band_key").aggregate(
        SafeUnique("surface", alias_name="members"))
    edges = blocks.map_batches(edges_from_blocks_batch, batch_format="pyarrow")
    # cross-band duplicate pairs -> distinct
    return edges.groupby(["a", "b"]).count().select_columns(["a", "b"])


def _cc_distributed(surfaces_ds, edges_ds, max_iters: int = 12):
    """Min-label propagation over Datasets until fixpoint.

    labels(node,label) starts as identity; each round every node takes
    the min of its own label and its neighbors' labels (join on the
    edge endpoint + groupby(node).min). Converges in O(component
    diameter) rounds — surface-form clusters are shallow (a handful of
    variants), so this terminates in a few rounds; the BTS paper
    (PAPERS.md) is the load-balanced upgrade path for deep components.
    """
    # both directions so propagation is symmetric
    fwd = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column("a"), "dst": t.column("b")}),
        batch_format="pyarrow")
    rev = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column("b"), "dst": t.column("a")}),
        batch_format="pyarrow")
    edges2 = drop_empty_blocks(fwd.union(rev).materialize()).materialize()

    labels = drop_empty_blocks(surfaces_ds.map_batches(
        lambda t: pa.table({"node": t.column("norm_surface"),
                            "label": t.column("norm_surface")}),
        batch_format="pyarrow").materialize()).materialize()

    def checksum(lbl_ds) -> tuple:
        """Order-insensitive fingerprint of the assignment: sum of
        row hashes of (node, label). One map+sum pass over the
        vocabulary-sized labels — far cheaper than the join-based
        change count it replaces (equal checksums <=> no change,
        w.h.p.). Vectorized (pandas row hash), and split into two
        32-bit lanes: a sum of 32-bit values over < 2^31 rows cannot
        overflow int64 REGARDLESS of block partitioning (a bare uint64
        sum spills into Python bigints, which Ray can't store as an
        Arrow column; per-block mods would make the total depend on
        the block layout)."""
        import numpy as np
        import pandas as pd
        import pyarrow.compute as pc

        def f(t: pa.Table) -> pa.Table:
            joined = pc.binary_join_element_wise(
                t.column("node"), t.column("label"), "\x1f")
            h = pd.util.hash_pandas_object(
                pd.Series(joined.to_pylist()), index=False).to_numpy()
            lo = int((h & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
            hi = int((h >> np.uint64(32)).sum(dtype=np.uint64))
            return pa.table({"lo": pa.array([lo], pa.int64()),
                             "hi": pa.array([hi], pa.int64())})

        parts = lbl_ds.map_batches(f, batch_format="pyarrow")
        from ray.data.aggregate import Sum

        row = parts.aggregate(Sum("lo", alias_name="lo"),
                              Sum("hi", alias_name="hi"))
        return (row.get("lo", 0), row.get("hi", 0))

    num_parts = max(2, min(32, edges2.num_blocks()))
    prev_sum = checksum(labels)
    converged = False
    for _ in range(max_iters):
        msgs = edges2.join(labels, join_type="inner",
                           num_partitions=num_parts,
                           on=("dst",), right_on=("node",))
        msgs = msgs.select_columns(["src", "label"]).rename_columns(
            {"src": "node"})
        labels = drop_empty_blocks(
            labels.union(msgs)
            .groupby("node").min("label")
            .rename_columns({"min(label)": "label"})
            .materialize()
        ).materialize()
        cur_sum = checksum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # fail LOUD: returning here would hand back non-minimal labels
        # with no signal (components deeper than max_iters propagate
        # one hop per round) — silently-wrong cluster ids are worse
        # than a retryable error (review finding)
        raise RuntimeError(
            f"connected-components label propagation did not converge "
            f"within max_iters={max_iters}; the graph has a component "
            f"with diameter > {max_iters} — rerun with a larger "
            f"max_iters")
    return labels  # Dataset(node, label)


_TAG_SEP = "\x00"  # tag prefix separator inside the single-list aggregate


def _canonicalize_distributed(pairs_ds):
    """Vocabulary-scale path: entities + mapping built ENTIRELY as
    Datasets — no take_all(), no driver-side dict/loop, no broadcast.

    labels (node, label=min-root) come from LSH banding + distributed
    label propagation. The entities table needs two per-root lists
    (members = nodes, surface_forms = raw surfaces); joins can't carry
    list payloads, so both streams are tagged into ONE (label, item)
    stream and a single SafeUnique groupby collects them, split back in
    the finishing map. Returns (entities Dataset sorted by entity_id,
    mapping Dataset(norm_surface, entity_id))."""
    surfaces_ds = (pairs_ds.groupby("norm_surface").count()
                   .select_columns(["norm_surface"])).materialize()
    edges = candidate_edges_ds(surfaces_ds)
    labels = drop_empty_blocks(
        _cc_distributed(surfaces_ds, edges).materialize())

    def to_mapping(t: pa.Table) -> pa.Table:
        iris = pa.array([canon.entity_iri(l)
                         for l in t.column("label").to_pylist()],
                        pa.string())
        return pa.table({"norm_surface": t.column("node"),
                         "entity_id": iris})

    mapping_ds = labels.map_batches(to_mapping, batch_format="pyarrow")

    from k_gap_ray.dsutil import SafeUnique, join_datasets

    member_stream = labels.map_batches(
        lambda t: pa.table({
            "label": t.column("label"),
            "item": pa.compute.binary_join_element_wise(
                pa.array(["m"] * t.num_rows), t.column("node"), _TAG_SEP)}),
        batch_format="pyarrow")
    # (label, surface) via a hash join of the vocab pairs on the labels
    pairs_labeled = join_datasets(
        pairs_ds, labels.rename_columns({"node": "norm_surface"}),
        on="norm_surface", scrub_right=False)  # labels already scrubbed
    form_stream = pairs_labeled.map_batches(
        lambda t: pa.table({
            "label": t.column("label"),
            "item": pa.compute.binary_join_element_wise(
                pa.array(["f"] * t.num_rows), t.column("surface"), _TAG_SEP)}),
        batch_format="pyarrow")

    grouped = (member_stream.union(form_stream)
               .groupby("label")
               .aggregate(SafeUnique("item", alias_name="items")))

    def build(t: pa.Table) -> pa.Table:
        ids, members, forms, sizes = [], [], [], []
        for label, items in zip(t.column("label").to_pylist(),
                                t.column("items").to_pylist()):
            ms = sorted(x[2:] for x in items if x.startswith("m" + _TAG_SEP))
            fs = sorted({x[2:] for x in items
                         if x.startswith("f" + _TAG_SEP)})
            ids.append(canon.entity_iri(label))
            members.append(ms)
            forms.append(fs)
            sizes.append(len(ms))
        return pa.table({
            "entity_id": pa.array(ids, pa.string()),
            "members": pa.array(members, pa.list_(pa.string())),
            "surface_forms": pa.array(forms, pa.list_(pa.string())),
            "size": pa.array(sizes, pa.int64()),
        })

    entities_ds = grouped.map_batches(build, batch_format="pyarrow") \
        .sort("entity_id")
    return entities_ds, mapping_ds


def canonicalize(mentions_ds, force_distributed_cc: bool = False):
    """mentions -> (entities, mapping).

    One streaming pass over mentions extracts the distinct
    (norm_surface, surface) vocabulary; everything after is sized by
    the vocabulary, not the corpus. Below DRIVER_CC_MAX unique
    surfaces, LSH blocking + union-find run in-driver with the exact
    oracle kernels (zero extra shuffles) and return
    (entities pa.Table, mapping dict) for ray.put broadcast. Above it
    — or when forced — everything stays distributed: returns
    (entities Dataset, mapping Dataset) and downstream rewrites become
    hash joins (ops.materialize handles both forms). Entity ids are
    lexicographic-min roots, deterministic under any block order
    (SURVEY.md 7.5.1).
    """
    pairs_ds = distinct_surface_pairs(mentions_ds).materialize()
    n_pairs = pairs_ds.count()

    if n_pairs > DRIVER_CC_MAX or force_distributed_cc:
        return _canonicalize_distributed(pairs_ds)

    return _canonicalize_driver(pairs_ds.take_all())


def connected_components(nodes_ds, edges_ds, node_col: str = "node",
                         driver_cap: int | None = None,
                         max_iters: int = 12):
    """Generic connected components (A8) over string-keyed nodes.

    ``nodes_ds`` is a Dataset with one string node per row;
    ``edges_ds`` a Dataset of undirected edges (a, b). Returns a
    Dataset(node, label) where label is the lexicographic-min member
    of the node's component (deterministic under any block order —
    zero-pad numeric ids before calling if numeric-min semantics are
    needed).

    Below ``driver_cap`` nodes AND edges (default DRIVER_CC_MAX) an
    exact union-find runs in-driver — both inputs are candidate-pair /
    vocabulary scale by construction, so this is the common path.
    Above it, the distributed min-label propagation (`_cc_distributed`)
    takes over with no driver-side materialization.
    """
    cap = DRIVER_CC_MAX if driver_cap is None else driver_cap
    surfaces = nodes_ds
    if node_col != "norm_surface":
        surfaces = nodes_ds.rename_columns({node_col: "norm_surface"})
    surfaces = surfaces.materialize()
    edges_ds = edges_ds.materialize()
    if surfaces.count() > cap or edges_ds.count() > cap:
        labels = _cc_distributed(surfaces, edges_ds, max_iters=max_iters)
        return labels

    import ray.data as rd

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    nodes = [r["norm_surface"] for r in surfaces.take_all()]
    for n in nodes:
        parent.setdefault(n, n)
    for e in edges_ds.take_all():
        a, b = e["a"], e["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    label_of = {n: find(n) for n in parent}
    out = sorted(label_of.items())
    return rd.from_arrow(pa.table({
        "node": pa.array([n for n, _ in out], pa.string()),
        "label": pa.array([l for _, l in out], pa.string())}))


def canonicalize_vocab_table(pairs: pa.Table):
    """Driver fast path over an ALREADY-SMALL (norm_surface, surface)
    pair table — e.g. the kind=vocab combiner rows whose parquet
    metadata showed a row count under DRIVER_CC_MAX. Zero Ray
    executions: reading + deduping a vocabulary-sized table on the
    driver is cheaper than one Dataset pipeline drain."""
    df = pairs.to_pandas().drop_duplicates(
        subset=["norm_surface", "surface"])
    return _canonicalize_driver(df.to_dict("records"))


def _canonicalize_driver(pair_rows: list[dict]):
    surfaces = sorted({r["norm_surface"] for r in pair_rows})
    comp = canon.cluster_surfaces(surfaces)

    clusters: dict[str, list[str]] = {}
    for node, root in comp.items():
        clusters.setdefault(root, []).append(node)
    forms_by_norm: dict[str, set[str]] = {}
    for r in pair_rows:
        forms_by_norm.setdefault(r["norm_surface"], set()).add(r["surface"])

    mapping: dict[str, str] = {}
    ids, members, forms, sizes = [], [], [], []
    for root in sorted(clusters):
        ms = sorted(clusters[root])
        iri = canon.entity_iri(root)
        for m in ms:
            mapping[m] = iri
        ids.append(iri)
        members.append(ms)
        forms.append(sorted(set().union(*(forms_by_norm.get(m, set())
                                          for m in ms))))
        sizes.append(len(ms))
    entities = pa.table({
        "entity_id": pa.array(ids, type=pa.string()),
        "members": pa.array(members, type=pa.list_(pa.string())),
        "surface_forms": pa.array(forms, type=pa.list_(pa.string())),
        "size": pa.array(sizes, type=pa.int64()),
    })
    return entities, mapping


def mention_counts(mentions_ds, mapping_ref):
    """Mentions per canonical entity — the skew-prone aggregate.

    Zipf head entities make a naive groupby(entity) hot; this does
    partial pre-aggregation inside map_batches (one row per
    surface/entity per batch) so the shuffle carries per-batch
    partials, not raw mentions — the combiner pattern from SURVEY.md
    section 7.4. ``mapping_ref`` may be a dict / ObjectRef (broadcast
    path) or a mapping Dataset(norm_surface, entity_id): then the
    partials are joined to the mapping instead (distributed-vocabulary
    path; the join input is the pre-aggregated partials, never the raw
    mention stream)."""
    import ray
    import ray.data as rd

    if isinstance(mapping_ref, rd.Dataset):
        from k_gap_ray.dsutil import join_datasets

        def partial_by_surface(batch: pa.Table) -> pa.Table:
            import pandas as pd

            vc = pd.Series(
                batch.column("norm_surface").to_pylist()).value_counts()
            return pa.table({"norm_surface": vc.index.astype(str),
                             "partial_count": vc.to_numpy()})

        partials = mentions_ds.map_batches(partial_by_surface,
                                           batch_format="pyarrow")
        joined = join_datasets(partials, mapping_ref, on="norm_surface",
                               join_type="left_outer",
                               scrub_left=False)  # map-produced
        return (joined.map_batches(
            lambda t: pa.table({
                "entity_id": pa.compute.fill_null(
                    t.column("entity_id"), "urn:kgap:entity:unknown"),
                "partial_count": t.column("partial_count")}),
            batch_format="pyarrow")
            .groupby("entity_id").sum("partial_count")
            .rename_columns({"sum(partial_count)": "n_mentions"}))

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        mapping = ray.get(mapping_ref) if not isinstance(mapping_ref, dict) \
            else mapping_ref
        s = pd.Series(batch.column("norm_surface").to_pylist())
        ents = s.map(mapping).fillna("urn:kgap:entity:unknown")
        vc = ents.value_counts()
        return pa.table({"entity_id": vc.index.astype(str),
                         "partial_count": vc.to_numpy()})

    return (
        mentions_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("entity_id").sum("partial_count")
        .rename_columns({"sum(partial_count)": "n_mentions"})
    )
