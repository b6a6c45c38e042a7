"""End-to-end KG-over-documents pipeline vs its pure-SQL oracle.

The oracle's validity rests on two structural claims that these tests
pin explicitly (so a gazetteer edit that breaks them fails loudly here,
not as a silent hash mismatch at the driver gate):

1. the verified-pair graph over alias norms is STATIC (band keys are a
   pure function of each surface; MAX_BLOCK can't truncate a <=64-norm
   vocabulary), and components of that graph restricted to any subset
   of appearing norms equal what union-find over LSH pairs produces;
2. the derived sentences round-trip byte-identically through the real
   HTML extractor and OIE kernel.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest


def _hash_df(df):
    d = df[sorted(df.columns)].astype(str)
    d = d.sort_values(list(d.columns)).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()


def test_static_edges_match_golden_clustering():
    """Components of the static edge graph == cluster_surfaces (the
    golden single-process clustering the distributed path is
    parity-tested against), over the full alias-norm vocabulary."""
    from k_gap_ray.oracle.canon import UnionFind, cluster_surfaces
    from k_gap_ray.pipelines.docs_kg import static_alias_edges

    norms, edges = static_alias_edges()
    uf = UnionFind()
    for n in norms:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    assert uf.components() == cluster_surfaces(norms)


def test_token_hash_matches_duckdb():
    import duckdb

    from k_gap_ray.pipelines.docs_kg import HASH_B, HASH_M, token_hash

    toks = ["alpha", "x", "", "Zz9", "hash", "a b"[0:1]]
    con = duckdb.connect()
    expr = ("list_reduce(list_prepend(0, list_transform(list_filter("
            "string_split(tok, ''), c -> c <> ''), c -> "
            "unicode(c)::BIGINT)), "
            f"(a, b) -> ((a::HUGEINT * {HASH_B} + b) % {HASH_M})::BIGINT)")
    got = [r[0] for r in con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS tok)", [toks]).fetchall()]
    assert got == [token_hash(t) for t in toks]


def test_pages_roundtrip_through_extractor():
    """html -> extract_text is byte-identical to the text column (the
    input_hint per-row invariant), and every complete token triple
    yields exactly one OIE triple."""
    from k_gap_ray.oracle.kernel import extract_from_text, extract_text
    from k_gap_ray.pipelines.docs_kg import _build_pages_batch

    docs = pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta leftover",
                          "ab", "q w e"], pa.string()),
        "lang": pa.array(["en", "de", "fr"]),
        "source": pa.array(["src3", "src3", "src9"]),
    })
    pages = _build_pages_batch(docs)
    n_triples = []
    for h, t in zip(pages.column("html").to_pylist(),
                    pages.column("text").to_pylist()):
        assert extract_text(h) == t
        trips, _ = extract_from_text(t)
        n_triples.append(len(trips))
    assert n_triples == [2, 0, 1]  # 7 toks -> 2 sentences; 1 tok -> 0


def test_kg_from_docs_matches_sql_oracle(ray_session):
    """Engine == oracle on a table with the nasty edges: duplicate
    sentences across sources (min-url dedup), a doc too short for any
    sentence, a null text, and multi-batch execution."""
    import duckdb
    import ray.data as rd

    from k_gap_ray.pipelines.docs_kg import kg_from_docs, sql_docs_kg

    texts = [
        "alpha beta gamma",          # 1 sentence
        "alpha beta gamma delta",    # same sentence + leftover token
        "xy",                        # too short
        None,                        # null text
        "p q r alpha beta gamma",    # same sentence again, other source
        "one two three four five six seven eight nine",  # 3 sentences
    ]
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["srcB", "srcA", "srcA", "srcB", "srcC", "srcA"]),
    })
    eng = kg_from_docs(rd.from_arrow(docs).repartition(3)).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    ora = con.execute(sql_docs_kg()).df()
    assert len(eng) == len(ora)
    assert sorted(eng.columns) == sorted(ora.columns)
    assert _hash_df(eng) == _hash_df(ora)
    # min-url provenance: the duplicated quad keeps the lexicographic
    # minimum url within its graph; srcA and srcC are separate graphs
    dup = eng[eng.graph == "urn:kgap:web:srcA.example"]
    assert (dup.url.str.startswith("https://srcA.example/")).all()


def test_kg_entities_from_docs_matches_sql_oracle(ray_session):
    """Entity table (flattened members/surface_forms) == recursive-CTE
    component oracle, on the same nasty-edges table as the triples
    test plus multi-batch execution."""
    import duckdb
    import ray.data as rd

    from k_gap_ray.pipelines.docs_kg import (
        kg_entities_from_docs,
        sql_docs_entities,
    )

    texts = [
        "alpha beta gamma",
        "alpha beta gamma delta",
        "xy",
        None,
        "p q r alpha beta gamma",
        "one two three four five six seven eight nine",
    ]
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["srcB", "srcA", "srcA", "srcB", "srcC", "srcA"]),
    })
    eng = kg_entities_from_docs(rd.from_arrow(docs).repartition(3)).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    ora = con.execute(sql_docs_entities()).df()
    assert len(eng) == len(ora) > 0
    assert sorted(eng.columns) == sorted(ora.columns)
    assert _hash_df(eng) == _hash_df(ora)
    # every multi-member entity's members string is sorted and joined
    multi = eng[eng.n_members > 1]
    for m in multi.members:
        parts = m.split("|")
        assert parts == sorted(parts) and len(parts) > 1


def test_kg_mention_counts_from_docs_matches_sql_oracle(ray_session):
    """Per-entity mention counts (combiner aggregate) == the UNION ALL
    subject+object counting oracle, multi-batch."""
    import duckdb
    import ray.data as rd

    from k_gap_ray.pipelines.docs_kg import (
        kg_mention_counts_from_docs,
        sql_docs_mention_counts,
    )

    texts = [
        "alpha beta gamma",
        "alpha beta gamma delta",
        "xy",
        None,
        "p q r alpha beta gamma",
        "one two three four five six seven eight nine",
    ]
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["srcB", "srcA", "srcA", "srcB", "srcC", "srcA"]),
    })
    eng = kg_mention_counts_from_docs(
        rd.from_arrow(docs).repartition(3)).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    ora = con.execute(sql_docs_mention_counts()).df()
    assert len(eng) == len(ora) > 0
    assert _hash_df(eng) == _hash_df(ora)
    # duplicated sentences are NOT deduped in the mention stream: total
    # mentions >= 2 per repeated "alpha beta gamma" occurrence
    assert eng.n_mentions.sum() >= 6


@pytest.mark.slow
def test_kg_docs_matches_oracle_at_sf0001(ray_session):
    import duckdb
    import ray.data as rd

    from k_gap_ray.pipelines.docs_kg import kg_from_docs, sql_docs_kg

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    eng = kg_from_docs(docs).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    ora = con.execute(sql_docs_kg()).df()
    assert len(eng) == len(ora) > 0
    assert _hash_df(eng) == _hash_df(ora)
