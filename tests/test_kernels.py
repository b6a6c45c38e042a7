"""Unit tests for the deterministic oracle kernels (no Ray)."""

from __future__ import annotations

from k_gap_ray.oracle import (
    ALIASES,
    char_shingles,
    cluster_surfaces,
    entity_iri,
    extract_from_text,
    extract_text,
    jaccard,
    norm_surface,
)
from k_gap_ray.oracle.canon import (
    UnionFind,
    band_keys,
    minhash_signature,
)
from k_gap_ray.synth import gen_pages


def test_extract_text_byte_identical():
    # north-rule per-row invariant: extractor(html) == text, byte for byte
    t = gen_pages(500)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(html) == text


def test_extract_strips_boilerplate():
    t = gen_pages(5)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert b"<nav>" in html and b"<footer>" in html
        assert "About" not in text and "rights reserved" not in text


def test_norm_surface():
    assert norm_surface("  Marine   Institute. ") == "marine institute"
    assert norm_surface("The Marine Institute") == "the marine institute"
    assert norm_surface("PROF. Vandamme") == "prof. vandamme"


def test_extract_from_text_triples_and_mentions():
    text = "Marine Institute operates RV Belgica.\nThe Marine Institute was founded in 1952."
    triples, mentions = extract_from_text(text)
    assert len(triples) == 2
    ent = [t for t in triples if not t.obj_is_literal][0]
    assert ent.subj == "Marine Institute"
    assert ent.pred == "urn:kgap:pred:operates"
    assert ent.obj == "RV Belgica"
    lit = [t for t in triples if t.obj_is_literal][0]
    assert lit.obj == "1952"
    assert lit.obj_datatype.endswith("gYear")
    # mentions carry offsets into the text
    for m in mentions:
        assert text[m.start:m.end] == m.surface
        assert m.norm in ALIASES
        assert m.link_score == 1.0


def test_extract_rejects_unknown_entities():
    triples, mentions = extract_from_text("Some Unknown Thing operates Another Thing.")
    assert triples == [] and mentions == []


def test_minhash_deterministic_and_similarity_ordered():
    a = minhash_signature("marine institute")
    b = minhash_signature("marine institute")
    assert (a == b).all()
    # similar strings agree on more minhash coordinates than dissimilar ones
    sim = (minhash_signature("marine institute") ==
           minhash_signature("the marine institute")).sum()
    dis = (minhash_signature("marine institute") ==
           minhash_signature("flanders bay")).sum()
    assert sim > dis


def test_band_keys_shape():
    keys = band_keys(minhash_signature("x y z"))
    assert len(keys) == 16
    assert len(set(keys)) == 16  # band index is baked into the key


def test_jaccard():
    assert jaccard(set("abc"), set("abc")) == 1.0
    assert jaccard(set(), set()) == 1.0
    assert jaccard(set("ab"), set("cd")) == 0.0
    assert char_shingles("ab") == {"^ab", "ab$"}


def test_union_find_order_independent():
    import random

    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("c", "d")]
    roots_ref = None
    for seed in range(5):
        rng = random.Random(seed)
        e = edges[:]
        rng.shuffle(e)
        uf = UnionFind()
        for u, v in e:
            uf.union(u, v)
        comp = uf.components()
        roots = {k: comp[k] for k in sorted(comp)}
        if roots_ref is None:
            roots_ref = roots
        assert roots == roots_ref
    assert roots_ref["d"] == "a" and roots_ref["y"] == "x"


def test_cluster_surfaces_golden():
    surfaces = ["marine institute", "the marine institute", "marine institutte",
                "flanders bay", "rv belgica", "r/v belgica"]
    comp = cluster_surfaces(surfaces)
    assert comp["the marine institute"] == "marine institute"
    assert comp["marine institutte"] == "marine institute"
    assert comp["r/v belgica"] == comp["rv belgica"]
    assert comp["flanders bay"] == "flanders bay"


def test_cluster_idempotent_and_permutation_invariant():
    import random

    surfaces = sorted({norm_surface(f) for _, _, forms in
                       __import__("k_gap_ray.oracle.kernel", fromlist=["GAZETTEER"]).GAZETTEER
                       for f in forms})
    ref = cluster_surfaces(surfaces)
    for seed in (1, 2):
        s = surfaces[:]
        random.Random(seed).shuffle(s)
        assert cluster_surfaces(s) == ref


def test_entity_iri_slug():
    assert entity_iri("marine institute") == "urn:kgap:entity:marine-institute"
    assert entity_iri("r/v belgica") == "urn:kgap:entity:r-v-belgica"
