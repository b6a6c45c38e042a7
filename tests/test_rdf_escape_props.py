"""Property tests for the S8 dump formats: ANY literal content must
survive the write->parse cycle for both N-Triples/N-Quads and TriG
(quotes, backslashes, newlines, tabs, unicode — the crawl-text
payloads the docs pipeline actually dumps)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from k_gap_ray.sources.rdfio import (format_ntriples_batch,
                                     format_trig_batch,
                                     parse_ntriples_batch,
                                     parse_turtle_text)

COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype",
        "obj_lang", "graph"]

# IRI bodies: N-Triples forbids '>' and whitespace inside <...>
iri = st.text(
    st.characters(min_codepoint=33, max_codepoint=126,
                  blacklist_characters=">< \"{}|^`\\"),
    min_size=1, max_size=12).map(lambda s: f"urn:t:{s}")
# literal payloads: full unicode incl. the escape-relevant chars
lit = st.text(
    st.one_of(st.characters(blacklist_categories=("Cs",),
                            max_codepoint=0x2FFF),
              st.sampled_from('"\\\n\r\t')),
    max_size=40)
lang = st.one_of(st.just(""), st.sampled_from(["en", "de", "pt-BR"]))
dt = st.one_of(st.just(""), st.just(
    "http://www.w3.org/2001/XMLSchema#integer"))


@st.composite
def quad_rows(draw):
    rows = []
    for _ in range(draw(st.integers(1, 6))):
        is_lit = draw(st.booleans())
        if is_lit:
            o, d, lg = draw(lit), draw(dt), ""
            if not d:
                lg = draw(lang)
        else:
            o, d, lg = draw(iri), "", ""
        rows.append((draw(iri), draw(iri), o, is_lit, d, lg,
                     draw(st.one_of(st.just(""), iri))))
    return rows


def _table(rows) -> pa.Table:
    return pa.table({c: pa.array([r[i] for r in rows],
                    pa.bool_() if c == "obj_is_literal" else pa.string())
                    for i, c in enumerate(COLS)})


def _key(r):
    return (r["subj"], r["pred"], r["obj"], r["obj_is_literal"],
            r["obj_datatype"], r["obj_lang"], r.get("graph", ""))


@settings(max_examples=60, deadline=None)
@given(quad_rows())
def test_ntriples_roundtrip_any_literal(rows):
    text = "\n".join(
        format_ntriples_batch(_table(rows)).column("text").to_pylist())
    back = parse_ntriples_batch(pa.table({"text": text.split("\n")}))
    assert sorted(_key(r) for r in back.to_pylist()) == \
        sorted(tuple(r) for r in rows)


@settings(max_examples=60, deadline=None)
@given(quad_rows())
def test_trig_roundtrip_any_literal(rows):
    text = "\n".join(
        format_trig_batch(_table(rows)).column("text").to_pylist())
    got, skipped = parse_turtle_text(text)
    assert skipped == 0
    assert sorted(_key(r) for r in got) == sorted(tuple(r) for r in rows)
