"""Line-level boilerplate removal (functions/lines.py)."""

import numpy as np
import pyarrow as pa
import pytest

from k_gap_ray.functions.lines import (_partial_counts, boilerplate_lines,
                                       explode_lines, strip_boilerplate)


def _toy_table():
    return pa.table({
        "doc_id": [1, 2, 3],
        "text": ["header\nbody one\nfooter",
                 "header\nbody two\nheader\nfooter",
                 "body three\nfooter"],
    })


def _toy_ds():
    import ray.data as rd

    return rd.from_arrow(_toy_table())


def test_partial_counts_distinct_per_doc():
    """A line repeated WITHIN one doc counts once toward its doc
    frequency (doc 2 has 'header' twice)."""
    p = _partial_counts(_toy_table(), "doc_id", "text")
    d = dict(zip(p.column("line").to_pylist(), p.column("n").to_pylist()))
    assert d == {"header": 2, "footer": 3, "body one": 1,
                 "body two": 1, "body three": 1}


def test_explode_lines(ray_session):
    rows = explode_lines(_toy_ds()).take_all()
    assert len(rows) == 9
    doc2 = sorted((r["line_no"], r["line"]) for r in rows
                  if r["doc_id"] == 2)
    assert doc2 == [(0, "header"), (1, "body two"), (2, "header"),
                    (3, "footer")]


@pytest.mark.parametrize("cap", [2_000_000, 0])
def test_strip_boilerplate_both_paths(ray_session, cap):
    """cap=0 forces the distributed groupby fallback; results must be
    identical to the driver-merge path."""
    assert sorted(boilerplate_lines(_toy_ds(), min_docs=2,
                                    broadcast_cap=cap)) \
        == ["footer", "header"]
    out = {r["doc_id"]: r
           for r in strip_boilerplate(_toy_ds(), min_docs=2,
                                      broadcast_cap=cap).take_all()}
    assert out[1] == {"doc_id": 1, "text_clean": "body one",
                      "n_kept": 1, "n_dropped": 2}
    assert out[2] == {"doc_id": 2, "text_clean": "body two",
                      "n_kept": 1, "n_dropped": 3}
    assert out[3] == {"doc_id": 3, "text_clean": "body three",
                      "n_kept": 1, "n_dropped": 1}


def test_strip_all_lines_dropped(ray_session):
    """A document made entirely of boilerplate comes back as the empty
    string, not null, with n_kept=0."""
    import ray.data as rd

    docs = rd.from_items([
        {"doc_id": 1, "text": "same"},
        {"doc_id": 2, "text": "same"},
        {"doc_id": 3, "text": "same\nunique bit"},
    ])
    out = {r["doc_id"]: r
           for r in strip_boilerplate(docs, min_docs=2).take_all()}
    assert out[1]["text_clean"] == "" and out[1]["n_kept"] == 0
    assert out[3]["text_clean"] == "unique bit"


def test_strip_no_boilerplate_is_identity(ray_session):
    import ray.data as rd

    docs = rd.from_items([
        {"doc_id": 1, "text": "a\nb"},
        {"doc_id": 2, "text": "c\nd"},
    ])
    out = {r["doc_id"]: r
           for r in strip_boilerplate(docs, min_docs=2).take_all()}
    assert out[1]["text_clean"] == "a\nb" and out[1]["n_dropped"] == 0
    assert out[2]["text_clean"] == "c\nd"


def test_strip_order_preserved(ray_session):
    """Surviving lines keep original relative order even when dropped
    lines are interleaved."""
    import ray.data as rd

    docs = rd.from_items([
        {"doc_id": 1, "text": "x\nkeep1\nx\nkeep2\nx\nkeep3"},
        {"doc_id": 2, "text": "x"},
    ])
    out = {r["doc_id"]: r
           for r in strip_boilerplate(docs, min_docs=2).take_all()}
    assert out[1]["text_clean"] == "keep1\nkeep2\nkeep3"


def test_paragraph_unit_strip(ray_session):
    """sep="\\n\\n" switches the dedup unit to paragraphs: a repeated
    footer paragraph is stripped whole while a doc sharing only one of
    its LINES is untouched."""
    import pyarrow as pa
    import ray.data as rd

    footer = "contact us\nall rights reserved"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            f"unique body zero\n\n{footer}",
            f"unique body one\n\n{footer}",
            "contact us\nsomething else entirely",  # shares a LINE only
        ], pa.string()),
    })
    out = {r["doc_id"]: r for r in strip_boilerplate(
        rd.from_arrow(docs), min_docs=2, sep="\n\n").take_all()}
    assert out[0]["text_clean"] == "unique body zero"
    assert out[1]["text_clean"] == "unique body one"
    assert out[2]["text_clean"] == "contact us\nsomething else entirely"
    assert out[0]["n_dropped"] == 1 and out[2]["n_dropped"] == 0
