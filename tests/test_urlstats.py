"""URL analytics: vectorized parse/normalize kernels and the
per-domain rollup (webtext crawl accounting)."""

import pyarrow as pa
import ray.data as rd

from k_gap_ray.functions.urlstats import (
    domain_stats,
    normalize_urls,
    parse_urls,
)

URLS = [
    "https://www.example.com/a/b?x=1&y=2#frag",
    "http://cdn.news.site.org/",
    "https://localhost",
    "HTTPS://UPPER.COM/path/",
    "not a url at all",
]


def _by_id(ds):
    return {r["doc_id"]: r for r in ds.take_all()}


def test_parse_urls(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(URLS)), pa.int64()),
        "url": URLS}))
    out = _by_id(parse_urls(ds))
    r = out[0]
    assert (r["scheme"], r["host"], r["domain"], r["reg_domain"],
            r["tld"]) == ("https", "www.example.com", "example.com",
                          "example.com", "com")
    assert (r["path_depth"], r["n_params"], r["is_https"],
            r["has_fragment"]) == (2, 2, True, True)
    r = out[1]
    # www. is stripped, other subdomains stay in domain but not in the
    # registrable approximation
    assert r["domain"] == "cdn.news.site.org"
    assert r["reg_domain"] == "site.org" and r["tld"] == "org"
    assert r["path_depth"] == 0 and r["n_params"] == 0
    r = out[2]
    assert r["reg_domain"] == "localhost" and r["tld"] == "localhost"
    # scheme+host lowercase; trailing slash is not a segment
    r = out[3]
    assert r["scheme"] == "https" and r["host"] == "upper.com"
    assert r["path_depth"] == 1
    # unparseable rows null the feature columns, keep the row
    r = out[4]
    assert r["scheme"] is None and r["path_depth"] is None
    assert r["is_https"] is None


def test_normalize_urls(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "url": ["HTTPS://Www.Ex.COM/a/b/?x=1#f",
                "https://ex.com/",
                "https://ex.com",
                "junk"]}))
    out = _by_id(normalize_urls(ds))
    assert out[0]["url_norm"] == "https://www.ex.com/a/b?x=1"
    assert out[1]["url_norm"] == "https://ex.com/"  # root slash kept
    assert out[2]["url_norm"] == "https://ex.com"
    assert out[3]["url_norm"] is None


def test_domain_stats(ray_session):
    rows = [
        {"reg_domain": "a.com", "n_chars": 10},
        {"reg_domain": "a.com", "n_chars": 5},
        {"reg_domain": "b.org", "n_chars": 7},
    ]
    out = {r["reg_domain"]: (r["n_docs"], r["total_chars"])
           for r in domain_stats(rd.from_items(rows),
                                 chars_col="n_chars").take_all()}
    assert out == {"a.com": (2, 15), "b.org": (1, 7)}


def test_workflow_url_steps(ray_session):
    from k_gap_ray.workflow import run_workflow

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "url": ["https://a.com/x", "https://b.org"]}))
    out = run_workflow([
        {"op": "parse_urls"},
        {"op": "select", "columns": ["doc_id", "reg_domain"]},
    ], dataset=ds)
    assert {r["reg_domain"] for r in out.take_all()} == {"a.com", "b.org"}
