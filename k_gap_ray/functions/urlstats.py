"""Web-corpus URL analytics: vectorized URL parsing, normalization,
and per-domain rollups.

A webtext pipeline's first grouping key is almost always the
registrable domain (crawl accounting, per-site quality priors,
politeness buckets). Everything here is one Arrow kernel pass per
batch — ``pc.extract_regex`` with named groups does the split, string
kernels derive the rest; no Python row loops, no shuffle until the
domain rollup's single groupby.

Reference parity: the reference keys provenance by source URL / named
graph per feed (ldes-consumer materializes per-feed graphs; pages
carry their crawl URL through the KG pipeline — see
pipelines/docs_kg.py url plumbing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
           r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$")


def _struct_field(s, name):
    return pc.struct_field(s, name)


def parse_urls(ds, url_col: str = "url", keep: list[str] | None = None):
    """Parse a URL column into components + derived features.

    Output columns (plus ``keep``, default: every input column):
    scheme, host (lowercased), domain (host minus a leading ``www.``),
    reg_domain (last two dot-labels — the registrable-domain
    approximation public-suffix data would refine), tld, path_depth
    (non-empty ``/`` segments), n_params (query k=v pairs), is_https,
    has_fragment. Unparseable rows null the component columns rather
    than dropping (callers filter on ``scheme IS NULL``)."""

    def f(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        parts = pc.extract_regex(urls, pattern=_URL_RE)
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) \
            else parts
        ok = pc.is_valid(parts)
        scheme = pc.utf8_lower(_struct_field(parts, "scheme"))
        host = pc.utf8_lower(_struct_field(parts, "host"))
        path = _struct_field(parts, "path")
        query = _struct_field(parts, "query")
        frag = _struct_field(parts, "frag")
        domain = pc.replace_substring_regex(host, pattern=r"^www\.",
                                            replacement="")
        # registrable domain ~ last two labels; tld = last label
        # (regex tail-extracts — list_element needs scalar indices)
        tld = pc.struct_field(
            pc.extract_regex(domain, pattern=r"(?P<tld>[^.]*)$"), "tld")
        reg_m = pc.extract_regex(domain, pattern=r"(?P<reg>[^.]+\.[^.]+)$")
        reg = pc.if_else(pc.is_valid(reg_m),
                         pc.struct_field(reg_m, "reg"), domain)
        # path depth = '/'-separated non-empty segments: slashes minus
        # a trailing one ("/" -> 0, "/a/b/" -> 2)
        n_slash = pc.count_substring(path, pattern="/")
        trail = pc.if_else(pc.ends_with(path, "/"), 1, 0)
        depth = pc.max_element_wise(
            pc.subtract(n_slash, trail), 0).cast(pa.int64())
        nq = pc.if_else(
            pc.equal(query, ""), pa.scalar(0, pa.int64()),
            pc.add(pc.count_substring(query, pattern="&"), 1)
            .cast(pa.int64()))
        keep_cols = keep if keep is not None else t.column_names
        out = {c: t.column(c) for c in keep_cols}

        def masked(col):
            return pc.if_else(ok, col, pa.scalar(None, pa.string()))

        out.update({
            "scheme": masked(scheme), "host": masked(host),
            "domain": masked(domain), "reg_domain": masked(reg),
            "tld": masked(tld),
            "path_depth": pc.if_else(ok, depth, pa.scalar(None, pa.int64())),
            "n_params": pc.if_else(ok, nq, pa.scalar(None, pa.int64())),
            "is_https": pc.if_else(ok, pc.equal(scheme, "https"),
                                   pa.scalar(None, pa.bool_())),
            "has_fragment": pc.if_else(
                ok, pc.not_equal(frag, ""), pa.scalar(None, pa.bool_())),
        })
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def normalize_urls(ds, url_col: str = "url", out_col: str = "url_norm"):
    """Canonical URL form for exact dedup: lowercase scheme+host, drop
    the fragment, strip one trailing slash from a non-root path."""

    def f(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        parts = pc.extract_regex(urls, pattern=_URL_RE)
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) \
            else parts
        ok = pc.is_valid(parts)
        scheme = pc.utf8_lower(_struct_field(parts, "scheme"))
        host = pc.utf8_lower(_struct_field(parts, "host"))
        path = _struct_field(parts, "path")
        # strip ONE trailing slash from a non-root path ("(.)/$" keeps
        # the root "/" intact — the group must match a preceding char)
        path = pc.replace_substring_regex(path, pattern="(.)/$",
                                          replacement="\\1")
        query = _struct_field(parts, "query")
        norm = pc.binary_join_element_wise(scheme, "://", "")
        norm = pc.binary_join_element_wise(norm, host, path, "")
        norm = pc.if_else(
            pc.not_equal(query, ""),
            pc.binary_join_element_wise(norm, "?", query, ""), norm)
        return t.append_column(out_col, pc.if_else(
            ok, norm, pa.scalar(None, pa.string())))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def domain_stats(ds, domain_col: str = "reg_domain",
                 chars_col: str | None = None):
    """Per-domain rollup: doc count (+ total chars when given) via
    per-batch partial aggregation, then one small groupby-sum — the
    crawl-accounting shape that survives domain skew (partials cap
    shuffle rows at batches x distinct-domains-per-batch)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        dom = t.column(domain_col)
        uniq = pc.unique(dom.combine_chunks()
                         if isinstance(dom, pa.ChunkedArray) else dom)
        idx = pc.index_in(dom, value_set=uniq).to_numpy(
            zero_copy_only=False)
        n = np.bincount(idx, minlength=len(uniq)).astype(np.int64)
        cols = {"reg_domain": uniq, "n_docs": pa.array(n, pa.int64())}
        if chars_col is not None:
            ch = t.column(chars_col).to_numpy(zero_copy_only=False)
            cols["total_chars"] = pa.array(
                np.bincount(idx, weights=ch.astype(np.float64),
                            minlength=len(uniq)).astype(np.int64),
                pa.int64())
        return pa.table(cols)

    aggs = [Sum(on="n_docs", alias_name="n_docs")]
    if chars_col is not None:
        aggs.append(Sum(on="total_chars", alias_name="total_chars"))
    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("reg_domain").aggregate(*aggs))
