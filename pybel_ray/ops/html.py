"""HTML operators for crawl-style corpora: link extraction, tag
stripping, and the host-to-host link graph.

This is the web-graph-construction surface of a web-scale pipeline
(the Common-Crawl-style host graph): ``extract_links`` pulls anchors
out of raw HTML pages, ``host_graph`` aggregates them into a weighted
host adjacency — the input PageRank / k-core / components already
operate on (``ops/graph.py``).

Scale notes: link extraction is one ``map_batches`` pass (a compiled
RE2-compatible regex; the per-document ``finditer`` scan is inherent to
multi-match extraction — pyarrow has no extract-all kernel — and is
amortized over Arrow batches like the linking trie engine).  Tag
stripping is fully vectorized (``pc.replace_substring_regex``).
``host_graph`` ships one partial-count row per distinct host pair per
batch into a single groupby exchange.  Text never shuffles: links and
hosts are the only exchanged rows.

Reference scope note: the reference engine has no HTML surface; this is
the beyond-reference webtext family (SURVEY.md §2), oracle-checked via
DuckDB ``regexp_extract_all`` over the identical synthesized pages.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pybel_ray.ops._kernels import runlength_distinct_counts
from pybel_ray.ops.urls import URL_PATTERN

__all__ = ["extract_links", "strip_tags", "host_graph", "anchor_stats"]

#: shared verbatim with the SQL oracle (RE2-compatible, no backrefs)
LINK_PATTERN = r'<a href="([^"]*)">([^<]*)</a>'

#: tags → one space, then whitespace runs collapse (same two passes in SQL)
TAG_PATTERN = r"<[^>]*>"


def extract_links(ds, html_col: str = "html", url_col: str = "url"):
    """Flatten every ``<a href="...">anchor</a>`` into one row
    ``(src_url, dst_url, anchor)``.

    Resolution mirrors the SQL oracle exactly: absolute ``http(s)://``
    hrefs pass through, root-relative ``/...`` hrefs join onto the
    source page's host, anything else (mailto:, fragment, empty,
    protocol-relative) is dropped.
    """
    rx = re.compile(LINK_PATTERN)

    def _f(t: pa.Table) -> pa.Table:
        html = t.column(html_col)
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        urls = t.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        hosts = pc.fill_null(
            pc.struct_field(pc.extract_regex(urls, URL_PATTERN), "host"), "",
        ).to_pylist()
        src, dst, anc = [], [], []
        for page, u, h in zip(html.to_pylist(), urls.to_pylist(), hosts):
            if page is None or u is None:
                continue
            for m in rx.finditer(page):
                href = m.group(1)
                if href.startswith("http://") or href.startswith("https://"):
                    resolved = href
                elif href.startswith("//"):
                    # protocol-relative: dropped (documented contract)
                    continue
                elif href.startswith("/"):
                    resolved = "https://" + h + href
                else:
                    continue
                src.append(u)
                dst.append(resolved)
                anc.append(m.group(2))
        return pa.Table.from_arrays(
            [pa.array(src, pa.string()), pa.array(dst, pa.string()),
             pa.array(anc, pa.string())],
            names=["src_url", "dst_url", "anchor"],
        )

    return ds.select_columns([html_col, url_col]).map_batches(
        _f, batch_format="pyarrow",
    )


def strip_tags(ds, html_col: str = "html", out_col: str = "text"):
    """Replace tags with a space, collapse whitespace runs, trim —
    vectorized RE2 kernels, byte-identical to the two-pass DuckDB
    ``regexp_replace(..., 'g')`` oracle."""

    def _f(t: pa.Table) -> pa.Table:
        html = t.column(html_col)
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        txt = pc.replace_substring_regex(html, TAG_PATTERN, " ")
        txt = pc.replace_substring_regex(txt, r"\s+", " ")
        txt = pc.utf8_trim_whitespace(txt)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, txt)

    return ds.map_batches(_f, batch_format="pyarrow")


def host_graph(
    links, src_col: str = "src_url", dst_col: str = "dst_url",
):
    """Weighted host adjacency ``(src_host, dst_host, n)`` from a link
    table: vectorized host extraction, per-batch pair run-length counts
    (one row per distinct pair per batch), ONE groupby exchange."""

    def _partial(t: pa.Table) -> pa.Table:
        cols = []
        for c in (src_col, dst_col):
            u = t.column(c)
            if isinstance(u, pa.ChunkedArray):
                u = u.combine_chunks()
            cols.append(pc.fill_null(
                pc.struct_field(pc.extract_regex(u, URL_PATTERN), "host"),
                "",
            ))
        take, cnt = runlength_distinct_counts(cols)
        return pa.Table.from_arrays(
            [pc.take(cols[0], take), pc.take(cols[1], take),
             pa.array(cnt, pa.int64())],
            names=["src_host", "dst_host", "n"],
        )

    partial = links.select_columns([src_col, dst_col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    merged = partial.groupby(["src_host", "dst_host"]).sum("n")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["src_host", "dst_host", "n"])

    return merged.map_batches(_rename, batch_format="pyarrow")


def anchor_stats(
    links, dst_col: str = "dst_url", anchor_col: str = "anchor",
):
    """Anchor-text frequency per target host ``(dst_host, anchor, n)``
    — the aggregation behind anchor-text search corpora.  Same
    partial-count shape as :func:`host_graph`: one row per distinct
    (host, anchor) per batch, ONE groupby exchange."""

    def _partial(t: pa.Table) -> pa.Table:
        u = t.column(dst_col)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        host = pc.fill_null(
            pc.struct_field(pc.extract_regex(u, URL_PATTERN), "host"), "",
        )
        anchor = t.column(anchor_col)
        if isinstance(anchor, pa.ChunkedArray):
            anchor = anchor.combine_chunks()
        anchor = pc.fill_null(anchor, "")
        take, cnt = runlength_distinct_counts([host, anchor])
        return pa.Table.from_arrays(
            [pc.take(host, take), pc.take(anchor, take),
             pa.array(cnt, pa.int64())],
            names=["dst_host", "anchor", "n"],
        )

    partial = links.select_columns([dst_col, anchor_col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    merged = partial.groupby(["dst_host", "anchor"]).sum("n")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["dst_host", "anchor", "n"])

    return merged.map_batches(_rename, batch_format="pyarrow")
