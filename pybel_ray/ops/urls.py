"""URL column operators for crawl-style corpora: parse scheme/host/path
and aggregate per-domain statistics.

Complements ``pages.normalize_urls`` (the kg ingest hygiene): these are
generic per-batch RE2 kernels (``pc.extract_regex``) over any url column,
with DuckDB ``regexp_extract`` reproducing them exactly for the driver
oracle.  One pass, no shuffle for the parse; ``domain_stats`` is a
partial-count groupby (one row per distinct host per batch enters the
exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["add_url_parts", "domain_stats", "domain_rollup", "url_params", "prefix_filter", "canonicalize_urls", "resolve_redirects"]

#: RE2, shared verbatim with the SQL oracle (both engines compile RE2)
URL_PATTERN = r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#]*)(?P<path>[^?#]*)"

#: last two host labels = naive registered domain + TLD (a public-suffix
#: list would refine this; the naive split is what the SQL oracle shares)
REGDOM_PATTERN = r"(?P<regdom>[^.]+\.(?P<tld>[^.]+))$"


def add_url_parts(ds, url_col: str = "url"):
    """Append ``scheme``, ``host``, ``path`` (empty string when the url
    does not parse — same as DuckDB ``regexp_extract``'s no-match value)."""

    def _f(t: pa.Table) -> pa.Table:
        url = t.column(url_col)
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        st = pc.extract_regex(url, URL_PATTERN)
        for name in ("scheme", "host", "path"):
            col = pc.fill_null(pc.struct_field(st, name), "")
            if name in t.column_names:
                t = t.drop_columns([name])
            t = t.append_column(name, col)
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def domain_stats(ds, url_col: str = "url", weight_col: str | None = None):
    """Per-host document count (and optional integer weight sum):
    (host, n_docs[, total_<weight_col>]).

    Per-batch partial counts (lexsort run lengths) → one
    ``groupby(host)`` exchange over one row per distinct host per batch.
    """
    parsed = add_url_parts(ds, url_col=url_col)

    def _partial(t: pa.Table) -> pa.Table:
        host = t.column("host").combine_chunks()
        enc = host.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(codes, kind="stable")
        c = codes[order]
        starts = np.r_[True, c[1:] != c[:-1]]
        start_idx = np.flatnonzero(starts)
        cnt = np.diff(np.r_[start_idx, len(c)])
        arrays = [
            pc.take(host, pa.array(order[start_idx])),
            pa.array(cnt, pa.int64()),
        ]
        names = ["host", "n_docs"]
        if weight_col is not None:
            w = np.asarray(
                t.column(weight_col).to_numpy(zero_copy_only=False), dtype=np.int64,
            )[order]
            sums = np.add.reduceat(w, start_idx) if len(w) else np.array([], np.int64)
            arrays.append(pa.array(sums, pa.int64()))
            names.append("total_" + weight_col)
        return pa.Table.from_arrays(arrays, names=names)

    cols = ["host"] + ([weight_col] if weight_col else [])
    partial = parsed.select_columns(cols).map_batches(_partial, batch_format="pyarrow")

    def _final(g: pa.Table) -> pa.Table:
        arrays = [
            g.column("host").slice(0, 1),
            pa.array([int(pc.sum(g.column("n_docs")).as_py() or 0)], pa.int64()),
        ]
        names = ["host", "n_docs"]
        if weight_col is not None:
            arrays.append(pa.array(
                [int(pc.sum(g.column("total_" + weight_col)).as_py() or 0)],
                pa.int64(),
            ))
            names.append("total_" + weight_col)
        return pa.Table.from_arrays(arrays, names=names)

    return partial.groupby("host").map_groups(_final, batch_format="pyarrow")


def domain_rollup(ds, url_col: str = "url"):
    """URL counts rolled up to (registered domain, TLD) — the
    host-hierarchy aggregation of crawl analytics (naive last-two-label
    registered domain; swap :data:`REGDOM_PATTERN` for a public-suffix
    automaton when precision matters).  Vectorized RE2 parse +
    run-length partials, ONE groupby exchange."""
    from pybel_ray.ops._kernels import runlength_distinct_counts

    def _partial(t: pa.Table) -> pa.Table:
        u = t.column(url_col)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        host = pc.fill_null(
            pc.struct_field(pc.extract_regex(u, URL_PATTERN), "host"), "",
        )
        st = pc.extract_regex(host, REGDOM_PATTERN)
        regdom = pc.fill_null(pc.struct_field(st, "regdom"), "")
        tld = pc.fill_null(pc.struct_field(st, "tld"), "")
        take, cnt = runlength_distinct_counts([regdom, tld])
        return pa.Table.from_arrays(
            [pc.take(regdom, take), pc.take(tld, take),
             pa.array(cnt, pa.int64())],
            names=["reg_domain", "tld", "n_urls"],
        )

    partial = ds.select_columns([url_col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    merged = partial.groupby(["reg_domain", "tld"]).sum("n_urls")
    return merged.map_batches(
        lambda t: t.rename_columns(["reg_domain", "tld", "n_urls"]),
        batch_format="pyarrow",
    )


def url_params(ds, url_col: str = "url", id_col: str | None = None):
    """Explode each url's query string into ``(id?, url, param, value)``
    rows: pieces split on ``&`` (empty pieces dropped), ``param`` =
    text before the FIRST ``=``, ``value`` = text after it (``''``
    when there is no ``=``).  Vectorized ListArray flatten — one pass,
    no shuffle; DuckDB ``unnest(string_split(regexp_extract(...)))``
    reproduces it exactly.
    """
    keep_cols = ([id_col] if id_col else []) + [url_col]

    def _f(t: pa.Table) -> pa.Table:
        url = t.column(url_col)
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        url = pc.cast(url, pa.string())  # null-typed blocks -> string nulls
        q = pc.fill_null(pc.struct_field(
            pc.extract_regex(url, r"\?(?P<q>[^#]*)"), "q",
        ), "")
        pieces = pc.split_pattern(q, "&")
        if isinstance(pieces, pa.ChunkedArray):
            pieces = pieces.combine_chunks()
        flat = pieces.flatten()
        # parent index of every piece
        offsets = pieces.offsets.to_numpy(zero_copy_only=False)
        parents = np.repeat(
            np.arange(len(pieces), dtype=np.int64), np.diff(offsets),
        )
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parents = parents[nonempty]
        kv = pc.split_pattern(flat, "=", max_splits=1)
        if isinstance(kv, pa.ChunkedArray):
            kv = kv.combine_chunks()
        kvf = kv.flatten()
        koff = kv.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(koff)
        key = kvf.take(pa.array(koff[:-1]))
        # second token exists only where the piece contained '='
        vidx = np.where(lens >= 2, koff[:-1] + 1, 0)
        val = pc.if_else(
            pa.array(lens >= 2),
            kvf.take(pa.array(vidx)) if len(kvf) else pa.array([], pa.string()),
            "",
        )
        take = pa.array(parents)
        arrays = [t.column(c).take(take) for c in keep_cols]
        return pa.Table.from_arrays(
            arrays + [key, val], names=keep_cols + ["param", "value"],
        )

    return ds.select_columns(keep_cols).map_batches(
        _f, batch_format="pyarrow",
    )


def prefix_filter(ds, rules, url_col: str = "url",
                  out_col: str = "allowed", default: bool = True):
    """Robots-style longest-prefix URL policy: ``rules`` is
    ``[(prefix, allow: bool), ...]`` (prefixes distinct); each url gets
    the verdict of the LONGEST matching prefix, or ``default`` when
    none matches.  The rule table broadcasts in the closure (tiny by
    contract); evaluation is one vectorized ``starts_with`` pass per
    rule in descending-length order — rows decided by a longer prefix
    are never revisited.
    """
    ordered = sorted(rules, key=lambda r: len(r[0]), reverse=True)

    def _f(t: pa.Table) -> pa.Table:
        url = t.column(url_col)
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        url = pc.cast(url, pa.string())
        n = len(url)
        verdict = np.full(n, default, bool)
        decided = np.zeros(n, bool)
        for prefix, allow in ordered:
            m = pc.starts_with(pc.fill_null(url, ""), prefix) \
                .to_numpy(zero_copy_only=False)
            pick = m & ~decided
            verdict[pick] = allow
            decided |= m
        return t.append_column(out_col, pa.array(verdict))

    return ds.map_batches(_f, batch_format="pyarrow")


#: RE2 with optional query group, shared verbatim with the SQL oracle
CANON_PATTERN = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?"
)

#: one query-string token (name[=value]) is dropped iff it matches this
#: (RE2, shared with the oracle's list_filter lambda)
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$"


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Append the canonical form of a url column — the crawl-dedup
    normalization that makes ``HTTP://Host:80/a/?utm_source=x#frag`` and
    ``http://host/a`` compare equal:

    1. scheme and host lowercase;
    2. fragment dropped (never sent to the server);
    3. default port stripped (``:80`` for http, ``:443`` for https);
    4. tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
       ``ref`` — :data:`TRACKING_PARAM_PATTERN`), others kept IN ORDER;
    5. empty path → ``/``; otherwise one trailing slash stripped
       (except the bare ``/``).

    Unparseable urls canonicalize to the empty string.  Steps 1-3 and 5
    are vectorized RE2/kernel passes; the query-param filter falls back
    to a per-row split ONLY for rows that have a query string (same
    vectorized-head/row-tail policy as ``text.normalize_text``).  One
    stateless pass, no shuffle; the DuckDB oracle reproduces every step
    (``list_filter`` + the same regexes).
    """
    import re

    track_re = re.compile(TRACKING_PARAM_PATTERN)

    def _f(t: pa.Table) -> pa.Table:
        url = t.column(url_col)
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        st = pc.extract_regex(pc.fill_null(url, ""), CANON_PATTERN)
        ok = pc.is_valid(st)
        scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(st, "scheme"), ""))
        host = pc.utf8_lower(pc.fill_null(pc.struct_field(st, "host"), ""))
        path = pc.fill_null(pc.struct_field(st, "path"), "")
        query = pc.struct_field(st, "query")  # null when absent

        host = pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(host, ":80$", ""),
            pc.if_else(
                pc.equal(scheme, "https"),
                pc.replace_substring_regex(host, ":443$", ""),
                host,
            ),
        )
        path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
        path = pc.if_else(
            pc.equal(path, "/"),
            path, pc.replace_substring_regex(path, "/$", ""),
        )

        kept = []
        for q in query.to_pylist():
            if not q:
                kept.append("")
                continue
            parts = [p for p in q.split("&") if p and not track_re.match(p)]
            kept.append("?" + "&".join(parts) if parts else "")
        canon = pc.binary_join_element_wise(
            scheme, "://", host, path, pa.array(kept, pa.string()), "",
        )
        canon = pc.if_else(ok, canon, pa.scalar(""))
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, canon)

    return ds.map_batches(_f, batch_format="pyarrow")


def resolve_redirects(
    redirects,
    src_col: str = "src",
    dst_col: str = "dst",
    max_doublings: int = 16,
    num_buckets: int | None = None,
):
    """Resolve every redirect source to its terminal target — the crawl
    post-processing step that collapses ``A → B → C`` chains so content
    keys on the final url.  Returns ``(src, terminal, resolved)`` with
    ``resolved`` = 1 iff the terminal is not itself a redirect source
    (cycles and chains longer than ``2^max_doublings`` stay unresolved
    at whatever node ``2^max_doublings`` steps reach — deterministic,
    and exactly what the unrolled SQL oracle computes).

    POINTER DOUBLING, not step-by-step chasing: round ``k`` joins the
    current map with ITSELF (``map[u] ← map[map[u]]``), so ``D`` rounds
    cover chains up to ``2^D`` links — one bucketed many-to-many
    :func:`~.relational.equi_join` per round (auto-sized; broadcasts
    under 64 MB), with an early exit as soon as a round advances
    nothing.  ``src`` values must be unique (one redirect per source;
    exact duplicate rows are deduped first).
    """
    from ..stages.dedup import dedup_exact
    from .relational import equi_join

    sep = "\x1f"

    def _key(t: pa.Table) -> pa.Table:
        s_ = pc.cast(t.column(src_col), pa.string())
        d_ = pc.cast(t.column(dst_col), pa.string())
        keep = pc.and_kleene(pc.is_valid(s_), pc.is_valid(d_))
        t2 = pa.Table.from_arrays(
            [s_, d_], names=["src", "_cur"],
        ).filter(keep)
        return t2.append_column(
            "_k", pc.binary_join_element_wise(
                t2.column("src"), t2.column("_cur"), sep,
            ),
        )

    mapping = dedup_exact(
        redirects.map_batches(_key, batch_format="pyarrow"), "_k",
    ).select_columns(["src", "_cur"]).materialize()
    sources = mapping.select_columns(["src"]).materialize()

    for _ in range(max_doublings):
        joined = equi_join(
            mapping,
            mapping.map_batches(
                lambda t: t.rename_columns(["_s2", "_next"]),
                batch_format="pyarrow",
            ),
            on="_cur", right_on="_s2", how="left",
            num_buckets=num_buckets,
        )

        def _advance(t: pa.Table) -> pa.Table:
            nxt = t.column("_next")
            cur = pc.if_else(pc.is_valid(nxt), nxt, t.column("_cur"))
            out = pa.Table.from_arrays(
                [t.column("src"), cur], names=["src", "_cur"],
            )
            # early-exit signal = the VALUE changed, not merely "the
            # join matched": cycle members always match (their _cur is
            # always a source), so join-matched never quiesces on a
            # cyclic graph.  If NO row changed then map∘map = map —
            # idempotent — and every later round is a no-op, so exiting
            # here is output-identical to the full unroll.
            return out.append_column(
                "_moved",
                pc.and_kleene(
                    pc.is_valid(nxt),
                    pc.fill_null(
                        pc.not_equal(nxt, t.column("_cur")), False,
                    ),
                ),
            )

        stepped = joined.map_batches(
            _advance, batch_format="pyarrow",
        ).materialize()
        moved = int(stepped.sum("_moved") or 0)
        mapping = stepped.select_columns(["src", "_cur"]).materialize()
        if moved == 0:
            break

    # resolved = terminal is not itself a redirect source: one bucketed
    # lookup join against the source set
    marked = equi_join(
        mapping,
        sources.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("src"),
                 pa.array(np.ones(t.num_rows, np.int64))],
                names=["_s3", "_isrc"],
            ),
            batch_format="pyarrow",
        ),
        on="_cur", right_on="_s3", how="left",
        num_buckets=num_buckets,
    )

    def _final(t: pa.Table) -> pa.Table:
        unresolved = pc.is_valid(t.column("_isrc"))
        return pa.Table.from_arrays(
            [t.column("src"), t.column("_cur"),
             pc.cast(pc.invert(unresolved), pa.int64())],
            names=["src", "terminal", "resolved"],
        )

    return marked.map_batches(_final, batch_format="pyarrow")
