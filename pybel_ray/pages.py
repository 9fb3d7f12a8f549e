"""Deterministic synthetic Common-Crawl-style page table.

Input schema per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
Each positive row's ``text`` holds one BEL document (document header,
definitions, statements) drawn from seeded templates covering the same
statement surface as the reference's ``thorough.bel``; negative rows carry
non-BEL filler; a small fraction carries slushy-style broken statements.

``html`` is ``<html><body><pre>{escaped text}</pre></body></html>`` so the
HTML→text extraction stage is exactly invertible (byte-identical ``text``
per url — the per-row invariant the driver checks).  A deterministic subset
of rows has ``text = NULL`` to force extraction from ``html``.

Everything is seeded — same (n_pages, seed) → byte-identical table.
"""

from __future__ import annotations

import html as html_mod
import random
from datetime import datetime, timedelta
from typing import List, Optional

import pyarrow as pa

from .resources import ResourceRegistry

__all__ = [
    "generate_pages",
    "generate_pages_table",
    "default_registry",
    "synthetic_belns_texts",
    "page_count_for_sf",
    "normalize_urls",
    "dedup_pages_by_url",
]

NS_HGNC_URL = "synthetic://ns/hgnc.belns"
NS_CHEBI_URL = "synthetic://ns/chebi.belns"
NS_GO_URL = "synthetic://ns/go.belns"
NS_MESHD_URL = "synthetic://ns/meshd.belns"
ANNO_SPECIES_URL = "synthetic://anno/species.belanno"
ANNO_CELL_URL = "synthetic://anno/cell.belanno"

N_GENES = 120
N_CHEMS = 60
N_PROCS = 40
N_DISEASES = 30

GENES = ["GENE{:04d}".format(i) for i in range(1, N_GENES + 1)]
CHEMS = (
    ["chem{:03d}".format(i) for i in range(1, N_CHEMS // 2 + 1)]
    + ['chemical compound {}'.format(i) for i in range(1, N_CHEMS // 2 + 1)]
)
PROCS = ["process of thing {}".format(i) for i in range(1, N_PROCS + 1)]
DISEASES = ["disease state {}".format(i) for i in range(1, N_DISEASES + 1)]
SPECIES = ["9606", "10090", "10116"]
CELLS = ["cell line {}".format(i) for i in range(1, 11)]


def _q(name: str) -> str:
    """Quote a name for BEL if not alphanumeric."""
    return '"{}"'.format(name) if not name.isalnum() else name


def default_registry() -> ResourceRegistry:
    """The frozen synthetic namespace/annotation registry (FIXTURES.md §2-3)."""
    reg = ResourceRegistry()
    reg.add_namespace_table(
        NS_HGNC_URL,
        [(g, str(1000 + i), "GRP") for i, g in enumerate(GENES)],
    )
    reg.add_namespace_table(NS_CHEBI_URL, [(c, None, "A") for c in CHEMS])
    reg.add_namespace_table(NS_GO_URL, [(p, None, "B") for p in PROCS])
    reg.add_namespace_table(NS_MESHD_URL, [(d, None, "O") for d in DISEASES])
    reg.add_annotation_values(ANNO_SPECIES_URL, SPECIES)
    reg.add_annotation_values(ANNO_CELL_URL, CELLS)
    return reg


def synthetic_belns_texts() -> dict:
    """Render the synthetic vocabularies as .belns/.belanno file texts.

    Used by conformance tests to feed the *reference* compiler the same
    resources through its file-based loader.
    """
    out = {}
    lines = ["[Namespace]", "Keyword=HGNC", "", "[Values]"]
    lines += ["{}|{}".format(g, "GRP") for g in GENES]
    out[NS_HGNC_URL] = "\n".join(lines)
    for url, names, enc, kw in (
        (NS_CHEBI_URL, CHEMS, "A", "CHEBI"),
        (NS_GO_URL, PROCS, "B", "GO"),
        (NS_MESHD_URL, DISEASES, "O", "MESHD"),
    ):
        lines = ["[Namespace]", "Keyword={}".format(kw), "", "[Values]"]
        lines += ["{}|{}".format(n, enc) for n in names]
        out[url] = "\n".join(lines)
    for url, values in ((ANNO_SPECIES_URL, SPECIES), (ANNO_CELL_URL, CELLS)):
        lines = ["[AnnotationDefinition]", "", "[Values]"]
        lines += ["{}|label".format(v) for v in values]
        out[url] = "\n".join(lines)
    return out


_HEADER = """SET DOCUMENT Name = "Synthetic Doc {i}"
SET DOCUMENT Version = "1.0.0"
SET DOCUMENT Description = "Deterministic synthetic BEL document {i}"
SET DOCUMENT Authors = "Synthetic Generator"
SET DOCUMENT ContactInfo = "generator@example.org"
DEFINE NAMESPACE HGNC AS URL "{hgnc}"
DEFINE NAMESPACE CHEBI AS URL "{chebi}"
DEFINE NAMESPACE GO AS URL "{go}"
DEFINE NAMESPACE MESHD AS URL "{meshd}"
DEFINE NAMESPACE dbSNP AS PATTERN "rs[0-9]+"
DEFINE ANNOTATION Species AS URL "{species}"
DEFINE ANNOTATION CellLine AS URL "{cell}"
DEFINE ANNOTATION Conf AS LIST {{"High","Low"}}
DEFINE ANNOTATION TextLoc AS PATTERN "[0-9]+"
"""


def _statement(rng: random.Random) -> List[str]:
    """Generate one (possibly multi-line) statement block."""
    g = lambda: "HGNC:" + _q(rng.choice(GENES))  # noqa: E731
    c = lambda: "CHEBI:" + _q(rng.choice(CHEMS))  # noqa: E731
    p_ = lambda: "GO:" + _q(rng.choice(PROCS))  # noqa: E731
    d = lambda: "MESHD:" + _q(rng.choice(DISEASES))  # noqa: E731

    kind = rng.randrange(24)
    if kind == 0:
        return ["p({}) -> p({})".format(g(), g())]
    if kind == 1:
        return ["p({}) -| act(p({}), ma(kin))".format(g(), g())]
    if kind == 2:
        return ["a({}) => deg(r({}))".format(c(), g())]
    if kind == 3:
        return ["p({}, pmod(Ph, Ser, {})) -> bp({})".format(g(), rng.randrange(1, 500), p_())]
    if kind == 4:
        return ["g({}, var(\"c.{}G>A\")) cnc p({})".format(g(), rng.randrange(100, 999), g())]
    if kind == 5:
        return ["complex(p({}), p({})) -> bp({})".format(g(), g(), p_())]
    if kind == 6:
        return ["composite(p({}), a({})) reg path({})".format(g(), c(), d())]
    if kind == 7:
        return [
            "rxn(reactants(a({}), a({})), products(a({}))) subProcessOf bp({})".format(
                c(), c(), c(), p_(),
            ),
        ]
    if kind == 8:
        return ["p({}) pos path({})".format(g(), d())]
    if kind == 9:
        return ["p({}) neg bp({})".format(g(), p_())]
    if kind == 10:
        x = g()
        return ["g({}) :> r({})".format(x, x)]
    if kind == 11:
        x = g()
        return ["r({}) >> p({})".format(x, x)]
    if kind == 12:
        return ["p({}) isA p({})".format(g(), g())]
    if kind == 13:
        return ["p({}) -- path({})".format(g(), d())]
    if kind == 14:
        return ["p(fus({}, \"p.1_{}\", {}, \"p.{}_?\")) -> bp({})".format(
            g(), rng.randrange(100, 400), g(), rng.randrange(400, 900), p_(),
        )]
    if kind == 15:
        return ["p({}, frag(\"{}_{}\")) -| p({})".format(
            g(), rng.randrange(1, 50), rng.randrange(51, 400), g(),
        )]
    if kind == 16:
        return ["m({}) -| r({})".format(g(), g())]
    if kind == 17:
        return ["p({}) binds p({})".format(g(), g())]
    if kind == 18:
        return ["a({}) hasMembers list(a({}), a({}))".format(c(), c(), c())]
    if kind == 19:
        return ["p({}) -> (p({}) -| bp({}))".format(g(), g(), p_())]
    if kind == 20:
        return ["g(dbSNP:rs{}) -- g({})".format(rng.randrange(10, 10_000_000), g())]
    if kind == 21:
        return ["tloc(p({}), fromLoc(GO:{}), toLoc(GO:{})) => p({})".format(
            g(), _q(rng.choice(PROCS)), _q(rng.choice(PROCS)), g(),
        )]
    if kind == 22:
        return ["p({}, sub({}, {}, {})) -> path({})".format(
            g(), rng.choice("ARNDC"), rng.randrange(1, 500), rng.choice("EQGHI"), d(),
        )]
    return ["kin(p({})) rateLimitingStepOf bp({})".format(g(), p_())]


_BAD_STATEMENTS = [
    "p(UNDEFNS:whatever) -> p({})",
    "p(HGNC:NOTAREALGENE9999) -> p({})",
    "p({}) nonsenseRelation p({})",
    "this is not BEL at all",
    "p({}) -> act(p({}), ma(kin)",
]

_FILLER = (
    "The weather report for the region mentions scattered clouds. ",
    "Ein kurzer Text ohne biologische Aussagen. ",
    "Breaking news: markets rallied on Tuesday afternoon. ",
    "Recipe: combine flour, water, and salt; knead thoroughly. ",
)


def _document_text(i: int, rng: random.Random, n_statements: int, inject_errors: bool) -> str:
    lines = [_HEADER.format(
        i=i, hgnc=NS_HGNC_URL, chebi=NS_CHEBI_URL, go=NS_GO_URL,
        meshd=NS_MESHD_URL, species=ANNO_SPECIES_URL, cell=ANNO_CELL_URL,
    )]
    lines.append('SET STATEMENT_GROUP = "Group {}"'.format(i))
    n_emitted = 0
    while n_emitted < n_statements:
        lines.append('SET Citation = {{"PubMed", "{}"}}'.format(rng.randrange(10_000, 40_000_000)))
        lines.append('SET Evidence = "Synthetic evidence {} for doc {}"'.format(n_emitted, i))
        lines.append('SET Species = "{}"'.format(rng.choice(SPECIES)))
        if rng.random() < 0.5:
            lines.append('SET Conf = "{}"'.format(rng.choice(["High", "Low"])))
        if rng.random() < 0.3:
            lines.append('SET CellLine = "{}"'.format(rng.choice(CELLS)))
        if rng.random() < 0.2:
            lines.append('SET TextLoc = "{}"'.format(rng.randrange(1, 5000)))
        for _ in range(rng.randrange(2, 6)):
            if n_emitted >= n_statements:
                break
            if inject_errors and rng.random() < 0.15:
                template = rng.choice(_BAD_STATEMENTS)
                n_args = template.count("{}")
                stmt = template.format(*("HGNC:" + _q(rng.choice(GENES)) for _ in range(n_args)))
                lines.append(stmt)
            else:
                lines.extend(_statement(rng))
            n_emitted += 1
        if rng.random() < 0.3:
            lines.append("UNSET ALL")
    return "\n".join(lines) + "\n"


def _filler_text(rng: random.Random) -> str:
    return "".join(rng.choice(_FILLER) for _ in range(rng.randrange(5, 30)))


def page_count_for_sf(sf: float) -> int:
    """Scale the synthetic corpus like the TPC-H-ish testdata scales."""
    return max(10, int(round(sf * 20_000)))


_BASE_TS = datetime(2024, 1, 1)


def page_row(
    i: int,
    seed: int = 42,
    statements_per_page: int = 20,
    negative_fraction: float = 0.10,
    error_fraction: float = 0.08,
    null_text_fraction: float = 0.20,
) -> dict:
    """Deterministic page row for index ``i`` — pure function of (i, seed),
    so generation can be distributed across the cluster."""
    rng = random.Random((seed << 20) ^ i)
    r = rng.random()
    if r < negative_fraction:
        text = _filler_text(rng)
        lang = "de" if rng.random() < 0.3 else "en"
    else:
        inject = rng.random() < error_fraction
        text = _document_text(i, rng, statements_per_page, inject)
        lang = "en"
    html = "<html><body><pre>{}</pre></body></html>".format(
        html_mod.escape(text),
    ).encode("utf8")
    null_text = rng.random() < null_text_fraction
    return {
        "url": "https://example.org/doc/{:08d}".format(i),
        "warc_ts": _BASE_TS + timedelta(seconds=i),
        "html": html,
        "text": None if null_text else text,
        "lang": lang,
    }


def generate_pages(n_pages: int, seed: int = 42, **kwargs):
    """Yield page row dicts deterministically."""
    for i in range(n_pages):
        yield page_row(i, seed=seed, **kwargs)


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def write_pages_parquet(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    statements_per_page: int = 20,
    rows_per_block: int = 500,
    **kwargs,
) -> None:
    """Distributed deterministic corpus generation to partitioned Parquet.

    ``ray.data.range`` over page indices -> per-batch generation (pure
    function of index) -> Parquet files; both scaling runs then read the
    SAME bytes from storage.
    """
    import ray.data

    def _gen(batch: pa.Table) -> pa.Table:
        rows = [
            page_row(int(i), seed=seed, statements_per_page=statements_per_page, **kwargs)
            for i in batch.column("id").to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    ds = ray.data.range(n_pages, override_num_blocks=max(8, n_pages // rows_per_block))
    ds.map_batches(_gen, batch_format="pyarrow").write_parquet(out_dir)


def pages_dataset(n_pages: int, seed: int = 42, block_pages: int = 50, **kwargs):
    """Synthetic pages as a multi-block Ray Dataset (parallelism-friendly).

    Generation is DISTRIBUTED: ``ray.data.range`` over page indices, one
    block per ``block_pages`` pages, with :func:`page_row` (a pure function
    of the index) running inside ``map_batches`` — the driver never
    materializes the corpus (the old driver-side loop cost ~2.7 s serial
    for 2000 pages; this runs in parallel across the pool).
    """
    import ray.data

    num_blocks = max(1, -(-n_pages // block_pages))

    def _gen(batch: pa.Table) -> pa.Table:
        rows = [
            page_row(int(i), seed=seed, **kwargs)
            for i in batch.column("id").to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    ds = ray.data.range(n_pages, override_num_blocks=num_blocks)
    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=block_pages)


def generate_pages_table(n_pages: int, seed: int = 42, **kwargs) -> pa.Table:
    """Materialize the synthetic page table as one Arrow table."""
    rows = list(generate_pages(n_pages, seed=seed, **kwargs))
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]))


# ---------------------------------------------------------------------------
# Common-Crawl input hygiene: URL normalization + per-url capture dedup
# ---------------------------------------------------------------------------

#: duplicated-url tables at or below this size broadcast; above it the
#: dedup falls back to one full bucketed groupby (documented cost).
_DUP_URL_BROADCAST_BUDGET = 2_000_000


def normalize_urls(pages, url_col: str = "url"):
    """Canonicalize URLs in place: lowercase the scheme+authority, drop
    the fragment, drop explicit default ports (``:80`` / ``:443``), and
    collapse a bare ``/`` path to none.

    Vectorized (``pyarrow.compute`` regex/extract kernels); rows without a
    ``scheme://`` prefix pass through untouched.  Run before
    :func:`dedup_pages_by_url` so captures of the same resource collide.
    """
    import pyarrow.compute as pc

    def _f(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        no_frag = pc.replace_substring_regex(urls, pattern=r"#.*$", replacement="")
        parts = pc.extract_regex(
            no_frag, pattern=r"^(?P<head>[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)(?P<rest>.*)$",
        )
        head = pc.utf8_lower(pc.struct_field(parts, "head"))
        head = pc.replace_substring_regex(
            head, pattern=r"^(http://[^/:]+):80$", replacement=r"\1",
        )
        head = pc.replace_substring_regex(
            head, pattern=r"^(https://[^/:]+):443$", replacement=r"\1",
        )
        rest = pc.struct_field(parts, "rest")
        rest = pc.if_else(pc.equal(rest, "/"), "", rest)
        norm = pc.binary_join_element_wise(head, rest, "")
        # non-matching rows (no scheme) keep the fragment-stripped original
        norm = pc.if_else(pc.is_valid(norm), norm, no_frag)
        return t.set_column(t.schema.get_field_index(url_col), url_col, norm)

    return pages.map_batches(_f, batch_format="pyarrow")


def dedup_pages_by_url(
    pages,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    num_buckets: int = 64,
):
    """One page per URL — the LATEST capture wins (ties: one survivor,
    deterministic by row content order after sort).

    Scale design: most URLs occur once, so the full page rows (html!)
    should not shuffle.  A light first pass counts urls (per-batch distinct
    combiner → one groupby over url strings only) and extracts the
    *contended* url set; pages with uncontended urls stream through
    untouched, and only the contended subset — typically a tiny fraction of
    a crawl — pays a bucketed groupby that keeps the max-``ts_col`` row per
    url.  If the contended-url table exceeds the broadcast budget the whole
    input falls back to one full bucketed groupby (the classic
    shuffle-everything dedup), so behavior is correct at any skew.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .ops.relational import groupby_count

    def _distinct_urls(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        return pa.Table.from_arrays([pc.unique(urls)], names=[url_col])

    counts = groupby_count(
        pages.select_columns([url_col]).map_batches(
            _distinct_urls, batch_format="pyarrow",
        ),
        url_col, "n",
    )
    dup = counts.filter(lambda r: r["n"] > 1).select_columns([url_col]).materialize()
    n_dup = dup.count()
    if n_dup == 0:
        return pages

    from .stages.dedup import add_hash_bucket

    def _keep_latest(group: pa.Table) -> pa.Table:
        group = group.sort_by([(url_col, "ascending"), (ts_col, "descending")])
        urls = group.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        codes = urls.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        _, first = np.unique(codes, return_index=True)
        first.sort()
        out = group.take(pa.array(first))
        return out.drop_columns(["_bucket"]) if "_bucket" in out.column_names else out

    if n_dup <= _DUP_URL_BROADCAST_BUDGET:
        import ray

        chunks = [
            b.column(url_col).combine_chunks()
            for b in dup.iter_batches(batch_format="pyarrow")
        ]
        dup_ref = ray.put(pa.concat_arrays(chunks))

        def _split(contended: bool):
            def _f(t: pa.Table) -> pa.Table:
                mask = pc.fill_null(
                    pc.is_in(t.column(url_col), value_set=ray.get(dup_ref)), False,
                )
                if not contended:
                    mask = pc.invert(mask)
                return t.filter(mask)

            return _f

        clean = pages.map_batches(_split(False), batch_format="pyarrow")
        contended = pages.map_batches(_split(True), batch_format="pyarrow")
        winners = contended.map_batches(
            lambda t: add_hash_bucket(t, url_col, num_buckets),
            batch_format="pyarrow",
        ).groupby("_bucket").map_groups(_keep_latest, batch_format="pyarrow")
        return clean.union(winners)

    # huge contended set: single full bucketed groupby (everything shuffles)
    return pages.map_batches(
        lambda t: add_hash_bucket(t, url_col, num_buckets),
        batch_format="pyarrow",
    ).groupby("_bucket").map_groups(_keep_latest, batch_format="pyarrow")
