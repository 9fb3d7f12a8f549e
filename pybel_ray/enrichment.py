"""Citation enrichment: overwrite edge citation metadata from a lookup table.

Reference: ``manager/citation_utils.py:137-244`` — batched NCBI eUtils
lookups (group_size=200, 1 s sleeps) cached in SQL.  The engine version is
an actor-pool ``map_batches`` stage holding the lookup table warm per actor
(broadcast once via ``ray.put``); in this offline environment the table is
a synthetic local PubMed stand-in (FIXTURES.md §5), and a rate-limited HTTP
fetcher would slot into :meth:`CitationEnricher.__init__` unchanged.
"""

from __future__ import annotations

from typing import Mapping, Optional

import pyarrow as pa

__all__ = [
    "CitationEnricher",
    "synthetic_pubmed_table",
    "enrich_citations",
    "fetch_pubmed_table",
    "distinct_pubmed_ids",
    "enrich_citations_fetched",
]


def synthetic_pubmed_table(pmids, seed: int = 11) -> dict:
    """Deterministic fake (pmid -> {title, authors, date}) lookup."""
    import random

    out = {}
    for pmid in pmids:
        rng = random.Random((seed << 32) ^ int(pmid))
        n_authors = rng.randrange(1, 6)
        out[str(pmid)] = {
            "title": "Synthetic article {}".format(pmid),
            "authors": "|".join(
                "Author {}{}".format(pmid, chr(65 + i)) for i in range(n_authors)
            ),
            "date": "20{:02d}-{:02d}-{:02d}".format(
                rng.randrange(0, 25), rng.randrange(1, 13), rng.randrange(1, 28),
            ),
        }
    return out


#: eUtils esummary endpoint (reference citation_utils.py:30)
EUTILS_URL = (
    "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/esummary.fcgi"
    "?db=pubmed&retmode=json&id={}"
)


def _default_transport(url: str) -> bytes:  # pragma: no cover - needs network
    from urllib.request import urlopen

    with urlopen(url, timeout=30) as resp:
        return resp.read()


def fetch_pubmed_table(
    pmids,
    transport=None,
    group_size: int = 200,
    sleep_seconds: float = 1.0,
    retries: int = 3,
) -> dict:
    """Rate-limited NCBI eUtils esummary fetch -> {pmid: {title, authors,
    date}} (reference ``manager/citation_utils.py:137-244``: batched
    group_size=200 lookups with 1 s sleeps).

    ``transport`` is an injectable ``url -> bytes`` callable so the fetch
    logic is testable offline (this sandbox has no network); the default
    uses urllib.  Fetching is deliberately driver-side: NCBI's rate limits
    serialize the calls anyway, and the resulting table broadcasts to the
    enrichment actor pool via ``ray.put`` exactly like the synthetic one.
    """
    import json as _json
    import time as _time

    transport = transport or _default_transport
    pmids = sorted({str(p) for p in pmids if p})
    out: dict = {}
    for start in range(0, len(pmids), group_size):
        group = pmids[start:start + group_size]
        url = EUTILS_URL.format(",".join(group))
        payload = None
        for attempt in range(retries):
            try:
                payload = transport(url)
                break
            except Exception:
                if attempt == retries - 1:
                    raise
                _time.sleep(sleep_seconds * (attempt + 1))
        doc = _json.loads(payload)
        result = doc.get("result") or {}
        for pmid in group:
            entry = result.get(pmid)
            if not entry or "error" in entry:
                continue
            authors = "|".join(
                a.get("name", "") for a in entry.get("authors") or []
            )
            out[pmid] = {
                "title": entry.get("title"),
                "authors": authors or None,
                "date": entry.get("sortpubdate", "").split(" ")[0].replace("/", "-") or None,
            }
        if start + group_size < len(pmids):
            _time.sleep(sleep_seconds)
    return out


def distinct_pubmed_ids(edges) -> list:
    """Distinct PubMed ids of an edge Dataset (narrow distributed distinct)."""
    import pyarrow.compute as pc

    from .ops.relational import distinct_values

    def _pm(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(t.column("citation_db"), "PubMed"), False)
        return t.filter(m).select(["citation_id"])

    ds = edges.select_columns(["citation_db", "citation_id"]).map_batches(
        _pm, batch_format="pyarrow",
    )
    out = []
    for batch in distinct_values(ds, "citation_id").iter_batches(
        batch_format="pyarrow",
    ):
        out.extend(batch.column("citation_id").to_pylist())
    return sorted(x for x in out if x)


def enrich_citations_fetched(edges, transport=None, **options):
    """End-to-end enrichment: distinct pmids -> rate-limited fetch ->
    broadcast actor-pool rewrite (the online path of the reference's
    ``enrich_pubmed_citations``)."""
    pmids = distinct_pubmed_ids(edges)
    lookup = fetch_pubmed_table(pmids, transport=transport, **options)
    return enrich_citations(edges, lookup)


class CitationEnricher:
    """Actor-pool stage: add citation_title/authors/date columns to edges."""

    def __init__(self, lookup: Optional[Mapping] = None, lookup_ref=None):
        if lookup is None:
            if lookup_ref is not None:
                import ray

                lookup = ray.get(lookup_ref)
            else:
                lookup = {}
        self.lookup = lookup

    def __call__(self, batch: pa.Table) -> pa.Table:
        dbs = batch.column("citation_db").to_pylist()
        ids = batch.column("citation_id").to_pylist()
        titles, authors, dates = [], [], []
        for db, db_id in zip(dbs, ids):
            entry = self.lookup.get(db_id) if db == "PubMed" and db_id else None
            titles.append(entry["title"] if entry else None)
            authors.append(entry["authors"] if entry else None)
            dates.append(entry["date"] if entry else None)
        batch = batch.append_column("citation_title", pa.array(titles, pa.string()))
        batch = batch.append_column("citation_authors", pa.array(authors, pa.string()))
        return batch.append_column("citation_date", pa.array(dates, pa.string()))


def enrich_citations(edges, lookup: Mapping, concurrency=(1, 4), batch_size: int = 4096):
    """Run the enrichment actor pool over an edge Dataset."""
    import ray

    lookup_ref = ray.put(dict(lookup))
    return edges.map_batches(
        CitationEnricher,
        fn_constructor_kwargs={"lookup_ref": lookup_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
