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

__all__ = ["CitationEnricher", "synthetic_pubmed_table", "enrich_citations"]


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
