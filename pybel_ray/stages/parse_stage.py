"""Actor-pool parse stage: page rows -> event rows (nodes/edges/errors/docs).

The heavyweight state — the resolved resource registry and the statement
parser's frozen namespace maps — is built ONCE per actor in ``__init__``
(the reference builds its pyparsing grammar per document,
``parse_bel.py:234-637``; amortizing it across batches is the big win).
The registry travels via a ``ray.put`` object ref: one object-store copy,
fetched once per actor, never re-shipped per batch.

Output is one flat Arrow table per batch with a ``kind`` discriminator:

* ``kind='node'``  — node_md5/bel/function/concept/node_json
* ``kind='edge'``  — edge content incl. the pre-computed (h, r, t) triple
* ``kind='error'`` — warning class + context (the warnings side-channel)
* ``kind='doc'``   — per-page lineage: statement count, gated/aborted flags

Pre-computing each edge's triple here (node dicts are in memory anyway)
removes the need for a nodes<->edges shuffle join at export time.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa

from ..canon import bel_md5, canonical_json
from ..constants import (
    ANNOTATIONS,
    CITATION,
    CITATION_DB,
    CITATION_IDENTIFIER,
    CONCEPT,
    EVIDENCE,
    FUNCTION,
    IDENTIFIER,
    LINE,
    NAME,
    NAMESPACE,
    OBJECT,
    RELATION,
    SUBJECT,
)
from ..export.triples import edge_to_triple
from ..parsing.document import compile_document
from ..resources import ResourceRegistry
from .gate import looks_like_bel

__all__ = ["ParseDocuments", "ParseDocumentsToDir", "EVENTS_SCHEMA", "MANIFEST_SCHEMA"]

EVENTS_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("url", pa.string()),
    # node fields
    ("bel", pa.string()),
    ("md5", pa.string()),
    ("node_json", pa.string()),
    ("function", pa.string()),
    ("namespace", pa.string()),
    ("name", pa.string()),
    ("identifier", pa.string()),
    # edge fields
    ("edge_md5", pa.string()),
    ("src_bel", pa.string()),
    ("src_md5", pa.string()),
    ("dst_bel", pa.string()),
    ("dst_md5", pa.string()),
    ("relation", pa.string()),
    ("evidence", pa.string()),
    ("citation_db", pa.string()),
    ("citation_id", pa.string()),
    ("annotations_json", pa.string()),
    ("subject_json", pa.string()),
    ("object_json", pa.string()),
    ("line", pa.int32()),
    ("triple_h", pa.string()),
    ("triple_r", pa.string()),
    ("triple_t", pa.string()),
    # error fields
    ("line_number", pa.int32()),
    ("error_class", pa.string()),
    ("error_line", pa.string()),
    ("context_json", pa.string()),
    # doc fields
    ("gated", pa.bool_()),
    ("aborted", pa.bool_()),
    ("n_statements", pa.int32()),
    ("metadata_json", pa.string()),
])


class ParseDocuments:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools."""

    def __init__(
        self,
        registry: Optional[ResourceRegistry] = None,
        registry_ref=None,
        citation_clearing: bool = True,
        allow_naked_names: bool = False,
        disallow_nested: bool = False,
        gate: bool = True,
    ):
        if registry is None:
            if registry_ref is not None:
                import ray

                registry = ray.get(registry_ref)
            else:
                registry = ResourceRegistry()
        self.registry = registry
        self.citation_clearing = citation_clearing
        self.allow_naked_names = allow_naked_names
        self.disallow_nested = disallow_nested
        self.gate = gate
        # actor-lifetime cache: node canonicalization products keyed by the
        # node's canonical BEL string.  Real corpora repeat a bounded
        # entity vocabulary across millions of pages, so md5 + sorted-JSON
        # serialization per occurrence (~25% of stage time in profile)
        # amortizes to a dict hit.  Bounded to keep actor heap flat.
        self._node_row_cache: dict = {}
        self._node_row_cache_max = 500_000
        # cross-document parsed-term cache, keyed by (namespace-scope,
        # exact term text) — see TermParser.parse_bel_term
        self._term_cache: dict = {}
        self._term_cache_max = 500_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        for url, text in zip(urls, texts):
            self._process_page(rows, url, text or "")
        return pa.Table.from_pylist(rows, schema=EVENTS_SCHEMA)

    # -- internals ---------------------------------------------------------

    def _process_page(self, rows: list, url: str, text: str) -> None:
        if self.gate and not looks_like_bel(text):
            rows.append({"kind": "doc", "url": url, "gated": True,
                         "aborted": False, "n_statements": 0})
            return

        if len(self._term_cache) > self._term_cache_max:
            self._term_cache.clear()
        result = compile_document(
            text,
            self.registry,
            citation_clearing=self.citation_clearing,
            allow_naked_names=self.allow_naked_names,
            disallow_nested=self.disallow_nested,
            term_cache=self._term_cache,
        )

        cache = self._node_row_cache
        if len(cache) > self._node_row_cache_max:
            cache.clear()

        node_by_bel = {}
        md5_by_bel = {}
        for bel, node in result.nodes:
            node_by_bel[bel] = node
            cached = cache.get(bel)
            if cached is None:
                concept = node.get(CONCEPT) or {}
                cached = cache[bel] = (
                    bel_md5(bel),
                    canonical_json(node),
                    node[FUNCTION],
                    concept.get(NAMESPACE),
                    concept.get(NAME),
                    concept.get(IDENTIFIER),
                )
            md5_by_bel[bel] = cached[0]
            rows.append({
                "kind": "node",
                "url": url,
                "bel": bel,
                "md5": cached[0],
                "node_json": cached[1],
                "function": cached[2],
                "namespace": cached[3],
                "name": cached[4],
                "identifier": cached[5],
            })

        for edge in result.edges:
            data = edge["data"]
            citation = data.get(CITATION) or {}
            triple = edge_to_triple(
                node_by_bel[edge["src_bel"]], data, node_by_bel[edge["dst_bel"]],
            )
            annotations = data.get(ANNOTATIONS)
            subject = data.get(SUBJECT)
            obj = data.get(OBJECT)
            rows.append({
                "kind": "edge",
                "url": url,
                "edge_md5": edge["md5"],
                "src_bel": edge["src_bel"],
                "src_md5": md5_by_bel[edge["src_bel"]],
                "dst_bel": edge["dst_bel"],
                "dst_md5": md5_by_bel[edge["dst_bel"]],
                "relation": data[RELATION],
                "evidence": data.get(EVIDENCE),
                "citation_db": citation.get(CITATION_DB),
                "citation_id": citation.get(CITATION_IDENTIFIER),
                "annotations_json": canonical_json(annotations) if annotations else None,
                "subject_json": canonical_json(subject) if subject else None,
                "object_json": canonical_json(obj) if obj else None,
                "line": data.get(LINE),
                "triple_h": triple[0] if triple else None,
                "triple_r": triple[1] if triple else None,
                "triple_t": triple[2] if triple else None,
            })

        for err in result.errors:
            rows.append({
                "kind": "error",
                "url": url,
                "line_number": err["line_number"],
                "error_class": err["error_class"],
                "error_line": err["line"],
                "context_json": err["context"],
            })

        rows.append({
            "kind": "doc",
            "url": url,
            "gated": False,
            "aborted": result.aborted,
            "n_statements": result.n_statements,
            "metadata_json": canonical_json(result.metadata) if result.metadata else None,
        })


MANIFEST_SCHEMA = pa.schema([
    ("file", pa.string()),
    ("rows", pa.int64()),
    ("pages", pa.int64()),
    ("statements", pa.int64()),
    ("triples", pa.int64()),
])


class ParseDocumentsToDir(ParseDocuments):
    """Parse stage that writes its own Parquet shard per batch.

    Routing the full-width events (measured ~390 B/row uncompressed Arrow,
    37 GB for 300k pages) through a downstream ``write_parquet`` operator
    starves it of CPU next to a near-full actor pool and backpressures the
    whole pipeline (observed: task_completion_time 3.8× the no-backpressure
    time).  Here each actor encodes and writes its own shard — the encode
    cost joins the embarrassingly-parallel stage and the operator output
    shrinks to one manifest row per shard.

    Retry-safe: the shard filename is the md5 over ALL the batch's urls (a
    first-url-only name silently collides when two blocks start with the
    same url — plausible with duplicate urls in a real crawl), so a retried
    task overwrites its own output (write-to-temp + atomic rename), never
    duplicating events, and distinct blocks never alias.  Use with
    ``batch_size=None`` (one batch = one input block) so shards are
    read-efficient (~10-50 MB).
    """

    def __init__(self, out_dir: str, triples_dir: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.out_dir = out_dir
        self.triples_dir = triples_dir

    @staticmethod
    def _atomic_write(table: pa.Table, path: str) -> None:
        import os

        import pyarrow.parquet as pq

        tmp = path + ".tmp"
        pq.write_table(table, tmp, compression="snappy")
        os.replace(tmp, path)  # atomic: retries overwrite, never duplicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.compute as pc

        events = super().__call__(batch)
        h = hashlib.md5()  # noqa: S324
        for url in batch.column("url").to_pylist():
            h.update((url or "").encode("utf8"))
            h.update(b"\x00")
        name = h.hexdigest()
        path = os.path.join(self.out_dir, "part-{}.parquet".format(name))
        self._atomic_write(events, path)

        kind = events.column("kind")
        is_doc = pc.equal(kind, "doc")
        statements = pc.sum(
            pc.if_else(is_doc, events.column("n_statements"), pa.scalar(0, pa.int32())),
        ).as_py() or 0

        n_triples = 0
        if self.triples_dir is not None:
            # side output: the narrow, per-shard-deduped raw triples — the
            # export pass then scans 3 short columns instead of filtering
            # the full-width events
            from .dedup import local_dedup_table

            edge_mask = pc.and_(
                pc.equal(kind, "edge"), pc.is_valid(events.column("triple_h")),
            )
            tri = events.filter(edge_mask)
            tri = pa.Table.from_arrays(
                [tri.column("triple_h"), tri.column("triple_r"), tri.column("triple_t")],
                names=["h", "r", "t"],
            )
            key = pc.binary_join_element_wise(
                tri.column("h"), tri.column("r"), tri.column("t"), "\x1f",
            )
            tri = local_dedup_table(tri.append_column("hrt", key), "hrt")
            tri = tri.drop_columns(["hrt"])
            n_triples = tri.num_rows
            self._atomic_write(
                tri, os.path.join(self.triples_dir, "part-{}.parquet".format(name)),
            )
        else:
            n_triples = pc.sum(
                pc.and_(
                    pc.equal(kind, "edge"), pc.is_valid(events.column("triple_h")),
                ).cast(pa.int64()),
            ).as_py() or 0

        return pa.Table.from_pylist([{
            "file": path,
            "rows": events.num_rows,
            "pages": batch.num_rows,
            "statements": int(statements),
            "triples": int(n_triples),
        }], schema=MANIFEST_SCHEMA)
