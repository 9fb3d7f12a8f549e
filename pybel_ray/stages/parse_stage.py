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

__all__ = ["ParseDocuments", "EVENTS_SCHEMA"]

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

        result = compile_document(
            text,
            self.registry,
            citation_clearing=self.citation_clearing,
            allow_naked_names=self.allow_naked_names,
            disallow_nested=self.disallow_nested,
        )

        node_by_bel = {}
        for bel, node in result.nodes:
            node_by_bel[bel] = node
            concept = node.get(CONCEPT) or {}
            rows.append({
                "kind": "node",
                "url": url,
                "bel": bel,
                "md5": bel_md5(bel),
                "node_json": canonical_json(node),
                "function": node[FUNCTION],
                "namespace": concept.get(NAMESPACE),
                "name": concept.get(NAME),
                "identifier": concept.get(IDENTIFIER),
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
                "src_md5": bel_md5(edge["src_bel"]),
                "dst_bel": edge["dst_bel"],
                "dst_md5": bel_md5(edge["dst_bel"]),
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
