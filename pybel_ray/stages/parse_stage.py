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


#: (column name, position in EVENTS_SCHEMA) per event kind — used by the
#: columnar collector to build each kind's sub-table directly
_NODE_COLS = ["url", "bel", "md5", "node_json", "function", "namespace",
              "name", "identifier"]
_EDGE_COLS = ["url", "edge_md5", "src_bel", "src_md5", "dst_bel", "dst_md5",
              "relation", "evidence", "citation_db", "citation_id",
              "annotations_json", "subject_json", "object_json", "line",
              "triple_h", "triple_r", "triple_t"]
_ERROR_COLS = ["url", "line_number", "error_class", "error_line",
               "context_json"]
_DOC_COLS = ["url", "gated", "aborted", "n_statements", "metadata_json"]


class _EventColumns:
    """Columnar event collector: per-kind Python column lists → one Arrow
    table in EVENTS_SCHEMA order.

    Replaces list-of-dicts + ``Table.from_pylist`` (measured ~6% of stage
    time in the round-1 profile): values append straight onto typed column
    lists and each kind's sub-table is built with ``pa.array`` per column
    plus O(1) null columns for the fields the kind doesn't carry.
    """

    __slots__ = ("node", "edge", "error", "doc")

    def __init__(self):
        self.node = [[] for _ in _NODE_COLS]
        self.edge = [[] for _ in _EDGE_COLS]
        self.error = [[] for _ in _ERROR_COLS]
        self.doc = [[] for _ in _DOC_COLS]

    def add_node(self, url, bel, cached):
        cols = self.node
        cols[0].append(url)
        cols[1].append(bel)
        cols[2].append(cached[0])
        cols[3].append(cached[1])
        cols[4].append(cached[2])
        cols[5].append(cached[3])
        cols[6].append(cached[4])
        cols[7].append(cached[5])

    def add_edge(self, url, edge_md5, src_bel, src_md5, dst_bel, dst_md5,
                 relation, evidence, citation_db, citation_id,
                 annotations_json, subject_json, object_json, line, triple):
        cols = self.edge
        cols[0].append(url)
        cols[1].append(edge_md5)
        cols[2].append(src_bel)
        cols[3].append(src_md5)
        cols[4].append(dst_bel)
        cols[5].append(dst_md5)
        cols[6].append(relation)
        cols[7].append(evidence)
        cols[8].append(citation_db)
        cols[9].append(citation_id)
        cols[10].append(annotations_json)
        cols[11].append(subject_json)
        cols[12].append(object_json)
        cols[13].append(line)
        if triple:
            cols[14].append(triple[0])
            cols[15].append(triple[1])
            cols[16].append(triple[2])
        else:
            cols[14].append(None)
            cols[15].append(None)
            cols[16].append(None)

    def add_error(self, url, line_number, error_class, error_line, context_json):
        cols = self.error
        cols[0].append(url)
        cols[1].append(line_number)
        cols[2].append(error_class)
        cols[3].append(error_line)
        cols[4].append(context_json)

    def add_doc(self, url, gated, aborted, n_statements, metadata_json):
        cols = self.doc
        cols[0].append(url)
        cols[1].append(gated)
        cols[2].append(aborted)
        cols[3].append(n_statements)
        cols[4].append(metadata_json)

    def _kind_table(self, kind, names, cols) -> pa.Table:
        n = len(cols[0])
        present = dict(zip(names, cols))
        arrays = []
        for field in EVENTS_SCHEMA:
            if field.name == "kind":
                arrays.append(pa.array([kind] * n, pa.string()))
            elif field.name in present:
                arrays.append(pa.array(present[field.name], field.type))
            else:
                arrays.append(pa.nulls(n, field.type))
        return pa.Table.from_arrays(arrays, schema=EVENTS_SCHEMA)

    def to_table(self) -> pa.Table:
        parts = [
            self._kind_table(kind, names, cols)
            for kind, names, cols in (
                ("node", _NODE_COLS, self.node),
                ("edge", _EDGE_COLS, self.edge),
                ("error", _ERROR_COLS, self.error),
                ("doc", _DOC_COLS, self.doc),
            )
            if cols[0]
        ]
        if not parts:
            return EVENTS_SCHEMA.empty_table()
        if len(parts) == 1:
            return parts[0]
        return pa.concat_tables(parts)


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
        rows = _EventColumns()
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        for url, text in zip(urls, texts):
            self._process_page(rows, url, text or "")
        return rows.to_table()

    # -- internals ---------------------------------------------------------

    def _process_page(self, rows: "_EventColumns", url: str, text: str) -> None:
        if self.gate and not looks_like_bel(text):
            rows.add_doc(url, True, False, 0, None)
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
            rows.add_node(url, bel, cached)

        for edge in result.edges:
            data = edge["data"]
            citation = data.get(CITATION) or {}
            triple = edge_to_triple(
                node_by_bel[edge["src_bel"]], data, node_by_bel[edge["dst_bel"]],
            )
            annotations = data.get(ANNOTATIONS)
            subject = data.get(SUBJECT)
            obj = data.get(OBJECT)
            rows.add_edge(
                url,
                edge["md5"],
                edge["src_bel"], md5_by_bel[edge["src_bel"]],
                edge["dst_bel"], md5_by_bel[edge["dst_bel"]],
                data[RELATION],
                data.get(EVIDENCE),
                citation.get(CITATION_DB),
                citation.get(CITATION_IDENTIFIER),
                canonical_json(annotations) if annotations else None,
                canonical_json(subject) if subject else None,
                canonical_json(obj) if obj else None,
                data.get(LINE),
                triple,
            )

        for err in result.errors:
            rows.add_error(
                url, err["line_number"], err["error_class"], err["line"],
                err["context"],
            )

        rows.add_doc(
            url, False, result.aborted, result.n_statements,
            canonical_json(result.metadata) if result.metadata else None,
        )


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
    task overwrites its own output (local: write-to-temp + atomic rename;
    object store: direct PUT to the same key — see
    :mod:`pybel_ray.fsio` for the two commit protocols), never duplicating
    events, and distinct blocks never alias.  Use with ``batch_size=None``
    (one batch = one input block) so shards are read-efficient (~10-50 MB).

    ``out_dir``/``triples_dir`` may be plain local paths, ``pyarrow.fs``
    URIs (``s3://…``), or paths under an explicit ``filesystem`` instance
    (filesystems pickle into the actor constructor).
    """

    def __init__(
        self,
        out_dir: str,
        triples_dir: Optional[str] = None,
        filesystem=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        from .. import fsio

        self.fs, self.out_dir = fsio.parse_target(out_dir, filesystem)
        if triples_dir is not None:
            tfs, self.triples_dir = fsio.parse_target(triples_dir, filesystem)
            if (tfs is None) != (self.fs is None):
                raise ValueError(
                    "events and triples targets must share a filesystem",
                )
        else:
            self.triples_dir = None

    def _atomic_write(self, table: pa.Table, path: str) -> None:
        import os

        from .. import fsio

        # zstd-1 measured ~3x smaller than snappy at the same encode time
        # on events-shaped tables; shard write+read-back bandwidth is what
        # saturates first when the host disk window degrades (152 MB/s
        # sustained observed), so smaller shards move the bottleneck back
        # to compute.  PYBEL_RAY_SHARD_CODEC=snappy flips the trade for
        # fast-disk hosts (and for A/B attribution of bench deltas).
        if os.environ.get("PYBEL_RAY_SHARD_CODEC", "zstd1") == "snappy":
            fsio.write_parquet_atomic(self.fs, table, path, compression="snappy")
        else:
            fsio.write_parquet_atomic(
                self.fs, table, path, compression="zstd", compression_level=1,
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .. import fsio

        events = super().__call__(batch)
        h = hashlib.md5()  # noqa: S324
        for url in batch.column("url").to_pylist():
            h.update((url or "").encode("utf8"))
            h.update(b"\x00")
        name = h.hexdigest()
        path = fsio.join(self.fs, self.out_dir, "part-{}.parquet".format(name))
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
                tri,
                fsio.join(
                    self.fs, self.triples_dir, "part-{}.parquet".format(name),
                ),
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
