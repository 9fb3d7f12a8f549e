"""Neo4j export as ``neo4j-admin`` bulk-import CSV shard directories.

The reference's ``to_neo4j`` (io/neo4j.py:18-100) uploads node-by-node
through a live py2neo transaction — a driver-side loop that cannot work
at engine scale (and needs a running server).  The scale-correct
equivalent is Neo4j's offline bulk importer: ``neo4j-admin database
import full`` consumes CSV files with ``:ID`` / ``:LABEL`` /
``:START_ID`` / ``:END_ID`` / ``:TYPE`` headers.  Each Ray batch writes
its own shard CSV (idempotent md5-derived names + atomic rename — the
same pattern as the parse-stage actor writes and the JSONL exporters),
so the export streams with no driver materialization and a re-run
overwrites shards idempotently.

Mapping parity with the reference:

* node label = BEL function; a node that has no namespace concept or
  carries variants / members / fusion exports only ``name`` = its BEL
  string (io/neo4j.py:48-49); named concept nodes export
  namespace / name / identifier with the reference's name-or-identifier
  fallbacks (io/neo4j.py:51-59).
* relationship type = relation; properties ``citation`` =
  ``"db:identifier"``, ``evidence``, and the annotations as one JSON
  string property (the reference sets one list property per annotation
  key — CSV bulk import has a fixed header, so they ride in
  ``annotations`` instead; io/neo4j.py:69-85).
"""

from __future__ import annotations

import csv
import hashlib
import io
import json
import os
from typing import TYPE_CHECKING

import pyarrow as pa

from ..constants import FUSION, MEMBERS, VARIANTS

if TYPE_CHECKING:  # pragma: no cover
    from ..struct.graph import Graph

__all__ = ["to_neo4j_bulk"]

NODE_HEADER = ["md5:ID", "name", "namespace", "identifier", ":LABEL"]
REL_HEADER = [":START_ID", ":END_ID", ":TYPE", "citation", "evidence", "annotations"]


def _node_csv_row(r: dict) -> list:
    node = json.loads(r["node_json"])
    if r["namespace"] is None or VARIANTS in node or MEMBERS in node or FUSION in node:
        return [r["md5"], r["bel"], "", "", r["function"]]
    name, identifier = r["name"], r["identifier"]
    if name and identifier:
        pass
    elif identifier and not name:
        name, identifier = identifier, ""
    elif name and not identifier:
        identifier = ""
    return [r["md5"], name or "", r["namespace"], identifier or "", r["function"]]


def _rel_csv_row(r: dict) -> list:
    citation = ""
    if r["citation_db"] and r["citation_id"]:
        citation = "{}:{}".format(r["citation_db"], r["citation_id"])
    return [
        r["src_md5"], r["dst_md5"], r["relation"], citation,
        r["evidence"] or "", r["annotations_json"] or "",
    ]


def _shard_writer(out_dir: str, header: list, row_fn, key_col: str):
    """A map_batches fn writing one CSV shard per batch, returning a
    one-row manifest (same shape as the JSONL exporters)."""

    def _write(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        buf = io.StringIO()
        w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
        for r in rows:
            w.writerow(row_fn(r))
        name = hashlib.md5(  # noqa: S324 - shard naming only
            "\x00".join(r[key_col] for r in rows).encode(),
        ).hexdigest()
        part = os.path.join(out_dir, "part-{}.csv".format(name))
        tmp = part + ".tmp"
        with open(tmp, "w") as f:
            f.write(buf.getvalue())
        os.replace(tmp, part)
        return pa.Table.from_arrays(
            [pa.array([part]), pa.array([len(rows)], pa.int64())],
            names=["file", "rows"],
        )

    return _write


def to_neo4j_bulk(graph: "Graph", path: str) -> dict:
    """Write ``path/nodes/part-*.csv`` + ``path/relationships/part-*.csv``
    shard dirs plus the two one-line header CSVs the bulk importer needs.

    Returns ``{"nodes": ..., "relationships": ..., "import_command": ...}``
    with total row counts (computed from the tiny per-shard manifests, not
    by re-reading the data).
    """
    nodes_dir = os.path.join(path, "nodes")
    rels_dir = os.path.join(path, "relationships")
    os.makedirs(nodes_dir, exist_ok=True)
    os.makedirs(rels_dir, exist_ok=True)

    for fname, header in (
        ("nodes.header.csv", NODE_HEADER),
        ("relationships.header.csv", REL_HEADER),
    ):
        with open(os.path.join(path, fname), "w") as f:
            f.write(",".join(header) + "\n")

    node_manifest = graph.nodes.map_batches(
        _shard_writer(nodes_dir, NODE_HEADER, _node_csv_row, "md5"),
        batch_format="pyarrow",
    ).materialize()
    rel_manifest = graph.edges.map_batches(
        _shard_writer(rels_dir, REL_HEADER, _rel_csv_row, "edge_md5"),
        batch_format="pyarrow",
    ).materialize()

    return {
        "nodes": int(node_manifest.sum("rows") or 0),
        "relationships": int(rel_manifest.sum("rows") or 0),
        "import_command": (
            "neo4j-admin database import full"
            " --nodes={p}/nodes.header.csv,{p}/nodes/"
            " --relationships={p}/relationships.header.csv,{p}/relationships/"
        ).format(p=path),
    }
