"""Node-link JSON export/import (reference io/nodelink.py:32-170).

The scalable canonical export is the node/edge Parquet pair
(:meth:`KGTables.nodes` / :meth:`KGTables.edges`); node-link JSON is the
reference-compatible interchange document assembled driver-side for graphs
that fit in memory (nodes sorted by BEL string, links referencing node
indices, nodes augmented with ``id`` = md5 + ``bel``).
"""

from __future__ import annotations

import gzip
import json
from typing import Optional

from ..canon import bel_md5, canonical_json
from ..constants import (
    ANNOTATIONS,
    CITATION,
    EVIDENCE,
    OBJECT,
    RELATION,
    SUBJECT,
)
from ..struct.graph import Graph

__all__ = [
    "to_nodelink", "to_nodelink_file", "to_nodelink_jsonl_dir",
    "to_nodelink_jsons", "from_nodelink", "from_nodelink_file",
    "from_nodelink_jsons", "to_umbrella_nodelink",
]


def to_nodelink_jsons(graph: "Graph", metadata=None) -> str:
    """Node-link document as a JSON string (reference io/nodelink.py)."""
    return json.dumps(to_nodelink(graph, metadata), sort_keys=True)


def from_nodelink_file(path: str) -> "Graph":
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return from_nodelink(json.load(f))


def from_nodelink_jsons(s: str) -> "Graph":
    return from_nodelink(json.loads(s))


def _edge_data_from_row(row: dict) -> dict:
    data = {RELATION: row["relation"]}
    if row.get("evidence") is not None:
        data[EVIDENCE] = row["evidence"]
    if row.get("citation_db") is not None:
        data[CITATION] = {"db": row["citation_db"], "db_id": row["citation_id"]}
    if row.get("annotations_json"):
        data[ANNOTATIONS] = json.loads(row["annotations_json"])
    if row.get("subject_json"):
        data[SUBJECT] = json.loads(row["subject_json"])
    if row.get("object_json"):
        data[OBJECT] = json.loads(row["object_json"])
    return data


def to_nodelink(graph: Graph, metadata: Optional[dict] = None) -> dict:
    """Assemble the node-link dict (nodes sorted by BEL, indexed links)."""
    node_rows = sorted(graph.nodes.take_all(), key=lambda r: r["bel"])
    index_of = {r["md5"]: i for i, r in enumerate(node_rows)}

    nodes = []
    for r in node_rows:
        node = json.loads(r["node_json"])
        node["id"] = r["md5"]
        node["bel"] = r["bel"]
        nodes.append(node)

    links = []
    for row in graph.edges.take_all():
        data = _edge_data_from_row(row)
        data["source"] = index_of[row["src_md5"]]
        data["target"] = index_of[row["dst_md5"]]
        data["key"] = row["edge_md5"]
        links.append(data)
    links.sort(key=lambda d: (d["source"], d["target"], d["key"]))

    return {
        "directed": True,
        "multigraph": True,
        "graph": dict(metadata or {}),
        "nodes": nodes,
        "links": links,
    }


def to_nodelink_file(graph: Graph, path: str, metadata: Optional[dict] = None) -> None:
    doc = to_nodelink(graph, metadata)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        json.dump(doc, f)


def to_nodelink_jsonl_dir(graph: Graph, path: str, metadata: Optional[dict] = None) -> None:
    """Streaming node-link export: ``nodes/``+``links/`` JSONL shard dirs.

    The scale path for graphs that can't assemble one document driver-side:
    every batch writes its own shard (idempotent name, atomic rename).
    Links reference nodes by md5 (``source``/``target`` ids) instead of the
    in-document positional indices of :func:`to_nodelink` — positional
    indexing requires a global enumeration, which has no streaming analog.
    """
    import hashlib
    import os

    import pyarrow as pa

    for sub in ("nodes", "links"):
        os.makedirs(os.path.join(path, sub), exist_ok=True)
    with open(os.path.join(path, "graph.json"), "w") as f:
        json.dump({
            "directed": True, "multigraph": True, "graph": dict(metadata or {}),
        }, f, sort_keys=True)

    def _shard_writer(sub: str, line_of):
        def _write(t: pa.Table) -> pa.Table:
            rows = t.to_pylist()
            lines = [json.dumps(line_of(r), sort_keys=True) for r in rows]
            name = hashlib.md5(  # noqa: S324 - shard naming only
                "\x00".join(l[:64] for l in lines).encode(),
            ).hexdigest()
            part = os.path.join(path, sub, "part-{}.jsonl".format(name))
            tmp = part + ".tmp"
            with open(tmp, "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
            os.replace(tmp, part)
            return pa.Table.from_arrays(
                [pa.array([part]), pa.array([len(lines)], pa.int64())],
                names=["file", "rows"],
            )

        return _write

    def _node_line(r):
        node = json.loads(r["node_json"])
        node["id"] = r["md5"]
        node["bel"] = r["bel"]
        return node

    def _link_line(r):
        data = _edge_data_from_row(r)
        data["source"] = r["src_md5"]
        data["target"] = r["dst_md5"]
        data["key"] = r["edge_md5"]
        return data

    graph.nodes.map_batches(
        _shard_writer("nodes", _node_line), batch_format="pyarrow",
    ).materialize()
    graph.edges.map_batches(
        _shard_writer("links", _link_line), batch_format="pyarrow",
    ).materialize()


def from_nodelink(doc: dict) -> Graph:
    """Rebuild a Graph (Datasets) from a node-link document."""
    import pyarrow as pa
    import ray.data

    from ..constants import CONCEPT, FUNCTION, IDENTIFIER, NAME, NAMESPACE
    from ..export.triples import edge_to_triple

    node_rows = []
    clean_nodes = []
    for node in doc["nodes"]:
        node = dict(node)
        md5 = node.pop("id")
        bel = node.pop("bel")
        clean_nodes.append(node)
        concept = node.get(CONCEPT) or {}
        node_rows.append({
            "md5": md5,
            "bel": bel,
            "function": node[FUNCTION],
            "namespace": concept.get(NAMESPACE),
            "name": concept.get(NAME),
            "identifier": concept.get(IDENTIFIER),
            "node_json": canonical_json(node),
        })

    edge_rows = []
    for link in doc["links"]:
        link = dict(link)
        source = link.pop("source")
        target = link.pop("target")
        key = link.pop("key", None)
        u_row, v_row = node_rows[source], node_rows[target]
        u, v = clean_nodes[source], clean_nodes[target]
        citation = link.get(CITATION) or {}
        annotations = link.get(ANNOTATIONS)
        subject = link.get(SUBJECT)
        obj = link.get(OBJECT)
        triple = edge_to_triple(u, link, v)
        edge_rows.append({
            "edge_md5": key or bel_md5(canonical_json([u_row["bel"], v_row["bel"], link])),
            "src_md5": u_row["md5"],
            "dst_md5": v_row["md5"],
            "src_bel": u_row["bel"],
            "dst_bel": v_row["bel"],
            "relation": link[RELATION],
            "evidence": link.get(EVIDENCE),
            "citation_db": citation.get("db"),
            "citation_id": citation.get("db_id"),
            "annotations_json": canonical_json(annotations) if annotations else None,
            "subject_json": canonical_json(subject) if subject else None,
            "object_json": canonical_json(obj) if obj else None,
            "triple_h": triple[0] if triple else None,
            "triple_r": triple[1] if triple else None,
            "triple_t": triple[2] if triple else None,
        })

    nodes = ray.data.from_arrow(pa.Table.from_pylist(node_rows))
    edges = ray.data.from_arrow(pa.Table.from_pylist(edge_rows))
    return Graph(nodes, edges, metadata=doc.get("graph", {}))


def to_umbrella_nodelink(graph: Graph, metadata: Optional[dict] = None) -> dict:
    """Node-link variant with subject/object modifiers folded into the node
    names (reference io/umbrella_nodelink.py:40-98)."""
    from .bel_script import decanonicalize_edge_node

    doc = to_nodelink(graph, metadata)
    node_rows = sorted(graph.nodes.take_all(), key=lambda r: r["bel"])
    node_json = [json.loads(r["node_json"]) for r in node_rows]

    umbrella_names = {}
    new_links = []
    for link in doc["links"]:
        data = {k: v for k, v in link.items() if k not in ("source", "target", "key")}
        u_str = decanonicalize_edge_node(node_json[link["source"]], data, SUBJECT)
        v_str = decanonicalize_edge_node(node_json[link["target"]], data, OBJECT)
        for s in (u_str, v_str):
            umbrella_names.setdefault(s, len(umbrella_names))
        new_links.append({
            **{k: v for k, v in data.items() if k not in (SUBJECT, OBJECT)},
            "source": umbrella_names[u_str],
            "target": umbrella_names[v_str],
        })

    return {
        "directed": True,
        "multigraph": True,
        "graph": doc["graph"],
        "nodes": [{"bel": name} for name in umbrella_names],
        "links": new_links,
    }
