"""CX and JGIF interchange documents (driver-side, small graphs).

Reference: ``io/cx.py:95-577`` (aspect-list CX) and ``io/jgif.py:129-417``.
Both are JSON interchange formats assembled from the node/edge tables; the
engine treats them as optional driver-side exporters — the scalable
interchange is the Parquet node/edge pair.
"""

from __future__ import annotations

import json
from typing import Optional

from ..struct.graph import Graph
from .bel_script import edge_to_bel_statement

__all__ = ["to_cx", "from_cx", "to_jgif"]


def to_cx(graph: Graph, metadata: Optional[dict] = None) -> list:
    """CX aspect list: nodes / edges / nodeAttributes / edgeAttributes /
    networkAttributes."""
    node_rows = sorted(graph.nodes.take_all(), key=lambda r: r["bel"])
    node_id = {r["md5"]: i for i, r in enumerate(node_rows)}

    nodes_aspect = [
        {"@id": i, "n": r["bel"]} for i, r in enumerate(node_rows)
    ]
    node_attrs = []
    for i, r in enumerate(node_rows):
        node_attrs.append({"po": i, "n": "function", "v": r["function"]})
        if r["namespace"]:
            node_attrs.append({"po": i, "n": "namespace", "v": r["namespace"]})
        node_attrs.append({"po": i, "n": "json", "v": r["node_json"]})

    edges_aspect = []
    edge_attrs = []
    edge_rows = sorted(graph.edges.take_all(), key=lambda r: r["edge_md5"])
    for j, r in enumerate(edge_rows):
        edges_aspect.append({
            "@id": j,
            "s": node_id[r["src_md5"]],
            "t": node_id[r["dst_md5"]],
            "i": r["relation"],
        })
        for key in ("evidence", "citation_db", "citation_id",
                    "annotations_json", "subject_json", "object_json"):
            if r.get(key) is not None:
                edge_attrs.append({"po": j, "n": key, "v": r[key]})
        edge_attrs.append({"po": j, "n": "key", "v": r["edge_md5"]})

    return [
        {"numberVerification": [{"longNumber": 281474976710655}]},
        {"networkAttributes": [
            {"n": k, "v": v} for k, v in sorted((metadata or {}).items())
        ]},
        {"nodes": nodes_aspect},
        {"edges": edges_aspect},
        {"nodeAttributes": node_attrs},
        {"edgeAttributes": edge_attrs},
        {"status": [{"error": "", "success": True}]},
    ]


def from_cx(aspects: list) -> Graph:
    """Rebuild a Graph from the CX aspect list produced by :func:`to_cx`."""
    import pyarrow as pa
    import ray.data

    from ..canon import bel_md5
    from .nodelink import from_nodelink

    by_name = {}
    for aspect in aspects:
        for name, content in aspect.items():
            by_name.setdefault(name, []).extend(content)

    node_attr = {}
    for a in by_name.get("nodeAttributes", []):
        node_attr.setdefault(a["po"], {})[a["n"]] = a["v"]
    edge_attr = {}
    for a in by_name.get("edgeAttributes", []):
        edge_attr.setdefault(a["po"], {})[a["n"]] = a["v"]

    # assemble a nodelink document and reuse its importer
    nodes = []
    for n in by_name["nodes"]:
        node = json.loads(node_attr[n["@id"]]["json"])
        node["id"] = bel_md5(n["n"])
        node["bel"] = n["n"]
        nodes.append(node)
    links = []
    for e in by_name["edges"]:
        attrs = edge_attr.get(e["@id"], {})
        link = {"relation": e["i"], "source": e["s"], "target": e["t"]}
        if "key" in attrs:
            link["key"] = attrs["key"]
        if "evidence" in attrs:
            link["evidence"] = attrs["evidence"]
        if "citation_db" in attrs:
            link["citation"] = {"db": attrs["citation_db"], "db_id": attrs.get("citation_id")}
        for jkey, out in (("annotations_json", "annotations"),
                          ("subject_json", "subject"), ("object_json", "object")):
            if jkey in attrs:
                link[out] = json.loads(attrs[jkey])
        links.append(link)

    meta = {a["n"]: a["v"] for a in by_name.get("networkAttributes", [])}
    return from_nodelink({
        "directed": True, "multigraph": True, "graph": meta,
        "nodes": nodes, "links": links,
    })


def to_jgif(graph: Graph, metadata: Optional[dict] = None) -> dict:
    """JSON Graph Interchange Format document (reference io/jgif.py:300+)."""
    node_rows = sorted(graph.nodes.take_all(), key=lambda r: r["bel"])
    node_json = {r["md5"]: json.loads(r["node_json"]) for r in node_rows}

    edges = []
    for r in sorted(graph.edges.take_all(), key=lambda r: r["edge_md5"]):
        data = {"relation": r["relation"]}
        if r.get("subject_json"):
            data["subject"] = json.loads(r["subject_json"])
        if r.get("object_json"):
            data["object"] = json.loads(r["object_json"])
        evidence_entry = {}
        if r.get("evidence") is not None:
            evidence_entry["summary_text"] = r["evidence"]
        if r.get("citation_db") is not None:
            evidence_entry["citation"] = {
                "type": r["citation_db"], "id": r["citation_id"],
            }
        if r.get("annotations_json"):
            evidence_entry["experiment_context"] = json.loads(r["annotations_json"])
        edges.append({
            "source": r["src_bel"],
            "target": r["dst_bel"],
            "relation": r["relation"],
            "label": edge_to_bel_statement(
                node_json[r["src_md5"]], data, node_json[r["dst_md5"]],
            ),
            "metadata": {"evidences": [evidence_entry] if evidence_entry else []},
        })

    return {
        "graph": {
            "metadata": dict(metadata or {}),
            "nodes": [{"id": r["bel"], "label": r["bel"]} for r in node_rows],
            "edges": edges,
        },
    }
