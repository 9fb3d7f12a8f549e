"""CX and JGIF interchange documents (driver-side, small graphs).

Reference: ``io/cx.py:95-577`` (aspect-list CX) and ``io/jgif.py:129-417``.
Both are JSON interchange formats assembled from the node/edge tables; the
engine treats them as optional driver-side exporters — the scalable
interchange is the Parquet node/edge pair.
"""

from __future__ import annotations

import json
from typing import List, Optional

from ..struct.graph import Graph
from .bel_script import edge_to_bel_statement

__all__ = [
    "to_cx", "from_cx", "to_jgif", "from_jgif", "from_cbn_jgif", "map_cbn",
    "to_graphdati", "to_graphdati_jsonl", "to_graphdati_jsonl_dir",
    "to_cx_file", "to_cx_jsons", "from_cx_file", "from_cx_jsons",
    "to_jgif_file", "to_jgif_jsons", "from_jgif_file", "from_jgif_jsons",
    "to_graphdati_file",
]

#: reference io/jgif.py:58 — evidence placeholder dropped on import
PLACEHOLDER_EVIDENCE = (
    "This Network edge has no supporting evidence.  Please add real evidence "
    "to this edge prior to deleting."
)


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

    # assemble a nodelink document and reuse its importer; CX node @ids
    # are arbitrary (NDEx emits sparse ids), so edges are wired through an
    # @id -> list-position map, never positionally
    nodes = []
    node_pos = {}
    for pos, n in enumerate(by_name["nodes"]):
        node = json.loads(node_attr[n["@id"]]["json"])
        node["id"] = bel_md5(n["n"])
        node["bel"] = n["n"]
        nodes.append(node)
        node_pos[n["@id"]] = pos
    links = []
    for e in by_name["edges"]:
        attrs = edge_attr.get(e["@id"], {})
        link = {"relation": e["i"], "source": node_pos[e["s"]],
                "target": node_pos[e["t"]]}
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


def _emissions_to_graph(em, metadata: Optional[dict] = None) -> Graph:
    """Materialize an :class:`Emissions` collector as a Graph (Datasets)."""
    import pyarrow as pa
    import ray.data

    from ..canon import bel_md5, canonical_json
    from ..constants import (
        ANNOTATIONS, CITATION, CITATION_DB, CITATION_IDENTIFIER, CONCEPT,
        EVIDENCE, FUNCTION, IDENTIFIER, NAME, NAMESPACE, OBJECT, RELATION,
        SUBJECT,
    )
    from .triples import edge_to_triple

    node_by_bel = dict(em.nodes)
    node_rows = []
    for bel, node in em.nodes:
        concept = node.get(CONCEPT) or {}
        node_rows.append({
            "md5": bel_md5(bel),
            "bel": bel,
            "function": node[FUNCTION],
            "namespace": concept.get(NAMESPACE),
            "name": concept.get(NAME),
            "identifier": concept.get(IDENTIFIER),
            "node_json": canonical_json(node),
        })
    edge_rows = []
    for edge in em.edges:
        data = edge["data"]
        citation = data.get(CITATION) or {}
        annotations = data.get(ANNOTATIONS)
        subject = data.get(SUBJECT)
        obj = data.get(OBJECT)
        triple = edge_to_triple(
            node_by_bel[edge["src_bel"]], data, node_by_bel[edge["dst_bel"]],
        )
        edge_rows.append({
            "edge_md5": edge["md5"],
            "src_md5": bel_md5(edge["src_bel"]),
            "dst_md5": bel_md5(edge["dst_bel"]),
            "src_bel": edge["src_bel"],
            "dst_bel": edge["dst_bel"],
            "relation": data[RELATION],
            "evidence": data.get(EVIDENCE),
            "citation_db": citation.get(CITATION_DB),
            "citation_id": citation.get(CITATION_IDENTIFIER),
            "annotations_json": canonical_json(annotations) if annotations else None,
            "subject_json": canonical_json(subject) if subject else None,
            "object_json": canonical_json(obj) if obj else None,
            "triple_h": triple[0] if triple else None,
            "triple_r": triple[1] if triple else None,
            "triple_t": triple[2] if triple else None,
        })
    nodes = ray.data.from_arrow(pa.Table.from_pylist(node_rows))
    edges = ray.data.from_arrow(pa.Table.from_pylist(edge_rows))
    return Graph(nodes, edges, metadata=metadata or {})


def from_jgif(doc: dict) -> Graph:
    """Build a Graph from a JGIF document (reference io/jgif.py:207-293).

    Mirrors the reference importer: node labels are parsed as singleton BEL
    terms; each qualified edge's ``label`` statement is re-parsed once per
    evidence entry with the citation/evidence/annotation control state from
    that entry.  Unqualified relations and the legacy ``actsIn`` /
    ``translocates`` relations are skipped exactly as the reference does.
    """
    from ..constants import UNQUALIFIED_EDGES
    from ..exc import BELParserWarning
    from ..grammar.cursor import ParseFailure
    from ..grammar.statements import BELStatementParser, Emissions
    from ..grammar.terms import ConceptValidator

    root = doc["graph"]
    parser = BELStatementParser(
        validator=ConceptValidator(allow_naked_names=True),
    )
    em = Emissions()

    for node in root.get("nodes", []):
        label = node.get("label")
        if label is None:
            continue
        try:
            parser.parse_statement(label, 0, em)
        except (BELParserWarning, ParseFailure):
            continue

    for i, edge in enumerate(root.get("edges", [])):
        relation = edge.get("relation")
        if relation in ("actsIn", "translocates"):
            continue  # legacy BEL 1.0 forms, dropped by the reference too
        if relation in UNQUALIFIED_EDGES:
            continue  # reference io/jgif.py:260-261 (FIXME upstream)
        bel_statement = edge.get("label")
        edge_metadata = edge.get("metadata")
        if not bel_statement or not edge_metadata:
            continue
        for evidence in edge_metadata.get("evidences") or []:
            citation = evidence.get("citation")
            if not citation or not citation.get("type") \
                    or citation.get("id") in (None, ""):
                continue
            summary_text = (evidence.get("summary_text") or "").strip()
            if not summary_text or summary_text == PLACEHOLDER_EVIDENCE:
                continue
            parser.control.clear()
            # ids may arrive as ints in third-party JGIF
            parser.control.citation_db = str(citation["type"]).strip()
            parser.control.citation_db_id = str(citation["id"]).strip()
            parser.control.evidence = summary_text
            for key, value in (evidence.get("experiment_context") or {}).items():
                # accept {v: True} maps (our to_jgif), lists, or scalars
                if isinstance(value, dict):
                    parser.control.annotations[key] = set(value)
                elif isinstance(value, (list, set, frozenset)):
                    parser.control.annotations[key] = set(value)
                else:
                    parser.control.annotations[key] = value
            try:
                parser.parse_statement(bel_statement, i, em)
            except (BELParserWarning, ParseFailure):
                continue

    metadata = dict(root.get("metadata") or {})
    if "label" in root:
        metadata.setdefault("name", root["label"])
    return _emissions_to_graph(em, metadata=metadata)


#: CBN experiment-context key normalization (reference io/jgif.py:45-56)
CBN_ANNOTATION_MAP = {
    "tissue": "Tissue",
    "disease": "Disease",
    "species_common_name": "Species",
    "cell": "Cell",
}

CBN_SPECIES_MAP = {
    "human": "9606",
    "rat": "10116",
    "mouse": "10090",
}


def map_cbn(doc: dict) -> dict:
    """Normalize CBN experiment-context annotations in place
    (reference io/jgif.py:63-126): trim keys/values, map
    ``species_common_name`` to taxonomy ids, rename known keys."""
    for edge in doc.get("graph", {}).get("edges", []):
        metadata = edge.get("metadata")
        if not metadata:
            continue
        for evidence in metadata.get("evidences") or []:
            context = evidence.get("experiment_context")
            if not context:
                continue
            new_context = {}
            for key, value in context.items():
                if not value:
                    continue
                value = value.strip() if isinstance(value, str) else value
                if not value:
                    continue
                key = key.strip().lower()
                if key == "species_common_name":
                    lookup = value.lower() if isinstance(value, str) else value
                    # unmapped species pass through verbatim (reference's
                    # map covers human/rat/mouse only; don't abort the doc)
                    new_context["Species"] = CBN_SPECIES_MAP.get(lookup, value)
                elif key in CBN_ANNOTATION_MAP:
                    new_context[CBN_ANNOTATION_MAP[key]] = value
                else:
                    new_context[key] = value
            evidence["experiment_context"] = new_context
    return doc


def from_cbn_jgif(doc: dict) -> Graph:
    """Build a Graph from Causal Biological Network Database JGIF
    (reference io/jgif.py:129-186): CBN context normalization via
    :func:`map_cbn`, provenance metadata stamp, then the standard
    :func:`from_jgif` import."""
    doc = map_cbn(doc)
    doc.setdefault("graph", {}).setdefault("metadata", {}).update({
        "authors": "Causal Biological Networks Database",
        "contact": "CausalBiologicalNetworks.RD@pmi.com",
    })
    return from_jgif(doc)


#: reference io/graphdati.py:32
GRAPHDATI_SCHEMA_URI = (
    "https://github.com/belbio/schemas/blob/master/schemas/nanopub_bel-1.0.0.yaml"
)


def _nanopub_from_row(r: dict, src_node: dict, dst_node: dict, metadata: dict) -> dict:
    """One GraphDati nanopub from an edge row + endpoint node dicts."""
    from ..constants import OBJECT, RELATION, SUBJECT
    from .bel_script import decanonicalize_edge_node

    data = {RELATION: r["relation"]}
    if r.get("subject_json"):
        data[SUBJECT] = json.loads(r["subject_json"])
    if r.get("object_json"):
        data[OBJECT] = json.loads(r["object_json"])
    subj = decanonicalize_edge_node(src_node, data, SUBJECT)
    obj = decanonicalize_edge_node(dst_node, data, OBJECT)
    if r.get("citation_db") is not None:
        citation = {"database": {"name": r["citation_db"], "id": r["citation_id"]}}
    else:
        citation = {"reference": "Not Available"}
    annotations = []
    if r.get("annotations_json"):
        annotations = [
            {"type": key, "label": value}
            for key, values in sorted(json.loads(r["annotations_json"]).items())
            for value in sorted(values)
        ]
    return {
        "nanopub": {
            "schema_uri": GRAPHDATI_SCHEMA_URI,
            "type": {"name": "BEL", "version": "2.1.0"},
            "annotations": annotations,
            "citation": citation,
            "assertions": [
                {"subject": subj, "relation": r["relation"], "object": obj},
            ],
            "evidence": r.get("evidence") or "Not Available",
            "metadata": {
                "gd_creator": metadata.get("authors"),
                "version": metadata.get("version"),
            },
            "id": "pybel_{}".format(r["edge_md5"]),
        },
    }


def to_graphdati(graph: Graph, metadata: Optional[dict] = None) -> list:
    """GraphDati nanopub list (reference io/graphdati.py:75-135).

    One nanopub per edge: assertion (subject, relation, object with edge
    modifiers folded into the term strings), evidence, citation, metadata.
    Driver-side parity convenience; :func:`to_graphdati_jsonl_dir` is the
    streaming scale path.
    """
    node_json = {r["md5"]: json.loads(r["node_json"]) for r in graph.nodes.take_all()}
    metadata = dict(metadata or {})
    return [
        _nanopub_from_row(
            r, node_json[r["src_md5"]], node_json[r["dst_md5"]], metadata,
        )
        for r in sorted(graph.edges.take_all(), key=lambda r: r["edge_md5"])
    ]


def to_graphdati_jsonl_dir(graph: Graph, path: str, metadata: Optional[dict] = None) -> None:
    """Streaming GraphDati export: nanopub JSONL shards, fully distributed.

    Endpoint node dicts reach each edge via two bucketed lookup joins
    (``struct.degree.bucketed_attach``) — no node map on the driver — and
    each batch writes its own ``part-*.jsonl`` (idempotent names, atomic
    rename), mirroring the parse stage's actor-write pattern.
    """
    import hashlib
    import os

    import pyarrow as pa

    from ..struct.degree import bucketed_attach

    os.makedirs(path, exist_ok=True)
    # clear stale shards: shard names depend on batch content/boundaries,
    # so a re-export over a mutated graph would otherwise leave orphaned
    # part files from the previous run mixed into the directory
    for stale in os.listdir(path):
        if stale.startswith("part-") and stale.endswith(".jsonl"):
            os.unlink(os.path.join(path, stale))
    metadata = dict(metadata or {})

    def _rename(col_from: str, col_to: str):
        def _f(t: pa.Table) -> pa.Table:
            return t.rename_columns([
                col_to if c == col_from else c for c in t.column_names
            ])

        return _f

    nodes = graph.nodes.select_columns(["md5", "node_json"])
    edges = bucketed_attach(graph.edges, "src_md5", nodes, "md5", ["node_json"])
    edges = edges.map_batches(_rename("node_json", "_src_node"), batch_format="pyarrow")
    edges = bucketed_attach(edges, "dst_md5", nodes, "md5", ["node_json"])
    edges = edges.map_batches(_rename("node_json", "_dst_node"), batch_format="pyarrow")

    def _write(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        lines = [
            json.dumps(_nanopub_from_row(
                r, json.loads(r["_src_node"]), json.loads(r["_dst_node"]), metadata,
            ), sort_keys=True)
            for r in rows
        ]
        name = hashlib.md5(  # noqa: S324 - shard naming only
            "\x00".join(r["edge_md5"] for r in rows).encode(),
        ).hexdigest()
        part = os.path.join(path, "part-{}.jsonl".format(name))
        tmp = part + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, part)
        return pa.Table.from_arrays(
            [pa.array([part]), pa.array([len(lines)], pa.int64())],
            names=["file", "rows"],
        )

    # the tiny per-shard manifest drives execution
    edges.map_batches(_write, batch_format="pyarrow").materialize()


def to_graphdati_jsonl(graph: Graph, metadata: Optional[dict] = None) -> List[str]:
    """GraphDati as JSON lines, one nanopub per line (io/graphdati.py:60-66)."""
    return [json.dumps(n, sort_keys=True) for n in to_graphdati(graph, metadata)]


# ---------------------------------------------------------------------------
# file / gz / jsons convenience wrappers (reference io/cx.py, io/jgif.py,
# io/graphdati.py file-variant helpers) — driver-side small-result paths
# ---------------------------------------------------------------------------

def _dump(obj, path: str) -> None:
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        json.dump(obj, f, sort_keys=True)


def _load(path: str):
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)


def to_cx_file(graph: Graph, path: str, **kwargs) -> None:
    _dump(to_cx(graph, **kwargs), path)


def to_cx_jsons(graph: Graph, **kwargs) -> str:
    return json.dumps(to_cx(graph, **kwargs), sort_keys=True)


def from_cx_file(path: str) -> Graph:
    return from_cx(_load(path))


def from_cx_jsons(s: str) -> Graph:
    return from_cx(json.loads(s))


def to_jgif_file(graph: Graph, path: str, **kwargs) -> None:
    _dump(to_jgif(graph, **kwargs), path)


def to_jgif_jsons(graph: Graph, **kwargs) -> str:
    return json.dumps(to_jgif(graph, **kwargs), sort_keys=True)


def from_jgif_file(path: str) -> Graph:
    return from_jgif(_load(path))


def from_jgif_jsons(s: str) -> Graph:
    return from_jgif(json.loads(s))


def to_graphdati_file(graph: Graph, path: str, **kwargs) -> None:
    _dump(to_graphdati(graph, **kwargs), path)
