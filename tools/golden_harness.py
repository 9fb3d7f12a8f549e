"""Golden-fixture harness: run the READ-ONLY reference compiler offline.

Drives ``/root/reference`` (10mubeen/pybel) with import-time dependency stubs
(``tools/refstubs``) and a fake in-memory Manager so that ``parse_lines``
works without SQL or network.  Used ONLY to generate expected node/edge/
triple tables that the engine's conformance tests diff against — no reference
code is copied into the engine.

Usage:
    python tools/golden_harness.py <bel-file> ...   # prints summary
    from tools.golden_harness import compile_reference
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "refstubs"))
sys.path.insert(0, "/root/reference/src")

import bel_resources  # noqa: E402  (the stub)
from pybel.io.line_utils import parse_lines  # noqa: E402
from pybel.io.tsv.api import get_triples  # noqa: E402
from pybel.canonicalize import edge_to_bel  # noqa: E402
from pybel.struct.graph import BELGraph  # noqa: E402

_RESOURCE_DIR = "/root/reference/src/pybel/testing/resources"

#: URL -> local path mapping for the reference testing corpus
REFERENCE_URL_MAP = {}
_base = (
    "https://raw.githubusercontent.com/pharmacome/terminology/"
    "73688d6dc24e309fca59a1340dc9ee971e9f3baa/external/"
)
for _name in ("hgnc-names", "chebi-names", "go-names", "mesh-names", "disease-ontology"):
    REFERENCE_URL_MAP[_base + _name + ".belns"] = os.path.join(
        _RESOURCE_DIR, "belns", _name + ".belns",
    )
REFERENCE_URL_MAP[
    "https://raw.githubusercontent.com/pybel/pybel/develop/tests/belns/test_ns_2.belns"
] = os.path.join(_RESOURCE_DIR, "belns", "test_ns_2.belns")
_anno_base = "https://owncloud.scai.fraunhofer.de/index.php/s/JsfpQvkdx3Y5EMx/download?path="
for _name in ("species-taxonomy-id", "cell-line", "confidence-1.0.0", "mesh-diseases"):
    REFERENCE_URL_MAP[_anno_base + _name + ".belanno"] = os.path.join(
        _RESOURCE_DIR, "belanno", _name + ".belanno",
    )

bel_resources.LOCAL_RESOURCES.update(REFERENCE_URL_MAP)


class FakeNamespace:
    def __init__(self, term_to_encoding):
        self._terms = term_to_encoding

    def get_term_to_encodings(self):
        return self._terms


class FakeManager:
    """In-memory replacement for the SQL-backed Manager used by parse_lines."""

    def __init__(self, url_map=None):
        if url_map:
            bel_resources.LOCAL_RESOURCES.update(url_map)

    def get_or_create_namespace(self, url):
        resource = bel_resources.get_bel_resource(url)
        terms = {
            (None, name): encoding
            for name, encoding in resource["Values"].items()
        }
        return FakeNamespace(terms)

    def get_annotation_entry_names(self, url):
        resource = bel_resources.get_bel_resource(url)
        return set(resource["Values"])


def compile_reference(
    text: str,
    url_map=None,
    citation_clearing: bool = True,
    allow_naked_names: bool = False,
    disallow_nested: bool = False,
):
    """Compile BEL text with the reference implementation; return the BELGraph."""
    graph = BELGraph()
    parse_lines(
        graph,
        text.splitlines(),
        manager=FakeManager(url_map),
        citation_clearing=citation_clearing,
        allow_naked_names=allow_naked_names,
        disallow_nested=disallow_nested,
    )
    return graph


def graph_summary(graph):
    nodes = sorted(node.as_bel() for node in graph)
    edges = []
    for u, v, k, d in graph.edges(keys=True, data=True):
        edges.append({
            "src": u.as_bel(),
            "dst": v.as_bel(),
            "relation": d.get("relation"),
            "evidence": d.get("evidence"),
            "citation": dict(d["citation"]) if d.get("citation") else None,
            "annotations": d.get("annotations"),
            "subject": d.get("subject"),
            "object": d.get("object"),
        })
    triples = get_triples(graph)
    warnings = [
        (exc.line_number, type(exc).__name__)
        for _, exc, _ in graph.warnings
    ]
    return {
        "nodes": nodes,
        "edges": edges,
        "triples": [list(t) for t in triples],
        "warnings": warnings,
    }


def main():
    for path in sys.argv[1:]:
        with open(path) as f:
            text = f.read()
        graph = compile_reference(text)
        summary = graph_summary(graph)
        print(path, len(summary["nodes"]), "nodes", len(summary["edges"]), "edges",
              len(summary["triples"]), "triples", len(summary["warnings"]), "warnings")


if __name__ == "__main__":
    main()
