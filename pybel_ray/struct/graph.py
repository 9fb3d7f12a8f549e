"""The engine's graph container: a pair of Datasets.

The reference's ``BELGraph`` (networkx MultiDiGraph) maps to a ``nodes``
Dataset + ``edges`` Dataset with md5 identity columns (SURVEY.md §1.4);
no in-memory graph object ever exists.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

NODE_COLUMNS = [
    "md5", "bel", "function", "namespace", "name", "identifier", "node_json",
]
EDGE_COLUMNS = [
    "edge_md5", "src_md5", "dst_md5", "src_bel", "dst_bel", "relation",
    "evidence", "citation_db", "citation_id", "annotations_json",
    "subject_json", "object_json", "triple_h", "triple_r", "triple_t",
]

#: canonical BEL function label prefix -> function constant (for deriving an
#: endpoint's function from its BEL string without a join)
_PREFIX_TO_FUNCTION = {
    "a(": "Abundance", "g(": "Gene", "m(": "miRNA", "p(": "Protein",
    "r(": "RNA", "bp(": "BiologicalProcess", "path(": "Pathology",
    "complex(": "Complex", "composite(": "Composite", "pop(": "Population",
    "rxn(": "Reaction",
}


def bel_function_of(bel_col: pa.ChunkedArray) -> pa.Array:
    """Vectorized: function constant from a canonical BEL string column."""
    prefix = pc.utf8_slice_codeunits(
        pc.replace_substring_regex(bel_col, r"\(.*$", "("), 0, 12,
    )
    out = None
    for p, func in _PREFIX_TO_FUNCTION.items():
        mask = pc.equal(prefix, p)
        if out is None:
            out = pc.if_else(mask, func, pa.scalar(None, pa.string()))
        else:
            out = pc.if_else(mask, func, out)
    return out


@dataclass
class Graph:
    """nodes + edges Datasets with the standard engine schemas."""

    nodes: "object"
    edges: "object"
    metadata: dict = field(default_factory=dict)

    def node_count(self) -> int:
        return self.nodes.count()

    def edge_count(self) -> int:
        return self.edges.count()

    def summary_dict(self) -> dict:
        """cf. reference ``BELGraph.summary_dict`` (struct/graph.py:770-796)."""
        n = self.node_count()
        e = self.edge_count()
        return {
            "Number of Nodes": n,
            "Number of Edges": e,
            "Network Density": (e / (n * (n - 1))) if n > 1 else 0.0,
        }

    def node_md5_set(self) -> set:
        """Driver-side set of node md5s (small-side helper for joins)."""
        return {r["md5"] for r in self.nodes.select_columns(["md5"]).take_all()}

    def materialize(self) -> "Graph":
        return Graph(self.nodes.materialize(), self.edges.materialize(), self.metadata)


def emit_schema() -> pa.Schema:
    """Schema for a mixed node+edge emit table (importers / inference):
    rows discriminated by ``_emit_kind``; explicit because ``from_pylist``
    infers from the first row only and would drop the other kind's
    columns."""
    return pa.schema(
        [("_emit_kind", pa.string())]
        + [(c, pa.string()) for c in NODE_COLUMNS]
        + [(c, pa.string()) for c in EDGE_COLUMNS],
    )


def pick_emitted(emitted, kind: str, columns):
    """Project one row kind out of a mixed emit Dataset."""

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("_emit_kind"), kind)).select(columns)

    return emitted.map_batches(_f, batch_format="pyarrow")


def node_row_from_dict(node: dict) -> dict:
    """Build a node table row from a node dict (for synthesized nodes)."""
    from ..canon import bel_md5, canonical_json, node_to_bel
    from ..constants import CONCEPT, FUNCTION, IDENTIFIER, NAME, NAMESPACE

    bel = node_to_bel(node)
    concept = node.get(CONCEPT) or {}
    return {
        "md5": bel_md5(bel),
        "bel": bel,
        "function": node[FUNCTION],
        "namespace": concept.get(NAMESPACE),
        "name": concept.get(NAME),
        "identifier": concept.get(IDENTIFIER),
        "node_json": canonical_json(node),
    }


def edge_row(src_row: dict, dst_row: dict, data: dict) -> dict:
    """Build an edge table row from node rows + edge data dict."""
    from ..canon import canonical_json, edge_md5
    from ..constants import (
        ANNOTATIONS, CITATION, CITATION_DB, CITATION_IDENTIFIER, EVIDENCE,
        OBJECT, RELATION, SUBJECT,
    )
    from ..export.triples import edge_to_triple

    u = json.loads(src_row["node_json"])
    v = json.loads(dst_row["node_json"])
    triple = edge_to_triple(u, data, v)
    citation = data.get(CITATION) or {}
    annotations = data.get(ANNOTATIONS)
    subject = data.get(SUBJECT)
    obj = data.get(OBJECT)
    return {
        "edge_md5": edge_md5(src_row["bel"], dst_row["bel"], data),
        "src_md5": src_row["md5"],
        "dst_md5": dst_row["md5"],
        "src_bel": src_row["bel"],
        "dst_bel": dst_row["bel"],
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
    }
