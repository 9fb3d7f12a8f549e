"""Lossy flat exports: CSV / SIF / GSEA / edgelist / GraphML.

Reference: ``io/extras.py:21-90`` (csv/sif/gsea), ``io/tsv/api.py:48-58``
(edgelist), ``io/graphml.py:18-80``.  All are trivial projections of the
edge/triple tables; the Parquet variants stream, the file variants are
driver-side conveniences for small results.
"""

from __future__ import annotations

import json
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..struct.graph import Graph

__all__ = ["to_sif", "to_csv", "to_gsea", "to_edgelist", "to_graphml"]


def to_sif(graph: Graph):
    """(source bel, relation, target bel) Dataset (reference to_sif)."""
    return graph.edges.select_columns(["src_bel", "relation", "dst_bel"])


def to_csv(graph: Graph, path: Optional[str] = None):
    """Edge table with flattened data as CSV (reference to_csv).

    Returns the Dataset; writes driver-side if a path is given.
    """
    ds = graph.edges.select_columns([
        "src_bel", "dst_bel", "relation", "evidence", "citation_db",
        "citation_id", "annotations_json",
    ])
    if path is not None:
        import pyarrow.csv as pacsv

        tables = [pa.Table.from_pylist(ds.take_all())]
        pacsv.write_csv(pa.concat_tables(tables), path)
    return ds


def to_gsea(graph: Graph, namespace: str = None) -> dict:
    """GRP-style gene set: node names grouped by namespace (reference to_gsea)."""
    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("name")))
        if namespace is not None:
            t = t.filter(pc.fill_null(pc.equal(t.column("namespace"), namespace), False))
        return t.select(["namespace", "name"])

    rows = graph.nodes.map_batches(_f, batch_format="pyarrow").take_all()
    out: dict = {}
    for r in rows:
        out.setdefault(r["namespace"], set()).add(r["name"])
    return {k: sorted(v) for k, v in sorted(out.items())}


def to_edgelist(graph: Graph):
    """(h, t, json({relation})) rows from the triple export
    (reference to_edgelist, io/tsv/api.py:48-58)."""

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("triple_h")))
        rel_json = pc.binary_join_element_wise(
            '{"relation": "', t.column("triple_r"), '"}', "",
        )
        return pa.Table.from_arrays(
            [t.column("triple_h"), t.column("triple_t"), rel_json],
            names=["h", "t", "relation_json"],
        )

    return graph.edges.map_batches(_f, batch_format="pyarrow")


def to_graphml(graph: Graph, path: str, umbrella: bool = False) -> None:
    """GraphML export via networkx (driver-side, small graphs;
    reference io/graphml.py:18-80)."""
    import networkx as nx

    from .bel_script import decanonicalize_edge_node

    g = nx.MultiDiGraph()
    node_rows = {r["md5"]: r for r in graph.nodes.take_all()}
    for md5, r in sorted(node_rows.items(), key=lambda kv: kv[1]["bel"]):
        g.add_node(r["bel"], function=r["function"])

    for r in graph.edges.take_all():
        data = {"relation": r["relation"]}
        if r.get("subject_json"):
            data["subject"] = json.loads(r["subject_json"])
        if r.get("object_json"):
            data["object"] = json.loads(r["object_json"])
        if umbrella:
            u_node = json.loads(node_rows[r["src_md5"]]["node_json"])
            v_node = json.loads(node_rows[r["dst_md5"]]["node_json"])
            u = decanonicalize_edge_node(u_node, data, "subject")
            v = decanonicalize_edge_node(v_node, data, "object")
        else:
            u, v = r["src_bel"], r["dst_bel"]
        g.add_edge(u, v, key=r["edge_md5"], relation=r["relation"])

    nx.write_graphml(g, path)
