"""Central-dogma inference + relation transfer.

Reference: ``struct/mutation/inference/protein_rna_origins.py:17-55``
(synthesize parent RNA for each protein and parent gene for each RNA, with
transcription/translation edges) and ``struct/mutation/transfer.py:24-60``
(transfer causal relations along ``isA`` edges to parents).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..constants import (
    CAUSAL_RELATIONS,
    CONCEPT,
    FUNCTION,
    GENE,
    IS_A,
    MIRNA,
    PROTEIN,
    RELATION,
    RNA,
    TRANSCRIBED_TO,
    TRANSLATED_TO,
    VARIANTS,
)
from ..stages.dedup import dedup_exact
from .graph import Graph, edge_row, node_row_from_dict

__all__ = [
    "enrich_rnas_with_genes",
    "enrich_proteins_with_rnas",
    "enrich_protein_and_rna_origins",
    "infer_child_relations",
]


def _emit_schema():
    from .graph import emit_schema

    return emit_schema()


def _emit_parents(nodes_ds, child_function: str, parent_function: str, relation: str):
    """(node+edge emitted rows Dataset) of the synthesized parents of every
    variant-free ``child_function`` node in ``nodes_ds``."""
    emit_schema = _emit_schema()

    def _emit(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("function"), child_function)
        t = t.filter(mask)
        rows = []
        for row in t.to_pylist():
            node = json.loads(row["node_json"])
            if node.get(VARIANTS) or CONCEPT not in node:
                continue
            parent = {FUNCTION: parent_function, CONCEPT: dict(node[CONCEPT])}
            p_row = node_row_from_dict(parent)
            rows.append(dict(p_row, _emit_kind="node"))
            rows.append(dict(
                edge_row(p_row, row, {RELATION: relation}), _emit_kind="edge",
            ))
        return pa.Table.from_pylist(rows, schema=emit_schema)

    return nodes_ds.map_batches(_emit, batch_format="pyarrow")


def _pick(emitted, kind, columns):
    from .graph import pick_emitted

    return pick_emitted(emitted, kind, columns)


def _align(ds, columns):
    return ds.map_batches(lambda t, _c=tuple(columns): t.select(list(_c)),
                          batch_format="pyarrow")


def _graph_with_emitted(graph: Graph, emitted_list) -> Graph:
    """Union emitted parent rows into the graph with ONE dedup exchange per
    table (instead of one per synthesis stage)."""
    from .graph import EDGE_COLUMNS, NODE_COLUMNS

    nodes = _align(graph.nodes, NODE_COLUMNS)
    edges = _align(graph.edges, EDGE_COLUMNS)
    for emitted in emitted_list:
        nodes = nodes.union(_pick(emitted, "node", NODE_COLUMNS))
        edges = edges.union(_pick(emitted, "edge", EDGE_COLUMNS))
    return Graph(dedup_exact(nodes, "md5"), dedup_exact(edges, "edge_md5"))


def _synthesize_parents(graph: Graph, child_function: str, parent_function: str, relation: str) -> Graph:
    """For each reference (variant-free) child node, add its parent node and
    the parent-(relation)->child edge."""
    emitted = _emit_parents(
        graph.nodes, child_function, parent_function, relation,
    ).materialize()
    return _graph_with_emitted(graph, [emitted])


def enrich_rnas_with_genes(graph: Graph) -> Graph:
    """Add the corresponding gene + transcription edge for each RNA/miRNA."""
    rna = _emit_parents(graph.nodes, RNA, GENE, TRANSCRIBED_TO).materialize()
    mirna = _emit_parents(graph.nodes, MIRNA, GENE, TRANSCRIBED_TO).materialize()
    return _graph_with_emitted(graph, [rna, mirna])


def enrich_proteins_with_rnas(graph: Graph) -> Graph:
    """Add the corresponding RNA + translation edge for each protein."""
    return _synthesize_parents(graph, PROTEIN, RNA, TRANSLATED_TO)


def enrich_protein_and_rna_origins(graph: Graph) -> Graph:
    """proteins -> RNAs -> genes (reference enrich_protein_and_rna_origins).

    Single-pass shape: synthesize RNA parents of proteins, then gene
    parents of (existing ∪ synthesized) RNAs/miRNAs, union everything and
    dedup ONCE per table — 2 exchanges instead of the naive chained
    version's 6 (each `_synthesize_parents` stage costs 2), with identical
    results (the final dedup collapses duplicate parents).
    """
    from .graph import NODE_COLUMNS

    rna_emitted = _emit_parents(
        graph.nodes, PROTEIN, RNA, TRANSLATED_TO,
    ).materialize()
    new_rna_nodes = _pick(rna_emitted, "node", NODE_COLUMNS)
    gene_sources = _align(graph.nodes, NODE_COLUMNS).union(new_rna_nodes)
    gene_rna = _emit_parents(gene_sources, RNA, GENE, TRANSCRIBED_TO).materialize()
    gene_mirna = _emit_parents(gene_sources, MIRNA, GENE, TRANSCRIBED_TO).materialize()
    return _graph_with_emitted(graph, [rna_emitted, gene_rna, gene_mirna])


def infer_child_relations(graph: Graph, node_md5: str) -> Graph:
    """Transfer causal edges from a parent (via isA) to the child
    (reference transfer.py:24-60): for each ``child isA parent`` edge where
    parent == node, copy the parent's causal edges onto the child.
    """
    def _isa_children(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(t.column("relation"), IS_A),
            pc.equal(t.column("dst_md5"), node_md5),
        )
        return t.filter(m).select(["src_md5", "src_bel"])

    children = []
    for batch in graph.edges.map_batches(
        _isa_children, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        children.extend(zip(
            batch.column("src_md5").to_pylist(),
            batch.column("src_bel").to_pylist(),
        ))
    if not children:
        return graph

    causal = pa.array(sorted(CAUSAL_RELATIONS))

    def _copy(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t.column("relation"), value_set=causal),
            pc.equal(t.column("src_md5"), node_md5),
        )
        t = t.filter(m)
        out = []
        for row in t.to_pylist():
            for child_md5, child_bel in children:
                new = dict(row)
                new["src_md5"] = child_md5
                new["src_bel"] = child_bel
                from ..canon import edge_md5 as _emd5

                data = {RELATION: new["relation"]}
                if new.get("evidence") is not None:
                    data["evidence"] = new["evidence"]
                if new.get("citation_db") is not None:
                    data["citation"] = {"db": new["citation_db"], "db_id": new["citation_id"]}
                if new.get("subject_json"):
                    data["subject"] = json.loads(new["subject_json"])
                if new.get("object_json"):
                    data["object"] = json.loads(new["object_json"])
                new["edge_md5"] = _emd5(new["src_bel"], new["dst_bel"], data)
                out.append(new)
        return pa.Table.from_pylist(out) if out else t.slice(0, 0)

    from .graph import EDGE_COLUMNS as _EC

    def _align(ds):
        return ds.map_batches(lambda t: t.select(_EC), batch_format="pyarrow")

    new_edges = graph.edges.map_batches(_copy, batch_format="pyarrow")
    return Graph(
        graph.nodes,
        dedup_exact(_align(graph.edges).union(_align(new_edges)), "edge_md5"),
    )
