"""Bulk structured import + Parquet graph persistence.

* :func:`from_edge_table` — the Hetionet-import analog
  (reference ``io/hetionet/hetionet.py:58-205``): a typed edge table
  ``(src_type, src_namespace, src_name, relation, dst_type, dst_namespace,
  dst_name)`` is mapped through a broadcast kind→function table into engine
  node/edge rows in one ``map_batches`` pass (2.25 M Hetionet edges stream
  without driver involvement).
* :func:`save_graph` / :func:`load_graph` — the checkpoint analog of the
  reference's pickle persistence (``io/gpickle.py:21-80``): partitioned
  Parquet snapshot instead of a pickle.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Optional

import pyarrow as pa

from .canon import bel_md5, canonical_json, edge_md5, node_to_bel
from .constants import (
    ABUNDANCE,
    BIOPROCESS,
    COMPLEX,
    CONCEPT,
    FUNCTION,
    GENE,
    PATHOLOGY,
    PROTEIN,
    RELATION,
    RNA,
)
from .export.triples import edge_to_triple
from .struct.graph import EDGE_COLUMNS, NODE_COLUMNS, Graph

__all__ = ["DEFAULT_TYPE_MAP", "from_edge_table", "save_graph", "load_graph"]

#: external node-kind -> BEL function (Hetionet-style kinds; public mapping)
DEFAULT_TYPE_MAP = {
    "Gene": GENE,
    "Protein": PROTEIN,
    "RNA": RNA,
    "Compound": ABUNDANCE,
    "Chemical": ABUNDANCE,
    "Disease": PATHOLOGY,
    "Symptom": PATHOLOGY,
    "Side Effect": PATHOLOGY,
    "Biological Process": BIOPROCESS,
    "Pathway": BIOPROCESS,
    "Complex": COMPLEX,
    "Anatomy": ABUNDANCE,
}


def from_edge_table(
    ds,
    type_map: Optional[Mapping[str, str]] = None,
    src_cols=("src_type", "src_namespace", "src_name"),
    dst_cols=("dst_type", "dst_namespace", "dst_name"),
    relation_col: str = "relation",
) -> Graph:
    """Bulk import a typed edge Dataset into a deduped Graph."""
    from .stages.dedup import dedup_exact

    tmap = dict(type_map or DEFAULT_TYPE_MAP)

    emit_schema = pa.schema(
        [("_emit_kind", pa.string())]
        + [(c, pa.string()) for c in NODE_COLUMNS]
        + [(c, pa.string()) for c in EDGE_COLUMNS],
    )

    def _node(kind, namespace, name):
        func = tmap.get(kind, ABUNDANCE)
        node = {FUNCTION: func, CONCEPT: {"namespace": namespace, "name": name}}
        bel = node_to_bel(node)
        return node, {
            "md5": bel_md5(bel),
            "bel": bel,
            "function": func,
            "namespace": namespace,
            "name": name,
            "identifier": None,
            "node_json": canonical_json(node),
        }

    def _emit(t: pa.Table) -> pa.Table:
        rows = []
        cols = {c: t.column(c).to_pylist() for c in (*src_cols, *dst_cols, relation_col)}
        for i in range(t.num_rows):
            u, u_row = _node(cols[src_cols[0]][i], cols[src_cols[1]][i], cols[src_cols[2]][i])
            v, v_row = _node(cols[dst_cols[0]][i], cols[dst_cols[1]][i], cols[dst_cols[2]][i])
            data = {RELATION: cols[relation_col][i]}
            triple = edge_to_triple(u, data, v)
            rows.append(dict(u_row, _emit_kind="node"))
            rows.append(dict(v_row, _emit_kind="node"))
            rows.append({
                "_emit_kind": "edge",
                "edge_md5": edge_md5(u_row["bel"], v_row["bel"], data),
                "src_md5": u_row["md5"],
                "dst_md5": v_row["md5"],
                "src_bel": u_row["bel"],
                "dst_bel": v_row["bel"],
                "relation": data[RELATION],
                "triple_h": triple[0] if triple else None,
                "triple_r": triple[1] if triple else None,
                "triple_t": triple[2] if triple else None,
            })
        return pa.Table.from_pylist(rows, schema=emit_schema)

    emitted = ds.map_batches(_emit, batch_format="pyarrow").materialize()

    import pyarrow.compute as pc

    def _pick(kind, columns):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("_emit_kind"), kind)).select(columns)

        return emitted.map_batches(_f, batch_format="pyarrow")

    return Graph(
        dedup_exact(_pick("node", NODE_COLUMNS), "md5"),
        dedup_exact(_pick("edge", EDGE_COLUMNS), "edge_md5"),
    )


def save_graph(graph: Graph, out_dir: str) -> None:
    """Parquet snapshot of a Graph (the engine's checkpoint format)."""
    os.makedirs(out_dir, exist_ok=True)
    graph.nodes.write_parquet(os.path.join(out_dir, "nodes"))
    graph.edges.write_parquet(os.path.join(out_dir, "edges"))
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(graph.metadata, f)


def load_graph(out_dir: str) -> Graph:
    import ray.data

    metadata = {}
    meta_path = os.path.join(out_dir, "metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return Graph(
        ray.data.read_parquet(os.path.join(out_dir, "nodes")),
        ray.data.read_parquet(os.path.join(out_dir, "edges")),
        metadata=metadata,
    )
