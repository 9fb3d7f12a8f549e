"""Graph set operations: union, joins, induced subgraphs.

Reference semantics: ``/root/reference/src/pybel/struct/operations.py``.
Union/left_full_join key on node identity (md5) and edge content hash —
Dataset union + exact-dedup shuffle.  Induced subgraphs broadcast the
(small) node-id set into a vectorized edge filter instead of shuffling.
"""

from __future__ import annotations

from typing import Iterable, Set

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import dedup_exact
from .graph import EDGE_COLUMNS, NODE_COLUMNS, Graph


def _align(ds, columns):
    """Project to the standard column order so Dataset.union schemas line up."""
    def _f(t: pa.Table) -> pa.Table:
        return t.select(columns)

    return ds.map_batches(_f, batch_format="pyarrow")

__all__ = [
    "union",
    "left_full_join",
    "left_outer_join",
    "node_intersection",
    "subgraph",
    "connected_components_driver",
]


def union(graphs: Iterable[Graph]) -> Graph:
    """n-ary graph union with identity dedup (operations.py:113-152)."""
    graphs = list(graphs)
    if not graphs:
        raise ValueError("no graphs given")
    nodes = _align(graphs[0].nodes, NODE_COLUMNS)
    edges = _align(graphs[0].edges, EDGE_COLUMNS)
    for g in graphs[1:]:
        nodes = nodes.union(_align(g.nodes, NODE_COLUMNS))
        edges = edges.union(_align(g.edges, EDGE_COLUMNS))
    return Graph(dedup_exact(nodes, "md5"), dedup_exact(edges, "edge_md5"))


def left_full_join(g: Graph, h: Graph) -> Graph:
    """Add h's nodes/edges not already in g (operations.py:45-71).

    With content-addressed identity this IS the union.
    """
    return union([g, h])


def subgraph(graph: Graph, node_md5s: Set[str]) -> Graph:
    """Induced subgraph on a node-id set (operations.py:23-42).

    The node set is broadcast into the batch closure (small side); edges
    survive iff both endpoints are in the set.
    """
    id_array = pa.array(sorted(node_md5s))

    def _nodes(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("md5"), value_set=id_array))

    def _edges(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t.column("src_md5"), value_set=id_array),
            pc.is_in(t.column("dst_md5"), value_set=id_array),
        )
        return t.filter(m)

    return Graph(
        graph.nodes.map_batches(_nodes, batch_format="pyarrow"),
        graph.edges.map_batches(_edges, batch_format="pyarrow"),
    )


def node_intersection(g: Graph, h: Graph) -> Graph:
    """Union of subgraphs induced over shared nodes (operations.py:155-216)."""
    shared = g.node_md5_set() & h.node_md5_set()
    return union([subgraph(g, shared), subgraph(h, shared)])


def connected_components_driver(edge_pairs) -> dict:
    """Union-find over (a, b) id pairs -> {id: component representative}.

    Driver-side: used on SMALL edge subsets (equivalence/orthology edges,
    join seams).  Representative = min id in the component, so the result
    is deterministic.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    return {x: find(x) for x in parent}


#: right-side edge counts at or below this use the driver union-find; above
#: it the distributed label-propagation path labels components on-cluster
_DRIVER_EDGE_BUDGET = 2_000_000


def left_outer_join(g: Graph, h: Graph) -> Graph:
    """g + the weakly-connected components of h that touch g
    (operations.py:74-96).

    Hybrid: a small right side (≤ ``_DRIVER_EDGE_BUDGET`` edges) is
    labelled with a driver union-find; a large one runs distributed
    min-label propagation (:func:`~pybel_ray.struct.components.connected_components`)
    and keeps everything on-cluster via bucketed semi-joins.
    """
    h_edges = h.edges.materialize()
    if h_edges.count() <= _DRIVER_EDGE_BUDGET:
        g_ids = g.node_md5_set()
        pairs = [
            (r["src_md5"], r["dst_md5"])
            for r in h_edges.select_columns(["src_md5", "dst_md5"]).take_all()
        ]
        comp = connected_components_driver(pairs)
        h_ids = h.node_md5_set()
        for isolated in h_ids - set(comp):
            comp[isolated] = isolated
        touching = {
            rep for node, rep in comp.items() if node in g_ids
        }
        keep = {node for node, rep in comp.items() if rep in touching}
        return union([g, subgraph(Graph(h.nodes, h_edges), keep)])

    from .components import connected_components
    from .degree import bucketed_semi_join
    from ..ops.relational import distinct_values

    comp = connected_components(h_edges).materialize()
    # components whose member set intersects g's nodes
    touching = distinct_values(
        bucketed_semi_join(comp, "id", g.nodes, "md5"), "component",
    )
    keep = bucketed_semi_join(comp, "component", touching, "component")
    h_nodes = bucketed_semi_join(h.nodes, "md5", keep, "id")
    h_kept_edges = bucketed_semi_join(
        bucketed_semi_join(h_edges, "src_md5", keep, "id"),
        "dst_md5", keep, "id",
    )
    return union([g, Graph(h_nodes, h_kept_edges)])
