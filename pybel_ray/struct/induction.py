"""Seed-based subgraph induction and expansion (SURVEY.md §2.11).

Reference: ``struct/mutation/induction/*`` — by annotation value, citation,
neighborhood (k-hop), upstream/downstream causal, seeded random subgraph.
k-hop expansion = k rounds of vectorized edge filtering against a growing
(broadcast) frontier set; the seed sets are small by construction.
"""

from __future__ import annotations

import random
from typing import Iterable, Optional, Set

import pyarrow as pa
import pyarrow.compute as pc

from ..constants import CAUSAL_RELATIONS
from .filters import annotation_value_filter, filter_edges
from .graph import Graph
from .operations import subgraph

__all__ = [
    "get_subgraph_by_annotation_value",
    "get_subgraph_by_citation",
    "get_subgraph_by_neighborhood",
    "expand_upstream",
    "expand_downstream",
    "get_random_subgraph",
]


def _graph_from_edges(graph: Graph, edges_ds) -> Graph:
    """Induce node set from an edge subset (endpoint semi-join)."""
    ids = set()
    for r in edges_ds.select_columns(["src_md5", "dst_md5"]).take_all():
        ids.add(r["src_md5"])
        ids.add(r["dst_md5"])
    id_array = pa.array(sorted(ids))

    def _nodes(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("md5"), value_set=id_array))

    return Graph(
        graph.nodes.map_batches(_nodes, batch_format="pyarrow"),
        edges_ds,
    )


def get_subgraph_by_annotation_value(graph: Graph, key: str, value: str) -> Graph:
    """Edges annotated key=value + their endpoints (induction/annotations.py:40)."""
    edges = filter_edges(graph.edges, annotation_value_filter(key, value))
    return _graph_from_edges(graph, edges.materialize())


def get_subgraph_by_citation(graph: Graph, db: str, db_id: str) -> Graph:
    """Edges from one citation (induction/citation.py)."""

    def _mask(t: pa.Table) -> pa.Array:
        return pc.and_(
            pc.fill_null(pc.equal(t.column("citation_db"), db), False),
            pc.fill_null(pc.equal(t.column("citation_id"), db_id), False),
        )

    edges = graph.edges.map_batches(
        lambda t: t.filter(_mask(t)), batch_format="pyarrow",
    )
    return _graph_from_edges(graph, edges.materialize())


def _expand(graph: Graph, seed: Set[str], hops: int, direction: str, relations=None) -> Set[str]:
    """k rounds of frontier expansion; returns the grown node-id set."""
    result = set(seed)
    frontier = set(seed)
    rel_array = pa.array(sorted(relations)) if relations else None
    for _ in range(hops):
        if not frontier:
            break
        f_array = pa.array(sorted(frontier))

        def _adjacent(t: pa.Table) -> pa.Table:
            masks = []
            if direction in ("out", "both"):
                masks.append(pc.is_in(t.column("src_md5"), value_set=f_array))
            if direction in ("in", "both"):
                masks.append(pc.is_in(t.column("dst_md5"), value_set=f_array))
            m = masks[0]
            for extra in masks[1:]:
                m = pc.or_(m, extra)
            if rel_array is not None:
                m = pc.and_(m, pc.is_in(t.column("relation"), value_set=rel_array))
            return t.filter(m).select(["src_md5", "dst_md5"])

        adj = graph.edges.map_batches(_adjacent, batch_format="pyarrow").take_all()
        new = set()
        for r in adj:
            new.add(r["src_md5"])
            new.add(r["dst_md5"])
        frontier = new - result
        result |= new
    return result


def get_subgraph_by_neighborhood(graph: Graph, seed_md5s: Iterable[str], hops: int = 1) -> Graph:
    """k-hop neighborhood induction (induction/neighborhood.py:18)."""
    ids = _expand(graph, set(seed_md5s), hops, "both")
    return subgraph(graph, ids)


def expand_upstream(graph: Graph, seed_md5s: Iterable[str], hops: int = 1) -> Graph:
    """Upstream causal expansion (expansion/upstream.py)."""
    ids = _expand(graph, set(seed_md5s), hops, "in", relations=CAUSAL_RELATIONS)
    return subgraph(graph, ids)


def expand_downstream(graph: Graph, seed_md5s: Iterable[str], hops: int = 1) -> Graph:
    ids = _expand(graph, set(seed_md5s), hops, "out", relations=CAUSAL_RELATIONS)
    return subgraph(graph, ids)


def get_random_subgraph(
    graph: Graph,
    number_edges: int = 250,
    number_seed_edges: int = 5,
    seed: Optional[int] = None,
) -> Graph:
    """Seeded random edge expansion (induction/random_subgraph.py:40-223).

    The reference walks the in-memory graph; here the edge list for the walk
    is the (small) collected edge table — appropriate because the output is
    bounded at ``number_edges``.
    """
    rng = random.Random(seed)
    edges = graph.edges.select_columns(["edge_md5", "src_md5", "dst_md5"]).take_all()
    if not edges:
        return graph
    by_node = {}
    for r in edges:
        by_node.setdefault(r["src_md5"], []).append(r)
        by_node.setdefault(r["dst_md5"], []).append(r)

    chosen = rng.sample(edges, min(number_seed_edges, len(edges)))
    chosen_keys = {r["edge_md5"] for r in chosen}
    nodes = set()
    for r in chosen:
        nodes.update((r["src_md5"], r["dst_md5"]))

    while len(chosen_keys) < min(number_edges, len(edges)):
        # inverse-degree-weighted node pick, as in the reference
        pool = sorted(nodes)
        weights = [1.0 / len(by_node.get(n, [1])) for n in pool]
        node = rng.choices(pool, weights=weights, k=1)[0]
        candidates = [r for r in by_node.get(node, []) if r["edge_md5"] not in chosen_keys]
        if not candidates:
            nodes.discard(node)
            if not nodes:
                break
            continue
        pick = rng.choice(candidates)
        chosen_keys.add(pick["edge_md5"])
        nodes.update((pick["src_md5"], pick["dst_md5"]))

    key_array = pa.array(sorted(chosen_keys))

    def _edges(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("edge_md5"), value_set=key_array))

    picked = graph.edges.map_batches(_edges, batch_format="pyarrow")
    return _graph_from_edges(graph, picked.materialize())


def get_random_path(graph: Graph, seed: Optional[int] = None) -> list:
    """Seeded random walk returning a list of node md5s
    (reference induction/paths.py:120-146)."""
    rng = random.Random(seed)
    edges = graph.edges.select_columns(["src_md5", "dst_md5"]).take_all()
    if not edges:
        return []
    succ = {}
    for r in edges:
        succ.setdefault(r["src_md5"], []).append(r["dst_md5"])
    node = rng.choice(sorted(succ))
    path = [node]
    seen = {node}
    while node in succ:
        candidates = [n for n in succ[node] if n not in seen]
        if not candidates:
            break
        node = rng.choice(sorted(candidates))
        path.append(node)
        seen.add(node)
    return path


def get_subgraph_by_shortest_paths(graph: Graph, seed_md5s, weight: bool = False) -> Graph:
    """Induce over nodes on shortest paths between seeds
    (reference induction/paths.py:82).  Collects the edge list driver-side
    and delegates pathfinding to networkx — bounded because seeds induce a
    small working set."""
    import networkx as nx

    g = nx.DiGraph()
    for r in graph.edges.select_columns(["src_md5", "dst_md5"]).take_all():
        g.add_edge(r["src_md5"], r["dst_md5"])
    keep = set()
    seeds = [s for s in seed_md5s if s in g]
    for a in seeds:
        for b in seeds:
            if a == b:
                continue
            try:
                keep.update(nx.shortest_path(g, a, b))
            except nx.NetworkXNoPath:
                continue
    keep.update(seeds)
    return subgraph(graph, keep)


def group_subgraphs_by_annotation(graph: Graph, key: str) -> dict:
    """{annotation value: induced Graph} (reference grouping/annotations.py:51).

    At scale, write each group's edges as a partitioned Parquet directory
    instead of materializing all subgraphs.
    """
    import json as _json

    values = set()
    for r in graph.edges.select_columns(["annotations_json"]).take_all():
        aj = r["annotations_json"]
        if not aj:
            continue
        entry = _json.loads(aj).get(key)
        if entry:
            values.update(entry)
    from .filters import annotation_value_filter, filter_edges

    out = {}
    for value in sorted(values):
        edges = filter_edges(graph.edges, annotation_value_filter(key, value))
        out[value] = _graph_from_edges(graph, edges.materialize())
    return out


def group_subgraphs_by_citation(graph: Graph, min_edges: int = 1) -> dict:
    """{(db, db_id): induced Graph} (reference grouping/provenance.py:15).

    Citation values are enumerated with a distinct projection; each group is
    an edge filter + induced-node reconstruction.  At scale, prefer writing
    ``edges`` partitioned by ``(citation_db, citation_id)`` instead of
    materializing every subgraph on the driver.
    """
    from collections import Counter

    counts = Counter()
    for r in graph.edges.select_columns(["citation_db", "citation_id"]).take_all():
        if r["citation_db"] is not None:
            counts[(r["citation_db"], r["citation_id"])] += 1
    out = {}
    for (db, db_id), n in sorted(counts.items()):
        if n < min_edges:
            continue
        out[(db, db_id)] = get_subgraph_by_citation(graph, db, db_id)
    return out
