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
    "write_subgraphs_by_annotation",
]


#: edge subsets at or below this row count induce their node set via a
#: driver-broadcast id array (one narrow scan of a *small* subset); larger
#: subsets take the fully distributed semi-join instead
_BROADCAST_EDGE_BUDGET = 2_000_000


def _graph_from_edges(graph: Graph, edges_ds) -> Graph:
    """Induce node set from an edge subset (endpoint semi-join).

    Hybrid: small subsets (≤ ``_BROADCAST_EDGE_BUDGET`` rows — callers pass
    a materialized subset, so ``count()`` is metadata-free) broadcast their
    endpoint ids into a vectorized ``is_in`` filter; large subsets use the
    distributed bucketed semi-join so nothing edge-shaped visits the driver.
    """
    from .degree import bucketed_semi_join, endpoint_ids

    if edges_ds.count() > _BROADCAST_EDGE_BUDGET:
        return Graph(
            bucketed_semi_join(graph.nodes, "md5", endpoint_ids(edges_ds)),
            edges_ds,
        )

    ids = set()
    for batch in edges_ds.select_columns(["src_md5", "dst_md5"]).iter_batches(
        batch_format="pyarrow",
    ):
        ids.update(batch.column("src_md5").to_pylist())
        ids.update(batch.column("dst_md5").to_pylist())
    id_array = pa.array(sorted(ids), pa.string())

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
            sub = t.filter(m)
            # collapse to unique endpoints per block before anything travels
            # to the driver: a hub of degree d contributes ≤2 values, not d
            # rows
            both = pa.chunked_array(
                list(sub.column("src_md5").chunks) + list(sub.column("dst_md5").chunks),
                type=pa.string(),
            )
            u = pc.unique(both.combine_chunks())
            return pa.Table.from_arrays([u], names=["md5"])

        new = set()
        for batch in graph.edges.map_batches(
            _adjacent, batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            new.update(batch.column("md5").to_pylist())
        frontier = new - result
        result |= new
    return result


def get_subgraph_by_neighborhood(graph: Graph, seed_md5s: Iterable[str], hops: int = 1) -> Graph:
    """k-hop neighborhood induction (induction/neighborhood.py:18)."""
    ids = _expand(graph, set(seed_md5s), hops, "both")
    return subgraph(graph, ids)


def _causal_subgraph(graph: Graph, ids) -> Graph:
    """Induce over ``ids`` keeping CAUSAL edges only — a causal expansion
    must not pull associations/correlations between the grown nodes into
    the result (they were never on a causal path)."""
    from .filters import filter_edges, relation_filter

    sub = subgraph(graph, ids)
    return Graph(sub.nodes, filter_edges(sub.edges,
                                         relation_filter(CAUSAL_RELATIONS)),
                 sub.metadata)


def expand_upstream(graph: Graph, seed_md5s: Iterable[str], hops: int = 1) -> Graph:
    """Upstream causal expansion (expansion/upstream.py): grow via causal
    in-edges, induce causal edges among the grown set."""
    ids = _expand(graph, set(seed_md5s), hops, "in", relations=CAUSAL_RELATIONS)
    return _causal_subgraph(graph, ids)


def expand_downstream(graph: Graph, seed_md5s: Iterable[str], hops: int = 1) -> Graph:
    ids = _expand(graph, set(seed_md5s), hops, "out", relations=CAUSAL_RELATIONS)
    return _causal_subgraph(graph, ids)


def get_random_subgraph(
    graph: Graph,
    number_edges: int = 250,
    number_seed_edges: int = 5,
    seed: Optional[int] = None,
) -> Graph:
    """Seeded random edge expansion (induction/random_subgraph.py:40-223).

    Scale-safe shape: the full edge table is NEVER collected.  Seeds come
    from a deterministic hash-sample scan; each growth round scans for
    edges incident to the current node set and collects at most
    ``_ROUND_CAP`` of them (a narrow 3-column projection), then the
    reference's inverse-degree-weighted picks run inside that bounded pool.
    Driver memory is O(number_edges + round cap), independent of graph
    size.
    """
    rng = random.Random(seed)
    total = graph.edges.count()
    if total == 0:
        return graph
    target = min(number_edges, total)

    # -- seed sample without collecting the table ------------------------
    # Dataset.random_sample is vectorized per block; oversample 4x the
    # needed fraction then keep the first few (deterministic per seed)
    proj = graph.edges.select_columns(["edge_md5", "src_md5", "dst_md5"])
    fraction = min(1.0, (4.0 * number_seed_edges) / total)
    seed_rows = proj.random_sample(
        fraction, seed=rng.randrange(1 << 30),
    ).limit(max(number_seed_edges, 1)).take_all()
    if not seed_rows:  # tiny graphs can miss the sample; fall back to head
        seed_rows = proj.limit(number_seed_edges).take_all()

    chosen_keys = {r["edge_md5"] for r in seed_rows}
    nodes = set()
    for r in seed_rows:
        nodes.update((r["src_md5"], r["dst_md5"]))

    _ROUND_CAP = 100_000
    stalled = False
    while len(chosen_keys) < target and not stalled:
        f_array = pa.array(sorted(nodes), pa.string())
        k_array = pa.array(sorted(chosen_keys), pa.string())

        def _incident(t: pa.Table) -> pa.Table:
            m = pc.or_(
                pc.is_in(t.column("src_md5"), value_set=f_array),
                pc.is_in(t.column("dst_md5"), value_set=f_array),
            )
            m = pc.and_(
                m, pc.invert(pc.is_in(t.column("edge_md5"), value_set=k_array)),
            )
            return t.filter(m)

        pool_rows = proj.map_batches(
            _incident, batch_format="pyarrow",
        ).limit(_ROUND_CAP).take_all()
        if not pool_rows:
            break

        # reference-style inverse-degree-weighted expansion inside the
        # bounded pool (induction/random_subgraph.py:92-143)
        by_node = {}
        for r in pool_rows:
            by_node.setdefault(r["src_md5"], []).append(r)
            by_node.setdefault(r["dst_md5"], []).append(r)
        pool_nodes = set(nodes)
        progressed = False
        while len(chosen_keys) < target:
            active = sorted(n for n in pool_nodes if by_node.get(n))
            if not active:
                break
            weights = [1.0 / len(by_node[n]) for n in active]
            node = rng.choices(active, weights=weights, k=1)[0]
            candidates = [
                r for r in by_node[node] if r["edge_md5"] not in chosen_keys
            ]
            if not candidates:
                by_node[node] = []
                continue
            pick = rng.choice(candidates)
            chosen_keys.add(pick["edge_md5"])
            nodes.update((pick["src_md5"], pick["dst_md5"]))
            pool_nodes.update((pick["src_md5"], pick["dst_md5"]))
            progressed = True
        stalled = not progressed

    key_array = pa.array(sorted(chosen_keys), pa.string())

    def _edges(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("edge_md5"), value_set=key_array))

    picked = graph.edges.map_batches(_edges, batch_format="pyarrow")
    return _graph_from_edges(graph, picked.materialize())


def get_random_path(
    graph: Graph, seed: Optional[int] = None, max_steps: int = 256,
) -> list:
    """Seeded random walk returning a list of node md5s
    (reference induction/paths.py:120-146).

    Scale-safe: the walk fetches successors with per-step frontier scans
    (narrow 2-column projection, unique successors only) instead of
    collecting the edge table; driver memory is O(path length).  Successor
    fetches are batched — each scan pulls successors for the whole set of
    nodes the walk might visit next, so typical paths cost a handful of
    scans, bounded by ``max_steps``.
    """
    rng = random.Random(seed)
    proj = graph.edges.select_columns(["src_md5", "dst_md5"])

    def _succ_of(frontier) -> dict:
        f_array = pa.array(sorted(frontier), pa.string())

        def _f(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_in(t.column("src_md5"), value_set=f_array),
            ).select(["src_md5", "dst_md5"])

        out: dict = {}
        for batch in proj.map_batches(_f, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow",
        ):
            for s, d in zip(
                batch.column("src_md5").to_pylist(),
                batch.column("dst_md5").to_pylist(),
            ):
                out.setdefault(s, set()).add(d)
        return out

    start_rows = proj.random_sample(
        min(1.0, 64.0 / max(1, graph.edges.count())),
        seed=rng.randrange(1 << 30),
    ).limit(1).take_all()
    if not start_rows:
        start_rows = proj.limit(1).take_all()
    if not start_rows:
        return []
    node = start_rows[0]["src_md5"]
    path = [node]
    seen = {node}
    succ_cache = _succ_of({node})
    for _ in range(max_steps):
        if node not in succ_cache:
            # cache miss: fetch successors for the current node in one scan
            succ_cache.update(_succ_of({node}))
        candidates = sorted(succ_cache.get(node, set()) - seen)
        if not candidates:
            break
        node = rng.choice(candidates)
        path.append(node)
        seen.add(node)
        if node not in succ_cache:
            # prefetch the next hop's successors together with any
            # unvisited siblings (amortizes scans over the likely frontier)
            frontier = ({node} | set(candidates)) - set(succ_cache)
            succ_cache.update(_succ_of(frontier))
    return path


def get_subgraph_by_shortest_paths(
    graph: Graph, seed_md5s, max_hops: int = 6,
) -> Graph:
    """Induce over nodes on shortest paths between seeds
    (reference induction/paths.py:82).

    Scale-safe: instead of collecting the whole edge table, first expand a
    ``max_hops``-bounded neighborhood around the seeds with distributed
    frontier scans (any seed-to-seed shortest path of length ≤ max_hops
    lies inside it), then collect ONLY that bounded working set's edges
    for the exact networkx pathfinding.  Paths longer than ``max_hops``
    are treated as unreachable (documented bound).
    """
    import networkx as nx

    seeds = set(seed_md5s)
    # bounded working set: nodes within max_hops of any seed (both
    # directions, so intermediate nodes of any direction-mixed path appear)
    working = _expand(graph, seeds, max_hops, "both")
    w_array = pa.array(sorted(working), pa.string())

    def _within(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t.column("src_md5"), value_set=w_array),
            pc.is_in(t.column("dst_md5"), value_set=w_array),
        )
        return t.filter(m).select(["src_md5", "dst_md5"])

    g = nx.DiGraph()
    for batch in graph.edges.map_batches(
        _within, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for s, d in zip(
            batch.column("src_md5").to_pylist(),
            batch.column("dst_md5").to_pylist(),
        ):
            g.add_edge(s, d)
    keep = set()
    present = [s for s in seeds if s in g]
    for a in present:
        for b in present:
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

    def _values(t: pa.Table) -> pa.Table:
        out = set()
        for aj in t.column("annotations_json").to_pylist():
            if not aj:
                continue
            entry = _json.loads(aj).get(key)
            if entry:
                out.update(entry)
        return pa.Table.from_arrays(
            [pa.array(sorted(out), pa.string())], names=["value"],
        )

    from ..ops.relational import distinct_values

    values = set()
    vds = distinct_values(
        graph.edges.select_columns(["annotations_json"]).map_batches(
            _values, batch_format="pyarrow",
        ),
        "value",
    )
    for batch in vds.iter_batches(batch_format="pyarrow"):
        values.update(batch.column("value").to_pylist())
    from .filters import annotation_value_filter, filter_edges

    out = {}
    for value in sorted(values):
        edges = filter_edges(graph.edges, annotation_value_filter(key, value))
        out[value] = _graph_from_edges(graph, edges.materialize())
    return out


def write_subgraphs_by_annotation(graph: Graph, key: str, out_dir: str) -> None:
    """The scale path of :func:`group_subgraphs_by_annotation`: write the
    edge table partitioned by annotation value instead of materializing one
    driver-side Graph per group.

    Each edge row is exploded once per value of ``key`` it carries
    (vectorized-ish JSON scan inside ``map_batches``) and the whole stream
    lands as ``out_dir/_group=<value>/*.parquet`` — a failed run resumes by
    partition, and each group is a pruned read.
    """
    import json as _json

    from .graph import EDGE_COLUMNS

    def _explode(t: pa.Table) -> pa.Table:
        take_idx, groups = [], []
        for i, aj in enumerate(t.column("annotations_json").to_pylist()):
            if not aj:
                continue
            entry = _json.loads(aj).get(key)
            if not entry:
                continue
            for value in entry:
                take_idx.append(i)
                groups.append(value)
        out = t.select(EDGE_COLUMNS).take(pa.array(take_idx, pa.int64()))
        return out.append_column("_group", pa.array(groups, pa.string()))

    graph.edges.map_batches(_explode, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["_group"],
    )


def group_subgraphs_by_citation(graph: Graph, min_edges: int = 1) -> dict:
    """{(db, db_id): induced Graph} (reference grouping/provenance.py:15).

    Citation values are enumerated with a distinct projection; each group is
    an edge filter + induced-node reconstruction.  At scale, prefer writing
    ``edges`` partitioned by ``(citation_db, citation_id)`` instead of
    materializing every subgraph on the driver.
    """
    from ..ops.relational import groupby_count

    cited = graph.edges.select_columns(["citation_db", "citation_id"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("citation_db"))),
        batch_format="pyarrow",
    )
    counts = {}
    for batch in groupby_count(
        cited, ["citation_db", "citation_id"],
    ).iter_batches(batch_format="pyarrow"):
        for db, db_id, n in zip(
            batch.column("citation_db").to_pylist(),
            batch.column("citation_id").to_pylist(),
            batch.column("n").to_pylist(),
        ):
            counts[(db, db_id)] = n
    out = {}
    for (db, db_id), n in sorted(counts.items()):
        if n < min_edges:
            continue
        out[(db, db_id)] = get_subgraph_by_citation(graph, db, db_id)
    return out
