"""Distributed connected components + the ops that ride on it."""

import numpy as np
import pytest


def test_connected_components_basic(ray_session):
    import ray.data

    from pybel_ray.struct.components import connected_components

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"),  # chain
        ("x", "y"),                            # pair
        ("m", "n"), ("m", "o"), ("m", "p"),  # star
        ("d", "a"),                            # cycle back
    ]
    ds = ray.data.from_items(
        [{"src_md5": a, "dst_md5": b} for a, b in pairs],
    ).repartition(3)
    got = sorted((r["id"], r["component"]) for r in connected_components(ds).take_all())
    forced = sorted((r["id"], r["component"]) for r in connected_components(
        ds, force_distributed=True).take_all())
    assert forced == got
    assert got == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("m", "m"), ("n", "m"), ("o", "m"), ("p", "m"),
        ("x", "x"), ("y", "x"),
    ]


def test_connected_components_deep_chain(ray_session):
    """A 100-edge path needs ~100 plain propagation rounds; pointer
    doubling must converge it within the default max_iters."""
    import ray.data

    from pybel_ray.struct.components import connected_components

    nodes = ["n%03d" % i for i in range(101)]
    pairs = list(zip(nodes, nodes[1:]))
    ds = ray.data.from_items(
        [{"src_md5": a, "dst_md5": b} for a, b in pairs],
    ).repartition(4)
    got = {r["id"]: r["component"] for r in connected_components(ds).take_all()}
    forced = {r["id"]: r["component"] for r in connected_components(
        ds, force_distributed=True).take_all()}
    assert forced == got
    assert set(got.values()) == {"n000"}
    assert len(got) == 101


def test_connected_components_matches_union_find(ray_session):
    """Random graph: label propagation == driver union-find."""
    import ray.data

    from pybel_ray.struct.components import connected_components
    from pybel_ray.struct.operations import connected_components_driver

    rng = np.random.RandomState(3)
    n = 200
    pairs = [
        ("n%03d" % rng.randint(n), "n%03d" % rng.randint(n)) for _ in range(150)
    ]
    ds = ray.data.from_items(
        [{"src_md5": a, "dst_md5": b} for a, b in pairs],
    ).repartition(4)
    dist = {r["id"]: r["component"] for r in connected_components(
        ds, force_distributed=True).take_all()}
    drv = {r["id"]: r["component"] for r in connected_components(ds).take_all()}
    assert drv == dist
    drv = connected_components_driver(pairs)
    assert dist == drv


def test_left_outer_join_distributed_path(ray_session, monkeypatch):
    """Force the distributed branch and compare against the driver branch."""
    import ray.data

    from pybel_ray.struct import operations
    from pybel_ray.struct.graph import Graph

    def mknodes(ids):
        return ray.data.from_items([
            {
                "md5": i, "bel": "p(X:%s)" % i, "function": "Protein",
                "namespace": "X", "name": i, "identifier": None,
                "node_json": "{}",
            }
            for i in ids
        ])

    def mkedges(pairs):
        return ray.data.from_items([
            {
                "edge_md5": "%s-%s" % (a, b), "src_md5": a, "dst_md5": b,
                "src_bel": "p(X:%s)" % a, "dst_bel": "p(X:%s)" % b,
                "relation": "increases", "evidence": None,
                "citation_db": None, "citation_id": None,
                "annotations_json": None, "subject_json": None,
                "object_json": None, "triple_h": None, "triple_r": None,
                "triple_t": None,
            }
            for a, b in pairs
        ])

    g = Graph(mknodes(["a", "b"]), mkedges([("a", "b")]))
    # h: component {b,c,d} touches g via b; component {x,y} does not
    h = Graph(
        mknodes(["b", "c", "d", "x", "y"]),
        mkedges([("b", "c"), ("c", "d"), ("x", "y")]),
    )

    big = operations.left_outer_join(g, h)
    monkeypatch.setattr(operations, "_DRIVER_EDGE_BUDGET", 0)
    dist = operations.left_outer_join(g, h)
    key = lambda graph: (
        sorted(r["md5"] for r in graph.nodes.take_all()),
        sorted(r["edge_md5"] for r in graph.edges.take_all()),
    )
    assert key(dist) == key(big)
    nodes, edges = key(dist)
    assert nodes == ["a", "b", "c", "d"]
    assert edges == ["a-b", "b-c", "c-d"]


def test_collapse_fully_distributed_paths(ray_session, monkeypatch):
    """Forcing every collapse budget to 0 must reproduce the broadcast
    results exactly (collapse_nodes_ds / survivor-ds / attach joins)."""
    from pybel_ray.pages import default_registry, pages_dataset
    from pybel_ray.pipeline import compile_pages
    from pybel_ray.struct import collapse as c

    kg = compile_pages(pages_dataset(6, seed=9, block_pages=3),
                       default_registry(), batch_size=4)
    graph = kg.graph().materialize()

    def key(g):
        return (
            sorted(r["md5"] for r in g.nodes.take_all()),
            sorted(r["edge_md5"] for r in g.edges.take_all()),
        )

    base_eq = key(c.collapse_equivalences(graph))
    base_var = key(c.collapse_all_variants(graph))
    base_genes = key(c.collapse_to_genes(graph))

    monkeypatch.setattr(c, "_DRIVER_EDGE_BUDGET", 0)
    monkeypatch.setattr(c, "_BROADCAST_MAP_BUDGET", 0)
    assert key(c.collapse_equivalences(graph)) == base_eq
    assert key(c.collapse_all_variants(graph)) == base_var
    assert key(c.collapse_to_genes(graph)) == base_genes


def test_equivalence_collapse_distributed_path(ray_session, monkeypatch):
    import ray.data

    from pybel_ray.struct import collapse as collapse_mod

    # chain of equivalences: e1 == e2 == e3  ->  survivor = min md5
    rows = []
    for a, b in [("e1", "e2"), ("e2", "e3"), ("q1", "q2")]:
        rows.append({
            "edge_md5": "%s-%s" % (a, b), "src_md5": a, "dst_md5": b,
            "src_bel": "p(X:%s)" % a, "dst_bel": "p(X:%s)" % b,
            "relation": "equivalentTo", "evidence": None,
            "citation_db": None, "citation_id": None,
            "annotations_json": None, "subject_json": None,
            "object_json": None, "triple_h": None, "triple_r": None,
            "triple_t": None,
        })
    from pybel_ray.struct.graph import Graph

    nodes = ray.data.from_items([
        {
            "md5": i, "bel": "p(X:%s)" % i, "function": "Protein",
            "namespace": "X", "name": i, "identifier": None, "node_json": "{}",
        }
        for i in ["e1", "e2", "e3", "q1", "q2"]
    ])
    graph = Graph(nodes, ray.data.from_items(rows))

    small = collapse_mod.build_equivalence_survivor_map(graph)
    monkeypatch.setattr(collapse_mod, "_DRIVER_EDGE_BUDGET", 0)
    dist = collapse_mod.build_equivalence_survivor_map(graph)
    assert dist == small
    assert dist == {
        "e2": ("e1", "p(X:e1)"),
        "e3": ("e1", "p(X:e1)"),
        "q2": ("q1", "p(X:q1)"),
    }


def test_collapse_equivalences_oracle_cte_nonempty_map(ray_session, tmp_path):
    """The kg_collapse_equivalences DuckDB oracle's recursive-CTE rewiring
    arm, exercised on a planted NONEMPTY equivalence map (the synthetic
    corpus has no equivalentTo edges, so the driver check alone only
    covers the empty-map early return): chains collapse transitively,
    parallel edges merge after rewiring, self-edges drop."""
    import duckdb
    import ray.data

    import __ray_entry__ as entry
    from pybel_ray.struct import collapse_equivalences, count_relations
    from pybel_ray.struct.graph import Graph

    def edge(a, b, relation, ev=None):
        return {
            "edge_md5": "%s-%s-%s-%s" % (a, b, relation, ev),
            "src_md5": a, "dst_md5": b,
            "src_bel": "p(X:%s)" % a, "dst_bel": "p(X:%s)" % b,
            "relation": relation, "evidence": ev,
            "citation_db": None, "citation_id": None,
            "annotations_json": None, "subject_json": None,
            "object_json": None, "triple_h": None, "triple_r": None,
            "triple_t": None,
        }

    edges = [
        # equivalence chain a == b == c and a pair p == q
        edge("a", "b", "equivalentTo"), edge("b", "c", "equivalentTo"),
        edge("p", "q", "equivalentTo"),
        # two increases edges that MERGE after rewiring (b->z and c->z both
        # become a->z with identical provenance)
        edge("b", "z", "increases", "ev1"), edge("c", "z", "increases", "ev1"),
        # same endpoints, different evidence: stays distinct
        edge("b", "z", "increases", "ev2"),
        # becomes a self-edge after collapse (a->c maps to a->a): dropped
        edge("a", "c", "decreases", "ev1"),
        # untouched edge
        edge("z", "w", "regulates", "ev1"),
    ]
    nodes = [
        {"md5": i, "bel": "p(X:%s)" % i, "function": "Protein",
         "namespace": "X", "name": i, "identifier": None, "node_json": "{}"}
        for i in ["a", "b", "c", "p", "q", "z", "w"]
    ]
    import pyarrow as pa

    from pybel_ray.struct.graph import EDGE_COLUMNS

    edge_table = pa.Table.from_pylist(
        edges, schema=pa.schema([(c, pa.string()) for c in EDGE_COLUMNS]),
    )
    graph = Graph(ray.data.from_items(nodes), ray.data.from_arrow(edge_table))

    got = {r["relation"]: r["n"] for r in
           count_relations(collapse_equivalences(graph)).take_all()}
    assert got == {"increases": 2, "regulates": 1}

    snap = str(tmp_path / "snap")
    graph.edges.write_parquet(snap + "/edges")
    sql = entry.oracle_sql()["kg_collapse_equivalences"].replace(
        entry._KG_SNAP_PATH, snap,
    )
    con = duckdb.connect()
    want = dict(con.execute(sql).fetchall())
    assert want == got
