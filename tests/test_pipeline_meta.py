"""Pipeline meta-steps (union/intersection) + universe transformations."""

import pytest


@pytest.fixture(scope="module")
def kg_graph(ray_session):
    from pybel_ray.pages import default_registry, pages_dataset
    from pybel_ray.pipeline import compile_pages

    kg = compile_pages(pages_dataset(6, seed=9, block_pages=3),
                       default_registry(), batch_size=4)
    return kg.graph().materialize()


def test_pipeline_union_meta(kg_graph):
    from pybel_ray.struct.pipeline_protocol import Pipeline

    causal = Pipeline().append("remove_non_causal_edges")
    assoc = Pipeline().append("remove_associations")
    combined = Pipeline().append_union(causal, assoc)

    # serializes and replays
    replayed = Pipeline.from_json(combined.to_json())
    out = replayed.run(kg_graph)

    causal_keys = {r["edge_md5"] for r in causal.run(kg_graph).edges.take_all()}
    assoc_keys = {r["edge_md5"] for r in assoc.run(kg_graph).edges.take_all()}
    got = {r["edge_md5"] for r in out.edges.take_all()}
    assert got == causal_keys | assoc_keys


def test_pipeline_intersection_meta(kg_graph):
    from pybel_ray.struct.pipeline_protocol import Pipeline

    a = Pipeline().append("remove_pathologies")
    b = Pipeline().append("remove_biological_processes")
    out = Pipeline().append_intersection(a, b).run(kg_graph)

    a_nodes = {r["md5"] for r in a.run(kg_graph).nodes.take_all()}
    b_nodes = {r["md5"] for r in b.run(kg_graph).nodes.take_all()}
    got = {r["md5"] for r in out.nodes.take_all()}
    assert got == (a_nodes & b_nodes)


def test_universe_transformation(kg_graph):
    from pybel_ray.struct.pipeline_protocol import Pipeline
    from pybel_ray.struct.induction import get_subgraph_by_neighborhood

    seed = kg_graph.nodes.take(1)[0]["md5"]
    small = get_subgraph_by_neighborhood(kg_graph, [seed], hops=1)
    small = type(small)(small.nodes.materialize(), small.edges.materialize())
    n_before = small.nodes.count()

    p = Pipeline().append("expand_node_neighborhood", node_md5s=[seed], hops=2)
    out = p.run(small, universe=kg_graph)
    assert out.nodes.count() >= n_before

    # running a universe step without a universe raises
    with pytest.raises(ValueError):
        p.run(small)


def test_query_upstream_downstream_seeding(kg_graph):
    from pybel_ray.struct.induction import expand_upstream
    from pybel_ray.struct.pipeline_protocol import Query

    seed = kg_graph.edges.take(1)[0]["dst_md5"]
    q = Query().append_seeding_upstream([seed], hops=1)
    # round-trip through JSON like a stored query plan
    out = Query.from_json(q.to_json()).run(kg_graph)
    direct = expand_upstream(kg_graph, [seed], 1)
    assert sorted(r["md5"] for r in out.nodes.take_all()) == sorted(
        r["md5"] for r in direct.nodes.take_all()
    )


def test_write_subgraphs_by_annotation(kg_graph, tmp_path):
    import glob
    import json

    from pybel_ray.struct.induction import (
        group_subgraphs_by_annotation,
        write_subgraphs_by_annotation,
    )

    out = str(tmp_path / "groups")
    write_subgraphs_by_annotation(kg_graph, "Species", out)
    parts = glob.glob(out + "/_group=*/")
    groups = group_subgraphs_by_annotation(kg_graph, "Species")
    assert len(parts) == len(groups)
    # per-partition edge counts match the materialized groups
    import ray.data

    for value, g in groups.items():
        part = ray.data.read_parquet("{}/_group={}".format(out, value))
        assert part.count() == g.edges.count()


def test_registered_transformations_lists_universe():
    from pybel_ray.struct.pipeline_protocol import registered_transformations

    names = registered_transformations()
    assert "expand_node_neighborhood" in names
    assert "remove_isolated_nodes" in names
