"""Bulk import, graph persistence, interchange formats, extra summaries."""

import json

import pyarrow as pa
import pytest

from pybel_ray.pages import default_registry, generate_pages_table


@pytest.fixture(scope="module")
def graph(ray_session):
    import ray.data

    from pybel_ray.pipeline import compile_pages

    table = generate_pages_table(12, seed=9)
    kg = compile_pages(
        ray.data.from_arrow(table), default_registry(),
        concurrency=(1, 2), batch_size=4,
    )
    return kg.graph().materialize()


def test_from_edge_table(ray_session):
    import ray.data

    from pybel_ray.io_bulk import from_edge_table

    rows = [
        {"src_type": "Gene", "src_namespace": "HGNC", "src_name": "AKT1",
         "relation": "increases",
         "dst_type": "Disease", "dst_namespace": "DOID", "dst_name": "cancer"},
        {"src_type": "Compound", "src_namespace": "CHEBI", "src_name": "water",
         "relation": "association",
         "dst_type": "Gene", "dst_namespace": "HGNC", "dst_name": "AKT1"},
        # duplicate edge -> must dedup
        {"src_type": "Gene", "src_namespace": "HGNC", "src_name": "AKT1",
         "relation": "increases",
         "dst_type": "Disease", "dst_namespace": "DOID", "dst_name": "cancer"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    g = from_edge_table(ds)
    assert g.node_count() == 3
    assert g.edge_count() == 2
    bels = {r["bel"] for r in g.nodes.take_all()}
    assert "g(HGNC:AKT1)" in bels and "path(DOID:cancer)" in bels


def test_save_load_graph(ray_session, graph, tmp_path):
    from pybel_ray.io_bulk import load_graph, save_graph

    out = str(tmp_path / "snapshot")
    save_graph(graph, out)
    back = load_graph(out)
    assert back.node_count() == graph.node_count()
    assert back.edge_count() == graph.edge_count()
    assert {r["md5"] for r in back.nodes.take_all()} == graph.node_md5_set()


def test_cx_roundtrip(graph):
    from pybel_ray.export.interchange import from_cx, to_cx

    aspects = to_cx(graph, metadata={"name": "cx-test"})
    back = from_cx(aspects)
    assert back.node_count() == graph.node_count()
    assert back.edge_count() == graph.edge_count()
    assert back.metadata.get("name") == "cx-test"
    orig_edges = {r["edge_md5"] for r in graph.edges.take_all()}
    back_edges = {r["edge_md5"] for r in back.edges.take_all()}
    assert back_edges == orig_edges


def test_jgif(graph):
    from pybel_ray.export.interchange import to_jgif

    doc = to_jgif(graph, metadata={"name": "jgif-test"})
    assert len(doc["graph"]["nodes"]) == graph.node_count()
    assert len(doc["graph"]["edges"]) == graph.edge_count()
    qualified = [
        e for e in doc["graph"]["edges"]
        if e["metadata"]["evidences"] and "citation" in e["metadata"]["evidences"][0]
    ]
    assert qualified


def test_jgif_roundtrip(graph):
    from pybel_ray.export.interchange import from_jgif, to_jgif

    doc = to_jgif(graph, metadata={"name": "jgif-test"})
    back = from_jgif(doc)
    # the importer re-parses every qualified edge's label statement with the
    # evidence's control state; qualified edges must survive the round trip
    # (except UNQUALIFIED_EDGES relations, which the reference importer skips
    # even when qualified — io/jgif.py:260-261)
    from pybel_ray.constants import UNQUALIFIED_EDGES

    orig_qualified = {
        r["edge_md5"] for r in graph.edges.take_all()
        if r["citation_db"] is not None and r["relation"] not in UNQUALIFIED_EDGES
    }
    back_edges = {r["edge_md5"] for r in back.edges.take_all()}
    assert orig_qualified and orig_qualified <= back_edges
    # every reconstructed node BEL string existed in the original graph
    orig_bels = {r["bel"] for r in graph.nodes.take_all()}
    assert {r["bel"] for r in back.nodes.take_all()} <= orig_bels


def test_graphdati(graph):
    from pybel_ray.export.interchange import to_graphdati, to_graphdati_jsonl

    pubs = to_graphdati(graph, metadata={"authors": "a", "version": "1.0.0"})
    assert len(pubs) == graph.edge_count()
    one = pubs[0]["nanopub"]
    assert one["type"] == {"name": "BEL", "version": "2.1.0"}
    assert set(one["assertions"][0]) == {"subject", "relation", "object"}
    assert one["metadata"] == {"gd_creator": "a", "version": "1.0.0"}
    lines = to_graphdati_jsonl(graph)
    assert len(lines) == len(pubs)
    assert json.loads(lines[0])["nanopub"]["id"].startswith("pybel_")


def test_extra_summaries(graph, ray_session):
    from pybel_ray.struct.summary import (
        calculate_incorrect_name_dict,
        count_names_by_namespace,
        get_syntax_errors,
    )

    names = count_names_by_namespace(graph, "HGNC").take_all()
    assert names and all(r["n"] >= 1 for r in names)

    # nested members must be counted too: total mentions >= node count
    hgnc_nodes = [
        r for r in graph.nodes.take_all() if r["namespace"] == "HGNC"
    ]
    assert sum(r["n"] for r in names) >= len(hgnc_nodes)


def test_error_summaries(ray_session):
    import ray.data

    from pybel_ray.pipeline import compile_pages
    from pybel_ray.struct.summary import (
        calculate_error_by_annotation,
        count_error_types,
        get_syntax_errors,
    )

    table = generate_pages_table(40, seed=13, error_fraction=0.5)
    kg = compile_pages(
        ray.data.from_arrow(table), default_registry(),
        concurrency=(1, 2), batch_size=8,
    )
    errors = kg.errors().materialize()
    classes = {r["error_class"] for r in count_error_types(errors).take_all()}
    assert classes
    syntax = get_syntax_errors(errors)
    assert all(r["error_class"] == "BELSyntaxError" for r in syntax.take_all())
    by_species = calculate_error_by_annotation(errors, "Species").take_all()
    assert by_species  # errors occurred inside annotated statement groups


def test_random_path_and_shortest_paths(graph):
    from pybel_ray.struct.induction import (
        get_random_path,
        get_subgraph_by_shortest_paths,
        group_subgraphs_by_annotation,
    )

    p1 = get_random_path(graph, seed=5)
    p2 = get_random_path(graph, seed=5)
    assert p1 == p2 and len(p1) >= 1

    seeds = sorted(graph.node_md5_set())[:4]
    sub = get_subgraph_by_shortest_paths(graph, seeds)
    assert sub.node_count() >= 0

    groups = group_subgraphs_by_annotation(graph, "Species")
    assert set(groups) <= {"9606", "10090", "10116"}
    for value, g in groups.items():
        for r in g.edges.take_all():
            assert '"{}":true'.format(value) in r["annotations_json"]

def test_group_subgraphs_by_citation(graph):
    from pybel_ray.struct.induction import group_subgraphs_by_citation

    groups = group_subgraphs_by_citation(graph)
    assert groups
    total = 0
    for (db, db_id), g in groups.items():
        rows = g.edges.take_all()
        total += len(rows)
        assert all(r["citation_db"] == db and r["citation_id"] == db_id for r in rows)
    qualified = sum(
        1 for r in graph.edges.take_all() if r["citation_db"] is not None
    )
    assert total == qualified
