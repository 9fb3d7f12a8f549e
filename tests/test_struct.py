"""Graph-structure operator tests over a compiled synthetic KG."""

import json

import pytest

from pybel_ray.pages import default_registry, generate_pages_table


@pytest.fixture(scope="module")
def kg(ray_session):
    import ray.data

    from pybel_ray.pipeline import compile_pages

    table = generate_pages_table(20, seed=3)
    return compile_pages(
        ray.data.from_arrow([table.slice(i, 5) for i in range(0, table.num_rows, 5)]),
        default_registry(),
        concurrency=(1, 2),
        batch_size=4,
    )


@pytest.fixture(scope="module")
def graph(kg):
    return kg.graph().materialize()


def test_filters(graph):
    from pybel_ray.struct import filter_edges, filter_nodes
    from pybel_ray.struct.filters import (
        function_inclusion_filter,
        namespace_inclusion_filter,
        relation_filter,
    )

    proteins = filter_nodes(graph.nodes, "is_protein").take_all()
    assert proteins and all(r["function"] == "Protein" for r in proteins)

    with_variants = filter_nodes(graph.nodes, "has_variant").take_all()
    assert with_variants
    for r in with_variants:
        assert "variants" in json.loads(r["node_json"])

    hgnc = filter_nodes(graph.nodes, namespace_inclusion_filter("HGNC")).take_all()
    assert hgnc and all(r["namespace"] == "HGNC" for r in hgnc)

    causal = filter_edges(graph.edges, "is_causal_relation").take_all()
    assert causal and all(
        r["relation"] in {"increases", "decreases", "directlyIncreases",
                          "directlyDecreases", "regulates"}
        for r in causal
    )

    prov = filter_edges(graph.edges, "has_provenance").take_all()
    assert prov and all(r["evidence"] is not None for r in prov)

    combo = filter_nodes(
        graph.nodes, [function_inclusion_filter("Protein"), "has_variant"],
    ).take_all()
    assert combo
    assert {r["md5"] for r in combo} <= {r["md5"] for r in proteins}
    deg = filter_edges(graph.edges, relation_filter("hasVariant")).take_all()
    assert deg


def test_union_and_subgraph(graph):
    from pybel_ray.struct import left_full_join, subgraph, union

    u = union([graph, graph])
    assert u.node_count() == graph.node_count()
    assert u.edge_count() == graph.edge_count()
    assert left_full_join(graph, graph).edge_count() == graph.edge_count()

    some = sorted(graph.node_md5_set())[:10]
    sub = subgraph(graph, set(some))
    assert sub.node_count() == 10
    for r in sub.edges.take_all():
        assert r["src_md5"] in some and r["dst_md5"] in some


def test_summaries(graph, kg):
    from pybel_ray.struct import (
        count_error_types,
        count_functions,
        count_namespaces,
        count_relations,
        get_top_hubs,
    )
    from pybel_ray.struct.summary import (
        count_annotations,
        count_variants,
        get_annotation_values,
        get_metaedge_counts,
        get_pubmed_identifiers,
        number_of_citations,
    )

    funcs = {r["function"]: r["n"] for r in count_functions(graph).take_all()}
    assert funcs.get("Protein", 0) > 0
    assert sum(funcs.values()) == graph.node_count()

    ns = {r["namespace"]: r["n"] for r in count_namespaces(graph).take_all()}
    assert "HGNC" in ns

    rels = {r["relation"]: r["n"] for r in count_relations(graph).take_all()}
    assert sum(rels.values()) == graph.edge_count()

    hubs = get_top_hubs(graph, 5).take_all()
    assert len(hubs) == 5
    assert hubs[0]["degree"] >= hubs[-1]["degree"]

    annos = {r["annotation"] for r in count_annotations(graph).take_all()}
    assert "Species" in annos
    species = {r["value"] for r in get_annotation_values(graph, "Species").take_all()}
    assert species <= {"9606", "10090", "10116"}

    assert number_of_citations(graph) > 0
    assert get_pubmed_identifiers(graph).count() > 0
    assert count_variants(graph).count() > 0
    assert get_metaedge_counts(graph).count() > 0
    assert count_error_types(kg.errors()).count() >= 0


def test_collapse_variants(graph):
    from pybel_ray.struct import collapse_all_variants
    from pybel_ray.struct.filters import filter_nodes

    collapsed = collapse_all_variants(graph).materialize()
    assert filter_nodes(collapsed.nodes, "has_variant").count() == 0
    assert collapsed.node_count() < graph.node_count()
    # no self edges
    for r in collapsed.edges.take_all():
        assert r["src_md5"] != r["dst_md5"]
        assert r["relation"] != "hasVariant"


def test_collapse_to_genes(graph):
    from pybel_ray.struct import collapse_to_genes
    from pybel_ray.struct.filters import filter_nodes

    collapsed = collapse_to_genes(graph).materialize()
    # every variant-free, non-fusion RNA is collapsed into its gene
    # (fusions are not CentralDogma in the reference either)
    remaining = filter_nodes(collapsed.nodes, "is_rna").take_all()
    assert not [
        r for r in remaining
        if "variants" not in r["node_json"] and "fusion" not in r["node_json"]
    ]
    assert collapsed.node_count() < graph.node_count()


def test_inference_enrichment(graph):
    from pybel_ray.struct import enrich_protein_and_rna_origins
    from pybel_ray.struct.filters import filter_edges, relation_filter

    enriched = enrich_protein_and_rna_origins(graph).materialize()
    assert enriched.node_count() > graph.node_count()
    translated = filter_edges(
        enriched.edges, relation_filter("translatedTo"),
    ).count()
    assert translated > 0


def test_induction(graph):
    from pybel_ray.struct import get_random_subgraph, get_subgraph_by_neighborhood
    from pybel_ray.struct.induction import get_subgraph_by_annotation_value

    seed = sorted(graph.node_md5_set())[:3]
    hood = get_subgraph_by_neighborhood(graph, seed, hops=1)
    assert hood.node_count() >= 3

    sub = get_subgraph_by_annotation_value(graph, "Species", "9606")
    for r in sub.edges.take_all():
        assert '"9606":true' in r["annotations_json"]

    rand1 = get_random_subgraph(graph, number_edges=20, seed=42)
    rand2 = get_random_subgraph(graph, number_edges=20, seed=42)
    k1 = sorted(r["edge_md5"] for r in rand1.edges.take_all())
    k2 = sorted(r["edge_md5"] for r in rand2.edges.take_all())
    assert k1 == k2 and len(k1) == 20


def test_pipeline_protocol(graph):
    from pybel_ray.struct import Pipeline
    from pybel_ray.struct.pipeline_protocol import Query

    p = Pipeline().append("remove_associations").append("collapse_all_variants")
    p2 = Pipeline.from_json(p.to_json())
    out = p2.run(graph).materialize()
    assert out.edge_count() > 0
    rels = {r["relation"] for r in out.edges.take_all()}
    assert "association" not in rels and "hasVariant" not in rels

    q = Query().append_seeding_sample(number_edges=15, seed=1)
    q.pipeline.append("remove_non_causal_edges")
    q2 = Query.from_json(q.to_json())
    res = q2.run(graph)
    assert res.edge_count() <= 15


def test_exports_roundtrip(graph):
    from pybel_ray.export.nodelink import from_nodelink, to_nodelink
    from pybel_ray.export.extras import to_gsea, to_sif

    doc = to_nodelink(graph, metadata={"name": "test"})
    assert len(doc["nodes"]) == graph.node_count()
    assert len(doc["links"]) == graph.edge_count()
    bels = [n["bel"] for n in doc["nodes"]]
    assert bels == sorted(bels)

    back = from_nodelink(doc)
    assert back.node_count() == graph.node_count()
    assert back.edge_count() == graph.edge_count()
    assert {r["md5"] for r in back.nodes.take_all()} == graph.node_md5_set()

    sif = to_sif(graph)
    assert sif.count() == graph.edge_count()
    gsea = to_gsea(graph)
    assert "HGNC" in gsea


def test_bel_script_reparse(graph, ray_session):
    """Canonical script writer output must re-compile to the same triples."""
    from pybel_ray.export.bel_script import to_bel_script_lines
    from pybel_ray.pages import (
        ANNO_CELL_URL,
        ANNO_SPECIES_URL,
        NS_CHEBI_URL,
        NS_GO_URL,
        NS_HGNC_URL,
        NS_MESHD_URL,
    )
    from pybel_ray.parsing.document import compile_document

    header = [
        'SET DOCUMENT Name = "Roundtrip"',
        'SET DOCUMENT Version = "1.0.0"',
        'SET DOCUMENT Description = "x"',
        'SET DOCUMENT Authors = "x"',
        'SET DOCUMENT ContactInfo = "x"',
        'DEFINE NAMESPACE HGNC AS URL "{}"'.format(NS_HGNC_URL),
        'DEFINE NAMESPACE CHEBI AS URL "{}"'.format(NS_CHEBI_URL),
        'DEFINE NAMESPACE GO AS URL "{}"'.format(NS_GO_URL),
        'DEFINE NAMESPACE MESHD AS URL "{}"'.format(NS_MESHD_URL),
        'DEFINE NAMESPACE dbSNP AS PATTERN "rs[0-9]+"',
        'DEFINE ANNOTATION Species AS URL "{}"'.format(ANNO_SPECIES_URL),
        'DEFINE ANNOTATION CellLine AS URL "{}"'.format(ANNO_CELL_URL),
        'DEFINE ANNOTATION Conf AS LIST {"High","Low"}',
        'DEFINE ANNOTATION TextLoc AS PATTERN "[0-9]+"',
    ]
    body = list(to_bel_script_lines(graph))
    text = "\n".join(header + body)
    res = compile_document(text, default_registry())
    assert not [e for e in res.errors if e["error_class"] != "MissingMetadataException"], \
        [e for e in res.errors][:5]

    reparsed_triples = set()
    node_by_bel = {bel: node for bel, node in res.nodes}
    from pybel_ray.export.triples import edge_to_triple

    for e in res.edges:
        t = edge_to_triple(node_by_bel[e["src_bel"]], e["data"], node_by_bel[e["dst_bel"]])
        if t:
            reparsed_triples.add(t)

    original_triples = set()
    for r in graph.edges.take_all():
        if r["triple_h"] is not None:
            original_triples.add((r["triple_h"], r["triple_r"], r["triple_t"]))
    assert reparsed_triples == original_triples


def test_citation_enrichment(graph, ray_session):
    from pybel_ray.enrichment import enrich_citations, synthetic_pubmed_table
    from pybel_ray.struct.summary import get_pubmed_identifiers

    pmids = [r["citation_id"] for r in get_pubmed_identifiers(graph).take_all()]
    lookup = synthetic_pubmed_table(pmids)
    enriched = enrich_citations(graph.edges, lookup, concurrency=2)
    rows = enriched.take_all()
    hit = [r for r in rows if r["citation_title"]]
    assert hit
    for r in hit:
        assert r["citation_authors"].startswith("Author")
