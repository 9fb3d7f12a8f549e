"""Unit tests for canonical serialization and hashing (SURVEY.md §1)."""

from pybel_ray.canon import (
    edge_md5,
    edge_tuple,
    ensure_quotes,
    entity_curie,
    entity_obo,
    node_md5,
    node_to_bel,
    safe_label,
)
from pybel_ray.constants import (
    COMPLEX,
    CONCEPT,
    FUNCTION,
    GENE,
    MEMBERS,
    PRODUCTS,
    PROTEIN,
    REACTANTS,
    REACTION,
    RELATION,
    VARIANTS,
)


def protein(name, ns="HGNC", identifier=None, variants=None):
    node = {FUNCTION: PROTEIN, CONCEPT: {"namespace": ns, "name": name}}
    if identifier:
        node[CONCEPT]["identifier"] = identifier
    if variants:
        node[VARIANTS] = variants
    return node


def test_ensure_quotes():
    assert ensure_quotes("AKT1") == "AKT1"
    assert ensure_quotes("oxygen atom") == '"oxygen atom"'
    assert ensure_quotes("NADP(+)") == '"NADP(+)"'


def test_curie_and_obo():
    e = {"namespace": "HGNC", "name": "AKT1", "identifier": "391"}
    assert entity_curie(e) == "HGNC:391"
    assert entity_obo(e) == "HGNC:391 ! AKT1"
    assert entity_curie({"namespace": "bel", "name": "kin"}) == "kin"


def test_node_bel_obo_form():
    # identifier+name -> OBO form (reference node_classes.py:177-182)
    assert node_to_bel(protein("AKT1", identifier="391")) == "p(HGNC:391 ! AKT1)"
    assert node_to_bel(protein("AKT1")) == "p(HGNC:AKT1)"


def test_variant_sorting():
    v1 = {"kind": "hgvs", "hgvs": "p.Phe508del"}
    v2 = {"kind": "pmod", "concept": {"namespace": "bel", "name": "Ph"}}
    a = protein("AKT1", variants=[v1, v2])
    b = protein("AKT1", variants=[v2, v1])
    assert node_to_bel(a) == node_to_bel(b)
    assert node_md5(a) == node_md5(b)
    assert node_to_bel(a) == 'p(HGNC:AKT1, pmod(Ph), var("p.Phe508del"))'


def test_complex_members_sorted_serialization():
    node = {
        FUNCTION: COMPLEX,
        MEMBERS: [protein("AAA"), protein("BBB")],
    }
    assert node_to_bel(node) == "complex(p(HGNC:AAA), p(HGNC:BBB))"


def test_reaction_bel():
    node = {
        FUNCTION: REACTION,
        REACTANTS: [protein("AAA")],
        PRODUCTS: [protein("BBB")],
    }
    assert node_to_bel(node) == "rxn(reactants(p(HGNC:AAA)), products(p(HGNC:BBB)))"


def test_safe_label():
    # central dogma with variants -> full BEL; else curie
    assert safe_label(protein("AKT1")) == "HGNC:AKT1"
    v = protein("AKT1", variants=[{"kind": "hgvs", "hgvs": "="}])
    assert safe_label(v) == 'p(HGNC:AKT1, var("="))'
    rxn = {FUNCTION: REACTION, REACTANTS: [protein("A")], PRODUCTS: [protein("B")]}
    assert safe_label(rxn) == node_to_bel(rxn)


def test_edge_hash_stability_and_equivalence():
    data1 = {
        RELATION: "increases",
        "evidence": "e",
        "citation": {"db": "PubMed", "db_id": "1"},
        "subject": {"modifier": "Activity"},
    }
    k1 = edge_md5("p(HGNC:A)", "p(HGNC:B)", data1)
    # LINE/metadata keys must not affect the hash
    data2 = dict(data1, line=99)
    k2 = edge_md5("p(HGNC:A)", "p(HGNC:B)", data2)
    assert k1 == k2
    # different modifier -> different hash
    data3 = dict(data1, subject={"modifier": "Degradation"})
    assert edge_md5("p(HGNC:A)", "p(HGNC:B)", data3) != k1
    # annotations are NOT part of the reference edge tuple either
    t = edge_tuple("p(HGNC:A)", "p(HGNC:B)", data1)
    assert t[2] == "PubMed:1"
