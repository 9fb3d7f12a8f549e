"""BioPAX L3 OWL importer (reference io/indra.py:151-180 delegates to the
external indra package; this is a from-scratch reader over the public
BioPAX Level-3 RDF/XML format)."""

import os

FIXTURE = os.path.join(os.path.dirname(__file__), "corpora", "biopax_fixture.owl")


def test_biopax_to_statements():
    from pybel_ray.io_biopax import biopax_to_statements

    stmts = biopax_to_statements(FIXTURE)
    by_type = {}
    for s in stmts:
        by_type.setdefault(s["type"], []).append(s)

    # Catalysis of the gained-ModificationFeature reaction
    ph = by_type["Phosphorylation"]
    assert any(
        s["enz"]["db_refs"] == {"HGNC": "6840"}
        and s["sub"]["db_refs"] == {"HGNC": "6871"}
        and (s["residue"], s["position"]) == ("T", "185")
        for s in ph
    )
    # INHIBITION controlType -> De- form from the same reaction
    deph = by_type["Dephosphorylation"]
    assert any(
        s["enz"]["db_refs"] == {"UP": "Q16828"} for s in deph
    )
    # the reverse reaction (right loses the feature) emits nothing
    assert len(ph) == 1 and len(deph) == 1
    # Complex over components
    members = by_type["Complex"][0]["members"]
    assert {m["name"] for m in members} == {"MAP2K1", "MAPK1"}


def test_from_biopax_graph(ray_session):
    from pybel_ray.io_biopax import from_biopax

    g = from_biopax(FIXTURE, num_blocks=1).materialize()
    bels = {r["bel"] for r in g.nodes.take_all()}
    assert "p(hgnc:6871 ! MAPK1, pmod(Ph, Thr, 185))" in bels
    rels = {(e["src_bel"], e["relation"], e["dst_bel"])
            for e in g.edges.take_all()}
    assert ("p(hgnc:6840 ! MAP2K1)", "directlyIncreases",
            "p(hgnc:6871 ! MAPK1, pmod(Ph, Thr, 185))") in rels
    assert ("p(uniprot:Q16828 ! DUSP6)", "directlyDecreases",
            "p(hgnc:6871 ! MAPK1, pmod(Ph, Thr, 185))") in rels


def test_from_biopax_bytes_and_flat_api():
    import pybel_ray
    from pybel_ray.io_biopax import biopax_to_statements

    with open(FIXTURE, "rb") as f:
        stmts = biopax_to_statements(f.read())
    assert len(stmts) == 3
    assert pybel_ray.from_biopax is not None
