"""INDRA statement-JSON interop (reference io/indra.py:46-180 delegates to
the external indra package; this engine implements the public statement-JSON
semantics from scratch, so tests pin the documented BEL mapping)."""

import json

import pytest


def _statements():
    return [
        {
            "type": "Phosphorylation",
            "enz": {"name": "MAP2K1", "db_refs": {"HGNC": "6840"}},
            "sub": {"name": "MAPK1", "db_refs": {"HGNC": "6871"}},
            "residue": "T", "position": "185",
            "evidence": [{"text": "MEK phosphorylates ERK", "pmid": "10000001"}],
        },
        {
            "type": "Dephosphorylation",
            "enz": {"name": "DUSP6", "db_refs": {"HGNC": "3072"}},
            "sub": {"name": "MAPK1", "db_refs": {"HGNC": "6871"}},
            "residue": "T", "position": "185",
            "evidence": [{"text": "DUSP6 dephosphorylates ERK", "pmid": "10000002"}],
        },
        {
            "type": "Activation",
            "subj": {"name": "BRAF", "db_refs": {"HGNC": "1097"}},
            "obj": {"name": "MAP2K1", "db_refs": {"HGNC": "6840"}},
            "obj_activity": "kin",
            "evidence": [{"text": "BRAF activates MEK", "pmid": "10000003"}],
        },
        {
            "type": "Inhibition",
            "subj": {"name": "vemurafenib", "db_refs": {"CHEBI": "CHEBI:63637"}},
            "obj": {"name": "BRAF", "db_refs": {"HGNC": "1097"}},
            "obj_activity": "activity",
            "evidence": [{"text": "vemurafenib inhibits BRAF", "pmid": "10000004"}],
        },
        {
            "type": "IncreaseAmount",
            "subj": {"name": "TP53", "db_refs": {"HGNC": "11998"}},
            "obj": {"name": "MDM2", "db_refs": {"HGNC": "6973"}},
            "evidence": [{"text": "p53 upregulates MDM2", "pmid": "10000005"}],
        },
        {
            "type": "Complex",
            "members": [
                {"name": "MAPK1", "db_refs": {"HGNC": "6871"}},
                {"name": "MAP2K1", "db_refs": {"HGNC": "6840"}},
            ],
            "evidence": [{"text": "MEK binds ERK", "pmid": "10000006"}],
        },
        {
            "type": "ActiveForm",
            "agent": {
                "name": "MAPK1", "db_refs": {"HGNC": "6871"},
                "mods": [{"mod_type": "phosphorylation", "residue": "T",
                          "position": "185", "is_modified": True}],
            },
            "activity": "kin", "is_active": True,
            "evidence": [{"text": "pERK is active", "pmid": "10000007"}],
        },
        {
            "type": "Gef",
            "gef": {"name": "SOS1", "db_refs": {"HGNC": "11187"}},
            "ras": {"name": "KRAS", "db_refs": {"HGNC": "6407"}},
            "evidence": [{"text": "SOS1 is a GEF for KRAS", "pmid": "10000008"}],
        },
        {
            "type": "Translocation",  # unsupported: must be skipped, not crash
            "agent": {"name": "NFKB1", "db_refs": {"HGNC": "7794"}},
        },
    ]


@pytest.fixture(scope="module")
def graph(ray_session):
    from pybel_ray.io_indra import from_indra_statements

    return from_indra_statements(_statements(), num_blocks=2).materialize()


def test_nodes(graph):
    bels = {r["bel"] for r in graph.nodes.take_all()}
    assert "p(hgnc:6840 ! MAP2K1)" in bels
    assert 'p(hgnc:6871 ! MAPK1, pmod(Ph, Thr, 185))' in bels
    assert "a(chebi:63637 ! vemurafenib)" in bels
    assert any(b.startswith("complex(") for b in bels)


def test_edges(graph):
    edges = graph.edges.take_all()
    by_rel = {}
    for e in edges:
        by_rel.setdefault(e["relation"], []).append(e)
    # modifications: +pmod target, directlyIncreases / directlyDecreases
    inc = {(e["src_bel"], e["dst_bel"]) for e in by_rel["directlyIncreases"]}
    assert ("p(hgnc:6840 ! MAP2K1)",
            "p(hgnc:6871 ! MAPK1, pmod(Ph, Thr, 185))") in inc
    dec = {(e["src_bel"], e["dst_bel"]) for e in by_rel["directlyDecreases"]}
    assert ("p(hgnc:3072 ! DUSP6)",
            "p(hgnc:6871 ! MAPK1, pmod(Ph, Thr, 185))") in dec
    # activation carries an Activity object modifier with the ma() effect
    act = [e for e in by_rel["directlyIncreases"]
           if e["src_bel"] == "p(hgnc:1097 ! BRAF)"]
    assert act and json.loads(act[0]["object_json"])["effect"]["name"] == "kin"
    # inhibition with plain 'activity' -> modifier without effect
    inh = [e for e in by_rel["directlyDecreases"]
           if e["src_bel"] == "a(chebi:63637 ! vemurafenib)"]
    assert inh and "effect" not in json.loads(inh[0]["object_json"])
    # complex members materialize partOf edges
    part_of = {(e["src_bel"], e["dst_bel"]) for e in by_rel["partOf"]}
    assert any(dst.startswith("complex(") for _, dst in part_of)
    # evidence + citation flow through
    ph = [e for e in by_rel["directlyIncreases"]
          if e["citation_id"] == "10000001"]
    assert ph and ph[0]["evidence"] == "MEK phosphorylates ERK"
    # Gef: subject AND object activity modifiers
    gef = [e for e in by_rel["directlyIncreases"]
           if e["src_bel"] == "p(hgnc:11187 ! SOS1)"]
    assert gef
    assert json.loads(gef[0]["subject_json"])["effect"]["name"] == "gef"
    assert json.loads(gef[0]["object_json"])["effect"]["name"] == "gtp"


def test_unsupported_skipped(graph):
    # Translocation contributes no edges (and no crash)
    assert all("NFKB1" not in e["src_bel"] for e in graph.edges.take_all())


def test_round_trip(ray_session, graph):
    """to_indra_statements recovers the causal/complex statements."""
    from pybel_ray.io_indra import to_indra_statements

    stmts = [json.loads(r["stmt_json"])
             for r in to_indra_statements(graph).take_all()]
    by_type = {}
    for s in stmts:
        by_type.setdefault(s["type"], []).append(s)

    ph = by_type["Phosphorylation"]
    assert any(
        s["enz"]["db_refs"] == {"HGNC": "6840"}
        and s["sub"]["db_refs"] == {"HGNC": "6871"}
        and (s["residue"], s["position"]) == ("T", "185")
        and s["evidence"][0]["pmid"] == "10000001"
        for s in ph
    )
    assert any(
        s["enz"]["db_refs"] == {"HGNC": "3072"}
        for s in by_type["Dephosphorylation"]
    )
    assert any(
        s["subj"]["db_refs"] == {"HGNC": "1097"} and s["obj_activity"] == "kin"
        for s in by_type["Activation"]
    )
    assert any(
        s["subj"]["db_refs"] == {"CHEBI": "63637"}
        and s["obj_activity"] == "activity"
        for s in by_type["Inhibition"]
    )
    assert by_type["IncreaseAmount"]
    members = {
        frozenset(m["db_refs"].get("HGNC") for m in s["members"])
        for s in by_type["Complex"]
    }
    assert frozenset({"6871", "6840"}) in members


def test_to_indra_join_path_matches_broadcast(ray_session, graph):
    """broadcast_budget=0 forces the beyond-budget distributed equi-join
    path; outputs must be identical to the broadcast path."""
    from pybel_ray.io_indra import to_indra_statements

    broadcast = sorted(
        r["stmt_json"] for r in to_indra_statements(graph).take_all()
    )
    joined = sorted(
        r["stmt_json"]
        for r in to_indra_statements(graph, broadcast_budget=0).take_all()
    )
    assert joined == broadcast and len(broadcast) > 0


def test_json_file_and_registry(ray_session, tmp_path):
    from pybel_ray.io_indra import from_indra_json_file
    from pybel_ray.io_registry import get_importer

    path = tmp_path / "stmts.json"
    path.write_text(json.dumps(_statements()[:2]))
    g = from_indra_json_file(str(path), num_blocks=1)
    assert g.edge_count() == 2
    assert get_importer("indra") is not None


def test_flat_api():
    import pybel_ray

    assert pybel_ray.from_indra_statements is not None
    assert pybel_ray.to_indra_statements is not None
