"""CLI smoke tests (reference cli.py:92-262 parity surface).

Each CLI invocation is a subprocess with its own Ray session, so the whole
compile→summarize→warnings→serialize flow is exercised in ONE test to pay
the session cost once.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "pybel_ray", *args],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )


@pytest.fixture(scope="module")
def pages_parquet(tmp_path_factory, ray_session):
    """A tiny synthetic page-table Parquet (the engine's native input)."""
    from pybel_ray.pages import pages_dataset

    out = str(tmp_path_factory.mktemp("cli") / "pages")
    pages_dataset(6, seed=7, block_pages=3).write_parquet(out)
    return out


def test_cli_flow(pages_parquet, tmp_path):
    out_dir = str(tmp_path / "compiled")
    r = _run("compile", pages_parquet, "-o", out_dir, "--synthetic-registry")
    assert "Compilation" in r.stdout, r.stderr
    assert os.path.isdir(os.path.join(out_dir, "events"))
    # synthetic corpus plants warnings, so reference-parity exit code is 1
    assert r.returncode in (0, 1)

    r = _run("summarize", out_dir)
    assert r.returncode == 0, r.stderr
    counts = dict(
        line.split(": ") for line in r.stdout.strip().splitlines() if ": " in line
    )
    assert int(counts["nodes"]) > 0
    assert int(counts["triples"]) > 0

    r = _run("warnings", out_dir)
    assert r.returncode == 0, r.stderr

    sif = str(tmp_path / "graph.sif")
    nodelink = str(tmp_path / "graph.json")
    r = _run("serialize", out_dir, "--sif", sif, "--nodelink", nodelink)
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(sif) > 0
    with open(nodelink) as f:
        doc = json.load(f)
    assert doc["nodes"]


def test_cli_formats():
    r = _run("formats")
    assert r.returncode == 0, r.stderr
    formats = json.loads(r.stdout)
    assert "nodelink" in formats["exporters"]
    assert "cbn_jgif" in formats["importers"]


def test_cli_bad_page_table(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    bad = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), bad)
    r = _run("compile", bad)
    assert r.returncode != 0
    assert "url" in r.stderr


def test_io_registry_roundtrip(ray_session, graph=None):
    """serialize/deserialize through the registry keeps node/edge identity."""
    from pybel_ray.io_registry import deserialize, serialize
    from pybel_ray.pages import default_registry, pages_dataset
    from pybel_ray.pipeline import compile_pages

    kg = compile_pages(pages_dataset(4, seed=3, block_pages=2),
                       default_registry(), batch_size=4)
    g = kg.graph().materialize()
    doc = serialize(g, "nodelink")
    g2 = deserialize(doc, "nodelink")
    assert sorted(r["md5"] for r in g2.nodes.take_all()) == sorted(
        r["md5"] for r in g.nodes.take_all()
    )


def test_from_cbn_jgif(ray_session):
    from pybel_ray.export.interchange import from_cbn_jgif

    doc = {
        "graph": {
            "metadata": {"name": "cbn test"},
            "nodes": [
                {"id": "p(HGNC:AKT1)", "label": "p(HGNC:AKT1)"},
                {"id": "p(HGNC:EGFR)", "label": "p(HGNC:EGFR)"},
            ],
            "edges": [
                {
                    "source": "p(HGNC:AKT1)",
                    "target": "p(HGNC:EGFR)",
                    "relation": "increases",
                    "label": "p(HGNC:AKT1) increases p(HGNC:EGFR)",
                    "metadata": {
                        "evidences": [
                            {
                                "summary_text": "some finding",
                                "citation": {"type": "PubMed", "id": "1234"},
                                "experiment_context": {
                                    "species_common_name": "Human",
                                    "tissue": "liver ",
                                    "ignored_empty": "",
                                },
                            },
                        ],
                    },
                },
            ],
        },
    }
    g = from_cbn_jgif(doc)
    edges = g.edges.take_all()
    assert len(edges) == 1
    annotations = json.loads(edges[0]["annotations_json"])
    assert annotations["Species"] == {"9606": True}
    assert annotations["Tissue"] == {"liver": True}
    assert g.metadata["authors"] == "Causal Biological Networks Database"
    assert g.nodes.count() == 2


def test_cli_import_biopax(ray_session, tmp_path):
    import os

    from click.testing import CliRunner

    from pybel_ray.cli import main
    from pybel_ray.io_bulk import load_graph

    fixture = os.path.join(os.path.dirname(__file__), "corpora",
                           "biopax_fixture.owl")
    out = str(tmp_path / "graph")
    result = CliRunner().invoke(main, ["import", "biopax", fixture, "-o", out])
    assert result.exit_code == 0, result.output
    g = load_graph(out)
    assert g.edge_count() > 0 and g.node_count() > 0


def test_cli_import_indra(ray_session, tmp_path):
    import json as _json

    from click.testing import CliRunner

    from pybel_ray.cli import main
    from pybel_ray.io_bulk import load_graph

    stmts = [{
        "type": "Phosphorylation",
        "enz": {"name": "MAP2K1", "db_refs": {"HGNC": "6840"}},
        "sub": {"name": "MAPK1", "db_refs": {"HGNC": "6871"}},
        "residue": "T", "position": "185",
        "evidence": [{"text": "ev", "pmid": "1"}],
    }]
    path = tmp_path / "stmts.json"
    path.write_text(_json.dumps(stmts))
    out = str(tmp_path / "graph")
    result = CliRunner().invoke(
        main, ["import", "indra", str(path), "-o", out],
    )
    assert result.exit_code == 0, result.output
    assert load_graph(out).edge_count() == 1
