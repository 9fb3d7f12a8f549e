"""Neo4j bulk-CSV export + BEL-Commons-style web transport (offline)."""

import csv
import glob
import json

import pytest


@pytest.fixture(scope="module")
def kg_graph(ray_session):
    from pybel_ray.pages import default_registry, pages_dataset
    from pybel_ray.pipeline import compile_pages

    kg = compile_pages(pages_dataset(6, seed=9, block_pages=3),
                       default_registry(), batch_size=4)
    return kg.graph().materialize()


def _read_shards(pattern):
    rows = []
    for p in glob.glob(pattern):
        with open(p, newline="") as f:
            rows.extend(csv.reader(f))
    return rows


def test_neo4j_bulk_export(kg_graph, tmp_path):
    from pybel_ray.export.neo4j_bulk import NODE_HEADER, REL_HEADER, to_neo4j_bulk

    out = str(tmp_path / "neo")
    manifest = to_neo4j_bulk(kg_graph, out)

    node_rows = _read_shards(out + "/nodes/part-*.csv")
    rel_rows = _read_shards(out + "/relationships/part-*.csv")
    assert manifest["nodes"] == len(node_rows) == kg_graph.node_count()
    assert manifest["relationships"] == len(rel_rows) == kg_graph.edge_count()

    with open(out + "/nodes.header.csv") as f:
        assert f.read().strip() == ",".join(NODE_HEADER)
    with open(out + "/relationships.header.csv") as f:
        assert f.read().strip() == ",".join(REL_HEADER)

    node_ids = {r[0] for r in node_rows}
    assert len(node_ids) == len(node_rows)  # unique :ID
    # every relationship endpoint resolves
    for r in rel_rows:
        assert r[0] in node_ids and r[1] in node_ids
        assert r[2]  # :TYPE
    # labels are BEL functions; named concept nodes carry a namespace
    labels = {r[4] for r in node_rows}
    assert labels <= {
        "Protein", "RNA", "Gene", "Complex", "Composite", "Abundance",
        "BiologicalProcess", "Pathology", "miRNA", "Reaction",
    }
    named = [r for r in node_rows if r[2]]
    assert named, "expected at least one namespaced node"
    unnamed = [r for r in node_rows if not r[2]]
    for r in unnamed:  # fallback rule: name = BEL string
        assert "(" in r[1]

    # idempotent re-run: same shard set, same rows
    manifest2 = to_neo4j_bulk(kg_graph, out)
    assert manifest2["nodes"] == manifest["nodes"]
    assert sorted(_read_shards(out + "/nodes/part-*.csv")) == sorted(node_rows)


def test_to_web_posts_nodelink(kg_graph):
    from pybel_ray.export.nodelink import to_nodelink
    from pybel_ray.export.web import RECEIVE_ENDPOINT, to_web

    calls = {}

    def fake_post(url, payload, headers):
        calls["url"] = url
        calls["payload"] = payload
        calls["headers"] = headers
        return b'{"task_id": "t-1"}'

    body = to_web(
        kg_graph, host="https://bel.example.org/", user="u", password="p",
        public=True, transport=fake_post,
    )
    assert json.loads(body) == {"task_id": "t-1"}
    assert calls["url"] == "https://bel.example.org" + RECEIVE_ENDPOINT
    assert calls["headers"]["bel-commons-public"] == "true"
    assert calls["headers"]["authorization"].startswith("Basic ")
    sent = json.loads(calls["payload"])
    assert sent == to_nodelink(kg_graph)


def test_to_web_requires_credentials(kg_graph, monkeypatch):
    from pybel_ray.export.web import to_web

    for var in ("PYBEL_REMOTE_HOST", "PYBEL_REMOTE_USER", "PYBEL_REMOTE_PASSWORD"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError):
        to_web(kg_graph, user="u", password="p", transport=lambda *a: b"")
    with pytest.raises(ValueError):
        to_web(kg_graph, host="https://x", password="p", transport=lambda *a: b"")
    with pytest.raises(ValueError):
        to_web(kg_graph, host="https://x", user="u", transport=lambda *a: b"")


def test_from_web_roundtrip(kg_graph):
    from pybel_ray.export.nodelink import to_nodelink
    from pybel_ray.export.web import GET_ENDPOINT, from_web

    doc = to_nodelink(kg_graph)
    seen = {}

    def fake_get(url):
        seen["url"] = url
        return json.dumps(doc).encode("utf8")

    g = from_web(17, host="https://bel.example.org", transport=fake_get)
    assert seen["url"] == "https://bel.example.org" + GET_ENDPOINT.format(17)
    assert g.node_count() == kg_graph.node_count()
    assert g.edge_count() == kg_graph.edge_count()


def test_registry_has_neo4j_bulk(ray_session):
    from pybel_ray.io_registry import registered_formats

    assert "neo4j_bulk" in registered_formats()["exporters"]
