"""Streaming (sharded JSONL) exports must equal the driver-side documents."""

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


def test_graphdati_jsonl_dir_matches_driver(kg_graph, tmp_path):
    from pybel_ray.export.interchange import to_graphdati, to_graphdati_jsonl_dir

    out = str(tmp_path / "gd")
    to_graphdati_jsonl_dir(kg_graph, out)
    stream = set()
    for p in glob.glob(out + "/part-*.jsonl"):
        with open(p) as f:
            stream.update(line.strip() for line in f if line.strip())
    driver = {json.dumps(n, sort_keys=True) for n in to_graphdati(kg_graph)}
    assert stream == driver
    assert len(stream) > 0


def test_nodelink_jsonl_dir_matches_driver(kg_graph, tmp_path):
    from pybel_ray.export.nodelink import to_nodelink, to_nodelink_jsonl_dir

    out = str(tmp_path / "nl")
    to_nodelink_jsonl_dir(kg_graph, out, metadata={"name": "t"})
    nodes, links = set(), set()
    for p in glob.glob(out + "/nodes/part-*.jsonl"):
        with open(p) as f:
            nodes.update(json.loads(line)["id"] for line in f if line.strip())
    for p in glob.glob(out + "/links/part-*.jsonl"):
        with open(p) as f:
            links.update(json.loads(line)["key"] for line in f if line.strip())
    doc = to_nodelink(kg_graph, metadata={"name": "t"})
    assert nodes == {n["id"] for n in doc["nodes"]}
    assert links == {l["key"] for l in doc["links"]}
    with open(out + "/graph.json") as f:
        assert json.load(f)["graph"]["name"] == "t"


def test_to_html_embeds_graph_and_palette(kg_graph, tmp_path):
    """to_html produces a self-contained artifact embedding the exact
    node-link JSON, the color map, and the true counts (reference
    io/jupyter/visualization.py semantics)."""
    from pybel_ray.export.html_viz import (
        DEFAULT_COLOR_MAP, build_graph_context, to_html, to_html_path,
    )
    from pybel_ray.export.nodelink import to_nodelink

    ctx = build_graph_context(kg_graph)
    doc = to_nodelink(kg_graph)
    assert json.loads(ctx["json"]) == doc
    assert ctx["number_nodes"] == len(doc["nodes"]) > 0
    assert ctx["number_edges"] == len(doc["links"]) > 0
    assert json.loads(ctx["cmap"]) == DEFAULT_COLOR_MAP

    html = to_html(kg_graph)
    assert html.startswith("<!DOCTYPE html>")
    # self-contained: no external scripts, graph + palette inline
    assert "src=" not in html and "http" not in html.split("</title>")[1]
    assert json.dumps(doc, sort_keys=True) in html
    assert DEFAULT_COLOR_MAP["Protein"] in html
    # custom palette overrides
    html2 = to_html(kg_graph, color_map={"Protein": "#123456"})
    assert "#123456" in html2 and DEFAULT_COLOR_MAP["Protein"] not in html2

    p = tmp_path / "g.html"
    to_html_path(kg_graph, str(p))
    assert p.read_text().startswith("<!DOCTYPE html>")


def test_to_jupyter_str(kg_graph):
    from pybel_ray.export.html_viz import to_jupyter_str
    from pybel_ray.export.nodelink import to_nodelink

    js = to_jupyter_str(kg_graph, width=640, height=480)
    assert json.dumps(to_nodelink(kg_graph), sort_keys=True) in js
    assert "640" in js and "480" in js
    assert "pybel-ray-vis" in js
    # the render must close over the created div, never re-query by a
    # positional selector (':last-of-type' matched the wrong div when the
    # host had trailing sibling divs)
    assert ":last-of-type" not in js
    assert "querySelector" not in js


def _adversarial_graph():
    """A graph whose node/edge text contains every _VIS_JS substitution
    token and a '</script>' terminator — the exact payloads that corrupted
    the rendered artifact before the sentinel rewrite."""
    from pybel_ray.export.nodelink import from_nodelink

    nodes = [
        {"id": "a" * 32, "bel": 'p(HGNC:TARGET)', "function": "Protein",
         "concept": {"namespace": "HGNC", "name": "TARGET"}},
        {"id": "b" * 32, "bel": 'p(HGNC:"GRAPH WIDTH HEIGHT CMAP FALLBACK")',
         "function": "Protein",
         "concept": {"namespace": "HGNC",
                     "name": "GRAPH WIDTH HEIGHT CMAP FALLBACK"}},
    ]
    links = [{
        "source": 0, "target": 1, "relation": "increases",
        "evidence": "closing tag </script> inside evidence",
        "citation": {"db": "PubMed", "db_id": "1"},
    }]
    return from_nodelink({"graph": {}, "nodes": nodes, "links": links})


def test_html_viz_substitution_does_not_rewrite_user_data():
    """Regression: sequential .replace on bare tokens rewrote occurrences
    of TARGET/WIDTH/... inside the embedded graph JSON, corrupting node
    names and the generated JS."""
    from pybel_ray.export.html_viz import to_html, to_jupyter_str

    g = _adversarial_graph()
    html = to_html(g, width=777, height=555)
    assert "p(HGNC:TARGET)" in html
    assert "GRAPH WIDTH HEIGHT CMAP FALLBACK" in html
    # no sentinel survives substitution
    assert "__PBR_" not in html
    # the embedded JSON is script-safe: no raw '</' can terminate the tag
    body = html.split("<script", 1)[1]
    assert "</script>" not in body.rsplit("</script>", 1)[0]
    assert "<\\/script>" in html  # the evidence text, escaped

    js = to_jupyter_str(g)
    assert "p(HGNC:TARGET)" in js
    assert "__PBR_" not in js
    assert "</script>" not in js
