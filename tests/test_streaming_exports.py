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
