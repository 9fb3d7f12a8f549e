"""Guard: the degree-based graph ops never collect the edge table
(VERDICT r1 #1 done-criterion) — take_all is spied during the op build and
execution; only narrow victim/result collection helpers may run, and those
use iter_batches on single columns, not take_all."""

import pytest


@pytest.fixture()
def kg_graph(ray_session):
    from pybel_ray.pages import default_registry, pages_dataset
    from pybel_ray.pipeline import compile_pages

    kg = compile_pages(pages_dataset(6, seed=9, block_pages=3),
                       default_registry(), batch_size=4)
    return kg.graph().materialize()


@pytest.mark.parametrize("op_name", [
    "remove_isolated_nodes",
    "remove_isolated_list_abundances",
    "prune_protein_rna_origins",
])
def test_deletion_ops_never_take_all(kg_graph, op_name):
    import ray.data

    from pybel_ray.struct.pipeline_protocol import get_transformation

    calls = []
    orig = ray.data.Dataset.take_all

    def spy(self, *a, **k):
        calls.append(op_name)
        return orig(self, *a, **k)

    ray.data.Dataset.take_all = spy
    try:
        out = get_transformation(op_name)(kg_graph)
        n_nodes = out.nodes.count()
        n_edges = out.edges.count()
        assert not calls, "{} called take_all on the driver".format(op_name)
    finally:
        ray.data.Dataset.take_all = orig
    assert n_nodes > 0
    assert n_edges > 0


def test_corpus_side_ops_never_take_all(ray_session):
    """The corpus side of the hygiene / sampling / window family must
    never collect rows: only the documented bounded collections may run
    (decontam's benchmark gram set streams via iter_batches; the prefix
    scan's per-block partials are one row per block — take_all is
    allowed there but ONLY on the partials table, which this test spies
    by row width)."""
    import pyarrow as pa
    import ray.data

    from pybel_ray.ops.decontam import flag_contamination
    from pybel_ray.ops.lines import filter_lines
    from pybel_ray.ops.pii import add_pii_stats, redact_pii
    from pybel_ray.ops.sampling import hash_sample, weighted_sample
    from pybel_ray.ops.window import asof_join, lag_by

    docs = ray.data.from_arrow(pa.Table.from_pylist([
        {"doc_id": i, "source": "s{}".format(i % 2),
         "text": "alpha beta gamma delta line {}".format(i)}
        for i in range(50)
    ]))
    bench = ray.data.from_arrow(pa.Table.from_pylist([
        {"doc_id": 0, "text": "a b c d e f g h"},
    ]))
    events = ray.data.from_arrow(pa.Table.from_pylist([
        {"k": i % 3, "ts": i, "v": float(i)} for i in range(60)
    ]))

    calls = []
    orig = ray.data.Dataset.take_all

    def spy(self, *a, **k):
        calls.append(True)
        return orig(self, *a, **k)

    ray.data.Dataset.take_all = spy
    try:
        assert add_pii_stats(docs).count() == 50
        assert redact_pii(docs).count() == 50
        assert filter_lines(docs, min_words=2).count() == 50
        assert flag_contamination(docs, bench, n=8).count() == 50
        assert hash_sample(docs, 0.5).count() > 0
        assert weighted_sample(docs, {"s0": 1.0}, strata_col="source").count() > 0
        assert lag_by(events, "k", ["ts"], "v").count() == 60
        assert asof_join(
            events, events, key="k", left_on="ts", right_on="ts",
            take={"pv": "v"}, inequality=">",
        ).count() == 60
        assert not calls, "corpus-side op called take_all on the driver"
    finally:
        ray.data.Dataset.take_all = orig


def test_graph_from_edges_distributed_branch(kg_graph, ray_session, monkeypatch):
    """Forcing the semi-join branch of _graph_from_edges (budget=0) must
    induce the same node set as the broadcast branch."""
    from pybel_ray.struct import induction
    from pybel_ray.struct.filters import filter_edges

    causal = filter_edges(kg_graph.edges, "is_causal_relation").materialize()
    small = induction._graph_from_edges(kg_graph, causal)
    expected = sorted(r["md5"] for r in small.nodes.take_all())

    monkeypatch.setattr(induction, "_BROADCAST_EDGE_BUDGET", 0)
    big = induction._graph_from_edges(kg_graph, causal)
    got = sorted(r["md5"] for r in big.nodes.take_all())
    assert got == expected
    assert len(got) > 0


def test_remove_isolated_nodes_semantics(kg_graph, ray_session):
    """Distributed op == the obvious driver-side computation."""
    from pybel_ray.struct.pipeline_protocol import get_transformation

    endpoint_ids = set()
    for r in kg_graph.edges.select_columns(["src_md5", "dst_md5"]).take_all():
        endpoint_ids.add(r["src_md5"])
        endpoint_ids.add(r["dst_md5"])
    expected = {
        r["md5"] for r in kg_graph.nodes.take_all() if r["md5"] in endpoint_ids
    }
    out = get_transformation("remove_isolated_nodes")(kg_graph)
    got = {r["md5"] for r in out.nodes.take_all()}
    assert got == expected
