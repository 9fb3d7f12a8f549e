"""End-to-end Ray pipeline tests: extraction invariant, P/R vs reference,
checkpoint/resume."""

import glob
import json
import os

import pyarrow as pa
import pytest

from pybel_ray.pages import (
    default_registry,
    generate_pages_table,
    synthetic_belns_texts,
)
from pybel_ray.stages.extract import extract_text_from_html

N_PAGES = 24
SEED = 7


@pytest.fixture(scope="module")
def pages_table():
    return generate_pages_table(N_PAGES, seed=SEED)


def test_extraction_byte_identical(pages_table):
    """extract(html) == text for every row (the per-url invariant)."""
    # regenerate with no nulls to know the true text
    full = generate_pages_table(N_PAGES, seed=SEED, null_text_fraction=0.0)
    for row, truth in zip(pages_table.to_pylist(), full.to_pylist()):
        assert extract_text_from_html(row["html"]) == truth["text"]
        if row["text"] is not None:
            assert row["text"] == truth["text"]


@pytest.fixture(scope="module")
def reference_summaries():
    """Compile every positive page with the READ-ONLY reference compiler."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import tempfile

    from golden_harness import compile_reference, graph_summary

    url_map = {}
    with tempfile.TemporaryDirectory() as tmp:
        for i, (url, text) in enumerate(synthetic_belns_texts().items()):
            path = os.path.join(tmp, "res{}.belns".format(i))
            with open(path, "w") as f:
                f.write(text)
            url_map[url] = path

        full = generate_pages_table(N_PAGES, seed=SEED, null_text_fraction=0.0)
        out = {}
        for row in full.to_pylist():
            text = row["text"]
            if "SET DOCUMENT" not in text:
                continue  # negative page
            graph = compile_reference(text, url_map=url_map)
            out[row["url"]] = graph_summary(graph)
        return out


def test_pipeline_triples_match_reference(ray_session, pages_table, reference_summaries):
    """Engine triples over the synthetic corpus == reference triples (P=R=1)."""
    import ray.data

    from pybel_ray.pipeline import compile_pages

    kg = compile_pages(
        ray.data.from_arrow(pages_table),
        default_registry(),
        concurrency=(1, 2),
        batch_size=8,
    )

    engine_triples = {
        (r["h"], r["r"], r["t"]) for r in kg.triples().take_all()
    }
    reference_triples = set()
    for summary in reference_summaries.values():
        reference_triples.update(tuple(t) for t in summary["triples"])

    missing = reference_triples - engine_triples
    extra = engine_triples - reference_triples
    assert not missing, "missing {} triples, e.g. {}".format(
        len(missing), sorted(missing)[:5],
    )
    assert not extra, "extra {} triples, e.g. {}".format(len(extra), sorted(extra)[:5])

    # node and edge counts must also match the union of reference graphs
    reference_nodes = set()
    for summary in reference_summaries.values():
        reference_nodes.update(summary["nodes"])
    engine_nodes = {r["bel"] for r in kg.nodes().take_all()}
    assert engine_nodes == reference_nodes

    reference_edge_keys = set()
    for summary in reference_summaries.values():
        for e in summary["edges"]:
            reference_edge_keys.add(json.dumps([
                e["src"], e["dst"], e["relation"], e.get("evidence"),
                e.get("citation"),
            ], sort_keys=True))
    engine_edge_keys = set()
    for r in kg.edges().take_all():
        citation = (
            {"db": r["citation_db"], "db_id": r["citation_id"]}
            if r["citation_db"] else None
        )
        engine_edge_keys.add(json.dumps([
            r["src_bel"], r["dst_bel"], r["relation"], r["evidence"], citation,
        ], sort_keys=True))
    assert engine_edge_keys == reference_edge_keys


def test_checkpoint_resume(ray_session, tmp_path, pages_table):
    import ray.data

    from pybel_ray.pipeline import CheckpointedCompile

    # write input as two shards
    files = []
    half = pages_table.num_rows // 2
    for i, tbl in enumerate([pages_table.slice(0, half), pages_table.slice(half)]):
        path = str(tmp_path / "pages_{}.parquet".format(i))
        import pyarrow.parquet as pq

        pq.write_table(tbl, path)
        files.append(path)

    out_dir = str(tmp_path / "ckpt")
    cc = CheckpointedCompile(out_dir, default_registry(), concurrency=(1, 2))
    kg = cc.run(files)
    total = kg.triples().count()
    assert total > 0

    manifest = cc.completed_shards()
    assert sorted(manifest) == [0, 1]
    assert all(m["rows"] > 0 for m in manifest.values())

    # resume: drop shard 1 from the manifest and its output; rerun completes it
    entries = [m for sid, m in manifest.items() if sid == 0]
    with open(cc.manifest_path, "w") as f:
        for m in entries:
            f.write(json.dumps(m) + "\n")
    import shutil

    shutil.rmtree(os.path.join(out_dir, "events", "shard=1"))
    before = set(glob.glob(os.path.join(out_dir, "events", "shard=0", "*")))
    kg2 = CheckpointedCompile(out_dir, default_registry(), concurrency=(1, 2)).run(files)
    after = set(glob.glob(os.path.join(out_dir, "events", "shard=0", "*")))
    assert before == after  # shard 0 untouched (skipped)
    assert kg2.triples().count() == total

    # crashed-attempt resume: shard 1 absent from the manifest but its dir
    # holds a stale part from a differently-blocked partial run — the
    # re-run must clear it, not read duplicated events
    with open(cc.manifest_path, "w") as f:
        for m in entries:
            f.write(json.dumps(m) + "\n")
    stale = os.path.join(out_dir, "events", "shard=1", "part-deadbeef.parquet")
    existing = glob.glob(os.path.join(out_dir, "events", "shard=1", "*.parquet"))
    shutil.copy(existing[0], stale)
    kg3 = CheckpointedCompile(out_dir, default_registry(), concurrency=(1, 2)).run(files)
    assert not os.path.exists(stale)
    assert kg3.triples().count() == total
    assert kg3.statement_count() == kg.statement_count()


def test_events_dir_parquet_boundary(ray_session, tmp_path, pages_table):
    """compile_pages(events_dir=...) yields identical views to in-memory."""
    import ray.data

    from pybel_ray.pipeline import compile_pages

    mem = compile_pages(
        ray.data.from_arrow(pages_table), default_registry(),
        concurrency=(1, 2), batch_size=8,
    )
    pq = compile_pages(
        ray.data.from_arrow(pages_table), default_registry(),
        concurrency=(1, 2), batch_size=8,
        events_dir=str(tmp_path / "events"),
    )
    assert pq.events_path is not None
    mem_triples = [(r["h"], r["r"], r["t"]) for r in mem.triples().take_all()]
    pq_triples = [(r["h"], r["r"], r["t"]) for r in pq.triples().take_all()]
    assert mem_triples == pq_triples  # both globally sorted
    assert {r["md5"] for r in pq.nodes().take_all()} == \
        {r["md5"] for r in mem.nodes().take_all()}
    assert {r["edge_md5"] for r in pq.edges().take_all()} == \
        {r["edge_md5"] for r in mem.edges().take_all()}
    assert pq.docs().count() == mem.docs().count()
    assert pq.errors().count() == mem.errors().count()


def test_term_cache_scope_isolation(ray_session):
    """The cross-document term cache must not leak across namespace scopes.

    Two pages use the SAME statement text; page A defines HGNC so the terms
    validate, page B defines a different (empty) namespace set so the same
    text must produce error rows, not cached nodes.
    """
    import pyarrow as pa
    import ray.data

    from pybel_ray.pipeline import compile_pages
    from pybel_ray.resources import ResourceRegistry

    reg = ResourceRegistry()
    reg.add_namespace_table(
        "synthetic://ns/hgnc.belns", [("AKT1", "391", "GRP"), ("EGFR", "3236", "GRP")],
    )
    reg.add_namespace_table("synthetic://ns/other.belns", [("ZZZ9", "1", "GRP")])
    header = (
        'SET DOCUMENT Name = "{name}"\n'
        'SET DOCUMENT Version = "1.0.0"\n'
        'SET DOCUMENT Description = "d"\n'
        'SET DOCUMENT Authors = "a"\n'
        'SET DOCUMENT ContactInfo = "c"\n'
        '{define}\n'
        'SET Citation = {{"PubMed", "1"}}\n'
        'SET Evidence = "ev"\n'
    )
    stmt = "p(HGNC:AKT1) -> p(HGNC:EGFR)"
    page_a = header.format(
        name="A", define='DEFINE NAMESPACE HGNC AS URL "synthetic://ns/hgnc.belns"',
    ) + stmt
    page_b = header.format(
        name="B", define='DEFINE NAMESPACE OTHER AS URL "synthetic://ns/other.belns"',
    ) + stmt
    pages = pa.table({
        "url": ["https://a", "https://b"],
        "warc_ts": [0, 0],
        "html": [None, None],
        "text": [page_a, page_b],
        "lang": ["en", "en"],
    })
    # ONE actor so both pages share the same term cache
    kg = compile_pages(
        ray.data.from_arrow(pages), reg, concurrency=1, batch_size=8,
    )
    edges = [r for r in kg.edges_raw().take_all()]
    assert {r["url"] for r in edges} == {"https://a"}
    errors = kg.errors().take_all()
    assert any(
        r["url"] == "https://b" and r["error_class"] == "UndefinedNamespaceWarning"
        for r in errors
    ), errors


def test_checkpoint_subtree_filesystem_parity(ray_session, tmp_path, pages_table):
    """The object-store sink branch (pyarrow.fs, write-then-manifest-commit)
    produces byte-identical tables to the local POSIX branch, and its
    resume semantics (skip committed shards, clear + re-run uncommitted
    ones) match — exercised via SubTreeFileSystem over a local dir."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    from pybel_ray.pipeline import CheckpointedCompile

    files = []
    half = pages_table.num_rows // 2
    for i, tbl in enumerate(
        [pages_table.slice(0, half), pages_table.slice(half)],
    ):
        path = str(tmp_path / "fs_pages_{}.parquet".format(i))
        pq.write_table(tbl, path)
        files.append(path)

    kg_local = CheckpointedCompile(
        str(tmp_path / "local_ckpt"), default_registry(), concurrency=(1, 2),
    ).run(files)
    want = kg_local.triples().to_pandas()
    assert len(want) > 0

    base = tmp_path / "bucket"
    base.mkdir()
    subfs = pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())
    cc = CheckpointedCompile(
        "ckpt", default_registry(), concurrency=(1, 2), filesystem=subfs,
    )
    kg_fs = cc.run(files)
    got = kg_fs.triples().to_pandas()
    # both globally sorted -> positional equality
    assert got.equals(want)

    # manifest commit objects: one JSON per shard, no .jsonl, no .tmp litter
    done = cc.completed_shards()
    assert sorted(done) == [0, 1]
    assert all(m["rows"] > 0 for m in done.values())
    assert (base / "ckpt" / "manifest" / "shard=0.json").exists()
    assert not (base / "ckpt" / "manifest.jsonl").exists()
    litter = [p for p in (base / "ckpt").rglob("*.tmp")]
    assert litter == []

    # resume: shard 1 uncommitted (manifest object gone) + a stale part from
    # a differently-blocked crashed attempt -> cleared and recompiled;
    # shard 0 (committed) untouched
    subfs.delete_file("ckpt/manifest/shard=1.json")
    shard1 = base / "ckpt" / "events" / "shard=1"
    parts = sorted(shard1.glob("*.parquet"))
    stale = shard1 / "part-deadbeef.parquet"
    import shutil

    shutil.copy(parts[0], stale)
    shard0_before = sorted(
        (p.name, p.stat().st_mtime_ns)
        for p in (base / "ckpt" / "events" / "shard=0").glob("*.parquet")
    )
    kg2 = CheckpointedCompile(
        "ckpt", default_registry(), concurrency=(1, 2), filesystem=subfs,
    ).run(files)
    shard0_after = sorted(
        (p.name, p.stat().st_mtime_ns)
        for p in (base / "ckpt" / "events" / "shard=0").glob("*.parquet")
    )
    assert shard0_before == shard0_after  # committed shard skipped
    assert not stale.exists()
    assert kg2.triples().to_pandas().equals(want)
    assert kg2.statement_count() == kg_local.statement_count()


def test_compile_pages_filesystem_roundtrip(ray_session, tmp_path, pages_table):
    """compile_pages(events_dir=..., filesystem=SubTreeFileSystem) reads its
    views back through the SAME filesystem (regression: the filesystem was
    forwarded to the write side but not into KGTables, so every read-back
    raised FileNotFoundError on the relative path)."""
    import ray.data
    from pyarrow import fs as pafs

    from pybel_ray.pipeline import compile_pages

    mem = compile_pages(
        ray.data.from_arrow(pages_table), default_registry(),
        concurrency=(1, 2), batch_size=8,
    )
    base = tmp_path / "bucket"
    base.mkdir()
    subfs = pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())
    kg = compile_pages(
        ray.data.from_arrow(pages_table), default_registry(),
        concurrency=(1, 2), batch_size=8,
        events_dir="ev", filesystem=subfs,
    )
    assert kg.filesystem is subfs
    mem_triples = [(r["h"], r["r"], r["t"]) for r in mem.triples().take_all()]
    fs_triples = [(r["h"], r["r"], r["t"]) for r in kg.triples().take_all()]
    assert fs_triples == mem_triples  # both globally sorted
    assert kg.statement_count() == mem.statement_count()
    assert kg.errors().count() == mem.errors().count()
    assert (base / "ev" / "events").is_dir()


def test_events_pipeline_uri_target(ray_session, tmp_path, pages_table):
    """A file:// URI events_dir resolves to the local branch and compiles."""
    import ray.data

    from pybel_ray.pipeline import events_pipeline

    out = tmp_path / "uri_events"
    manifest = events_pipeline(
        ray.data.from_arrow(pages_table).repartition(2),
        default_registry(),
        events_dir="file://" + str(out),
        concurrency=(1, 2),
    ).take_all()
    assert sum(r["rows"] for r in manifest) > 0
    assert list(out.glob("part-*.parquet"))
    assert not list(out.glob("*.tmp"))
