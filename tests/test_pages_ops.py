"""URL normalization + per-url capture dedup (pages.py crawl hygiene)."""

import datetime

import pytest


def _pages(rows):
    import pyarrow as pa
    import ray.data

    table = pa.Table.from_pylist(rows, schema=pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]))
    chunks = [table.slice(i, 2) for i in range(0, table.num_rows, 2)]
    return ray.data.from_arrow(chunks)


def _row(url, ts, text="t"):
    return {
        "url": url,
        "warc_ts": datetime.datetime(2024, 1, ts, 0, 0, 0),
        "html": b"<html>",
        "text": text,
        "lang": "en",
    }


def test_normalize_urls(ray_session):
    from pybel_ray.pages import normalize_urls

    rows = [
        _row("HTTPS://Example.ORG:443/Path?q=1#frag", 1),
        _row("http://example.org:80/", 1),
        _row("http://example.org/a/b", 1),
        _row("no-scheme-path#frag", 1),
        _row("http://example.org:8080/x", 1),
    ]
    got = [r["url"] for r in normalize_urls(_pages(rows)).take_all()]
    assert got == [
        "https://example.org/Path?q=1",  # host lowercased, path case kept
        "http://example.org",
        "http://example.org/a/b",
        "no-scheme-path",
        "http://example.org:8080/x",  # non-default port kept
    ]


def test_dedup_pages_by_url_keeps_latest(ray_session):
    from pybel_ray.pages import dedup_pages_by_url

    rows = [
        _row("u/a", 1, "old"),
        _row("u/b", 2, "only"),
        _row("u/a", 5, "new"),
        _row("u/c", 3, "single"),
        _row("u/a", 3, "mid"),
    ]
    out = dedup_pages_by_url(_pages(rows)).take_all()
    by_url = {r["url"]: r["text"] for r in out}
    assert len(out) == 3
    assert by_url == {"u/a": "new", "u/b": "only", "u/c": "single"}
    # schema preserved (no helper columns leak)
    assert set(out[0].keys()) == {"url", "warc_ts", "html", "text", "lang"}


def test_dedup_pages_no_dups_passthrough(ray_session):
    from pybel_ray.pages import dedup_pages_by_url

    rows = [_row("u/%d" % i, 1 + i) for i in range(5)]
    out = dedup_pages_by_url(_pages(rows)).take_all()
    assert sorted(r["url"] for r in out) == sorted(r["url"] for r in rows)


def test_dedup_pages_full_shuffle_path(ray_session, monkeypatch):
    import pybel_ray.pages as pages_mod

    rows = [
        _row("u/a", 1, "old"),
        _row("u/a", 5, "new"),
        _row("u/b", 2, "only"),
    ]
    monkeypatch.setattr(pages_mod, "_DUP_URL_BROADCAST_BUDGET", 0)
    out = pages_mod.dedup_pages_by_url(_pages(rows)).take_all()
    assert {r["url"]: r["text"] for r in out} == {"u/a": "new", "u/b": "only"}


def test_compile_pages_dedup_urls_flag(ray_session):
    """Duplicate captures of a url must not double-count statements."""
    import pyarrow as pa
    import ray.data

    from pybel_ray.pages import default_registry, generate_pages_table
    from pybel_ray.pipeline import compile_pages

    table = generate_pages_table(4, seed=3)
    # duplicate every page with an older capture timestamp and junk text
    import pyarrow.compute as pc

    older = table.set_column(
        table.schema.get_field_index("warc_ts"), "warc_ts",
        pc.subtract(table.column("warc_ts"), pa.scalar(86400000000, pa.duration("us"))),
    )
    doubled = pa.concat_tables([table, older])
    ds = ray.data.from_arrow([doubled.slice(i, 2) for i in range(0, doubled.num_rows, 2)])

    reg = default_registry()
    base = compile_pages(ray.data.from_arrow([table]), reg, batch_size=4)
    deduped = compile_pages(ds, reg, dedup_urls=True, batch_size=4)
    assert deduped.docs().count() == base.docs().count()
    assert deduped.triples().count() == base.triples().count()
