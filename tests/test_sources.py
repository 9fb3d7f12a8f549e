"""Format readers: parquet / JSONL / CSV ingestion normalizes to one
canonical schema; documents round-trip byte-identical across formats."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def doc_files(tmp_path_factory):
    base = tmp_path_factory.mktemp("sources")
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    rows = t.to_pylist()[:50]
    pq.write_table(pa.Table.from_pylist(rows), str(base / "docs.parquet"))
    with open(base / "docs.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    import csv

    with open(base / "docs.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return base, rows


def test_load_documents_all_formats(ray_session, doc_files):
    from pybel_ray.sources import load_documents

    base, rows = doc_files
    expected = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in rows
    )
    for fmt, name in [("parquet", "docs.parquet"), ("jsonl", "docs.jsonl"),
                      ("csv", "docs.csv")]:
        got = sorted(
            (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
            for r in load_documents(str(base / name), format=fmt).take_all()
        )
        assert got == expected, fmt


def test_load_table_column_pruning_and_cast(ray_session, doc_files):
    from pybel_ray.sources import load_table

    base, rows = doc_files
    ds = load_table(
        str(base / "docs.parquet"), columns=["doc_id", "n_chars"],
        dtypes={"n_chars": pa.int32()},
    )
    schema = ds.schema()
    base_schema = getattr(schema, "base_schema", None) or schema
    assert base_schema.names == ["doc_id", "n_chars"]
    assert base_schema.field("n_chars").type == pa.int32()
    assert ds.count() == len(rows)


def test_load_table_missing_column_raises(ray_session, doc_files):
    from pybel_ray.sources import load_table

    base, _rows = doc_files
    with pytest.raises(Exception):
        load_table(
            str(base / "docs.parquet"), columns=["nope"],
        ).take_all()


def test_load_pages_jsonl_binary_cast(ray_session, tmp_path):
    from pybel_ray.pages import generate_pages_table
    from pybel_ray.sources import load_pages

    pages = generate_pages_table(20)
    path = tmp_path / "pages.jsonl"
    with open(path, "w") as f:
        for r in pages.to_pylist():
            f.write(json.dumps({
                "url": r["url"],
                "warc_ts": r["warc_ts"].isoformat(),
                "html": r["html"].decode("utf-8"),
                "text": r["text"],
                "lang": r["lang"],
            }) + "\n")
    out = load_pages(str(path), format="jsonl").take_all()
    orig = {r["url"]: r for r in pages.to_pylist()}
    assert len(out) == 20
    for r in out:
        assert isinstance(r["html"], bytes)
        assert r["html"] == orig[r["url"]]["html"]
        assert r["text"] == orig[r["url"]]["text"]


# ---------------------------------------------------------------------------
# WARC/WET records
# ---------------------------------------------------------------------------


def _wet_rows():
    return [
        ("https://a.example/x", "2024-01-01T00:00:00Z", "hello world\nline two"),
        # payload containing header-lookalike lines: Content-Length walking
        # must not resync on them
        ("https://a.example/y", "2024-01-02T00:00:00Z",
         "WARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record"),
        ("https://a.example/z", "2024-01-03T00:00:00Z", ""),
    ]


def test_wet_roundtrip_plain_and_gz(ray_session, tmp_path):
    from pybel_ray.sources import load_wet, write_wet_file

    for name in ("f.warc.wet", "f.warc.wet.gz"):
        p = str(tmp_path / name)
        write_wet_file(_wet_rows(), p)
        out = load_wet(p).to_pandas().sort_values("url").reset_index(drop=True)
        assert list(out["url"]) == [u for u, _, _ in _wet_rows()]
        assert list(out["text"]) == [t for _, _, t in _wet_rows()]
        assert list(out["warc_ts"]) == [d for _, d, d2 in
                                        [(u, d, d) for u, d, _ in _wet_rows()]]


def test_wet_skips_warcinfo(ray_session, tmp_path):
    from pybel_ray.sources import load_wet

    p = str(tmp_path / "info.warc.wet")
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"meta\r\n\r\n")
    conv = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: https://q.example\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\n"
            b"ok\r\n\r\n")
    with open(p, "wb") as f:
        f.write(info + conv)
    out = load_wet(p).to_pandas()
    assert len(out) == 1
    assert out["url"][0] == "https://q.example"
    assert out["text"][0] == "ok"


def test_wet_shards_distributed_sink(ray_session, tmp_path):
    import os

    import ray

    from pybel_ray.sources import load_wet, to_wet_shards

    rows = [
        {"url": "https://s.example/%d" % i,
         "warc_ts": "2024-01-01T00:00:00Z",
         "text": "doc %d body" % i}
        for i in range(40)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out_dir = str(tmp_path / "shards")
    manifest = to_wet_shards(ds, out_dir).to_pandas()
    assert int(manifest["n_records"].sum()) == 40
    assert len(os.listdir(out_dir)) == len(manifest)
    back = load_wet(out_dir).to_pandas().sort_values("url").reset_index(drop=True)
    want = sorted(r["url"] for r in rows)
    assert list(back["url"]) == want
    got_text = dict(zip(back["url"], back["text"]))
    for r in rows:
        assert got_text[r["url"]] == r["text"]


def test_wet_shards_same_first_url_no_overwrite(ray_session, tmp_path):
    import os

    import ray

    from pybel_ray.sources import to_wet_shards

    # two blocks that START with the same url: shard names must differ
    t1 = pa.Table.from_pylist(
        [{"url": "https://dup.example/0", "warc_ts": "t", "text": "a"},
         {"url": "https://dup.example/1", "warc_ts": "t", "text": "b"}],
    )
    t2 = pa.Table.from_pylist(
        [{"url": "https://dup.example/0", "warc_ts": "t", "text": "c"},
         {"url": "https://dup.example/2", "warc_ts": "t", "text": "d"}],
    )
    ds = ray.data.from_arrow([t1, t2])
    out_dir = str(tmp_path / "dup")
    manifest = to_wet_shards(ds, out_dir).to_pandas()
    assert int(manifest["n_records"].sum()) == 4
    assert len(set(manifest["shard"])) == 2
    assert len(os.listdir(out_dir)) == 2


def test_write_clustered_prunes_and_reads_exact(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from pybel_ray.sources import pruned_shards, read_clustered, write_clustered

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, 5000)
    vals[::97] = np.nan  # nulls are excluded from the clustered copy
    t = pa.table({
        "id": np.arange(5000, dtype="int64"),
        "v": pa.array([None if np.isnan(x) else float(x) for x in vals],
                      pa.float64()),
    })
    out = str(tmp_path / "clustered")
    manifest = write_clustered(
        ray.data.from_arrow(t).repartition(16), out, "v",
    )
    assert len(manifest) > 1  # multiple shards -> pruning is meaningful
    files, total = pruned_shards(out, 10.0, 20.0)
    assert total == len(manifest)
    assert 0 < len(files) < total  # the zone map actually pruned I/O

    got = read_clustered(out, 10.0, 20.0).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    df = t.to_pandas()
    ref = df[(df["v"] >= 10.0) & (df["v"] <= 20.0)].sort_values(
        "id",
    ).reset_index(drop=True)
    assert got["id"].tolist() == ref["id"].tolist()
    assert np.allclose(got["v"], ref["v"])


def test_read_clustered_empty_range_keeps_schema(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from pybel_ray.sources import read_clustered, write_clustered

    t = pa.table({
        "id": np.arange(10, dtype="int64"),
        "v": np.linspace(0, 9, 10),
    })
    out = str(tmp_path / "clustered")
    write_clustered(ray.data.from_arrow(t), out, "v")
    ds = read_clustered(out, 1000.0, 2000.0)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"id", "v"}


def test_write_clustered_rewrite_stays_consistent(ray_session, tmp_path):
    # sort block boundaries are not deterministic across runs, so shard
    # NAMES may differ between rewrites; the contract is that the
    # atomically-swapped manifest always describes a complete,
    # non-overlapping current set (stale shards are simply unlisted)
    import json

    import numpy as np
    import ray.data

    from pybel_ray.sources import read_clustered, write_clustered

    t = pa.table({
        "id": np.arange(100, dtype="int64"),
        "v": np.linspace(0, 99, 100),
    })
    out = str(tmp_path / "clustered")
    write_clustered(ray.data.from_arrow(t).repartition(4), out, "v")
    m2 = write_clustered(ray.data.from_arrow(t).repartition(4), out, "v")
    with open(out + "/manifest.json") as f:
        listed = {s["file"] for s in json.load(f)["shards"]}
    assert listed == {s["file"] for s in m2}
    assert sum(s["n"] for s in m2) == 100
    got = read_clustered(out, 0.0, 99.0).to_pandas()
    assert sorted(got["id"].tolist()) == list(range(100))


def test_write_clustered_identical_blocks_no_data_loss(ray_session, tmp_path):
    # byte-identical blocks share one file listed once per block; a
    # duplicated path is read once per listing, so no rows are lost
    import ray.data

    from pybel_ray.sources import read_clustered, write_clustered

    t = pa.table({"v": pa.array([5.0] * 8, pa.float64())})
    out = str(tmp_path / "clustered")
    manifest = write_clustered(
        ray.data.from_arrow(t).repartition(2), out, "v",
    )
    assert sum(s["n"] for s in manifest) == 8
    got = read_clustered(out, 5.0, 5.0)
    assert got.count() == 8


def test_write_clustered_string_keys_exact(ray_session, tmp_path):
    import ray.data

    from pybel_ray.sources import pruned_shards, read_clustered, write_clustered

    days = ["2026-08-%02d" % (d + 1) for d in range(28)] * 20
    t = pa.table({
        "id": pa.array(range(len(days)), pa.int64()),
        "day": pa.array(days, pa.string()),
    })
    out = str(tmp_path / "clustered")
    write_clustered(ray.data.from_arrow(t).repartition(8), out, "day")
    files, total = pruned_shards(out, "2026-08-05", "2026-08-07")
    assert 0 < len(files) < total
    got = read_clustered(out, "2026-08-05", "2026-08-07").to_pandas()
    ref = t.to_pandas()
    ref = ref[(ref["day"] >= "2026-08-05") & (ref["day"] <= "2026-08-07")]
    assert sorted(got["id"]) == sorted(ref["id"])


def test_write_clustered_rejects_unsupported_key_type(ray_session, tmp_path):
    import ray.data

    from pybel_ray.sources import write_clustered

    t = pa.table({"ts": pa.array([1, 2], pa.timestamp("us"))})
    with pytest.raises(ValueError):
        write_clustered(
            ray.data.from_arrow(t), str(tmp_path / "c"), "ts",
        )


def test_zordered_box_read_prunes_and_matches_brute(ray_session, tmp_path):
    """Z-order sink: a box query over either/both columns equals the
    brute filter, and the zone-box pruning actually skips shards."""
    import json
    import os

    import ray

    from pybel_ray.sources import read_zordered, write_zordered

    rows = [{"id": 100 * x + y, "x": float(x), "y": y}
            for x in range(40) for y in range(40)]
    rows.append({"id": -1, "x": None, "y": 3})   # null key excluded
    rows.append({"id": -2, "x": 1.0, "y": None})
    ds = ray.data.from_items(rows, override_num_blocks=16)
    out = str(tmp_path / "z")
    manifest = write_zordered(ds, out, "x", "y")
    assert sum(s["n"] for s in manifest) == 1600  # nulls dropped

    got = sorted(r["id"] for r in
                 read_zordered(out, 5.0, 9.0, 10, 14).take_all())
    expect = sorted(100 * x + y for x in range(5, 10)
                    for y in range(10, 15))
    assert got == expect

    m = json.load(open(os.path.join(out, "manifest.json")))
    overlapping = [
        s for s in m["shards"]
        if s["amax"] >= 5.0 and s["amin"] <= 9.0
        and s["bmax"] >= 10 and s["bmin"] <= 14
    ]
    assert len(m["shards"]) > 4
    # the whole point: a small box touches a minority of shards
    assert len(overlapping) < len(m["shards"]) / 2

    # one-sided predicate still prunes (full range on y)
    got_x = sorted(r["id"] for r in
                   read_zordered(out, 0.0, 3.0, 0, 39).take_all())
    assert got_x == sorted(100 * x + y for x in range(0, 4)
                           for y in range(40))


def test_zordered_rejects_non_numeric(ray_session, tmp_path):
    import pytest as _pytest
    import ray

    from pybel_ray.sources import write_zordered

    ds = ray.data.from_items([{"a": "s", "b": 1}])
    with _pytest.raises(ValueError):
        write_zordered(ds, str(tmp_path / "z2"), "a", "b")


def test_clustered_bloom_point_lookup(ray_session, tmp_path):
    """Bloom side-filter: equality lookups on a NON-cluster column open
    only hitting shards; results equal the brute filter; the cluster
    column still answers point reads through the zone map."""
    import json
    import os

    import ray

    from pybel_ray.sources import read_clustered_point, write_clustered

    # cluster by v; tag is deliberately uncorrelated with v so a tag
    # lives in few shards only via the Bloom filter, never the zone map
    rows = [{"v": i, "tag": "t%d" % (i % 97)} for i in range(4000)]
    ds = ray.data.from_items(rows, override_num_blocks=12)
    out = str(tmp_path / "c")
    write_clustered(ds, out, "v", bloom_cols=["tag"])

    got = sorted(r["v"] for r in
                 read_clustered_point(out, "tag", "t13").take_all())
    assert got == [i for i in range(4000) if i % 97 == 13]

    # cluster-column point read: zone-map pruning path
    one = read_clustered_point(out, "v", 1234).take_all()
    assert [r["v"] for r in one] == [1234]

    m = json.load(open(os.path.join(out, "manifest.json")))
    assert m["bloom_cols"] == ["tag"]
    # a value that never occurs: bloom should prune every shard (with
    # 2^16 bits and ~97 distinct tags/shard, fp is ~0)
    miss = read_clustered_point(out, "tag", "absent-tag").count()
    assert miss == 0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_clustered_point(out, "nope", 1)


def test_compact_clustered_preserves_reads_and_pruning(ray_session, tmp_path):
    import os

    import ray

    from pybel_ray.sources import (
        compact_clustered, read_clustered, read_clustered_point,
        write_clustered,
    )

    tbl = pa.table({
        "k": pa.array(list(range(1000)), pa.int64()),
        "u": pa.array(["u%03d" % (i % 50) for i in range(1000)]),
    })
    out = str(tmp_path / "clustered")
    ds = ray.data.from_arrow(tbl).repartition(16)  # many tiny shards
    write_clustered(ds, out, "k", bloom_cols=["u"])
    import json

    before = json.load(open(os.path.join(out, "manifest.json")))
    assert len(before["shards"]) >= 8

    after = compact_clustered(out, target_bytes=64 << 10)
    assert len(after) < len(before["shards"])
    # full-range read reproduces every row
    got = read_clustered(out, lo=0, hi=999).to_pandas().sort_values("k")
    assert list(got["k"]) == list(range(1000))
    # range pruning still opens a strict subset on a narrow predicate
    nar = read_clustered(out, lo=10, hi=20).to_pandas()
    assert sorted(nar["k"]) == list(range(10, 21))
    # bloom point lookup still finds every row of a key
    pt = read_clustered_point(out, "u", "u007").to_pandas()
    assert sorted(pt["k"]) == [i for i in range(1000) if i % 50 == 7]
    # replaced files are gone; manifest files all exist
    files = {f for f in os.listdir(out) if f.endswith(".parquet")}
    assert files == {s["file"] for s in after}


def test_compact_clustered_noop_when_already_large(ray_session, tmp_path):
    import json
    import os

    import ray

    from pybel_ray.sources import compact_clustered, write_clustered

    tbl = pa.table({"k": pa.array(list(range(100)), pa.int64())})
    out = str(tmp_path / "c2")
    write_clustered(ray.data.from_arrow(tbl), out, "k")
    before = json.load(open(os.path.join(out, "manifest.json")))["shards"]
    after = compact_clustered(out, target_bytes=1)  # every group singleton
    assert after == before
