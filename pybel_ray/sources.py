"""Input-format readers: load page/document tables from Parquet, JSONL
or CSV into the canonical column layout.

The canonical ingest is Parquet (the north-rule input shape); crawl
dumps also arrive as JSONL (one record per line) and CSV.  These
wrappers normalize on read — column selection/ordering, dtype coercion
— so every downstream operator sees one schema regardless of the wire
format.  They delegate to Ray Data's native readers (streaming,
partitioned, predicate/column pushdown where the format supports it) and
only add a thin vectorized normalization ``map_batches``.

Reference scope: the reference compiles ``.bel`` files and has no bulk
table readers; this covers the engine's Common-Crawl-style ingest
surface (``SURVEY.md §2.1``).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

__all__ = [
    "load_table",
    "load_documents",
    "load_pages",
    "load_wet",
    "write_wet_file",
    "to_wet_shards",
]

_READERS = {"parquet", "jsonl", "csv"}


def load_table(
    path: str,
    format: str = "parquet",
    columns: Optional[Sequence[str]] = None,
    dtypes: Optional[dict] = None,
    override_num_blocks: Optional[int] = None,
):
    """Read ``path`` in the given format and normalize to ``columns``
    (selected and ordered) with ``dtypes`` coercions (column -> pyarrow
    type).  Missing columns raise; extra columns are dropped.
    """
    import ray.data

    if format not in _READERS:
        raise ValueError(
            "unknown format {!r}; expected one of {}".format(
                format, sorted(_READERS)),
        )
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if format == "parquet":
        if columns is not None:
            kwargs["columns"] = list(columns)  # pushdown: prune at the read
        ds = ray.data.read_parquet(path, **kwargs)
    elif format == "jsonl":
        ds = ray.data.read_json(path, **kwargs)
    else:
        ds = ray.data.read_csv(path, **kwargs)

    if columns is None and dtypes is None:
        return ds

    cols = list(columns) if columns is not None else None

    def _norm(t: pa.Table) -> pa.Table:
        use = cols if cols is not None else t.column_names
        missing = [c for c in use if c not in t.column_names]
        if missing:
            raise KeyError("missing columns {} in {}".format(missing, path))
        arrays = []
        for c in use:
            arr = t.column(c)
            if dtypes and c in dtypes and arr.type != dtypes[c]:
                arr = pc.cast(arr, dtypes[c])
            arrays.append(arr)
        return pa.Table.from_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrays],
            names=use,
        )

    return ds.map_batches(_norm, batch_format="pyarrow")


#: canonical documents-table layout
DOCUMENT_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]
DOCUMENT_DTYPES = {
    "doc_id": pa.int64(), "text": pa.string(), "lang": pa.string(),
    "source": pa.string(), "n_chars": pa.int64(),
}

#: canonical page-table layout (the kg ingest shape, see pages.py)
PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
PAGE_DTYPES = {
    "url": pa.string(), "warc_ts": pa.timestamp("us"),
    "html": pa.binary(), "text": pa.string(), "lang": pa.string(),
}


def load_documents(path: str, format: str = "parquet", **kw):
    """Documents table in the canonical (doc_id, text, lang, source,
    n_chars) layout from any supported format."""
    return load_table(
        path, format=format, columns=DOCUMENT_COLUMNS,
        dtypes=DOCUMENT_DTYPES, **kw,
    )


def load_pages(path: str, format: str = "parquet", **kw):
    """Crawl-page table in the canonical (url, warc_ts, html, text, lang)
    layout.  JSONL/CSV carry html as text; it is cast to binary to match
    the Parquet ingest (byte-identical extraction downstream)."""
    return load_table(
        path, format=format, columns=PAGE_COLUMNS, dtypes=PAGE_DTYPES, **kw,
    )


# ---------------------------------------------------------------------------
# WARC/WET (Common-Crawl extracted-text) records
# ---------------------------------------------------------------------------

#: WET "conversion" record header fields we surface as columns
_WET_COLUMNS = ["url", "warc_ts", "text"]


def _parse_wet_bytes(blob: bytes) -> list:
    """Parse one WET file's bytes into (url, warc_ts, text) tuples.

    The public WARC/1.0 layout: ``WARC/1.0\\r\\n`` + header lines +
    blank line + exactly ``Content-Length`` payload bytes + two CRLFs.
    Only ``WARC-Type: conversion`` records become rows (the ``warcinfo``
    preamble is skipped).  Parsing walks by Content-Length — payloads
    may contain anything, including lines that look like headers.
    """
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while pos < n and blob[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header at byte %d" % pos)
        header = blob[pos:head_end].decode("utf8", "replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError("expected WARC/1.x version line at byte %d" % pos)
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        payload = blob[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        if fields.get("warc-type") == "conversion":
            out.append((
                fields.get("warc-target-uri", ""),
                fields.get("warc-date", ""),
                payload.decode("utf8", "replace"),
            ))
    return out


def load_wet(paths, override_num_blocks: Optional[int] = None):
    """Read WET extracted-text archives into a page Dataset
    ``(url, warc_ts, text)``.

    ``paths`` is a file, directory, or list (``.warc.wet`` plain or
    ``.gz`` — multi-member gzip per the published format decompresses
    with one stdlib call).  Files are the parallel unit:
    ``ray.data.read_binary_files`` streams one row per file and a
    ``map_batches`` pass splits records by Content-Length — so a shard
    directory fans out across the cluster with no driver parsing.
    """
    import gzip

    import ray.data

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    files = ray.data.read_binary_files(paths, **kwargs)

    def _split(t: pa.Table) -> pa.Table:
        urls, tss, texts = [], [], []
        for blob in t.column("bytes").to_pylist():
            # sniff the gzip magic rather than trusting the extension —
            # ray.data.read_binary_files already auto-decompresses ``.gz``
            # paths via the pyarrow filesystem layer
            if blob[:2] == b"\x1f\x8b":
                blob = gzip.decompress(blob)
            for url, ts, text in _parse_wet_bytes(blob):
                urls.append(url)
                tss.append(ts)
                texts.append(text)
        return pa.Table.from_arrays(
            [pa.array(urls, pa.string()), pa.array(tss, pa.string()),
             pa.array(texts, pa.string())],
            names=_WET_COLUMNS,
        )

    return files.map_batches(_split, batch_format="pyarrow")


def _wet_record(url: str, ts: str, text: str) -> bytes:
    payload = text.encode("utf8")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: {u}\r\n"
        "WARC-Date: {d}\r\n"
        "Content-Type: text/plain\r\n"
        "Content-Length: {n}\r\n\r\n"
    ).format(u=url, d=ts, n=len(payload)).encode("utf8")
    return head + payload + b"\r\n\r\n"


def write_wet_file(rows, path: str) -> None:
    """Write (url, warc_ts, text) rows as ONE WET file (``.gz`` →
    per-record gzip members, matching the published archives).  Driver-
    side fixture/round-trip helper; the distributed sink is
    :func:`to_wet_shards`."""
    import gzip

    with open(path, "wb") as f:
        for url, ts, text in rows:
            rec = _wet_record(url, ts, text)
            f.write(gzip.compress(rec) if path.endswith(".gz") else rec)


def to_wet_shards(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    compress: bool = True,
):
    """Distributed WET sink: every batch writes its own shard file
    (deterministic md5-of-first-url names + atomic rename → idempotent
    retries, same contract as the events shard writer) and emits one
    manifest row ``(shard, n_records)``.  Returns the manifest Dataset;
    consume it to drive the writes."""
    import gzip
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.wet.gz" if compress else ".warc.wet"

    def _write(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["shard", "n_records"],
            )
        # name by the FULL url sequence (same contract as the other shard
        # writers): two batches that happen to share a first url must not
        # overwrite each other's file
        h = hashlib.md5()  # noqa: S324
        for u in t.column(url_col).to_pylist():
            h.update(str(u).encode("utf8"))
            h.update(b"\x00")
        name = h.hexdigest()[:16] + suffix
        dest = os.path.join(out_dir, name)
        tmp = dest + ".tmp"
        with open(tmp, "wb") as f:
            for url, ts, text in zip(
                t.column(url_col).to_pylist(),
                t.column(ts_col).to_pylist(),
                t.column(text_col).to_pylist(),
            ):
                rec = _wet_record(str(url), str(ts or ""), str(text or ""))
                f.write(gzip.compress(rec) if compress else rec)
        os.replace(tmp, dest)
        return pa.Table.from_arrays(
            [pa.array([name], pa.string()),
             pa.array([t.num_rows], pa.int64())],
            names=["shard", "n_records"],
        )

    return ds.map_batches(_write, batch_format="pyarrow")


def _shard_write(t: pa.Table, out_dir: str) -> str:
    """Shared clustered-sink shard writer: content-digest name (Arrow
    IPC bytes — distinct blocks never collide, byte-identical blocks
    collide harmlessly) + write-to-tmp + atomic rename (idempotent
    retries).  The single contract both :func:`write_clustered` and
    :func:`write_zordered` ride."""
    import hashlib
    import io
    import os

    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    sink = io.BytesIO()
    with ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    name = hashlib.md5(sink.getvalue()).hexdigest()[:16] + ".parquet"  # noqa: S324
    dest = os.path.join(out_dir, name)
    tmp = dest + ".tmp." + str(os.getpid())
    pq.write_table(t, tmp)
    os.replace(tmp, dest)
    return name


def _dump_manifest(out_dir: str, payload: dict) -> None:
    """Atomic manifest.json replace shared by both clustered sinks."""
    import json
    import os

    mpath = os.path.join(out_dir, "manifest.json")
    tmp = mpath + ".tmp." + str(os.getpid())
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, mpath)


def write_clustered(
    ds,
    out_dir: str,
    cluster_col: str,
    bloom_cols: Sequence[str] = (),
    bloom_bits: int = 1 << 16,
):
    """Range-clustered Parquet sink with a zone-map manifest — the
    storage-layout half of predicate pruning: globally sort by
    ``cluster_col`` (ONE exchange), write one Parquet shard per sorted
    block (deterministic md5-of-key-bytes names + atomic rename →
    idempotent retries, same contract as the WET/event shard writers),
    and record ``manifest.json`` with per-shard ``(file, vmin, vmax,
    n)``.  :func:`read_clustered` then opens ONLY the shards whose key
    range overlaps the predicate — at 100 TB this is the difference
    between touching every file and touching ``O(selectivity)`` files.

    Rows with a NULL cluster key are excluded from the clustered copy
    (documented: a range predicate can never match them; keep them in
    the source table).  Cluster keys must be integer, float or string
    (JSON-exact zone maps; ints stay exact — no float round-trip).
    Shards are named by a digest of the FULL block content (Arrow IPC
    bytes), so distinct blocks never collide and byte-identical blocks
    collide harmlessly: the manifest lists the shared file once per
    block and ``read_parquet`` reads duplicated paths once each, which
    reproduces the data exactly.  Returns the manifest as a list of
    dicts.

    ``bloom_cols`` adds a per-shard Bloom SIDE-FILTER for each listed
    column (2 md5-window hashes into ``bloom_bits`` bits, hex-encoded in
    the manifest — the repo-wide ``ops/sketch.md5_window_slots`` hash
    family): :func:`read_clustered_point` then prunes shards for
    EQUALITY lookups on columns the range zone map can't help with
    (e.g. cluster by timestamp, point-look-up by url).  At the default
    2^16 bits a shard with ~4k distinct values false-hits ~1.4% of
    lookups — pruning quality only; correctness rides the residual
    filter.
    """
    import hashlib
    import json
    import os

    ctype = None
    schema = ds.schema()
    base = getattr(schema, "base_schema", None) or schema
    for f in base:
        if f.name == cluster_col:
            ctype = f.type
    if ctype is None or not (
        pa.types.is_integer(ctype) or pa.types.is_floating(ctype)
        or pa.types.is_string(ctype) or pa.types.is_large_string(ctype)
    ):
        raise ValueError(
            "write_clustered: cluster column must be int/float/string, "
            "got %r" % ctype,
        )
    os.makedirs(out_dir, exist_ok=True)

    def _drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(cluster_col)))

    dn = ds.map_batches(_drop_null, batch_format="pyarrow")
    sorted_ds = dn.sort(cluster_col)

    def _write(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()),
             pa.array([], ctype), pa.array([], ctype),
             pa.array([], pa.int64())]
            + [pa.array([], pa.string()) for _ in bloom_cols],
            names=["file", "vmin", "vmax", "n"]
            + ["bloom_{}".format(bc) for bc in bloom_cols],
        )
        if t.num_rows == 0:
            return empty
        col = t.column(cluster_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        name = _shard_write(t, out_dir)
        mm = pc.min_max(col)
        out_cols = [pa.array([name], pa.string()),
                    pa.array([mm["min"].as_py()], ctype),
                    pa.array([mm["max"].as_py()], ctype),
                    pa.array([t.num_rows], pa.int64())]
        out_names = ["file", "vmin", "vmax", "n"]
        for bc in bloom_cols:
            from .ops.sketch import md5_window_slots

            vals = pc.unique(pc.drop_null(
                t.column(bc).combine_chunks(),
            )).to_pylist()
            slots = md5_window_slots(vals, bloom_bits, 2) if vals else None
            bits = 0
            if slots is not None:
                for s in slots.ravel().tolist():
                    bits |= 1 << s
            out_cols.append(pa.array(
                ["{:x}".format(bits)], pa.string(),
            ))
            out_names.append("bloom_{}".format(bc))
        return pa.Table.from_arrays(out_cols, names=out_names)

    manifest = []
    for b in sorted_ds.map_batches(
        _write, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            manifest.append(row)
    manifest.sort(key=lambda r: (r["vmin"], r["file"]))
    _dump_manifest(out_dir, {
        "cluster_col": cluster_col, "shards": manifest,
        "bloom_cols": list(bloom_cols), "bloom_bits": bloom_bits,
    })
    return manifest


def _load_manifest(out_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(out_dir, "manifest.json")) as f:
        return json.load(f)


def _prune(out_dir: str, manifest: dict, lo, hi) -> list:
    import os

    return [
        os.path.join(out_dir, s["file"])
        for s in manifest["shards"]
        if not (s["vmax"] < lo or s["vmin"] > hi)
    ]


def pruned_shards(out_dir: str, lo, hi) -> tuple:
    """Zone-map pruning: (overlapping shard paths, total shard count)."""
    m = _load_manifest(out_dir)
    return _prune(out_dir, m, lo, hi), len(m["shards"])


def read_clustered(out_dir: str, lo, hi):
    """Range read over a :func:`write_clustered` directory: opens ONLY
    the shards whose zone-map range overlaps ``[lo, hi]`` (inclusive,
    SQL ``BETWEEN``), then applies the exact residual filter.  The
    manifest is loaded ONCE, so a concurrent rewrite cannot pair one
    manifest's shard list with another's cluster column."""
    import os

    import ray.data

    m = _load_manifest(out_dir)
    files = _prune(out_dir, m, lo, hi)
    col = m["cluster_col"]
    logger.info(
        "read_clustered: %d of %d shards overlap [%s, %s]",
        len(files), len(m["shards"]), lo, hi,
    )
    if not files:
        import pyarrow.parquet as pq

        shards = m["shards"]
        if not shards:
            raise ValueError("read_clustered: empty clustered directory")
        schema = pq.read_schema(
            os.path.join(out_dir, shards[0]["file"]),
        )
        return ray.data.from_arrow(schema.empty_table())

    def _residual(t: pa.Table) -> pa.Table:
        c = t.column(col)
        return t.filter(
            pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi)),
        )

    return ray.data.read_parquet(files).map_batches(
        _residual, batch_format="pyarrow",
    )


def read_clustered_point(out_dir: str, col: str, value):
    """EQUALITY lookup over a :func:`write_clustered` directory: prunes
    with the cluster zone map when ``col`` is the cluster column, with
    the per-shard Bloom side-filter when ``col`` is in ``bloom_cols``
    (both when applicable), then applies the exact residual filter —
    the needle-in-100TB read path."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    m = _load_manifest(out_dir)
    shards = m["shards"]
    # canonicalize the probe through the column's ARROW type before
    # hashing/comparing: the write side hashed str() of the column's
    # to_pylist() values, so a type-mismatched-but-equal probe (int 7
    # vs float column 7.0 -> str '7' vs '7.0') would silently prune
    # every shard even though the residual pc.equal would match
    if shards:
        import pyarrow.parquet as _pq

        schema0 = _pq.read_schema(
            os.path.join(out_dir, shards[0]["file"]),
        )
        if col in schema0.names:
            value = pa.scalar(value, schema0.field(col).type).as_py()
    if col == m["cluster_col"]:
        shards = [s for s in shards
                  if s["vmin"] <= value and s["vmax"] >= value]
    elif col in m.get("bloom_cols", []):
        from .ops.sketch import md5_window_slots

        slots = md5_window_slots([value], m["bloom_bits"], 2)[:, 0]
        key = "bloom_{}".format(col)
        kept = []
        for s in shards:
            bits = int(s[key], 16)
            if all((bits >> int(sl)) & 1 for sl in slots):
                kept.append(s)
        shards = kept
    else:
        raise ValueError(
            "read_clustered_point: %r is neither the cluster column nor "
            "a bloom column" % col,
        )
    logger.info(
        "read_clustered_point: %d of %d shards may contain %s=%r",
        len(shards), len(m["shards"]), col, value,
    )
    if not shards:
        alls = m["shards"]
        if not alls:
            raise ValueError("read_clustered_point: empty directory")
        schema = pq.read_schema(os.path.join(out_dir, alls[0]["file"]))
        return ray.data.from_arrow(schema.empty_table())

    def _residual(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column(col), value))

    files = [os.path.join(out_dir, s["file"]) for s in shards]
    return ray.data.read_parquet(files).map_batches(
        _residual, batch_format="pyarrow",
    )


def _part1by1(x: "np.ndarray") -> "np.ndarray":
    """Spread the low 16 bits of each uint64 so bit i lands at 2i."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def write_zordered(ds, out_dir: str, col_a: str, col_b: str):
    """Z-order (Morton-interleaved) clustered Parquet sink over TWO
    numeric columns — the multi-dimensional sibling of
    :func:`write_clustered`: one tiny global min/max aggregate per
    column, one ``map_batches`` pass computes the 32-bit Morton code of
    the two 16-bit-quantized ranks, ONE global sort by that code, and
    each sorted block writes a shard whose manifest row records the
    EXACT per-shard ``(amin, amax, bmin, bmax, n)`` zone box.
    :func:`read_zordered` then opens only shards whose box overlaps the
    query box — a predicate on EITHER column (or both) prunes, which a
    single-column cluster cannot give.

    Quantization (linear into 65536 bins between the global min/max)
    only shapes the LAYOUT; correctness never depends on it because the
    zone maps store exact native min/max values.  NULL rows in either
    key are excluded (a box predicate can never match them).  Shards
    get content-digest names + atomic rename (idempotent retries), the
    same contract as ``write_clustered``.
    """
    import hashlib
    import io
    import json
    import os

    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    schema = ds.schema()
    base = getattr(schema, "base_schema", None) or schema
    types = {}
    for f in base:
        if f.name in (col_a, col_b):
            types[f.name] = f.type
    for c in (col_a, col_b):
        t = types.get(c)
        if t is None or not (pa.types.is_integer(t) or pa.types.is_floating(t)):
            raise ValueError(
                "write_zordered: columns must be numeric, got %r for %s"
                % (t, c),
            )
    os.makedirs(out_dir, exist_ok=True)

    def _drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(
            pc.is_valid(t.column(col_a)), pc.is_valid(t.column(col_b)),
        ))

    from ray.data.aggregate import Max, Min

    dn = ds.map_batches(_drop_null, batch_format="pyarrow").materialize()
    bounds = dn.aggregate(Min(col_a), Max(col_a), Min(col_b), Max(col_b))
    amin, amax = bounds["min({})".format(col_a)], bounds["max({})".format(col_a)]
    bmin, bmax = bounds["min({})".format(col_b)], bounds["max({})".format(col_b)]

    def _zcode(t: pa.Table) -> pa.Table:
        a = t.column(col_a).to_numpy(zero_copy_only=False).astype(np.float64)
        b = t.column(col_b).to_numpy(zero_copy_only=False).astype(np.float64)
        qa = np.zeros(len(a), np.uint64) if amax == amin else np.clip(
            np.floor((a - amin) / (amax - amin) * 65535.0), 0, 65535,
        ).astype(np.uint64)
        qb = np.zeros(len(b), np.uint64) if bmax == bmin else np.clip(
            np.floor((b - bmin) / (bmax - bmin) * 65535.0), 0, 65535,
        ).astype(np.uint64)
        z = (_part1by1(qa) | (_part1by1(qb) << np.uint64(1))).astype(np.int64)
        return t.append_column("_z", pa.array(z, pa.int64()))

    sorted_ds = dn.map_batches(_zcode, batch_format="pyarrow").sort("_z")

    def _write(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string())]
            + [pa.array([], types[col_a])] * 2
            + [pa.array([], types[col_b])] * 2
            + [pa.array([], pa.int64())],
            names=["file", "amin", "amax", "bmin", "bmax", "n"],
        )
        if t.num_rows == 0:
            return empty
        t = t.drop_columns(["_z"])
        name = _shard_write(t, out_dir)
        ma = pc.min_max(t.column(col_a))
        mb = pc.min_max(t.column(col_b))
        return pa.Table.from_arrays(
            [pa.array([name], pa.string()),
             pa.array([ma["min"].as_py()], types[col_a]),
             pa.array([ma["max"].as_py()], types[col_a]),
             pa.array([mb["min"].as_py()], types[col_b]),
             pa.array([mb["max"].as_py()], types[col_b]),
             pa.array([t.num_rows], pa.int64())],
            names=["file", "amin", "amax", "bmin", "bmax", "n"],
        )

    manifest = []
    for b in sorted_ds.map_batches(
        _write, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        manifest.extend(b.to_pylist())
    manifest.sort(key=lambda r: (r["file"]))
    _dump_manifest(out_dir, {"cols": [col_a, col_b], "shards": manifest})
    return manifest


def read_zordered(out_dir: str, a_lo, a_hi, b_lo, b_hi):
    """Box read over a :func:`write_zordered` directory: opens ONLY the
    shards whose zone box overlaps ``[a_lo,a_hi] x [b_lo,b_hi]``
    (inclusive BETWEEN on both columns), then applies the exact
    residual filter."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    m = _load_manifest(out_dir)
    col_a, col_b = m["cols"]
    files = [
        os.path.join(out_dir, s["file"]) for s in m["shards"]
        if s["amax"] >= a_lo and s["amin"] <= a_hi
        and s["bmax"] >= b_lo and s["bmin"] <= b_hi
    ]
    logger.info(
        "read_zordered: %d of %d shards overlap [%s,%s]x[%s,%s]",
        len(files), len(m["shards"]), a_lo, a_hi, b_lo, b_hi,
    )
    if not files:
        shards = m["shards"]
        if not shards:
            raise ValueError("read_zordered: empty clustered directory")
        schema = pq.read_schema(os.path.join(out_dir, shards[0]["file"]))
        return ray.data.from_arrow(schema.empty_table())

    def _residual(t: pa.Table) -> pa.Table:
        ca, cb = t.column(col_a), t.column(col_b)
        return t.filter(pc.and_(
            pc.and_(pc.greater_equal(ca, a_lo), pc.less_equal(ca, a_hi)),
            pc.and_(pc.greater_equal(cb, b_lo), pc.less_equal(cb, b_hi)),
        ))

    return ray.data.read_parquet(files).map_batches(
        _residual, batch_format="pyarrow",
    )


def compact_clustered(out_dir: str, target_bytes: int = 256 << 20):
    """Compact a :func:`write_clustered` directory's small shards into
    ~``target_bytes`` files — the maintenance pass a streaming ingest
    needs so the manifest (and per-query file-open count) stays bounded
    while range/Bloom pruning keeps working.

    The merge plan is built on the driver from the manifest + on-disk
    sizes (tiny); adjacent-in-key-order shards group greedily up to the
    target, each group merges in ONE distributed task (rows concatenate
    in manifest order — the global sort order is preserved, so no
    re-sort), and the group's zone map / Bloom bitsets fold by
    min/max/OR with NO data recompute.  The manifest replaces
    atomically BEFORE the replaced files are unlinked, so a crash
    between the two leaves harmless orphans, never a broken manifest.
    Singleton groups keep their existing file untouched.

    Returns the new manifest list.
    """
    import json
    import os

    import ray.data

    m = _load_manifest(out_dir)
    shards = m["shards"]
    bloom_cols = m.get("bloom_cols", [])
    if not shards:
        return shards

    groups, cur, cur_bytes = [], [], 0
    for s in shards:
        sz = os.path.getsize(os.path.join(out_dir, s["file"]))
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(s)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    if all(len(g) == 1 for g in groups):
        return shards  # nothing to do

    spec = ray.data.from_items([
        {"members": json.dumps(g)} for g in groups if len(g) > 1
    ])

    def _merge(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        rows = {"file": [], "vmin": [], "vmax": [], "n": []}
        for bc in bloom_cols:
            rows["bloom_{}".format(bc)] = []
        for raw in t.column("members").to_pylist():
            members = json.loads(raw)
            merged = pa.concat_tables([
                pq.read_table(os.path.join(out_dir, s["file"]))
                for s in members
            ])
            name = _shard_write(merged, out_dir)
            rows["file"].append(name)
            rows["vmin"].append(min(s["vmin"] for s in members))
            rows["vmax"].append(max(s["vmax"] for s in members))
            rows["n"].append(sum(s["n"] for s in members))
            for bc in bloom_cols:
                bits = 0
                for s in members:
                    bits |= int(s["bloom_{}".format(bc)], 16)
                rows["bloom_{}".format(bc)].append("{:x}".format(bits))
        return pa.Table.from_pydict(rows)

    merged_rows = []
    for b in spec.map_batches(
        _merge, batch_format="pyarrow", batch_size=1,
    ).iter_batches(batch_format="pyarrow"):
        merged_rows.extend(b.to_pylist())

    new_manifest = [g[0] for g in groups if len(g) == 1] + merged_rows
    new_manifest.sort(key=lambda r: (r["vmin"], r["file"]))
    _dump_manifest(out_dir, {
        "cluster_col": m["cluster_col"], "shards": new_manifest,
        "bloom_cols": bloom_cols, "bloom_bits": m.get("bloom_bits"),
    })
    keep = {r["file"] for r in new_manifest}
    for s in shards:
        if s["file"] not in keep:
            try:
                os.unlink(os.path.join(out_dir, s["file"]))
            except FileNotFoundError:
                pass
    return new_manifest
