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

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["load_table", "load_documents", "load_pages"]

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
