"""Semi-structured column extraction: pull typed fields out of a JSON
string column with RE2 kernels (crawl metadata / event-props parsing).

pyarrow has no JSON kernels, so extraction is a compiled-once RE2
pattern per key via ``pc.extract_regex`` — vectorized, zero shuffle, and
byte-identical to DuckDB ``regexp_extract`` with the same pattern (both
engines are RE2), which is how the driver oracle checks it.  This covers
the flat-field fast path (the overwhelmingly common crawl-metadata
shape); nested paths need a real JSON parser and are out of scope.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["json_int_field", "json_string_field"]


def _int_pattern(key: str) -> str:
    # RE2 has no lookahead; a well-formed JSON value is always followed
    # by ',' '}' or ']', so requiring that terminator rejects the integer
    # prefix of floats ("k": 1.25) and of larger tokens (ADVICE fix).
    return '"' + re.escape(key) + '"\\s*:\\s*(?P<v>-?[0-9]+)\\s*[,}\\]]'


def _str_pattern(key: str) -> str:
    return '"' + re.escape(key) + '"\\s*:\\s*"(?P<v>[^"]*)"'


def json_int_field(ds, col: str, key: str, out_col: str | None = None):
    """Append integer field ``key`` of JSON column ``col`` (null when the
    key is missing or not an integer literal)."""
    pattern = _int_pattern(key)
    out_col = out_col or key

    def _f(t: pa.Table) -> pa.Table:
        arr = t.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        st = pc.extract_regex(arr, pattern)
        vals = pc.cast(pc.struct_field(st, "v"), pa.int64())
        return t.append_column(out_col, vals)

    return ds.map_batches(_f, batch_format="pyarrow")


def json_string_field(ds, col: str, key: str, out_col: str | None = None):
    """Append string field ``key`` of JSON column ``col`` (no unescaping —
    flat ASCII-ish metadata fields only, null otherwise)."""
    pattern = _str_pattern(key)
    out_col = out_col or key

    def _f(t: pa.Table) -> pa.Table:
        arr = t.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        st = pc.extract_regex(arr, pattern)
        return t.append_column(out_col, pc.struct_field(st, "v"))

    return ds.map_batches(_f, batch_format="pyarrow")
