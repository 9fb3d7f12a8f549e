"""Dataset profiling: per-column statistics and key-skew diagnostics.

The first thing to run against an unknown 100 TB table — and the probe
that decides partitioning/salting strategy before any shuffle.  Both
operators are partial-aggregate shaped: each batch emits a handful of
rows, so the exchange moves O(columns x blocks) / O(distinct keys)
rows, never the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_table", "key_profile"]

#: column types the profiler folds min/max for, and how they quantize
#: (int64-exact so the DuckDB oracle compares bit-for-bit; float
#: columns use the repo-wide round-half-up micros quantization)
_NUMERIC_KINDS = ("int", "uint", "float", "timestamp")


def _quant_numeric(arr: pa.ChunkedArray | pa.Array):
    """Cast a numeric/timestamp column to exact int64 (floats -> micros
    via ``floor(v * 1e6 + 0.5)``, the repo-wide quantization)."""
    typ = arr.type
    if pa.types.is_floating(typ):
        v = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        f = v.to_numpy(zero_copy_only=False).astype(np.float64)
        e6 = np.floor(f * 1e6 + 0.5)
        mask = ~np.isfinite(e6)
        return pa.array(
            np.where(mask, 0, e6).astype(np.int64), pa.int64(), mask=mask,
        )
    if pa.types.is_timestamp(typ):
        if typ.unit != "us":
            arr = pc.cast(arr, pa.timestamp("us"))
        return pc.cast(arr, pa.int64())
    return pc.cast(arr, pa.int64())


def profile_table(ds, columns=None):
    """Per-column profile: one row per column with ``(col, n, n_null,
    min_num, max_num, min_str, max_str)``.

    Numeric / timestamp columns fold min/max as exact int64 (floats in
    round-half-up micros, timestamps in epoch micros) into
    ``min_num``/``max_num``; string columns fold lexicographic min/max
    into ``min_str``/``max_str``; the unused pair stays null.  Other
    types (lists, binary, ...) profile counts only.

    Scale shape: each batch emits ONE partial row per column; the only
    exchange is a ``groupby(col)`` over those tiny partials.  Min/max
    of the quantized values equals the quantized min/max (the
    quantization is monotone), so DuckDB reproduces every cell.
    """
    from .relational import groupby_agg

    names = list(columns) if columns is not None else None

    def _partial(t: pa.Table) -> pa.Table:
        cols = names if names is not None else t.column_names
        out = {"col": [], "n": [], "n_null": [],
               "min_num": [], "max_num": [], "min_str": [], "max_str": []}
        for c in cols:
            arr = t.column(c)
            out["col"].append(c)
            out["n"].append(t.num_rows)
            out["n_null"].append(arr.null_count)
            mn = mx = None
            smn = smx = None
            if t.num_rows > arr.null_count:
                typ = arr.type
                if (pa.types.is_integer(typ) or pa.types.is_floating(typ)
                        or pa.types.is_timestamp(typ)):
                    q = _quant_numeric(arr)
                    mm = pc.min_max(q)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                    mm = pc.min_max(arr)
                    smn, smx = mm["min"].as_py(), mm["max"].as_py()
            out["min_num"].append(mn)
            out["max_num"].append(mx)
            out["min_str"].append(smn)
            out["max_str"].append(smx)
        return pa.Table.from_arrays(
            [pa.array(out["col"], pa.string()),
             pa.array(out["n"], pa.int64()),
             pa.array(out["n_null"], pa.int64()),
             pa.array(out["min_num"], pa.int64()),
             pa.array(out["max_num"], pa.int64()),
             pa.array(out["min_str"], pa.string()),
             pa.array(out["max_str"], pa.string())],
            names=list(out),
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return groupby_agg(partials, "col", {
        "n": ("sum", "n"),
        "n_null": ("sum", "n_null"),
        "min_num": ("min", "min_num"),
        "max_num": ("max", "max_num"),
        "min_str": ("min", "min_str"),
        "max_str": ("max", "max_str"),
    })


def key_profile(ds, key: str, k: int = 20):
    """Skew diagnostic for a prospective shuffle key: the ``k``
    heaviest key values with exact counts, each annotated with its
    corpus share in ppm plus the global totals.

    Returns ``(key, n, share_ppm, total_rows, distinct_keys)`` — the
    table you read before choosing ``groupby(key)`` at scale: a top key
    holding >1% of a 100 TB corpus is the salting signal.

    Scale shape: per-batch run-length partial counts, ONE
    ``groupby(key)`` exchange over the partials; the totals fold over
    the AGGREGATE table (one tiny scan), and only ``k`` rows reach the
    driver-side annotation.  ``share_ppm = n * 1_000_000 // total``
    (positive operands, so DuckDB ``//`` agrees).  Null keys are
    dropped (mirror with ``WHERE key IS NOT NULL``).
    """
    from ._kernels import runlength_distinct_counts
    from .relational import groupby_agg, topk

    def _partial(t: pa.Table) -> pa.Table:
        orig = t.column(key).drop_null().combine_chunks()
        if len(orig) == 0:
            return pa.Table.from_arrays(
                [pa.array([], orig.type), pa.array([], pa.int64())],
                names=[key, "n"],
            )
        take, counts = runlength_distinct_counts(
            [pc.cast(orig, pa.string())],
        )
        return pa.Table.from_arrays(
            [pc.take(orig, take), pa.array(counts, pa.int64())],
            names=[key, "n"],
        )

    partials = ds.select_columns([key]).map_batches(
        _partial, batch_format="pyarrow",
    )
    counts = groupby_agg(partials, key, {"n": ("sum", "n")}).materialize()
    total = counts.sum("n") or 0
    distinct = counts.count()
    top = topk(counts, "n", k, tie_keys=[key])

    def _annotate(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        share = n * 1_000_000 // max(total, 1)
        t = t.append_column("share_ppm", pa.array(share, pa.int64()))
        t = t.append_column(
            "total_rows", pa.array(np.full(len(n), total, np.int64)),
        )
        return t.append_column(
            "distinct_keys", pa.array(np.full(len(n), distinct, np.int64)),
        )

    return top.map_batches(_annotate, batch_format="pyarrow")
