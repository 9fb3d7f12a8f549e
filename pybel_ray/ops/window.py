"""Distributed windowed aggregates: running (prefix) sums, global row
numbers, and token-budget shard packing.

Ray Data has no window functions; this implements the classic
two-pass distributed prefix scan:

1. sort by the order key and **materialize** (so both passes see the
   exact same immutable blocks),
2. one pass computes per-block ``(first_key, block_sum)`` partials —
   one row per block, collected on the driver (O(#blocks), tiny by
   construction, independent of row count),
3. the exclusive per-block offsets are broadcast via ``ray.put`` and a
   second pass adds ``offset + within-block cumsum`` — fully
   vectorized, no shuffle beyond the initial sort.

``pack_by_budget`` builds on the exclusive running sum to assign each
row a shard id such that every shard holds ~``budget`` units (the
sequence-packing / output-sharding step of a training pipeline).
Equivalent SQL: ``sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
PRECEDING AND 1 PRECEDING)``.

The order column must hold unique values (ids); for string keys the
driver-side partial ordering uses Python comparison, which matches
Arrow's sort for ASCII keys (ids and hex digests are; document keys
accordingly).

Reference scope note: the reference engine has no windowed aggregates;
this is part of the training-data-pipeline family (SURVEY.md §2
"beyond-reference" operators; windowed aggregate is the canonical
"operator Ray Data lacks" example).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["running_sum", "global_row_number", "pack_by_budget"]


def _scan(ds, order_col, value_of, out_cols, emit):
    """Shared two-pass prefix scan.

    ``value_of(table) -> np.ndarray`` yields each row's contribution;
    ``emit(table, inclusive, exclusive) -> table`` appends the outputs.
    ``batch_size=None`` (whole blocks) in BOTH passes so they see
    identical batch boundaries over the same materialized blocks, and
    each batch's first order value identifies it in the offset map.
    """
    import ray

    sorted_ds = ds.sort(order_col).materialize()

    def _partial(t: pa.Table) -> pa.Table:
        key_slice = t.column(order_col).slice(0, min(1, t.num_rows)).combine_chunks()
        vals_sum = [int(value_of(t).sum())] if t.num_rows else []
        return pa.Table.from_arrays(
            [key_slice, pa.array(vals_sum, pa.int64())],
            names=["_first_key", "_block_sum"],
        )

    # one row per block -> driver-safe regardless of dataset size
    partials = sorted(
        sorted_ds.map_batches(
            _partial, batch_format="pyarrow", batch_size=None,
        ).take_all(),
        key=lambda r: r["_first_key"],
    )
    offsets, acc = {}, 0
    for row in partials:
        offsets[row["_first_key"]] = acc
        acc += row["_block_sum"]
    offsets_ref = ray.put(offsets)

    def _add(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            for name in out_cols:
                t = t.append_column(name, pa.array([], pa.int64()))
            return t
        vals = value_of(t)
        inclusive = np.cumsum(vals, dtype=np.int64)
        inclusive += ray.get(offsets_ref)[t.column(order_col)[0].as_py()]
        exclusive = inclusive - vals
        return emit(t, inclusive, exclusive)

    return sorted_ds.map_batches(_add, batch_format="pyarrow", batch_size=None)


def _int_column(value_col):
    def value_of(t: pa.Table) -> np.ndarray:
        return t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)

    return value_of


def running_sum(ds, order_col: str, value_col: str, out_col: str = "running"):
    """Inclusive prefix sum of ``value_col`` in ``order_col`` order —
    ``sum(v) OVER (ORDER BY k)`` — with nothing collected on the driver
    beyond one row per block."""

    def emit(t, inclusive, exclusive):
        return t.append_column(out_col, pa.array(inclusive, pa.int64()))

    return _scan(ds, order_col, _int_column(value_col), [out_col], emit)


def global_row_number(ds, order_col: str, out_col: str = "row_number"):
    """1-based global row number in ``order_col`` order —
    ``row_number() OVER (ORDER BY k)``."""

    def value_of(t: pa.Table) -> np.ndarray:
        return np.ones(t.num_rows, dtype=np.int64)

    def emit(t, inclusive, exclusive):
        return t.append_column(out_col, pa.array(inclusive, pa.int64()))

    return _scan(ds, order_col, value_of, [out_col], emit)


def pack_by_budget(
    ds,
    budget: int,
    order_col: str,
    value_col: str,
    out_col: str = "shard_id",
):
    """Assign each row a shard id so consecutive rows (in ``order_col``
    order) fill ~``budget`` units per shard: ``shard = exclusive_running
    // budget``.  The output-sharding / sequence-packing step — each
    shard can then be written as its own Parquet partition."""

    def emit(t, inclusive, exclusive):
        return t.append_column(
            out_col, pa.array(exclusive // budget, pa.int64()),
        )

    return _scan(ds, order_col, _int_column(value_col), [out_col], emit)
