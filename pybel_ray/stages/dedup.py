"""Exact dedup on a key column (node_md5 / edge_md5 / triple key).

Two-phase, shuffle-minimizing (SURVEY.md §2.8, §4):

1. **Local combiner** — vectorized first-occurrence dedup inside each Arrow
   batch (``map_batches``).  Rows with the same key are byte-identical
   (deterministic canonicalization), so dropping duplicates early shrinks
   the shuffle payload; this is the "salted pre-aggregate" analog for
   hot-entity skew — hot keys collapse to one row per block before the
   wide exchange.
2. **Global groupby** — ``groupby(key)`` shuffle keeping the first row per
   group (reference semantics: first-wins insertion, graph.py:353-359).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["local_dedup_table", "dedup_exact"]


def local_dedup_table(table: pa.Table, key: str) -> pa.Table:
    """Vectorized first-occurrence dedup within one Arrow table."""
    if table.num_rows <= 1:
        return table
    arr = table.column(key)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    codes = arr.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(codes, return_index=True)
    if len(first_idx) == table.num_rows:
        return table
    first_idx.sort()
    return table.take(pa.array(first_idx))


def dedup_exact(ds, key: str, local_first: bool = True):
    """Global exact dedup of a Dataset on ``key`` (first row wins)."""
    if local_first:
        ds = ds.map_batches(
            lambda t, _key=key: local_dedup_table(t, _key),
            batch_format="pyarrow",
        )

    def _first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return ds.groupby(key).map_groups(_first, batch_format="pyarrow")
