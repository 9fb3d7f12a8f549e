"""Shared vectorized batch kernels.

:func:`runlength_distinct_counts` is the per-batch partial-count
primitive behind the pair/host/anchor aggregations: dictionary-encode a
composite key, stable-argsort the codes, and read distinct combos +
counts off the run lengths — no Python loop, one output row per
distinct key per batch entering the downstream groupby exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def runlength_distinct_counts(arrays):
    """Distinct combinations of the given (equal-length, null-free
    string) arrays and their multiplicities.

    Returns ``(take, counts)``: ``take`` is a ``pa.Array`` of indices
    selecting the first occurrence of each distinct combination (apply
    with ``pc.take``), ``counts`` an int64 numpy array of run lengths.
    Composite keys join on NUL, so values containing NUL would alias —
    same documented limit as the equi-join key rendering.
    """
    key = arrays[0]
    for extra in arrays[1:]:
        key = pc.binary_join_element_wise(key, extra, "\x00")
    enc = key.dictionary_encode()
    codes = np.asarray(
        enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64,
    )
    order = np.argsort(codes, kind="stable")
    c = codes[order]
    starts = np.r_[True, c[1:] != c[:-1]] if len(c) else np.array([], bool)
    start_idx = np.flatnonzero(starts)
    counts = np.diff(np.r_[start_idx, len(c)]).astype(np.int64)
    return pa.array(order[start_idx]), counts
