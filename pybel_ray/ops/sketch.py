"""Mergeable sketches for corpus-scale statistics.

:func:`approx_distinct` is a KMV (k-minimum-values) distinct-count
sketch: every batch contributes the ``k`` smallest 64-bit hashes of its
*distinct* values (dictionary-encode first, so hashing cost is per
distinct value per batch, not per row); the driver streams the partial
sketches through a single bounded merge (O(k) memory) and estimates

    distinct ≈ (k - 1) / h_(k)        (h normalized to [0, 1))

with standard error ~ 1/sqrt(k) (~3% at k=1024).  When the true distinct
count is at most ``k`` the sketch holds every hash and the estimate is
EXACT — which is what makes a SQL ``count(DISTINCT ...)`` oracle valid
on bounded-vocabulary corpora, while the pytest covers the approximate
regime.

Reference scope note: the reference engine has no sketches; this is the
training-data-pipeline "novel sketch" surface (SURVEY.md §2
beyond-reference operators).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["approx_distinct", "kmv_partials"]


def _hash64(values) -> np.ndarray:
    """Stable 64-bit hashes of an Arrow string array (md5 prefix)."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(  # noqa: S324
                    str(v).encode("utf8"),
                ).digest()[:8], "big",
            )
            for v in values.to_pylist()
        ],
        dtype=np.uint64,
    )


def kmv_partials(ds, col: str, k: int = 1024):
    """Per-batch KMV partials: each batch emits its ``k`` smallest
    distinct-value hashes as rows ``(h,)``."""

    def _partial(t: pa.Table) -> pa.Table:
        vals = t.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        uniq = pc.unique(vals)
        h = np.unique(_hash64(uniq))
        if len(h) > k:
            h = np.partition(h, k)[:k]
        return pa.Table.from_arrays(
            [pa.array(h.astype(np.int64), pa.int64())], names=["h"],
        )

    return ds.select_columns([col]).map_batches(_partial, batch_format="pyarrow")


def approx_distinct(ds, col: str, k: int = 1024) -> int:
    """KMV estimate of ``count(DISTINCT col)``; exact when the true
    count is ≤ ``k``.  The driver merge streams partials and keeps only
    the ``k`` smallest hashes (bounded memory however large the input).
    """
    partials = kmv_partials(ds, col, k)
    merged = np.array([], dtype=np.uint64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        merged = np.unique(np.concatenate([merged, h]))
        if len(merged) > k:
            merged = np.sort(merged)[:k]
    if len(merged) < k:
        return int(len(merged))
    h_k = float(merged[-1]) / float(2**64)
    return int(round((k - 1) / h_k))
