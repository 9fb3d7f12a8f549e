"""Distributed second-moment statistics over an embedding column.

:func:`gram_matrix_e12` computes the Gram matrix ``Xᵀ X`` (the input to
covariance / PCA / whitening) in ONE streaming pass: each batch
quantizes its vectors to integer micro-units and multiplies out a local
``dim × dim`` int64 matrix; the driver folds the per-batch partials in
arbitrary-precision Python ints, so the merge can never overflow and
the result is EXACT — layout-independent, float-free, and reproducible
in DuckDB by the same quantize-then-multiply integer arithmetic (the
oracle for ``emb_gram_matrix``).  Merge traffic is ``dim·(dim+1)/2``
rows per batch; nothing shuffles.

Per-batch bound: |v| ≤ 2³¹ micros and batch ≤ 2 M rows keeps every
int64 cell within range (raises otherwise).  The final cells must fit
int64 to surface as an Arrow column; at corpus scales beyond that,
re-scale the quantization (the driver fold itself is unbounded).

Reference scope note: the reference engine has no vector statistics;
this is the beyond-reference training-data surface (SURVEY.md §2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _matrix

__all__ = ["gram_matrix_e12", "quantize_micros"]

_INT64_MAX = (1 << 63) - 1


def quantize_micros(mat: np.ndarray) -> np.ndarray:
    """float matrix → int64 micro-units, round-half-up
    (``floor(v·1e6 + 0.5)`` — the repo's shared quantization, identical
    to the SQL expression)."""
    return np.floor(mat * 1e6 + 0.5).astype(np.int64)


def gram_matrix_e12(ds, vec_col: str = "embedding"):
    """Upper-triangle Gram matrix rows ``(i, j, gram_e12, n_rows)`` with
    1-based dim indices (matching SQL's 1-based list indexing),
    ``gram_e12 = Σ_rows v_i·v_j`` in squared micro-units."""

    def _partial(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col)
        if not len(m):
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 2
                + [pa.array([], pa.binary()), pa.array([], pa.int64())],
                names=["dim", "n", "gram", "rows"],
            )
        q = quantize_micros(m)
        if np.abs(q).max(initial=0) >= (1 << 31) or len(q) > 2_000_000:
            raise ValueError(
                "per-batch int64 bound exceeded: re-scale quantization "
                "or lower batch_size",
            )
        g = q.T @ q  # exact int64 within the documented bound
        # one row per batch: dim + row count + the raw int64 cells
        return pa.Table.from_arrays(
            [
                pa.array([g.shape[0]], pa.int64()),
                pa.array([len(q)], pa.int64()),
                pa.array([g.tobytes()], pa.binary()),
                pa.array([len(q)], pa.int64()),
            ],
            names=["dim", "n", "gram", "rows"],
        )

    parts = ds.select_columns([vec_col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    total = None
    n_rows = 0
    dim = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        for k in range(b.num_rows):
            dim = int(b.column("dim")[k].as_py())
            g = np.frombuffer(
                b.column("gram")[k].as_py(), dtype=np.int64,
            ).reshape(dim, dim)
            # arbitrary-precision fold: Python ints never overflow
            obj = g.astype(object)
            total = obj if total is None else total + obj
            n_rows += int(b.column("rows")[k].as_py())
    if total is None:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["i", "j", "gram_e12", "n_rows"],
        )
    iu, ju = np.triu_indices(dim)
    vals = [int(total[a, b_]) for a, b_ in zip(iu, ju)]
    if any(abs(v) > _INT64_MAX for v in vals):
        raise ValueError(
            "gram cell exceeds int64: re-scale the quantization",
        )
    return pa.Table.from_arrays(
        [
            pa.array((iu + 1).astype(np.int64), pa.int64()),
            pa.array((ju + 1).astype(np.int64), pa.int64()),
            pa.array(vals, pa.int64()),
            pa.array([n_rows] * len(vals), pa.int64()),
        ],
        names=["i", "j", "gram_e12", "n_rows"],
    )
