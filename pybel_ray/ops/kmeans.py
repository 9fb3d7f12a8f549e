"""Distributed k-means over an embedding column (spherical Lloyd's).

The cluster-training step of a 100 TB embedding pipeline (IVF coarse
quantizers, SemDeDup centroids, corpus bucketing).  Reference scope
note: the reference engine has no clustering; this is the
beyond-reference training-data surface (SURVEY.md §2), the full-data
sibling of the bounded-sample k-means inside
:func:`pybel_ray.ops.similarity.build_ivf_index`.

Scale shape: initialization is deterministic (the ``k`` smallest ids —
one tiny ``sort + limit(k)``); each Lloyd iteration is ONE
``map_batches`` pass that emits at most ``k`` partial rows per batch
(per-centroid count + vector sum, ``k × (dim+1)`` floats), so merge
traffic is bounded by ``k·dim`` per batch and the driver update is an
O(k·dim) streaming fold — no shuffle anywhere; the input is re-scanned
once per iteration (the standard Lloyd trade: re-reading beats
materializing an assignment table).

Determinism: partial sums accumulate the RAW float32 embeddings in
float64.  A float64 add of float32-representable values is exact while
the running sum's mantissa span stays within 53 bits (~``2^29`` rows
per centroid at unit scale), so every partial — and any merge order of
partials — yields the bit-identical total: block layout cannot change
the trained centroids (pinned by a pytest against a single-process
numpy reference).  Beyond that row bound the guarantee degrades to
ordinary float noise.  The update normalizes the member-vector SUM
(norm-weighted spherical k-means — summing raw rows rather than unit
rows is what keeps the accumulation exact; for near-unit-norm
embeddings it coincides with classic spherical k-means).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _matrix

__all__ = ["kmeans_fit", "assign_kmeans", "kmeans_sizes"]


def kmeans_fit(
    ds,
    k: int = 8,
    n_iter: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train ``k`` unit-norm centroids with ``n_iter`` Lloyd iterations.

    Assignment is ``argmax(e · c)`` over unit centroids — equal to the
    cosine argmax, computed on the raw vectors (positive per-row scaling
    never changes the winner) so the accumulation stays exact.  Empty
    clusters keep their previous centroid.  Returns ``(k, dim)``
    float64, rows unit-norm.
    """
    import ray

    rows = ds.sort(id_col).limit(k).take_all()
    init = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if len(init) < k:
        raise ValueError("need at least k=%d rows, got %d" % (k, len(init)))
    centroids = init / np.linalg.norm(init, axis=1, keepdims=True)
    dim = centroids.shape[1]
    vecs = ds.select_columns([vec_col])

    for _ in range(n_iter):
        ref = ray.put(centroids)

        def _partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _matrix(t, vec_col)
            if not len(m):
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64()), pa.array([], pa.int64()),
                     pa.array([], pa.list_(pa.float64()))],
                    names=["centroid", "n", "s"],
                )
            a = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((k, dim), np.float64)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=k)
            nz = np.flatnonzero(cnt)
            flat = pa.array(sums[nz].ravel(), pa.float64())
            offs = pa.array(
                np.arange(len(nz) + 1, dtype=np.int32) * dim, pa.int32(),
            )
            return pa.Table.from_arrays(
                [
                    pa.array(nz, pa.int64()),
                    pa.array(cnt[nz], pa.int64()),
                    pa.ListArray.from_arrays(offs, flat),
                ],
                names=["centroid", "n", "s"],
            )

        parts = vecs.map_batches(_partial, batch_format="pyarrow")
        total = np.zeros((k, dim), np.float64)
        counts = np.zeros(k, np.int64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            cidx = b.column("centroid").to_numpy(zero_copy_only=False)
            if not len(cidx):
                continue
            np.add.at(
                counts, cidx, b.column("n").to_numpy(zero_copy_only=False),
            )
            s = b.column("s")
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            svals = np.asarray(s.values, np.float64).reshape(len(cidx), dim)
            np.add.at(total, cidx, svals)
        norms = np.linalg.norm(total, axis=1)
        upd = (counts > 0) & (norms > 0)
        nxt = centroids.copy()
        nxt[upd] = total[upd] / norms[upd, None]
        centroids = nxt
    return centroids


def assign_kmeans(
    ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "centroid",
):
    """Append the nearest-centroid id (``argmax(e · c)``, first winner on
    exact ties — matching a SQL ``ORDER BY sim DESC, centroid_id``
    window).  One vectorized matmul per batch; the centroid matrix ships
    once via ``ray.put``."""
    import ray

    ref = ray.put(np.asarray(centroids, np.float64))

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix(t, vec_col)
        a = (
            np.argmax(m @ c.T, axis=1)
            if len(m) else np.zeros(0, np.int64)
        )
        return t.append_column(out_col, pa.array(a.astype(np.int64), pa.int64()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def kmeans_sizes(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Cluster sizes: ``(centroid, n)`` — assignment + one small groupby."""
    from .relational import groupby_count

    assigned = assign_kmeans(ds, centroids, vec_col).select_columns(
        ["centroid"],
    )
    return groupby_count(assigned, "centroid", "n")
