"""Similarity search over an embedding column (list<float>).

* :func:`knn_brute` — baseline: per-batch numpy matmul against a broadcast
  query matrix (zero shuffle; each batch emits its local top-k, a final
  tiny sort+limit merges).
* :func:`knn_lsh` — scale path: random-hyperplane LSH bucketing; only the
  query's bucket(s) are scanned.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

__all__ = ["knn_brute", "knn_lsh", "get_vector"]


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch.column(vec_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float64)
    offsets = np.asarray(arr.offsets)
    dim = offsets[1] - offsets[0]
    return flat.reshape(len(arr), int(dim))


def get_vector(ds, vec_id: int, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Fetch one embedding vector (driver-side point lookup)."""
    import pyarrow.compute as pc

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column(id_col), vec_id))

    rows = ds.map_batches(_f, batch_format="pyarrow").take_all()
    if not rows:
        raise KeyError(vec_id)
    return np.asarray(rows[0][vec_col], dtype=np.float64)


def knn_brute(
    ds,
    query: np.ndarray,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k: local top-k per batch -> global sort + limit.

    Returns a Dataset of (rank, vec_id) ordered by (-cosine, vec_id); only
    integer columns are exposed so results compare exactly across engines.
    """
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    def _local_topk(t: pa.Table) -> pa.Table:
        mat = _matrix(t, vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        ids = np.asarray(t.column(id_col))
        if len(sims) > k:
            part = np.argpartition(-sims, k)[:k]
        else:
            part = np.arange(len(sims))
        return pa.Table.from_arrays(
            [pa.array(ids[part], pa.int64()), pa.array(sims[part], pa.float64())],
            names=[id_col, "cosine"],
        )

    local = ds.select_columns([id_col, vec_col]).map_batches(
        _local_topk, batch_format="pyarrow",
    )
    top = local.sort(["cosine", id_col], descending=[True, False]).limit(k)

    def _rank(t: pa.Table) -> pa.Table:
        # the limit(k) output arrives as a single ordered block
        return pa.Table.from_arrays(
            [pa.array(np.arange(1, t.num_rows + 1), pa.int64()), t.column(id_col)],
            names=["rank", id_col],
        )

    return top.repartition(1).map_batches(_rank, batch_format="pyarrow")


def knn_lsh(
    ds,
    query: np.ndarray,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 99,
    probe_hamming: int = 1,
):
    """Approximate top-k via random-hyperplane LSH buckets.

    Vectors are bucketed by the sign pattern against ``n_planes`` seeded
    hyperplanes; only buckets within ``probe_hamming`` of the query's bucket
    are scanned (multi-probe).  At cluster scale the bucketing pass is a
    one-off index build keyed for reuse.
    """
    q = np.asarray(query, dtype=np.float64)
    dim = len(q)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

    def _bucket_of(mat: np.ndarray) -> np.ndarray:
        signs = (mat @ planes.T) > 0
        return (signs.astype(np.uint32) << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)

    q_bucket = int(_bucket_of(q[None, :])[0])
    probes = {q_bucket}
    if probe_hamming >= 1:
        for b in range(n_planes):
            probes.add(q_bucket ^ (1 << b))

    qn = q / (np.linalg.norm(q) or 1.0)

    def _local(t: pa.Table) -> pa.Table:
        mat = _matrix(t, vec_col)
        buckets = _bucket_of(mat)
        mask = np.isin(buckets, list(probes))
        mat = mat[mask]
        ids = np.asarray(t.column(id_col))[mask]
        if len(ids) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=[id_col, "cosine"],
            )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(sims, pa.float64())],
            names=[id_col, "cosine"],
        )

    local = ds.select_columns([id_col, vec_col]).map_batches(_local, batch_format="pyarrow")
    top = local.sort(["cosine", id_col], descending=[True, False]).limit(k)

    def _rank(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(np.arange(1, t.num_rows + 1), pa.int64()), t.column(id_col)],
            names=["rank", id_col],
        )

    return top.repartition(1).map_batches(_rank, batch_format="pyarrow")
