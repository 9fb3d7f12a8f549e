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

__all__ = ["knn_brute", "knn_lsh", "get_vector", "LshIndex", "build_lsh_index"]


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


class LshIndex:
    """A persisted random-hyperplane LSH index over an embedding column.

    Built ONCE with :func:`build_lsh_index`: each vector's bucket (sign
    pattern against seeded hyperplanes) is computed in one pass and the
    (id, bucket, vector) rows land in a Parquet directory partitioned by
    bucket.  Queries then read ONLY their probe buckets' files (Parquet
    partition pruning) — the round-1 version recomputed every vector's
    bucket on every query, a full scan with a cheaper inner loop.
    """

    def __init__(self, path: str, planes: np.ndarray, id_col: str, vec_col: str):
        self.path = path
        self.planes = planes
        self.id_col = id_col
        self.vec_col = vec_col

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes.T) > 0
        n_planes = self.planes.shape[0]
        return (
            signs.astype(np.uint32) << np.arange(n_planes, dtype=np.uint32)
        ).sum(axis=1)

    def probes_for(self, query: np.ndarray, probe_hamming: int = 1) -> list:
        q_bucket = int(self.bucket_of(np.asarray(query, dtype=np.float64)[None, :])[0])
        probes = {q_bucket}
        if probe_hamming >= 1:
            for b in range(self.planes.shape[0]):
                probes.add(q_bucket ^ (1 << b))
        return sorted(probes)

    def read_buckets(self, buckets):
        """Dataset over ONLY the given buckets (partition-pruned read)."""
        import ray.data

        return ray.data.read_parquet(
            self.path,
            partition_filter=ray.data.datasource.partitioning.PathPartitionFilter.of(
                filter_fn=lambda kv: int(kv.get("bucket", -1)) in set(buckets),
                style=ray.data.datasource.partitioning.PartitionStyle.HIVE,
                base_dir=self.path,
            ),
        )


def build_lsh_index(
    ds,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 99,
) -> LshIndex:
    """One-pass index build: bucket every vector, write Parquet partitioned
    by bucket (the reusable scale path for repeated queries)."""
    import ray.data  # noqa: F401

    first = ds.select_columns([vec_col]).limit(1).take_all()
    dim = len(first[0][vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    index = LshIndex(path, planes, id_col, vec_col)

    def _bucketize(t: pa.Table) -> pa.Table:
        mat = _matrix(t, vec_col)
        buckets = index.bucket_of(mat) if len(mat) else np.array([], np.uint32)
        return t.append_column("bucket", pa.array(buckets.astype(np.int64), pa.int64()))

    ds.select_columns([id_col, vec_col]).map_batches(
        _bucketize, batch_format="pyarrow",
    ).write_parquet(path, partition_cols=["bucket"])
    return index


def knn_lsh(
    ds,
    query: np.ndarray,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 99,
    probe_hamming: int = 1,
    index: "LshIndex" = None,
):
    """Approximate top-k via random-hyperplane LSH buckets.

    With ``index`` (see :func:`build_lsh_index`) only the probe buckets'
    Parquet partitions are read; without one, the bucketing is computed
    inline per batch (one-shot queries / tests).
    """
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    if index is not None:
        probes = index.probes_for(q, probe_hamming)
        pruned = index.read_buckets(probes)

        def _score(t: pa.Table) -> pa.Table:
            mat = _matrix(t, index.vec_col)
            if not len(mat):
                return pa.Table.from_arrays(
                    [pa.array([], pa.int64()), pa.array([], pa.float64())],
                    names=[index.id_col, "cosine"],
                )
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat @ qn) / norms
            return pa.Table.from_arrays(
                [t.column(index.id_col), pa.array(sims, pa.float64())],
                names=[index.id_col, "cosine"],
            )

        local = pruned.map_batches(_score, batch_format="pyarrow")
        top = local.sort(["cosine", index.id_col], descending=[True, False]).limit(k)

        def _rank_idx(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [pa.array(np.arange(1, t.num_rows + 1), pa.int64()),
                 t.column(index.id_col)],
                names=["rank", index.id_col],
            )

        return top.repartition(1).map_batches(_rank_idx, batch_format="pyarrow")

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
