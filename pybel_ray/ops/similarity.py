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

__all__ = [
    "knn_brute", "knn_brute_multi", "knn_lsh", "get_vector",
    "LshIndex", "build_lsh_index",
    "IvfIndex", "build_ivf_index", "knn_ivf",
    "max_abs_value", "quantize_embeddings",
    "signed_random_projection", "srp_sign_matrix",
]


def max_abs_value(ds, vec_col: str = "embedding") -> float:
    """Global max |element| over a vector column: per-batch partial max
    (one float per batch) → driver reduce.  Never collects vectors."""
    def _partial(t: pa.Table) -> pa.Table:
        m = _matrix(t, vec_col)
        val = float(np.abs(m).max()) if m.size else 0.0
        return pa.Table.from_arrays([pa.array([val], pa.float64())], names=["m"])

    best = 0.0
    for b in ds.select_columns([vec_col]).map_batches(
        _partial, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        col = b.column("m").to_numpy(zero_copy_only=False)
        if col.size:
            best = max(best, float(col.max()))
    return best


def quantize_embeddings(
    ds,
    vec_col: str = "embedding",
    out_col: str = "embedding_q",
    max_abs: Optional[float] = None,
):
    """Symmetric int8 quantization for embedding storage:
    ``q = round_half_away(v * 127 / max_abs)`` ∈ [-127, 127].

    ``max_abs`` defaults to the distributed global maximum (so the scale
    is corpus-wide, not per-batch).  The arithmetic is written as
    ``(v * 127) / max_abs`` then half-away-from-zero rounding — the
    exact IEEE op order of ``round(x * 127 / a)`` in DuckDB, so a SQL
    oracle matches bit-for-bit.
    """
    if max_abs is None:
        max_abs = max_abs_value(ds, vec_col)
    if max_abs == 0.0:
        raise ValueError("all-zero embedding column")

    def _q(t: pa.Table) -> pa.Table:
        arr = t.column(vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = (np.asarray(arr.values, dtype=np.float64) * 127.0) / max_abs
        q = np.sign(flat) * np.floor(np.abs(flat) + 0.5)  # half away from zero
        la = pa.ListArray.from_arrays(
            arr.offsets, pa.array(q.astype(np.int64), pa.int64()),
        )
        return t.append_column(out_col, la)

    return ds.map_batches(_q, batch_format="pyarrow")


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    arr = batch.column(vec_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float64)
    offsets = np.asarray(arr.offsets)
    dim = offsets[1] - offsets[0]
    return flat.reshape(len(arr), int(dim))


def srp_sign_matrix(dim: int, k: int) -> np.ndarray:
    """Deterministic ±1 projection matrix (dim × k): entry (i, j) is +1
    when the first md5 hex digit of ``"i:j"`` is even — the repo's
    shared md5-window recipe, so a DuckDB oracle rebuilds the identical
    matrix.  Built once (driver or actor init); dim×k int64 is tiny."""
    import hashlib

    s = np.empty((dim, k), np.int64)
    for i in range(dim):
        for j in range(k):
            h = hashlib.md5(  # noqa: S324
                ("%d:%d" % (i, j)).encode(),
            ).hexdigest()
            s[i, j] = 1 if int(h[0], 16) % 2 == 0 else -1
    return s


def signed_random_projection(
    ds, k: int = 8, vec_col: str = "embedding", id_col: str = "vec_id",
):
    """Johnson–Lindenstrauss-style dimensionality reduction with a
    deterministic ±1 matrix: each vector quantizes to int64 micros and
    projects by one integer matmul per batch (`Q @ S`), so every output
    cell is EXACT int64 arithmetic a SQL oracle reproduces term-for-term
    (no float associativity anywhere).  Emits long rows
    ``(id, j, proj_e6)`` — the shape the per-dim SQL unnest compares.

    Scale: zero shuffle (one map_batches pass); the sign matrix is
    closed over once (dim×k ≤ a few KB).  This is the sketch step
    before LSH/clustering when the raw dim is too wide to shuffle.
    """

    sign_cache: dict = {}

    def _f(t: pa.Table) -> pa.Table:
        arr = t.column(vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        valid = np.asarray(arr.is_valid().to_numpy(zero_copy_only=False))
        if not valid.all():
            keep = pa.array(np.flatnonzero(valid))
            arr = arr.take(keep)
            ids = ids.take(keep)
        if len(arr) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 3,
                names=[id_col, "j", "proj_e6"],
            )
        m = _matrix(
            pa.Table.from_arrays([arr], names=[vec_col]), vec_col,
        )
        s = sign_cache.get(m.shape[1])
        if s is None:
            s = sign_cache[m.shape[1]] = srp_sign_matrix(m.shape[1], k)
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        proj = q @ s  # int64 matmul: exact
        n = len(arr)
        idv = np.repeat(
            np.asarray(ids.to_numpy(zero_copy_only=False), np.int64), k,
        )
        jv = np.tile(np.arange(k, dtype=np.int64), n)
        return pa.Table.from_arrays(
            [pa.array(idv), pa.array(jv), pa.array(proj.reshape(-1))],
            names=[id_col, "j", "proj_e6"],
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        _f, batch_format="pyarrow",
    )


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


def knn_brute_multi(
    ds,
    queries: np.ndarray,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k for a BATCH of queries in one pass.

    The query matrix is broadcast once (``ray.put``); each data batch does
    ONE matmul against all queries, keeps its local top-k per query, and a
    final per-query sort+limit merges — one scan serves every query
    (SURVEY "similarity search": brute-force baseline = numpy matmul per
    batch against a broadcast query matrix).

    Returns a Dataset of (query_idx, rank, vec_id, cosine).
    """
    import ray

    q = np.asarray(queries, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    norms = np.linalg.norm(q, axis=1)
    norms[norms == 0] = 1.0
    q_ref = ray.put((q / norms[:, None]).T)  # (dim, n_queries)

    def _local_topk(t: pa.Table) -> pa.Table:
        qt = ray.get(q_ref)
        n_q = qt.shape[1]
        mat = _matrix(t, vec_col)
        if not len(mat):
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["query_idx", id_col, "cosine"],
            )
        vnorm = np.linalg.norm(mat, axis=1)
        vnorm[vnorm == 0] = 1.0
        sims = (mat / vnorm[:, None]) @ qt  # (rows, n_queries)
        ids = np.asarray(t.column(id_col))
        out_q, out_id, out_c = [], [], []
        for j in range(n_q):
            col = sims[:, j]
            if len(col) > k:
                part = np.argpartition(-col, k)[:k]
            else:
                part = np.arange(len(col))
            out_q.append(np.full(len(part), j, dtype=np.int64))
            out_id.append(ids[part])
            out_c.append(col[part])
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q), pa.int64()),
                pa.array(np.concatenate(out_id), pa.int64()),
                pa.array(np.concatenate(out_c), pa.float64()),
            ],
            names=["query_idx", id_col, "cosine"],
        )

    local = ds.select_columns([id_col, vec_col]).map_batches(
        _local_topk, batch_format="pyarrow",
    )
    # tiny merge: (n_queries x k x n_blocks) rows -> per-query rank
    top = local.sort(
        ["query_idx", "cosine", id_col], descending=[False, True, False],
    )

    def _rank(t: pa.Table) -> pa.Table:
        qidx = t.column("query_idx").to_numpy(zero_copy_only=False)
        # rank within each query run (sorted by query then cosine desc)
        rank = np.ones(len(qidx), dtype=np.int64)
        run = 1
        for i in range(1, len(qidx)):
            run = run + 1 if qidx[i] == qidx[i - 1] else 1
            rank[i] = run
        t = t.append_column("rank", pa.array(rank, pa.int64()))
        return t.filter(pa.array(rank <= k))

    return top.repartition(1).map_batches(_rank, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

class IvfIndex:
    """Coarse-quantized ANN index: k-means centroids + bucket-partitioned
    Parquet, queries probe only the ``nprobe`` nearest centroids' files.

    The SURVEY "similarity search" scale path alternative to hyperplane
    LSH: data-adaptive buckets follow the embedding distribution, so
    clustered corpora get high recall at tiny probe fractions.
    """

    def __init__(self, path: str, centroids: np.ndarray, id_col: str, vec_col: str):
        self.path = path
        self.centroids = centroids  # (n_centroids, dim), unit-normalized
        self.id_col = id_col
        self.vec_col = vec_col

    def assign(self, unit: np.ndarray) -> np.ndarray:
        return np.argmax(unit @ self.centroids.T, axis=1)

    def probes_for(self, query: np.ndarray, nprobe: int = 2) -> list:
        q = np.asarray(query, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        sims = self.centroids @ qn
        return sorted(int(i) for i in np.argsort(-sims)[:nprobe])

    def read_buckets(self, buckets):
        import ray.data

        return ray.data.read_parquet(
            self.path,
            partition_filter=ray.data.datasource.partitioning.PathPartitionFilter.of(
                filter_fn=lambda kv: int(kv.get("bucket", -1)) in set(buckets),
                style=ray.data.datasource.partitioning.PartitionStyle.HIVE,
                base_dir=self.path,
            ),
        )


def build_ivf_index(
    ds,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 7,
) -> IvfIndex:
    """Train spherical k-means centroids on a sample, assign every vector
    to its nearest centroid, write Parquet partitioned by bucket.

    Training is driver-side on a bounded sample (the standard IVF recipe);
    assignment + write stream through ``map_batches``.
    """
    import ray  # noqa: F401

    n = ds.count()
    sample = ds.select_columns([vec_col]).random_sample(
        min(1.0, (2.0 * sample_size) / max(1, n)), seed=seed,
    ).limit(sample_size).take_all()
    mat = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]

    rng = np.random.RandomState(seed)
    n_centroids = min(n_centroids, len(unit))
    centroids = unit[rng.choice(len(unit), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = unit[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / (np.linalg.norm(v) or 1.0)

    index = IvfIndex(path, centroids, id_col, vec_col)

    def _bucketize(t: pa.Table) -> pa.Table:
        mat = _matrix(t, vec_col)
        if not len(mat):
            return t.append_column("bucket", pa.array([], pa.int64()))
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        buckets = index.assign(mat / vn[:, None]).astype(np.int64)
        return t.append_column("bucket", pa.array(buckets, pa.int64()))

    ds.select_columns([id_col, vec_col]).map_batches(
        _bucketize, batch_format="pyarrow",
    ).write_parquet(path, partition_cols=["bucket"])
    return index


def knn_ivf(
    index: IvfIndex,
    query: np.ndarray,
    k: int = 20,
    nprobe: int = 2,
):
    """Approximate top-k against an :class:`IvfIndex`: scan only the
    ``nprobe`` nearest centroids' partitions (pruned Parquet read)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    pruned = index.read_buckets(index.probes_for(q, nprobe))
    id_col = index.id_col

    def _score(t: pa.Table) -> pa.Table:
        mat = _matrix(t, index.vec_col)
        if not len(mat):
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=[id_col, "cosine"],
            )
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        sims = (mat @ qn) / vn
        return pa.Table.from_arrays(
            [t.column(id_col).cast(pa.int64()), pa.array(sims, pa.float64())],
            names=[id_col, "cosine"],
        )

    top = pruned.map_batches(_score, batch_format="pyarrow").sort(
        ["cosine", id_col], descending=[True, False],
    ).limit(k)

    def _rank(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(np.arange(1, t.num_rows + 1), pa.int64()), t.column(id_col)],
            names=["rank", id_col],
        )

    return top.repartition(1).map_batches(_rank, batch_format="pyarrow")
