"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): assign every embedding to its nearest centroid, then
drop any vector that has a higher-priority (lower-id) neighbor above a
cosine threshold *within the same cluster*.

Scale shape: the centroid matrix is tiny (k rows) and broadcast; the
assignment is one normalized matmul per batch (no shuffle).  The dedup
itself is ONE ``groupby(centroid_id)`` exchange followed by a per-cluster
O(m²) masked matmul — the published algorithm's partitioning assumption
(clusters bound the quadratic term; pick k so n/k vectors fit one worker)
made explicit.  Outputs are (vec_id, centroid_id, kept) with integer/bool
columns only, so the DuckDB oracle (argmax via ``row_number`` over
``list_cosine_similarity``, EXISTS for the lower-id neighbor) compares
exactly.

The reference engine has no embedding surface; this belongs to the
training-data family (SURVEY.md §2 "beyond-reference" operators) and
composes with ``build_ivf_index``'s sampled k-means for centroid learning.

Tolerance assumption: ``kept`` and ``centroid_id`` gate on strict float
comparisons (sim > threshold, argmax), which two engines computing in
different operation orders could flip for similarities within ~1 ulp of
the boundary.  The driver oracle is only exact when the corpus keeps a
margin from the threshold — verified for the bench corpora by
``test_semdedup_oracle_threshold_margin`` (min |sim − threshold| and the
argmax runner-up gap both > 1e-6 at sf0.001 and sf0.01).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _matrix

__all__ = ["assign_centroids", "semantic_dedup"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def assign_centroids(
    ds,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
):
    """Append ``centroid_id`` (argmax cosine, ties to the lowest id).

    ``centroids`` is a (k, d) float array, broadcast via ``ray.put``.
    With ``keep_vec=False`` only (id, centroid_id) survive.
    """
    import ray

    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    c_ref = ray.put(cn)

    def _f(t: pa.Table) -> pa.Table:
        mat = _matrix(t, vec_col)
        sims = _normalize(mat) @ ray.get(c_ref).T
        best = pa.array(np.argmax(sims, axis=1).astype(np.int64), pa.int64())
        if keep_vec:
            return t.append_column("centroid_id", best)
        return pa.Table.from_arrays(
            [t.column(id_col), best], names=[id_col, "centroid_id"],
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def semantic_dedup(
    ds,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(vec_id, centroid_id, kept): ``kept`` is false iff a lower-id vector
    in the same cluster has cosine similarity > ``threshold``.

    Survivor selection is per-cluster and non-transitive by design (the
    SemDeDup rule): a dropped vector still shields nothing — only the
    *existence* of a closer lower-id neighbor matters, so the result is
    independent of visit order.
    """
    assigned = assign_centroids(
        ds, centroids, id_col=id_col, vec_col=vec_col, keep_vec=True,
    )

    def _dedup(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column(id_col).to_numpy(zero_copy_only=False))
        order = np.argsort(ids, kind="stable")
        g = g.take(pa.array(order))
        ids = ids[order]
        mat = _normalize(_matrix(g, vec_col))
        sims = mat @ mat.T
        # strictly-lower-id mask: rows are id-sorted, so lower triangle
        dup = (np.tril(sims > threshold, k=-1)).any(axis=1)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                g.column("centroid_id"),
                pa.array(~dup),
            ],
            names=[id_col, "centroid_id", "kept"],
        )

    return assigned.groupby("centroid_id").map_groups(
        _dedup, batch_format="pyarrow",
    )
