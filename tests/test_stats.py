"""Exact integer Gram matrix over the embedding column."""

import numpy as np
import pyarrow as pa


def _emb_ds(mat, blocks=4):
    import ray

    mat = np.asarray(mat, np.float32)
    n, dim = mat.shape
    flat = pa.array(mat.ravel().astype(np.float64), pa.float64())
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * dim, pa.int32())
    t = pa.Table.from_arrays(
        [
            pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            pa.ListArray.from_arrays(offs, flat).cast(pa.list_(pa.float32())),
        ],
        names=["vec_id", "embedding"],
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _brute(mat):
    q = np.floor(np.asarray(mat, np.float32).astype(np.float64) * 1e6 + 0.5)
    q = q.astype(np.int64)
    return q.T @ q


def test_gram_matches_brute(ray_session):
    from pybel_ray.ops.stats import gram_matrix_e12

    rs = np.random.RandomState(2)
    mat = rs.randn(120, 8).astype(np.float32)
    out = gram_matrix_e12(_emb_ds(mat, blocks=5)).to_pandas()
    want = _brute(mat)
    assert len(out) == 8 * 9 // 2  # upper triangle incl. diagonal
    for r in out.itertuples():
        assert r.gram_e12 == want[r.i - 1, r.j - 1]
        assert r.n_rows == 120


def test_gram_layout_invariant(ray_session):
    from pybel_ray.ops.stats import gram_matrix_e12

    rs = np.random.RandomState(4)
    mat = rs.randn(90, 6).astype(np.float32)
    a = gram_matrix_e12(_emb_ds(mat, blocks=2)).to_pandas()
    b = gram_matrix_e12(_emb_ds(mat, blocks=13)).to_pandas()
    assert a.equals(b)  # exact integers: layout cannot matter


def test_gram_empty(ray_session):
    from pybel_ray.ops.stats import gram_matrix_e12

    out = gram_matrix_e12(_emb_ds(np.zeros((0, 4), np.float32), blocks=1))
    assert out.num_rows == 0
