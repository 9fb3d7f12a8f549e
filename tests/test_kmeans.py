"""Distributed k-means: pinned to a single-process numpy Lloyd reference,
block-layout invariant, and recovers planted clusters."""

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


def _ref_kmeans(mat, k, n_iter):
    """Single-process norm-weighted spherical Lloyd (float64 over the
    raw float32 rows — the same exact-accumulation regime as the
    distributed fit, so equality is exact, not approximate)."""
    x = np.asarray(mat, np.float32).astype(np.float64)
    c = x[:k] / np.linalg.norm(x[:k], axis=1, keepdims=True)
    for _ in range(n_iter):
        a = np.argmax(x @ c.T, axis=1)
        nxt = c.copy()
        for j in range(k):
            m = x[a == j]
            if len(m):
                s = m.sum(axis=0)
                nrm = np.linalg.norm(s)
                if nrm > 0:
                    nxt[j] = s / nrm
        c = nxt
    return c


def test_kmeans_matches_numpy_reference(ray_session):
    from pybel_ray.ops.kmeans import kmeans_fit

    rs = np.random.RandomState(3)
    mat = rs.randn(200, 16).astype(np.float32)
    got = kmeans_fit(_emb_ds(mat, blocks=5), k=6, n_iter=4)
    ref = _ref_kmeans(mat, k=6, n_iter=4)
    assert np.array_equal(got, ref)  # exact: float32 rows sum exactly


def test_kmeans_block_layout_invariant(ray_session):
    from pybel_ray.ops.kmeans import kmeans_fit

    rs = np.random.RandomState(9)
    mat = rs.randn(150, 8).astype(np.float32)
    a = kmeans_fit(_emb_ds(mat, blocks=2), k=4, n_iter=3)
    b = kmeans_fit(_emb_ds(mat, blocks=13), k=4, n_iter=3)
    assert np.array_equal(a, b)


def test_kmeans_recovers_planted_clusters(ray_session):
    from pybel_ray.ops.kmeans import assign_kmeans, kmeans_fit

    rs = np.random.RandomState(1)
    centers = np.eye(3, 12) * 10.0
    mat = np.vstack(
        [centers[i % 3] + 0.05 * rs.randn(12) for i in range(120)],
    ).astype(np.float32)
    c = kmeans_fit(_emb_ds(mat, blocks=4), k=3, n_iter=5)
    out = assign_kmeans(_emb_ds(mat, blocks=4), c).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    labels = out["centroid"].to_numpy()
    # all members of a planted cluster land together
    for i in range(3):
        assert len(set(labels[i::3])) == 1
    assert len(set(labels[0::3]) | set(labels[1::3]) | set(labels[2::3])) == 3


def test_kmeans_sizes_and_empty_cluster(ray_session):
    from pybel_ray.ops.kmeans import kmeans_fit, kmeans_sizes

    # two tight planted clusters but k=3: one centroid ends up empty and
    # must keep its previous position without NaNs
    mat = np.vstack(
        [np.full((30, 4), 5.0), np.full((30, 4), -5.0) * [1, -1, 1, -1],
         ],
    ).astype(np.float32)
    ds = _emb_ds(mat, blocks=3)
    c = kmeans_fit(ds, k=3, n_iter=3)
    assert np.isfinite(c).all()
    sizes = kmeans_sizes(ds, c).to_pandas()
    assert int(sizes["n"].sum()) == 60


def test_kmeans_oracle_margin(ray_session):
    """The emb_kmeans_assign oracle compares a numpy argmax against a
    DuckDB window over float64 inner products computed in a different
    summation order — sound only with a real gap between the top two
    sims.  Assert the corpus margin at both test scales (the semdedup
    tolerance contract)."""
    import ray

    from pybel_ray.ops.kmeans import kmeans_fit
    from pybel_ray.ops.similarity import _matrix

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ds = ray.data.read_parquet(sf + "/embeddings.parquet")
        c = kmeans_fit(ds, k=8, n_iter=3)
        mats = [
            _matrix(b, "embedding")
            for b in ds.iter_batches(batch_format="pyarrow")
        ]
        sims = np.vstack(mats) @ c.T
        top2 = np.sort(sims, axis=1)[:, -2:]
        assert float(np.min(top2[:, 1] - top2[:, 0])) > 1e-6


def test_kmeans_snapshot_refreshes_across_sfs(ray_session):
    """Alternating sf_dirs must keep the oracle's centroid snapshot in
    sync with the returned fit (regression: a cache hit used to skip the
    snapshot rewrite, leaving the other sf's centroids on disk)."""
    import duckdb

    import __ray_entry__ as entry

    qs = entry.queries()
    osql = entry.oracle_sql()

    def check(sf):
        got = qs["emb_kmeans_assign"](sf).to_pandas().sort_values(
            "vec_id",
        ).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet('%s')"
            % (sf + "/embeddings.parquet"),
        )
        want = con.sql(osql["emb_kmeans_assign"]).df().sort_values(
            "vec_id",
        ).reset_index(drop=True)
        assert got["centroid"].astype("int64").equals(
            want["centroid"].astype("int64"),
        )

    check("/root/testdata/sf0.001")
    check("/root/testdata/sf0.01")
    check("/root/testdata/sf0.001")  # the cache-hit leg
