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


def test_pca_project_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from pybel_ray.ops.stats import pca_project, quantize_micros

    rng = np.random.default_rng(17)
    base = rng.normal(size=(200, 3)) @ rng.normal(size=(3, 8))
    x = (base + 0.01 * rng.normal(size=(200, 8))).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in x],
                              pa.list_(pa.float32())),
    })
    out = pca_project(
        ray.data.from_arrow(t).repartition(7), k=3,
    ).to_pandas().sort_values(["vec_id", "component"]).reset_index(drop=True)

    # numpy reference with the same quantization + sign convention
    q = quantize_micros(np.asarray(x, np.float64)).astype(np.float64)
    mean = q.mean(axis=0)
    cov = (q.T @ q) / len(q) - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :3]
    for c in range(3):
        a = int(np.abs(comps[:, c]).argmax())
        if comps[a, c] < 0:
            comps[:, c] = -comps[:, c]
    ref = (q - mean) @ comps
    got = out.score.to_numpy().reshape(200, 3)
    assert np.allclose(got, ref, rtol=1e-9, atol=1e-6)

    # the 3 components explain nearly everything of this rank-3 data
    total_var = np.trace(cov)
    assert w[::-1][:3].sum() / total_var > 0.999


def test_corr_stats_by_matches_numpy_and_layout(ray_session):
    """Per-group sufficient stats equal a driver numpy fold regardless
    of block layout; degenerate groups emit null slope/intercept."""
    import numpy as np
    import ray

    from pybel_ray.ops.stats import _tdiv, corr_stats_by

    rng = np.random.default_rng(7)
    rows = []
    for g, n in (("a", 503), ("b", 117), ("solo", 1)):
        xs = rng.integers(0, 10**6, n)
        ys = rng.uniform(-50, 450, n)
        rows += [{"g": g, "x": int(x), "y": float(y)}
                 for x, y in zip(xs, ys)]
    rows.append({"g": "novar", "x": 5, "y": 1.0})
    rows.append({"g": "novar", "x": 5, "y": 2.0})
    rows.append({"g": None, "x": 1, "y": 1.0})  # dropped
    rows.append({"g": "a", "x": None, "y": 1.0})  # dropped

    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_items(rows, override_num_blocks=blocks)
        outs.append(corr_stats_by(ds, "g", "x", "y").to_pylist())
    assert outs[0] == outs[1]  # layout-invariant

    by_g = {r["g"]: r for r in outs[0]}
    assert set(by_g) == {"a", "b", "solo", "novar"}
    assert by_g["solo"]["slope_e6"] is None  # zero x-variance (n=1)
    assert by_g["novar"]["slope_e6"] is None

    for g, n in (("a", 503), ("b", 117)):
        xs = np.array([r["x"] for r in rows
                       if r["g"] == g and r["x"] is not None],
                      dtype=object)
        ys = np.array([int(np.floor(r["y"] * 1e6 + 0.5)) for r in rows
                       if r["g"] == g and r["x"] is not None],
                      dtype=object)
        got = by_g[g]
        assert got["n"] == n
        assert int(got["sum_x"]) == int(xs.sum())
        assert int(got["sum_xy"]) == int((xs * ys).sum())
        den = n * int((xs * xs).sum()) - int(xs.sum()) ** 2
        num = n * int((xs * ys).sum()) - int(xs.sum()) * int(ys.sum())
        slope = _tdiv(num * 10**6, den)
        assert int(got["slope_e6"]) == slope
        assert int(got["intercept_e6"]) == _tdiv(
            int(ys.sum()) * 10**6 - slope * int(xs.sum()), n,
        )


def test_tdiv_matches_sql_truncation():
    from pybel_ray.ops.stats import _tdiv

    assert _tdiv(-7, 2) == -3  # SQL //; Python -7//2 == -4
    assert _tdiv(7, -2) == -3
    assert _tdiv(-7, -2) == 3
    assert _tdiv(7, 2) == 3


def test_centroid_by_exact_and_layout_invariant(ray_session):
    """Negative components exercise the truncating (not flooring)
    division; block layout must not change a single cell."""
    import ray

    from pybel_ray.ops.stats import _tdiv, centroid_by, quantize_micros

    rng = np.random.RandomState(13)
    n, dim = 400, 8
    labels = rng.randint(0, 5, n)
    mat = (rng.rand(n, dim) - 0.7) * 3.0  # mostly negative sums
    tbl = pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array(list(mat.astype(np.float32)),
                              pa.list_(pa.float32())),
    })

    q = quantize_micros(mat.astype(np.float32).astype(np.float64))
    expect = {}
    for lab in np.unique(labels):
        sel = q[labels == lab]
        for d in range(dim):
            expect[(int(lab), d + 1)] = (
                len(sel), _tdiv(int(sel[:, d].sum()), len(sel)),
            )

    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = {
            (r["label"], r["dim"]): (r["n"], r["centroid_e6"])
            for r in centroid_by(ds, "label").take_all()
        }
        assert got == expect

    assert any(c < 0 for _, c in expect.values())  # negatives exercised


def test_centroid_by_drops_null_labels(ray_session):
    import ray

    from pybel_ray.ops.stats import centroid_by

    tbl = pa.table({
        "label": pa.array([1, None, 1], pa.int32()),
        "embedding": pa.array(
            [[1.0, -2.0], [100.0, 100.0], [2.0, -3.0]],
            pa.list_(pa.float32()),
        ),
    })
    out = centroid_by(ray.data.from_arrow(tbl), "label").take_all()
    got = {(r["label"], r["dim"]): (r["n"], r["centroid_e6"]) for r in out}
    assert got == {(1, 1): (2, 1_500_000), (1, 2): (2, -2_500_000)}


def test_select_kth_exact_matches_numpy_sort(ray_session):
    """Histogram-narrowing selection: exact k-th at every extreme
    (min, max, median) across mixed magnitudes and layouts — no sort
    ever runs."""
    import ray

    from pybel_ray.ops.stats import exact_median_e6, select_kth_e6

    rng = np.random.RandomState(9)
    vals = np.concatenate([
        rng.randn(5000), rng.rand(7) * 1e8, [-1e8] * 3, [0.0] * 11,
    ])
    rows = list(vals) + [None] * 25
    tbl = pa.table({"v": pa.array(rows, pa.float64())})
    qs = np.sort(np.floor(vals * 1e6 + 0.5).astype(np.int64))

    for blocks in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        for k in (1, 2, len(qs) // 2, len(qs) - 1, len(qs)):
            assert select_kth_e6(ds, "v", k) == int(qs[k - 1])
        med = exact_median_e6(ds, "v")
        assert med.column("n")[0].as_py() == len(qs)
        assert med.column("median_e6")[0].as_py() == \
            int(qs[(len(qs) - 1) // 2])


def test_select_kth_duplicates_and_all_equal(ray_session):
    import ray

    from pybel_ray.ops.stats import select_kth_e6

    tbl = pa.table({"v": pa.array([3.5] * 100, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    assert select_kth_e6(ds, "v", 1) == 3_500_000
    assert select_kth_e6(ds, "v", 100) == 3_500_000


def test_select_quantiles_vector_shares_passes(ray_session):
    """Multi-rank selection equals per-rank numpy sorts at every
    requested quantile, including the 0 and 10000 endpoints."""
    import ray

    from pybel_ray.ops.stats import select_quantiles_e6

    rng = np.random.RandomState(17)
    vals = np.concatenate([rng.randn(4000) * 50, [1e7, -1e7]])
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(list(vals) + [None] * 9, pa.float64())}),
    ).repartition(5)
    qs = np.sort(np.floor(vals * 1e6 + 0.5).astype(np.int64))
    n = len(qs)
    bps = [0, 100, 2500, 5000, 7500, 9900, 10000]
    out = {r["q_bp"]: (r["value_e6"], r["n"])
           for r in select_quantiles_e6(ds, "v", bps).to_pylist()}
    for bp in bps:
        assert out[bp] == (int(qs[(n - 1) * bp // 10000]), n)


def test_median_by_selection_skewed_groups_and_nulls(ray_session):
    """Per-group exact medians with a degenerate hot group, null groups
    and null values dropped; layout must not change a cell."""
    import ray

    from pybel_ray.ops.stats import median_by_selection

    rng = np.random.RandomState(4)
    n = 6000
    groups = rng.choice(["a", "b", "hot"], n, p=[0.05, 0.1, 0.85])
    vals = rng.randn(n) * np.where(groups == "hot", 1e5, 10)
    tbl = pa.table({
        "g": pa.array(list(groups) + ["a", None]),
        "v": pa.array(list(vals) + [None, 5.0], pa.float64()),
    })
    expect = {}
    for g in ("a", "b", "hot"):
        sel = np.sort(np.floor(
            vals[groups == g] * 1e6 + 0.5,
        ).astype(np.int64))
        expect[g] = (len(sel), int(sel[(len(sel) - 1) // 2]))
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = {r["g"]: (r["n"], r["median_e6"])
               for r in median_by_selection(ds, "g", "v").to_pylist()}
        assert got == expect


def test_median_by_selection_group_budget(ray_session):
    import pytest
    import ray

    from pybel_ray.ops.stats import median_by_selection

    tbl = pa.table({"g": ["a", "b", "c"], "v": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError):
        median_by_selection(
            ray.data.from_arrow(tbl), "g", "v", group_budget=2,
        )


def test_mad_by_selection_matches_python(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from pybel_ray.ops.stats import mad_by_selection

    rng = np.random.default_rng(31)
    groups = [f"g{int(x)}" for x in rng.integers(0, 5, 400)]
    vals = np.round(rng.normal(0, 10, 400), 4)
    # plant nulls on both sides
    g_col = pa.array(groups[:-2] + [None, "g0"], pa.string())
    v_col = pa.array(list(vals[:-1]) + [None], pa.float64())
    t = pa.Table.from_arrays([g_col, v_col], names=["g", "v"])

    def lower_median(a):
        a = np.sort(a)
        return int(a[(len(a) - 1) // 2])

    exp = {}
    q = np.floor(np.asarray(v_col.to_numpy(zero_copy_only=False),
                            np.float64) * 1e6 + 0.5)
    for grp in sorted({g for g in g_col.to_pylist() if g is not None}):
        mask = np.array([g == grp for g in g_col.to_pylist()]) & ~np.isnan(
            np.asarray(v_col.to_numpy(zero_copy_only=False), np.float64),
        )
        qq = q[mask].astype(np.int64)
        if not len(qq):
            continue
        m = lower_median(qq)
        exp[grp] = (len(qq), m, lower_median(np.abs(qq - m)))

    out = mad_by_selection(
        ray.data.from_arrow(t).repartition(4), "g", "v",
    )
    got = {
        r["g"]: (r["n"], r["median_e6"], r["mad_e6"])
        for r in out.to_pylist()
    }
    assert got == exp


def test_winsorize_and_robust_outliers_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from pybel_ray.ops.stats import robust_outliers_by, winsorize_by

    # group A: 1..100 plus an outlier 10000; group B: constant 5s
    vals = list(range(1, 101)) + [10000] + [5.0] * 20
    grps = ["A"] * 101 + ["B"] * 20
    t = pa.Table.from_arrays(
        [pa.array(grps, pa.string()), pa.array(
            [float(v) for v in vals], pa.float64())],
        names=["g", "v"],
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = winsorize_by(ds, "g", "v").to_pandas()
    a = out[out.g == "A"]
    # p95 of 101 values at rank (100*9500)//10000+1 = 96 -> value 96
    assert a.v_wins_e6.max() == 96_000_000
    # p05 rank (100*500)//10000+1 = 6 -> value 6
    assert a.v_wins_e6.min() == 6_000_000
    b = out[out.g == "B"]
    assert set(b.v_wins_e6) == {5_000_000}

    rows = robust_outliers_by(ds, "g", "v").to_pylist()
    got = {r["g"]: (r["n"], r["n_outliers"]) for r in rows}
    # A: median 51, MAD 25; outliers need |q-51| > 3*25=75 -> values
    # beyond [>126 or <-24]: only the 10000 -> 1
    assert got["A"] == (101, 1)
    # B: MAD 0, no deviation -> 0 outliers
    assert got["B"] == (20, 0)
