"""KMV distinct-count sketch: exact below k, bounded error above."""

import numpy as np
import pyarrow as pa


def _ds(values, blocks=8):
    import ray

    t = pa.Table.from_arrays([pa.array([str(v) for v in values])], names=["v"])
    return ray.data.from_arrow(t).repartition(blocks)


def test_kmv_exact_below_k(ray_session):
    from pybel_ray.ops.sketch import approx_distinct

    vals = [i % 700 for i in range(20000)]  # 700 distinct < k
    assert approx_distinct(_ds(vals), "v", k=1024) == 700


def test_kmv_approximate_above_k(ray_session):
    from pybel_ray.ops.sketch import approx_distinct

    rs = np.random.RandomState(5)
    vals = rs.randint(0, 10**12, size=60000)  # ~60k distinct >> k
    true = len(set(vals.tolist()))
    est = approx_distinct(_ds(vals.tolist(), blocks=12), "v", k=1024)
    assert abs(est - true) / true < 0.10  # ~3 sigma at k=1024


def test_kmv_block_layout_invariant(ray_session):
    from pybel_ray.ops.sketch import approx_distinct

    vals = [i * 7 for i in range(30000)]
    a = approx_distinct(_ds(vals, blocks=3), "v", k=512)
    b = approx_distinct(_ds(vals, blocks=23), "v", k=512)
    assert a == b  # the merged k-minimum set is layout-independent


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _docs_ds(texts, blocks=4):
    import ray

    t = pa.Table.from_arrays(
        [pa.array(list(range(len(texts))), pa.int64()), pa.array(texts)],
        names=["doc_id", "text"],
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _true_counts(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(t.strip().split())
    return c


def test_cms_never_underestimates(ray_session):
    from pybel_ray.ops.sketch import cms_heavy_hitters

    rs = np.random.RandomState(7)
    vocab = ["w%d" % i for i in range(300)]
    texts = [
        " ".join(rs.choice(vocab, size=40).tolist()) for _ in range(200)
    ]
    true = _true_counts(texts)
    # narrow sketch -> collisions guaranteed (300 words into 64 slots)
    out = cms_heavy_hitters(
        _docs_ds(texts), threshold=1, width=64, depth=2,
    ).to_pandas()
    est = dict(zip(out["word"], out["est_n"]))
    assert set(est) == set(true)  # threshold=1 keeps everything
    for w, n in true.items():
        assert est[w] >= n  # the CMS upper-bound guarantee


def test_cms_exact_when_wide(ray_session):
    from pybel_ray.ops.sketch import cms_heavy_hitters

    texts = ["a a a b b c"] * 50 + ["d e"] * 10
    true = _true_counts(texts)
    # wide sketch over a tiny vocabulary -> (almost surely) no collisions
    out = cms_heavy_hitters(
        _docs_ds(texts), threshold=1, width=1 << 16, depth=4,
    ).to_pandas()
    est = dict(zip(out["word"], out["est_n"]))
    assert est == dict(true)


def test_cms_threshold_superset(ray_session):
    from pybel_ray.ops.sketch import cms_heavy_hitters

    rs = np.random.RandomState(11)
    vocab = ["w%d" % i for i in range(500)]
    heavy = ["hot1", "hot2"]
    texts = [
        " ".join(rs.choice(vocab, size=20).tolist() + heavy)
        for _ in range(300)
    ]
    true = _true_counts(texts)
    out = cms_heavy_hitters(
        _docs_ds(texts, blocks=7), threshold=250, width=128, depth=2,
    ).to_pandas()
    got = set(out["word"])
    true_heavy = {w for w, n in true.items() if n >= 250}
    assert true_heavy <= got  # every true heavy hitter survives


def test_cms_depth_validation(ray_session):
    import pytest

    from pybel_ray.ops.sketch import cms_from_partials
    from pybel_ray.ops.text import token_count_partials

    partials = token_count_partials(_docs_ds(["a b c"]))
    with pytest.raises(ValueError):
        cms_from_partials(partials, width=16, depth=5)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_error_bound(ray_session):
    from pybel_ray.ops.sketch import hll_distinct

    rs = np.random.RandomState(13)
    vals = rs.randint(0, 10**12, size=60000)
    true = len(set(vals.tolist()))
    est = hll_distinct(_ds(vals.tolist(), blocks=9), "v")
    assert abs(est - true) / true < 0.20  # ~3 sigma at m=256


def test_hll_small_range_reasonable(ray_session):
    from pybel_ray.ops.sketch import hll_distinct

    vals = [i % 40 for i in range(5000)]  # 40 distinct << m
    est = hll_distinct(_ds(vals), "v")
    assert abs(est - 40) <= 8  # linear-counting regime


def test_hll_layout_and_merge_invariant(ray_session):
    from pybel_ray.ops.sketch import hll_registers

    vals = [i * 3 for i in range(20000)]
    a = hll_registers(_ds(vals, blocks=2), "v")
    b = hll_registers(_ds(vals, blocks=17), "v")
    assert np.array_equal(a, b)  # max-merge is layout-independent


def test_hll_registers_match_python(ray_session):
    import hashlib

    from pybel_ray.ops.sketch import HLL_M, hll_registers

    vals = ["item%d" % i for i in range(3000)]
    regs = hll_registers(_ds(vals, blocks=5), "v")
    ref = np.zeros(HLL_M, np.int64)
    for v in vals:
        h = hashlib.md5(v.encode()).hexdigest()
        b, rank = int(h[:2], 16), int(h[2:15], 16)
        rho = 53 - rank.bit_length() if rank else 53
        ref[b] = max(ref[b], rho)
    assert np.array_equal(regs, ref)


def _gds(groups, values, blocks=8):
    import ray

    t = pa.Table.from_arrays(
        [pa.array([str(g) for g in groups]), pa.array([str(v) for v in values])],
        names=["g", "v"],
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _ref_group_regs(groups, values):
    import hashlib

    from pybel_ray.ops.sketch import HLL_M

    out = {}
    for g, v in zip(groups, values):
        regs = out.setdefault(str(g), np.zeros(HLL_M, np.int64))
        h = hashlib.md5(str(v).encode()).hexdigest()
        b, rank = int(h[:2], 16), int(h[2:15], 16)
        rho = 53 - rank.bit_length() if rank else 53
        regs[b] = max(regs[b], rho)
    return out


def test_hll_by_group_matches_python(ray_session):
    from pybel_ray.ops.sketch import hll_registers_by_group

    groups = ["g%d" % (i % 3) for i in range(5000)]
    vals = ["item%d" % (i % 1100) for i in range(5000)]
    out = hll_registers_by_group(_gds(groups, vals), "g", "v").to_pandas()
    ref = _ref_group_regs(groups, vals)
    for g, sub in out.groupby("g"):
        got = dict(zip(sub["bucket"], sub["rho"]))
        exp = {b: r for b, r in enumerate(ref[g]) if r}
        assert got == exp, g


def test_hll_by_group_layout_invariant(ray_session):
    from pybel_ray.ops.sketch import hll_registers_by_group

    groups = ["t%d" % (i % 5) for i in range(8000)]
    vals = [i * 7 for i in range(8000)]
    a = hll_registers_by_group(_gds(groups, vals, blocks=2), "g", "v") \
        .to_pandas().sort_values(["g", "bucket"]).reset_index(drop=True)
    b = hll_registers_by_group(_gds(groups, vals, blocks=23), "g", "v") \
        .to_pandas().sort_values(["g", "bucket"]).reset_index(drop=True)
    assert a.equals(b)


def test_hll_by_group_null_rows_skipped(ray_session):
    import ray

    from pybel_ray.ops.sketch import hll_registers_by_group

    t = pa.Table.from_arrays(
        [pa.array(["a", "a", None, "b"]), pa.array(["x", None, "y", "z"])],
        names=["g", "v"],
    )
    out = hll_registers_by_group(
        ray.data.from_arrow(t), "g", "v",
    ).to_pandas()
    # only (a,x) and (b,z) contribute: one register row per group
    assert sorted(out["g"]) == ["a", "b"]


def test_hll_group_estimates_small_exact(ray_session):
    from pybel_ray.ops.sketch import hll_group_estimates

    # well below m=256 the linear-counting correction is near-exact;
    # 40 distinct per group estimates within ±15%
    groups = ["g%d" % (i % 4) for i in range(4000)]
    vals = ["u%d" % ((i // 4) % 40) for i in range(4000)]
    est = hll_group_estimates(_gds(groups, vals), "g", "v").to_pandas()
    assert len(est) == 4
    for v in est["approx_distinct"]:
        assert abs(int(v) - 40) <= 6


def test_dd_msb_head_exact_at_boundaries():
    from pybel_ray.ops.sketch import _dd_msb_head

    vals = []
    for k in range(1, 64):
        for d in (-1, 0, 1):
            v = (1 << k) + d
            if 0 < v < (1 << 63):
                vals.append(v)
    vals += [(1 << 63) - 1, (1 << 62)]
    rng = np.random.default_rng(0)
    vals += [
        int(x)
        for x in rng.integers(1, (1 << 63) - 1, size=5000, dtype=np.int64)
    ]
    av = np.array(vals, dtype=np.int64)
    msb, head = _dd_msb_head(av, 3)
    exp_msb = np.array([v.bit_length() for v in vals], dtype=np.int64)
    assert (msb == exp_msb).all()
    exp_head = av >> np.maximum(exp_msb - 1 - 3, 0)
    assert (head == exp_head).all()


def test_ddsketch_quantile_error_bound(ray_session):
    import ray

    from pybel_ray.ops.sketch import ddsketch_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.lognormal(3, 2, 5000),
        -rng.lognormal(1, 1, 1000),
        np.zeros(50),
    ])
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    out = ddsketch_quantiles(ds, "v", qs)
    est = dict(zip(out.column("q").to_pylist(), out.column("value").to_pylist()))
    for q in qs:
        exact = float(np.quantile(vals, q))
        # bucket half-width: 2^-(sub_bits+1) relative, plus micros rounding
        assert abs(est[q] - exact) <= abs(exact) * 2 ** -4 + 1e-6, q


def test_ddsketch_layout_invariant(ray_session):
    import ray

    from pybel_ray.ops.sketch import ddsketch_buckets

    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.lognormal(2, 3, 2000), -rng.lognormal(0, 2, 500)])
    t = pa.table({"v": vals})

    def tbl(blocks):
        ds = ray.data.from_arrow(t).repartition(blocks)
        return (
            ddsketch_buckets(ds, "v")
            .to_pandas()
            .sort_values(["sign", "msb", "head"])
            .reset_index(drop=True)
        )

    assert tbl(1).equals(tbl(13))


def test_ddsketch_quantile_table_matches_float(ray_session):
    import ray

    from pybel_ray.ops.sketch import ddsketch_quantile_table, ddsketch_quantiles

    rng = np.random.default_rng(11)
    vals = rng.lognormal(1, 2, 3000)
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    qt = ddsketch_quantile_table(ds, "v", [0, 5000, 9900, 10000])
    fl = ddsketch_quantiles(ds, "v", [0.0, 0.5, 0.99, 1.0])
    # value_e6 is the floor bucket midpoint in micros (within half a
    # micro of the float midpoint readout)
    for iv, fv in zip(qt.column("value_e6").to_pylist(),
                      fl.column("value").to_pylist()):
        assert abs(iv / 1e6 - fv) <= 1e-6


def test_ddsketch_large_magnitude_buckets(ray_session):
    import ray

    from pybel_ray.ops.sketch import ddsketch_quantile_table

    # raw values whose micros reach bit length 62-63: the former
    # left-shift readout overflowed int64 here
    vals = [4.6e12, 9.2e12, -4.6e12, 1.0]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
    out = ddsketch_quantile_table(ds, "v", [0, 10000])
    got = dict(zip(out.column("q_bp").to_pylist(),
                   out.column("value_e6").to_pylist()))
    assert got[0] < 0 and got[0] / 1e6 > -4.9e12
    assert abs(got[10000] / 1e6 - 9.2e12) <= 9.2e12 * 2 ** -4


def test_ddsketch_by_group_matches_global_per_group(ray_session):
    import ray

    from pybel_ray.ops.sketch import ddsketch_buckets, ddsketch_buckets_by_group

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.lognormal(1, 2, 800), -rng.lognormal(0, 1, 200)])
    grp = rng.integers(0, 3, len(vals))
    t = pa.table({"g": grp.astype("int64"), "v": vals})
    ds = ray.data.from_arrow(t).repartition(7)
    by = (
        ddsketch_buckets_by_group(ds, "g", "v")
        .to_pandas()
        .sort_values(["g", "sign", "msb", "head"])
        .reset_index(drop=True)
    )
    for g in range(3):
        sub = pa.table({"v": vals[grp == g]})
        ref = (
            ddsketch_buckets(ray.data.from_arrow(sub).repartition(3), "v")
            .to_pandas()
            .sort_values(["sign", "msb", "head"])
            .reset_index(drop=True)
        )
        got = (
            by[by["g"] == g]
            .drop(columns=["g"])
            .sort_values(["sign", "msb", "head"])
            .reset_index(drop=True)
        )
        assert got.equals(ref), g


def test_ddsketch_by_group_null_values_and_groups(ray_session):
    import ray

    from pybel_ray.ops.sketch import ddsketch_buckets_by_group

    t = pa.table({
        "g": pa.array(["a", "a", None, "b", "b"]),
        "v": pa.array([1.0, None, 2.0, 2.0, 2.0]),
    })
    out = ddsketch_buckets_by_group(
        ray.data.from_arrow(t).repartition(2), "g", "v",
    ).to_pandas()
    # null values AND null group keys are dropped (the
    # hll_registers_by_group convention — Ray's groupby exchange
    # cannot sort a null key)
    assert int(out["n"].sum()) == 3
    assert not out["g"].isna().any()
    assert out[out["g"] == "b"]["n"].sum() == 2
