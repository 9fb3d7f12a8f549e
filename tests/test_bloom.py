"""Bloom-filter semi-join: exact mode equals a set semi-join even with
forced false positives; prefilter-only mode is a superset."""

import numpy as np
import pyarrow as pa


def _ds(rows, blocks=4):
    import ray

    d = ray.data.from_arrow(pa.Table.from_pylist(rows))
    return d.repartition(blocks) if blocks > 1 else d


BIG = [{"k": i, "payload": "p%d" % i} for i in range(2000)]
KEYS = [{"kk": i} for i in range(0, 2000, 7)]  # every 7th key
TRUE = {i for i in range(2000) if i % 7 == 0}


def test_bloom_exact_equals_set_semi_join(ray_session):
    from pybel_ray.ops.bloom import bloom_semi_join

    # 256 bits for ~286 keys -> the filter saturates, false positives
    # guaranteed; the exact path must still return the true semi-join
    out = bloom_semi_join(
        _ds(BIG), "k", _ds(KEYS, blocks=3), "kk", n_bits=256, n_hashes=2,
    ).to_pandas()
    assert set(out["k"]) == TRUE
    assert len(out) == len(TRUE)  # no duplicate rows introduced


def test_bloom_prefilter_superset(ray_session):
    from pybel_ray.ops.bloom import bloom_semi_join

    out = bloom_semi_join(
        _ds(BIG), "k", _ds(KEYS), "kk", n_bits=256, n_hashes=2,
        exact=False,
    ).to_pandas()
    got = set(out["k"])
    assert TRUE <= got  # no false negatives, ever
    assert len(got) > len(TRUE)  # saturated filter really produced fps


def test_bloom_prefilter_tight_when_sized(ray_session):
    from pybel_ray.ops.bloom import bloom_semi_join

    out = bloom_semi_join(
        _ds(BIG), "k", _ds(KEYS), "kk", n_bits=1 << 16, n_hashes=4,
        exact=False,
    ).to_pandas()
    got = set(out["k"])
    assert TRUE <= got
    # fp rate at 64k bits / 286 keys is ~0: allow a tiny slack
    assert len(got) - len(TRUE) <= 5


def test_bloom_null_keys_dropped(ray_session):
    from pybel_ray.ops.bloom import bloom_semi_join

    big = [{"k": 1}, {"k": None}, {"k": 7}, {"k": 3}]
    keys = [{"k": 7}, {"k": None}, {"k": 1}]
    out = bloom_semi_join(
        _ds(big, blocks=2), "k", _ds(keys, blocks=2), n_bits=1 << 10,
    ).to_pandas()
    assert sorted(out["k"]) == [1, 7]  # nulls never match


def test_bloom_build_layout_invariant(ray_session):
    from pybel_ray.ops.bloom import build_bloom

    a = build_bloom(_ds(KEYS, blocks=2), "kk", n_bits=1 << 12)
    b = build_bloom(_ds(KEYS, blocks=9), "kk", n_bits=1 << 12)
    assert np.array_equal(a, b)


def test_bloom_validation(ray_session):
    import pytest

    from pybel_ray.ops.bloom import build_bloom

    with pytest.raises(ValueError):
        build_bloom(_ds(KEYS), "kk", n_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom(_ds(KEYS), "kk", n_hashes=9)
