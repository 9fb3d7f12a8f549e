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
