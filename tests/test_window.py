"""Distributed prefix scan: running sums, row numbers, budget packing."""

import numpy as np
import pyarrow as pa


def _ds(rows, blocks=1):
    import ray

    d = ray.data.from_arrow(pa.Table.from_pylist(rows))
    return d.repartition(blocks) if blocks > 1 else d


ROWS = [
    {"id": i, "v": (i * 37 + 11) % 90 + 1}
    for i in np.random.RandomState(7).permutation(500)
]


def test_running_sum(ray_session):
    from pybel_ray.ops.window import running_sum

    out = sorted(
        running_sum(_ds(ROWS, blocks=9), "id", "v").take_all(),
        key=lambda r: r["id"],
    )
    vals = [r["v"] for r in out]
    expect = np.cumsum(vals)
    assert [r["running"] for r in out] == list(expect)


def test_running_sum_block_invariant(ray_session):
    from pybel_ray.ops.window import running_sum

    a = sorted(
        (r["id"], r["running"])
        for r in running_sum(_ds(ROWS), "id", "v").take_all()
    )
    b = sorted(
        (r["id"], r["running"])
        for r in running_sum(_ds(ROWS, blocks=17), "id", "v").take_all()
    )
    assert a == b


def test_global_row_number(ray_session):
    from pybel_ray.ops.window import global_row_number

    out = sorted(
        global_row_number(_ds(ROWS, blocks=5), "id").take_all(),
        key=lambda r: r["id"],
    )
    assert [r["row_number"] for r in out] == list(range(1, 501))


def test_pack_by_budget(ray_session):
    from pybel_ray.ops.window import pack_by_budget

    budget = 700
    out = sorted(
        pack_by_budget(_ds(ROWS, blocks=6), budget, "id", "v").take_all(),
        key=lambda r: r["id"],
    )
    # formula check: shard = exclusive running // budget
    run = 0
    for r in out:
        assert r["shard_id"] == run // budget
        run += r["v"]
    # shard ids are contiguous from 0 and each shard is near the budget
    shards = {}
    for r in out:
        shards.setdefault(r["shard_id"], 0)
        shards[r["shard_id"]] += r["v"]
    assert sorted(shards) == list(range(len(shards)))
    max_item = max(r["v"] for r in out)
    for sid, total in shards.items():
        if sid != max(shards):
            assert total <= budget + max_item
