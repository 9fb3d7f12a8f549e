"""Expectations op: planted violations per rule kind, null handling,
layout invariance."""

import pyarrow as pa
import pytest
import ray

from pybel_ray.ops.expect import expect


def _rows():
    rows = []
    for i in range(200):
        rows.append({
            "id": i, "v": float(i), "cat": "ok", "s": "k=%d" % i,
        })
    rows.append({"id": 200, "v": None, "cat": "ok", "s": "k=200"})
    rows.append({"id": 201, "v": 999.0, "cat": "bad", "s": "nope"})
    rows.append({"id": 100, "v": 1.0, "cat": "ok", "s": "k=1"})  # dup id
    rows.append({"id": None, "v": 1.0, "cat": None, "s": None})
    return rows


RULES = [
    {"kind": "not_null", "column": "v"},
    {"kind": "between", "column": "v", "lo": 0.0, "hi": 250.0},
    {"kind": "in_set", "column": "cat", "values": ["ok"]},
    {"kind": "regex", "column": "s", "pattern": r"k=\d+"},
    {"kind": "unique", "column": "id"},
]


@pytest.mark.parametrize("blocks", [1, 6])
def test_expect_planted_violations(ray_session, blocks):
    ds = ray.data.from_items(_rows(), override_num_blocks=blocks)
    out = {r["rule"]: r["violations"]
           for r in expect(ds, RULES).to_pylist()}
    assert out == {
        "not_null:v": 1,       # the None v
        "between:v": 1,        # 999.0 (null v not double-counted)
        "in_set:cat": 1,       # "bad"; null cat ignored
        "regex:s": 1,          # "nope"; null s ignored
        "unique:id": 1,        # one surplus duplicate; null id ignored
    }


def test_expect_custom_name_and_unknown_kind(ray_session):
    ds = ray.data.from_items(_rows(), override_num_blocks=2)
    out = expect(ds, [{"kind": "not_null", "column": "v",
                       "name": "v_present"}]).to_pylist()
    assert out == [{"rule": "v_present", "violations": 1}]
    with pytest.raises(ValueError):
        expect(ds, [{"kind": "bogus", "column": "v"}]).to_pylist()


def test_expect_tag_first_rule_wins_and_nulls_pass(ray_session):
    import ray

    from pybel_ray.ops.expect import expect_tag

    tbl = pa.table({
        "id": [1, 2, 3, 4, 5],
        "v": pa.array([5.0, -1.0, None, 300.0, 10.0], pa.float64()),
        "s": ["a", "zz", "a", "zz", "b"],
    })
    rules = [
        {"kind": "between", "column": "v", "lo": 0.0, "hi": 100.0,
         "name": "v_range"},
        {"kind": "in_set", "column": "s", "values": ["a", "b"],
         "name": "s_known"},
    ]
    out = {r["id"]: r["bad_rule"] for r in expect_tag(
        ray.data.from_arrow(tbl).repartition(2), rules,
    ).take_all()}
    # row 2: both rules violated -> FIRST (v_range) wins; row 3: null v
    # passes between; row 4: v out of range
    assert out == {1: None, 2: "v_range", 3: None, 4: "v_range",
                   5: None}


def test_expect_tag_rejects_unique(ray_session):
    import pytest
    import ray

    from pybel_ray.ops.expect import expect_tag

    with pytest.raises(ValueError):
        expect_tag(
            ray.data.from_arrow(pa.table({"k": [1]})),
            [{"kind": "unique", "column": "k"}],
        )
