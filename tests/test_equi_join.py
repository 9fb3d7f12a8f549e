"""General many-to-many distributed equi-join vs DuckDB on planted
corner cases: duplicate keys both sides, null keys, name collisions,
composite keys, all three join types."""

import duckdb
import pyarrow as pa


L = pa.Table.from_pylist([
    {"k": 1, "x": "a"}, {"k": 1, "x": "b"}, {"k": 2, "x": "c"},
    {"k": 3, "x": "d"}, {"k": None, "x": "e"},
])
R = pa.Table.from_pylist([
    {"k": 1, "y": 10}, {"k": 1, "y": 11}, {"k": 2, "y": 20},
    {"k": 4, "y": 40}, {"k": None, "y": 50},
])

_KEY = lambda t: tuple((v is None, v) for v in t)


def _sorted(rows):
    return sorted(rows, key=_KEY)


def test_equi_join_types_match_duckdb(ray_session):
    import ray

    from pybel_ray.ops.relational import equi_join

    lds = ray.data.from_arrow(L).repartition(2)
    rds = ray.data.from_arrow(R).repartition(3)
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    # full outer coalesces the key (SQL USING semantics) so the key of
    # right-unmatched rows survives — ADVICE r2 fix
    for how, key_expr, sql_how in [
        ("inner", "L.k", "JOIN"),
        ("left", "L.k", "LEFT JOIN"),
        ("full", "COALESCE(L.k, R.k)", "FULL JOIN"),
    ]:
        got = _sorted(
            tuple(r.get(c) for c in ("k", "x", "y"))
            for r in equi_join(lds, rds, "k", how=how, num_buckets=4).take_all()
        )
        exp = _sorted(map(tuple, con.execute(
            f"SELECT {key_expr} AS k, L.x, R.y FROM L {sql_how} R ON L.k = R.k",
        ).fetchall()))
        assert got == exp, how
    # the right-only k=4 row keeps its key in the full join output
    full = equi_join(lds, rds, "k", how="full", num_buckets=4).take_all()
    assert {"k": 4, "x": None, "y": 40} in full
    # null keys never match (5 rows inner: 2x2 fanout + one k=2 pair)
    assert len(equi_join(lds, rds, "k", num_buckets=4).take_all()) == 5


def test_equi_join_composite_and_suffix(ray_session):
    import ray

    from pybel_ray.ops.relational import equi_join

    l2 = pa.Table.from_pylist([
        {"a": 1, "b": "u", "v": 5}, {"a": 1, "b": "w", "v": 6},
    ])
    r2 = pa.Table.from_pylist([
        {"a": 1, "b": "u", "v": 99}, {"a": 2, "b": "u", "v": 98},
    ])
    out = equi_join(
        ray.data.from_arrow(l2), ray.data.from_arrow(r2), ["a", "b"],
        num_buckets=4,
    ).take_all()
    assert out == [{"a": 1, "b": "u", "v": 5, "v_r": 99}]


def test_equi_join_different_key_names(ray_session):
    import ray

    from pybel_ray.ops.relational import equi_join

    l2 = pa.Table.from_pylist([{"lk": 7, "x": "p"}])
    r2 = pa.Table.from_pylist([{"rk": 7, "y": "q"}, {"rk": 8, "y": "z"}])
    out = equi_join(
        ray.data.from_arrow(l2), ray.data.from_arrow(r2),
        "lk", right_on="rk", num_buckets=2,
    ).take_all()
    assert out == [{"lk": 7, "x": "p", "y": "q"}]


def test_topk_per_group_combiner_matches_brute(ray_session):
    """Planted hot key across many blocks: the local top-k combiner plus
    the groupby head must equal a driver-side brute top-k exactly."""
    import ray.data

    from pybel_ray.ops.relational import topk_per_group

    rows = []
    for i in range(5000):  # hot key spans all blocks
        rows.append({"g": "hot", "v": (7919 * i) % 4999, "id": i})
    for key in ("a", "b"):
        for i in range(7):
            rows.append({"g": key, "v": i * 10, "id": 10_000 + i})
    ds = ray.data.from_items(rows).repartition(16)

    got = sorted(
        (r["g"], r["v"], r["id"])
        for r in topk_per_group(ds, "g", "v", 5, tie_keys=["id"]).take_all()
    )
    brute = {}
    for r in rows:
        brute.setdefault(r["g"], []).append(r)
    want = sorted(
        (g, r["v"], r["id"])
        for g, grp in brute.items()
        for r in sorted(grp, key=lambda x: (-x["v"], x["id"]))[:5]
    )
    assert got == want

    asc = sorted(
        (r["g"], r["v"], r["id"])
        for r in topk_per_group(
            ds, "g", "v", 3, descending=False, tie_keys=["id"],
        ).take_all()
    )
    want_asc = sorted(
        (g, r["v"], r["id"])
        for g, grp in brute.items()
        for r in sorted(grp, key=lambda x: (x["v"], x["id"]))[:3]
    )
    assert asc == want_asc


def test_groupby_quantiles_sorted_path_matches_groupby(ray_session):
    """Planted hot key: the sorted rank-arithmetic path must equal the
    per-group path exactly (DuckDB quantile_disc order statistics)."""
    import ray.data

    from pybel_ray.ops.relational import groupby_quantiles

    rows = []
    for i in range(6000):
        rows.append({"g": "hot", "v": float((7919 * i) % 6007)})
    for i in range(41):
        rows.append({"g": "cold", "v": float(i)})
    rows.append({"g": "one", "v": 42.0})
    ds = ray.data.from_items(rows).repartition(11)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]

    def _key(out):
        return sorted(
            (r["g"], tuple(round(r[c], 9) for c in sorted(r) if c != "g"))
            for r in out
        )

    plain = _key(groupby_quantiles(ds, "g", "v", qs).take_all())
    sorted_path = _key(groupby_quantiles(
        ds, "g", "v", qs, max_rows_per_group=100,
    ).take_all())
    assert sorted_path == plain


def test_groupby_quantiles_sorted_path_repeated_values(ray_session):
    """Reviewer scenario: a hot key whose value repeats across many blocks
    used to collapse block partials (identical first-row tuples) and
    KeyError; the unique row-id tiebreak must keep it exact."""
    import ray.data

    from pybel_ray.ops.relational import groupby_quantiles

    rows = [{"g": "A", "v": 0.0} for _ in range(4000)]
    rows += [{"g": "A", "v": 9.0} for _ in range(100)]
    rows += [{"g": "b", "v": float(i)} for i in range(11)]
    ds = ray.data.from_items(rows).repartition(10)

    out = {r["g"]: (r["q50"], r["q100"]) for r in groupby_quantiles(
        ds, "g", "v", [0.5, 1.0], max_rows_per_group=100,
    ).take_all()}
    assert out["A"] == (0.0, 9.0)
    assert out["b"] == (5.0, 10.0)
    # key dtype preserved (int keys stay ints on the sorted path)
    rows_int = [{"g": 7, "v": float(i)} for i in range(500)]
    rows_int += [{"g": 8, "v": 1.0}]
    out_int = groupby_quantiles(
        ray.data.from_items(rows_int).repartition(6), "g", "v", [0.5],
        max_rows_per_group=50,
    ).take_all()
    assert {r["g"] for r in out_int} == {7, 8}
    assert all(isinstance(r["g"], int) for r in out_int)


def test_merge_upsert_matches_window_sql(ray_session):
    import numpy as np
    import ray.data

    from pybel_ray.ops.relational import merge_upsert

    rng = np.random.default_rng(5)
    n = 400
    base = pa.table({
        "k": rng.integers(0, 25, n).astype("int64"),
        "ts": rng.integers(0, 50, n).astype("int64"),
        "rid": np.arange(n, dtype="int64"),
        "val": rng.normal(size=n),
    })
    m = 150
    delta = pa.table({
        "k": rng.integers(0, 25, m).astype("int64"),
        # overlap the base ts range so side priority decides real ties
        "ts": rng.integers(25, 60, m).astype("int64"),
        "rid": np.arange(n, n + m, dtype="int64"),
        "val": rng.normal(size=m),
    })
    out = merge_upsert(
        ray.data.from_arrow(base).repartition(6),
        ray.data.from_arrow(delta).repartition(3),
        "k", "ts", tie_cols=("rid",),
    ).to_pandas().sort_values("k").reset_index(drop=True)

    con = duckdb.connect()
    con.register("b", base.to_pandas())
    con.register("d", delta.to_pandas())
    ref = con.execute("""
        WITH u AS (
            SELECT *, 0 AS from_delta FROM b
            UNION ALL SELECT *, 1 FROM d
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY k ORDER BY ts DESC, from_delta DESC, rid DESC
            ) AS rn FROM u
        )
        SELECT k, ts, rid, val, CAST(from_delta AS BIGINT) AS from_delta
        FROM r WHERE rn = 1 ORDER BY k
    """).fetchdf()
    assert out[["k", "ts", "rid", "val", "from_delta"]].reset_index(drop=True).equals(
        ref.reset_index(drop=True),
    )


def test_merge_upsert_delta_wins_exact_tie(ray_session):
    import ray.data

    from pybel_ray.ops.relational import merge_upsert

    base = pa.table({"k": [1], "ts": [10], "rid": [0], "val": [1.0]})
    delta = pa.table({"k": [1], "ts": [10], "rid": [0], "val": [2.0]})
    out = merge_upsert(
        ray.data.from_arrow(base), ray.data.from_arrow(delta),
        "k", "ts", tie_cols=("rid",),
    ).to_pandas()
    assert len(out) == 1
    assert out["val"][0] == 2.0
    assert out["from_delta"][0] == 1


def test_merge_upsert_hot_key_bounded(ray_session):
    import numpy as np
    import ray.data

    from pybel_ray.ops.relational import merge_upsert

    # a single degenerate key with a long history: the local combiner
    # must reduce each block to one row before the exchange
    n = 5000
    base = pa.table({
        "k": np.zeros(n, dtype="int64"),
        "ts": np.arange(n, dtype="int64"),
        "rid": np.arange(n, dtype="int64"),
    })
    delta = pa.table({
        "k": pa.array([0], pa.int64()),
        "ts": pa.array([n - 1], pa.int64()),
        "rid": pa.array([n], pa.int64()),
    })
    out = merge_upsert(
        ray.data.from_arrow(base).repartition(16),
        ray.data.from_arrow(delta),
        "k", "ts", tie_cols=("rid",),
    ).to_pandas()
    assert len(out) == 1
    # equal max ts: the delta row outranks the base row
    assert out["rid"][0] == n and out["from_delta"][0] == 1


def test_groupby_rollup_matches_sql(ray_session):
    import numpy as np
    import ray.data

    from pybel_ray.ops.relational import groupby_rollup

    rng = np.random.default_rng(13)
    n = 600
    t = pa.table({
        "a": rng.choice(["p", "q", "r"], n),
        "b": rng.choice(["x", "y"], n),
        "c": rng.choice(["u", "v", "w", "z"], n),
        "v": rng.integers(-50, 50, n).astype("int64"),
    })
    out = groupby_rollup(
        ray.data.from_arrow(t).repartition(7), ["a", "b", "c"],
        {"n": ("count", None), "s": ("sum", "v"),
         "lo": ("min", "v"), "hi": ("max", "v")},
    ).to_pandas()
    out = out.sort_values(
        ["grouping_id", "a", "b", "c"], na_position="last",
    ).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ref = con.execute("""
        SELECT a, b, c, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s,
               CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
               CAST(GROUPING_ID(a, b, c) AS BIGINT) AS grouping_id
        FROM t GROUP BY ROLLUP (a, b, c)
        ORDER BY grouping_id, a NULLS LAST, b NULLS LAST, c NULLS LAST
    """).fetchdf()
    assert out[["a", "b", "c", "n", "s", "lo", "hi", "grouping_id"]].equals(
        ref,
    )


def test_groupby_rollup_rejects_mean(ray_session):
    import pytest as _pytest
    import ray.data

    from pybel_ray.ops.relational import groupby_rollup

    t = pa.table({"a": ["x"], "v": [1.0]})
    with _pytest.raises(ValueError):
        groupby_rollup(
            ray.data.from_arrow(t), ["a"], {"m": ("mean", "v")},
        )


def test_equi_join_adaptive_buckets_small_input(ray_session):
    import pandas as pd
    import ray.data

    from pybel_ray.ops.relational import equi_join

    left = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 3], "a": ["w", "x", "y", "z"],
    }))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": [3, 3, 4], "b": ["p", "q", "r"],
    }))
    # num_buckets=None (default) sizes the exchange to the data — on
    # kilobytes it must still produce the exact join result
    out = equi_join(left, right, on="k").to_pandas()
    got = sorted(zip(out["k"], out["a"], out["b"]))
    assert got == [(3, "y", "p"), (3, "y", "q"),
                   (3, "z", "p"), (3, "z", "q")]
    full = equi_join(left, right, on="k", how="full").to_pandas()
    assert sorted(full["k"]) == [1, 2, 3, 3, 3, 3, 4]


def test_broadcast_join_left_keeps_misses(ray_session):
    """how='left' keeps unmatched big-side rows with null payload; the
    same probe inner-joins when how is default."""
    import pyarrow as pa
    import ray

    from pybel_ray.ops.relational import broadcast_join

    big = ray.data.from_items(
        [{"k": i, "v": i * 10} for i in range(8)], override_num_blocks=3,
    )
    small = pa.table({"rk": [1, 3, 5], "name": ["a", "b", "c"]})

    left = sorted(
        (r["k"], r["v"], r["name"])
        for r in broadcast_join(big, small, "k", "rk", how="left").take_all()
    )
    assert left == [
        (0, 0, None), (1, 10, "a"), (2, 20, None), (3, 30, "b"),
        (4, 40, None), (5, 50, "c"), (6, 60, None), (7, 70, None),
    ]

    inner = sorted(
        (r["k"], r["name"])
        for r in broadcast_join(big, small, "k", "rk").take_all()
    )
    assert inner == [(1, "a"), (3, "b"), (5, "c")]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        broadcast_join(big, small, "k", "rk", how="full")


def test_equi_join_broadcast_path_matches_bucketed(ray_session):
    """Auto mode broadcasts a small right side (inner/left); results
    must equal the pinned bucketed path exactly, incl. many-to-many
    duplicate right keys and null keys (never matching)."""
    import ray

    from pybel_ray.ops.relational import equi_join

    left = ray.data.from_items(
        [{"k": i % 5, "lv": i} for i in range(40)]
        + [{"k": None, "lv": 99}],
        override_num_blocks=4,
    )
    right = ray.data.from_items(
        [{"k": 1, "rv": "a"}, {"k": 1, "rv": "b"}, {"k": 3, "rv": "c"},
         {"k": None, "rv": "never"}],
        override_num_blocks=2,
    )

    def _key(ds):
        rows = [(r["k"], r["lv"], r["rv"]) for r in ds.take_all()]
        return sorted(rows, key=lambda x: tuple(
            (v is None, v) for v in x
        ))

    for how in ("inner", "left"):
        auto = _key(equi_join(left, right, on="k", how=how))
        pinned = _key(equi_join(left, right, on="k", how=how,
                                num_buckets=4))
        assert auto == pinned, how
    inner = _key(equi_join(left, right, on="k"))
    assert len(inner) == 8 * 2 + 8  # k=1 matches a+b, k=3 matches c
    assert all(k is not None for k, _, _ in inner)  # null keys no match
    leftj = _key(equi_join(left, right, on="k", how="left"))
    assert len(leftj) == 16 + 8 + 24 + 1  # unmatched k=0,2,4 + null row


def test_grouped_sum_matches_native(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from pybel_ray.ops.relational import grouped_sum

    rng = np.random.default_rng(41)
    n = 5000
    k1 = [f"k{int(x)}" for x in rng.integers(0, 800, n)]
    k1[0] = None  # null key groups alone
    v1 = [int(x) for x in rng.integers(-50, 50, n)]
    v2 = [int(x) for x in rng.integers(0, 9, n)]
    t = pa.Table.from_arrays(
        [pa.array(k1, pa.string()), pa.array(v1, pa.int64()),
         pa.array(v2, pa.int64())],
        names=["k", "a", "b"],
    )
    exp = {}
    for k, a, b in zip(k1, v1, v2):
        cur = exp.setdefault(k, [0, 0])
        cur[0] += a
        cur[1] += b
    for blocks, nb in ((1, None), (6, None), (6, 4)):
        out = grouped_sum(
            ray.data.from_arrow(t).repartition(blocks), "k", ["a", "b"],
            num_buckets=nb,
        ).take_all()
        got = {r["k"]: [r["a"], r["b"]] for r in out}
        assert got == exp, (blocks, nb)

    # composite keys
    t2 = pa.Table.from_arrays(
        [pa.array(["x", "x", "y", None], pa.string()),
         pa.array([1, 2, 1, 1], pa.int64()),
         pa.array([10, 20, 30, 40], pa.int64())],
        names=["g1", "g2", "v"],
    )
    out2 = grouped_sum(
        ray.data.from_arrow(t2).repartition(2), ["g1", "g2"], ["v"],
    ).take_all()
    got2 = {(r["g1"], r["g2"]): r["v"] for r in out2}
    assert got2 == {("x", 1): 10, ("x", 2): 20, ("y", 1): 30, (None, 1): 40}


def test_diversified_topk_floor_and_fill(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.relational import diversified_topk

    # group A scores 100..91, group B scores 10..1: global top-6 with
    # floor 2 -> A's top2 + B's top2 guaranteed, filler = next 2 best
    # non-guaranteed (A 98, 97)
    ids = list(range(20))
    grp = ["A"] * 10 + ["B"] * 10
    score = list(range(100, 90, -1)) + list(range(10, 0, -1))
    t = pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(grp, pa.string()),
         pa.array(score, pa.int64())],
        names=["id", "g", "s"],
    )
    out = diversified_topk(
        ray.data.from_arrow(t).repartition(3), "g", "s", 6, 2, "id",
    ).to_pandas()
    assert sorted(out.id) == [0, 1, 2, 3, 10, 11]
    # zero floor degrades to plain global top-k
    out2 = diversified_topk(
        ray.data.from_arrow(t), "g", "s", 4, 0, "id",
    ).to_pandas()
    assert sorted(out2.id) == [0, 1, 2, 3]


def test_semi_anti_join_broadcast_vs_exchange_parity(ray_session):
    """The zero-exchange broadcast branch (key side under budget) and the
    bucketed exchange branch (forced via budget=0) agree exactly,
    including null-key semantics (semi drops nulls, anti keeps them)."""
    import pyarrow as pa
    import ray

    from pybel_ray.ops.relational import anti_join, semi_join

    data = pa.table({
        "k": pa.array([1, 2, 3, None, 5, 2, 7], pa.int64()),
        "v": pa.array(list("abcdefg")),
    })
    keys = pa.table({"kk": pa.array([2, 5, 9, None], pa.int64())})
    ds = ray.data.from_arrow(data).repartition(3)
    kds = ray.data.from_arrow(keys).repartition(2)

    def rows(out):
        return sorted((r["v"]) for r in out.take_all())

    semi_b = rows(semi_join(ds, "k", kds, "kk"))
    semi_x = rows(semi_join(ds, "k", kds, "kk", broadcast_budget_bytes=0))
    assert semi_b == semi_x == ["b", "e", "f"]

    anti_b = rows(anti_join(ds, "k", kds, "kk"))
    anti_x = rows(
        semi_join(ds, "k", kds, "kk", anti=True, broadcast_budget_bytes=0),
    )
    # null key never matches -> anti keeps row "d"
    assert anti_b == anti_x == ["a", "c", "d", "g"]


def test_groupby_agg_null_keys_unified_both_paths(ray_session):
    """Null keys form their own group on BOTH groupby_agg paths (the
    bucketed integer fast path and the native sort path selected by a
    float mean), for string AND integer key dtypes — the behavior no
    longer depends on the value column's dtype."""
    import ray

    from pybel_ray.ops.relational import groupby_agg, groupby_count

    con = duckdb.connect()
    for key_vals, key_type in [
        (["a", None, "a", "b", None], pa.string()),
        ([1, None, 1, 2, None], pa.int64()),
    ]:
        t = pa.table({
            "k": pa.array(key_vals, key_type),
            "i": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "f": pa.array([1.5, 2.5, 3.5, 4.5, 5.5], pa.float64()),
        })
        ds = ray.data.from_arrow(t).repartition(3)
        con.unregister("t") if "t" in [r[0] for r in con.execute(
            "SHOW TABLES").fetchall()] else None
        con.register("t", t)
        expect = _sorted(
            tuple(r) for r in con.execute(
                "SELECT k, COUNT(*), SUM(i), AVG(f) FROM t GROUP BY k",
            ).fetchall()
        )
        # native path (mean(f) forces it)
        native = groupby_agg(
            ds, "k", {"n": ("count", None), "s": ("sum", "i"),
                      "m": ("mean", "f")},
        ).take_all()
        got_n = _sorted((r["k"], r["n"], r["s"], r["m"]) for r in native)
        assert got_n == expect
        # bucketed fast path (integer-only aggs)
        fast = groupby_agg(
            ds, "k", {"n": ("count", None), "s": ("sum", "i")},
        ).take_all()
        got_f = _sorted((r["k"], r["n"], r["s"]) for r in fast)
        assert got_f == [(k, n, s) for k, n, s, _ in expect]
        # groupby_count shares the contract
        cnt = groupby_count(ds, "k").take_all()
        assert _sorted((r["k"], r["n"]) for r in cnt) == \
            [(k, n) for k, n, _, _ in expect]
