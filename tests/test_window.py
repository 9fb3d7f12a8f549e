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


def test_lag_by(ray_session):
    from pybel_ray.ops.window import lag_by

    rows = [
        {"u": u, "t": t, "v": u * 100 + t}
        for u in range(5) for t in range(10)
    ]
    out = lag_by(_ds(rows, blocks=4), "u", ["t"], "v", out_col="prev").take_all()
    for r in out:
        if r["t"] == 0:
            assert r["prev"] is None
        else:
            assert r["prev"] == r["v"] - 1


def test_asof_join_matches_duckdb(ray_session):
    import duckdb

    from pybel_ray.ops.window import asof_join

    rs = np.random.RandomState(3)
    left_rows = [
        {"k": int(rs.randint(4)), "ts": int(rs.randint(1000)), "lx": i}
        for i in range(300)
    ]
    right_rows = [
        {"k": k, "rts": t, "payload": k * 10000 + t}
        for k in range(3)  # key 3 never matches
        for t in sorted(rs.choice(1000, size=40, replace=False).tolist())
    ]
    for ineq, op in ((">=", ">="), (">", ">")):
        got = sorted(
            (r["lx"], r["payload"])
            for r in asof_join(
                _ds(left_rows, blocks=5), _ds(right_rows, blocks=3),
                key="k", left_on="ts", right_on="rts",
                take={"payload": "payload"}, inequality=ineq,
            ).take_all()
        )
        con = duckdb.connect()
        con.register("l", pa.Table.from_pylist(left_rows))
        con.register("r", pa.Table.from_pylist(right_rows))
        want = sorted(
            (lx, p)
            for lx, p in con.execute(
                "SELECT l.lx, r.payload FROM l ASOF LEFT JOIN r "
                "ON l.k = r.k AND l.ts {} r.rts".format(op),
            ).fetchall()
        )
        assert got == want, ineq


def test_interval_join_matches_duckdb(ray_session):
    import duckdb

    from pybel_ray.ops.window import interval_join

    rs = np.random.RandomState(11)
    # non-overlapping intervals with gaps per key
    right_rows = []
    for k in range(3):
        pos = 0
        for i in range(30):
            pos += int(rs.randint(5, 40))          # gap
            length = int(rs.randint(0, 20))
            right_rows.append(
                {"k": k, "s": pos, "e": pos + length, "tag": k * 1000 + i},
            )
            pos += length
    left_rows = [
        {"k": int(rs.randint(4)), "ts": int(rs.randint(1200)), "lx": i}
        for i in range(400)
    ]
    got = sorted(
        (r["lx"], r["tag"])
        for r in interval_join(
            _ds(left_rows, blocks=5), _ds(right_rows, blocks=3),
            key="k", left_on="ts", start_col="s", end_col="e",
            take={"tag": "tag"},
        ).take_all()
    )
    con = duckdb.connect()
    con.register("l", pa.Table.from_pylist(left_rows))
    con.register("r", pa.Table.from_pylist(right_rows))
    want = sorted(
        tuple(row)
        for row in con.execute(
            "SELECT l.lx, r.tag FROM l LEFT JOIN r "
            "ON l.k = r.k AND l.ts BETWEEN r.s AND r.e",
        ).fetchall()
    )
    assert got == want
    # gaps really exercise the end check: some matched-by-start rows fail it
    assert any(tag is None for _, tag in got)


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


def _skew_rows(n_hot=5000, seed=3):
    """One degenerate hot key + a few normal keys, shuffled row order."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_hot):
        # non-monotonic timestamps with occasional large session gaps
        rows.append({"k": "hot", "ts": i * 1000 + (7919 * i) % 997,
                     "v": i % 101})
    for key in ("a", "b"):
        for i in range(40):
            rows.append({"k": key, "ts": i * 50_000, "v": i})
    rng.shuffle(rows)
    return rows


def test_lag_by_salted_path_matches_groupby(ray_session):
    """Planted single-key skew: the sorted (skew-proof) path must produce
    the same result as the per-group path, and the probe must engage it."""
    from pybel_ray.ops.window import lag_by, max_group_rows

    rows = _skew_rows()
    ds = _ds(rows, blocks=8)
    assert max_group_rows(ds, "k") == 5000

    def _key(out):
        return sorted((r["k"], r["ts"], r["lag"]) for r in out)

    plain = _key(lag_by(ds, "k", "ts", "v").take_all())
    # threshold far below the hot group -> sorted path engages; 8 blocks
    # mean the hot key spans many blocks, so boundary rows are exercised
    salted = _key(
        lag_by(ds, "k", "ts", "v", max_rows_per_group=100).take_all(),
    )
    assert salted == plain
    assert sum(1 for _, _, lag in salted if lag is None) == 3  # one per key


def test_sessionize_salted_path_matches_groupby(ray_session):
    from pybel_ray.ops.window import sessionize

    rows = []
    # hot key with gaps: sessions split every 10 events (gap 10x normal)
    for i in range(3000):
        ts = i * 1_000 + (9_000 if (i % 10 == 0 and i) else 0)
        ts = i * 1_000 + (i // 10) * 50_000
        rows.append({"k": "hot", "ts": ts, "v": i})
    for i in range(25):
        rows.append({"k": "cold", "ts": i * 30_000, "v": i})
    ds = _ds(rows, blocks=7)

    def _key(out):
        return sorted((r["k"], r["ts"], r["session_seq"]) for r in out)

    plain = _key(sessionize(ds, "k", "ts", gap_us=5_000).take_all())
    salted = _key(
        sessionize(ds, "k", "ts", gap_us=5_000, max_rows_per_group=50).take_all(),
    )
    assert salted == plain
    # the hot key really has many sessions (boundary flags mattered)
    hot_sessions = {s for k, _, s in salted if k == "hot"}
    assert len(hot_sessions) == 300


def test_asof_join_sorted_path_matches_groupby(ray_session):
    """Planted single-key skew: the probe switches asof_join to the sorted
    boundary-carry path, which must equal the per-group path exactly."""
    from pybel_ray.ops.window import asof_join

    # hot key spanning many blocks + two normal keys; right rows sparse so
    # many left rows depend on a right row carried across block boundaries
    left_rows = [{"k": "hot", "ts": i * 10 + 3, "lx": i} for i in range(4000)]
    right_rows = [{"k": "hot", "rts": i * 1000, "tag": i} for i in range(11)]
    for key in ("a", "b"):
        left_rows += [{"k": key, "ts": i * 100, "lx": i} for i in range(30)]
        right_rows += [{"k": key, "rts": i * 700 + 1, "tag": 100 + i}
                       for i in range(4)]
    left_rows.append({"k": "nomatch", "ts": 5, "lx": -1})
    left = _ds(left_rows, blocks=9)
    right = _ds(right_rows, blocks=3)

    def _key(out):
        return sorted(
            (r["k"], r["ts"], r["lx"], r["tag"]) for r in out
        )

    for inequality in (">=", ">"):
        plain = _key(asof_join(
            left, right, "k", "ts", "rts", {"tag": "tag"},
            inequality=inequality,
        ).take_all())
        sorted_path = _key(asof_join(
            left, right, "k", "ts", "rts", {"tag": "tag"},
            inequality=inequality, max_rows_per_group=100,
        ).take_all())
        assert sorted_path == plain
    # unmatched left rows survive with null tag (LEFT semantics)
    assert any(k == "nomatch" and tag is None for k, _, _, tag in sorted_path)


def test_asof_join_sorted_equal_ts_tiebreak(ray_session):
    """right row at exactly a left row's timestamp matches under '>=' and
    not under '>' on the sorted path."""
    from pybel_ray.ops.window import asof_join

    left = _ds([{"k": "x", "ts": 100 + i, "lx": i} for i in range(300)],
               blocks=5)
    right = _ds([{"k": "x", "rts": 100, "tag": 7}], blocks=1)
    ge = asof_join(left, right, "k", "ts", "rts", {"tag": "tag"},
                   inequality=">=", max_rows_per_group=10).take_all()
    assert all(r["tag"] == 7 for r in ge)
    gt = asof_join(left, right, "k", "ts", "rts", {"tag": "tag"},
                   inequality=">", max_rows_per_group=10).take_all()
    by_ts = {r["ts"]: r["tag"] for r in gt}
    assert by_ts[100] is None  # strictly-less: no match at the equal ts
    assert all(tag == 7 for ts, tag in by_ts.items() if ts > 100)


def test_interval_join_sorted_path_matches_groupby(ray_session):
    """interval_join inherits asof_join's skew-proof sorted path."""
    from pybel_ray.ops.window import interval_join

    left = _ds([{"k": "hot", "ts": i * 7, "lx": i} for i in range(3000)],
               blocks=8)
    right = _ds([
        {"k": "hot", "s": j * 3000, "e": j * 3000 + 2000, "tag": j}
        for j in range(8)
    ], blocks=2)

    def _key(out):
        return sorted((r["k"], r["ts"], r["tag"]) for r in out)

    plain = _key(interval_join(
        left, right, "k", "ts", "s", "e", {"tag": "tag"},
    ).take_all())
    sorted_path = _key(interval_join(
        left, right, "k", "ts", "s", "e", {"tag": "tag"},
        max_rows_per_group=100,
    ).take_all())
    assert sorted_path == plain
    # gaps between intervals really produce nulls (containment enforced)
    assert any(tag is None for _, _, tag in plain)
    assert any(tag is not None for _, _, tag in plain)


def test_sorted_paths_with_duplicate_timestamps(ray_session):
    """Reviewer scenario: duplicate (key, ts) rows spanning block
    boundaries used to collide in the boundary dict (identical first-row
    tuples) and corrupt the carried state; the unique row-id tiebreak
    must keep lag/sessionize exact.  Values are a function of ts so the
    lag multiset is well-defined under tie reordering."""
    from pybel_ray.ops.window import lag_by, sessionize

    rows = []
    for i in range(1500):
        ts = (i // 6) * 10  # every timestamp repeated 6x
        rows.append({"k": "hot", "ts": ts, "v": ts * 3})
    for i in range(10):
        rows.append({"k": "cold", "ts": i * 100_000, "v": i})
    ds = _ds(rows, blocks=9)

    def _multiset(out, col):
        return sorted(
            (r["k"], r["ts"], -1 if r[col] is None else r[col]) for r in out
        )

    plain = _multiset(lag_by(ds, "k", "ts", "v").take_all(), "lag")
    sorted_path = _multiset(
        lag_by(ds, "k", "ts", "v", max_rows_per_group=100).take_all(), "lag",
    )
    assert sorted_path == plain

    plain_s = _multiset(
        sessionize(ds, "k", "ts", gap_us=5).take_all(), "session_seq",
    )
    sorted_s = _multiset(
        sessionize(ds, "k", "ts", gap_us=5,
                   max_rows_per_group=100).take_all(), "session_seq",
    )
    assert sorted_s == plain_s


def test_rank_by_matches_duckdb(ray_session):
    """rank/dense_rank per key vs DuckDB window functions (fast path)."""
    import duckdb

    from pybel_ray.ops.window import rank_by

    rows = _skew_rows(n_hot=300)
    ds = _ds(rows, blocks=5)
    out = sorted(
        (r["k"], r["ts"], r["rank"], r["dense_rank"])
        for r in rank_by(ds, "k", ["v", "ts"]).take_all()
    )
    con = duckdb.connect()
    con.register("t", pa.Table.from_pylist(rows))
    expect = sorted(
        tuple(r) for r in con.execute(
            """SELECT k, ts, CAST(rank() OVER w AS BIGINT),
                      CAST(dense_rank() OVER w AS BIGINT)
               FROM t WINDOW w AS (PARTITION BY k ORDER BY v, ts)""",
        ).fetchall()
    )
    assert out == expect


def test_rank_by_sorted_path_matches_groupby(ray_session):
    """Planted single-key skew with tie runs spanning block boundaries:
    the sorted (skew-proof) path must equal the per-group path exactly,
    and the probe must engage it."""
    from pybel_ray.ops.window import max_group_rows, rank_by

    import random

    rng = random.Random(11)
    rows = [{"k": "hot", "i": i, "v": i // 7} for i in range(4000)]
    for key in ("a", "b"):
        rows += [{"k": key, "i": i, "v": i // 3} for i in range(35)]
    rng.shuffle(rows)
    ds = _ds(rows, blocks=9)
    assert max_group_rows(ds, "k") == 4000

    def _key(out):
        return sorted((r["k"], r["i"], r["rank"], r["dense_rank"])
                      for r in out)

    plain = _key(rank_by(ds, "k", ["v"]).take_all())
    salted = _key(
        rank_by(ds, "k", ["v"], max_rows_per_group=100).take_all(),
    )
    assert salted == plain
    # tie runs of 7: rank jumps by 7 per distinct value, dense by 1
    hot = [(i, r, d) for k, i, r, d in salted if k == "hot"]
    assert max(d for _, _, d in hot) == 4000 // 7 + 1
    assert {r for i, r, d in hot if i < 7} == {1}
    assert {r for i, r, d in hot if 7 <= i < 14} == {8}


def test_rank_by_extended_matches_duckdb(ray_session):
    """pct_rank_e6/cume_dist_e6 vs the DuckDB integer-division mirror,
    including tie runs and a 1-row group (PERCENT_RANK edge case)."""
    import duckdb

    from pybel_ray.ops.window import rank_by

    rows = _skew_rows(n_hot=300) + [{"k": "solo", "ts": 0, "v": 9.0}]
    ds = _ds(rows, blocks=5)
    out = sorted(
        (r["k"], r["ts"], r["pct_rank_e6"], r["cume_dist_e6"])
        for r in rank_by(ds, "k", ["v", "ts"], extended=True).take_all()
    )
    con = duckdb.connect()
    con.register("t", pa.Table.from_pylist(rows))
    expect = sorted(
        tuple(r) for r in con.execute(
            """SELECT k, ts,
                      CASE WHEN count(*) OVER p = 1 THEN 0
                           ELSE CAST((rank() OVER w - 1) * 1000000
                                // (count(*) OVER p - 1) AS BIGINT) END,
                      CAST(count(*) OVER (
                               PARTITION BY k ORDER BY v, ts
                               RANGE BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW
                           ) * 1000000 // count(*) OVER p AS BIGINT)
               FROM t WINDOW w AS (PARTITION BY k ORDER BY v, ts),
                             p AS (PARTITION BY k)""",
        ).fetchall()
    )
    assert out == expect
    solo = [r for r in out if r[0] == "solo"]
    assert solo == [("solo", 0, 0, 1_000_000)]


def test_rank_by_extended_sorted_path_matches_groupby(ray_session):
    """Planted single-key skew with tie runs spanning block boundaries:
    extended=True on the sorted (skew-proof) path must equal the
    per-group path exactly — group sizes and run totals ride the
    boundary fold's backward pass, no extra exchange."""
    import random

    from pybel_ray.ops.window import max_group_rows, rank_by

    rng = random.Random(13)
    # tie runs of 7 in the hot key guarantee runs crossing block
    # boundaries after the sort; small keys + a solo row pin the group
    # edges (PERCENT_RANK=0 for a 1-row group)
    rows = [{"k": "hot", "i": i, "v": i // 7} for i in range(4000)]
    for key in ("a", "b"):
        rows += [{"k": key, "i": i, "v": i // 3} for i in range(35)]
    rows += [{"k": "solo", "i": 0, "v": 1}]
    rng.shuffle(rows)
    ds = _ds(rows, blocks=9)
    assert max_group_rows(ds, "k") == 4000

    def _key(out):
        return sorted(
            (r["k"], r["i"], r["rank"], r["dense_rank"],
             r["pct_rank_e6"], r["cume_dist_e6"])
            for r in out
        )

    plain = _key(rank_by(ds, "k", ["v"], extended=True).take_all())
    sorted_path = _key(
        rank_by(ds, "k", ["v"], max_rows_per_group=100,
                extended=True).take_all(),
    )
    assert sorted_path == plain
    solo = [r for r in sorted_path if r[0] == "solo"]
    assert solo == [("solo", 0, 1, 1, 0, 1_000_000)]
    # hot group: rows of the first tie run (v=0, 7 rows) have pct 0 and
    # cume 7/4000
    hot0 = [r for r in sorted_path if r[0] == "hot" and r[1] < 7]
    assert {r[4] for r in hot0} == {0}
    assert {r[5] for r in hot0} == {7 * 1_000_000 // 4000}
    # last tie run (v=571, rows 3997..3999): rank 3998, cume = 1e6
    hot_last = [r for r in sorted_path if r[0] == "hot" and r[1] >= 3997]
    assert {r[2] for r in hot_last} == {3998}
    assert {r[5] for r in hot_last} == {1_000_000}


def _ffill_rows(seed=11, n=3000, null_rate=0.5):
    """Keys with interleaved null values; some keys all-null, one key
    whose non-nulls are sparse enough that whole sort blocks of it can
    be all-null (exercises the boundary carry-through)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.choice(["a", "b", "hot", "hot", "hot", "allnull"])
        v = None if (k == "allnull" or rng.random() < null_rate) \
            else rng.randint(0, 10**6)
        rows.append({"k": k, "ts": i, "v": v})
    return rows


def _ffill_expected(rows):
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["k"], r["ts"])):
        by_key[r["k"]].append(r)
    out = []
    for k, grp in by_key.items():
        last = None
        for r in grp:
            if r["v"] is not None:
                last = r["v"]
            out.append((k, r["ts"], last))
    return sorted(out)


def test_forward_fill_by_matches_reference(ray_session):
    from pybel_ray.ops.window import forward_fill_by

    rows = _ffill_rows()
    ds = _ds(rows, blocks=6)
    got = sorted(
        (r["k"], r["ts"], r["filled"])
        for r in forward_fill_by(ds, "k", "ts", "v").take_all()
    )
    assert got == _ffill_expected(rows)


def test_forward_fill_sorted_path_matches_groupby(ray_session):
    """Planted skew: the sorted boundary-exchange path must equal the
    per-group path, including all-null blocks inside a hot key run."""
    from pybel_ray.ops.window import forward_fill_by

    rows = _ffill_rows(seed=5, n=4000, null_rate=0.9)
    ds = _ds(rows, blocks=8)
    plain = sorted(
        (r["k"], r["ts"], r["filled"])
        for r in forward_fill_by(ds, "k", "ts", "v").take_all()
    )
    sorted_path = sorted(
        (r["k"], r["ts"], r["filled"])
        for r in forward_fill_by(
            ds, "k", "ts", "v", max_rows_per_group=100,
        ).take_all()
    )
    assert sorted_path == plain == _ffill_expected(rows)
    # leading rows before any non-null stay null
    assert any(v is None for _, _, v in plain)


def test_resample_locf_matches_reference(ray_session):
    """Daily grid over irregular per-key observations: grid values are
    the latest observation at-or-before each grid point; grids start at
    the first step multiple >= the key's first observation."""
    import random

    from pybel_ray.ops.window import resample_locf

    rng = random.Random(21)
    rows = []
    for k in ("a", "b", "c"):
        t0 = rng.randint(0, 50)
        for _ in range(60):
            t0 += rng.randint(1, 40)
            rows.append({"k": k, "ts": t0, "v": rng.randint(0, 999)})
    step = 100
    ds = _ds(rows, blocks=5)
    got = sorted(
        (r["k"], r["grid_ts"], r["v"])
        for r in resample_locf(ds, "k", "ts", "v", step).take_all()
    )

    expect = []
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in rows:
        by_key[r["k"]].append((r["ts"], r["v"]))
    for k, obs in by_key.items():
        obs.sort()
        lo = -(-obs[0][0] // step) * step
        g = lo
        while g <= obs[-1][0]:
            val = max((o for o in obs if o[0] <= g))[1]
            expect.append((k, g, val))
            g += step
    assert got == sorted(expect)


def test_debounce_by_planted_bursts(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.window import debounce_by

    # user 1 typeA: burst at 0s, 100s, 250s, then 700s -> keep 0 and 700
    # (100 within 300 of 0; 250 within 300 of 100 even though 100 was
    # itself dropped: LAG semantics); user 2: single event kept
    t = pa.Table.from_arrays(
        [pa.array([1, 2, 3, 4, 5], pa.int64()),
         pa.array([1, 1, 1, 1, 2], pa.int64()),
         pa.array(["A", "A", "A", "A", "A"], pa.string()),
         pa.array([0, 100_000_000, 250_000_000, 700_000_000, 0],
                  pa.int64())],
        names=["event_id", "user_id", "event_type", "ts"],
    )
    out = debounce_by(
        ray.data.from_arrow(t).repartition(2),
        ["user_id", "event_type"], "ts",
        gap_us=300_000_000, tie_cols=["event_id"],
    )
    kept = sorted(r["event_id"] for r in out.take_all())
    assert kept == [1, 4, 5]


def test_mad_e6_known_values(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.stats import mad_e6

    # values 1..7 with an outlier 100: lower median of 8 values = 4,
    # deviations |v-4| = 3,2,1,0,1,2,3,96 -> sorted 0,1,1,2,2,3,3,96,
    # lower median = 2
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    t = pa.Table.from_arrays(
        [pa.array(vals, pa.float64())], names=["value"],
    )
    out = mad_e6(ray.data.from_arrow(t).repartition(3), "value")
    row = out.to_pylist()[0]
    assert row == {"n": 8, "median_e6": 4_000_000, "mad_e6": 2_000_000}

    empty = pa.Table.from_arrays(
        [pa.array([], pa.float64())], names=["value"],
    )
    row0 = mad_e6(ray.data.from_arrow(empty), "value").to_pylist()[0]
    assert row0 == {"n": 0, "median_e6": None, "mad_e6": None}


def test_resample_locf_tie_col_fused_dedup(ray_session):
    """With tie_col, duplicate observations at one (key, ts) resolve to
    the max-tie value inside the fill pass — identical to an upstream
    max-tie dedup, with one less exchange."""
    from pybel_ray.ops.window import resample_locf

    rows = [
        # key a: three obs at ts=105 with ids 1..3 (id 3 wins -> v=30),
        # a later singleton at 230
        {"k": "a", "ts": 105, "v": 10, "id": 1},
        {"k": "a", "ts": 105, "v": 30, "id": 3},
        {"k": "a", "ts": 105, "v": 20, "id": 2},
        {"k": "a", "ts": 230, "v": 7, "id": 4},
        # key b: tie exactly ON a grid point (ts=300)
        {"k": "b", "ts": 300, "v": 1, "id": 9},
        {"k": "b", "ts": 300, "v": 2, "id": 11},
        {"k": "b", "ts": 300, "v": 3, "id": 10},
        {"k": "b", "ts": 420, "v": 4, "id": 12},
    ]
    got = sorted(
        (r["k"], r["grid_ts"], r["v"])
        for r in resample_locf(
            _ds(rows, blocks=4), "k", "ts", "v", 100, tie_col="id",
        ).take_all()
    )
    assert got == [
        ("a", 200, 30),  # max-id obs at 105 carried
        ("b", 300, 2),   # id 11 wins on the grid point itself
        ("b", 400, 2),
    ]
