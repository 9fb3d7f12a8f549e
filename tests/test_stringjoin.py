"""edit_distance_join: completeness vs brute force, byte semantics,
bucket-cap behavior, layout invariance."""

import duckdb
import numpy as np
import pyarrow as pa

from pybel_ray.ops.stringjoin import edit_distance_join, edit_distance_leq


def _brute(t: pa.Table, d: int):
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    return con.execute(
        """
        SELECT a.id AS id1, b.id AS id2,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM t a JOIN t b ON a.id < b.id
        WHERE levenshtein(a.s, b.s) <= {d}
        ORDER BY id1, id2
        """.format(d=d),
    ).fetchdf()


def _run(t: pa.Table, d: int, blocks: int = 5):
    import ray.data

    ds = ray.data.from_arrow(t).repartition(blocks)
    return (
        edit_distance_join(ds, "id", "s", max_dist=d)
        .to_pandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )


def test_edit_distance_leq_matches_duckdb():
    con = duckdb.connect()
    rng = np.random.default_rng(3)
    for _ in range(200):
        a = "".join(rng.choice(list("abcx"), size=rng.integers(0, 8)))
        b = "".join(rng.choice(list("abcx"), size=rng.integers(0, 8)))
        ref = con.execute(
            "SELECT levenshtein(?, ?)", [a, b],
        ).fetchone()[0]
        for d in (1, 2):
            got = edit_distance_leq(a, b, d)
            assert got == (ref if ref <= d else -1), (a, b, d)


def test_edit_distance_leq_byte_semantics():
    # DuckDB levenshtein counts BYTES: a 2-byte substitution costs 2
    assert edit_distance_leq("café", "cafe", 2) == 2
    assert edit_distance_leq("café", "cafe", 1) == -1
    assert edit_distance_leq("café", "caffé", 1) == 1


def test_join_matches_brute_random(ray_session):
    rng = np.random.default_rng(11)
    strs = []
    for _ in range(150):
        s = "".join(rng.choice(list("abcde"), size=rng.integers(2, 9)))
        strs.append(s)
        if rng.random() < 0.4:
            j = int(rng.integers(0, len(s)))
            strs.append(s[:j] + "z" + s[j + 1:])
        if rng.random() < 0.2:
            strs.append(s + "q")
    strs += ["", "a", "", "naïve", "naive"]
    t = pa.table({"id": np.arange(len(strs), dtype="int64"), "s": strs})
    for d in (1, 2):
        got = _run(t, d)
        ref = _brute(t, d)
        assert got.equals(ref), d


def test_join_long_rows_take_fallback(ray_session):
    # rows beyond max_vec_len route through the per-row generator and
    # still pair exactly
    strs = ["x" * 200, "x" * 199 + "y", "x" * 199, "short", "shor"]
    t = pa.table({"id": np.arange(len(strs), dtype="int64"), "s": strs})
    got = _run(t, 1, blocks=2)
    ref = _brute(t, 1)
    assert got.equals(ref)


def test_join_null_strings_dropped(ray_session):
    t = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "s": pa.array(["abc", None, "abd"]),
    })
    got = _run(t, 1, blocks=1)
    assert got.values.tolist() == [[0, 2, 1]]


def test_join_bucket_cap_truncates(ray_session):
    # 30 identical strings share every variant bucket; with
    # max_bucket=10 the pair set is capped (10 choose 2), not quadratic
    import ray.data

    t = pa.table({
        "id": pa.array(list(range(30)), pa.int64()),
        "s": pa.array(["same"] * 30),
    })
    out = edit_distance_join(
        ray.data.from_arrow(t).repartition(1), "id", "s",
        max_dist=1, max_bucket=10,
    ).to_pandas()
    assert len(out) == 45  # C(10,2): truncated, logged, still exact dists
    assert (out["dist"] == 0).all()


def test_join_layout_invariant(ray_session):
    rng = np.random.default_rng(5)
    strs = ["".join(rng.choice(list("ab"), size=4)) for _ in range(60)]
    t = pa.table({"id": np.arange(60, dtype="int64"), "s": strs})
    assert _run(t, 1, blocks=1).equals(_run(t, 1, blocks=13))


def test_join_duplicate_ids_with_different_strings(ray_session):
    # a non-unique id column must not cross-wire strings: variant rows
    # re-attach by SOURCE ROW, so (7,'abc')/(9,'abc') still pairs at
    # dist 0 even though another id=7 row carries 'xyz'
    import ray.data

    t = pa.table({
        "id": pa.array([7, 7, 9], pa.int64()),
        "s": pa.array(["abc", "xyz", "abc"]),
    })
    out = (
        edit_distance_join(ray.data.from_arrow(t), "id", "s", max_dist=1)
        .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    )
    assert [7, 9, 0] in out.values.tolist()
