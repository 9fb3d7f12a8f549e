"""Session-6 operators: ordered sequence collection, readability,
table profiling, z-score standardization, trigram top-k, key-skew
profile, host reciprocity."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(rows, blocks=1):
    import ray

    d = ray.data.from_arrow(pa.Table.from_pylist(rows))
    return d.repartition(blocks) if blocks > 1 else d


# ---------------------------------------------------------------------------
# collect_sorted
# ---------------------------------------------------------------------------

SEQ_ROWS = [
    {"k": i % 7, "ord": (i * 31 + 3) % 101, "rid": i,
     "val": "ev%d" % ((i * 13) % 5) if i % 11 else None}
    for i in range(300)
]


def _collect_expect():
    t = pa.Table.from_pylist(SEQ_ROWS)
    return duckdb.sql(
        """
        SELECT k,
               coalesce(string_agg(val, ',' ORDER BY "ord", rid), '') AS seq,
               CAST(count(val) AS BIGINT) AS n_items
        FROM t GROUP BY k ORDER BY k
        """,
    ).fetchall()


def test_collect_sorted_matches_sql(ray_session):
    from pybel_ray.ops.relational import collect_sorted

    out = collect_sorted(
        _ds(SEQ_ROWS, blocks=7), "k", "val", ["ord", "rid"],
    ).take_all()
    got = sorted((r["k"], r["seq"], r["n_items"]) for r in out)
    assert got == [tuple(r) for r in _collect_expect()]


def test_collect_sorted_layout_invariant(ray_session):
    from pybel_ray.ops.relational import collect_sorted

    a = sorted(
        (r["k"], r["seq"])
        for r in collect_sorted(
            _ds(SEQ_ROWS), "k", "val", ["ord", "rid"],
        ).take_all()
    )
    b = sorted(
        (r["k"], r["seq"])
        for r in collect_sorted(
            _ds(SEQ_ROWS, blocks=13), "k", "val", ["ord", "rid"],
        ).take_all()
    )
    assert a == b


def test_collect_sorted_all_null_group(ray_session):
    from pybel_ray.ops.relational import collect_sorted

    rows = [{"k": 1, "ord": 1, "rid": 0, "val": None},
            {"k": 1, "ord": 2, "rid": 1, "val": None},
            {"k": 2, "ord": 1, "rid": 2, "val": "a"}]
    out = {r["k"]: (r["seq"], r["n_items"])
           for r in collect_sorted(_ds(rows), "k", "val", ["ord", "rid"]).take_all()}
    assert out == {1: ("", 0), 2: ("a", 1)}


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------

READ_ROWS = [
    {"doc_id": 0, "text": "Hello world. How are you?"},
    {"doc_id": 1, "text": "One two three four five six seven!"},
    {"doc_id": 2, "text": "No terminal punctuation here"},
    {"doc_id": 3, "text": "???"},
    {"doc_id": 4, "text": "Xy zz qqq."},
    {"doc_id": 5, "text": "The quick brown fox jumps over the lazy dog. "
                          "It was the best of times. Call me Ishmael!"},
]


def test_readability_matches_sql(ray_session):
    from pybel_ray.ops.text import add_readability

    out = sorted(
        add_readability(_ds(READ_ROWS, blocks=3)).take_all(),
        key=lambda r: r["doc_id"],
    )
    t_rows = pa.Table.from_pylist(READ_ROWS)  # noqa: F841
    expect = duckdb.sql(
        r"""
        SELECT doc_id,
               length(regexp_extract_all(text, '\S+')) AS words,
               greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
                   AS sentences,
               length(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS syllables,
               CASE WHEN length(regexp_extract_all(text, '\S+')) = 0
                    THEN NULL
                    ELSE 206835
                         - (1015 * length(regexp_extract_all(text, '\S+')))
                           // greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
                         - (84600 * length(regexp_extract_all(lower(text), '[aeiouy]+')))
                           // length(regexp_extract_all(text, '\S+'))
               END AS flesch_e3
        FROM t_rows ORDER BY doc_id
        """,
    ).fetchall()
    got = [(r["doc_id"], r["words"], r["sentences"], r["syllables"],
            r["flesch_e3"]) for r in out]
    assert got == [tuple(r) for r in expect]


def test_readability_zero_words_null(ray_session):
    from pybel_ray.ops.text import add_readability

    out = add_readability(_ds([{"doc_id": 0, "text": ""}])).take_all()
    assert out[0]["flesch_e3"] is None and out[0]["words"] == 0


# ---------------------------------------------------------------------------
# profile_table / key_profile
# ---------------------------------------------------------------------------

def test_profile_table_matches_sql(ray_session):
    import datetime

    from pybel_ray.ops.profile import profile_table

    rows = [
        {"i": (7 * j) % 23 if j % 5 else None,
         "f": (j * 0.37 - 5.0) if j % 7 else None,
         "s": "s%02d" % (j % 13) if j % 3 else None,
         "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(
             minutes=j * 11)}
        for j in range(200)
    ]
    out = {r["col"]: r for r in profile_table(_ds(rows, blocks=6)).take_all()}
    t = pa.Table.from_pylist(rows)
    expect = duckdb.sql(
        """
        SELECT 'i' col, count(*) n, count(*)-count(i) n_null,
               CAST(min(i) AS BIGINT) min_num, CAST(max(i) AS BIGINT) max_num,
               NULL min_str, NULL max_str FROM t
        UNION ALL
        SELECT 'f', count(*), count(*)-count(f),
               CAST(floor(min(f)*1e6+0.5) AS BIGINT),
               CAST(floor(max(f)*1e6+0.5) AS BIGINT), NULL, NULL FROM t
        UNION ALL
        SELECT 's', count(*), count(*)-count(s), NULL, NULL,
               min(s), max(s) FROM t
        UNION ALL
        SELECT 'ts', count(*), count(*)-count(ts),
               epoch_us(min(ts)), epoch_us(max(ts)), NULL, NULL FROM t
        """,
    ).fetchall()
    for col, n, n_null, mn, mx, smn, smx in expect:
        r = out[col]
        assert (r["n"], r["n_null"], r["min_num"], r["max_num"],
                r["min_str"], r["max_str"]) == (n, n_null, mn, mx, smn, smx), col


def test_profile_table_layout_invariant(ray_session):
    from pybel_ray.ops.profile import profile_table

    rows = [{"a": j % 9, "b": "x%d" % (j % 4)} for j in range(100)]
    a = sorted(map(tuple, (
        (r["col"], r["n"], r["min_num"], r["max_str"])
        for r in profile_table(_ds(rows)).take_all())))
    b = sorted(map(tuple, (
        (r["col"], r["n"], r["min_num"], r["max_str"])
        for r in profile_table(_ds(rows, blocks=11)).take_all())))
    assert a == b


def test_key_profile_matches_sql(ray_session):
    from pybel_ray.ops.profile import key_profile

    rows = [{"k": int(j ** 1.5) % 17, "pad": j} for j in range(500)]
    rows += [{"k": None, "pad": -1}] * 5
    out = key_profile(_ds(rows, blocks=7), "k", k=6).take_all()
    t = pa.Table.from_pylist(rows)
    expect = duckdb.sql(
        """
        WITH c AS (SELECT k, count(*) n FROM t WHERE k IS NOT NULL GROUP BY k),
             tot AS (SELECT sum(n) total, count(*) dk FROM c)
        SELECT c.k, CAST(c.n AS BIGINT) n,
               CAST(c.n * 1000000 // tot.total AS BIGINT) share_ppm,
               CAST(tot.total AS BIGINT) total_rows,
               CAST(tot.dk AS BIGINT) distinct_keys
        FROM c, tot ORDER BY n DESC, k LIMIT 6
        """,
    ).fetchall()
    got = [(r["k"], r["n"], r["share_ppm"], r["total_rows"],
            r["distinct_keys"]) for r in out]
    assert got == [tuple(r) for r in expect]


# ---------------------------------------------------------------------------
# standardize (z-score)
# ---------------------------------------------------------------------------

def test_standardize_matches_numpy_and_sql_semantics(ray_session):
    from pybel_ray.ops.stats import standardize_apply, standardize_stats

    rng = np.random.RandomState(11)
    vecs = rng.randn(120, 5).astype(np.float32)
    vecs[:, 3] = 2.5  # constant dim -> std 0 -> null z
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(120)]
    stats = standardize_stats(_ds(rows, blocks=5))
    out = standardize_apply(_ds(rows, blocks=5), stats).take_all()

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    n = len(q)
    s = q.sum(axis=0).astype(object)
    ss = (q.astype(object) ** 2).sum(axis=0)
    mean_e6 = stats.column("mean_e6").to_numpy()
    std_e6 = stats.column("std_e6").to_numpy()
    for d in range(5):
        var = (n * int(ss[d]) - int(s[d]) ** 2) / (n * n)
        assert std_e6[d] == int(np.floor(var ** 0.5 + 0.5))
    assert std_e6[3] == 0

    got = {(r["vec_id"], r["dim0"]): r["z_e6"] for r in out}
    for i in range(0, 120, 17):
        for d in range(5):
            if d == 3:
                assert got[(i, d)] is None
            else:
                numer = (int(q[i, d]) - int(mean_e6[d])) * 1_000_000
                expect = int(np.sign(numer)) * (abs(numer) // int(std_e6[d]))
                assert got[(i, d)] == expect, (i, d)


def test_standardize_layout_invariant(ray_session):
    from pybel_ray.ops.stats import standardize_apply, standardize_stats

    rng = np.random.RandomState(3)
    rows = [{"vec_id": i, "embedding": rng.randn(4).astype(np.float32).tolist()}
            for i in range(90)]
    sa = standardize_stats(_ds(rows))
    sb = standardize_stats(_ds(rows, blocks=9))
    assert sa.equals(sb)
    a = sorted((r["vec_id"], r["dim0"], r["z_e6"])
               for r in standardize_apply(_ds(rows), sa).take_all())
    b = sorted((r["vec_id"], r["dim0"], r["z_e6"])
               for r in standardize_apply(_ds(rows, blocks=7), sb).take_all())
    assert a == b


# ---------------------------------------------------------------------------
# ngram_topk
# ---------------------------------------------------------------------------

def test_ngram_topk_matches_sql(ray_session):
    from pybel_ray.ops.text import ngram_topk

    rows = [{"doc_id": i,
             "text": " ".join("w%d" % ((i * 7 + j * 3) % 11)
                              for j in range((i % 6) + 1))}
            for i in range(80)]
    rows.append({"doc_id": 80, "text": None})
    rows.append({"doc_id": 81, "text": "   "})
    out = ngram_topk(_ds(rows, blocks=9), n=3, k=15).take_all()
    t = pa.Table.from_pylist(rows)
    expect = duckdb.sql(
        r"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM t
        ),
        pos AS (
            SELECT doc_id, unnest(arr) AS w,
                   unnest(range(1, len(arr) + 1)) AS i
            FROM toks
        ),
        tri AS (
            SELECT a.w || ' ' || b.w || ' ' || c.w AS gram
            FROM pos a
            JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN pos c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        )
        SELECT gram, CAST(count(*) AS BIGINT) n
        FROM tri GROUP BY gram ORDER BY n DESC, gram LIMIT 15
        """,
    ).fetchall()
    assert [(r["gram"], r["n"]) for r in out] == [tuple(r) for r in expect]


def test_ngram_topk_layout_invariant(ray_session):
    from pybel_ray.ops.text import ngram_topk

    rows = [{"text": "p q r s t u v w" if i % 2 else "p q r"}
            for i in range(40)]
    a = [(r["gram"], r["n"])
         for r in ngram_topk(_ds(rows), n=2, k=10).take_all()]
    b = [(r["gram"], r["n"])
         for r in ngram_topk(_ds(rows, blocks=13), n=2, k=10).take_all()]
    assert a == b


def test_ntile_exact_sql_semantics(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from pybel_ray.ops.window import ntile

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "id": np.arange(103), "v": rng.randint(0, 50, 103),
    })
    ds = ray.data.from_pandas(df).map_batches(
        lambda t: t.append_column(
            "_ord", pc.add(pc.multiply(t.column("v"), 1000),
                           t.column("id")),
        ),
        batch_format="pyarrow",
    ).repartition(5)
    for n in (1, 7, 103, 200):
        out = ntile(ds, n, "_ord").to_pandas().set_index("id")["tile"]
        want = duckdb.sql(
            "SELECT id, CAST(NTILE({}) OVER (ORDER BY v*1000+id) AS BIGINT)"
            " AS t FROM df".format(n),
        ).df().set_index("id")["t"]
        assert (out.sort_index() == want.sort_index()).all(), n


def test_skyline_matches_not_exists(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from pybel_ray.ops.relational import skyline

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": np.arange(300),
        "x": rng.randint(0, 15, 300).astype(float),
        "y": rng.randint(0, 15, 300).astype(float),
    })
    # plant an exact duplicate of an extreme point: ties must co-survive
    df.loc[298, ["x", "y"]] = [0.0, 14.0]
    df.loc[299, ["x", "y"]] = [0.0, 14.0]
    ds = ray.data.from_pandas(df).repartition(7)
    got = skyline(ds, [("x", "min"), ("y", "max")]).to_pandas()
    want = duckdb.sql("""
        SELECT k FROM df p WHERE NOT EXISTS (
            SELECT 1 FROM df q
            WHERE q.x <= p.x AND q.y >= p.y
              AND (q.x < p.x OR q.y > p.y))
    """).df()
    assert sorted(got["k"]) == sorted(want["k"])
    assert {298, 299} <= set(got["k"])
    # null dims are excluded by contract
    df2 = df.copy()
    df2.loc[0, "x"] = None
    got2 = skyline(
        ray.data.from_pandas(df2), [("x", "min"), ("y", "max")],
    ).to_pandas()
    assert 0 not in set(got2["k"])


def test_cube_three_keys_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from pybel_ray.ops.relational import groupby_cube

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y", "z"],
        "b": ["p", "q", "p", "p", "q", "q"],
        "c": ["1", "1", "2", "1", "2", "2"],
        "v": [10, 20, 30, 40, 50, 60],
    })
    out = groupby_cube(
        ray.data.from_pandas(df).repartition(3),
        ["a", "b", "c"],
        {"n": ("count", None), "sv": ("sum", "v"),
         "mn": ("min", "v"), "mx": ("max", "v")},
    ).to_pandas()
    want = duckdb.sql("""
        SELECT a, b, c, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS sv,
               CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx,
               CAST(GROUPING_ID(a, b, c) AS BIGINT) AS grouping_id
        FROM df GROUP BY CUBE (a, b, c)
    """).df()
    key = ["grouping_id", "a", "b", "c"]
    got = out.sort_values(key, na_position="first").reset_index(drop=True)
    exp = want.sort_values(key, na_position="first").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[exp.columns], exp, check_dtype=False,
    )


def test_rolling_mean_null_and_window_semantics(ray_session):
    import ray.data

    from pybel_ray.ops.window import rolling_mean_by

    rows = [
        # key a: values 1, None, 3 with window 1-preceding
        {"k": "a", "o": 1, "v": 1.0},
        {"k": "a", "o": 2, "v": None},
        {"k": "a", "o": 3, "v": 3.0},
        {"k": "a", "o": 4, "v": None},
        # key b: single null -> all-null window yields NULL
        {"k": "b", "o": 1, "v": None},
    ]
    out = rolling_mean_by(
        ray.data.from_items(rows).repartition(3),
        "k", ["o"], "v", preceding=1,
    ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    got = [None if v != v else int(v) for v in out["rolling_e6"]]
    # a@1: mean(1)=1e6; a@2: window (1, null) -> 1e6; a@3: (null, 3) ->
    # 3e6; a@4: (3, null) -> 3e6; b@1: NULL
    assert got == [1_000_000, 1_000_000, 3_000_000, 3_000_000, None]


def test_table_digest_layout_invariant_and_typed(ray_session):
    import pytest
    import ray.data

    from pybel_ray.ops.integrity import table_digest

    rows = [{"k": i, "v": "val%d" % (i % 4), "b": i % 2 == 0}
            for i in range(50)]
    ds1 = ray.data.from_items(rows).repartition(1)
    ds7 = ray.data.from_items(list(reversed(rows))).repartition(7)
    d1 = table_digest(ds1)
    d7 = table_digest(ds7)
    assert d1.equals(d7)
    assert d1.column("n_rows")[0].as_py() == 50
    # floats are rejected by contract
    fds = ray.data.from_items([{"k": 1, "x": 1.5}])
    with pytest.raises(Exception):
        table_digest(fds)


def test_table_diff_statuses(ray_session):
    import ray.data

    from pybel_ray.ops.integrity import table_diff

    base = ray.data.from_items(
        [{"k": i, "v": "a%d" % i} for i in range(10)],
    ).repartition(3)
    delta = ray.data.from_items(
        [{"k": i, "v": ("MUT" if i == 4 else "a%d" % i)}
         for i in range(10) if i != 7]
        + [{"k": 99, "v": "new"}],
    ).repartition(2)
    out = table_diff(base, delta, "k", ["v"]).to_pandas()
    got = dict(zip(out["k"], out["status"]))
    assert got == {4: "changed", 7: "removed", 99: "added"}


def test_url_params_and_prefix_filter(ray_session):
    import ray.data

    from pybel_ray.ops.urls import prefix_filter, url_params

    rows = [
        {"id": 1, "url": "https://a.com/p?x=1&y=2&z"},
        {"id": 2, "url": "https://a.com/p"},
        {"id": 3, "url": "https://a.com/p?k=v=w&&m=#frag?notq=1"},
        {"id": 4, "url": None},
    ]
    ds = ray.data.from_items(rows)
    out = url_params(ds, id_col="id").to_pandas()
    got = list(zip(out["id"], out["param"], out["value"]))
    assert sorted(got) == [
        (1, "x", "1"), (1, "y", "2"), (1, "z", ""),
        (3, "k", "v=w"), (3, "m", ""),
    ]
    rules = [("https://a", False), ("https://a.com/p?x", True)]
    f = prefix_filter(ds, rules).to_pandas()
    assert dict(zip(f["id"], f["allowed"])) == {
        1: True, 2: False, 3: False, 4: True,
    }


def test_lead_by_and_corr_stats(ray_session):
    import ray.data

    from pybel_ray.ops.stats import corr_stats
    from pybel_ray.ops.window import lead_by

    rows = [
        {"k": "a", "o": 1, "v": 10}, {"k": "a", "o": 2, "v": 20},
        {"k": "a", "o": 3, "v": 30}, {"k": "b", "o": 1, "v": 5},
    ]
    out = lead_by(
        ray.data.from_items(rows).repartition(2), "k", ["o"], "v",
    ).to_pandas().sort_values(["k", "o"])
    got = [None if x != x else int(x) for x in out["lead"]]
    assert got == [20, 30, None, None]

    df = [{"x": 1.0, "y": 2.0}, {"x": 2.0, "y": 4.5},
          {"x": 3.0, "y": None}, {"x": None, "y": 1.0},
          {"x": -1.25, "y": 3.0}]
    t = corr_stats(ray.data.from_items(df).repartition(3), "x", "y",
                   scale=100)
    # valid pairs: (100,200) (200,450) (-125,300)
    assert t.column("n")[0].as_py() == 3
    assert t.column("sum_x")[0].as_py() == str(100 + 200 - 125)
    assert t.column("sum_y")[0].as_py() == str(200 + 450 + 300)
    assert t.column("sum_xx")[0].as_py() == str(100**2 + 200**2 + 125**2)
    assert t.column("sum_xy")[0].as_py() == str(
        100 * 200 + 200 * 450 + (-125) * 300,
    )


def test_intersect_except_distinct(ray_session):
    import ray.data

    from pybel_ray.ops.relational import except_distinct, intersect_distinct

    a = ray.data.from_items(
        [{"k": v} for v in [1, 1, 2, 3, 4, None]],
    ).repartition(3)
    b = ray.data.from_items(
        [{"k": v} for v in [2, 2, 4, 5, None]],
    ).repartition(2)
    inter = sorted(
        r["k"] for r in intersect_distinct(a, b, "k").take_all()
        if r["k"] is not None
    )
    exc = sorted(
        r["k"] for r in except_distinct(a, b, "k").take_all()
        if r["k"] is not None
    )
    assert inter == [2, 4]
    assert exc == [1, 3]
    # nulls render to the sentinel and behave as one distinct value
    # (SQL INTERSECT/EXCEPT treat NULL = NULL for set membership)
    assert None in [
        r["k"] for r in intersect_distinct(a, b, "k").take_all()
    ]
