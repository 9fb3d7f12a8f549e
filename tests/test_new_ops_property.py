"""Hypothesis property tests for the newest operator families: random
corpora/tables are checked against DuckDB (joins, windows, chunking) —
the same contract as the driver oracle gate, but over adversarial
shapes instead of the fixed synthetic tables."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st


def _ds(table, blocks=3):
    import ray

    return ray.data.from_arrow(table).repartition(blocks)


_SMALL = dict(max_examples=10, deadline=None)


words = st.text(alphabet="ab x", min_size=0, max_size=24)


@settings(**_SMALL)
@given(st.lists(words, min_size=1, max_size=8),
       st.integers(1, 5), st.integers(1, 5))
def test_chunk_text_matches_duckdb(ray_session, texts, chunk, stride):
    from pybel_ray.ops.chunk import chunk_text

    t = pa.Table.from_pylist(
        [{"doc_id": i, "text": s} for i, s in enumerate(texts)],
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk"], r["n_tokens"])
        for r in chunk_text(_ds(t), chunk=chunk, stride=stride).take_all()
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = sorted(map(tuple, con.execute(r"""
        WITH raw AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
                   unnest(generate_series(
                       1, len(regexp_split_to_array(trim(text), '\s+')))) AS pos
            FROM documents
        ), n AS (SELECT doc_id, max(pos) AS n_tok FROM raw GROUP BY doc_id),
        starts AS (
            SELECT doc_id, unnest(generate_series(0, n_tok - 1, {st})) AS s
            FROM n
        )
        SELECT r.doc_id, CAST(st.s / {st} AS BIGINT),
               string_agg(r.tok, ' ' ORDER BY r.pos),
               CAST(count(*) AS BIGINT)
        FROM raw r JOIN starts st
          ON r.doc_id = st.doc_id AND r.pos > st.s AND r.pos <= st.s + {ch}
        GROUP BY r.doc_id, st.s
    """.format(st=stride, ch=chunk)).fetchall()))
    assert got == exp


@settings(**_SMALL)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 9)),
             min_size=0, max_size=12),
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 9)),
             min_size=0, max_size=12),
)
def test_equi_join_random_matches_duckdb(ray_session, lrows, rrows):
    from pybel_ray.ops.relational import equi_join

    L = pa.Table.from_pylist(
        [{"k": k, "x": v} for k, v in lrows] or [{"k": 99, "x": 0}],
    )
    R = pa.Table.from_pylist(
        [{"k": k, "y": v} for k, v in rrows] or [{"k": 98, "y": 0}],
    )
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    key = lambda t: tuple((v is None, v) for v in t)
    for how, sql in [("inner", "JOIN"), ("left", "LEFT JOIN")]:
        got = sorted((
            (r.get("k"), r.get("x"), r.get("y"))
            for r in equi_join(_ds(L, 2), _ds(R, 3), "k", how=how,
                               num_buckets=4).take_all()
        ), key=key)
        exp = sorted(map(tuple, con.execute(
            f"SELECT L.k, L.x, R.y FROM L {sql} R ON L.k = R.k",
        ).fetchall()), key=key)
        assert got == exp, how


@settings(**_SMALL)
@given(st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(-50, 50),
              st.sampled_from(["p", "q"])),
    min_size=1, max_size=20,
))
def test_tumbling_window_matches_duckdb(ray_session, rows):
    from pybel_ray.ops.window import tumbling_window_agg

    t = pa.Table.from_pylist(
        [{"ts": s * 1_000_000, "v": v, "k": k} for s, v, k in rows],
    )
    t = t.set_column(0, "ts", t.column("ts").cast(pa.timestamp("us")))
    got = sorted(
        (r["window_start"], r["k"], r["n"], r["sum_v"])
        for r in tumbling_window_agg(
            _ds(t, 2), "ts", 7, keys=["k"], sum_cols=["v"],
        ).take_all()
    )
    con = duckdb.connect()
    con.register("events", t)
    exp = sorted(map(tuple, con.execute("""
        SELECT (epoch_us(ts) // 7000000) * 7, k,
               CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
        FROM events GROUP BY 1, 2
    """).fetchall()))
    assert got == exp
