"""Session-6 operators: ordered sequence collection, readability,
table profiling, z-score standardization, trigram top-k, key-skew
profile, host reciprocity."""

import duckdb
import numpy as np
import pyarrow as pa


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
