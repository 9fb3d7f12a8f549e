"""Deterministic hash sampling, corpus mixing, and vocabulary building."""

from collections import Counter

import pyarrow as pa
import pytest


def _ds(rows, blocks=1):
    import ray

    d = ray.data.from_arrow(pa.Table.from_pylist(rows))
    return d.repartition(blocks) if blocks > 1 else d


DOCS = [
    {"doc_id": i, "source": "src{}".format(i % 4), "text": "w{} w{} common".format(i, i % 7)}
    for i in range(400)
]


def test_hash_sample_deterministic_and_nested(ray_session):
    from pybel_ray.ops.sampling import hash_sample

    a = sorted(r["doc_id"] for r in hash_sample(_ds(DOCS), 0.25).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(_ds(DOCS, blocks=7), 0.25).take_all())
    assert a == b  # block-layout independent
    assert 0 < len(a) < 400
    half = set(r["doc_id"] for r in hash_sample(_ds(DOCS), 0.5).take_all())
    assert set(a) <= half  # thresholds nest: smaller rate is a subset


def test_hash_sample_extremes(ray_session):
    from pybel_ray.ops.sampling import hash_sample

    assert hash_sample(_ds(DOCS), 0.0).count() == 0
    assert hash_sample(_ds(DOCS), 1.0).count() == 400


def test_weighted_sample(ray_session):
    from pybel_ray.ops.sampling import hash_sample, weighted_sample

    out = weighted_sample(
        _ds(DOCS), {"src0": 1.0, "src1": 0.0}, default_rate=0.5,
    ).take_all()
    by_src = Counter(r["source"] for r in out)
    assert by_src["src0"] == 100  # every src0 row kept
    assert by_src["src1"] == 0
    # unlisted strata follow default_rate == plain hash_sample(0.5)
    rest = sorted(
        r["doc_id"] for r in out if r["source"] in ("src2", "src3")
    )
    plain = sorted(
        r["doc_id"]
        for r in hash_sample(_ds(DOCS), 0.5).take_all()
        if r["source"] in ("src2", "src3")
    )
    assert rest == plain


def test_word_frequencies_matches_counter(ray_session):
    from pybel_ray.ops.text import word_frequencies

    expected = Counter()
    for r in DOCS:
        expected.update(r["text"].split())
    got = {
        r["word"]: r["n"]
        for r in word_frequencies(_ds(DOCS, blocks=5)).take_all()
    }
    assert got == dict(expected)


def test_vocab_topk(ray_session):
    from pybel_ray.ops.text import vocab_topk

    top = vocab_topk(_ds(DOCS), k=3).take_all()
    assert top[0]["word"] == "common" and top[0]["n"] == 400
    # ties broken by word ascending
    assert [r["word"] for r in top[1:]] == sorted(r["word"] for r in top[1:])


def test_inverted_index_postings(ray_session):
    from pybel_ray.ops.text import inverted_index

    docs = [
        {"doc_id": 30, "text": "apple banana"},
        {"doc_id": 2, "text": " banana  cherry banana "},
        {"doc_id": 11, "text": "apple"},
    ]
    out = inverted_index(_ds(docs, blocks=3)).to_pandas()
    idx = {r.word: (r.df, r.postings) for r in out.itertuples()}
    # postings sorted ascending by doc id; df counts documents not tokens
    assert idx["apple"] == (2, "11,30")
    assert idx["banana"] == (2, "2,30")
    assert idx["cherry"] == (1, "2")


def test_inverted_index_df_gates(ray_session):
    from pybel_ray.ops.text import inverted_index

    # "common" appears in all 400 docs; w0..w6 (the i%7 words) in ~57 each;
    # the unique w{i} words in exactly 1..2
    ds = _ds(DOCS, blocks=5)
    out = inverted_index(ds, min_df=3, max_df=100).to_pandas()
    assert "common" not in set(out["word"])  # max_df drops the stopword
    assert all(3 <= df <= 100 for df in out["df"])
    # block layout can't change the index
    out2 = inverted_index(_ds(DOCS, blocks=11), min_df=3, max_df=100).to_pandas()
    a = out.sort_values("word").reset_index(drop=True)
    b = out2.sort_values("word").reset_index(drop=True)
    assert a.equals(b)


def test_bottomk_sample_exact_and_layout_invariant(ray_session):
    import hashlib

    import pyarrow as pa
    import ray

    from pybel_ray.ops.sampling import bottomk_sample

    t = pa.table({
        "doc_id": pa.array(range(500), pa.int64()),
        "v": pa.array([i * 2 for i in range(500)], pa.int64()),
    })
    exp = sorted(range(500), key=lambda i: hashlib.md5(
        str(i).encode()).hexdigest())[:10]

    for blocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = bottomk_sample(ds, 10).to_pandas()
        assert sorted(out.doc_id) == sorted(exp)
        assert list(out.columns) == ["doc_id", "v"]


def test_bottomk_sample_k_larger_than_input(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.sampling import bottomk_sample

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})
    out = bottomk_sample(ray.data.from_arrow(t), 10).to_pandas()
    assert sorted(out.doc_id) == [1, 2, 3]


def test_bottomk_sample_skips_null_keys(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.sampling import bottomk_sample

    t = pa.table({"doc_id": pa.array([1, None, 3], pa.int64())})
    out = bottomk_sample(ray.data.from_arrow(t), 2).to_pandas()
    assert sorted(out.doc_id) == [1, 3]


def test_hash_split_labels_everything_and_is_stable(ray_session):
    import numpy as np
    import ray.data

    from pybel_ray.ops.sampling import hash_split

    t = pa.table({"doc_id": np.arange(400, dtype="int64")})
    bounds = [("train", "cccc"), ("val", "e666"), ("test", "ffff")]
    out = hash_split(
        ray.data.from_arrow(t).repartition(5), bounds,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(out["split"]) == {"train", "val", "test"}
    assert out["split"].notna().all()
    # ~80/10/10 by construction of the hex bounds
    frac = (out["split"] == "train").mean()
    assert 0.7 < frac < 0.9
    again = hash_split(
        ray.data.from_arrow(t).repartition(13), bounds,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.equals(again)

    import duckdb

    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ref = con.execute("""
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                         <= 'cccc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                         <= 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM t ORDER BY doc_id
    """).fetchdf()
    assert out["split"].tolist() == ref["split"].tolist()


def test_hash_split_requires_exhaustive_bounds(ray_session):
    import ray.data

    from pybel_ray.ops.sampling import hash_split

    t = pa.table({"doc_id": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        hash_split(ray.data.from_arrow(t), [("train", "cccc")])


def test_negative_samples_deterministic_nonself(ray_session):
    import duckdb
    import numpy as np
    import ray.data

    from pybel_ray.ops.sampling import negative_samples

    n = 97
    t = pa.table({"vec_id": np.arange(n, dtype="int64")})
    out = negative_samples(
        ray.data.from_arrow(t).repartition(4), n_ids=n, k=3,
    ).to_pandas().sort_values(["vec_id", "neg_rank"]).reset_index(drop=True)
    assert len(out) == n * 3
    assert (out["neg_id"] != out["vec_id"]).all()
    assert out["neg_id"].between(0, n - 1).all()

    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ref = con.execute("""
        SELECT vec_id, CAST(i AS BIGINT) AS neg_rank,
               CAST((vec_id + 1 +
                    (('0x' || substr(
                         md5(CAST(vec_id AS VARCHAR)), 1 + 8*i, 8
                     ))::BIGINT % (97 - 1))) % 97 AS BIGINT) AS neg_id
        FROM t, (SELECT unnest([0, 1, 2]) AS i) d
        ORDER BY vec_id, neg_rank
    """).fetchdf()
    assert out.equals(ref[["vec_id", "neg_rank", "neg_id"]])


def test_hash_split_and_sample_null_keys(ray_session):
    import ray.data

    from pybel_ray.ops.sampling import hash_sample, hash_split

    t = pa.table({"doc_id": pa.array(["a", None, "b"], pa.string())})
    out = hash_split(
        ray.data.from_arrow(t),
        [("train", "cccc"), ("test", "ffff")],
    ).to_pandas()
    assert out["split"].isna().sum() == 1
    assert out[out["doc_id"].notna()]["split"].notna().all()
    # hash_sample: md5(NULL) IS NULL -> null keys are never kept
    kept = hash_sample(ray.data.from_arrow(t), 1.0).to_pandas()
    assert kept["doc_id"].notna().all()


def test_budget_mix_sample_rates(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.sampling import budget_mix_sample

    # two sources with equal weight; target 90/10 -> source b keeps
    # roughly 1/5 of its rows (0.1 * gtot / actual_b = 0.2), a keeps all
    n = 2000
    t = pa.Table.from_arrays(
        [pa.array(list(range(n)), pa.int64()),
         pa.array(["a" if i < n // 2 else "b" for i in range(n)],
                  pa.string()),
         pa.array([10] * n, pa.int64())],
        names=["doc_id", "source", "wt"],
    )
    out = budget_mix_sample(
        ray.data.from_arrow(t).repartition(4), "source", "wt",
        {"a": 9000, "b": 1000},
    ).to_pandas()
    kept_a = (out.source == "a").sum()
    kept_b = (out.source == "b").sum()
    assert kept_a == n // 2  # under target: keep everything
    assert 0.1 < kept_b / (n // 2) < 0.3  # gate ~= 0.2
    # deterministic across layouts
    out2 = budget_mix_sample(
        ray.data.from_arrow(t).repartition(9), "source", "wt",
        {"a": 9000, "b": 1000},
    ).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)
    # unlisted source drops entirely
    out3 = budget_mix_sample(
        ray.data.from_arrow(t), "source", "wt", {"a": 10000},
    ).to_pandas()
    assert set(out3.source) == {"a"}
