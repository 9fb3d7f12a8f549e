"""Cross-check tests for the approximate-dedup family (VERDICT round-1 #3):
every approximate path is verified against its exact driver-side oracle on
a planted-near-duplicate corpus."""

import numpy as np
import pytest


def _corpus():
    """60 docs: 20 base texts, each with a near-identical variant (high
    Jaccard), plus 20 unrelated fillers."""
    rng = np.random.RandomState(7)
    words = [
        "graph", "stream", "shuffle", "batch", "arrow", "actor", "parse",
        "vector", "bucket", "token", "sketch", "window", "node", "edge",
        "table", "block", "spill", "merge", "scan", "probe", "cache",
        "shard", "salt", "hash",
    ]
    rows = []
    doc_id = 0
    for i in range(20):
        base = " ".join(rng.choice(words, size=60))
        rows.append({"doc_id": doc_id, "text": base})
        doc_id += 1
        # near-dup: tweak the tail only
        variant = base.rsplit(" ", 2)[0] + " tweak{} edit".format(i)
        rows.append({"doc_id": doc_id, "text": variant})
        doc_id += 1
    for i in range(20):
        rows.append({
            "doc_id": doc_id,
            "text": " ".join(rng.choice(words, size=25)) + " filler{}".format(i),
        })
        doc_id += 1
    return rows


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.from_items(_corpus()).repartition(4).materialize()


def _pairs_set(ds):
    return {(r["id_a"], r["id_b"]) for r in ds.take_all()}


def test_ngram_jaccard_distributed_matches_brute(docs):
    from pybel_ray.ops.dedup_approx import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_brute,
    )

    exact = ngram_jaccard_pairs_brute(docs, threshold=0.7)
    dist = ngram_jaccard_pairs(docs, threshold=0.7)
    exact_rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.take_all()}
    dist_rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dist.take_all()}
    # prefix filtering is exact: identical pair sets AND identical scores
    assert dist_rows == exact_rows
    assert len(exact_rows) >= 20


def test_ngram_jaccard_sparse_path_matches_brute(docs, monkeypatch):
    """Force the prefix-filter (sparse) branch — the adaptive dense branch
    is disabled — and require exact equality with the brute oracle."""
    from pybel_ray.ops import dedup_approx

    monkeypatch.setattr(dedup_approx, "_DENSE_JACCARD_BUDGET", 0)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup_approx.ngram_jaccard_pairs_brute(docs, threshold=0.7).take_all()}
    dist = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup_approx.ngram_jaccard_pairs(docs, threshold=0.7).take_all()}
    assert dist == exact


def test_minhash_lsh_superset_check(docs):
    """LSH pairs must (a) all be true positives (exact verify) and (b)
    recover the exact pair set on this corpus at these parameters."""
    from pybel_ray.ops.dedup_approx import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs_brute,
    )

    exact = _pairs_set(ngram_jaccard_pairs_brute(docs, threshold=0.7))
    lsh = _pairs_set(minhash_lsh_pairs(docs, threshold=0.7))
    # verification makes false positives impossible
    assert lsh <= exact
    # at threshold 0.7 with 16 bands of 4 rows the planted dups all collide
    assert lsh == exact


def test_minhash_jaccard_values_are_exact(docs):
    from pybel_ray.ops.dedup_approx import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs_brute,
    )

    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs_brute(docs, threshold=0.7).take_all()}
    for r in minhash_lsh_pairs(docs, threshold=0.7).take_all():
        assert exact[(r["id_a"], r["id_b"])] == r["jaccard"]


def test_simhash_banded_matches_brute(docs):
    from pybel_ray.ops.dedup_approx import simhash64, simhash_near_dup_pairs

    rows = docs.take_all()
    hashes = {r["doc_id"]: simhash64(r["text"]) for r in rows}
    ids = sorted(hashes)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(hashes[a] ^ hashes[b]).count("1") <= 3:
                brute.add((a, b))
    banded = _pairs_set(simhash_near_dup_pairs(docs, max_hamming=3, bands=4))
    # pigeonhole argument: banded is exact for max_hamming < bands
    assert banded == brute
    # non-trivial corpus: the planted near-dups must collide (the exact
    # count depends on the gram hash — 4 with the md5 oracle-shared hash)
    assert len(brute) >= 4


def test_embedding_near_dup_lsh_matches_brute(ray_session):
    import ray.data

    from pybel_ray.ops.dedup_approx import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_brute,
    )

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for i in range(30):
        base = rng.standard_normal(32)
        rows.append({"vec_id": vid, "embedding": base.tolist()})
        vid += 1
        noisy = base + rng.standard_normal(32) * 0.05
        rows.append({"vec_id": vid, "embedding": noisy.tolist()})
        vid += 1
    for i in range(40):
        rows.append({"vec_id": vid, "embedding": rng.standard_normal(32).tolist()})
        vid += 1
    ds = ray.data.from_items(rows).repartition(4).materialize()

    brute = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs_brute(ds, threshold=0.9).take_all()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in embedding_near_dup_pairs(ds, threshold=0.9).take_all()}
    # in-bucket cosine is exact -> no false positives; 16 bands x 8 planes
    # gives ~2e-4 miss rate at c=0.9, so this corpus must match exactly
    assert lsh == brute
    assert len(brute) >= 25


def test_near_dedup_corpus(docs):
    """Survivor semantics: one min-id representative per duplicate cluster."""
    from pybel_ray.ops.dedup_approx import (
        near_dedup_corpus,
        ngram_jaccard_pairs_brute,
    )
    from pybel_ray.struct.operations import connected_components_driver

    pairs = [(r["id_a"], r["id_b"])
             for r in ngram_jaccard_pairs_brute(docs, threshold=0.7).take_all()]
    comp = connected_components_driver(pairs)
    expected_victims = {n for n, rep in comp.items() if n != rep}
    total = docs.count()

    out = near_dedup_corpus(docs, method="minhash", threshold=0.7)
    kept = {r["doc_id"] for r in out.take_all()}
    assert len(kept) == total - len(expected_victims)
    assert kept == {r["doc_id"] for r in docs.take_all()} - expected_victims


def test_near_dedup_corpus_exact(ray_session):
    import ray.data

    from pybel_ray.ops.dedup_approx import near_dedup_corpus

    rows = [
        {"doc_id": 1, "text": "alpha beta"},
        {"doc_id": 2, "text": "alpha beta"},
        {"doc_id": 3, "text": "gamma"},
        {"doc_id": 4, "text": "gamma"},
        {"doc_id": 5, "text": "unique"},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    kept = sorted(r["doc_id"] for r in near_dedup_corpus(ds, method="exact").take_all())
    assert kept == [1, 3, 5]


def test_verify_pairs_is_distributed(docs):
    """The verify stage must not call take_all on pair or shingle tables
    (spot check: monkeypatch Dataset.take_all to count calls during
    minhash_lsh_pairs; only the final result consumption may collect)."""
    from pybel_ray.ops import dedup_approx

    calls = []
    import ray.data

    orig = ray.data.Dataset.take_all

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    ray.data.Dataset.take_all = spy
    try:
        ds = dedup_approx.minhash_lsh_pairs(docs, threshold=0.7)
        assert not calls, "minhash_lsh_pairs materialized a dataset driver-side"
        ds.take_all()
    finally:
        ray.data.Dataset.take_all = orig


def test_near_dedup_keep_best_branches_identical(ray_session):
    """keep='best' keeps the max-score member (ties -> min id) and the
    driver union-find and distributed label-prop branches agree."""
    import numpy as np
    import pandas as pd
    import ray

    import pybel_ray.ops.dedup_approx as da

    rng = np.random.RandomState(0)
    vocab = ["w%d" % i for i in range(50)]
    rows = []
    for c in range(10):
        base = [vocab[rng.randint(50)] for _ in range(30)]
        for j in range(3):
            t = list(base)
            t[j] = "x%d_%d" % (c, j)
            rows.append({
                "doc_id": c * 10 + j,
                "text": " ".join(t),
                "score": int((c * 10 + j) % 7),
            })
    # ids 100+i and 105+i share a vocab slice -> near-dup PAIRS with a
    # score tie, so keep='best' falls back to min id (100..104 survive)
    for i in range(100, 110):
        rows.append({
            "doc_id": i,
            "text": " ".join(vocab[(i % 5)::7]) + " unique%d" % i,
            "score": 1,
        })
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(4)

    out = da.near_dedup_corpus(
        ds, method="ngram", threshold=0.5, keep="best", score_col="score",
    ).to_pandas()
    # per planted cluster c (ids 10c,10c+1,10c+2): argmax of id%7, min id tie
    expected = set(range(100, 105))
    for c in range(10):
        ids = [c * 10 + j for j in range(3)]
        best = max(ids, key=lambda i: (i % 7, -i))
        expected.add(best)
    assert set(out["doc_id"]) == expected

    orig = da._DRIVER_PAIR_BUDGET
    try:
        da._DRIVER_PAIR_BUDGET = 0
        out_d = da.near_dedup_corpus(
            ds, method="ngram", threshold=0.5, keep="best",
            score_col="score",
        ).to_pandas()
    finally:
        da._DRIVER_PAIR_BUDGET = orig
    assert set(out_d["doc_id"]) == expected


def test_near_dedup_keep_best_validation(ray_session):
    import pandas as pd
    import pytest
    import ray

    from pybel_ray.ops.dedup_approx import near_dedup_corpus

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["a b c"], "score": [1]}),
    )
    with pytest.raises(ValueError, match="score_col"):
        near_dedup_corpus(ds, method="ngram", keep="best")
    with pytest.raises(ValueError, match="exact"):
        near_dedup_corpus(ds, method="exact", keep="best", score_col="score")
    with pytest.raises(ValueError, match="keep"):
        near_dedup_corpus(ds, keep="median")


def test_ann_join_cross_table_only(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from pybel_ray.ops.dedup_approx import ann_join

    rng = np.random.default_rng(23)
    base = rng.normal(0, 1, (6, 16))
    # left vectors 0..5; right: 10+i = near-copy of i for i in 0..2,
    # plus 13..15 random (no match)
    left_vecs = base
    right_vecs = np.vstack([
        base[:3] + rng.normal(0, 0.01, (3, 16)),
        rng.normal(0, 1, (3, 16)),
    ])

    def tab(ids, vecs):
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array([list(map(float, v)) for v in vecs],
                      pa.list_(pa.float64()))],
            names=["vec_id", "embedding"],
        )

    left = ray.data.from_arrow(tab(list(range(6)), left_vecs))
    right = ray.data.from_arrow(tab([10, 11, 12, 13, 14, 15], right_vecs))
    out = ann_join(left, right, threshold=0.95).to_pandas()
    got = set(zip(out.id_left, out.id_right))
    assert {(0, 10), (1, 11), (2, 12)} <= got
    # left-left / right-right pairs never emitted
    assert all(l < 10 and r >= 10 for l, r in got)


def test_verify_broadcast_vs_shuffle_parity(ray_session, monkeypatch):
    """The zero-exchange broadcast verify and the two-exchange shuffle
    verify produce identical verified pairs (forced via a zero budget)."""
    import ray

    from pybel_ray.ops import dedup_approx as da

    rows = []
    base = "the quick brown fox jumps over the lazy dog " * 6
    for i in range(40):
        # clusters of 4 near-identical docs + unique tails
        rows.append({
            "doc_id": i,
            "text": base + ("cluster%d " % (i // 4)) * 3 + "tail%d" % (i % 2),
        })
    ds = ray.data.from_items(rows).repartition(4)
    fast = da.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    monkeypatch.setattr(da, "_VERIFY_BROADCAST_VALUES", 0)
    slow = da.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    key = lambda df: sorted(  # noqa: E731
        (int(r.id_a), int(r.id_b), round(float(r.jaccard), 9))
        for r in df.itertuples()
    )
    assert key(fast) == key(slow)
    assert len(fast) > 0


def test_verify_pre_gate_skips_broadcast_entirely(ray_session, monkeypatch):
    """When the pairs table carries exact shingle sizes and their sum is
    over budget, the verify must go straight to the shuffle path WITHOUT
    computing (then discarding) every candidate's shingles in the
    broadcast path."""
    import ray

    from pybel_ray.ops import dedup_approx as da

    rows = [{"doc_id": i, "text": "shared prefix words here " * 8 + str(i % 2)}
            for i in range(12)]
    ds = ray.data.from_items(rows).repartition(2)
    monkeypatch.setattr(da, "_VERIFY_BROADCAST_VALUES", 0)

    def _boom(*a, **k):
        raise AssertionError("broadcast path must not run when pre-gated")

    monkeypatch.setattr(da, "_verify_pairs_broadcast", _boom)
    out = da.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert len(out) > 0  # shuffle path produced the verified pairs


def test_verify_candidates_absent_from_corpus(ray_session, monkeypatch):
    """Pairs referencing ids that don't exist in ds verify to an empty
    result on BOTH paths (regression: the broadcast judge indexed an empty
    sids array with -1 → IndexError)."""
    import pyarrow as pa
    import ray

    from pybel_ray.ops import dedup_approx as da

    ds = ray.data.from_items(
        [{"doc_id": i, "text": "real document %d" % i} for i in range(5)],
    )
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([100, 102], pa.int64()),
        "id_b": pa.array([101, 103], pa.int64()),
    }))
    out = da._verify_pairs_distributed(ds, pairs, "text", "doc_id", 5, 0.5)
    assert out.count() == 0
    monkeypatch.setattr(da, "_VERIFY_BROADCAST_VALUES", 0)
    out2 = da._verify_pairs_distributed(ds, pairs, "text", "doc_id", 5, 0.5)
    assert out2.count() == 0


def test_verify_broadcast_abort_without_sizes(ray_session, monkeypatch):
    """A pairs table WITHOUT size columns (external caller) still verifies
    correctly under a zero budget: the broadcast path aborts mid-stream
    and the shuffle path takes over."""
    import pyarrow as pa
    import ray

    from pybel_ray.ops import dedup_approx as da

    text = "the exact same document body repeated for everyone " * 4
    ds = ray.data.from_items(
        [{"doc_id": i, "text": text + ("x" if i >= 2 else "")}
         for i in range(4)],
    )
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([0, 0, 2], pa.int64()),
        "id_b": pa.array([1, 2, 3], pa.int64()),
    }))
    full = da._verify_pairs_distributed(
        ds, pairs, "text", "doc_id", 5, 0.9,
    ).to_pandas()
    monkeypatch.setattr(da, "_VERIFY_BROADCAST_VALUES", 0)
    aborted = da._verify_pairs_distributed(
        ds, pairs, "text", "doc_id", 5, 0.9,
    ).to_pandas()
    key = lambda df: sorted(  # noqa: E731
        (int(r.id_a), int(r.id_b), round(float(r.jaccard), 9))
        for r in df.itertuples()
    )
    assert key(full) == key(aborted)
    assert {(0, 1), (2, 3)} <= {(a, b) for a, b, _ in key(full)}
