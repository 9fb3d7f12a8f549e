"""Segment dedup + repetition stats (ops/lines.py)."""

import numpy as np
import pytest


def _mk_docs():
    return [
        {"doc_id": 1, "text": "the cat sat on the mat\nboilerplate footer\nunique line one"},
        {"doc_id": 2, "text": "boilerplate footer\nanother unique line"},
        # repeated within one doc: still counts as ONE document
        {"doc_id": 3, "text": "boilerplate footer\nboilerplate footer\nthird unique"},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "shared tail\nsolo body"},
        {"doc_id": 6, "text": "shared tail"},
    ]


def test_duplicated_segments_counts(ray_session):
    import ray.data

    from pybel_ray.ops.lines import duplicated_segments

    ds = ray.data.from_items(_mk_docs()).repartition(3)
    got = {
        r["segment"]: r["n_docs"]
        for r in duplicated_segments(ds, sep="\n", min_docs=2).take_all()
    }
    assert got == {"boilerplate footer": 3, "shared tail": 2}


def test_remove_duplicated_segments_broadcast(ray_session):
    import ray.data

    from pybel_ray.ops.lines import remove_duplicated_segments

    ds = ray.data.from_items(_mk_docs()).repartition(3)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_segments(ds, sep="\n", min_docs=2).take_all()
    }
    assert got == {
        1: "the cat sat on the mat\nunique line one",
        2: "another unique line",
        3: "third unique",
        4: "",
        5: "solo body",
        6: "",  # fully duplicated doc survives with empty text
    }


def test_remove_duplicated_segments_bucketed_path(ray_session, monkeypatch):
    """Forcing the bucketed anti-join + rebuild path must give identical
    output to the broadcast path."""
    import ray.data

    import pybel_ray.ops.lines as lines

    ds = ray.data.from_items(_mk_docs()).repartition(3)
    expected = {
        r["doc_id"]: r["text"]
        for r in lines.remove_duplicated_segments(ds, sep="\n", min_docs=2).take_all()
    }
    monkeypatch.setattr(lines, "_BROADCAST_VICTIM_BUDGET", 0)
    got = {
        r["doc_id"]: r["text"]
        for r in lines.remove_duplicated_segments(ds, sep="\n", min_docs=2).take_all()
    }
    assert got == expected
    # original non-text columns survive the bucketed re-attach
    cols = set(
        lines.remove_duplicated_segments(ds, sep="\n", min_docs=2)
        .schema().names,
    )
    assert cols == {"doc_id", "text"}


def test_remove_no_victims_passthrough(ray_session):
    import ray.data

    from pybel_ray.ops.lines import remove_duplicated_segments

    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "a\nb"}, {"doc_id": 2, "text": "c\nd"}],
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_segments(ds, sep="\n", min_docs=2).take_all()
    }
    assert got == {1: "a\nb", 2: "c\nd"}


def _brute_stats(text):
    words = text.strip().split() or [""]
    # engine convention: '' splits to [''] (one token), matching
    # regexp_split_to_array semantics
    if text.strip() == "":
        words = [""]
    n = len(words)
    distinct = len(set(words))
    bigrams = {}
    for a, b in zip(words, words[1:]):
        bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    top = max(bigrams.values()) if bigrams else 0
    max_run, run = 1, 1
    for a, b in zip(words, words[1:]):
        run = run + 1 if a == b else 1
        max_run = max(max_run, run)
    return {
        "n_words": n,
        "n_distinct_words": distinct,
        "dup_word_frac": (n - distinct) / n,
        "top_bigram_count": top,
        "top_bigram_frac": 0.0 if n < 2 else top / (n - 1),
        "max_word_run": max_run,
    }


def test_repetition_stats_matches_brute(ray_session):
    import ray.data

    from pybel_ray.ops.lines import repetition_stats

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x"]
    docs = []
    for i in range(40):
        n = int(rng.integers(1, 30))
        words = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        if i % 5 == 0:  # plant runs
            words += ["x"] * int(rng.integers(2, 6))
        docs.append({"doc_id": i, "text": " ".join(words)})
    docs.append({"doc_id": 1000, "text": ""})
    docs.append({"doc_id": 1001, "text": "solo"})

    ds = ray.data.from_items(docs).repartition(4)
    got = {r["doc_id"]: r for r in repetition_stats(ds).take_all()}
    assert len(got) == len(docs)
    for d in docs:
        exp = _brute_stats(d["text"])
        row = got[d["doc_id"]]
        for k, v in exp.items():
            assert row[k] == pytest.approx(v), (d["doc_id"], k, row[k], v)
