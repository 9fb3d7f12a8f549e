"""Hashing-trick classifier: exact integer scores, actor-pool stage."""

import hashlib

import numpy as np
import pyarrow as pa


def _ds(rows, blocks=3):
    import ray

    d = ray.data.from_arrow(pa.Table.from_pylist(rows))
    return d.repartition(blocks) if blocks > 1 else d


def _brute_score(text, w):
    total = 0
    for tok in text.strip().split():
        slot = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % len(w)
        total += int(w[slot])
    return total


def test_classifier_matches_brute(ray_session):
    from pybel_ray.ops.classifier import make_hash_weights, score_documents

    rs = np.random.RandomState(5)
    vocab = ["tok%d" % i for i in range(80)]
    rows = [
        {"doc_id": i, "text": " ".join(rs.choice(vocab, size=30).tolist())}
        for i in range(120)
    ]
    w = make_hash_weights(dim=512, seed=3)
    out = score_documents(_ds(rows, blocks=5), w).to_pandas()
    got = dict(zip(out["doc_id"], out["score_e6"]))
    for r in rows:
        expect = _brute_score(r["text"], w)
        assert got[r["doc_id"]] == expect  # exact int64 sum
    lab = dict(zip(out["doc_id"], out["label"]))
    for r in rows:
        assert lab[r["doc_id"]] == (got[r["doc_id"]] > 0)


def test_classifier_layout_invariant(ray_session):
    from pybel_ray.ops.classifier import make_hash_weights, score_documents

    rows = [{"doc_id": i, "text": "alpha beta gamma " * (i % 5 + 1)}
            for i in range(60)]
    w = make_hash_weights(dim=256)
    a = score_documents(_ds(rows, blocks=2), w).to_pandas()
    b = score_documents(_ds(rows, blocks=11), w).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a[["doc_id", "score_e6", "label"]].equals(
        b[["doc_id", "score_e6", "label"]],
    )


def test_classifier_memo_bounded(ray_session):
    from pybel_ray.ops.classifier import HashingClassifier, make_hash_weights

    clf = HashingClassifier(weights=make_hash_weights(dim=64))
    t = pa.Table.from_pylist(
        [{"doc_id": 0, "text": "x y z"}, {"doc_id": 1, "text": "x q"}],
    )
    out = clf(t)
    assert set(clf._slots) == {"x", "y", "z", "q"}  # distinct-only hashing
    assert out.column("score_e6").type == pa.int64()
