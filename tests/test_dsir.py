"""DSIR importance resampling: counts vs a hand loop, ratio
quantization vs numpy, score layout invariance, null/empty docs."""

import hashlib

import numpy as np
import pyarrow as pa

from pybel_ray.ops.dsir import (
    dsir_log_ratios,
    dsir_scores,
    hashed_feature_counts,
)

B = 64


def _slot(f: str) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B


def _hand_counts(texts) -> np.ndarray:
    out = np.zeros(B, np.int64)
    for s in texts:
        if s is None:
            continue
        # engine tokenization: \s+ split of trim; empty text -> ['']
        import re

        ws = re.split(r"\s+", s.strip())
        for w in ws:
            out[_slot(w)] += 1
        for a, b in zip(ws, ws[1:]):
            out[_slot(a + " " + b)] += 1
    return out


def test_counts_match_hand_loop(ray_session):
    import ray.data

    texts = ["a b c a", "b b", None, "", "x y z x y"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = hashed_feature_counts(
        ray.data.from_arrow(t).repartition(3), buckets=B,
    )
    assert (got == _hand_counts(texts)).all()


def test_log_ratios_match_numpy():
    t = np.array([5, 0, 1, 0], np.int64)
    r = np.array([10, 2, 1, 0], np.int64)
    lam = dsir_log_ratios(t, r)
    b = 4
    ref = np.floor(
        (np.log((t + 1) / (t.sum() + b)) - np.log((r + 1) / (r.sum() + b)))
        * 1e6 + 0.5,
    ).astype(np.int64)
    assert (lam == ref).all()


def test_scores_layout_invariant_and_exact(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vocab = list("abcdef")
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 12)))
        for _ in range(60)
    ] + [None, ""]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    tgt = _hand_counts(texts[:10])
    raw = _hand_counts(texts)
    lam = dsir_log_ratios(tgt, raw)

    def run(blocks):
        return (
            dsir_scores(ray.data.from_arrow(t).repartition(blocks), lam)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    a, b = run(1), run(9)
    assert a.equals(b)
    # hand-scored doc 0; null/empty docs
    import re

    def hand_score(s):
        if s is None:
            return 0
        ws = re.split(r"\s+", s.strip())
        v = sum(int(lam[_slot(w)]) for w in ws)
        v += sum(int(lam[_slot(x + " " + y)]) for x, y in zip(ws, ws[1:]))
        return v

    for i in (0, 60, 61):
        assert a.loc[i, "weight_e6"] == hand_score(texts[i]), i
