"""Hashing-trick linear text classifier (fastText-style inference).

The model-inference stage of a training-data pipeline (quality / domain
/ toxicity scoring) expressed the Ray-idiomatic way: the weight table is
loaded ONCE per actor in ``__init__`` (the stateful-stage contract —
never per batch), scoring is one vectorized pass per batch, and the
model ships to the pool through a single ``ray.put``.

Determinism / oracle story: features are the hashing trick over
whitespace tokens — slot = first 8 md5 hex chars mod ``dim`` (the
repo's shared sketch hash, recomputable in SQL) — and the weights are
INTEGER micro-units, so a document's score is an exact int64 sum:
layout-independent, float-free, and a DuckDB oracle reproduces it to
the last digit from a Parquet snapshot of the weights.  Real fastText
quantizes similarly (product quantization); integer micros is the
exactness-first analog.

Reference scope note: the reference engine has no model inference; this
is the beyond-reference training-data surface (SURVEY.md §2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["HashingClassifier", "make_hash_weights", "score_documents"]


def _slot(token: str, dim: int) -> int:
    h = hashlib.md5(token.encode("utf8")).hexdigest()  # noqa: S324
    return int(h[:8], 16) % dim


def make_hash_weights(dim: int = 4096, seed: int = 7) -> np.ndarray:
    """Deterministic int64 micro-unit weight vector (synthetic stand-in
    for a trained model; swap in real trained weights at the same
    dtype).  Values span ±1.0 in micros."""
    rng = np.random.RandomState(seed)
    return rng.randint(-1_000_000, 1_000_001, size=dim).astype(np.int64)


class HashingClassifier:
    """Actor-pool scoring stage: ``map_batches(HashingClassifier,
    fn_constructor_kwargs={'weights_ref': ray.put(w)}, concurrency=N)``.

    ``__init__`` resolves the broadcast weights once per actor;
    ``__call__`` tokenizes the batch with one Arrow split kernel, hashes
    each DISTINCT token once (``dictionary_encode`` first), folds
    per-token weights back over the token stream with one ``bincount``-
    style gather, and appends ``score_e6`` (int64 micro-units) and
    ``label`` (score > threshold).
    """

    def __init__(self, weights_ref=None, weights=None, threshold_e6: int = 0,
                 text_col: str = "text"):
        import ray

        if weights is None:
            weights = ray.get(weights_ref)
        self.weights = np.asarray(weights, np.int64)
        self.dim = len(self.weights)
        self.threshold_e6 = int(threshold_e6)
        self.text_col = text_col
        # actor-lifetime memo: token -> slot (vocabulary is Zipfian, so
        # the md5 cost amortizes to ~0 after the first few batches)
        self._slots: dict = {}

    def _token_slots(self, tokens) -> np.ndarray:
        out = np.empty(len(tokens), np.int64)
        memo = self._slots
        for j, tok in enumerate(tokens):
            s = memo.get(tok)
            if s is None:
                s = _slot(tok, self.dim)
                if len(memo) < 1_000_000:  # bound actor memory
                    memo[tok] = s
            out[j] = s
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column(self.text_col))
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        lens = np.diff(np.asarray(parts.offsets))
        enc = parts.values.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        if len(codes):
            slots = self._token_slots(enc.dictionary.to_pylist())
            token_w = self.weights[slots[codes]]
            doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
            scores = np.bincount(
                doc_idx, weights=token_w.astype(np.float64),
                minlength=t.num_rows,
            ).astype(np.int64)
            # bincount sums int64 micros exactly while |score| < 2^53
            # micros (~9e9 units — unreachable for real documents)
        else:
            scores = np.zeros(t.num_rows, np.int64)
        t = t.append_column("score_e6", pa.array(scores, pa.int64()))
        return t.append_column(
            "label", pc.greater(t.column("score_e6"), self.threshold_e6),
        )


def score_documents(
    ds,
    weights: np.ndarray,
    threshold_e6: int = 0,
    text_col: str = "text",
    concurrency=(2, 8),
    batch_size: int = 256,
):
    """Score a documents Dataset with an actor pool of
    :class:`HashingClassifier` workers (weights broadcast once)."""
    import ray

    ref = ray.put(np.asarray(weights, np.int64))
    return ds.map_batches(
        HashingClassifier,
        fn_constructor_kwargs={
            "weights_ref": ref, "threshold_e6": threshold_e6,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
