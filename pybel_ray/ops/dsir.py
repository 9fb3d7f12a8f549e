"""DSIR-style data selection via importance resampling (after Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling" — public method description only).

Score every raw document by how target-like its hashed n-gram features
are: build hashed unigram+bigram occurrence counts for a (small,
high-quality) TARGET corpus and for the RAW corpus, form per-bucket
log-likelihood ratios ``lam[b] = ln p_target(b) - ln p_raw(b)`` with
add-one smoothing, and score each document as the sum of ``lam`` over
its feature occurrences.  Documents with high weights are the ones to
keep (importance resampling reduces to a deterministic gate on the
weight here — sampling proportional to weight needs only the md5 gate
family on top).

Exactness contract: the float log-ratios are QUANTIZED to integer
micros once, snapshotted, and every document weight is an exact int64
sum of snapshot cells — so a DuckDB oracle reproduces every weight
bit-for-bit from the snapshot Parquet (same pattern as the classifier
weights / k-means centroid snapshots).  Feature hashing is the
repo-wide md5 recipe (``('0x' || substr(md5(f), 1, 8))::BIGINT % B``).

Scale shape:

* counting is one stateless ``map_batches`` pass per corpus — features
  dedup per batch (one md5 per DISTINCT feature, counts via
  ``np.unique``), each batch emits at most ``buckets`` partial rows,
  folded into one ``np.int64`` vector on the driver (bounded by
  ``buckets``, the Gram-matrix/CMS fold pattern);
* the ratio vector broadcasts once via ``ray.put``; scoring is a
  zero-shuffle ``map_batches`` (vectorized slot lookup + per-doc
  ``np.bincount`` fold).

No reference analog (training-data-pipeline family, SURVEY.md §2
beyond-reference operators).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .lines import _split_words

__all__ = [
    "hashed_feature_counts",
    "dsir_log_ratios",
    "dsir_scores",
]


def _batch_features(t: pa.Table, text_col: str):
    """Flat unigram + within-doc bigram feature strings of a batch,
    with the doc index of every occurrence."""
    import pyarrow.compute as pc

    parts = _split_words(t, text_col)
    offs = np.asarray(parts.offsets)
    vals = parts.values
    lens = np.diff(offs)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    feats = [vals]
    docs = [doc_idx]
    m = len(vals) - 1
    if m > 0:
        bi = pc.binary_join_element_wise(
            vals.slice(0, m), vals.slice(1, m), " ",
        )
        valid = doc_idx[:m] == doc_idx[1:]
        if not valid.all():
            bi = bi.filter(pa.array(valid))
        feats.append(bi)
        docs.append(doc_idx[:m][valid])
    flat = pa.concat_arrays(
        [f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
         for f in feats],
    )
    return flat, np.concatenate(docs)


def _feature_slots(feats: pa.Array, buckets: int) -> np.ndarray:
    """md5 slot per feature string — one md5 per DISTINCT value via
    dictionary encoding (the repo hash recipe, SQL-reproducible)."""
    enc = feats.dictionary_encode()
    dic = enc.dictionary.to_pylist()
    dslots = np.array(
        [
            int(
                hashlib.md5(  # noqa: S324
                    str(f).encode("utf8"),
                ).hexdigest()[:8], 16,
            ) % buckets
            for f in dic
        ],
        dtype=np.int64,
    )
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
    return dslots[codes]


def hashed_feature_counts(
    ds, buckets: int = 4096, text_col: str = "text",
) -> np.ndarray:
    """Occurrence counts of hashed unigram+bigram features over a
    corpus, as one ``buckets``-long int64 vector (driver-folded partial
    bincounts; each batch ships at most ``buckets`` rows)."""

    def _partial(t: pa.Table) -> pa.Table:
        feats, _docs = _batch_features(t, text_col)
        if len(feats) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["slot", "c"],
            )
        slots = _feature_slots(feats, buckets)
        counts = np.bincount(slots, minlength=buckets)
        nz = np.flatnonzero(counts)
        return pa.Table.from_arrays(
            [pa.array(nz, pa.int64()),
             pa.array(counts[nz].astype(np.int64))],
            names=["slot", "c"],
        )

    out = np.zeros(buckets, np.int64)
    for b in ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        s = np.asarray(b.column("slot").to_numpy(zero_copy_only=False))
        c = np.asarray(b.column("c").to_numpy(zero_copy_only=False))
        np.add.at(out, s, c)
    return out


def dsir_log_ratios(
    target_counts: np.ndarray, raw_counts: np.ndarray,
) -> np.ndarray:
    """Integer-micro log-likelihood ratios per bucket with add-one
    smoothing: ``floor(1e6 * (ln((t+1)/(T+B)) - ln((r+1)/(R+B))) +
    0.5)``.  Quantized ONCE here; everything downstream is exact
    int64."""
    t = np.asarray(target_counts, np.float64)
    r = np.asarray(raw_counts, np.float64)
    if t.shape != r.shape:
        raise ValueError("bucket count mismatch")
    b = len(t)
    lam = (
        np.log(t + 1.0) - np.log(t.sum() + b)
        - np.log(r + 1.0) + np.log(r.sum() + b)
    )
    return np.floor(lam * 1e6 + 0.5).astype(np.int64)


def dsir_scores(
    ds,
    ratios_e6: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document importance weight: exact int64 sum of the quantized
    ratio over every feature OCCURRENCE.  One row per input row —
    feature-less documents (null/empty text) score 0, matching the
    oracle's LEFT JOIN + COALESCE.  Zero shuffle; the ratio vector is
    shipped once via ``ray.put``."""
    import ray

    buckets = len(ratios_e6)
    ref = ray.put(np.ascontiguousarray(ratios_e6, dtype=np.int64))

    def _score(t: pa.Table) -> pa.Table:
        lam = ray.get(ref)
        feats, docs = _batch_features(t, text_col)
        weights = np.zeros(t.num_rows, np.int64)
        if len(feats):
            slots = _feature_slots(feats, buckets)
            np.add.at(weights, docs, lam[slots])
        return pa.Table.from_arrays(
            [t.column(id_col), pa.array(weights, pa.int64())],
            names=[id_col, "weight_e6"],
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow",
    )
