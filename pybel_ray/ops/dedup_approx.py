"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale path (SURVEY.md "Deduplication"): per-batch vectorized signatures →
band-bucket ``groupby`` shuffle (only signatures move, never documents) →
within-bucket candidate pairs → exact verification on the candidate set.
Signature parameters are seeded/deterministic.
"""

from __future__ import annotations

import hashlib
from typing import List, Set, Tuple

import numpy as np
import pyarrow as pa

__all__ = [
    "char_ngrams",
    "jaccard",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_buckets",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
]

_MERSENNE = (1 << 61) - 1


def char_ngrams(text: str, n: int = 5) -> Set[int]:
    """Hashed character n-gram (shingle) set of a normalized text."""
    s = " ".join(text.lower().split())
    if len(s) < n:
        return {hash_bytes(s.encode("utf8"))}
    return {
        hash_bytes(s[i:i + n].encode("utf8"))
        for i in range(len(s) - n + 1)
    }


def hash_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


def jaccard(a: Set[int], b: Set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _perm_params(num_perm: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    texts: List[str], num_perm: int = 64, ngram: int = 5, seed: int = 1234,
) -> np.ndarray:
    """(len(texts), num_perm) uint64 MinHash signature matrix (vectorized)."""
    a, b = _perm_params(num_perm, seed)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, text in enumerate(texts):
        shingles = np.fromiter(char_ngrams(text, ngram), dtype=np.uint64)
        # (n_shingles, num_perm) permuted hashes; min over shingles
        ph = (shingles[:, None] * a[None, :] + b[None, :]) % _MERSENNE
        out[i] = ph.min(axis=0)
    return out


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 5,
    threshold: float = 0.8,
    seed: int = 1234,
):
    """MinHash+LSH near-dup pairs above a Jaccard threshold.

    shingle → minhash (per batch, vectorized) → flat_map to (band, bucket)
    rows → groupby bucket shuffle → within-bucket pairs → exact-Jaccard
    verify (recompute shingles only for candidate docs) → global pair dedup.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = num_perm // bands

    def _sig(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        sigs = minhash_signatures(texts, num_perm, ngram, seed)
        out_bucket, out_id, out_text = [], [], []
        for row, (doc_id, text) in enumerate(zip(ids, texts)):
            for band in range(bands):
                chunk = sigs[row, band * rows_per_band:(band + 1) * rows_per_band]
                bucket = "{}:{:x}".format(
                    band, hash_bytes(chunk.tobytes()),
                )
                out_bucket.append(bucket)
                out_id.append(doc_id)
                out_text.append(text)
        return pa.Table.from_arrays(
            [pa.array(out_bucket), pa.array(out_id), pa.array(out_text)],
            names=["bucket", id_col, text_col],
        )

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        texts = group.column(text_col).to_pylist()
        if len(ids) < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["id_a", "id_b", "jaccard"],
            )
        shingle_cache = {i: char_ngrams(t, ngram) for i, t in zip(ids, texts)}
        seen = set()
        a_out, b_out, j_out = [], [], []
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                ia, ib = ids[order[x]], ids[order[y]]
                if ia == ib or (ia, ib) in seen:
                    continue
                seen.add((ia, ib))
                j = jaccard(shingle_cache[ia], shingle_cache[ib])
                if j >= threshold:
                    a_out.append(ia)
                    b_out.append(ib)
                    j_out.append(round(j, 6))
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()),
             pa.array(j_out, pa.float64())],
            names=["id_a", "id_b", "jaccard"],
        )

    sigs = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pyarrow")
    pairs = sigs.groupby("bucket").map_groups(_bucket_pairs, batch_format="pyarrow")

    # a pair can surface from several bands: global dedup on (id_a, id_b)
    def _key(t: pa.Table) -> pa.Table:
        key = [
            "{}_{}".format(a, b)
            for a, b in zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist())
        ]
        return t.append_column("pair", pa.array(key))

    from ..stages.dedup import dedup_exact

    pairs = pairs.map_batches(_key, batch_format="pyarrow")
    return dedup_exact(pairs, "pair").drop_columns(["pair"]).sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str, ngram: int = 3) -> int:
    """64-bit SimHash over hashed word n-grams."""
    words = text.lower().split()
    grams = [" ".join(words[i:i + ngram]) for i in range(max(1, len(words) - ngram + 1))]
    acc = np.zeros(64, dtype=np.int64)
    for g in grams:
        h = hash_bytes(g.encode("utf8"))
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8),
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash_buckets(ds, text_col: str = "text", id_col: str = "doc_id", prefix_bits: int = 16):
    """Attach simhash + a prefix bucket for banded near-dup grouping."""

    def _f(t: pa.Table) -> pa.Table:
        hashes = [simhash64(v) for v in t.column(text_col).to_pylist()]
        buckets = [h >> (64 - prefix_bits) for h in hashes]
        t = t.append_column("simhash", pa.array([h - (1 << 63) for h in hashes], pa.int64()))
        return t.append_column("simhash_bucket", pa.array(buckets, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard on candidate pairs (brute force for small inputs)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds, text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 5, threshold: float = 0.8,
):
    """All-pairs exact n-gram Jaccard >= threshold (baseline / small inputs).

    Collects ids+texts to the driver — use only for verification at small
    scale; the LSH path is the scale path.
    """
    rows = ds.select_columns([id_col, text_col]).take_all()
    shingles = {r[id_col]: char_ngrams(r[text_col], ngram) for r in rows}
    ids = sorted(shingles)
    out = []
    for i in range(len(ids)):
        for k in range(i + 1, len(ids)):
            j = jaccard(shingles[ids[i]], shingles[ids[k]])
            if j >= threshold:
                out.append({"id_a": ids[i], "id_b": ids[k], "jaccard": round(j, 6)})
    import ray.data

    if not out:
        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["id_a", "id_b", "jaccard"],
        ))
    return ray.data.from_items(out)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    ds, vec_col: str = "embedding", id_col: str = "vec_id", threshold: float = 0.95,
):
    """Embedding-cosine near-dup pairs via block-wise matmul.

    Each batch computes cosine against a broadcast matrix of all vectors
    (fine for small-to-medium tables; the IVF route in ``similarity`` is the
    scale path).
    """
    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows])
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T
    ia, ib = np.where(np.triu(sims >= threshold, k=1))
    out = pa.Table.from_arrays(
        [
            pa.array(ids[ia], pa.int64()),
            pa.array(ids[ib], pa.int64()),
            pa.array(np.round(sims[ia, ib], 6), pa.float64()),
        ],
        names=["id_a", "id_b", "cosine"],
    )
    import ray.data

    return ray.data.from_arrow(out)
