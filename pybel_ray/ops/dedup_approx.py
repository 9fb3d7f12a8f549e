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
import pyarrow.compute as pc

__all__ = [
    "char_ngrams",
    "jaccard",
    "shingle_hashes",
    "jaccard_arrays",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_buckets",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
]

#: FNV-1a style multiplier for the vectorized rolling shingle hash
_SHINGLE_P = np.uint64(1099511628211)


def shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Sorted unique uint64 hashes of the character n-grams of ``text``.

    Fully vectorized: byte windows via stride tricks + a polynomial hash
    with natural uint64 wraparound — no per-shingle digest calls (the
    previous blake2b-per-shingle version cost ~1 hash call per character).
    """
    s = " ".join(text.lower().split())
    b = np.frombuffer(s.encode("utf8"), dtype=np.uint8).astype(np.uint64)
    if b.size < n:
        b = np.pad(b, (0, n - b.size), constant_values=32)
    w = np.lib.stride_tricks.sliding_window_view(b, n)
    with np.errstate(over="ignore"):
        powers = _SHINGLE_P ** np.arange(n, dtype=np.uint64)
        h = (w * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def jaccard_arrays(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)

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
    with np.errstate(over="ignore"):
        for i, text in enumerate(texts):
            shingles = shingle_hashes(text, ngram)
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
    import ray

    from ..stages.dedup import dedup_exact_sorted

    rows_per_band = num_perm // bands

    def _sig(t: pa.Table) -> pa.Table:
        """Emit (bucket, id) — signatures only; document text NEVER enters
        the shuffle (the old version shipped each text ``bands`` times)."""
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = minhash_signatures(texts, num_perm, ngram, seed)
        # band bucket = blake2b of each band's signature slice, one row per
        # (doc, band); vectorized reshape + per-row digest of 8*r bytes
        n = len(texts)
        out_bucket = np.empty(n * bands, dtype=np.uint64)
        out_id = np.repeat(ids, bands)
        view = sigs.reshape(n, bands, rows_per_band)
        for row in range(n):
            for band in range(bands):
                out_bucket[row * bands + band] = (
                    hash_bytes(view[row, band].tobytes()) ^ band
                )
        return pa.Table.from_arrays(
            [pa.array(out_bucket, pa.uint64()), pa.array(out_id, pa.int64())],
            names=["bucket", id_col],
        )

    def _run_pairs(t: pa.Table) -> pa.Table:
        """Candidate pairs within equal-bucket runs of a bucket-sorted block.

        One vectorized pass per block replaces a Python ``map_groups`` call
        per bucket (measured: sf0.1 has ~160k buckets → 160k scheduled UDF
        calls in the old version)."""
        if t.num_rows < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["id_a", "id_b"],
            )
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        a_out, b_out = [], []
        start = 0
        n = len(buckets)
        for end in range(1, n + 1):
            if end == n or buckets[end] != buckets[start]:
                if end - start > 1:
                    members = np.unique(ids[start:end])[:200]  # cap mega-buckets
                    for x in range(len(members)):
                        for y in range(x + 1, len(members)):
                            a_out.append(members[x])
                            b_out.append(members[y])
                start = end
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64())],
            names=["id_a", "id_b"],
        )

    sigs = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pyarrow")
    # ONE exchange co-locates equal buckets (sort partitions are single
    # blocks, see dedup_exact_sorted), then run detection is block-local
    pairs = sigs.sort("bucket").map_batches(_run_pairs, batch_format="pyarrow")

    def _key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column("id_a"), pa.string()),
            pc.cast(t.column("id_b"), pa.string()), "_",
        )
        return t.append_column("pair", key)

    pairs = pairs.map_batches(_key, batch_format="pyarrow")
    pairs = dedup_exact_sorted(pairs, "pair", ["id_a", "id_b"]).drop_columns(["pair"])

    # exact-Jaccard verification: recompute shingles ONLY for candidate
    # docs and broadcast them once via ray.put.  Assumes candidates ≪
    # corpus (typical near-dup rates); for adversarial candidate volumes
    # partition the pair list and verify per partition instead.
    cand_ids = set()
    pair_rows = pairs.take_all()
    for r in pair_rows:
        cand_ids.add(r["id_a"])
        cand_ids.add(r["id_b"])
    if not cand_ids:
        import ray.data

        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.float64())],
            names=["id_a", "id_b", "jaccard"],
        ))
    cand_ref = ray.put(cand_ids)

    def _cand_shingles(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        keep_ids, keep_sh = [], []
        for i, text in zip(ids, texts):
            if i in cands:
                keep_ids.append(i)
                keep_sh.append(shingle_hashes(text, ngram))
        return pa.Table.from_arrays(
            [pa.array(keep_ids, pa.int64()),
             pa.array([s.tolist() for s in keep_sh], pa.list_(pa.uint64()))],
            names=[id_col, "shingles"],
        )

    shingle_rows = ds.select_columns([id_col, text_col]).map_batches(
        _cand_shingles, batch_format="pyarrow",
    ).take_all()
    shingles = {
        r[id_col]: np.asarray(r["shingles"], dtype=np.uint64) for r in shingle_rows
    }
    out = []
    for r in pair_rows:
        j = jaccard_arrays(shingles[r["id_a"]], shingles[r["id_b"]])
        if j >= threshold:
            out.append({
                "id_a": r["id_a"], "id_b": r["id_b"], "jaccard": round(j, 6),
            })
    import ray.data

    if not out:
        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.float64())],
            names=["id_a", "id_b", "jaccard"],
        ))
    return ray.data.from_arrow(pa.Table.from_pylist(out)).sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str, ngram: int = 3) -> int:
    """64-bit SimHash over hashed word n-grams.

    Per-gram digests are batched into one matrix so the bit accumulation
    is a single ``unpackbits`` + column sum instead of a loop.
    """
    words = text.lower().split()
    grams = [" ".join(words[i:i + ngram]) for i in range(max(1, len(words) - ngram + 1))]
    digests = b"".join(
        hashlib.blake2b(g.encode("utf8"), digest_size=8).digest() for g in grams
    )
    bits = np.unpackbits(
        np.frombuffer(digests, dtype=np.uint8).reshape(len(grams), 8), axis=1,
    ).astype(np.int32)
    acc = bits.sum(axis=0) * 2 - len(grams)
    out = 0
    for i in range(64):
        if acc[i] > 0:
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
    shingles = {r[id_col]: shingle_hashes(r[text_col], ngram) for r in rows}
    ids = sorted(shingles)
    sizes = np.array([shingles[i].size for i in ids], dtype=np.float64)
    out = []
    for i in range(len(ids)):
        sa = sizes[i]
        # size-ratio prune: Jaccard ≤ min/max of the set sizes, so pairs
        # whose size ratio is below the threshold can't qualify
        ratio = np.minimum(sa, sizes[i + 1:]) / np.maximum(sa, sizes[i + 1:])
        for off in np.nonzero(ratio >= threshold)[0]:
            k = i + 1 + int(off)
            j = jaccard_arrays(shingles[ids[i]], shingles[ids[k]])
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
