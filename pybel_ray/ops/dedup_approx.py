"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale path (SURVEY.md "Deduplication"): per-batch vectorized signatures →
band-bucket shuffle (only signatures move, never documents) → within-bucket
candidate pairs → DISTRIBUTED exact verification (candidate shingles are
shuffle-joined to pair rows by doc id; nothing pair- or shingle-shaped is
materialized on the driver).  Signature parameters are seeded/deterministic.
"""

from __future__ import annotations

import hashlib
import logging
from typing import List, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

__all__ = [
    "char_ngrams",
    "jaccard",
    "shingle_hashes",
    "jaccard_arrays",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_buckets",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_brute",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_brute",
    "near_dedup_corpus",
    "ann_join",
]

#: FNV-1a style multiplier for the vectorized rolling shingle hash
_SHINGLE_P = np.uint64(1099511628211)

#: Mersenne prime 2^31-1: with 31-bit shingle values and parameters below
#: the prime, a*x+b < 2^62 fits uint64 EXACTLY, so (a*x+b) % p is the true
#: universal hash family — no silent wraparound (the old 2^61-1 family
#: overflowed the product and weakened permutation quality)
_MERSENNE31 = np.uint64((1 << 31) - 1)


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
    p = int(_MERSENNE31)
    a = rng.randint(1, p, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, p, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    texts: List[str], num_perm: int = 64, ngram: int = 5, seed: int = 1234,
) -> np.ndarray:
    """(len(texts), num_perm) uint64 MinHash signature matrix (vectorized).

    Shingle hashes are reduced mod 2^31-1 before permuting so every
    ``a*x+b`` stays below 2^62 and the modular arithmetic is exact (see
    ``_MERSENNE31``).  The 64→31-bit reduction can merge the odd shingle
    pair inside one document — an O(n²/2³²) perturbation of the Jaccard
    estimate, far below MinHash's own variance at any practical num_perm.
    """
    a, b = _perm_params(num_perm, seed)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, text in enumerate(texts):
        shingles = np.unique(shingle_hashes(text, ngram) % _MERSENNE31)
        # (n_shingles, num_perm) permuted hashes; min over shingles
        ph = (shingles[:, None] * a[None, :] + b[None, :]) % _MERSENNE31
        out[i] = ph.min(axis=0)
    return out


def _minhash_sigs_and_sizes(
    texts: List[str], num_perm: int, ngram: int, seed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """(signatures, exact 64-bit shingle-set sizes) in one hashing pass.

    The sizes feed the EXACT candidate prune in ``minhash_lsh_pairs``:
    jaccard(a, b) ≤ min(|a|,|b|) / max(|a|,|b|), so a pair whose size
    ratio is below the threshold can be dropped before the verify stage
    ships any shingles (no recall loss — the bound is on the same
    64-bit sets the verifier intersects)."""
    a, b = _perm_params(num_perm, seed)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    sizes = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        sh = shingle_hashes(text, ngram)
        sizes[i] = sh.size
        shingles = np.unique(sh % _MERSENNE31)
        ph = (shingles[:, None] * a[None, :] + b[None, :]) % _MERSENNE31
        out[i] = ph.min(axis=0)
    return out, sizes


#: per-position odd multipliers for the vectorized band-bucket hash
def _band_mixers(rows_per_band: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed + 7)
    return (rng.randint(0, 1 << 62, size=rows_per_band).astype(np.uint64) << np.uint64(1)) | np.uint64(1)


def _band_buckets(sigs: np.ndarray, bands: int, seed: int) -> np.ndarray:
    """(n, bands) uint64 bucket ids: polynomial mix of each band's slice.

    Replaces a blake2b call per (doc, band) with one vectorized
    multiply-sum; equal band signatures always share a bucket (exactness),
    unequal ones collide only at hash-uniformity rates (harmless — the
    verify stage filters false candidates).
    """
    n, num_perm = sigs.shape
    r = num_perm // bands
    view = sigs.reshape(n, bands, r)
    mix = _band_mixers(r, seed)
    with np.errstate(over="ignore"):
        h = (view * mix[None, None, :]).sum(axis=2, dtype=np.uint64)
        h *= np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        h ^= np.arange(bands, dtype=np.uint64)[None, :]
    return h


# ---------------------------------------------------------------------------
# distributed exact-Jaccard verification of candidate pairs
# ---------------------------------------------------------------------------

_VERIFY_SCHEMA = pa.schema([
    ("key_id", pa.int64()),       # shuffle key: a doc id
    ("id_a", pa.int64()),         # -1 on shingle rows
    ("id_b", pa.int64()),
    ("shingles", pa.list_(pa.uint64())),
])

_PAIRS_SCHEMA = pa.schema([
    ("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64()),
])


def _empty_pairs():
    import ray.data

    return ray.data.from_arrow(_PAIRS_SCHEMA.empty_table())


#: candidate-pair rows as emitted by the LSH/block generators: ids plus the
#: exact shingle-set sizes (free from the ratio prune) so the verify stage
#: can compute the exact broadcast volume without touching any text
_CAND_PAIRS_SCHEMA = pa.schema([
    ("id_a", pa.int64()), ("id_b", pa.int64()),
    ("size_a", pa.int64()), ("size_b", pa.int64()),
])


def _empty_cand_pairs() -> pa.Table:
    return _CAND_PAIRS_SCHEMA.empty_table()


def _cand_pairs_table(a_out, b_out, sza_out, szb_out) -> pa.Table:
    """Concatenate per-run numpy pair fragments into one candidate table."""
    def _cat(parts):
        return np.concatenate(parts) if parts else np.array([], np.int64)

    return pa.Table.from_arrays(
        [pa.array(_cat(a_out), pa.int64()), pa.array(_cat(b_out), pa.int64()),
         pa.array(_cat(sza_out), pa.int64()),
         pa.array(_cat(szb_out), pa.int64())],
        schema=_CAND_PAIRS_SCHEMA,
    )


def _list_array_from_arrays(arrays) -> pa.ListArray:
    """ListArray<uint64> from a list of numpy arrays — values+offsets
    construction, no per-element python objects."""
    if not arrays:
        return pa.ListArray.from_arrays(
            pa.array([0], pa.int32()), pa.array([], pa.uint64()),
        )
    lens = np.fromiter((a.size for a in arrays), np.int64, count=len(arrays))
    offsets = np.zeros(len(arrays) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = np.concatenate(arrays) if offsets[-1] else np.array([], np.uint64)
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(values, pa.uint64()),
    ).cast(pa.list_(pa.uint64()))


def _verify_pairs_broadcast(
    ds, pairs, cand_ref, text_col, id_col, ngram, threshold,
):
    """Zero-exchange verify fast path; returns None when the candidate
    shingle volume exceeds the broadcast budget (caller falls back to the
    shuffle path)."""
    import ray

    def _sh_rows(t: pa.Table) -> pa.Table:
        cands = pa.array(ray.get(cand_ref))
        t = t.filter(pc.is_in(t.column(id_col), value_set=cands))
        texts = t.column(text_col).to_pylist()
        sh = _list_array_from_arrays(
            [shingle_hashes(x, ngram) for x in texts],
        )
        return pa.Table.from_arrays(
            [t.column(id_col).combine_chunks().cast(pa.int64()), sh],
            names=["key_id", "shingles"],
        )

    # distributed shingle computation; candidate-sized collect (the ids
    # were already bounded by the pair volume)
    total_values = 0
    parts = []
    for tbl in ds.select_columns([id_col, text_col]).map_batches(
        _sh_rows, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        parts.append(tbl)
        sh = tbl.column("shingles")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        total_values += len(sh.values)
        if total_values > _VERIFY_BROADCAST_VALUES:
            return None  # too big to broadcast: shuffle path
    if not parts:
        return _empty_pairs()
    tbl = pa.concat_tables(parts).combine_chunks()
    if tbl.num_rows == 0:
        # candidate ids absent from ds (pairs non-empty, candidate docs
        # filtered to nothing): no shingles to broadcast, no verifiable
        # pair — _judge_b would otherwise index an empty sids array
        return _empty_pairs()
    ids = tbl.column("key_id").to_numpy(zero_copy_only=False)
    sh = tbl.column("shingles")
    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    values = np.asarray(sh.values, dtype=np.uint64)
    offs = np.asarray(sh.offsets, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    # re-pack in sorted-id order so lookups are one searchsorted
    lens = (offs[1:] - offs[:-1])[order]
    new_offs = np.zeros(len(order) + 1, np.int64)
    np.cumsum(lens, out=new_offs[1:])
    new_values = np.empty_like(values)
    pos = 0
    for oi in order:
        seg = values[offs[oi]:offs[oi + 1]]
        new_values[pos:pos + seg.size] = seg
        pos += seg.size
    ref = ray.put((ids[order], new_values[:pos], new_offs))

    def _judge_b(t: pa.Table) -> pa.Table:
        sids, vals, voffs = ray.get(ref)
        if len(sids) == 0:  # defensive: no candidate docs → no matches
            return _PAIRS_SCHEMA.empty_table()
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(sids, a)
        ib = np.searchsorted(sids, b)
        ok_a = (ia < len(sids)) & (sids[np.minimum(ia, len(sids) - 1)] == a)
        ok_b = (ib < len(sids)) & (sids[np.minimum(ib, len(sids) - 1)] == b)
        out_a, out_b, out_j = [], [], []
        for k in np.flatnonzero(ok_a & ok_b):
            sa = vals[voffs[ia[k]]:voffs[ia[k] + 1]]
            sb = vals[voffs[ib[k]]:voffs[ib[k] + 1]]
            jac = jaccard_arrays(sa, sb)
            if jac >= threshold:
                out_a.append(int(a[k]))
                out_b.append(int(b[k]))
                out_j.append(jac)
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.int64()), pa.array(out_b, pa.int64()),
             pa.array(out_j, pa.float64())],
            schema=_PAIRS_SCHEMA,
        )

    # duplicate candidate pairs (several LSH bands/blocks) stay possible
    # when callers only ran the local combiner dedup — one tiny exact
    # dedup on the verified output keeps the contract identical to the
    # shuffle path's (id_a, id_b, key_id) run-dedup
    out = pairs.select_columns(["id_a", "id_b"]).map_batches(
        _judge_b, batch_format="pyarrow",
    )
    out = _dedup_verified(out)
    return out.sort(["id_a", "id_b"])


def _dedup_verified(out):
    """Exact dedup of verified (id_a, id_b, jaccard) rows (cheap: the
    verified table is result-sized)."""
    from ..stages.dedup import dedup_exact

    def _key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column("id_a"), pa.string()),
            pc.cast(t.column("id_b"), pa.string()), "_",
        )
        return t.append_column("pair", key)

    return dedup_exact(
        out.map_batches(_key, batch_format="pyarrow"), "pair",
    ).drop_columns(["pair"])


#: candidate-shingle broadcast budget for the verify fast path: below this
#: many total shingle values the whole candidate shingle table ships ONCE
#: via ray.put and the verify is a zero-exchange map over the pair rows;
#: above it the two-exchange shuffle path runs (a doc in k pairs would
#: otherwise ship its shingles k times through the pair exchange —
#: measured ×30 duplication / ~800 MB at sf0.1)
_VERIFY_BROADCAST_VALUES = 32_000_000  # uint64 values ≈ 256 MB


def _verify_pairs_distributed(
    ds, pairs, text_col: str, id_col: str, ngram: int, threshold: float,
    num_buckets: int = 32,
):
    """Exact-Jaccard verify of candidate (id_a, id_b) pairs, distributed.

    Fast path (candidate shingles under ``_VERIFY_BROADCAST_VALUES``):
    the candidate docs' shingle sets are computed distributed, collected
    into one (ids, values, offsets) triple, broadcast via ``ray.put``,
    and every pair verifies inside ONE stateless ``map_batches`` over the
    pair rows — zero exchanges, no shingle duplication.

    Scale path (two bucketed groupby exchanges, no driver materialization
    of pairs or shingles, no per-row python in the exchanges):

    1. candidate doc ids (narrow int column of the *pair* table, assumed ≪
       corpus) broadcast-prefilter the document scan; each candidate doc
       emits one (key_id=id, shingles) row, each pair emits two
       (key_id=side id, id_a, id_b) rows;
    2. ``groupby(key_id bucket)`` co-locates them → each pair-side row
       picks up its doc's shingles via one vectorized index_in+take;
    3. ``groupby((id_a, id_b) bucket)`` brings a pair's two sides together
       → one ``jaccard_arrays`` per pair → threshold filter.
    """
    import ray

    # narrow prefilter set: ints only, bounded by candidate volume (the
    # docs that LSH flagged), never texts or shingles.  When the candidate
    # generator shipped exact shingle-set sizes alongside the pairs
    # (size_a/size_b — both LSH and block generators have them for free
    # from the ratio prune), the exact broadcast volume is known HERE, so
    # an over-budget corpus goes straight to the shuffle path instead of
    # computing every candidate's shingles and discarding them mid-stream.
    have_sizes = {"size_a", "size_b"} <= set(pairs.schema().names)
    pair_cols = ["id_a", "id_b"] + (["size_a", "size_b"] if have_sizes else [])
    cand_ids = set()
    size_by_id = {}
    for batch in pairs.select_columns(pair_cols).iter_batches(
        batch_format="pyarrow",
    ):
        ids_a = batch.column("id_a").to_pylist()
        ids_b = batch.column("id_b").to_pylist()
        cand_ids.update(ids_a)
        cand_ids.update(ids_b)
        if have_sizes:
            size_by_id.update(zip(ids_a, batch.column("size_a").to_pylist()))
            size_by_id.update(zip(ids_b, batch.column("size_b").to_pylist()))
    if not cand_ids:
        return _empty_pairs()
    cand_ref = ray.put(np.fromiter(cand_ids, dtype=np.int64, count=len(cand_ids)))

    # exact pre-gate: sizes are the same 64-bit unique-shingle counts the
    # broadcast path would collect, so this equals its total volume
    est_values = sum(size_by_id.values()) if have_sizes else None
    if est_values is None or est_values <= _VERIFY_BROADCAST_VALUES:
        fast = _verify_pairs_broadcast(
            ds, pairs, cand_ref, text_col, id_col, ngram, threshold,
        )
        if fast is not None:
            return fast

    def _shingle_rows(t: pa.Table) -> pa.Table:
        cands = pa.array(ray.get(cand_ref))
        mask = pc.is_in(t.column(id_col), value_set=cands)
        t = t.filter(mask)
        texts = t.column(text_col).to_pylist()
        sh = _list_array_from_arrays(
            [shingle_hashes(x, ngram) for x in texts],
        )
        return pa.Table.from_arrays(
            [
                t.column(id_col).combine_chunks().cast(pa.int64()),
                pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                sh,
            ],
            schema=_VERIFY_SCHEMA,
        )

    def _side_rows(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        key = np.concatenate([a, b])
        ids_a = np.concatenate([a, a])
        ids_b = np.concatenate([b, b])
        n = len(key)
        return pa.Table.from_arrays(
            [
                pa.array(key, pa.int64()),
                pa.array(ids_a, pa.int64()),
                pa.array(ids_b, pa.int64()),
                pa.nulls(n, pa.list_(pa.uint64())),
            ],
            schema=_VERIFY_SCHEMA,
        )

    def _bucket(t: pa.Table) -> pa.Table:
        codes = t.column("key_id").to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("_b", pa.array(codes, pa.int64()))

    shingle_rows = ds.select_columns([id_col, text_col]).map_batches(
        _shingle_rows, batch_format="pyarrow",
    ).map_batches(_bucket, batch_format="pyarrow")
    side_rows = pairs.select_columns(["id_a", "id_b"]).map_batches(
        _side_rows, batch_format="pyarrow",
    ).map_batches(_bucket, batch_format="pyarrow")

    def _attach(group: pa.Table) -> pa.Table:
        is_doc = pc.equal(group.column("id_a"), -1)
        docs = group.filter(is_doc)
        sides = group.filter(pc.invert(is_doc))
        # vectorized gather: no python lists of shingles
        idx = pc.index_in(
            sides.column("key_id"),
            value_set=docs.column("key_id").combine_chunks(),
        )
        sh = pc.take(docs.column("shingles").combine_chunks(), idx)
        return pa.Table.from_arrays(
            [
                sides.column("key_id"),
                sides.column("id_a"),
                sides.column("id_b"),
                sh if isinstance(sh, pa.Array) else sh.combine_chunks(),
            ],
            names=["key_id", "id_a", "id_b", "shingles"],
        )

    attached = shingle_rows.union(side_rows).groupby("_b").map_groups(
        _attach, batch_format="pyarrow",
    )

    def _bucket2(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15) + b) % np.uint64(num_buckets)
        return t.append_column("_b2", pa.array(h.astype(np.int64), pa.int64()))

    def _judge(group: pa.Table) -> pa.Table:
        # numpy-native pairing: sort rows by (id_a, id_b, key_id), drop
        # duplicate (id_a, id_b, key_id) rows — that dedup makes duplicate
        # candidate pairs (same pair surfacing from several LSH bands or
        # blocks) idempotent, so callers don't need a global pair-dedup
        # exchange — then each surviving pair is an adjacent row-run and
        # its two shingle arrays are zero-copy slices of the list values.
        group = group.combine_chunks().sort_by(
            [("id_a", "ascending"), ("id_b", "ascending"),
             ("key_id", "ascending")],
        )
        ids_a = group.column("id_a").to_numpy(zero_copy_only=False)
        ids_b = group.column("id_b").to_numpy(zero_copy_only=False)
        kid = group.column("key_id").to_numpy(zero_copy_only=False)
        same = np.r_[False, (ids_a[1:] == ids_a[:-1])
                     & (ids_b[1:] == ids_b[:-1]) & (kid[1:] == kid[:-1])]
        if same.any():
            group = group.filter(pa.array(~same))
            ids_a = group.column("id_a").to_numpy(zero_copy_only=False)
            ids_b = group.column("id_b").to_numpy(zero_copy_only=False)
        sh_arr = group.column("shingles")
        if isinstance(sh_arr, pa.ChunkedArray):
            sh_arr = sh_arr.combine_chunks()
        null_side = pc.is_null(sh_arr).to_numpy(zero_copy_only=False)
        values = np.asarray(sh_arr.values, dtype=np.uint64)
        offs = np.asarray(sh_arr.offsets)
        out_a, out_b, out_j = [], [], []
        n = len(ids_a)
        i = 0
        while i < n:
            j_end = i + 1
            while j_end < n and ids_a[j_end] == ids_a[i] \
                    and ids_b[j_end] == ids_b[i]:
                j_end += 1
            # exactly two non-null sides -> verify; else orphan, skip
            if j_end - i == 2 and not (null_side[i] or null_side[i + 1]):
                sa = values[offs[i]:offs[i + 1]]
                sb = values[offs[i + 1]:offs[i + 2]]
                jac = jaccard_arrays(sa, sb)
                if jac >= threshold:
                    out_a.append(int(ids_a[i]))
                    out_b.append(int(ids_b[i]))
                    out_j.append(jac)
            i = j_end
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.int64()), pa.array(out_b, pa.int64()),
             pa.array(out_j, pa.float64())],
            schema=_PAIRS_SCHEMA,
        )

    out = attached.map_batches(_bucket2, batch_format="pyarrow").groupby(
        "_b2",
    ).map_groups(_judge, batch_format="pyarrow")
    return out.sort(["id_a", "id_b"])


def _local_dedup_pairs(pairs):
    """Block-local (combiner) dedup of (id_a, id_b) rows — no exchange.

    Cross-block duplicates survive; the distributed verify's per-pair
    side-keyed dict makes them idempotent, so callers headed into
    :func:`_verify_pairs_distributed` can skip the global dedup exchange.
    """
    from ..stages.dedup import local_dedup_table

    def _f(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column("id_a"), pa.string()),
            pc.cast(t.column("id_b"), pa.string()), "_",
        )
        t = t.append_column("pair", key)
        return local_dedup_table(t, "pair").drop_columns(["pair"])

    return pairs.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: within-bucket pair generation cap: buckets larger than this are truncated
#: (with a logged count) — an adversarial mega-bucket would otherwise emit
#: O(members²) candidate rows
_BUCKET_MEMBER_CAP = 200


def _multi_runs(buckets: np.ndarray):
    """(start, end) slices of equal-value runs with length > 1.

    Vectorized boundary detection over a bucket-sorted column: python
    iterates ONLY the multi-member runs (LSH buckets are overwhelmingly
    singletons — the per-row loop this replaces measured ~20% of
    minhash_lsh_pairs at sf0.1)."""
    if len(buckets) < 2:
        return
    edges = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1], True])
    lens = np.diff(edges)
    for ri in np.flatnonzero(lens > 1):
        yield int(edges[ri]), int(edges[ri + 1])


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

    shingle → minhash (per batch, vectorized) → (band, bucket) rows →
    bucket-sort shuffle → within-run candidate pairs → global pair dedup →
    DISTRIBUTED exact-Jaccard verify (:func:`_verify_pairs_distributed`).

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b.
    """

    def _sig(t: pa.Table) -> pa.Table:
        """Emit (bucket, id, size) — signatures only; document text NEVER
        enters the shuffle (the old version shipped each text ``bands``
        times).  ``size`` = exact shingle-set size, feeding the exact
        ratio prune in ``_run_pairs``."""
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs, sizes = _minhash_sigs_and_sizes(texts, num_perm, ngram, seed)
        buckets = _band_buckets(sigs, bands, seed)  # (n, bands), vectorized
        out_bucket = buckets.reshape(-1)
        out_id = np.repeat(ids, bands)
        return pa.Table.from_arrays(
            [pa.array(out_bucket, pa.uint64()), pa.array(out_id, pa.int64()),
             pa.array(np.repeat(sizes, bands), pa.int64())],
            names=["bucket", id_col, "size"],
        )

    def _run_pairs(t: pa.Table) -> pa.Table:
        """Candidate pairs within equal-bucket runs of a bucket-sorted block.

        One vectorized pass per block replaces a Python ``map_groups`` call
        per bucket (measured: sf0.1 has ~160k buckets → 160k scheduled UDF
        calls in the old version)."""
        if t.num_rows < 2:
            return _empty_cand_pairs()
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sizes = t.column("size").to_numpy(zero_copy_only=False)
        a_out, b_out, sza_out, szb_out = [], [], [], []
        capped = 0
        for start, end in _multi_runs(buckets):
            run_ids = ids[start:end]
            run_sz = sizes[start:end]
            uniq, idx = np.unique(run_ids, return_index=True)
            members, msz = run_ids[idx], run_sz[idx]
            if len(members) > _BUCKET_MEMBER_CAP:
                capped += len(members) - _BUCKET_MEMBER_CAP
                members, msz = members[:_BUCKET_MEMBER_CAP], msz[:_BUCKET_MEMBER_CAP]
            ia, ib = np.triu_indices(len(members), 1)
            # EXACT prune: jaccard ≤ min/max of the shingle-set sizes —
            # drops most sub-threshold candidates before any shingle
            # ships (78k → ~8k at sf0.1/t=0.5, no recall loss)
            keep = (np.minimum(msz[ia], msz[ib])
                    >= threshold * np.maximum(msz[ia], msz[ib]))
            a_out.append(members[ia[keep]])
            b_out.append(members[ib[keep]])
            sza_out.append(msz[ia[keep]])
            szb_out.append(msz[ib[keep]])
        if capped:
            logger.warning(
                "minhash_lsh_pairs: truncated %d members from mega-buckets "
                "(cap=%d); near-dups among the dropped members may be missed",
                capped, _BUCKET_MEMBER_CAP,
            )
        return _cand_pairs_table(a_out, b_out, sza_out, szb_out)

    sigs = ds.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pyarrow")
    # ONE exchange co-locates equal buckets (sort partitions are single
    # blocks, see dedup_exact_sorted), then run detection is block-local
    pairs = sigs.sort("bucket").map_batches(_run_pairs, batch_format="pyarrow")
    # combiner-only dedup + ONE materialization: the verify's per-pair
    # side-keyed dict is duplicate-idempotent, so the global pair-dedup
    # exchange is unnecessary; materializing pins the tiny candidate table
    # (the verify consumes it twice — driver id-prefilter + side rows —
    # which otherwise re-executes the whole shingle+sort upstream)
    pairs = _local_dedup_pairs(pairs).materialize()
    return _verify_pairs_distributed(ds, pairs, text_col, id_col, ngram, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str, ngram: int = 3) -> int:
    """64-bit SimHash over hashed word n-grams.

    Per-gram digests are batched into one matrix so the bit accumulation
    is a single ``unpackbits`` + column sum instead of a loop.  The gram
    hash is the first 8 bytes of md5 — shared with the DuckDB oracle
    (`doc_simhash` / `doc_simhash_pairs`), which recomputes the whole
    simhash in SQL.
    """
    words = text.lower().split()
    grams = [" ".join(words[i:i + ngram]) for i in range(max(1, len(words) - ngram + 1))]
    digests = b"".join(
        hashlib.md5(g.encode("utf8")).digest()[:8] for g in grams
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


def simhash_near_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
):
    """SimHash near-dup pairs: id pairs with Hamming distance ≤ max_hamming.

    Banded exact algorithm: the 64-bit simhash is split into ``bands``
    16-bit segments; two hashes within Hamming distance < bands must agree
    on at least one segment (pigeonhole), so grouping by (segment index,
    segment value) finds every qualifying pair.  Requires
    ``max_hamming < bands`` for exactness.
    """
    if max_hamming >= bands:
        raise ValueError("banded simhash requires max_hamming < bands")
    seg_bits = 64 // bands

    def _seg(t: pa.Table) -> pa.Table:
        hashes = np.array(
            [simhash64(v) for v in t.column(text_col).to_pylist()], dtype=np.uint64,
        )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(hashes)
        segs = np.empty(n * bands, dtype=np.uint64)
        keys = np.empty(n * bands, dtype=np.uint64)
        for band in range(bands):
            seg = (hashes >> np.uint64(band * seg_bits)) & np.uint64((1 << seg_bits) - 1)
            segs[band::bands] = seg
            keys[band::bands] = (np.uint64(band) << np.uint64(seg_bits)) | seg
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.uint64()),
                pa.array(np.repeat(ids, bands), pa.int64()),
                pa.array(np.repeat(hashes.view(np.int64), bands), pa.int64()),
            ],
            names=["bucket", id_col, "simhash"],
        )

    def _run_pairs(t: pa.Table) -> pa.Table:
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        hashes = t.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        a_out, b_out, d_out = [], [], []
        for start, end in _multi_runs(buckets):
            run_ids = ids[start:end]
            run_h = hashes[start:end]
            uniq, idx = np.unique(run_ids, return_index=True)
            run_ids, run_h = run_ids[idx], run_h[idx]
            for x in range(len(run_ids)):
                d = _popcount64(run_h[x] ^ run_h[x + 1:])
                for off in np.nonzero(d <= max_hamming)[0]:
                    y = x + 1 + int(off)
                    lo, hi = sorted((int(run_ids[x]), int(run_ids[y])))
                    a_out.append(lo)
                    b_out.append(hi)
                    d_out.append(int(d[off]))
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()),
             pa.array(d_out, pa.int64())],
            names=["id_a", "id_b", "hamming"],
        )

    seg = ds.select_columns([id_col, text_col]).map_batches(_seg, batch_format="pyarrow")
    pairs = seg.sort("bucket").map_batches(_run_pairs, batch_format="pyarrow")
    from ..stages.dedup import dedup_exact_sorted

    def _key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column("id_a"), pa.string()),
            pc.cast(t.column("id_b"), pa.string()), "_",
        )
        return t.append_column("pair", key)

    pairs = pairs.map_batches(_key, batch_format="pyarrow")
    return dedup_exact_sorted(pairs, "pair", ["id_a", "id_b"]).drop_columns(["pair"])


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard
# ---------------------------------------------------------------------------

#: max n_docs × vocabulary cells for the dense exact-Jaccard path (uint8
#: bitset matrix broadcast once; 200M cells ≈ 200 MB)
_DENSE_JACCARD_BUDGET = 200_000_000


def _ngram_jaccard_dense(ds, text_col, id_col, ngram, threshold, vocab):
    """Exact all-pairs Jaccard via blocked set-membership matmul.

    ``vocab`` is the sorted int64-viewed shingle vocabulary.  One pass
    builds the (n_docs × V) uint8 membership matrix (collected column-thin:
    V ≤ budget/n), broadcast once; each batch then computes its rows'
    intersections against ALL docs with one matmul and emits qualifying
    (id_a, id_b, jaccard) with id_a < id_b — no candidate shuffle, no
    verify stage, exact by construction.
    """
    import ray

    vocab_ref = ray.put(vocab)

    def _rows(t: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        mat = np.zeros((t.num_rows, len(voc)), dtype=np.uint8)
        for i, text in enumerate(t.column(text_col).to_pylist()):
            sh = shingle_hashes(text, ngram).view(np.int64)
            pos = np.searchsorted(voc, sh)
            clipped = np.minimum(pos, len(voc) - 1)
            hit = clipped[(pos < len(voc)) & (voc[clipped] == sh)]
            mat[i, hit] = 1
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(list(mat.reshape(t.num_rows, -1)), pa.list_(pa.uint8())),
            ],
            names=[id_col, "bits"],
        )

    # small by budget: (n × V) uint8 — collect + broadcast once
    all_ids, all_bits = [], []
    for batch in ds.select_columns([id_col, text_col]).map_batches(
        _rows, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        all_ids.append(batch.column(id_col).to_numpy(zero_copy_only=False))
        arr = batch.column("bits")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.values, dtype=np.uint8)
        all_bits.append(flat.reshape(len(arr), -1))
    ids = np.concatenate(all_ids)
    mat = np.vstack(all_bits)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    sizes = mat.sum(axis=1).astype(np.int64)
    mat_ref = ray.put((ids, mat.astype(np.float32), sizes))

    import ray.data

    blocks = ray.data.range(len(ids), override_num_blocks=max(
        1, min(64, len(ids) // 256 or 1),
    ))

    def _pairs(t: pa.Table) -> pa.Table:
        g_ids, g_mat, g_sizes = ray.get(mat_ref)
        rows = t.column("id").to_numpy(zero_copy_only=False)
        sub = g_mat[rows]
        # float32 matmul is exact here (counts ≪ 2^24); divide in float64
        # so scores match the float64 brute path bit-for-bit
        inter = (sub @ g_mat.T).astype(np.float64)
        union_sz = g_sizes[rows][:, None] + g_sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union_sz > 0, inter / union_sz, 1.0)
        mask = jac >= threshold
        # id_a < id_b: only the upper triangle relative to global index
        mask &= rows[:, None] < np.arange(len(g_ids))[None, :]
        ia, ib = np.nonzero(mask)
        return pa.Table.from_arrays(
            [
                pa.array(g_ids[rows[ia]], pa.int64()),
                pa.array(g_ids[ib], pa.int64()),
                pa.array(jac[ia, ib], pa.float64()),
            ],
            schema=_PAIRS_SCHEMA,
        )

    return blocks.map_batches(_pairs, batch_format="pyarrow").sort(["id_a", "id_b"])


def ngram_jaccard_pairs(
    ds, text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 5, threshold: float = 0.8,
):
    """All pairs with exact n-gram Jaccard ≥ threshold — DISTRIBUTED and
    exact via prefix filtering (cf. Chaudhuri et al., "A Primitive Operator
    for Similarity Joins", ICDE 2006; df ordering as in PPJoin, Xiao et
    al., WWW 2008):

    If J(A, B) ≥ t then A and B share a shingle among each one's
    ``floor((1-t)·|set|) + 1`` FIRST shingles under any consistent global
    order, so emitting only those prefix shingles as (shingle, id) keys
    and grouping by shingle finds EVERY qualifying pair.  The order used
    is ascending document frequency (rarest first, computed with one
    distributed groupby-count pass and broadcast once): on templated
    corpora a plain hash order puts corpus-common shingles in every prefix
    and a single shingle group degenerates to all-pairs (measured at
    sf0.1: 953 groups of ~3,900 members → ~19M candidate rows), while df
    order picks each doc's discriminative shingles and groups stay tiny.
    Within-group pair generation applies the size-ratio prune (J ≤
    min/max of set sizes); the final verify is the same distributed
    exact-Jaccard join used by MinHash.

    Scale note: the broadcast df table is bounded by the corpus shingle
    vocabulary (not corpus size); for open-vocabulary corpora cap it to
    the most frequent K shingles — unseen shingles default to df=1, which
    keeps the order consistent (exactness needs only consistency).
    """
    import ray

    # pass 0: shingle document frequencies (per-batch unique -> groupby sum).
    # Shingles travel as int64 BIT VIEWS of the uint64 hashes — Ray's
    # groupby coerces uint64 keys — identity is all the df count needs.
    def _df_partial(t: pa.Table) -> pa.Table:
        # shingle_hashes is unique-per-doc, so counting occurrences across
        # the concatenation IS the document frequency — one vectorized
        # np.unique instead of a per-shingle Python dict loop
        parts = [
            shingle_hashes(text, ngram).view(np.int64)
            for text in t.column(text_col).to_pylist()
        ]
        allv = np.concatenate(parts) if parts else np.array([], np.int64)
        vals, cnts = np.unique(allv, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(vals, pa.int64()), pa.array(cnts.astype(np.int64), pa.int64())],
            names=["shingle", "df"],
        )

    df_ds = ds.select_columns([text_col]).map_batches(
        _df_partial, batch_format="pyarrow",
    ).groupby("shingle").sum("df")
    df_vals, df_counts = [], []
    for batch in df_ds.iter_batches(batch_format="pyarrow"):
        df_vals.append(
            batch.column("shingle").cast(pa.int64()).to_numpy(zero_copy_only=False),
        )
        df_counts.append(
            batch.column("sum(df)").cast(pa.int64()).to_numpy(zero_copy_only=False),
        )
    vals = np.concatenate(df_vals) if df_vals else np.array([], np.int64)
    cnts = np.concatenate(df_counts) if df_counts else np.array([], np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order].astype(np.int64)

    # ---- adaptive strategy ------------------------------------------------
    # Tiny shingle vocabularies (templated/synthetic corpora) defeat prefix
    # filtering: when the median shingle appears in hundreds of documents,
    # "pairs sharing a prefix shingle" ≈ all pairs and the candidate volume
    # exceeds n²/2 (measured at sf0.1: 2,041 distinct shingles over 5,000
    # docs → ~31M candidate rows vs 12.5M total pairs).  If every document
    # fits a V-bit set and n·V is broadcastable, exact all-pairs via a
    # blocked boolean matmul is cheaper AND exactly correct — each batch
    # multiplies its rows against the broadcast matrix; no verify needed.
    n_docs = ds.count()
    if len(vals) and n_docs * len(vals) <= _DENSE_JACCARD_BUDGET:
        return _ngram_jaccard_dense(
            ds, text_col, id_col, ngram, threshold, vals,
        )

    df_ref = ray.put((vals, cnts))

    def _prefix(t: pa.Table) -> pa.Table:
        df_sorted_vals, df_sorted_cnts = ray.get(df_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        out_sh, out_id, out_size = [], [], []
        for i, text in enumerate(texts):
            sh = shingle_hashes(text, ngram)  # sorted unique
            sh_view = sh.view(np.int64)
            if len(df_sorted_vals):
                pos = np.searchsorted(df_sorted_vals, sh_view)
                clipped = np.minimum(pos, len(df_sorted_vals) - 1)
                found = (pos < len(df_sorted_vals)) & (
                    df_sorted_vals[clipped] == sh_view
                )
                df = np.where(found, df_sorted_cnts[clipped], 1)
            else:
                df = np.ones(sh.size, dtype=np.int64)
            # rarest-first prefix; ties broken by the shingle value so the
            # order is a consistent global total order
            p = int((1.0 - threshold) * sh.size) + 1
            pref = sh[np.lexsort((sh, df))[:p]]
            out_sh.append(pref)
            out_id.append(np.full(pref.size, ids[i], dtype=np.int64))
            out_size.append(np.full(pref.size, sh.size, dtype=np.int64))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_sh) if out_sh else np.array([], np.uint64), pa.uint64()),
                pa.array(np.concatenate(out_id) if out_id else np.array([], np.int64), pa.int64()),
                pa.array(np.concatenate(out_size) if out_size else np.array([], np.int64), pa.int64()),
            ],
            names=["bucket", id_col, "size"],
        )

    def _run_pairs(t: pa.Table) -> pa.Table:
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sizes = t.column("size").to_numpy(zero_copy_only=False)
        a_out, b_out, sza_out, szb_out = [], [], [], []
        capped = 0
        for start, end in _multi_runs(buckets):
            run_ids = ids[start:end]
            run_sz = sizes[start:end]
            uniq, idx = np.unique(run_ids, return_index=True)
            run_ids, run_sz = run_ids[idx], run_sz[idx]
            if len(run_ids) > _BUCKET_MEMBER_CAP:
                capped += len(run_ids) - _BUCKET_MEMBER_CAP
                run_ids = run_ids[:_BUCKET_MEMBER_CAP]
                run_sz = run_sz[:_BUCKET_MEMBER_CAP]
            # vectorized upper-triangle pair emission + ratio prune
            xi, yi = np.triu_indices(len(run_ids), k=1)
            ratio = (
                np.minimum(run_sz[xi], run_sz[yi])
                / np.maximum(run_sz[xi], run_sz[yi])
            )
            keep = ratio >= threshold
            xk, yk = xi[keep], yi[keep]
            swap = run_ids[xk] > run_ids[yk]
            a_out.append(np.where(swap, run_ids[yk], run_ids[xk]))
            b_out.append(np.where(swap, run_ids[xk], run_ids[yk]))
            sza_out.append(np.where(swap, run_sz[yk], run_sz[xk]))
            szb_out.append(np.where(swap, run_sz[xk], run_sz[yk]))
        if capped:
            logger.warning(
                "ngram_jaccard_pairs: truncated %d members from mega shingle "
                "groups (cap=%d); pairs among dropped members may be missed",
                capped, _BUCKET_MEMBER_CAP,
            )
        return _cand_pairs_table(a_out, b_out, sza_out, szb_out)

    prefix = ds.select_columns([id_col, text_col]).map_batches(
        _prefix, batch_format="pyarrow",
    )
    pairs = prefix.sort("bucket").map_batches(_run_pairs, batch_format="pyarrow")
    # same shape as minhash_lsh_pairs: combiner dedup + pin (the verify is
    # duplicate-idempotent and consumes the candidate table twice)
    pairs = _local_dedup_pairs(pairs).materialize()
    return _verify_pairs_distributed(ds, pairs, text_col, id_col, ngram, threshold)


def ngram_jaccard_pairs_brute(
    ds, text_col: str = "text", id_col: str = "doc_id",
    ngram: int = 5, threshold: float = 0.8,
):
    """All-pairs exact n-gram Jaccard ≥ threshold (driver-side baseline).

    Collects ids+texts to the driver — use only as the verification oracle
    at small scale; :func:`ngram_jaccard_pairs` is the distributed path.
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
                out.append({"id_a": ids[i], "id_b": ids[k], "jaccard": j})
    import ray.data

    if not out:
        return _empty_pairs()
    return ray.data.from_items(out)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    bands: int = 16,
    seed: int = 4321,
):
    """Embedding-cosine near-dup pairs via banded hyperplane LSH — the
    scale path (the brute-force variant is
    :func:`embedding_near_dup_pairs_brute`).

    Each vector emits ``bands`` (band, sign-pattern) bucket keys against
    independent seeded hyperplane tables; a bucket-sort shuffle co-locates
    collisions; within-bucket cosine is computed EXACTLY from the shipped
    unit vectors (no false positives).  Recall: a pair at cosine c collides
    in one band with p = (1 - acos(c)/π)^n_planes; across b independent
    bands the miss rate is (1-p)^b — at c = 0.95, n_planes = 8, bands = 16
    that is ~2·10⁻⁴.
    """
    def _bucket_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # dim would be 0 and the offsets arange below would need a
            # zero step — return the output schema directly
            return pa.Table.from_arrays(
                [pa.array([], pa.uint64()), pa.array([], pa.int64()),
                 pa.array([], pa.list_(pa.float64()))],
                names=["bucket", id_col, "unit"],
            )
        arr = t.column(vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.values, dtype=np.float64)
        offsets = np.asarray(arr.offsets)
        dim = int(offsets[1] - offsets[0]) if len(arr) else 0
        mat = flat.reshape(len(arr), dim)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((bands, n_planes, dim))
        n = len(arr)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keys = np.empty(n * bands, dtype=np.uint64)
        weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
        for band in range(bands):
            signs = (unit @ planes[band].T) > 0
            code = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
            keys[band::bands] = (np.uint64(band) << np.uint64(n_planes)) | code
        repeated = np.repeat(unit, bands, axis=0)
        unit_list = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n * bands + 1) * dim, dim, dtype=np.int32)),
            pa.array(repeated.reshape(-1), pa.float64()),
        )
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.uint64()),
                pa.array(np.repeat(ids, bands), pa.int64()),
                unit_list,
            ],
            names=["bucket", id_col, "unit"],
        )

    def _run_pairs(t: pa.Table) -> pa.Table:
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        arr = t.column("unit")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.values, dtype=np.float64)
        if t.num_rows:
            offsets = np.asarray(arr.offsets)
            dim = int(offsets[1] - offsets[0])
            units = flat.reshape(t.num_rows, dim)
        else:
            units = flat.reshape(0, 0)
        a_out, b_out, c_out = [], [], []
        for start, end in _multi_runs(buckets):
            run_ids = ids[start:end]
            uniq, idx = np.unique(run_ids, return_index=True)
            run_ids = run_ids[idx]
            run_u = units[start:end][idx]
            sims = run_u @ run_u.T
            ia, ib = np.where(np.triu(sims >= threshold, k=1))
            for x, y in zip(ia, ib):
                lo, hi = sorted((int(run_ids[x]), int(run_ids[y])))
                a_out.append(lo)
                b_out.append(hi)
                c_out.append(round(float(sims[x, y]), 6))
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()),
             pa.array(c_out, pa.float64())],
            names=["id_a", "id_b", "cosine"],
        )

    rows = ds.select_columns([id_col, vec_col]).map_batches(
        _bucket_rows, batch_format="pyarrow",
    )
    pairs = rows.sort("bucket").map_batches(_run_pairs, batch_format="pyarrow")

    from ..stages.dedup import dedup_exact_sorted

    def _key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column("id_a"), pa.string()),
            pc.cast(t.column("id_b"), pa.string()), "_",
        )
        return t.append_column("pair", key)

    pairs = pairs.map_batches(_key, batch_format="pyarrow")
    return dedup_exact_sorted(pairs, "pair", ["id_a", "id_b"]).drop_columns(["pair"])


def embedding_near_dup_pairs_brute(
    ds, vec_col: str = "embedding", id_col: str = "vec_id", threshold: float = 0.95,
):
    """All-pairs cosine near-dup (driver-side O(n²) baseline / test oracle)."""
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


# ---------------------------------------------------------------------------
# end-to-end corpus dedup: pairs -> clusters -> survivors
# ---------------------------------------------------------------------------

#: pair counts at or below this cluster with a driver union-find; above it
#: the distributed label-propagation components run
_DRIVER_PAIR_BUDGET = 2_000_000


def near_dedup_corpus(
    ds,
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "first",
    score_col=None,
    **kwargs,
):
    """The training-data dedup primitive: return the corpus WITHOUT
    near-duplicates — one survivor per duplicate cluster.

    ``keep='first'`` keeps the min-id member (the classic deterministic
    rule); ``keep='best'`` keeps the member with the HIGHEST integer
    ``score_col`` (ties → lowest id) — the curation rule that keeps the
    best-quality copy instead of an arbitrary one.

    pairs (per ``method``: minhash | ngram | simhash | exact) →
    weakly-connected components over the pair graph (duplicate clusters are
    transitive) → drop every non-representative member with a vectorized
    anti-join.  The victim id set is bounded by the duplicate volume;
    above ``_DRIVER_PAIR_BUDGET`` pair rows the clustering runs as
    distributed label propagation instead of a driver union-find (for
    ``keep='best'`` the winner argmax then runs as one
    ``groupby(component).max`` over a fixed-width (score, −id) string
    encoding — lexicographic max == numeric (score, −id) max — so no
    cluster is ever co-located beyond its (component, encoded-winner)
    row).
    """
    if keep not in ("first", "best"):
        raise ValueError("keep must be 'first' or 'best': {!r}".format(keep))
    if keep == "best" and not score_col:
        raise ValueError("keep='best' requires score_col")
    if method == "minhash":
        pairs = minhash_lsh_pairs(ds, text_col, id_col, **kwargs)
    elif method == "ngram":
        pairs = ngram_jaccard_pairs(ds, text_col, id_col, **kwargs)
    elif method == "simhash":
        pairs = simhash_near_dup_pairs(ds, text_col, id_col, **kwargs)
    elif method == "exact":
        if keep == "best":
            raise ValueError(
                "keep='best' is not supported for method='exact': exact "
                "duplicates have identical text, so any text-derived "
                "score ties and keep='first' already picks the min id",
            )
        return _exact_dedup_corpus(ds, text_col, id_col)
    else:
        raise ValueError("unknown dedup method: {}".format(method))

    import ray

    pairs = pairs.select_columns(["id_a", "id_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds

    if n_pairs <= _DRIVER_PAIR_BUDGET:
        from ..struct.operations import connected_components_driver

        edges = [
            (r["id_a"], r["id_b"]) for r in pairs.take_all()
        ]
        comp = connected_components_driver(edges)
        if keep == "best":
            # scores for cluster MEMBERS only (bounded by dup volume):
            # one broadcast-filtered pass, winners picked on the driver
            members = np.sort(np.fromiter(comp, dtype=np.int64))
            mem_ref = ray.put(members)

            def _mem_scores(t: pa.Table) -> pa.Table:
                m = pa.array(ray.get(mem_ref), pa.int64())
                sub = t.filter(pc.is_in(t.column(id_col), value_set=m))
                return pa.Table.from_arrays(
                    [
                        sub.column(id_col).combine_chunks().cast(pa.int64()),
                        sub.column(score_col).combine_chunks().cast(pa.int64()),
                    ],
                    names=["id", "score"],
                )

            score_map = {}
            for b in ds.map_batches(
                _mem_scores, batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow"):
                score_map.update(zip(
                    b.column("id").to_pylist(), b.column("score").to_pylist(),
                ))
            best = {}
            for node, rep in comp.items():
                key = (score_map[node], -node)
                if rep not in best or key > best[rep][0]:
                    best[rep] = (key, node)
            winners = {rep: node for rep, (_, node) in best.items()}
            victims = np.fromiter(
                (n for n, rep in comp.items() if n != winners[rep]),
                dtype=np.int64,
            )
        else:
            victims = np.fromiter(
                (node for node, rep in comp.items() if node != rep),
                dtype=np.int64,
            )
    else:
        from ..struct.components import connected_components

        def _as_str(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [pc.cast(t.column("id_a"), pa.string()),
                 pc.cast(t.column("id_b"), pa.string())],
                names=["src_md5", "dst_md5"],
            )

        comp_ds = connected_components(
            pairs.map_batches(_as_str, batch_format="pyarrow"),
        )

        if keep == "best":
            victims = _distributed_best_victims(
                ds, comp_ds, id_col, score_col,
            )
        else:
            def _victims(t: pa.Table) -> pa.Table:
                keep_m = pc.not_equal(t.column("id"), t.column("component"))
                return pa.Table.from_arrays(
                    [pc.cast(t.filter(keep_m).column("id"), pa.int64())],
                    names=["id"],
                )

            rows = []
            for batch in comp_ds.map_batches(
                _victims, batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow"):
                rows.append(batch.column("id").to_numpy(zero_copy_only=False))
            victims = (
                np.concatenate(rows) if rows else np.array([], np.int64)
            )

    victims_ref = ray.put(np.sort(victims))

    def _keep(t: pa.Table) -> pa.Table:
        v = pa.array(ray.get(victims_ref), pa.int64())
        return t.filter(pc.invert(pc.is_in(t.column(id_col), value_set=v)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def _distributed_best_victims(ds, comp_ds, id_col: str, score_col) -> np.ndarray:
    """keep='best' winner selection beyond the driver pair budget.

    (id, component) labels join scores via one bucketed attach, the
    (score, −id) argmax per component runs as ONE ``groupby(component)
    .max`` over a fixed-width digit encoding (lexicographic max ==
    numeric max), and losers stream back as the victim id vector —
    bounded by the duplicate volume, same contract as keep='first'.
    Requires ``0 <= id < 1e18`` and ``|score| < 1e18`` (asserted).
    """
    from ..struct.degree import bucketed_attach
    from .relational import groupby_agg

    bias = 10 ** 18

    def _scores(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(t.column(id_col), pa.string()).combine_chunks(),
                t.column(score_col).combine_chunks().cast(pa.int64()),
            ],
            names=["id", "score"],
        )

    scores_ds = ds.map_batches(_scores, batch_format="pyarrow")
    withscore = bucketed_attach(
        comp_ds.select_columns(["id", "component"]),
        "id", scores_ds, "id", ["score"],
    )

    def _enc(t: pa.Table) -> pa.Table:
        ids = t.column("id").combine_chunks().cast(pa.int64())
        scores = t.column("score").combine_chunks()
        idv = ids.to_numpy(zero_copy_only=False)
        sv = scores.to_numpy(zero_copy_only=False)
        if len(idv) and (
            idv.min() < 0 or idv.max() >= bias
            or abs(int(sv.min())) >= bias or int(sv.max()) >= bias
        ):
            raise ValueError("dedup keep='best' encoding range exceeded")
        enc = pc.binary_join_element_wise(
            pc.utf8_lpad(
                pc.cast(pc.add(scores, bias), pa.string()), 19, padding="0",
            ),
            pc.utf8_lpad(
                pc.cast(pc.subtract(bias, ids), pa.string()), 19, padding="0",
            ),
            "",
        )
        return pa.Table.from_arrays(
            [ids, t.column("component").combine_chunks(), enc],
            names=["id", "component", "enc"],
        )

    enc_ds = (
        withscore.map_batches(_enc, batch_format="pyarrow").materialize()
    )
    winners = groupby_agg(enc_ds, "component", {"best_enc": ("max", "enc")})
    tagged = bucketed_attach(
        enc_ds, "component", winners, "component", ["best_enc"],
    )

    def _losers(t: pa.Table) -> pa.Table:
        lose = pc.not_equal(t.column("enc"), t.column("best_enc"))
        return pa.Table.from_arrays(
            [t.filter(lose).column("id").combine_chunks()], names=["id"],
        )

    rows = []
    for batch in tagged.map_batches(
        _losers, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        rows.append(batch.column("id").to_numpy(zero_copy_only=False))
    return np.concatenate(rows) if rows else np.array([], np.int64)


def _exact_dedup_corpus(ds, text_col: str, id_col: str):
    """Exact-text dedup: keep the min-id doc per distinct text (the
    hash-partitioned survivor join of SURVEY §2.8)."""
    from .text import exact_dedup

    survivors = exact_dedup(ds, text_col, id_col)
    from ..struct.degree import bucketed_semi_join

    def _ids(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(t.column(id_col), pa.string())], names=["key"],
        )

    keep_keys = survivors.map_batches(_ids, batch_format="pyarrow")

    def _tag(t: pa.Table) -> pa.Table:
        return t.append_column("_key", pc.cast(t.column(id_col), pa.string()))

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    out = bucketed_semi_join(tagged, "_key", keep_keys, "key")
    return out.drop_columns(["_key"])


def ann_join(
    left,
    right,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    bands: int = 16,
    seed: int = 4321,
):
    """Approximate cosine-similarity JOIN between TWO embedding tables —
    the record-linkage / cross-corpus-alignment primitive: one row
    ``(id_left, id_right, cosine)`` per cross-table pair with cosine ≥
    ``threshold``.  Same banded hyperplane LSH as
    :func:`embedding_near_dup_pairs` (shared seeded planes, so both
    sides hash identically), but the within-bucket verify only scores
    LEFT × RIGHT pairs — the self-pairs of either side never compute.
    Exact within-bucket cosines → no false positives; recall follows
    the banding bound ((1 - p)^bands miss rate; pick bands for the
    threshold as documented there).

    Scale shape: each side emits ``bands`` bucket rows, ONE bucket-sort
    shuffle co-locates collisions, per-run numpy matmul verifies, one
    pair-key dedup collapses multi-band hits.  Ids may collide across
    tables (the side tag disambiguates until the final projection).
    """
    def _bucket_rows_side(side_val: int):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                # dim would be 0 and the offsets arange below would need
                # a zero step — return the output schema directly
                return pa.Table.from_arrays(
                    [pa.array([], pa.uint64()), pa.array([], pa.int64()),
                     pa.array([], pa.int64()),
                     pa.array([], pa.list_(pa.float64()))],
                    names=["bucket", id_col, "_side", "unit"],
                )
            arr = t.column(vec_col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            flat = np.asarray(arr.values, dtype=np.float64)
            offsets = np.asarray(arr.offsets)
            dim = int(offsets[1] - offsets[0]) if len(arr) else 0
            mat = flat.reshape(len(arr), dim)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            rng = np.random.RandomState(seed)
            planes = rng.standard_normal((bands, n_planes, dim))
            n = len(arr)
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            keys = np.empty(n * bands, dtype=np.uint64)
            weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
            for band in range(bands):
                signs = (unit @ planes[band].T) > 0
                code = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
                keys[band::bands] = (
                    np.uint64(band) << np.uint64(n_planes)
                ) | code
            repeated = np.repeat(unit, bands, axis=0)
            unit_list = pa.ListArray.from_arrays(
                pa.array(np.arange(
                    0, (n * bands + 1) * dim, dim, dtype=np.int32,
                )),
                pa.array(repeated.reshape(-1), pa.float64()),
            )
            return pa.Table.from_arrays(
                [
                    pa.array(keys, pa.uint64()),
                    pa.array(np.repeat(ids, bands), pa.int64()),
                    pa.array(
                        np.full(n * bands, side_val, np.int64), pa.int64(),
                    ),
                    unit_list,
                ],
                names=["bucket", id_col, "_side", "unit"],
            )

        return _f

    rows = left.select_columns([id_col, vec_col]).map_batches(
        _bucket_rows_side(0), batch_format="pyarrow",
    ).union(
        right.select_columns([id_col, vec_col]).map_batches(
            _bucket_rows_side(1), batch_format="pyarrow",
        ),
    )

    def _run_pairs(t: pa.Table) -> pa.Table:
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sides = t.column("_side").to_numpy(zero_copy_only=False)
        arr = t.column("unit")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.values, dtype=np.float64)
        if t.num_rows:
            offsets = np.asarray(arr.offsets)
            dim = int(offsets[1] - offsets[0])
            units = flat.reshape(t.num_rows, dim)
        else:
            units = flat.reshape(0, 0)
        l_out, r_out, c_out = [], [], []
        for start, end in _multi_runs(buckets):
            run_sides = sides[start:end]
            li = np.flatnonzero(run_sides == 0)
            ri = np.flatnonzero(run_sides == 1)
            if len(li) and len(ri):
                run_ids = ids[start:end]
                run_u = units[start:end]
                lu, lidx = np.unique(run_ids[li], return_index=True)
                ru, ridx = np.unique(run_ids[ri], return_index=True)
                sims = run_u[li][lidx] @ run_u[ri][ridx].T
                ia, ib = np.where(sims >= threshold)
                for x, y in zip(ia, ib):
                    l_out.append(int(lu[x]))
                    r_out.append(int(ru[y]))
                    c_out.append(round(float(sims[x, y]), 6))
        return pa.Table.from_arrays(
            [pa.array(l_out, pa.int64()), pa.array(r_out, pa.int64()),
             pa.array(c_out, pa.float64())],
            names=["id_left", "id_right", "cosine"],
        )

    pairs = rows.sort("bucket").map_batches(
        _run_pairs, batch_format="pyarrow",
    )

    from ..stages.dedup import dedup_exact_sorted

    def _key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column("id_left"), pa.string()),
            pc.cast(t.column("id_right"), pa.string()), "_",
        )
        return t.append_column("pair", key)

    pairs = pairs.map_batches(_key, batch_format="pyarrow")
    return dedup_exact_sorted(
        pairs, "pair", ["id_left", "id_right"],
    ).drop_columns(["pair"])
