"""Bloom-filter semi-join pre-filter.

The classic shuffle-avoidance move for a 100 TB join: when the key side
is too large to broadcast raw but a bitset of its hashes fits in memory,
build a Bloom filter over the keys (one streaming pass, driver merge is
a pure bitwise OR), broadcast the bitset once via ``ray.put``, and
pre-filter the big side inside ``map_batches`` — only probable members
enter the exchange.  With ``exact=True`` (the default) the survivors
finish through the existing bucketed semi-join
(:func:`pybel_ray.struct.degree.bucketed_semi_join`), which removes
Bloom false positives, so the result EQUALS the SQL ``WHERE EXISTS``
semi-join while the shuffle moves ``|matches| + fp·|big|`` rows instead
of ``|big|``.

Hashing matches the repo's sketch convention (one md5 per distinct key
per batch, disjoint 8-hex-char windows per hash function — see
``ops/sketch.py``), so false-positive behavior is deterministic and
layout-invariant.  Sizing: fp ≈ (1 − e^(−kn/m))^k; the default 2^22
bits / 4 hashes gives fp < 1% up to ~300k distinct keys — pass
``n_bits`` sized to the real key cardinality (the bitset broadcast is
``n_bits/8`` bytes, e.g. 512 KiB at the default).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# hash functions slice disjoint 8-hex-char windows of one md5 — the
# shared sketch hash family, defined once in ops/sketch.py
from .sketch import md5_window_slots as _bloom_positions

__all__ = ["build_bloom", "bloom_semi_join", "BLOOM_MAX_HASHES"]

BLOOM_MAX_HASHES = 4


def build_bloom(ds, key_col: str, n_bits: int = 1 << 22, n_hashes: int = 4):
    """One streaming pass over the key side → packed uint64 bitset.

    Each batch sets bits in a LOCAL bitset and emits only its nonzero
    words as ``(word, bits)`` rows; the driver merge is a streaming
    bitwise OR into ``n_bits/64`` words — no exchange, bounded driver
    memory whatever the key count.  Null keys are skipped (semi-join
    semantics: null never matches).
    """
    if not 1 <= n_hashes <= BLOOM_MAX_HASHES:
        raise ValueError("n_hashes must be in 1..%d" % BLOOM_MAX_HASHES)
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    n_words = n_bits // 64

    def _fold(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = pc.unique(pc.drop_null(keys))
        local = np.zeros(n_words, np.uint64)
        if len(keys):
            pos = _bloom_positions(keys.to_pylist(), n_bits, n_hashes)
            words = (pos >> 6).ravel()
            bits = np.uint64(1) << (pos & 63).astype(np.uint64).ravel()
            np.bitwise_or.at(local, words, bits)
        nz = np.flatnonzero(local)
        return pa.Table.from_arrays(
            [pa.array(nz, pa.int64()),
             pa.array(local[nz].view(np.int64), pa.int64())],
            names=["word", "bits"],
        )

    folded = ds.select_columns([key_col]).map_batches(
        _fold, batch_format="pyarrow",
    )
    bitset = np.zeros(n_words, np.uint64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        w = b.column("word").to_numpy(zero_copy_only=False)
        v = b.column("bits").to_numpy(zero_copy_only=False).view(np.uint64)
        np.bitwise_or.at(bitset, w, v)
    return bitset


def bloom_semi_join(
    ds,
    key: str,
    keys_ds,
    keys_key=None,
    n_bits: int = 1 << 22,
    n_hashes: int = 4,
    exact: bool = True,
    num_buckets: int = 64,
):
    """Semi-join ``ds`` against ``keys_ds`` with a Bloom pre-filter.

    ``exact=True`` removes Bloom false positives through the bucketed
    semi-join, so the output equals SQL ``WHERE EXISTS`` row-for-row;
    ``exact=False`` returns the pre-filtered superset (no exchange at
    all — for pipelines that tolerate fp·|big| extra rows).  The batch
    probe hashes each DISTINCT key once and maps membership back to
    rows via ``dictionary_encode`` — per-row cost is one gather.
    """
    import ray

    keys_key = keys_key or key
    bitset = build_bloom(keys_ds, keys_key, n_bits, n_hashes)
    ref = ray.put(bitset)

    def _prefilter(t: pa.Table) -> pa.Table:
        bs = ray.get(ref)
        col = t.column(key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        dvals = enc.dictionary.to_pylist()
        if not dvals:
            return t.slice(0, 0)
        pos = _bloom_positions(dvals, n_bits, n_hashes)
        words, bits = pos >> 6, (pos & 63).astype(np.uint64)
        member = np.all(
            (bs[words] >> bits) & np.uint64(1) != 0, axis=0,
        )
        valid = pc.is_valid(enc.indices).to_numpy(zero_copy_only=False)
        codes = np.asarray(
            pc.fill_null(enc.indices, 0).to_numpy(zero_copy_only=False),
            np.int64,
        )
        keep = np.zeros(t.num_rows, bool)
        keep[valid] = member[codes[valid]]
        return t.filter(pa.array(keep))

    survivors = ds.map_batches(_prefilter, batch_format="pyarrow")
    if not exact:
        return survivors
    from ..struct.degree import bucketed_semi_join

    return bucketed_semi_join(
        survivors, key, keys_ds, keys_key, num_buckets=num_buckets,
    )
