"""Exact dedup on a key column (node_md5 / edge_md5 / triple key).

Three-phase, shuffle-minimizing (SURVEY.md §2.8, §4):

1. **Local combiner** — vectorized first-occurrence dedup inside each Arrow
   batch (``map_batches``).  Rows with the same key are byte-identical
   (deterministic canonicalization), so dropping duplicates early shrinks
   the shuffle payload; hot keys collapse to one row per block before the
   wide exchange (the salted pre-aggregate analog for skew).
2. **Bucketed groupby** — the shuffle key is ``hash(key) % num_buckets``,
   NOT the key itself: each ``map_groups`` call receives a whole bucket
   (many keys) and runs one *vectorized* dedup over it.  This turns
   per-unique-key Python overhead into ``num_buckets`` calls total while
   keeping exactness (equal keys always share a bucket).
3. First row per key wins (reference semantics: idempotent insertion,
   graph.py:353-359).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "local_dedup_table", "dedup_exact", "dedup_exact_sorted", "add_hash_bucket",
]


def local_dedup_table(table: pa.Table, key: str) -> pa.Table:
    """Vectorized first-occurrence dedup within one Arrow table."""
    if table.num_rows <= 1:
        return table
    arr = table.column(key)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    codes = arr.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(codes, return_index=True)
    if len(first_idx) == table.num_rows:
        return table
    first_idx.sort()
    return table.take(pa.array(first_idx))


def _bucket_codes(arr: pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket per value (dictionary-encode once, hash uniques)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    uniques = d.dictionary.to_pylist()
    import zlib

    unique_buckets = np.fromiter(
        (zlib.crc32(
            u.encode("utf8") if isinstance(u, str) else repr(u).encode("utf8")
        ) % num_buckets if u is not None else 0
         for u in uniques),
        dtype=np.int64, count=len(uniques),
    )
    indices = d.indices
    if indices.null_count:
        # null keys: deterministic bucket via index 0 (dedup/join semantics
        # only need equal keys to co-locate, which nulls trivially do)
        import pyarrow.compute as _pc

        indices = _pc.fill_null(indices, 0)
    codes = indices.to_numpy(zero_copy_only=False)
    if not len(unique_buckets):
        return np.zeros(len(codes), dtype=np.int64)
    return unique_buckets[codes]


def add_hash_bucket(table: pa.Table, key: str, num_buckets: int, out: str = "_bucket") -> pa.Table:
    buckets = _bucket_codes(table.column(key), num_buckets)
    return table.append_column(out, pa.array(buckets, pa.int64()))


def dedup_exact(ds, key: str, local_first: bool = True, num_buckets: int = 64):
    """Global exact dedup of a Dataset on ``key`` (first row wins)."""

    def _local(t: pa.Table, _key=key) -> pa.Table:
        t = local_dedup_table(t, _key)
        return add_hash_bucket(t, _key, num_buckets)

    def _no_local(t: pa.Table, _key=key) -> pa.Table:
        return add_hash_bucket(t, _key, num_buckets)

    ds = ds.map_batches(_local if local_first else _no_local, batch_format="pyarrow")

    def _bucket_dedup(group: pa.Table, _key=key) -> pa.Table:
        return local_dedup_table(group, _key)

    out = ds.groupby("_bucket").map_groups(_bucket_dedup, batch_format="pyarrow")
    return out.drop_columns(["_bucket"])


def dedup_exact_sorted(ds, key: str, sort_cols=None, num_partitions=None):
    """Global dedup AND global sort in a single all-to-all exchange.

    ``dedup_exact`` + a subsequent ``sort`` costs two shuffles; when the
    output must be globally sorted anyway (the triple export,
    io/tsv/api.py:78-84), one range-partitioned sort does both jobs:

    1. local first-occurrence dedup per input block (combiner);
    2. ONE global ``sort(sort_cols)`` — Ray's sort reduce emits exactly one
       merged block per range partition (``merge_sorted_blocks``,
       ray/data/_internal/arrow_block.py:403), and every row with the same
       sort key lands in the same partition, so after the sort all
       duplicates of ``key`` sit in the same block;
    3. per-block dedup again — now provably global.

    Measured on 7.5M triple rows / 2.79M unique at 32 CPUs: 17.6 s vs
    24.1 s for ``dedup_exact`` + ``sort``.

    ``sort_cols`` must functionally determine ``key`` (here: key is the
    concatenation of the sort columns), else duplicates may not co-locate.
    """

    def _local(t: pa.Table, _key=key) -> pa.Table:
        return local_dedup_table(t, _key)

    ds = ds.map_batches(_local, batch_format="pyarrow")
    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # The sort is a full barrier, so materializing its input is free —
        # and it lets us size the exchange to the DATA instead of the
        # cluster: a handful of ~64MB partitions for small outputs (a
        # 32-partition exchange on 7MB of triples measured ~5s of pure
        # scheduling overhead; 1 partition runs in <1s), one per CPU in
        # the mid range, and ~256MB partitions beyond (multi-node sizing
        # rule, see below).
        ds = ds.materialize()
        size = ds.size_bytes() or 0
        if size < (64 << 20):
            # tiny output: a wide exchange is pure scheduling overhead
            num_partitions = max(1, int(size // (16 << 20)))
        else:
            # one partition per CPU keeps the sort reduce fully parallel
            # (9 partitions on 600MB at 32 CPUs measured -19% large-leg
            # throughput); grow past the CPU count only at ~256MB each
            num_partitions = int(max(max(8, cpus), size // (256 << 20)))
    # coalesce before the sort: Ray's pull-based sort reduce fetches from
    # every map output, so cost grows with blocks² — 600 small parse blocks
    # sorted directly took 88 s vs 42 s after coalescing to 32 (measured,
    # 28.7M rows, 32 CPUs).
    ds = ds.repartition(num_partitions)
    ds = ds.sort(sort_cols if sort_cols is not None else key)
    return ds.map_batches(_local, batch_format="pyarrow")
