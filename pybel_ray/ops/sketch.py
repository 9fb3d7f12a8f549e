"""Mergeable sketches for corpus-scale statistics.

:func:`approx_distinct` is a KMV (k-minimum-values) distinct-count
sketch: every batch contributes the ``k`` smallest 64-bit hashes of its
*distinct* values (dictionary-encode first, so hashing cost is per
distinct value per batch, not per row); the driver streams the partial
sketches through a single bounded merge (O(k) memory) and estimates

    distinct ≈ (k - 1) / h_(k)        (h normalized to [0, 1))

with standard error ~ 1/sqrt(k) (~3% at k=1024).  When the true distinct
count is at most ``k`` the sketch holds every hash and the estimate is
EXACT — which is what makes a SQL ``count(DISTINCT ...)`` oracle valid
on bounded-vocabulary corpora, while the pytest covers the approximate
regime.

Reference scope note: the reference engine has no sketches; this is the
training-data-pipeline "novel sketch" surface (SURVEY.md §2
beyond-reference operators).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "approx_distinct",
    "kmv_partials",
    "cms_from_partials",
    "cms_heavy_hitters",
    "CMS_MAX_DEPTH",
    "hll_registers",
    "hll_registers_table",
    "hll_registers_by_group",
    "hll_group_estimates",
    "hll_distinct",
    "HLL_P",
    "HLL_M",
    "md5_window_slots",
    "ddsketch_buckets",
    "ddsketch_buckets_by_group",
    "ddsketch_quantiles",
    "ddsketch_quantile_table",
]


def _hash64(values) -> np.ndarray:
    """Stable 64-bit hashes of an Arrow string array (md5 prefix)."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(  # noqa: S324
                    str(v).encode("utf8"),
                ).digest()[:8], "big",
            )
            for v in values.to_pylist()
        ],
        dtype=np.uint64,
    )


def kmv_partials(ds, col: str, k: int = 1024):
    """Per-batch KMV partials: each batch emits its ``k`` smallest
    distinct-value hashes as rows ``(h,)``."""

    def _partial(t: pa.Table) -> pa.Table:
        vals = t.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        uniq = pc.unique(vals)
        h = np.unique(_hash64(uniq))
        if len(h) > k:
            h = np.partition(h, k)[:k]
        return pa.Table.from_arrays(
            [pa.array(h.astype(np.int64), pa.int64())], names=["h"],
        )

    return ds.select_columns([col]).map_batches(_partial, batch_format="pyarrow")


def approx_distinct(ds, col: str, k: int = 1024) -> int:
    """KMV estimate of ``count(DISTINCT col)``; exact when the true
    count is ≤ ``k``.  The driver merge streams partials and keeps only
    the ``k`` smallest hashes (bounded memory however large the input).
    """
    partials = kmv_partials(ds, col, k)
    merged = np.array([], dtype=np.uint64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        merged = np.unique(np.concatenate([merged, h]))
        if len(merged) > k:
            merged = np.sort(merged)[:k]
    if len(merged) < k:
        return int(len(merged))
    h_k = float(merged[-1]) / float(2**64)
    return int(round((k - 1) / h_k))


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

#: the d hash rows slice disjoint 8-hex-char (32-bit) windows of ONE md5
#: per value — so a DuckDB oracle recomputes the identical sketch with
#: ``('0x' || substr(md5(word), 1+8*i, 8))::BIGINT % width``
CMS_MAX_DEPTH = 4


def md5_window_slots(values, modulus: int, n_windows: int) -> np.ndarray:
    """(n_windows, n) slot indices; one md5 per value, row ``i`` slices
    hex chars ``[8i, 8i+8)``.  The repo-wide hash-family convention
    shared by the Count-Min sketch and the Bloom filter
    (``pybel_ray.ops.bloom``): any change here must keep the DuckDB
    expression above in lockstep."""
    out = np.empty((n_windows, len(values)), np.int64)
    for j, v in enumerate(values):
        h = hashlib.md5(str(v).encode("utf8")).hexdigest()  # noqa: S324
        for i in range(n_windows):
            out[i, j] = int(h[8 * i:8 * i + 8], 16) % modulus
    return out


_cms_slots = md5_window_slots


def cms_from_partials(
    partials,
    value_col: str = "word",
    count_col: str = "n",
    width: int = 4096,
    depth: int = 4,
):
    """Fold ``(value, count)`` partial rows into a Count-Min matrix.

    Every batch folds its own rows into a LOCAL ``(depth, width)``
    int64 matrix and emits only the nonzero cells as ``(cell, n)`` rows
    (cell = row·width + slot) — so however large the corpus, the merge
    traffic is bounded by ``depth × width`` per batch and the driver
    merge is a streaming O(depth·width) accumulation: no groupby
    exchange anywhere.  Estimates are the classic CMS upper bound:
    ``est(v) = min_i M[i, slot_i(v)] ≥ true(v)``.
    """
    if not 1 <= depth <= CMS_MAX_DEPTH:
        raise ValueError("depth must be in 1..%d" % CMS_MAX_DEPTH)

    def _fold(t: pa.Table) -> pa.Table:
        vals = t.column(value_col).to_pylist()
        n = t.column(count_col).to_numpy(zero_copy_only=False)
        local = np.zeros((depth, width), np.int64)
        if vals:
            slots = _cms_slots(vals, width, depth)
            for i in range(depth):
                np.add.at(local[i], slots[i], n)
        cells = np.flatnonzero(local.ravel())
        return pa.Table.from_arrays(
            [pa.array(cells, pa.int64()),
             pa.array(local.ravel()[cells], pa.int64())],
            names=["cell", "n"],
        )

    folded = partials.map_batches(_fold, batch_format="pyarrow")
    matrix = np.zeros(depth * width, np.int64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        cells = b.column("cell").to_numpy(zero_copy_only=False)
        np.add.at(matrix, cells, b.column("n").to_numpy(zero_copy_only=False))
    return matrix.reshape(depth, width)


def cms_heavy_hitters(
    ds,
    text_col: str = "text",
    threshold: int = 100,
    width: int = 4096,
    depth: int = 4,
):
    """Heavy-hitter words by Count-Min estimate: every word whose CMS
    estimate is ≥ ``threshold`` — a guaranteed SUPERSET of the true heavy
    hitters (CMS never underestimates).

    Two streaming passes over the token stream, NO full-vocabulary
    exchange (the point of the sketch at 100 TB): pass 1 folds per-batch
    token counts into the fixed-size matrix; pass 2 broadcasts the matrix
    (``ray.put`` once), re-scans each batch's distinct words, and emits
    only candidates — the final dedup groupby moves one row per
    (candidate, batch), a tiny fraction of the vocabulary.
    Returns a Dataset of ``(word, est_n)``.
    """
    import ray

    from .relational import groupby_agg
    from .text import token_count_partials

    partials = token_count_partials(ds, text_col)
    matrix = cms_from_partials(partials, "word", "n", width, depth)
    ref = ray.put(matrix)

    def _candidates(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        vals = t.column("word").to_pylist()
        if not vals:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["word", "est_n"],
            )
        slots = _cms_slots(vals, width, depth)
        est = np.min(
            np.stack([m[i, slots[i]] for i in range(depth)]), axis=0,
        )
        keep = est >= threshold
        return pa.Table.from_arrays(
            [pc.filter(t.column("word"), pa.array(keep)),
             pa.array(est[keep], pa.int64())],
            names=["word", "est_n"],
        )

    # the second token scan re-executes the tokenize lineage (the standard
    # two-pass trade: re-reading beats materializing a 100 TB token table)
    cands = token_count_partials(ds, text_col).map_batches(
        _candidates, batch_format="pyarrow",
    )
    # est is a global constant per word, so max() is pure dedup
    return groupby_agg(cands, "word", {"est_n": ("max", "est_n")})


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

#: 2^8 = 256 registers — the bucket is the first 2 hex chars of the md5
#: and the rank field the next 13 (52 bits), so a DuckDB oracle shares
#: the exact hash slicing (``('0x'||substr(md5(v),1,2))::BIGINT`` /
#: ``53 - length(bin(v))``) and the register table compares integer-exact
HLL_P = 8
HLL_M = 1 << HLL_P
_HLL_RANK_BITS = 52  # 13 hex chars


def _hll_bucket_rho(values) -> tuple:
    """(bucket, rho) per value; rho = leading zeros in the 52-bit rank
    field + 1 (53 when the field is all zeros)."""
    n = len(values)
    bucket = np.empty(n, np.int64)
    rho = np.empty(n, np.int64)
    for j, v in enumerate(values):
        h = hashlib.md5(str(v).encode("utf8")).hexdigest()  # noqa: S324
        bucket[j] = int(h[:2], 16)
        rank = int(h[2:15], 16)
        rho[j] = (_HLL_RANK_BITS + 1) - rank.bit_length() if rank else (
            _HLL_RANK_BITS + 1
        )
    return bucket, rho


def hll_registers(ds, col: str) -> np.ndarray:
    """Merged HyperLogLog registers (length-256 int64, 0 = empty).

    Per batch: one md5 per DISTINCT value → local register max → emit
    only nonzero registers as ``(bucket, rho)`` rows; the driver merge
    is a streaming elementwise max over 256 ints — no exchange, O(m)
    memory whatever the corpus, and fully mergeable across corpora
    (max is associative/commutative, so the sketch is layout- and
    shard-invariant by construction).
    """

    def _fold(t: pa.Table) -> pa.Table:
        vals = t.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = pc.unique(pc.drop_null(vals))
        local = np.zeros(HLL_M, np.int64)
        if len(vals):
            bucket, rho = _hll_bucket_rho(vals.to_pylist())
            np.maximum.at(local, bucket, rho)
        nz = np.flatnonzero(local)
        return pa.Table.from_arrays(
            [pa.array(nz, pa.int64()), pa.array(local[nz], pa.int64())],
            names=["bucket", "rho"],
        )

    folded = ds.select_columns([col]).map_batches(_fold, batch_format="pyarrow")
    regs = np.zeros(HLL_M, np.int64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        np.maximum.at(
            regs,
            b.column("bucket").to_numpy(zero_copy_only=False),
            b.column("rho").to_numpy(zero_copy_only=False),
        )
    return regs


def hll_registers_table(ds, col: str) -> pa.Table:
    """Nonzero registers as an Arrow ``(bucket, rho)`` table — the
    integer-exact surface a SQL oracle recomputes (the float estimate
    lives in :func:`hll_distinct`, pinned by error-bound tests)."""
    regs = hll_registers(ds, col)
    nz = np.flatnonzero(regs)
    return pa.Table.from_arrays(
        [pa.array(nz, pa.int64()), pa.array(regs[nz], pa.int64())],
        names=["bucket", "rho"],
    )


def hll_distinct(ds, col: str) -> int:
    """HyperLogLog distinct-count estimate (standard error ~1.04/√m ≈
    6.5% at m=256), with the small-range linear-counting correction."""
    regs = hll_registers(ds, col)
    return _hll_estimate(regs)


def _hll_estimate(regs: np.ndarray) -> int:
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_registers_by_group(ds, group_col: str, col: str):
    """Per-group HyperLogLog registers as ``(group, bucket, rho)`` rows.

    Per batch: ONE md5 per distinct ``(group, value)`` pair → local
    per-group register max (an Arrow group_by inside the batch) → emit
    only nonzero registers; a single distributed
    ``groupby([group, bucket]).max`` exchange merges them.  At most
    m=256 rows per group ever move, whatever the group's cardinality,
    so a skewed group costs the same exchange volume as a uniform one —
    this is the scale path for "approx distinct per key" where an exact
    ``count(DISTINCT)`` would co-locate every distinct value of a hot
    key on one worker.

    The register table is integer-exact (bucket = first 2 md5 hex
    chars, rho = leading zeros of the 52-bit rank field + 1), so a SQL
    oracle recomputes the sketch itself cell-for-cell; the float
    estimate (:func:`hll_group_estimates`) is pinned by error-bound
    tests.
    """

    def _partial(t: pa.Table) -> pa.Table:
        pairs = (
            pa.table({"g": t.column(group_col), "v": t.column(col)})
            .drop_null()
            .group_by(["g", "v"])
            .aggregate([])
        )
        if pairs.num_rows == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pairs.column("g").type),
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                ],
                names=[group_col, "bucket", "rho"],
            )
        bucket, rho = _hll_bucket_rho(pairs.column("v").to_pylist())
        local = (
            pa.Table.from_arrays(
                [
                    pairs.column("g"),
                    pa.array(bucket, pa.int64()),
                    pa.array(rho, pa.int64()),
                ],
                names=[group_col, "bucket", "rho"],
            )
            .group_by([group_col, "bucket"])
            .aggregate([("rho", "max")])
        )
        return local.rename_columns([group_col, "bucket", "rho"])

    partial = ds.select_columns([group_col, col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    merged = partial.groupby([group_col, "bucket"]).max("rho")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([group_col, "bucket", "rho"])

    return merged.map_batches(_rename, batch_format="pyarrow")


def hll_group_estimates(ds, group_col: str, col: str) -> pa.Table:
    """Per-group HLL distinct estimates ``(group, approx_distinct)``.

    Streams the merged per-group registers to the driver (≤256 rows per
    group) and applies the standard estimator with linear-counting
    correction.  Group order is sorted for determinism.
    """
    regs_ds = hll_registers_by_group(ds, group_col, col)
    per_group: dict = {}
    for b in regs_ds.iter_batches(batch_format="pyarrow"):
        groups = b.column(group_col).to_pylist()
        buckets = b.column("bucket").to_numpy(zero_copy_only=False)
        rhos = b.column("rho").to_numpy(zero_copy_only=False)
        for g, bk, r in zip(groups, buckets, rhos):
            regs = per_group.setdefault(g, np.zeros(HLL_M, np.int64))
            if r > regs[bk]:
                regs[bk] = r
    keys = sorted(per_group)
    return pa.Table.from_arrays(
        [
            pa.array(keys),
            pa.array([_hll_estimate(per_group[g]) for g in keys], pa.int64()),
        ],
        names=[group_col, "approx_distinct"],
    )


def _dd_msb_head(av: np.ndarray, sub_bits: int) -> tuple:
    """(msb, head) per positive int64 value: msb = bit length, head =
    the leading ``1 + sub_bits`` bits (the DDSketch-style log bucket,
    in exact integer arithmetic — no float log at bucket boundaries).
    """
    m = np.floor(np.log2(av.astype(np.float64))).astype(np.int64) + 1
    # one-step boundary correction makes the float log exact everywhere;
    # RIGHT shifts so the tests are overflow-safe for bit length 63
    # (av >> (m-1) == 0  ⇔  bit_length < m;  av >> m > 0  ⇔  > m)
    m = np.clip(m, 1, 63)
    low = np.right_shift(av, np.maximum(m - 1, 0)) == 0
    m[low] -= 1
    high = np.right_shift(av, np.minimum(m, 63)) > 0
    m[high] += 1
    shift = np.maximum(m - 1 - sub_bits, 0)
    head = np.right_shift(av, shift)
    return m, head


def ddsketch_buckets(ds, col: str, sub_bits: int = 3):
    """Mergeable log-bucketed quantile sketch (DDSketch-flavored, exact
    integer buckets): values quantize to micros, each lands in the
    bucket keyed by ``(sign, msb, head)`` where ``msb`` is the bit
    length of ``|micros|`` and ``head`` its leading ``1 + sub_bits``
    bits.  Bucket width is ≤ 2^-sub_bits relative, so quantile
    estimates carry a bounded RELATIVE error at any scale and any
    distribution — the scale path where an exact distributed quantile
    (one full sort) is not worth a shuffle.

    Per batch: vectorized bucket codes + one local ``value_counts`` →
    at most ~``3·64·2^sub_bits`` partial rows per batch; ONE
    ``groupby([sign, msb, head]).sum`` exchange merges them (counts are
    exact sums, so the sketch is layout- and shard-invariant by
    construction).  The bucket table is integer-exact and a DuckDB
    oracle recomputes it cell-for-cell via ``length(bin(v))`` and
    integer shifts; the float quantile estimates
    (:func:`ddsketch_quantiles`) are pinned by error-bound tests.
    """

    def _partial(t: pa.Table) -> pa.Table:
        vals = t.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = vals.drop_null().to_numpy(zero_copy_only=False)
        q = np.floor(
            np.asarray(v, np.float64) * 1e6 + 0.5,
        ).astype(np.int64)
        sign = np.sign(q)
        av = np.abs(q)
        msb = np.zeros(len(q), np.int64)
        head = np.zeros(len(q), np.int64)
        nz = av > 0
        if nz.any():
            msb[nz], head[nz] = _dd_msb_head(av[nz], sub_bits)
        codes = pa.Table.from_arrays(
            [
                pa.array(sign, pa.int64()),
                pa.array(msb, pa.int64()),
                pa.array(head, pa.int64()),
            ],
            names=["sign", "msb", "head"],
        )
        local = codes.group_by(["sign", "msb", "head"]).aggregate(
            [([], "count_all")],
        )
        return local.rename_columns(["sign", "msb", "head", "n"])

    partial = ds.select_columns([col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    merged = partial.groupby(["sign", "msb", "head"]).sum("n")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["sign", "msb", "head", "n"])

    return merged.map_batches(_rename, batch_format="pyarrow")


def ddsketch_quantiles(ds, col: str, qs, sub_bits: int = 3) -> pa.Table:
    """Quantile estimates from the bucket sketch: the bucket table
    (≤ a few hundred rows) streams to the driver, buckets sort by their
    numeric lower bound, and each requested quantile reads the midpoint
    of the bucket its rank falls in.  Max relative error ≈
    2^-(sub_bits+1) (bucket half-width); pinned by tests.
    """
    rows = []
    for b in ddsketch_buckets(ds, col, sub_bits).iter_batches(
        batch_format="pyarrow",
    ):
        rows.append(b)
    if not rows:
        raise ValueError("empty input")
    t = pa.concat_tables(rows)
    sign = t.column("sign").to_numpy(zero_copy_only=False)
    msb = t.column("msb").to_numpy(zero_copy_only=False)
    head = t.column("head").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False)
    shift = np.maximum(msb - 1 - sub_bits, 0)
    # float multiply, not int left-shift: (head+1) << shift overflows
    # int64 for bit-length-63 buckets
    lo = head.astype(np.float64) * np.exp2(shift.astype(np.float64))
    hi = (head + 1).astype(np.float64) * np.exp2(shift.astype(np.float64))
    mid = np.where(msb == 0, 0.0, (lo + hi) / 2.0) / 1e6 * sign
    # sort buckets by midpoint (negatives ascend toward zero first)
    order = np.argsort(mid, kind="stable")
    mid, n = mid[order], n[order]
    cum = np.cumsum(n)
    total = cum[-1]
    out_q, out_v = [], []
    for q in qs:
        rank = min(max(q, 0.0), 1.0) * (total - 1)
        idx = int(np.searchsorted(cum, rank + 1, side="left"))
        out_q.append(float(q))
        out_v.append(float(mid[min(idx, len(mid) - 1)]))
    return pa.Table.from_arrays(
        [pa.array(out_q, pa.float64()), pa.array(out_v, pa.float64())],
        names=["q", "value"],
    )


def ddsketch_quantile_table(
    ds, col: str, q_bps, sub_bits: int = 3,
) -> pa.Table:
    """Integer-exact quantile readout from the bucket sketch: quantiles
    arrive as basis points (``q_bp``, 0..10000) and each estimate is
    reported as ``value_e6 = sign * floor((bucket_lo + bucket_hi)/2)``
    in micros — the floor midpoint, computed as
    ``(head << shift) + (1 << (shift-1))`` so every term stays below
    2^63 even for bit-length-63 buckets, and a DuckDB oracle reproduces
    every cell with no float arithmetic anywhere (the rank inequality
    ``cum*10000 >= q_bp*(total-1) + 10000`` is the integer form of
    ``searchsorted(cum, q*(total-1) + 1)``).  Bucket midpoints are
    distinct by construction ((msb, head) ranges are disjoint), so the
    cumulative order is well-defined.
    """
    parts = []
    for b in ddsketch_buckets(ds, col, sub_bits).iter_batches(
        batch_format="pyarrow",
    ):
        parts.append(b)
    if not parts:
        raise ValueError("empty input")
    t = pa.concat_tables(parts)
    rows = []
    for sign, msb, head, n in zip(
        t.column("sign").to_pylist(),
        t.column("msb").to_pylist(),
        t.column("head").to_pylist(),
        t.column("n").to_pylist(),
    ):
        if msb == 0:
            v2 = 0
        else:
            shift = max(msb - 1 - sub_bits, 0)
            half = (1 << (shift - 1)) if shift > 0 else 0
            v2 = sign * ((head << shift) + half)
        rows.append((v2, n))
    rows.sort()
    total = sum(n for _, n in rows)
    cums = []
    c = 0
    for v2, n in rows:
        c += n
        cums.append((v2, c))
    out_q, out_v = [], []
    for q_bp in q_bps:
        # integer searchsorted: first bucket whose cum covers the rank
        target = q_bp * (total - 1) + 10000
        pick = cums[-1][0]
        for v2, cum in cums:
            if cum * 10000 >= target:
                pick = v2
                break
        out_q.append(int(q_bp))
        out_v.append(int(pick))
    return pa.Table.from_arrays(
        [pa.array(out_q, pa.int64()), pa.array(out_v, pa.int64())],
        names=["q_bp", "value_e6"],
    )


def ddsketch_buckets_by_group(ds, group_col: str, col: str, sub_bits: int = 3):
    """Per-group DDSketch bucket tables: :func:`ddsketch_buckets` with
    the group column prepended to the bucket key, so one pass yields a
    mergeable quantile sketch for EVERY group (the per-segment latency
    / per-source length-distribution use case) without a per-group sort.

    Same scale shape as the global sketch — each batch emits at most
    ``groups_in_batch × ~3·64·2^sub_bits`` partial rows and ONE
    ``groupby([group, sign, msb, head]).sum`` exchange merges them; a
    hot group never co-locates its raw rows, only its bucket counts.
    The bucket table stays integer-exact, so the same
    ``length(bin(v))``-shift DuckDB oracle verifies it cell-for-cell
    with the group column added to the GROUP BY.
    """

    def _partial(t: pa.Table) -> pa.Table:
        vals = t.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        grp = t.column(group_col)
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        # null group keys are dropped (same convention as
        # hll_registers_by_group: Ray's groupby exchange cannot sort a
        # null key; per-group sketches are for labeled rows)
        keep = pc.and_(pc.is_valid(vals), pc.is_valid(grp))
        vals = vals.filter(keep)
        grp = grp.filter(keep)
        v = vals.to_numpy(zero_copy_only=False)
        q = np.floor(
            np.asarray(v, np.float64) * 1e6 + 0.5,
        ).astype(np.int64)
        sign = np.sign(q)
        av = np.abs(q)
        msb = np.zeros(len(q), np.int64)
        head = np.zeros(len(q), np.int64)
        nz = av > 0
        if nz.any():
            msb[nz], head[nz] = _dd_msb_head(av[nz], sub_bits)
        codes = pa.Table.from_arrays(
            [
                grp,
                pa.array(sign, pa.int64()),
                pa.array(msb, pa.int64()),
                pa.array(head, pa.int64()),
            ],
            names=[group_col, "sign", "msb", "head"],
        )
        local = codes.group_by(
            [group_col, "sign", "msb", "head"],
        ).aggregate([([], "count_all")])
        return local.rename_columns(
            [group_col, "sign", "msb", "head", "n"],
        )

    partial = ds.select_columns([group_col, col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    merged = partial.groupby([group_col, "sign", "msb", "head"]).sum("n")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([group_col, "sign", "msb", "head", "n"])

    return merged.map_batches(_rename, batch_format="pyarrow")
