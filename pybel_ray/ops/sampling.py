"""Deterministic sampling and corpus mixing.

Large-scale pipelines never sample with a PRNG over a distributed
dataset — resumes, retries and re-partitioning would change the sample.
The standard trick is a *hash gate*: keep a row iff ``md5(key)`` lands
below a rate threshold.  The decision is a pure function of the row, so
it is stable across runs, engines, block layouts and cluster sizes, and
a SQL oracle reproduces it exactly (``substr(md5(...), 1, 4) < 'xxxx'``).

:func:`weighted_sample` generalizes this to per-stratum rates — the
corpus-mixing step of a training-data pipeline (e.g. up-sample curated
sources, down-sample crawl).

Cost note: md5 of a short key string is the one per-row Python step in
this module (Arrow has no md5 kernel); ~1 µs/row, amortized over
vectorized everything-else, and it keeps the gate bit-identical to SQL.

Reference scope note: the reference engine has no sampling surface; this
is part of the training-data-pipeline family (SURVEY.md §2
"beyond-reference" operators).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "hash_sample", "weighted_sample", "rate_to_threshold",
    "bottomk_sample", "hash_split", "negative_samples",
    "budget_mix_sample",
]


def rate_to_threshold(rate: float) -> str:
    """Map a keep-rate in [0, 1] to a 4-hex-char threshold; a row is kept
    iff ``md5(key)[:4] < threshold`` (lexicographic == numeric for
    fixed-width lowercase hex).  rate=1.0 keeps everything."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    n = int(rate * 65536)
    return "ffffg" if n >= 65536 else format(n, "04x")


def _md5_prefixes(keys: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    # None -> None: SQL md5(NULL) IS NULL, so null keys fall out of
    # every gate comparison instead of crashing
    return pa.array(
        [
            None if v is None
            else hashlib.md5(v.encode("utf8")).hexdigest()[:4]  # noqa: S324
            for v in keys.to_pylist()
        ],
        pa.string(),
    )


def hash_sample(ds, rate: float, key_col: str = "doc_id"):
    """Keep each row with probability ``rate``, deterministically in the
    row's key: ``md5(str(key))[:4] < rate_to_threshold(rate)``."""
    thresh = rate_to_threshold(rate)

    def _f(t: pa.Table) -> pa.Table:
        prefixes = _md5_prefixes(pc.cast(t.column(key_col), pa.string()))
        return t.filter(pc.less(prefixes, thresh))

    return ds.map_batches(_f, batch_format="pyarrow")


def weighted_sample(
    ds,
    rates: dict,
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
):
    """Corpus mixing: keep rows of stratum ``s`` at ``rates.get(s,
    default_rate)``, deterministically in the row key.

    The per-row threshold is a vectorized lookup (``pc.index_in`` into
    the small rates table), so adding strata costs nothing.
    """
    strata = list(rates)
    thresholds = pa.array(
        [rate_to_threshold(rates[s]) for s in strata], pa.string(),
    )
    default_thresh = rate_to_threshold(default_rate)
    value_set = pa.array(strata, pa.string())

    def _f(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t.column(strata_col), pa.string()), value_set=value_set,
        )
        row_thresh = pc.fill_null(pc.take(thresholds, idx), default_thresh)
        prefixes = _md5_prefixes(pc.cast(t.column(key_col), pa.string()))
        return t.filter(pc.less(prefixes, row_thresh))

    return ds.map_batches(_f, batch_format="pyarrow")


def bottomk_sample(ds, k: int, key_col: str = "doc_id"):
    """EXACT-size uniform sample: the ``k`` rows with the smallest
    ``md5(str(key))`` — the bottom-k-by-hash trick (a fixed-size
    variant of the hash gate: deterministic in the row keys, invariant
    to layout/resume/cluster size, and a SQL ``ORDER BY md5(...)
    LIMIT k`` oracle reproduces it row-for-row when keys are unique).

    Scale: each batch keeps only its local bottom-k (full 32-hex
    digests, so ties are impossible for distinct keys), so at most
    ``k × blocks`` tiny rows reach the final ``sort().limit(k)``.
    The sampled payload rides along; text columns move only for the
    winning rows of each batch.

    Null keys are excluded from the sample (SQL's ``md5(NULL)`` is NULL
    and sorts last, so the two sides agree whenever ``k`` does not
    exceed the non-null row count).
    """
    if k <= 0:
        raise ValueError("k must be positive")

    def _local(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column(key_col), pa.string())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        valid = pc.is_valid(keys)
        t = t.filter(valid)
        keys = keys.filter(valid)
        digests = pa.array(
            [
                hashlib.md5(v.encode("utf8")).hexdigest()  # noqa: S324
                for v in keys.to_pylist()
            ],
            pa.string(),
        )
        t = t.append_column("_h", digests)
        if t.num_rows > k:
            t = t.sort_by("_h").slice(0, k)
        return t

    out = ds.map_batches(_local, batch_format="pyarrow")
    return out.sort("_h").limit(k).drop_columns(["_h"])


def hash_split(ds, bounds, key_col: str = "doc_id", out_col: str = "split"):
    """Deterministic train/val/test assignment: every row gets a split
    label from the position of ``md5(str(key))[:4]`` among the hex
    ``bounds`` — ``[("train", "cccc"), ("val", "e666"), ("test",
    "ffff")]`` labels a row *train* when its prefix sorts at or below
    ``'cccc'``, *val* at or below ``'e666'``, else *test* (inclusive
    upper bounds; the SQL mirror is a ``CASE WHEN h <= ...`` chain).  Same gate family
    as :func:`hash_sample`, so the assignment is layout-, resume- and
    cluster-size-invariant, documents keep their split across reruns,
    and a SQL CASE over ``substr(md5(...), 1, 4)`` reproduces it
    exactly.  The final bound must be ``'ffff'`` so every non-null key
    is labeled; null keys get a null label.
    """
    bounds = list(bounds)
    if not bounds or bounds[-1][1].lower() != "ffff":
        raise ValueError("hash_split: final bound must be 'ffff'")

    def _f(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column(key_col), pa.string())
        prefixes = _md5_prefixes(keys)
        label = pa.nulls(t.num_rows, pa.string())
        assigned = pc.is_null(keys)  # null keys keep a null label
        for name, hi in bounds:
            take = pc.and_(
                pc.invert(assigned),
                pc.fill_null(pc.less_equal(prefixes, hi.lower()), False),
            )
            label = pc.if_else(take, name, label)
            assigned = pc.or_(assigned, take)
        return t.append_column(out_col, label)

    return ds.map_batches(_f, batch_format="pyarrow")


def negative_samples(ds, n_ids: int, k: int = 4, id_col: str = "vec_id"):
    """Deterministic uniform negative sampling for contrastive
    training: for each anchor row emit ``k`` pseudo-random OTHER ids,
    ``neg_id = (id + 1 + slot_j) % n_ids`` where ``slot_j`` is the
    ``j``-th md5 hex window of ``str(id)`` mod ``n_ids - 1`` (the
    repo-wide :func:`~pybel_ray.ops.sketch.md5_window_slots` hash
    family, so a DuckDB oracle reproduces every sample).  The ``+1``
    shift guarantees ``neg_id != id`` without rejection sampling.
    Pure per-batch map — zero shuffle, layout/cluster-size invariant.

    Requires ids dense in ``[0, n_ids)`` (the embedding-table layout);
    ``k ≤ 4`` (md5 yields four 8-hex windows).  Output ``(id_col,
    neg_rank, neg_id)``.
    """
    from .sketch import md5_window_slots

    if not 1 <= k <= 4:
        raise ValueError("negative_samples: k must be in 1..4")
    if n_ids < 2:
        raise ValueError("negative_samples: need at least 2 ids")

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.drop_null()
        idv = np.asarray(ids.to_numpy(zero_copy_only=False), np.int64)
        slots = md5_window_slots(idv, n_ids - 1, k)
        anchors = np.tile(idv, k)
        ranks = np.repeat(np.arange(k, dtype=np.int64), len(idv))
        negs = (anchors + 1 + slots.reshape(-1)) % n_ids
        return pa.Table.from_arrays(
            [
                pa.array(anchors, pa.int64()),
                pa.array(ranks, pa.int64()),
                pa.array(negs, pa.int64()),
            ],
            names=[id_col, "neg_rank", "neg_id"],
        )

    return ds.select_columns([id_col]).map_batches(
        _f, batch_format="pyarrow",
    )


def budget_mix_sample(
    ds,
    source_col: str,
    weight_col: str,
    targets_bp: dict,
    key_col: str = "doc_id",
):
    """Deterministic data-mixing sampler: downsample each source so the
    corpus approaches the TARGET mixture ``targets_bp`` (source → share
    in basis points) by total ``weight_col`` (tokens/chars) — the
    static mixing step behind "50% web, 30% code, 20% books" recipes.

    Exact integer rate derivation (any SQL engine replays it):
    ``desired_s = gtot * bp_s // 10000``; keep gate ``n_s = min(65536,
    desired_s * 65536 // actual_s)``; a row survives iff
    ``md5(str(key))[:4] < hex4(n_s)`` — the same md5 gate family as
    :func:`hash_sample`, so the kept set is layout-, resume- and
    cluster-size-invariant and each source's kept weight lands within
    one gate-quantum of its target (sources already under target keep
    everything; sources absent from ``targets_bp`` drop entirely).

    One tiny ``grouped_sum`` exchange computes per-source totals; the
    per-source thresholds broadcast in the closure (a handful of
    sources by contract); one stateless filter pass samples.  Rows with
    a null source/weight/key drop.
    """
    from .relational import grouped_sum  # local import: avoid cycle

    def _clean(t: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.and_kleene(
                pc.is_valid(t.column(source_col)),
                pc.is_valid(t.column(weight_col)),
            ),
            pc.is_valid(t.column(key_col)),
        )
        return t.filter(keep)

    cleaned = ds.map_batches(_clean, batch_format="pyarrow").materialize()
    totals = {
        r[source_col]: int(r[weight_col])
        for r in grouped_sum(
            cleaned.select_columns([source_col, weight_col]),
            source_col, [weight_col],
        ).take_all()
    }
    gtot = sum(totals.values())
    thresholds = {}
    for src, actual in totals.items():
        bp = int(targets_bp.get(src, 0))
        desired = gtot * bp // 10000
        n = min(65536, desired * 65536 // actual) if actual else 0
        thresholds[src] = "ffffg" if n >= 65536 else format(n, "04x")

    def _gate(t: pa.Table) -> pa.Table:
        src = t.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        pref = _md5_prefixes(pc.cast(t.column(key_col), pa.string()))
        th = pa.array(
            [thresholds.get(s, "0000") for s in src.to_pylist()],
            pa.string(),
        )
        return t.filter(pc.less(pref, th))

    return cleaned.map_batches(_gate, batch_format="pyarrow")
