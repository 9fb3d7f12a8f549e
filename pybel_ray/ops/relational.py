"""Generic relational helpers on Ray Datasets.

The engine's graph operators (summaries §2.6, joins §2.5, top-k §2.7 of
SURVEY.md) reduce to these primitives.  Small-side joins are broadcast —
the lookup table is built once on the driver and shipped inside the batch
UDF closure (one object-store copy) instead of a wide shuffle join.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "groupby_count",
    "groupby_agg",
    "broadcast_join",
    "topk",
    "distinct_values",
    "distinct_count_per_group",
    "row_number_per_group",
    "groupby_quantiles",
    "topk_per_group",
    "semi_join",
    "anti_join",
    "pivot_counts",
    "unpivot",
    "histogram",
    "impute_by_group_median",
    "merge_upsert",
    "groupby_rollup",
    "groupby_cube",
    "collect_sorted",
    "skyline",
    "intersect_distinct",
    "except_distinct",
    "grouped_sum",
    "diversified_topk",
]


def impute_by_group_median(ds, group_col: str, value_col: str):
    """Fill nulls in ``value_col`` with the per-group median of the
    non-null values (the exact ``quantile_disc(0.5)`` order statistic —
    bit-identical across engines, unlike a float mean).

    The median table is one row per group (small by construction) and is
    shipped inside the fill UDF's closure; the fill itself is one
    vectorized ``index_in`` + ``coalesce`` per batch.
    """

    def _non_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(value_col)))

    med = groupby_quantiles(
        ds.map_batches(_non_null, batch_format="pyarrow"),
        group_col, value_col, [0.5], prefix="m",
    )
    med_batches = [b for b in med.iter_batches(batch_format="pyarrow")]
    lkp = pa.concat_tables(med_batches)
    keys = pc.cast(lkp.column(group_col), pa.string()).combine_chunks()
    meds = lkp.column("m50").combine_chunks()

    def _fill(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t.column(group_col), pa.string()), value_set=keys,
        )
        fallback = pc.take(meds, idx).cast(t.schema.field(value_col).type)
        filled = pc.coalesce(t.column(value_col), fallback)
        return t.set_column(
            t.schema.get_field_index(value_col), value_col, filled,
        )

    return ds.map_batches(_fill, batch_format="pyarrow")


def unpivot(ds, index_cols: Sequence[str], value_cols: Sequence[str],
            key_col: str = "key", value_col: str = "value"):
    """Melt wide columns to long format: one output row per (input row,
    value column), ``key`` holding the column name.  Pure per-batch
    reshaping (one vertical concat of column slices), no exchange.
    """
    index_cols = list(index_cols)
    value_cols = list(value_cols)

    def _melt(t: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            cols = [t.column(i) for i in index_cols]
            cols.append(pa.array([c] * t.num_rows, pa.string()))
            cols.append(t.column(c))
            pieces.append(pa.Table.from_arrays(
                cols, names=index_cols + [key_col, value_col],
            ))
        return pa.concat_tables(pieces)

    return ds.select_columns(index_cols + value_cols).map_batches(
        _melt, batch_format="pyarrow",
    )


def histogram(ds, col: str, bins: int, lo: float, hi: float):
    """Fixed-width histogram with explicit bounds: bucket =
    ``clamp(floor((v - lo) / width), 0, bins-1)``; returns one
    ``(bucket, n)`` row per non-empty bucket.  Per batch, one vectorized
    bucket assignment + bincount partial; the exchange is a
    ``groupby(bucket).sum`` over at most ``bins`` rows per batch.
    """
    import numpy as np

    width = (hi - lo) / bins

    def _partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((v - lo) / width), 0, bins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.Table.from_arrays(
            [pa.array(nz, pa.int64()), pa.array(counts[nz], pa.int64())],
            names=["bucket", "n"],
        )

    partials = ds.select_columns([col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    return groupby_agg(partials, "bucket", {"n": ("sum", "n")})


def pivot_counts(ds, index: str, key: str, key_values: Sequence[str],
                 prefix: str = "n_"):
    """Pivot to wide format: one row per ``index`` value, one
    ``{prefix}{v}`` count column per enumerated ``key`` value
    (``count(*) FILTER (WHERE key = v)`` in SQL).

    Pre-aggregates per batch (one groupby of (index, key) pairs never
    happens — each batch emits one partial row per distinct index with
    per-key counts), so the exchange is a plain ``groupby(index).sum``
    over ``len(key_values)`` int columns.  ``key_values`` must be
    enumerated (pivot output schema must be static); get them from
    ``distinct_values`` when unknown.
    """
    import numpy as np

    cols = [prefix + v for v in key_values]
    vset = pa.array(list(key_values), pa.string())

    def _partial(t: pa.Table) -> pa.Table:
        idx = t.column(index)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        enc = idx.dictionary_encode()
        gi = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        ki = pc.index_in(
            pc.cast(t.column(key), pa.string()), value_set=vset,
        ).to_numpy(zero_copy_only=False)
        n_groups = len(enc.dictionary)
        arrays = [enc.dictionary]
        for j in range(len(key_values)):
            mask = ki == j
            arrays.append(pa.array(
                np.bincount(gi[mask], minlength=n_groups).astype(np.int64)
                if mask.any() else np.zeros(n_groups, np.int64),
                pa.int64(),
            ))
        return pa.Table.from_arrays(arrays, names=[index] + cols)

    partials = ds.select_columns([index, key]).map_batches(
        _partial, batch_format="pyarrow",
    )
    return groupby_agg(partials, index, {c: ("sum", c) for c in cols})


def semi_join(ds, key: str, keys_ds, keys_key: Optional[str] = None,
              anti: bool = False, broadcast_budget_bytes: int = 64 << 20):
    """Distributed semi-join: keep rows of ``ds`` whose ``key`` appears
    in ``keys_ds[keys_key]`` (``anti=True`` keeps the complement).

    Budget hybrid: when the key side's single-column projection fits
    ``broadcast_budget_bytes``, the distinct keys ship ONCE via
    ``ray.put`` and the join is a stateless vectorized ``pc.is_in``
    filter over ``ds`` — zero exchanges.  Above the budget it wraps the
    bucketed hash-co-location join (one ``groupby(bucket)`` exchange,
    one vectorized ``pc.is_in`` per bucket — neither side ever visits
    the driver).  Keys cast to strings internally on both paths so any
    key type works; null keys never match (semi drops them, anti keeps
    them — SQL semantics, identical on both paths).
    """
    from ..struct.degree import bucketed_semi_join

    keys_key = keys_key or key

    proj = keys_ds.select_columns([keys_key]).materialize()
    if (proj.size_bytes() or 0) <= broadcast_budget_bytes:
        import ray

        batches = list(proj.iter_batches(batch_format="pyarrow"))
        if not batches:
            keys_arr = pa.array([], pa.string())
        else:
            keys_arr = pc.unique(pc.drop_null(pc.cast(
                pa.concat_tables(batches).column(keys_key).combine_chunks(),
                pa.string(),
            )))
        keys_ref = ray.put(keys_arr)

        def _filter(t: pa.Table, _ref=keys_ref) -> pa.Table:
            hit = pc.fill_null(
                pc.is_in(
                    pc.cast(t.column(key), pa.string()),
                    value_set=ray.get(_ref),
                ),
                False,
            )
            return t.filter(pc.invert(hit) if anti else hit)

        return ds.map_batches(_filter, batch_format="pyarrow")
    keys_ds = proj

    def _tag(col):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column("_sj_key", pc.cast(t.column(col), pa.string()))

        return _f

    tagged = ds.map_batches(_tag(key), batch_format="pyarrow")
    keys_tagged = keys_ds.select_columns([keys_key]).map_batches(
        _tag(keys_key), batch_format="pyarrow",
    )
    out = bucketed_semi_join(tagged, "_sj_key", keys_tagged, "_sj_key", anti=anti)

    def _drop(t: pa.Table) -> pa.Table:
        return t.drop_columns(["_sj_key"])

    return out.map_batches(_drop, batch_format="pyarrow")


def anti_join(ds, key: str, keys_ds, keys_key: Optional[str] = None):
    """Rows of ``ds`` whose ``key`` does NOT appear in ``keys_ds``."""
    return semi_join(ds, key, keys_ds, keys_key, anti=True)


def _ensure_arrow_schema(ds):
    """Return ``(ds, pa.Schema)`` — pandas-block datasets (e.g. built
    with ``ray.data.from_pandas``) report a ``PandasBlockSchema`` with no
    ``.field``; those get one pass-through ``map_batches`` to Arrow
    blocks (which the join does per-batch anyway, so no extra work at
    execution time) so the schema is introspectable up front.
    """
    schema = ds.schema()
    base = getattr(schema, "base_schema", None) or schema
    if isinstance(base, pa.Schema):
        return ds, base
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    schema = ds.schema()
    base = getattr(schema, "base_schema", None) or schema
    return ds, base


def equi_join(
    left,
    right,
    on,
    right_on=None,
    how: str = "inner",
    suffix: str = "_r",
    num_buckets: int | None = None,
):
    """General many-to-many distributed equi-join (Ray Data has no
    native join): hash-bucket both sides on the key, ONE
    ``groupby(bucket)`` exchange co-locates equal keys, and each bucket
    resolves with pyarrow's hash join (``pa.Table.join``) — vectorized,
    many-to-many, never on the driver.

    ``num_buckets=None`` (default) sizes the exchange to the DATA, the
    same rule as ``dedup_exact_sorted``: both sides materialize once
    (the shuffle would execute them anyway; this avoids running the
    lineage twice).  A right side under 64 MB skips the exchange
    entirely for ``inner``/``left`` — it collects to ONE Arrow table
    and every left batch hash-joins against it in place (the
    dimension-join plan a 100 TB fact⋈dim wants: the small side ships
    once, the big side never moves; ``full`` can't decompose per-batch
    because right-unmatched rows need global match state).  Otherwise
    combined bytes pick the bucket count — 1 under 64 MB (a 64-task
    exchange on kilobytes is pure scheduling, measured ~5 s), one per
    CPU in the mid range, ~256 MB buckets beyond, capped at 1024.
    Pass an explicit int to pin the bucketed path (tests; known-skew
    keys; a small side with duplicate-heavy keys whose join OUTPUT
    explodes per batch).

    ``on`` / ``right_on`` may be a column name or a list (composite keys
    are joined on a ``\\x00``-separated string rendering; values
    containing NUL would alias — documented limit).  ``how`` is
    ``inner`` / ``left`` / ``full``.  Right-side non-key columns that
    collide with left names get ``suffix``.  For ``full``, right-unmatched
    rows surface their key through the LEFT key columns (SQL
    ``COALESCE(l.k, r.k)`` USING semantics) — the key is never lost.
    For a UNIQUE-key small side :func:`broadcast_join` is still the
    cheapest path (one ``index_in`` probe, no hash table build).
    """
    if how not in ("inner", "left", "full"):
        raise ValueError(how)
    join_type = {"inner": "inner", "left": "left outer", "full": "full outer"}[how]
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = lkeys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    from ..stages.dedup import add_hash_bucket

    left, lbase = _ensure_arrow_schema(left)
    right, rbase = _ensure_arrow_schema(right)
    broadcast_right = False
    if num_buckets is None:
        import ray as _ray

        left = left.materialize()
        right = right.materialize()
        rbytes = right.size_bytes() or 0
        combined = (left.size_bytes() or 0) + rbytes
        if how != "full" and rbytes < 64 * 1024 * 1024:
            broadcast_right = True
        elif combined < 64 * 1024 * 1024:
            num_buckets = 1
        else:
            cpus = int(_ray.cluster_resources().get("CPU", 8))
            num_buckets = min(
                1024, max(cpus, combined // (256 * 1024 * 1024)),
            )
    lnames = list(lbase.names)
    rename = {
        n: (n + suffix if n in lnames else n)
        for n in rbase.names if n not in rkeys
    }
    rvalue_names = [rename[n] for n in rbase.names if n not in rkeys]
    rvalue_types = {rename[n]: rbase.field(n).type for n in rbase.names
                    if n not in rkeys}

    def _jk(t: pa.Table, keys) -> pa.ChunkedArray:
        casted = [pc.cast(t.column(k), pa.string()) for k in keys]
        if len(casted) == 1:
            return casted[0]
        return pc.binary_join_element_wise(*casted, "\x00")

    out_names_bc = list(lbase.names) + rvalue_names
    if broadcast_right:
        import ray as _ray

        rtabs = [t for t in _ray.get(right.to_arrow_refs()) if t.num_rows]
        if rtabs:
            rtab = pa.concat_tables(rtabs).combine_chunks()
        else:
            rtab = pa.Table.from_arrays(
                [pa.nulls(0, rbase.field(n).type) for n in rbase.names],
                names=list(rbase.names),
            )
        small = pa.Table.from_arrays(
            [rtab.column(n) for n in rbase.names if n not in rkeys]
            + [_jk(rtab, rkeys)],
            names=rvalue_names + ["_jk"],
        )
        # ship the collected right side ONCE through the object store
        # (a closure capture would pickle up to 64 MB into the function
        # blob and re-deserialize it per worker process)
        small_ref = _ray.put(small)

        def _bjoin(t: pa.Table, _s=small_ref) -> pa.Table:
            import ray

            lt = t.append_column("_jk", _jk(t, lkeys))
            return lt.join(
                ray.get(_s), keys=["_jk"], join_type=join_type,
            ).select(out_names_bc)

        return left.map_batches(_bjoin, batch_format="pyarrow")

    # full outer: carry the right key columns (as hidden ``_rk{i}``) so
    # right-unmatched rows can coalesce their key into the left key
    # columns after the join (SQL USING semantics — ADVICE fix).
    rk_names = ["_rk{}".format(i) for i in range(len(rkeys))] if how == "full" else []
    rk_types = [rbase.field(k).type for k in rkeys] if how == "full" else []

    def _left_side(t: pa.Table) -> pa.Table:
        for c in rvalue_names:
            t = t.append_column(c, pa.nulls(t.num_rows, rvalue_types[c]))
        for c, typ in zip(rk_names, rk_types):
            t = t.append_column(c, pa.nulls(t.num_rows, typ))
        t = t.append_column("_jk", _jk(t, lkeys))
        t = t.append_column("_side", pa.array(np.zeros(t.num_rows, bool)))
        return add_hash_bucket(t, "_jk", num_buckets)

    def _right_side(t: pa.Table) -> pa.Table:
        jk = _jk(t, rkeys)
        arrays, names = [], []
        for f in lbase:
            names.append(f.name)
            arrays.append(pa.nulls(t.num_rows, f.type))
        out = pa.Table.from_arrays(arrays, names=names)
        for n in rbase.names:
            if n not in rkeys:
                out = out.append_column(rename[n], t.column(n))
        for c, k in zip(rk_names, rkeys):
            out = out.append_column(c, t.column(k))
        out = out.append_column("_jk", jk)
        out = out.append_column("_side", pa.array(np.ones(t.num_rows, bool)))
        return add_hash_bucket(out, "_jk", num_buckets)

    tagged_l = left.map_batches(_left_side, batch_format="pyarrow")
    tagged_r = right.map_batches(_right_side, batch_format="pyarrow")

    out_names = lnames + rvalue_names
    ltypes = [lbase.field(k).type for k in lkeys]

    def _join(group: pa.Table) -> pa.Table:
        side = group.column("_side")
        lt = group.filter(pc.invert(side)).select(lnames + ["_jk"])
        rt = group.filter(side).select(rvalue_names + rk_names + ["_jk"])
        joined = lt.join(
            rt, keys=["_jk"], join_type=join_type,
            # deterministic column order regardless of match side
        )
        if how == "full":
            for lk, rk, typ in zip(lkeys, rk_names, ltypes):
                try:
                    right_as_left = pc.cast(joined.column(rk), typ)
                except pa.ArrowInvalid:
                    # mixed-type keys (joined via the string-rendered _jk):
                    # a right key that can't render in the left key's type
                    # stays null rather than failing the whole join
                    right_as_left = pa.nulls(joined.num_rows, typ)
                merged = pc.coalesce(joined.column(lk), right_as_left)
                joined = joined.set_column(
                    joined.schema.get_field_index(lk), lk, merged,
                )
        return joined.select(out_names)

    out = tagged_l.union(tagged_r).groupby("_bucket").map_groups(
        _join, batch_format="pyarrow",
    )
    return out


def topk_per_group(ds, keys, value_col: str, k: int,
                   descending: bool = True, tie_keys: Sequence[str] = ()):
    """Top-``k`` rows per group by ``value_col`` (``row_number() OVER
    (PARTITION BY keys ORDER BY v DESC, ties) <= k``).

    A LOCAL combiner runs first: each input block keeps only its own
    top-``k`` per key (top-k selection composes: local-then-global equals
    global), so the ``groupby`` exchange moves at most ``k × blocks``
    rows per key — a degenerate hot key is bounded instead of OOMing one
    worker, and every workload shuffles less.  ``tie_keys`` make the cut
    deterministic when values repeat (and are required for local/global
    composition to be exact under ties).
    """
    import numpy as np

    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    order = [(value_col, "descending" if descending else "ascending")]
    order += [(t, "ascending") for t in tie_keys]
    local_order = [(key, "ascending") for key in keys] + order

    def _local_head(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        t = t.sort_by(local_order)
        n = t.num_rows
        # vectorized rank-within-consecutive-key-run
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for key in keys:
            col = t.column(key)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            neq = pc.fill_null(
                pc.not_equal(col.slice(1), col.slice(0, n - 1)), True,
            ).to_numpy(zero_copy_only=False)
            change[1:] |= neq
        idx = np.arange(n)
        group_start = np.maximum.accumulate(np.where(change, idx, 0))
        return t.filter(pa.array(idx - group_start < k))

    ds = ds.map_batches(_local_head, batch_format="pyarrow")

    def _head(g: pa.Table) -> pa.Table:
        return g.sort_by(order).slice(0, k)

    return ds.groupby(keys).map_groups(_head, batch_format="pyarrow")


def groupby_quantiles(ds, keys, value_col: str, qs: Sequence[float],
                      prefix: str = "q", max_rows_per_group: int | None = None):
    """Exact per-group discrete quantiles — the order statistic at
    ``ceil(q*n) - 1``, which is exactly DuckDB's ``quantile_disc``
    (verified empirically across n in 1..101, q in 0..1).

    One ``groupby`` exchange co-locates each group; the quantile itself
    is a vectorized in-group sort.  Output columns ``{prefix}{pct}``
    (e.g. ``q50``) so oracles can name them identically.  Group payloads
    must fit a worker; pass ``max_rows_per_group`` to probe for
    degenerate skew — oversized groups switch to the skew-proof sorted
    path (:func:`_quantiles_sorted`), which never co-locates a group.
    """
    import numpy as np

    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    names = ["{}{:g}".format(prefix, q * 100) for q in qs]
    narrow = ds.select_columns(keys + [value_col])

    if max_rows_per_group is not None:
        if len(keys) != 1:
            raise ValueError(
                "groupby_quantiles: max_rows_per_group (the skew probe) "
                "supports a single key column; combine composite keys into "
                "one column upstream",
            )
        from ..ops.window import max_group_rows

        narrow = narrow.materialize()  # probe + op share one execution
        if max_group_rows(narrow, keys[0]) > max_rows_per_group:
            return _quantiles_sorted(narrow, keys[0], value_col, qs, names)

    def _q(g: pa.Table) -> pa.Table:
        vals = np.sort(
            g.column(value_col).to_numpy(zero_copy_only=False),
        )
        # quantile_disc: element at ceil(q * n) - 1, clamped at 0
        idx = [max(int(np.ceil(q * len(vals))) - 1, 0) for q in qs]
        out = {k: [g.column(k)[0].as_py()] for k in keys}
        for name, i in zip(names, idx):
            out[name] = [float(vals[i])]
        return pa.Table.from_pydict(out)

    return narrow.groupby(keys).map_groups(_q, batch_format="pyarrow")


def _quantiles_sorted(ds, key: str, value_col: str, qs, names):
    """Skew-proof exact per-group quantiles: ONE global sort by
    (key, value, row-id), per-block (key, count) partials to the driver
    (result-sized: one row per key per block), rank arithmetic picks the
    order statistics inside each block, and a tiny driver assembly emits
    one row per key.  No key group ever has to fit one worker.

    A unique ``_rid`` column is attached before the sort so every row —
    and therefore every block's first row — is distinct, which is what
    lets the driver identify blocks by their first-row sort tuple even
    when a hot key repeats one value across many blocks.  Rank order
    among equal values follows ``_rid``, which cannot change any
    quantile (equal values yield the same order statistic).  Requires
    non-null key/value (same contract as the other sorted paths); key
    values flow through natively (no stringification).
    """
    import json as _json
    import uuid

    import numpy as np
    import ray

    def _add_rid(t: pa.Table) -> pa.Table:
        # unique, not deterministic — only uniqueness matters (see above)
        base = uuid.uuid4().int & ((1 << 62) - 1)
        rid = (np.full(t.num_rows, base, dtype=np.int64)
               ^ np.arange(t.num_rows, dtype=np.int64))
        return t.append_column("_rid", pa.array(rid, pa.int64()))

    sorted_ds = ds.map_batches(_add_rid, batch_format="pyarrow") \
        .sort([key, value_col, "_rid"]).materialize()

    def _first_tup(t: pa.Table) -> str:
        return _json.dumps(
            (t.column(key)[0].as_py(), t.column(value_col)[0].as_py(),
             t.column("_rid")[0].as_py()),
            default=str,
        )

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"_tup": pa.array([], pa.string()),
                 "_key": pa.array([], t.schema.field(key).type),
                 "_n": pa.array([], pa.int64())},
            )
        col = t.column(key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arr = col.to_numpy(zero_copy_only=False)
        # arr is sorted by key, so np.unique's sorted order == appearance
        uniq, counts = np.unique(arr, return_counts=True)
        return pa.Table.from_arrays(
            [
                pa.array([_first_tup(t)] * len(uniq), pa.string()),
                pa.array(uniq.tolist(), t.schema.field(key).type),
                pa.array(counts.astype("int64"), pa.int64()),
            ],
            names=["_tup", "_key", "_n"],
        )

    partials = sorted_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None,
    ).take_all()

    # group partial rows by block, order blocks by first-row sort tuple
    by_block: dict = {}
    for r in partials:
        by_block.setdefault(r["_tup"], []).append(r)
    ordered = sorted(by_block, key=lambda tup: tuple(_json.loads(tup)))

    totals: dict = {}
    offsets: dict = {}  # (block tup) -> {key: global start rank}
    for tup in ordered:
        offsets[tup] = {}
        for r in by_block[tup]:
            offsets[tup][r["_key"]] = totals.get(r["_key"], 0)
            totals[r["_key"]] = totals.get(r["_key"], 0) + int(r["_n"])
    # target ranks per key: ceil(q*n)-1 clamped at 0
    targets = {
        k: np.unique([max(int(np.ceil(q * n)) - 1, 0) for q in qs])
        for k, n in totals.items()
    }
    state_ref = ray.put((offsets, targets))

    def _pick(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("_key", t.schema.field(key).type), ("_rank", pa.int64()),
            ("_val", pa.float64()),
        ])
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        offs, tgts = ray.get(state_ref)
        block_offs = offs[_first_tup(t)]
        arr = t.column(key).to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        n = len(arr)
        idx = np.arange(n)
        change = np.ones(n, dtype=bool)
        change[1:] = arr[1:] != arr[:-1]
        run_starts = np.flatnonzero(change)
        run_ends = np.r_[run_starts[1:], n]
        out_keys, out_ranks, out_vals = [], [], []
        # vectorized per key RUN (few runs per block, never per row)
        for s, e in zip(run_starts, run_ends):
            k = arr[s]
            if hasattr(k, "item"):
                k = k.item()
            granks = block_offs[k] + (idx[s:e] - s)
            hits = np.flatnonzero(np.isin(granks, tgts[k]))
            for h in hits:
                out_keys.append(k)
                out_ranks.append(int(granks[h]))
                out_vals.append(float(vals[s + h]))
        return pa.Table.from_arrays(
            [
                pa.array(out_keys, t.schema.field(key).type),
                pa.array(out_ranks, pa.int64()),
                pa.array(out_vals, pa.float64()),
            ],
            names=["_key", "_rank", "_val"],
        )

    picked = sorted_ds.map_batches(
        _pick, batch_format="pyarrow", batch_size=None,
    ).take_all()  # result-sized: <= len(qs) rows per key
    by_key: dict = {}
    for r in picked:
        by_key.setdefault(r["_key"], {})[r["_rank"]] = r["_val"]
    rows = []
    for k, n in sorted(totals.items()):
        row = {key: k}
        for name, q in zip(names, qs):
            row[name] = by_key[k][max(int(np.ceil(q * n)) - 1, 0)]
        rows.append(row)
    import ray.data

    return ray.data.from_items(rows)


#: sentinel standing in for a null string key inside Ray's native
#: sort-based groupby (which cannot order None against str); decoded back
#: to null in the output, so both groupby paths expose SQL GROUP BY
#: null-grouping semantics
_NULL_KEY = "\x00\u2400N"


def _null_key_codec(keys):
    """(encode, decode) batch fns mapping null STRING key values to/from
    :data:`_NULL_KEY`.  Numeric keys pass through — Ray's native groupby
    already groups numeric nulls SQL-style; only string comparisons raise
    in its sort.  Vectorized fill_null/if_else; a no-op stage when the
    column has no nulls."""

    def _is_str(typ) -> bool:
        return pa.types.is_string(typ) or pa.types.is_large_string(typ)

    def _encode(t: pa.Table) -> pa.Table:
        for k in keys:
            i = t.schema.get_field_index(k)
            col = t.column(k)
            if _is_str(col.type) and col.null_count:
                t = t.set_column(i, k, pc.fill_null(col, _NULL_KEY))
        return t

    def _decode(t: pa.Table) -> pa.Table:
        for k in keys:
            i = t.schema.get_field_index(k)
            col = t.column(k)
            if _is_str(col.type):
                hit = pc.fill_null(pc.equal(col, _NULL_KEY), False)
                if pc.any(hit).as_py():
                    t = t.set_column(
                        i, k, pc.if_else(hit, pa.scalar(None, col.type), col),
                    )
        return t

    return _encode, _decode


def groupby_count(ds, keys, count_name: str = "n"):
    """groupby(keys).count() with a stable output column name.  Null keys
    form their own group (SQL GROUP BY semantics, any key dtype)."""
    if isinstance(keys, str):
        keys = [keys]
    encode, decode = _null_key_codec(keys)
    out = ds.map_batches(encode, batch_format="pyarrow").groupby(keys).count()
    # ray names the count column "count()"
    def _rename(t: pa.Table) -> pa.Table:
        names = [count_name if c == "count()" else c for c in t.column_names]
        return decode(t.rename_columns(names))

    return out.map_batches(_rename, batch_format="pyarrow")


def groupby_agg(ds, keys, aggs: Mapping[str, tuple]):
    """groupby + multiple named aggregations.

    ``aggs``: {output_name: (kind, column)} with kind in
    {count, sum, min, max, mean}.

    Null keys form their own group (SQL ``GROUP BY`` semantics) on BOTH
    execution paths: the bucketed integer fast path groups them natively
    (pyarrow ``group_by``), and the native sort-based path encodes null
    string keys through :data:`_NULL_KEY` around the sort (numeric nulls
    already group).  The behavior no longer depends on which path the
    value dtypes select.
    """
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    if isinstance(keys, str):
        keys = [keys]
    kinds = {"count": Count, "sum": Sum, "min": Min, "max": Max, "mean": Mean}

    # fast path: when every aggregation is order-invariant over integers
    # (count / integer sum / min / max), run the bucketed combine
    # (:func:`grouped_sum`'s shape) instead of the native sort-based
    # aggregate — measured 5x at 150k groups.  Float sums/means keep the
    # native path (their accumulation order must not change under the
    # hood of existing oracles).
    fast_ok = all(kind in ("count", "sum", "min", "max")
                  for kind, _ in aggs.values())
    if fast_ok:
        try:
            schema = ds.schema()
            base = getattr(schema, "base_schema", None) or schema
            types = {f.name: f.type for f in base}
        except Exception:
            types = None
        if types is not None:
            for kind, col in aggs.values():
                if kind != "count" and not pa.types.is_integer(
                    types.get(col, pa.float64()),
                ):
                    fast_ok = False
                    break
        else:
            fast_ok = False
    if fast_ok:
        fast = _groupby_agg_bucketed(ds, keys, aggs)
        if fast is not None:
            return fast

    fns = []
    renames = {}
    for out_name, (kind, col) in aggs.items():
        if kind == "count":
            fns.append(Count())
            renames["count()"] = out_name
        else:
            fns.append(kinds[kind](col))
            renames["{}({})".format(kind, col)] = out_name
    encode, decode = _null_key_codec(keys)
    out = ds.map_batches(encode, batch_format="pyarrow") \
        .groupby(keys).aggregate(*fns)

    def _rename(t: pa.Table) -> pa.Table:
        names = [renames.get(c, c) for c in t.column_names]
        return decode(t.rename_columns(names))

    return out.map_batches(_rename, batch_format="pyarrow")


def _groupby_agg_bucketed(ds, keys, aggs: Mapping[str, tuple]):
    """Bucketed combine for order-invariant integer aggregations: local
    Arrow ``group_by`` per batch, hash-bucket exchange, vectorized
    per-bucket fold.  count folds as sum-of-counts; sum/min/max compose
    with themselves."""
    import os

    from ..stages.dedup import add_hash_bucket

    sep = "\x1f"
    sentinel = "\x00\u2400"
    out_names = list(aggs)
    local_aggs = []
    fold_aggs = []
    local_out = []
    for out_name, (kind, col) in aggs.items():
        if kind == "count":
            local_aggs.append(([], "count_all"))
            local_out.append("count_all")
        else:
            local_aggs.append((col, kind))
            local_out.append("{}_{}".format(col, kind))
        fold_aggs.append((out_name, "sum" if kind == "count" else kind))
    need_cols = sorted({c for k, c in aggs.values() if k != "count"})

    def _render(t: pa.Table) -> pa.Array:
        parts = []
        for k in keys:
            col = t.column(k)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts.append(pc.fill_null(pc.cast(col, pa.string()), sentinel))
        if len(parts) == 1:
            return parts[0]
        return pc.binary_join_element_wise(*parts, sep)

    def _local(t: pa.Table) -> pa.Table:
        r = t.select(keys + need_cols).group_by(keys).aggregate(local_aggs)
        r = r.select(keys + local_out).rename_columns(keys + out_names)
        return r.append_column("_gk", _render(r))

    local = ds.map_batches(_local, batch_format="pyarrow").materialize()
    if local.count() == 0:
        return None  # executed-empty loses schema; caller keeps native
    nbytes = local.size_bytes() or 0
    if nbytes <= 64 * 1024 * 1024:
        nb = 1
    else:
        ncpu = os.cpu_count() or 8
        nb = min(1024, max(ncpu, nbytes // (256 * 1024 * 1024) + 1))
    bucketed = local.map_batches(
        lambda t: add_hash_bucket(t, "_gk", nb), batch_format="pyarrow",
    )

    def _fold(g: pa.Table) -> pa.Table:
        r = g.select(keys + out_names).group_by(keys).aggregate(fold_aggs)
        # pyarrow names fold outputs <col>_<agg>
        folded = [
            "{}_{}".format(n, a) for n, (_, a) in zip(out_names, fold_aggs)
        ]
        return r.select(keys + folded).rename_columns(keys + out_names)

    return bucketed.groupby("_bucket").map_groups(
        _fold, batch_format="pyarrow",
    )


def broadcast_join(
    ds,
    small: pa.Table,
    left_key: str,
    right_key: str,
    take_columns: Optional[Sequence[str]] = None,
    how: str = "inner",
):
    """Hash-join a Dataset against a SMALL Arrow table (broadcast, no shuffle).

    Fully vectorized: each batch does one ``pc.index_in`` probe of the big
    side's key column against the small side's keys, filters misses (inner
    join) or keeps them with null payload columns (``how="left"`` — a
    null index into ``Table.take`` yields a null row, so SQL LEFT JOIN
    semantics fall out of the same single probe), then ``take``s the
    matching small-side rows — no Python per-row loop.  The small table
    ships once in the UDF closure.  The small side's ``right_key`` must
    be unique (a dimension table); duplicate keys would need the
    many-to-many :func:`equi_join`.
    """
    if how not in ("inner", "left"):
        raise ValueError("broadcast_join how must be inner or left")
    take_columns = list(take_columns or [c for c in small.column_names if c != right_key])
    keys = small.column(right_key).combine_chunks()
    payload = small.select(take_columns).combine_chunks()

    def _join(t: pa.Table) -> pa.Table:
        lcol = t.column(left_key)
        idx = pc.index_in(lcol, value_set=keys)
        # SQL never matches NULL = NULL, but pc.index_in points a null
        # probe at a null entry of the value set — null the index back
        # out so null keys miss (inner drops them, left keeps nulls)
        idx = pc.if_else(pc.is_valid(lcol), idx, pa.scalar(None, idx.type))
        if how == "inner":
            mask = pc.is_valid(idx)
            t = t.filter(mask)
            idx = pc.filter(idx, mask)
        hit = payload.take(idx)
        for c in take_columns:
            t = t.append_column(c, hit.column(c))
        return t

    return ds.map_batches(_join, batch_format="pyarrow")


def topk(ds, key: str, k: int, descending: bool = True, tie_keys: Sequence[str] = ()):
    """Global top-k by a column (sort + limit)."""
    keys = [key] + list(tie_keys)
    desc = [descending] + [False] * len(tie_keys)
    return ds.sort(keys, descending=desc).limit(k)


def row_number_per_group(ds, keys, order_cols, out_col: str = "rn",
                         descending: bool = False):
    """``row_number() OVER (PARTITION BY keys ORDER BY order_cols)``
    (1-based).  One ``groupby`` exchange; the numbering inside a group is
    a vectorized sort + arange.  Deterministic iff ``order_cols`` are
    unique within a group (make the last order column a unique id).
    Group payloads must fit a worker (key-bounded groups); this is the
    windowed sibling of :func:`topk_per_group` without the k cutoff,
    so no combiner can shrink the shuffle.
    """
    import numpy as np

    if isinstance(keys, str):
        keys = [keys]
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    direction = "descending" if descending else "ascending"
    order = [(c, direction) for c in order_cols]

    def _number(g: pa.Table) -> pa.Table:
        g = g.sort_by(order)
        return g.append_column(
            out_col, pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
        )

    return ds.groupby(list(keys)).map_groups(_number, batch_format="pyarrow")


def distinct_count_per_group(ds, keys, value_col: str, out_col: str = "n_distinct"):
    """Exact ``count(DISTINCT value) GROUP BY keys``.

    Two-level: each batch emits its distinct (keys, value) pairs (the
    combiner — repeated values collapse before the exchange), ONE
    ``groupby(keys ∪ value)``-equivalent exchange dedups globally via
    the bucketed exact-dedup on a composite string key, then a per-batch
    bincount + small ``groupby(keys).sum`` counts survivors.  Never
    co-locates a whole key group, so hot keys are safe (their distinct
    PAIRS spread across buckets).
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    from ..stages.dedup import dedup_exact

    def _local_pairs(t: pa.Table) -> pa.Table:
        t = t.select(keys + [value_col])
        parts = [pc.cast(t.column(c), pa.string()) for c in keys + [value_col]]
        composite = parts[0]
        for p in parts[1:]:
            composite = pc.binary_join_element_wise(composite, p, "\x1f")
        t = t.append_column("_pair", composite)
        # first-occurrence dedup within the batch (the combiner)
        from ..stages.dedup import local_dedup_table

        return local_dedup_table(t, "_pair")

    pairs = ds.map_batches(_local_pairs, batch_format="pyarrow")
    deduped = dedup_exact(pairs, "_pair")

    def _partial_counts(t: pa.Table) -> pa.Table:
        out = t.select(keys)
        out = out.append_column(
            out_col, pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        )
        return out

    partial = deduped.map_batches(_partial_counts, batch_format="pyarrow")
    return groupby_agg(partial, keys, {out_col: ("sum", out_col)})


def distinct_values(ds, column: str):
    """Distinct values of one column as a Dataset (pre-aggregated per block)."""
    from ..stages.dedup import dedup_exact

    def _local(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column(column).combine_chunks())
        return pa.Table.from_arrays([u], names=[column])

    ds = ds.select_columns([column]).map_batches(_local, batch_format="pyarrow")
    return dedup_exact(ds, column, local_first=False)


def merge_upsert(base, delta, keys, order_col: str,
                 tie_cols: Sequence[str] = (), flag_col: str = "from_delta"):
    """Keep-latest key compaction — MERGE/upsert of a delta log into a
    base snapshot.  One surviving row per ``keys`` from ``base ∪
    delta``: the row with the greatest ``(order_col, side, *tie_cols)``,
    where delta rows outrank base rows at equal order values (SQL
    ``row_number() OVER (PARTITION BY keys ORDER BY order DESC, side
    DESC, ties DESC) = 1``).  ``flag_col`` (0 base / 1 delta) records
    which side survived.  ``tie_cols`` must make the order total within
    each side or the cut is nondeterministic (same contract as
    :func:`topk_per_group`).

    Scale shape: the same LOCAL keep-best combiner as
    :func:`topk_per_group` (keep-1 composes local-then-global), so the
    ``groupby(keys)`` exchange moves at most one row per key per input
    block — a hot key (one entity updated millions of times) is bounded
    instead of co-locating its whole history.  Both sides stream; no
    driver materialization.

    No reference analog (the reference rebuilds graphs from scratch;
    incremental maintenance is a scale requirement — training-data
    snapshots compact a correction log into the previous export).
    """
    import numpy as np

    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column(
                flag_col,
                pa.array(np.full(t.num_rows, side, np.int64)),
            )
        return _f

    u = base.map_batches(_tag(0), batch_format="pyarrow").union(
        delta.map_batches(_tag(1), batch_format="pyarrow"),
    )
    order = [(order_col, "descending"), (flag_col, "descending")]
    order += [(t, "descending") for t in tie_cols]
    local_order = [(key, "ascending") for key in keys] + order

    def _local_best(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        t = t.sort_by(local_order)
        n = t.num_rows
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for key in keys:
            col = t.column(key)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            neq = pc.fill_null(
                pc.not_equal(col.slice(1), col.slice(0, n - 1)), True,
            ).to_numpy(zero_copy_only=False)
            change[1:] |= neq
        return t.filter(pa.array(change))

    u = u.map_batches(_local_best, batch_format="pyarrow")

    def _best(g: pa.Table) -> pa.Table:
        return g.sort_by(order).slice(0, 1)

    return u.groupby(keys).map_groups(_best, batch_format="pyarrow")


def groupby_rollup(ds, keys, aggs: Mapping[str, tuple]):
    """SQL ``GROUP BY ROLLUP (keys...)``: one aggregate row per group at
    every prefix level of ``keys`` plus the grand total, with rolled-up
    key columns NULL and a ``grouping_id`` bitmask column matching
    DuckDB ``GROUPING_ID(keys...)`` (first key = most significant bit;
    finest level 0, grand total ``2^len(keys)-1``).

    ``aggs`` uses the :func:`groupby_agg` shape restricted to
    RE-AGGREGATABLE kinds — ``count``/``sum``/``min``/``max`` (count
    re-aggregates as a sum; a mean is not decomposable — derive it from
    sum+count downstream).

    Scale shape: exactly ONE exchange over the raw data (the finest
    ``groupby``); every coarser level re-aggregates the finest AGGREGATE
    table, whose row count is the number of distinct finest groups —
    small by construction — so a rollup costs one shuffle regardless of
    how many levels it emits.
    """
    import numpy as np

    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    for name, (kind, _col) in aggs.items():
        if kind not in ("count", "sum", "min", "max"):
            raise ValueError(
                "groupby_rollup: agg %r kind %r is not re-aggregatable"
                % (name, kind),
            )
    m = len(keys)
    sets_ = [(keys, 0)] + [
        (keys[:i], (1 << (m - i)) - 1) for i in range(m - 1, -1, -1)
    ]
    return _grouping_sets(ds, keys, aggs, sets_)


def groupby_cube(ds, keys, aggs: Mapping[str, tuple]):
    """SQL ``GROUP BY CUBE (keys...)``: one aggregate row per group for
    EVERY subset of ``keys`` (2^k levels), rolled-up key columns NULL,
    ``grouping_id`` matching DuckDB ``GROUPING_ID(keys...)`` (first key
    = most significant bit).

    Same restrictions and scale shape as :func:`groupby_rollup`: only
    re-aggregatable kinds (``count``/``sum``/``min``/``max``) and
    exactly ONE exchange over the raw data — every coarser subset
    re-aggregates the finest aggregate table.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    for name, (kind, _col) in aggs.items():
        if kind not in ("count", "sum", "min", "max"):
            raise ValueError(
                "groupby_cube: agg %r kind %r is not re-aggregatable"
                % (name, kind),
            )
    m = len(keys)
    sets_ = []
    for gid in range(1 << m):
        # bit (m-1-j) set in GROUPING_ID means key j is rolled up
        kept = [keys[j] for j in range(m) if not gid & (1 << (m - 1 - j))]
        sets_.append((kept, gid))
    sets_.sort(key=lambda s: s[1])
    return _grouping_sets(ds, keys, aggs, sets_)


def _grouping_sets(ds, keys, aggs, sets_):
    """Shared rollup/cube core: ONE finest exchange, then each grouping
    set re-aggregates the finest aggregate table (see groupby_rollup's
    docstring for the scale argument)."""
    agg_names = list(aggs)
    out_names = keys + agg_names + ["grouping_id"]

    fine = groupby_agg(ds, keys, aggs).materialize()
    fine_schema = fine.schema()
    base = getattr(fine_schema, "base_schema", None) or fine_schema
    key_types = {f.name: f.type for f in base if f.name in keys}
    re_aggs = {
        name: ("sum" if kind in ("count", "sum") else kind, name)
        for name, (kind, _col) in aggs.items()
    }

    def _finish(kept, gid):
        def _f(t: pa.Table) -> pa.Table:
            cols = {c: t.column(c) for c in t.column_names}
            arrays = []
            for k in keys:
                arrays.append(
                    cols[k] if k in kept
                    else pa.nulls(t.num_rows, key_types[k]),
                )
            arrays += [cols[a] for a in agg_names]
            arrays.append(pa.array(np.full(t.num_rows, gid, np.int64)))
            return pa.Table.from_arrays(arrays, names=out_names)
        return _f

    levels = []
    for kept, gid in sets_:
        if set(kept) == set(keys):
            lvl = fine
        elif kept:
            lvl = groupby_agg(fine, kept, re_aggs)
        else:
            def _tag(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "_all", pa.array(np.zeros(t.num_rows, np.int64)),
                )
            lvl = groupby_agg(
                fine.map_batches(_tag, batch_format="pyarrow"),
                ["_all"], re_aggs,
            ).drop_columns(["_all"])
        levels.append(
            lvl.map_batches(_finish(kept, gid), batch_format="pyarrow"),
        )
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def collect_sorted(ds, keys, value_col: str, order_cols,
                   out_col: str = "seq", sep: str = ",",
                   count_col: str = "n_items"):
    """``string_agg(value, sep ORDER BY order_cols) GROUP BY keys`` —
    the per-entity ordered event sequence builder (the step that turns
    a click/event log into sequence-model training rows).

    One ``groupby(keys)`` exchange; inside each group a vectorized sort
    + ``binary_join``.  Null values are skipped (SQL ``string_agg``
    semantics); a group whose values are all null emits an empty string
    with ``count_col = 0`` — DuckDB's ``coalesce(string_agg(..), '')``.
    Deterministic iff ``order_cols`` end in a unique tiebreak column.
    Group payloads must fit a worker (the output row IS the group), so
    like :func:`row_number_per_group` this is inherently key-bounded;
    gate degenerate keys upstream with :func:`max_group_rows`.
    """
    if isinstance(keys, str):
        keys = [keys]
    keys = list(keys)
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    order = [(c, "ascending") for c in order_cols]

    def _collect(g: pa.Table) -> pa.Table:
        g = g.sort_by(order)
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = pc.cast(vals, pa.string())
        vals = vals.filter(pc.is_valid(vals))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(vals)], pa.int32()), vals,
            ),
            pa.scalar(sep),
        )
        arrays = [g.column(k).slice(0, 1) for k in keys]
        arrays.append(joined)
        arrays.append(pa.array([len(vals)], pa.int64()))
        return pa.Table.from_arrays(arrays, names=keys + [out_col, count_col])

    return ds.groupby(keys).map_groups(_collect, batch_format="pyarrow")


def skyline(ds, dims):
    """Pareto frontier (SQL ``NOT EXISTS`` dominance): rows not
    dominated by any other row.  ``dims`` is ``[(col, 'min'|'max'),
    ...]``; ``q`` dominates ``p`` when ``q`` is at-least-as-good on
    every dim and strictly better on one.  Duplicate points never
    dominate each other, so ties survive together — exactly the SQL
    semantics.  Null dims are dropped (SQL comparisons with NULL are
    never true, so null rows can neither dominate nor be dominated
    deterministically; documented contract: rows with a null dim are
    excluded).

    Scale shape: a LOCAL skyline per block first (any globally
    undominated row is locally undominated, so local pruning is
    lossless), then ONE final pass over the concatenated survivors
    (``repartition(1)``).  Skyline sizes are tiny in practice —
    O(d·log^(d-1) n) expected for independent dims — so the final
    single-block pass sees only survivors, never the input.  Per block:
    lexicographic sort (later rows never dominate earlier ones), one
    pass appending to the running frontier with a vectorized dominance
    check per row (O(rows × frontier)).
    """
    dims = list(dims)
    cols = [c for c, _ in dims]
    for _c, d in dims:
        if d not in ("min", "max"):
            raise ValueError("skyline: direction must be 'min' or 'max'")

    def _normalized(t: pa.Table) -> np.ndarray:
        mat = np.empty((t.num_rows, len(dims)), np.float64)
        for j, (c, d) in enumerate(dims):
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            mat[:, j] = -v if d == "max" else v
        return mat

    def _local(t: pa.Table) -> pa.Table:
        valid = np.ones(t.num_rows, bool)
        for c in cols:
            valid &= pc.is_valid(
                t.column(c).combine_chunks(),
            ).to_numpy(zero_copy_only=False)
        t = t.take(pa.array(np.flatnonzero(valid)))
        if t.num_rows == 0:
            return t
        m = _normalized(t)
        order = np.lexsort(m.T[::-1])  # ascending lexicographic on dims
        sm = m[order]
        keep: list[int] = []
        front = np.empty((0, len(dims)), np.float64)
        for i in range(len(sm)):
            p = sm[i]
            if len(front):
                better_eq = (front <= p).all(axis=1)
                strict = (front < p).any(axis=1)
                if (better_eq & strict).any():
                    continue
            keep.append(i)
            front = np.vstack([front, p])
        return t.take(pa.array(order[np.array(keep, np.int64)]))

    local = ds.map_batches(_local, batch_format="pyarrow", batch_size=None)
    return local.repartition(1).map_batches(
        _local, batch_format="pyarrow", batch_size=None,
    )


def _distinct_on(ds, cols):
    """Global distinct on ``cols`` (bucketed dedup on the rendered key;
    NUL-joined rendering — the documented composite-key alias limit)."""
    from ..stages.dedup import dedup_exact

    def _key(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        parts = [
            pc.fill_null(pc.cast(t.column(c), pa.string()), "\x00N")
            for c in cols
        ]
        k = parts[0]
        for p in parts[1:]:
            k = pc.binary_join_element_wise(k, p, "\x00")
        return t.append_column("_k", k)

    return dedup_exact(
        ds.map_batches(_key, batch_format="pyarrow"), "_k",
    )


def intersect_distinct(left, right, cols):
    """SQL ``INTERSECT`` (distinct rows present on both sides) over the
    given columns: per-side local unique combiner → ONE bucketed
    semi-join on the rendered key → global dedup.  Only the key columns
    ever move."""
    from ..struct.degree import bucketed_semi_join

    cols = [cols] if isinstance(cols, str) else list(cols)
    l_ = _distinct_on(left, cols)
    r_ = _distinct_on(right, cols)
    return bucketed_semi_join(
        l_, "_k", r_.select_columns(["_k"]), keys_key="_k",
    ).drop_columns(["_k"])


def except_distinct(left, right, cols):
    """SQL ``EXCEPT`` (distinct left rows absent from right): same shape
    as :func:`intersect_distinct` with the anti-join."""
    from ..struct.degree import bucketed_semi_join

    cols = [cols] if isinstance(cols, str) else list(cols)
    l_ = _distinct_on(left, cols)
    r_ = _distinct_on(right, cols)
    return bucketed_semi_join(
        l_, "_k", r_.select_columns(["_k"]), keys_key="_k", anti=True,
    ).drop_columns(["_k"])


def grouped_sum(ds, keys, value_cols, num_buckets: int | None = None):
    """Exact distributed ``GROUP BY keys SUM(value_cols)`` — the bucketed
    alternative to Ray's native ``groupby().sum()``: each batch
    pre-aggregates with a vectorized Arrow ``group_by`` (local
    combiner), rows hash-bucket on a canonical key rendering, and ONE
    ``groupby(_bucket)`` exchange folds each bucket vectorized.  At 150k
    groups over 600k rows this measured 0.5 s vs 2.5-3.8 s for the
    native sort-based aggregate (sf0.1, 32 CPUs) — group-count-heavy
    aggregations are where the native exchange hurts.

    Null keys form their own group (SQL ``GROUP BY`` semantics; the
    rendering maps null to a reserved sentinel).  Values must be
    numeric; sums are exact for int64 inputs.  ``num_buckets=None``
    sizes the exchange to the pre-aggregated data (1 bucket under
    64 MB, one per CPU midrange — same rule as :func:`equi_join`).
    """
    import os

    from ..stages.dedup import add_hash_bucket

    keys = [keys] if isinstance(keys, str) else list(keys)
    value_cols = list(value_cols)
    aggs = [(c, "sum") for c in value_cols]
    sep = "\x1f"
    sentinel = "\x00␀"

    def _render(t: pa.Table) -> pa.Array:
        parts = []
        for k in keys:
            col = t.column(k)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts.append(pc.fill_null(pc.cast(col, pa.string()), sentinel))
        if len(parts) == 1:
            return parts[0]
        return pc.binary_join_element_wise(*parts, sep)

    def _local(t: pa.Table) -> pa.Table:
        r = t.select(keys + value_cols).group_by(keys).aggregate(aggs)
        r = r.rename_columns(keys + value_cols)
        return r.append_column("_gk", _render(r))

    local = ds.map_batches(_local, batch_format="pyarrow")

    if num_buckets is None:
        local = local.materialize()
        nbytes = local.size_bytes() or 0
        if nbytes <= 64 * 1024 * 1024:
            nb = 1
        else:
            ncpu = os.cpu_count() or 8
            nb = min(1024, max(ncpu, nbytes // (256 * 1024 * 1024) + 1))
    else:
        nb = num_buckets

    bucketed = local.map_batches(
        lambda t: add_hash_bucket(t, "_gk", nb), batch_format="pyarrow",
    )

    def _fold(g: pa.Table) -> pa.Table:
        r = g.select(keys + value_cols).group_by(keys).aggregate(aggs)
        return r.rename_columns(keys + value_cols)

    return bucketed.groupby("_bucket").map_groups(
        _fold, batch_format="pyarrow",
    )


def diversified_topk(
    ds,
    group_col: str,
    score_col: str,
    k_total: int,
    min_per_group: int,
    id_col: str,
    descending: bool = True,
):
    """Diversity-constrained selection: the global top-``k_total`` rows
    by ``score_col`` subject to a floor of ``min_per_group`` rows per
    group — the eval-set / showcase construction rule ("the 1000 best
    documents, but at least 20 from every source").  Semantics
    (deterministic; ``id_col`` must be a unique row id and is the tie
    break at both levels):

    1. every group's top ``min_per_group`` rows are guaranteed in;
    2. the remaining ``k_total - |guaranteed|`` slots fill from the
       global ranking of all NON-guaranteed rows.

    Scale shape: the guarantee is one skew-bounded
    :func:`topk_per_group`; the filler is one bucketed anti-join (drop
    guaranteed rows) + the local-then-global :func:`topk` sort-limit;
    one small union.  Only ``(group, score, id)`` columns move.
    """
    from ..struct.degree import bucketed_semi_join

    if min_per_group < 0 or k_total < 0:
        raise ValueError("k_total and min_per_group must be >= 0")
    sel = ds.select_columns([group_col, score_col, id_col])
    guaranteed = topk_per_group(
        sel, group_col, score_col, min_per_group,
        descending=descending, tie_keys=[id_col],
    ).materialize() if min_per_group else None
    n_g = guaranteed.count() if guaranteed is not None else 0
    fill = max(0, k_total - n_g)
    if guaranteed is not None:
        rest = bucketed_semi_join(
            sel, id_col, guaranteed.select_columns([id_col]), id_col,
            anti=True,
        )
    else:
        rest = sel
    filler = topk(
        rest, score_col, fill, descending=descending, tie_keys=[id_col],
    ) if fill else None
    if guaranteed is None:
        return filler if filler is not None else sel.limit(0)
    if filler is None:
        return guaranteed
    return guaranteed.union(filler)
