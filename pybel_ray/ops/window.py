"""Distributed windowed aggregates: running (prefix) sums, global row
numbers, and token-budget shard packing.

Ray Data has no window functions; this implements the classic
two-pass distributed prefix scan:

1. sort by the order key and **materialize** (so both passes see the
   exact same immutable blocks),
2. one pass computes per-block ``(first_key, block_sum)`` partials —
   one row per block, collected on the driver (O(#blocks), tiny by
   construction, independent of row count),
3. the exclusive per-block offsets are broadcast via ``ray.put`` and a
   second pass adds ``offset + within-block cumsum`` — fully
   vectorized, no shuffle beyond the initial sort.

``pack_by_budget`` builds on the exclusive running sum to assign each
row a shard id such that every shard holds ~``budget`` units (the
sequence-packing / output-sharding step of a training pipeline).
Equivalent SQL: ``sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
PRECEDING AND 1 PRECEDING)``.

The order column must hold unique values (ids); for string keys the
driver-side partial ordering uses Python comparison, which matches
Arrow's sort for ASCII keys (ids and hex digests are; document keys
accordingly).

Reference scope note: the reference engine has no windowed aggregates;
this is part of the training-data-pipeline family (SURVEY.md §2
"beyond-reference" operators; windowed aggregate is the canonical
"operator Ray Data lacks" example).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "running_sum",
    "global_row_number",
    "pack_by_budget",
    "lag_by",
    "asof_join",
    "interval_join",
    "sessionize",
    "running_sum_by",
    "global_quantiles",
    "rolling_extremum",
    "tumbling_window_agg",
    "hopping_window_agg",
    "max_group_rows",
    "rank_by",
    "forward_fill_by",
    "resample_locf",
    "debounce_by",
]


def hopping_window_agg(
    ds,
    ts_col: str,
    width_secs: int,
    hop_secs: int,
    keys=(),
    sum_cols=(),
):
    """Hopping (sliding) window aggregate: windows of ``width_secs``
    starting every ``hop_secs``; each event lands in
    ``ceil(width/hop)`` windows.

    Implemented as a vectorized per-batch window-replication pass (one
    numpy pass per replica index, same pattern as ``chunk_text``'s
    overlap expansion) feeding the tumbling partial-aggregation shape:
    the exchange still moves one row per (window, key) per batch.
    Windows are labelled by their epoch-second start; only windows with
    ``start >= 0`` and ``start % hop == 0`` exist (the standard aligned
    hopping scheme, reproducible in SQL via a ``generate_series`` join).
    """
    if width_secs <= 0 or hop_secs <= 0:
        raise ValueError("width and hop must be positive")
    n_rep = -(-width_secs // hop_secs)

    def _replicate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("window_start", pa.array([], pa.int64()))
        ts = t.column(ts_col).combine_chunks()
        epoch_s = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        base = (epoch_s // hop_secs) * hop_secs
        parts = []
        for r in range(n_rep):
            start = base - r * hop_secs
            ok = (start >= 0) & (epoch_s < start + width_secs)
            if not ok.any():
                continue
            sub = t.filter(pa.array(ok))
            parts.append(sub.append_column(
                "window_start", pa.array(start[ok], pa.int64()),
            ))
        if not parts:
            return t.slice(0, 0).append_column(
                "window_start", pa.array([], pa.int64()),
            )
        return pa.concat_tables(parts)

    replicated = ds.map_batches(_replicate, batch_format="pyarrow")
    # reuse the tumbling partial/final machinery with window width = hop
    # over the precomputed window_start labels: width 1s on an integer
    # second column reproduces the label itself
    out = tumbling_window_agg(
        replicated.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("window_start"), "window_start",
                pc.multiply(t.column("window_start"), 1_000_000)
                .cast(pa.timestamp("us")),
            ),
            batch_format="pyarrow",
        ),
        "window_start", 1, keys=keys, sum_cols=sum_cols,
    )
    return out


def tumbling_window_agg(
    ds,
    ts_col: str,
    width_secs: int,
    keys=(),
    sum_cols=(),
):
    """Event-time tumbling-window aggregate: one row per
    (window_start, *keys) with ``n`` (row count) and ``sum_<col>`` for
    every integer column in ``sum_cols``.

    ``window_start`` is the window's epoch-second start
    (``(epoch_us // (width*1e6)) * width`` — pure integer arithmetic, so
    it reproduces DuckDB exactly and is independent of batch layout).
    Per-batch partial aggregation (lexsort run lengths) means the
    ``groupby`` exchange moves one row per (window, key) per batch, not
    per event — the streaming-aggregation shape at any scale.  Sum
    columns must be integer (convert money to cents upstream) so the
    totals are order-independent.
    """
    import numpy as np

    keys = list(keys)
    sum_cols = list(sum_cols)

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            arrays = [pa.array([], pa.int64())]
            names = ["window_start"]
            for k in keys:
                arrays.append(pa.array([], t.column(k).type))
                names.append(k)
            arrays.append(pa.array([], pa.int64()))
            names.append("n")
            for c in sum_cols:
                arrays.append(pa.array([], pa.int64()))
                names.append("sum_" + c)
            return pa.Table.from_arrays(arrays, names=names)
        ts = t.column(ts_col).combine_chunks()
        epoch_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (epoch_us // (width_secs * 1_000_000)) * width_secs
        if "window_start" in t.column_names:
            t = t.drop_columns(["window_start"])
        t = t.append_column("window_start", pa.array(win, pa.int64()))
        group_arrays = [win] + [
            t.column(k).combine_chunks().dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            for k in keys
        ]
        order = np.lexsort(group_arrays[::-1])
        cols = [a[order] for a in group_arrays]
        change = np.zeros(len(order), dtype=bool)
        change[0] = True
        for a in cols:
            change[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.r_[starts, len(order)])
        take = pa.array(order[starts])
        arrays = [pc.take(t.column("window_start"), take)]
        names = ["window_start"]
        for k in keys:
            arrays.append(pc.take(t.column(k), take))
            names.append(k)
        arrays.append(pa.array(lens, pa.int64()))
        names.append("n")
        for c in sum_cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)[order]
            arrays.append(pa.array(np.add.reduceat(v, starts), pa.int64()))
            names.append("sum_" + c)
        return pa.Table.from_arrays(arrays, names=names)

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _final(g: pa.Table) -> pa.Table:
        arrays = [g.column("window_start").slice(0, 1)]
        names = ["window_start"]
        for k in keys:
            arrays.append(g.column(k).slice(0, 1))
            names.append(k)
        arrays.append(pa.array([int(pc.sum(g.column("n")).as_py())], pa.int64()))
        names.append("n")
        for c in sum_cols:
            arrays.append(pa.array(
                [int(pc.sum(g.column("sum_" + c)).as_py())], pa.int64(),
            ))
            names.append("sum_" + c)
        return pa.Table.from_arrays(arrays, names=names)

    return partial.groupby(["window_start"] + keys).map_groups(
        _final, batch_format="pyarrow",
    )


def _scan(ds, order_col, value_of, out_cols, emit):
    """Shared two-pass prefix scan.

    ``value_of(table) -> np.ndarray`` yields each row's contribution;
    ``emit(table, inclusive, exclusive) -> table`` appends the outputs.
    ``batch_size=None`` (whole blocks) in BOTH passes so they see
    identical batch boundaries over the same materialized blocks, and
    each batch's first order value identifies it in the offset map.
    """
    import ray

    sorted_ds = ds.sort(order_col).materialize()

    def _partial(t: pa.Table) -> pa.Table:
        key_slice = t.column(order_col).slice(0, min(1, t.num_rows)).combine_chunks()
        vals_sum = [int(value_of(t).sum())] if t.num_rows else []
        return pa.Table.from_arrays(
            [key_slice, pa.array(vals_sum, pa.int64())],
            names=["_first_key", "_block_sum"],
        )

    # one row per block -> driver-safe regardless of dataset size
    partials = sorted(
        sorted_ds.map_batches(
            _partial, batch_format="pyarrow", batch_size=None,
        ).take_all(),
        key=lambda r: r["_first_key"],
    )
    offsets, acc = {}, 0
    for row in partials:
        offsets[row["_first_key"]] = acc
        acc += row["_block_sum"]
    offsets_ref = ray.put(offsets)

    def _add(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            for name in out_cols:
                t = t.append_column(name, pa.array([], pa.int64()))
            return t
        vals = value_of(t)
        inclusive = np.cumsum(vals, dtype=np.int64)
        inclusive += ray.get(offsets_ref)[t.column(order_col)[0].as_py()]
        exclusive = inclusive - vals
        return emit(t, inclusive, exclusive)

    return sorted_ds.map_batches(_add, batch_format="pyarrow", batch_size=None)


def _int_column(value_col):
    def value_of(t: pa.Table) -> np.ndarray:
        return t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)

    return value_of


def running_sum(ds, order_col: str, value_col: str, out_col: str = "running"):
    """Inclusive prefix sum of ``value_col`` in ``order_col`` order —
    ``sum(v) OVER (ORDER BY k)`` — with nothing collected on the driver
    beyond one row per block."""

    def emit(t, inclusive, exclusive):
        return t.append_column(out_col, pa.array(inclusive, pa.int64()))

    return _scan(ds, order_col, _int_column(value_col), [out_col], emit)


def global_row_number(ds, order_col: str, out_col: str = "row_number"):
    """1-based global row number in ``order_col`` order —
    ``row_number() OVER (ORDER BY k)``."""

    def value_of(t: pa.Table) -> np.ndarray:
        return np.ones(t.num_rows, dtype=np.int64)

    def emit(t, inclusive, exclusive):
        return t.append_column(out_col, pa.array(inclusive, pa.int64()))

    return _scan(ds, order_col, value_of, [out_col], emit)


def max_group_rows(ds, partition_col: str) -> int:
    """Largest key-group size — ONE narrow groupby-count exchange over the
    partition column only (the skew probe for the per-key window ops)."""
    from .relational import groupby_count

    counts = groupby_count(ds.select_columns([partition_col]), partition_col)
    return int(counts.max("n") or 0)


def _first_row_tuple(t: pa.Table, cols) -> tuple:
    return tuple(t.column(c)[0].as_py() for c in cols)


def _with_unique_rid(ds):
    """Attach a unique (NOT deterministic) ``_rid`` column.  Appended to a
    sort key it makes every row — hence every block's first row — distinct,
    so the boundary exchanges can identify blocks by first-row tuple even
    when the semantic sort key repeats across a block boundary (duplicate
    timestamps within a key used to collide in the boundaries dict and
    silently corrupt the carried state).  Only uniqueness matters: rows
    tied on the semantic key were already in arbitrary relative order."""
    import uuid

    def _add(t: pa.Table) -> pa.Table:
        base = uuid.uuid4().int & ((1 << 62) - 1)
        rid = (np.full(t.num_rows, base, dtype=np.int64)
               ^ np.arange(t.num_rows, dtype=np.int64))
        return t.append_column("_rid", pa.array(rid, pa.int64()))

    return ds.map_batches(_add, batch_format="pyarrow")


def _lag_sorted(ds, partition_col, order_cols, value_col, out_col):
    """Skew-proof lag: ONE distributed sort by (partition, order) + a
    boundary-row exchange (one row per block to the driver) instead of
    co-locating each key group on one worker — a degenerate hot key spans
    as many blocks as the sort gives it, so no group ever has to fit a
    single worker.  Requires non-null partition/order values (the driver
    orders block partials by Python comparison of the first-row sort
    tuple, mirroring Arrow's ascending sort)."""
    import ray

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    sort_cols = [partition_col] + order_cols + ["_rid"]
    sorted_ds = _with_unique_rid(ds).sort(sort_cols).materialize()

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"_tup": [], "_last_key": [], "_last_val": []},
            )
        import json as _json

        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        return pa.Table.from_pydict({
            "_tup": [tup],
            "_last_key": [t.column(partition_col)[-1].as_py()],
            "_last_val": [t.column(value_col)[-1].as_py()],
        })

    partials = sorted_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None,
    ).take_all()

    # order blocks by their first-row sort tuple (Python comparison)
    import json as _json

    def _sort_key(r):
        return tuple(r2 for r2 in _json.loads(r["_tup"]))

    partials.sort(key=lambda r: _sort_key(r))
    boundaries = {}
    prev_key, prev_val = None, None
    for r in partials:
        boundaries[r["_tup"]] = (prev_key, prev_val)
        prev_key, prev_val = r["_last_key"], r["_last_val"]
    b_ref = ray.put(boundaries)

    def _shift_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            vt = t.schema.field(value_col).type
            return t.append_column(out_col, pa.array([], vt)) \
                .drop_columns(["_rid"])
        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        b_key, b_val = ray.get(b_ref)[tup]
        keys = t.column(partition_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = t.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        first = pa.array(
            [b_val if b_key == keys[0].as_py() else None], vals.type,
        )
        shifted = pa.concat_arrays([first, vals.slice(0, len(vals) - 1)])
        # null out rows whose previous row belongs to a different key
        eq = pc.equal(keys.slice(1), keys.slice(0, len(keys) - 1))
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        same = pa.concat_arrays([pa.array([True]), eq])
        lag = pc.if_else(pc.fill_null(same, False), shifted,
                         pa.scalar(None, vals.type))
        return t.append_column(out_col, lag).drop_columns(["_rid"])

    return sorted_ds.map_batches(
        _shift_block, batch_format="pyarrow", batch_size=None,
    )


def lag_by(
    ds,
    partition_col: str,
    order_cols,
    value_col: str,
    out_col: str = "lag",
    max_rows_per_group: int | None = None,
):
    """``lag(value) OVER (PARTITION BY p ORDER BY o)``: each row gets the
    previous row's value within its partition (null for the first).

    Partitions co-locate with one ``groupby`` exchange; the shift inside
    a group is a zero-copy slice.  Deterministic iff ``order_cols`` are
    unique within a partition.

    Each key group must fit one worker.  Pass ``max_rows_per_group`` to
    guard against degenerate single-key skew: one narrow groupby-count
    probe runs first, and if any group exceeds the bound the operator
    switches to the skew-proof sorted path (global sort + boundary-row
    exchange — no group co-location at all).
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    if max_rows_per_group is not None:
        ds = ds.materialize()  # probe + op share one upstream execution
        if max_group_rows(ds, partition_col) > max_rows_per_group:
            return _lag_sorted(ds, partition_col, order_cols, value_col,
                               out_col)

    def _shift(g: pa.Table) -> pa.Table:
        g = g.sort_by([(c, "ascending") for c in order_cols])
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        shifted = pa.concat_arrays([
            pa.nulls(min(1, len(vals)), vals.type),
            vals.slice(0, max(len(vals) - 1, 0)),
        ])
        return g.append_column(out_col, shifted)

    return ds.groupby(partition_col).map_groups(_shift, batch_format="pyarrow")


def _asof_sorted(u, key, l_names, out_names, left_on, inequality):
    """Skew-proof as-of join over the padded left∪right rows: ONE global
    sort by (key, ts, side-tiebreak) + a boundary-row exchange (one small
    row per block to the driver), instead of co-locating each key group.
    A degenerate hot key spans as many blocks as the sort assigns it.

    Tiebreak at equal timestamps encodes the inequality: for ``>=`` the
    right row sorts BEFORE the left row (so it matches); for ``>`` after
    (so it doesn't).  A boundary-carried right row always sorts strictly
    before the block's rows, which implies it satisfies the inequality
    for every left row in the block with the same key.  Requires non-null
    key and timestamp values (same contract as the other sorted paths).
    """
    import json as _json

    import ray

    def _with_ts(t: pa.Table) -> pa.Table:
        lts = t.column(left_on)
        rts = t.column("_asof_ts")
        if rts.type != lts.type:
            rts = rts.cast(lts.type)
        ts = pc.coalesce(rts, lts)  # right rows carry _asof_ts, left left_on
        side = t.column("_side")
        if inequality == ">=":
            tiebreak = pc.subtract(pa.scalar(1, pa.int8()), side)  # right first
        else:
            tiebreak = side  # left first
        return t.append_column("_ts", ts).append_column("_sidesort", tiebreak)

    sort_cols = [key, "_ts", "_sidesort"]
    sorted_u = u.map_batches(_with_ts, batch_format="pyarrow") \
        .sort(sort_cols).materialize()

    def _partial(t: pa.Table) -> pa.Table:
        row: dict = {"_tup": [], "_first_key": [], "_last_key": [],
                     "_has_right": []}
        for out in out_names:
            row["_r_" + out] = []
        if t.num_rows == 0:
            return pa.Table.from_pydict(row)
        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        keys = t.column(key).to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        last_key = keys[-1]
        cand = np.nonzero((side == 1) & (keys == last_key))[0]
        row["_tup"].append(tup)
        row["_first_key"].append(keys[0])
        row["_last_key"].append(last_key)
        row["_has_right"].append(bool(len(cand)))
        for out in out_names:
            row["_r_" + out].append(
                t.column(out)[int(cand[-1])].as_py() if len(cand) else None,
            )
        return pa.Table.from_pydict(row)

    partials = sorted_u.map_batches(
        _partial, batch_format="pyarrow", batch_size=None,
    ).take_all()
    partials.sort(key=lambda r: tuple(_json.loads(r["_tup"])))

    # fold: running (key, right values) — keys are contiguous after the
    # sort, so only the most recent key's latest right row can be needed
    boundaries = {}
    state_key, state_vals = None, None
    for r in partials:
        boundaries[r["_tup"]] = (state_key, state_vals)
        if r["_last_key"] != state_key:
            state_key = r["_last_key"]
            state_vals = (
                {out: r["_r_" + out] for out in out_names}
                if r["_has_right"] else None
            )
        elif r["_has_right"]:
            state_vals = {out: r["_r_" + out] for out in out_names}
    b_ref = ray.put(boundaries)

    def _merge_block(t: pa.Table) -> pa.Table:
        lefts_empty = t.filter(pc.equal(t.column("_side"), 0)).select(l_names)
        if t.num_rows == 0:
            for out in out_names:
                lefts_empty = lefts_empty.append_column(
                    out, pa.nulls(0, t.schema.field(out).type),
                )
            return lefts_empty
        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        b_key, b_vals = ray.get(b_ref)[tup]
        side = t.column("_side").to_numpy(zero_copy_only=False)
        keys = t.column(key).to_numpy(zero_copy_only=False)
        n = t.num_rows
        last_right = np.maximum.accumulate(
            np.where(side == 1, np.arange(n), -1),
        )
        left_pos = np.nonzero(side == 0)[0]
        cand = last_right[left_pos]
        valid = (cand >= 0) & (keys[np.maximum(cand, 0)] == keys[left_pos])
        idx = pa.array(cand.astype(np.int64), mask=~valid)
        from_boundary = (~valid) & (keys[left_pos] == b_key) \
            if b_vals is not None else np.zeros(len(left_pos), bool)
        bmask = pa.array(from_boundary)
        lefts = t.select(l_names).take(pa.array(left_pos.astype(np.int64)))
        for out in out_names:
            col = t.column(out)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            gathered = col.take(idx)
            if b_vals is not None:
                gathered = pc.if_else(
                    bmask, pa.scalar(b_vals[out], col.type), gathered,
                )
            lefts = lefts.append_column(out, gathered)
        return lefts

    return sorted_u.map_batches(
        _merge_block, batch_format="pyarrow", batch_size=None,
    )


def asof_join(
    left,
    right,
    key: str,
    left_on: str,
    right_on: str,
    take: dict,
    inequality: str = ">=",
    max_rows_per_group: int | None = None,
):
    """Distributed as-of join: for each left row, attach columns of the
    single right row with the same ``key`` and the largest ``right_on``
    that is ``<= left_on`` (``inequality=">="``) or ``< left_on``
    (``inequality=">"``); unmatched left rows get nulls (LEFT ASOF JOIN
    semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    ``take`` maps output column name -> right column name (output names
    must not collide with left's columns).

    Shape: both sides are tagged and unioned (right projected to ``key``,
    timestamp and taken columns only), co-partitioned with ONE
    ``groupby(key)`` exchange, and merged per key group with a vectorized
    ``np.searchsorted`` — no driver materialization, no per-row Python.
    Deterministic iff ``right_on`` is unique per key.  Skewed keys pay
    the usual groupby cost; ``max_rows_per_group`` adds an upfront probe —
    groups over the bound switch the whole join to the skew-proof sorted
    path (:func:`_asof_sorted`: one global sort + one boundary row per
    block to the driver), so a degenerate single-key input runs at
    bounded worker memory instead of OOMing one worker.
    """
    if inequality not in (">=", ">"):
        raise ValueError("inequality must be '>=' or '>'")
    use_sorted = False
    if max_rows_per_group is not None:
        left = left.materialize()    # probe + join share one execution
        right = right.materialize()
        worst = max(
            max_group_rows(left, key), max_group_rows(right, key),
        )
        # degenerate hot key: switch to the skew-proof sorted path (one
        # global sort + a boundary-row exchange; a hot key spans as many
        # blocks as the sort gives it — no group must fit one worker)
        use_sorted = worst > max_rows_per_group

    ls = left.schema()
    l_names = list(ls.names)
    l_types = list(ls.types)
    rs = right.schema()
    r_type_of = dict(zip(rs.names, rs.types))
    out_names = list(take)
    if set(out_names) & set(l_names):
        raise ValueError("take output names collide with left columns")

    def _left_pad(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.append_column("_asof_ts", pa.nulls(n, r_type_of[right_on]))
        for name in out_names:
            t = t.append_column(name, pa.nulls(n, r_type_of[take[name]]))
        return t.append_column("_side", pa.array(np.zeros(n, np.int8)))

    def _right_pad(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays, names = [], []
        for name, typ in zip(l_names, l_types):
            names.append(name)
            arrays.append(
                t.column(key).combine_chunks() if name == key else pa.nulls(n, typ)
            )
        names.append("_asof_ts")
        arrays.append(t.column(right_on).combine_chunks())
        for out in out_names:
            names.append(out)
            arrays.append(t.column(take[out]).combine_chunks())
        names.append("_side")
        arrays.append(pa.array(np.ones(n, np.int8)))
        return pa.Table.from_arrays(arrays, names=names)

    u = left.map_batches(_left_pad, batch_format="pyarrow").union(
        right.map_batches(_right_pad, batch_format="pyarrow"),
    )
    if use_sorted:
        return _asof_sorted(
            u, key, l_names, out_names, left_on, inequality,
        )
    search_side = "right" if inequality == ">=" else "left"

    def _merge(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy(zero_copy_only=False)
        lefts = g.filter(pa.array(side == 0)).select(l_names)
        rights = g.filter(pa.array(side == 1)).sort_by([("_asof_ts", "ascending")])
        if lefts.num_rows == 0:
            for out in out_names:
                lefts = lefts.append_column(
                    out, pa.nulls(0, r_type_of[take[out]]),
                )
            return lefts
        if rights.num_rows == 0:
            for out in out_names:
                lefts = lefts.append_column(
                    out, pa.nulls(lefts.num_rows, r_type_of[take[out]]),
                )
            return lefts
        rts = rights.column("_asof_ts").to_numpy(zero_copy_only=False)
        lts = lefts.column(left_on).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rts, lts, side=search_side) - 1
        # null index -> null row through take (LEFT-join semantics)
        idx = pa.array(pos.astype(np.int64), mask=pos < 0)
        for out in out_names:
            col = rights.column(out)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lefts = lefts.append_column(out, col.take(idx))
        return lefts

    return u.groupby(key).map_groups(_merge, batch_format="pyarrow")


def running_sum_by(
    ds,
    partition_col: str,
    order_cols,
    value_col: str,
    out_col: str = "running",
):
    """``sum(v) OVER (PARTITION BY p ORDER BY o ROWS UNBOUNDED
    PRECEDING)``: per-partition inclusive prefix sum — one groupby
    exchange, vectorized in-group sort + cumsum."""
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _cum(g: pa.Table) -> pa.Table:
        g = g.sort_by([(c, "ascending") for c in order_cols])
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        return g.append_column(out_col, pa.array(np.cumsum(vals)))

    return ds.groupby(partition_col).map_groups(_cum, batch_format="pyarrow")


def global_quantiles(ds, col: str, qs, out_prefix: str = "q"):
    """Exact global discrete quantiles (DuckDB ``quantile_disc``:
    order statistic at ``ceil(q·n) − 1``) without materializing the
    column on the driver: one distributed sort, then each target rank is
    fetched by splitting the sorted Dataset at that index and reading
    ONE row.  Returns a one-row Arrow table ``{prefix}{pct}`` columns.
    """
    n = ds.count()
    if n == 0:
        raise ValueError("empty dataset")
    sorted_ds = ds.select_columns([col]).sort(col).materialize()
    names, vals = [], []
    for q in qs:
        r = max(int(np.ceil(q * n)) - 1, 0)
        if r == 0:
            row = sorted_ds.limit(1).take_all()[0]
        else:
            row = sorted_ds.split_at_indices([r])[1].limit(1).take_all()[0]
        names.append("{}{:g}".format(out_prefix, q * 100))
        vals.append(row[col])
    return pa.Table.from_arrays([pa.array([v]) for v in vals], names=names)


def rolling_extremum(
    ds,
    partition_col: str,
    order_cols,
    value_col: str,
    preceding: int,
    out_col: str = "rolling",
    kind: str = "max",
):
    """``max/min(v) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN k
    PRECEDING AND CURRENT ROW)`` — exact (comparisons only, no float
    accumulation), one groupby exchange, vectorized sliding-window
    reduce per group."""
    if kind not in ("max", "min"):
        raise ValueError("kind must be 'max' or 'min'")
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    pad = -np.inf if kind == "max" else np.inf
    reducer = np.max if kind == "max" else np.min

    def _roll(g: pa.Table) -> pa.Table:
        g = g.sort_by([(c, "ascending") for c in order_cols])
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        padded = np.r_[np.full(preceding, pad), v]
        windows = np.lib.stride_tricks.sliding_window_view(padded, preceding + 1)
        return g.append_column(
            out_col, pa.array(reducer(windows, axis=1), pa.float64()),
        )

    return ds.groupby(partition_col).map_groups(_roll, batch_format="pyarrow")


def _sessionize_sorted(ds, partition_col, ts_col, gap_us, out_col):
    """Skew-proof sessionize: ONE sort by (partition, ts) + a per-block
    boundary exchange.  Each block emits (first key/ts, last key/ts, the
    session-start flag counts of its first and last key runs); the driver
    walks blocks in order carrying the running session count of the key
    that crosses each boundary — O(#blocks) driver state, no key group
    ever co-located."""
    import json as _json

    import ray

    sort_cols = [partition_col, ts_col, "_rid"]
    sorted_ds = _with_unique_rid(ds).sort(sort_cols).materialize()

    def _block_stats(t: pa.Table):
        keys = t.column(partition_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ts = pc.cast(t.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        kn = keys.to_numpy(zero_copy_only=False)
        new_key = np.zeros(n, dtype=bool)
        new_key[0] = True
        if n > 1:
            new_key[1:] = kn[1:] != kn[:-1]
        flags = np.zeros(n, dtype=np.int64)
        if n > 1:
            flags[1:] = ((ts[1:] - ts[:-1]) > gap_us) & ~new_key[1:]
        # per-row session seq with per-key reset: cumsum minus the cumsum
        # value at each row's key-run start
        cs = np.cumsum(flags)
        run_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        seq = cs - cs[run_start]
        return keys, ts, new_key, flags, seq, run_start

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "_tup": [], "_first_key": [], "_first_ts": [], "_last_key": [],
                "_last_ts": [], "_nf_last": [],
            })
        keys, ts, new_key, flags, seq, run_start = _block_stats(t)
        starts = np.flatnonzero(new_key)
        last_start = int(starts[-1])
        return pa.Table.from_pydict({
            "_tup": [_json.dumps(_first_row_tuple(t, sort_cols), default=str)],
            "_first_key": [keys[0].as_py()],
            "_first_ts": [int(ts[0])],
            "_last_key": [keys[-1].as_py()],
            "_last_ts": [int(ts[-1])],
            "_nf_last": [int(flags[last_start:].sum())],
        })

    import json as _json2

    partials = sorted_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None,
    ).take_all()
    partials.sort(key=lambda r: tuple(_json2.loads(r["_tup"])))

    offsets = {}
    prev_key, prev_ts, prev_cum = None, None, 0
    for r in partials:
        if r["_first_key"] == prev_key:
            # does the block boundary itself start a new session?
            bflag = 1 if (r["_first_ts"] - prev_ts) > gap_us else 0
            offset = prev_cum + bflag
        else:
            offset = 0
        offsets[r["_tup"]] = offset
        if r["_first_key"] == r["_last_key"]:
            prev_cum = offset + r["_nf_last"]
        else:
            prev_cum = r["_nf_last"]
        prev_key, prev_ts = r["_last_key"], r["_last_ts"]
    off_ref = ray.put(offsets)

    def _apply(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64())) \
                .drop_columns(["_rid"])
        keys, ts, new_key, flags, seq, run_start = _block_stats(t)
        tup = _json2.dumps(_first_row_tuple(t, sort_cols), default=str)
        offset = ray.get(off_ref)[tup]
        # the offset applies only to the block's FIRST key run
        seq = seq.copy()
        seq[run_start == 0] += offset
        return t.append_column(out_col, pa.array(seq, pa.int64())) \
            .drop_columns(["_rid"])

    return sorted_ds.map_batches(
        _apply, batch_format="pyarrow", batch_size=None,
    )


def sessionize(
    ds,
    partition_col: str,
    ts_col: str,
    gap_us: int,
    out_col: str = "session_seq",
    max_rows_per_group: int | None = None,
):
    """Assign 0-based session sequence numbers per partition: a new
    session starts when the gap to the previous event exceeds ``gap_us``
    (microseconds — the int64 representation of ``timestamp[us]``).

    One ``groupby(partition)`` exchange; inside a group it is a sort +
    one vectorized diff + cumsum.  Equivalent SQL: cumulative sum over
    ``(ts - lag(ts) > gap)`` flags.

    Each key group must fit one worker.  ``max_rows_per_group`` adds a
    skew probe (one narrow groupby count): if any group exceeds it, the
    skew-proof sorted path runs instead (sort + boundary exchange; a
    unique row-id sort tiebreak makes block identification safe even
    with duplicate timestamps).
    """
    import pyarrow.compute as pc

    if max_rows_per_group is not None:
        ds = ds.materialize()  # probe + op share one upstream execution
        if max_group_rows(ds, partition_col) > max_rows_per_group:
            return _sessionize_sorted(ds, partition_col, ts_col, gap_us,
                                      out_col)

    def _sess(g: pa.Table) -> pa.Table:
        g = g.sort_by([(ts_col, "ascending")])
        ts = pc.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        flags = np.zeros(len(ts), dtype=np.int64)
        if len(ts) > 1:
            flags[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        return g.append_column(out_col, pa.array(np.cumsum(flags), pa.int64()))

    return ds.groupby(partition_col).map_groups(_sess, batch_format="pyarrow")


def interval_join(
    left,
    right,
    key: str,
    left_on: str,
    start_col: str,
    end_col: str,
    take: dict,
    max_rows_per_group: int | None = None,
):
    """Range join for per-key NON-OVERLAPPING intervals (the SCD-2 /
    versioned-dimension case): attach the right row whose
    ``[start, end]`` contains ``left_on`` (both ends closed; a null
    ``end`` is open-ended); unmatched left rows get nulls.

    Because intervals don't overlap within a key, containment reduces to
    the as-of join on ``start`` plus a vectorized end check — one
    ``groupby(key)`` exchange total.  Equivalent SQL:
    ``LEFT JOIN r ON l.k = r.k AND l.ts BETWEEN r.s AND r.e``.
    For overlapping intervals (one-to-many output) use a dedicated
    sweep, not this operator.
    """
    import pyarrow.compute as pc

    inner = dict(take)
    inner["_ivl_start"] = start_col
    inner["_ivl_end"] = end_col
    joined = asof_join(left, right, key, left_on, start_col, inner, ">=",
                       max_rows_per_group=max_rows_per_group)

    def _check(t: pa.Table) -> pa.Table:
        matched = pc.is_valid(t.column("_ivl_start"))
        # null end = open interval -> containment holds once start matched
        end_ok = pc.fill_null(
            pc.greater_equal(t.column("_ivl_end"), t.column(left_on)), True,
        )
        keep = pc.and_(matched, end_ok)
        for out in take:
            col = t.column(out)
            nulled = pc.if_else(keep, col, pa.nulls(1, col.type)[0])
            t = t.set_column(t.schema.get_field_index(out), out, nulled)
        return t.drop_columns(["_ivl_start", "_ivl_end"])

    return joined.map_batches(_check, batch_format="pyarrow")


def pack_by_budget(
    ds,
    budget: int,
    order_col: str,
    value_col: str,
    out_col: str = "shard_id",
):
    """Assign each row a shard id so consecutive rows (in ``order_col``
    order) fill ~``budget`` units per shard: ``shard = exclusive_running
    // budget``.  The output-sharding / sequence-packing step — each
    shard can then be written as its own Parquet partition."""

    def emit(t, inclusive, exclusive):
        return t.append_column(
            out_col, pa.array(exclusive // budget, pa.int64()),
        )

    return _scan(ds, order_col, _int_column(value_col), [out_col], emit)


def ntile(ds, n: int, order_col: str, out_col: str = "tile"):
    """``NTILE(n) OVER (ORDER BY order_col)`` with exact SQL semantics:
    with ``N = count(ds)`` and ``q, r = divmod(N, n)``, the first ``r``
    tiles hold ``q + 1`` rows and the rest ``q`` (tiles differ by at
    most one row, earlier tiles larger).

    ``order_col`` must be UNIQUE (compose a tiebreak into it — the same
    expression the SQL mirror orders by); the two-pass block-prefix
    row numbering identifies blocks by their first order value, the
    same contract as :func:`global_row_number`.  One distributed sort;
    one row per block reaches the driver.
    """
    if n < 1:
        raise ValueError("ntile: n must be >= 1")
    total = ds.count()
    q, r = divmod(total, n)
    cut = r * (q + 1)  # ranks <= cut fall in the first r (larger) tiles

    numbered = global_row_number(ds, order_col, "_rn")

    def _tile(t: pa.Table) -> pa.Table:
        rn = t.column("_rn").to_numpy(zero_copy_only=False)
        if q == 0:
            # fewer rows than tiles: tile == rank
            tile = rn
        else:
            small = r + (rn - 1 - cut) // q + 1
            tile = np.where(rn <= cut, (rn - 1) // (q + 1) + 1, small)
        return t.drop_columns(["_rn"]).append_column(
            out_col, pa.array(tile.astype(np.int64), pa.int64()),
        )

    return numbered.map_batches(_tile, batch_format="pyarrow")


def rolling_mean_by(
    ds,
    partition_col: str,
    order_cols,
    value_col: str,
    preceding: int,
    out_col: str = "rolling_e6",
):
    """Integer-exact rolling mean — ``sum(v_e6) OVER w // count(v) OVER
    w`` with ``w = (PARTITION BY p ORDER BY o ROWS BETWEEN k PRECEDING
    AND CURRENT ROW)``; values quantize to micros (``floor(v*1e6+0.5)``)
    so both sides share exact int64 arithmetic (floor division — equal
    to SQL ``//`` whenever window sums are non-negative, documented).
    Window-null values are excluded from both sum and count (SQL
    semantics); an all-null window yields NULL.

    One groupby exchange; per-group payload = the key's rows (same
    co-location contract as :func:`rolling_extremum` — salt upstream
    for degenerate single-key skew).
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _roll(g: pa.Table) -> pa.Table:
        g = g.sort_by([(c, "ascending") for c in order_cols])
        v = g.column(value_col).combine_chunks()
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        fv = v.to_numpy(zero_copy_only=False).astype(np.float64)
        e6 = np.floor(np.where(valid, fv, 0.0) * 1e6 + 0.5).astype(np.int64)
        ones = valid.astype(np.int64)
        pad_v = np.r_[np.zeros(preceding, np.int64), e6]
        pad_c = np.r_[np.zeros(preceding, np.int64), ones]
        wv = np.lib.stride_tricks.sliding_window_view(pad_v, preceding + 1)
        wc = np.lib.stride_tricks.sliding_window_view(pad_c, preceding + 1)
        sums = wv.sum(axis=1)
        counts = wc.sum(axis=1)
        out = np.where(counts > 0, sums // np.where(counts == 0, 1, counts), 0)
        return g.append_column(
            out_col, pa.array(out, pa.int64(), mask=counts == 0),
        )

    return ds.groupby(partition_col).map_groups(_roll, batch_format="pyarrow")


def lead_by(
    ds,
    partition_col: str,
    order_cols,
    value_col: str,
    out_col: str = "lead",
):
    """``lead(value) OVER (PARTITION BY p ORDER BY o)``: each row gets
    the NEXT row's value within its partition (null for the last).
    Same one-exchange/per-group contract as :func:`lag_by` (salt
    upstream for degenerate single-key skew)."""
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _shift(g: pa.Table) -> pa.Table:
        g = g.sort_by([(c, "ascending") for c in order_cols])
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        shifted = pa.concat_arrays([
            vals.slice(1),
            pa.nulls(min(1, len(vals)), vals.type),
        ])
        return g.append_column(out_col, shifted)

    return ds.groupby(partition_col).map_groups(_shift, batch_format="pyarrow")


def _run_changes(t: pa.Table, cols) -> np.ndarray:
    """Boolean run-change marker per row of a (pre-sorted) table:
    ``True`` where any of ``cols`` differs from the previous row
    (row 0 is always a change).  Columns must be non-null."""
    n = t.num_rows
    rc = np.zeros(n, dtype=bool)
    if n == 0:
        return rc
    rc[0] = True
    for c in cols:
        col = t.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        rc[1:] |= ~pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
    return rc


def _rank_sorted(ds, partition_col, order_cols, out_rank, out_dense,
                 extended: bool = False):
    """Skew-proof rank: ONE distributed sort by (partition, order,
    unique row id) + a per-block boundary exchange.  Each block sends
    the driver one partial (first-row sort tuple, last key/order value,
    trailing key-run stats); the driver folds them in sort order so
    every block learns the carried (rows-done, runs-done,
    rank-of-ongoing-run-start) for the key run it may continue.  No key
    group ever has to fit one worker.  Requires non-null partition and
    order values (same contract as :func:`_lag_sorted`).

    ``extended=True`` additionally emits ``pct_rank_e6`` / ``cume_dist_e6``
    (same exact-integer semantics as the groupby path in
    :func:`rank_by`).  Those need each row's GROUP size and RUN total —
    but in a sorted stream only a block's first and last key/run can
    spill across block boundaries, so the same driver-side fold supplies
    them: the forward pass already carries rows-before, and one extra
    BACKWARD pass over the same per-block partials carries
    rows-after-for-my-trailing-key/run.  Zero additional exchanges."""
    import json as _json

    import ray

    sort_cols = [partition_col] + order_cols + ["_rid"]
    sorted_ds = _with_unique_rid(ds).sort(sort_cols).materialize()

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "_tup": pa.array([], pa.string()),
                "_first_key": pa.array([], pa.string()),
                "_first_ord": pa.array([], pa.string()),
                "_last_key": pa.array([], pa.string()),
                "_last_ord": pa.array([], pa.string()),
                "_n": pa.array([], pa.int64()),
                "_trail_rows": pa.array([], pa.int64()),
                "_trail_runs": pa.array([], pa.int64()),
                "_trail_run_len": pa.array([], pa.int64()),
                "_lead_rows": pa.array([], pa.int64()),
                "_lead_run_len": pa.array([], pa.int64()),
            })
        n = t.num_rows
        kc = _run_changes(t, [partition_col])
        rc = _run_changes(t, [partition_col] + order_cols)
        idx = np.arange(n)
        key_start_last = int(np.max(idx[kc]))
        run_start_last = int(np.max(idx[rc]))
        kstarts = np.flatnonzero(kc)
        rstarts = np.flatnonzero(rc)
        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        ord_of = lambda i: _json.dumps(
            [t.column(c)[i].as_py() for c in order_cols], default=str,
        )
        return pa.Table.from_pydict({
            "_tup": [tup],
            "_first_key": [str(t.column(partition_col)[0].as_py())],
            "_first_ord": [ord_of(0)],
            "_last_key": [str(t.column(partition_col)[-1].as_py())],
            "_last_ord": [ord_of(n - 1)],
            "_n": [n],
            "_trail_rows": [n - key_start_last],
            "_trail_runs": [int(rc[key_start_last:].sum())],
            "_trail_run_len": [n - run_start_last],
            "_lead_rows": [int(kstarts[1]) if len(kstarts) > 1 else n],
            "_lead_run_len": [int(rstarts[1]) if len(rstarts) > 1 else n],
        })

    partials = sorted_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None,
    ).take_all()
    partials.sort(key=lambda r: tuple(_json.loads(r["_tup"])))

    # fold: carry = (key, ord, rows_done, runs_done, run_start_rank)
    boundaries = {}
    key, ordv, rows_done, runs_done, run_start_rank = None, None, 0, 0, 1
    for r in partials:
        boundaries[r["_tup"]] = (key, ordv, rows_done, runs_done,
                                 run_start_rank)
        if r["_first_key"] == key and r["_trail_rows"] == r["_n"]:
            # the whole block continues the carried key run
            merged = r["_first_ord"] == ordv
            new_rows = rows_done + r["_n"]
            new_runs = runs_done + r["_trail_runs"] - (1 if merged else 0)
            if r["_trail_runs"] == 1 and merged:
                new_rsr = run_start_rank
            else:
                new_rsr = rows_done + (r["_n"] - r["_trail_run_len"]) + 1
            rows_done, runs_done, run_start_rank = new_rows, new_runs, new_rsr
        else:
            rows_done = r["_trail_rows"]
            runs_done = r["_trail_runs"]
            run_start_rank = r["_trail_rows"] - r["_trail_run_len"] + 1
        key, ordv = r["_last_key"], r["_last_ord"]

    # backward fold (extended only): per block, how many rows AFTER it
    # belong to its trailing key run / its trailing (key, ord) run.
    # State = the suffix's leading (key, ord) and the number of leading
    # suffix rows matching them.
    after = {}
    if extended:
        a_key, a_ord, a_kcont, a_rcont = None, None, 0, 0
        for r in reversed(partials):
            after[r["_tup"]] = (a_key, a_ord, a_kcont, a_rcont)
            whole_key = r["_lead_rows"] == r["_n"]
            whole_run = r["_lead_run_len"] == r["_n"]
            a_kcont = r["_lead_rows"] + (
                a_kcont if whole_key and a_key == r["_first_key"] else 0
            )
            a_rcont = r["_lead_run_len"] + (
                a_rcont if whole_run and a_key == r["_first_key"]
                and a_ord == r["_first_ord"] else 0
            )
            a_key, a_ord = r["_first_key"], r["_first_ord"]
    b_ref = ray.put((boundaries, after))

    def _apply(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            t = t.append_column(out_rank, pa.array([], pa.int64())) \
                .append_column(out_dense, pa.array([], pa.int64()))
            if extended:
                t = t.append_column("pct_rank_e6", pa.array([], pa.int64())) \
                    .append_column("cume_dist_e6", pa.array([], pa.int64()))
            return t.drop_columns(["_rid"])
        n = t.num_rows
        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        all_b, all_a = ray.get(b_ref)
        b_key, b_ord, b_rows, b_runs, b_rsr = all_b[tup]
        kc = _run_changes(t, [partition_col])
        rc = _run_changes(t, [partition_col] + order_cols)
        idx = np.arange(n)
        key_start = np.maximum.accumulate(np.where(kc, idx, 0))
        run_start = np.maximum.accumulate(np.where(rc, idx, 0))
        runs_cum = np.cumsum(rc)  # 1-based count of run starts up to i
        dense_local = runs_cum - runs_cum[key_start]  # 0-based run idx
        rank = (run_start - key_start + 1).astype(np.int64)
        dense = (dense_local + 1).astype(np.int64)
        first_key_is_carried = b_key is not None and \
            str(t.column(partition_col)[0].as_py()) == b_key
        merged = False
        if first_key_is_carried:
            # rows of the block's first key continue the carried run
            first_ord = _json.dumps(
                [t.column(c)[0].as_py() for c in order_cols], default=str,
            )
            merged = first_ord == b_ord
            m = key_start == 0
            rank = np.where(m, b_rows + run_start + 1, rank)
            dense = np.where(
                m, b_runs + dense_local + (0 if merged else 1), dense,
            )
            if merged:
                m0 = m & (run_start == 0)
                rank = np.where(m0, b_rsr, rank)
        t = t.append_column(out_rank, pa.array(rank, pa.int64())) \
            .append_column(out_dense, pa.array(dense, pa.int64()))
        if extended:
            a_key, a_ord, a_kcont, a_rcont = all_a[tup]
            # per-row local key-group / run sizes from the run structure
            kstarts = np.flatnonzero(kc)
            kends = np.append(kstarts[1:], n)
            key_idx = np.cumsum(kc) - 1
            n_key = (kends - kstarts)[key_idx].astype(np.int64)
            rstarts = np.flatnonzero(rc)
            rends = np.append(rstarts[1:], n)
            run_idx = runs_cum - 1
            run_total = (rends - rstarts)[run_idx].astype(np.int64)
            if first_key_is_carried:
                n_key = np.where(key_start == 0, n_key + b_rows, n_key)
                if merged:
                    carried_run_rows = b_rows - (b_rsr - 1)
                    run_total = np.where(
                        (key_start == 0) & (run_start == 0),
                        run_total + carried_run_rows, run_total,
                    )
            last_key = str(t.column(partition_col)[-1].as_py())
            if a_key is not None and a_key == last_key:
                n_key = np.where(
                    key_idx == len(kstarts) - 1, n_key + a_kcont, n_key,
                )
                last_ord = _json.dumps(
                    [t.column(c)[n - 1].as_py() for c in order_cols],
                    default=str,
                )
                if a_ord == last_ord:
                    run_total = np.where(
                        run_idx == len(rstarts) - 1,
                        run_total + a_rcont, run_total,
                    )
            peers_le = rank - 1 + run_total
            pct = np.where(
                n_key > 1,
                ((rank - 1) * 1_000_000) // np.maximum(n_key - 1, 1),
                0,
            ).astype(np.int64)
            cume = ((peers_le * 1_000_000) // n_key).astype(np.int64)
            t = t.append_column("pct_rank_e6", pa.array(pct, pa.int64())) \
                .append_column("cume_dist_e6", pa.array(cume, pa.int64()))
        return t.drop_columns(["_rid"])

    return sorted_ds.map_batches(
        _apply, batch_format="pyarrow", batch_size=None,
    )


def rank_by(
    ds,
    partition_col: str,
    order_cols,
    out_rank: str = "rank",
    out_dense: str = "dense_rank",
    max_rows_per_group: int | None = None,
    extended: bool = False,
):
    """``rank()`` and ``dense_rank() OVER (PARTITION BY p ORDER BY o)``
    in one pass (ascending order; rank ties share the run-start rank,
    dense_rank counts distinct order-value runs).  Partition and order
    values must be non-null.

    ``extended=True`` additionally emits exact-integer-micros
    ``pct_rank_e6`` (``(rank-1)*1e6 // (n-1)``; 0 for a 1-row group,
    matching SQL PERCENT_RANK) and ``cume_dist_e6`` (``peers_le *
    1e6 // n`` where ``peers_le`` counts rows whose order value is <=
    the current row's — SQL CUME_DIST with RANGE tie semantics).  The
    integer division mirrors a DuckDB ``//`` oracle bit-for-bit, unlike
    a float percent_rank.  Extended mode needs the whole group (its
    size) in one place, so it is groupby-path only.

    Partitions co-locate with one ``groupby`` exchange; pass
    ``max_rows_per_group`` to probe for degenerate single-key skew and
    switch to the skew-proof sorted path (:func:`_rank_sorted` — one
    global sort + one boundary row per block, no group co-location;
    extended stats ride the same boundary fold via an extra backward
    driver pass, still zero additional exchanges).
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    if max_rows_per_group is not None:
        ds = ds.materialize()  # probe + op share one upstream execution
        if max_group_rows(ds, partition_col) > max_rows_per_group:
            return _rank_sorted(ds, partition_col, order_cols, out_rank,
                                out_dense, extended=extended)

    def _rank(g: pa.Table) -> pa.Table:
        g = g.sort_by([(c, "ascending") for c in order_cols])
        n = g.num_rows
        rc = _run_changes(g, order_cols)  # one key per group
        idx = np.arange(n)
        run_start = np.maximum.accumulate(np.where(rc, idx, 0))
        rank = (run_start + 1).astype(np.int64)
        dense = np.cumsum(rc).astype(np.int64)
        g = g.append_column(out_rank, pa.array(rank, pa.int64())) \
            .append_column(out_dense, pa.array(dense, pa.int64()))
        if extended:
            starts = np.flatnonzero(rc)
            run_end = np.append(starts[1:], n)  # exclusive end per run
            peers_le = run_end[dense - 1] if n else np.zeros(0, np.int64)
            pct = ((rank - 1) * 1_000_000) // (n - 1) if n > 1 else \
                np.zeros(n, np.int64)
            cume = (peers_le.astype(np.int64) * 1_000_000) // max(n, 1)
            g = g.append_column("pct_rank_e6", pa.array(pct, pa.int64())) \
                .append_column("cume_dist_e6", pa.array(cume, pa.int64()))
        return g

    return ds.groupby(partition_col).map_groups(_rank, batch_format="pyarrow")


def _ffill_sorted(ds, partition_col, order_cols, value_col, out_col):
    """Skew-proof LOCF: ONE distributed sort by (partition, order, _rid)
    + a boundary exchange carrying, per block, the last non-null value
    of the block's final key — a degenerate hot key spans as many blocks
    as the sort assigns it, and an all-null middle block carries the
    previous block's state through unchanged.  Requires non-null
    partition/order values (same contract as the other sorted paths)."""
    import json as _json

    import ray

    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    sort_cols = [partition_col] + order_cols + ["_rid"]
    sorted_ds = _with_unique_rid(ds).sort(sort_cols).materialize()

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"_tup": [], "_last_key": [], "_has": [], "_val": []},
            )
        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        keys = t.column(partition_col).to_numpy(zero_copy_only=False)
        vals = t.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        cand = np.nonzero((keys == keys[-1]) & valid)[0]
        return pa.Table.from_pydict({
            "_tup": [tup],
            "_last_key": [keys[-1]],
            "_has": [bool(len(cand))],
            "_val": [vals[int(cand[-1])].as_py() if len(cand) else None],
        })

    partials = sorted_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None,
    ).take_all()
    partials.sort(key=lambda r: tuple(_json.loads(r["_tup"])))

    # fold: (key in progress at block end, its latest non-null value).
    # Keys are contiguous after the sort, so a block whose last key
    # continues the state key refines the value; a new key resets it.
    boundaries = {}
    state_key, state_val = None, None
    for r in partials:
        boundaries[r["_tup"]] = (state_key, state_val)
        if r["_last_key"] == state_key:
            if r["_has"]:
                state_val = r["_val"]
        else:
            state_key = r["_last_key"]
            state_val = r["_val"] if r["_has"] else None
    b_ref = ray.put(boundaries)

    def _fill_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            vt = t.schema.field(value_col).type
            return t.append_column(out_col, pa.array([], vt)) \
                .drop_columns(["_rid"])
        tup = _json.dumps(_first_row_tuple(t, sort_cols), default=str)
        b_key, b_val = ray.get(b_ref)[tup]
        keys = t.column(partition_col).to_numpy(zero_copy_only=False)
        vals = t.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        n = t.num_rows
        idx = np.arange(n)
        last_valid = np.maximum.accumulate(np.where(valid, idx, -1))
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        key_start = np.maximum.accumulate(np.where(change, idx, 0))
        in_block = last_valid >= key_start
        filled = vals.take(
            pa.array(last_valid.astype(np.int64), mask=~in_block),
        )
        if b_val is not None:
            bmask = pa.array((~in_block) & (keys == b_key))
            filled = pc.if_else(bmask, pa.scalar(b_val, vals.type), filled)
        return t.append_column(out_col, filled).drop_columns(["_rid"])

    return sorted_ds.map_batches(
        _fill_block, batch_format="pyarrow", batch_size=None,
    )


def forward_fill_by(
    ds,
    partition_col: str,
    order_cols,
    value_col: str,
    out_col: str = "filled",
    max_rows_per_group: int | None = None,
):
    """Last-observation-carried-forward — SQL
    ``last_value(v IGNORE NULLS) OVER (PARTITION BY p ORDER BY o ROWS
    UNBOUNDED PRECEDING)``: each row gets the most recent non-null
    ``value_col`` within its partition (rows before the first non-null
    stay null).  The gap-fill step for sensor/event streams.

    Partitions co-locate with one ``groupby`` exchange; the fill inside
    a group is one ``maximum.accumulate`` + gather.  Deterministic iff
    ``order_cols`` are unique within a partition.  Partition and order
    values must be non-null.

    Each key group must fit one worker.  Pass ``max_rows_per_group`` to
    guard against degenerate single-key skew: one narrow groupby-count
    probe runs first, and if any group exceeds the bound the operator
    switches to the skew-proof sorted path (:func:`_ffill_sorted` — one
    global sort + one boundary row per block, no group co-location).
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    if max_rows_per_group is not None:
        ds = ds.materialize()  # probe + op share one upstream execution
        if max_group_rows(ds, partition_col) > max_rows_per_group:
            return _ffill_sorted(ds, partition_col, order_cols, value_col,
                                 out_col)

    def _fill(g: pa.Table) -> pa.Table:
        g = g.sort_by([(c, "ascending") for c in order_cols])
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        idx = np.arange(g.num_rows)
        last_valid = np.maximum.accumulate(np.where(valid, idx, -1))
        filled = vals.take(
            pa.array(last_valid.astype(np.int64), mask=last_valid < 0),
        )
        return g.append_column(out_col, filled)

    return ds.groupby(partition_col).map_groups(_fill, batch_format="pyarrow")


def resample_locf(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: int,
    out_ts: str = "grid_ts",
    tie_col: str | None = None,
):
    """Resample each key's observations onto a regular grid (every
    ``step`` ts units from ``ceil(min_ts/step)·step`` to ``max_ts``)
    with last-observation-carried-forward values — the gap-fill /
    downsample step for event streams (SQL: per-key ``generate_series``
    + ``ASOF LEFT JOIN``).

    ``ts_col`` must be int64 (cast epochs upstream).  Ties at one
    (key, ts) either dedup upstream (default contract: ts unique per
    key — at equal ts the carried value would be arbitrary) or resolve
    IN the fill pass via ``tie_col``: duplicates are then allowed and
    the observation with the greatest ``tie_col`` wins (it sorts last
    before the grid row, so LOCF carries it) — folding a
    max-``tie_col`` pre-dedup exchange into the fill's existing
    per-group sort for free.  Rows with null ``value_col`` must be
    dropped upstream (an ASOF join would carry them, LOCF would skip
    them).

    Scale shape: ONE tiny groupby per-key (min, max) exchange builds
    the grid spec (one row per key); grid rows are generated block-wise
    from it (a hot key's grid is proportional to its time span, not its
    row count); the union of observations and grid rows then rides
    :func:`forward_fill_by`'s machinery (grid rows sort after the
    observation at the same ts via a side column), and only grid rows
    survive.  Pass-through of ``forward_fill_by``'s skew contract: each
    (observations + grid) key group must fit one worker.
    """
    from .relational import groupby_agg

    if step <= 0:
        raise ValueError("step must be positive")
    cols = [key_col, ts_col, value_col] + ([tie_col] if tie_col else [])
    obs = ds.select_columns(cols)
    bounds = groupby_agg(
        obs.select_columns([key_col, ts_col]), key_col,
        {"_mn": ("min", ts_col), "_mx": ("max", ts_col)},
    )

    def _grid(t: pa.Table) -> pa.Table:
        mn = t.column("_mn").to_numpy(zero_copy_only=False)
        mx = t.column("_mx").to_numpy(zero_copy_only=False)
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        starts = ((mn + step - 1) // step) * step
        counts = np.maximum((mx - starts) // step + 1, 0).astype(np.int64)
        reps = pa.array(np.repeat(np.arange(len(counts)), counts))
        offs = np.concatenate(
            [np.arange(c, dtype=np.int64) for c in counts],
        ) if len(counts) else np.zeros(0, np.int64)
        gts = np.repeat(starts, counts) + offs * step
        return pa.Table.from_arrays(
            [keys.take(reps), pa.array(gts.astype(np.int64)),
             pa.array(np.ones(len(gts), np.int8))],
            names=[key_col, ts_col, "_grid"],
        )

    grid = bounds.map_batches(_grid, batch_format="pyarrow")

    def _tag_obs(t: pa.Table) -> pa.Table:
        arrays = [t.column(key_col),
                  pc.cast(t.column(ts_col), pa.int64()),
                  pa.array(np.zeros(t.num_rows, np.int8)),
                  t.column(value_col)]
        names = [key_col, ts_col, "_grid", value_col]
        if tie_col:
            arrays.append(t.column(tie_col))
            names.append(tie_col)
        return pa.Table.from_arrays(arrays, names=names)

    sch = obs.schema()
    types = dict(zip(sch.names, sch.types))
    vtype = types[value_col]

    def _pad_grid(t: pa.Table) -> pa.Table:
        t = t.append_column(value_col, pa.nulls(t.num_rows, vtype))
        if tie_col:
            t = t.append_column(tie_col, pa.nulls(t.num_rows, types[tie_col]))
        return t

    u = obs.map_batches(_tag_obs, batch_format="pyarrow").union(
        grid.map_batches(_pad_grid, batch_format="pyarrow"),
    )
    # at equal ts: observations (_grid=0) sort before the grid row
    # (_grid=1), and with tie_col the max-tie observation sorts last
    # among them — so LOCF carries exactly the tie-broken value
    order = [ts_col, "_grid"] + ([tie_col] if tie_col else [])
    filled = forward_fill_by(
        u, key_col, order, value_col, out_col="_filled",
    )

    def _take_grid(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("_grid"), pa.scalar(1, pa.int8())))
        return pa.Table.from_arrays(
            [t.column(key_col), t.column(ts_col), t.column("_filled")],
            names=[key_col, out_ts, value_col],
        )

    return filled.map_batches(_take_grid, batch_format="pyarrow")


def debounce_by(
    ds,
    partition_cols,
    ts_col: str,
    gap_us: int,
    tie_cols=(),
    max_rows_per_group: int | None = None,
):
    """Event-stream debounce (duplicate-burst suppression): keep a row
    iff the immediately preceding row of its partition (``ORDER BY ts``,
    then ``tie_cols``) is more than ``gap_us`` microseconds older, or
    absent — ``LAG`` semantics, so the comparison point is the previous
    row whether or not it was itself kept (the stateless variant any SQL
    window replays; chained throttling would need a recursive scan).
    The ingest-hygiene step for at-least-once event streams where
    retries and double-fires land within a short window.

    Rides :func:`lag_by` (one exchange); pass ``max_rows_per_group`` to
    arm its skew guard — groups above the bound then take the sorted
    boundary-exchange path instead of co-locating on one worker.
    Partition columns must be non-null.  Timestamps must cast to int64
    microseconds.
    """
    partition_cols = (
        [partition_cols] if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    tie_cols = list(tie_cols)
    sep = "\x1f"

    def _prep(t: pa.Table) -> pa.Table:
        parts = [
            pc.cast(t.column(c), pa.string()) for c in partition_cols
        ]
        key = parts[0] if len(parts) == 1 else (
            pc.binary_join_element_wise(*parts, sep)
        )
        tsu = pc.cast(t.column(ts_col), pa.int64())
        t = t.append_column("_dk", key)
        return t.append_column("_tsu", tsu)

    lagged = lag_by(
        ds.map_batches(_prep, batch_format="pyarrow"),
        "_dk", ["_tsu"] + tie_cols, "_tsu", out_col="_prev",
        max_rows_per_group=max_rows_per_group,
    )

    def _keep(t: pa.Table) -> pa.Table:
        tsu = t.column("_tsu")
        prev = t.column("_prev")
        keep = pc.or_kleene(
            pc.is_null(prev),
            pc.greater(pc.subtract(tsu, pc.fill_null(prev, 0)), gap_us),
        )
        return t.filter(pc.fill_null(keep, True)).drop_columns(
            ["_dk", "_tsu", "_prev"],
        )

    return lagged.map_batches(_keep, batch_format="pyarrow")
