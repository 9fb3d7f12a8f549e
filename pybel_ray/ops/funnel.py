"""Ordered-funnel and cohort-retention analytics over an event log.

:func:`funnel_counts` — classic ordered funnel: a user reaches step
``i`` when some event of ``steps[i]``'s type occurs STRICTLY AFTER the
user's reach time of step ``i-1`` (reach time = the earliest qualifying
timestamp; step 0 needs no predecessor).  Mirrors the cascaded
``min(ts) ... WHERE ts > prev`` SQL the DuckDB oracle runs.

Scale shape: NO per-user group ever materializes — each step is one
vectorized ``groupby(user).min(ts)`` over the type-filtered events plus
one bucketed lookup join of the previous step's reach table (reach
tables hold one row per surviving user).  A bot user with millions of
events costs only its share of the filtered scan, never a single-worker
group.  ``k`` steps = ``k`` small exchanges; only ``k`` scalar counts
reach the driver.

:func:`retention_counts` — cohort retention: users grouped by the day
of their first event (cohort), counted once per distinct
``(cohort_day, day_offset)`` they were active on.  One ``groupby(user)``
min pass, one bucketed join back onto the events, one distinct exchange,
one final count aggregate.

The reference engine has no event-funnel analytics; these are the
product-analytics operators of the events family (``sessionize``,
``tumbling_window_agg``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["funnel_counts", "retention_counts"]


def _min_ts_per_user(ds, user_col: str, ts_col: str):
    """(user, t) vectorized partial-min per batch → one native groupby."""

    def _partial(t: pa.Table) -> pa.Table:
        u = t.column(user_col).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        enc = u.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        tsv = ts.cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        c, v = codes[order], tsv[order]
        starts = np.r_[True, c[1:] != c[:-1]] if len(c) else np.array([], bool)
        idx = np.flatnonzero(starts)
        mins = np.minimum.reduceat(v, idx) if len(idx) else np.array([], np.int64)
        return pa.Table.from_arrays(
            [pc.take(enc.dictionary, pa.array(c[idx] if len(idx) else [],
                                              pa.int64())),
             pa.array(mins, pa.int64()).cast(pa.timestamp("us"))],
            names=[user_col, "_t"],
        )

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    out = partial.groupby(user_col).min("_t")
    return out.map_batches(
        lambda t: t.rename_columns(
            ["_t" if c == "min(_t)" else c for c in t.column_names],
        ),
        batch_format="pyarrow",
    )


def funnel_counts(
    events,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets: int = 64,
) -> pa.Table:
    """``(step, step_type, users)`` — users reaching each funnel step in
    order (strict-inequality timestamps; see module docstring)."""
    from ..struct.degree import bucketed_attach

    steps = list(steps)
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")

    base = events.select_columns([user_col, ts_col, type_col])
    counts = []
    reach = None
    for i, step_type in enumerate(steps):
        stage = base.filter(
            expr="{} == {!r}".format(type_col, str(step_type)),
        )
        if i > 0:
            # attach the previous reach time, keep strictly-later events
            stage = bucketed_attach(
                stage, user_col, reach, user_col, ["_t"],
                num_buckets=num_buckets, how="inner",
            )

            def _later(t: pa.Table) -> pa.Table:
                return t.filter(
                    pc.greater(t.column(ts_col), t.column("_t")),
                ).drop_columns(["_t"])

            stage = stage.map_batches(_later, batch_format="pyarrow")
        reach = _min_ts_per_user(stage, user_col, ts_col).materialize()
        counts.append(reach.count())

    return pa.Table.from_arrays(
        [
            pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            pa.array([str(s) for s in steps], pa.string()),
            pa.array(counts, pa.int64()),
        ],
        names=["step", "step_type", "users"],
    )


def retention_counts(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
):
    """Cohort retention: ``(cohort_day, day_offset, users)`` — distinct
    users whose FIRST event fell on ``cohort_day`` and who were active
    ``day_offset`` days later (offset 0 = the cohort day itself).

    Days are UTC calendar days (``floor(ts / 86400s)``), matching the
    DuckDB ``date_trunc``/``date_diff`` oracle.
    """
    from ..struct.degree import bucketed_attach

    US_PER_DAY = 86_400_000_000

    base = events.select_columns([user_col, ts_col])
    first = _min_ts_per_user(base, user_col, ts_col)

    tagged = bucketed_attach(
        base, user_col, first, user_col, ["_t"],
        num_buckets=num_buckets, how="inner",
    )

    def _offsets(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        t0 = t.column("_t").combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // US_PER_DAY
        cohort = t0 // US_PER_DAY
        u = t.column(user_col).combine_chunks()
        # local distinct (user, cohort, offset) combiner before the
        # global distinct exchange
        tab = pa.Table.from_arrays(
            [u,
             pa.array(cohort * US_PER_DAY, pa.int64()).cast(pa.timestamp("us")),
             pa.array(day - cohort, pa.int64())],
            names=[user_col, "cohort_day", "day_offset"],
        )
        key = pc.binary_join_element_wise(
            pc.cast(tab.column(user_col), pa.string()),
            pc.cast(tab.column("day_offset"), pa.string()), "\x1f",
        )
        enc = key.combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        order = np.argsort(codes, kind="stable")
        c = codes[order]
        starts = np.r_[True, c[1:] != c[:-1]] if len(c) else np.array([], bool)
        take = order[np.flatnonzero(starts)]
        return tab.take(pa.array(take)).append_column(
            "_k", pc.take(pa.chunked_array([enc]).combine_chunks(),
                          pa.array(take)).cast(pa.string()),
        )

    local = tagged.map_batches(_offsets, batch_format="pyarrow")

    def _one(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    distinct = local.groupby("_k").map_groups(_one, batch_format="pyarrow")

    def _partial_counts(t: pa.Table) -> pa.Table:
        from ._kernels import runlength_distinct_counts

        cd = pc.cast(t.column("cohort_day"), pa.int64())
        cd = pc.cast(cd, pa.string()).combine_chunks()
        off = pc.cast(t.column("day_offset"), pa.string()).combine_chunks()
        take, counts = runlength_distinct_counts([cd, off])
        kept = t.take(take)
        return pa.Table.from_arrays(
            [kept.column("cohort_day"), kept.column("day_offset"),
             pa.array(counts, pa.int64())],
            names=["cohort_day", "day_offset", "users"],
        )

    partial = distinct.map_batches(_partial_counts, batch_format="pyarrow")
    out = partial.groupby(["cohort_day", "day_offset"]).sum("users")
    return out.map_batches(
        lambda t: t.rename_columns(
            ["users" if c == "sum(users)" else c for c in t.column_names],
        ),
        batch_format="pyarrow",
    )
