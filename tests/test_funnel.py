"""Planted-scenario tests for ops/funnel.py (strict-after semantics,
layout invariance, calendar-day cohorts)."""

import datetime as dt

import pyarrow as pa


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def _events(rows):
    import ray.data

    return ray.data.from_items(
        [{"user_id": u, "event_type": t, "ts": _ts(s)} for u, t, s in rows],
    )


def test_funnel_strict_after_semantics(ray_session):
    from pybel_ray.ops.funnel import funnel_counts

    rows = [
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),   # all 3
        (2, "click", 0), (2, "view", 10), (2, "click", 5),       # view only
        (3, "view", 0), (3, "purchase", 5), (3, "click", 10),
        (3, "purchase", 8),                                       # steps 1-2
        (4, "click", 0), (4, "purchase", 1),                      # none
        (5, "view", 0), (5, "click", 0),                          # equal ts
    ]
    out = funnel_counts(_events(rows), ["view", "click", "purchase"])
    assert out.column("users").to_pylist() == [4, 2, 1]
    assert out.column("step_type").to_pylist() == [
        "view", "click", "purchase",
    ]
    # layout invariance
    out2 = funnel_counts(
        _events(rows).repartition(7), ["view", "click", "purchase"],
    )
    assert out2.equals(out)


def test_retention_calendar_days(ray_session):
    import ray.data

    from pybel_ray.ops.funnel import retention_counts

    day = 86400
    rows = [(1, 0), (1, 3600), (1, 2 * day), (2, day + 5), (2, day + 9)]
    ds = ray.data.from_items(
        [{"user_id": u, "ts": _ts(s)} for u, s in rows],
    )
    out = retention_counts(ds).to_pandas().sort_values(
        ["cohort_day", "day_offset"],
    ).reset_index(drop=True)
    assert list(out["day_offset"]) == [0, 2, 0]
    assert list(out["users"]) == [1, 1, 1]
    assert out["cohort_day"][0] == pa.scalar(
        dt.datetime(2026, 1, 1),
    ).as_py()
