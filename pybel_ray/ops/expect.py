"""Declarative data-quality expectations over a Dataset.

Great-Expectations-style checks a 100 TB ingest runs before committing a
partition: each rule counts its violations in one vectorized pass.
Per-column rules (``not_null`` / ``between`` / ``in_set`` / ``regex``)
all share ONE ``map_batches`` sweep — every block emits one tiny
(rule, count) partial row per rule and a single ``groupby(rule)`` sum
folds them (the exchange carries ``blocks x rules`` int rows, never
data).  The ``unique`` rule is the only one that needs key
co-location: one ``groupby(column)`` count exchange of the key column
alone; violations = surplus duplicate rows (``count(*) - count(distinct
col)`` in SQL terms).

No reference analog — this is part of the beyond-reference
training-data-pipeline surface (SURVEY.md section 2.12).
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rule_name(rule: Mapping) -> str:
    return rule.get("name") or "{}:{}".format(rule["kind"], rule["column"])


def _violation_mask(t: pa.Table, rule: Mapping) -> pa.Array:
    """Row-level violation mask for the per-column rule kinds (nulls
    violate only ``not_null``; the other kinds skip them, mirroring SQL
    three-valued logic)."""
    col = t.column(rule["column"]).combine_chunks()
    kind = rule["kind"]
    if kind == "not_null":
        return pc.is_null(col)
    if kind == "between":
        ok = pc.and_(
            pc.greater_equal(col, pa.scalar(rule["lo"])),
            pc.less_equal(col, pa.scalar(rule["hi"])),
        )
        return pc.and_(pc.is_valid(col),
                       pc.invert(pc.fill_null(ok, False)))
    if kind == "in_set":
        ok = pc.is_in(col, value_set=pa.array(list(rule["values"])))
        return pc.and_(pc.is_valid(col), pc.invert(ok))
    if kind == "regex":
        ok = pc.match_substring_regex(
            pc.cast(col, pa.string()), rule["pattern"],
        )
        return pc.and_(pc.is_valid(col),
                       pc.invert(pc.fill_null(ok, False)))
    raise ValueError("unknown expectation kind: {}".format(kind))


def _violations(t: pa.Table, rule: Mapping) -> int:
    mask = _violation_mask(t, rule)
    return pc.sum(pc.cast(mask, pa.int64())).as_py() or 0


def expect(ds, rules: Sequence[Mapping]) -> pa.Table:
    """Evaluate expectation ``rules`` and return one ``(rule,
    violations)`` row per rule, sorted by rule name.

    Each rule is a dict: ``{"kind": "not_null"|"between"|"in_set"|
    "regex"|"unique", "column": str, ...}`` with kind-specific params
    (``lo``/``hi``, ``values``, ``pattern``) and an optional ``name``.
    ``regex`` uses RE2 (``pyarrow.compute.match_substring_regex``) so a
    DuckDB ``regexp_matches`` oracle shares the dialect.  ``between``
    counts only non-null out-of-range values; pair it with a
    ``not_null`` rule to surface nulls.
    """
    known = {"not_null", "between", "in_set", "regex", "unique"}
    for r in rules:  # fail fast on the driver, not inside a task
        if r["kind"] not in known:
            raise ValueError("unknown expectation kind: {}".format(r["kind"]))
    scan_rules = [r for r in rules if r["kind"] != "unique"]
    unique_rules = [r for r in rules if r["kind"] == "unique"]
    names: list[str] = []
    counts: list[int] = []

    if scan_rules:
        cols = sorted({r["column"] for r in scan_rules})

        def _partials(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [pa.array([_rule_name(r) for r in scan_rules]),
                 pa.array([_violations(t, r) for r in scan_rules],
                          pa.int64())],
                names=["rule", "violations"],
            )

        agg = ds.select_columns(cols).map_batches(
            _partials, batch_format="pyarrow",
        ).groupby("rule").sum("violations")
        seen = {}
        for row in agg.take_all():  # one row per rule
            seen[row["rule"]] = int(row["sum(violations)"])
        for r in scan_rules:  # empty dataset -> 0 violations, not no row
            rn = _rule_name(r)
            names.append(rn)
            counts.append(seen.get(rn, 0))

    for r in unique_rules:
        col = r["column"]
        nonnull = ds.select_columns([col]).map_batches(
            lambda t, c=col: t.filter(pc.is_valid(t.column(c))),
            batch_format="pyarrow",
        )  # null keys ignored (SQL count(distinct)); not_null covers them
        grp = nonnull.groupby(col).count()
        surplus = grp.map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.subtract(
                    t.column("count()"), pa.scalar(1, pa.int64()),
                ).cast(pa.int64())],
                names=["surplus"],
            ),
            batch_format="pyarrow",
        ).sum("surplus")
        names.append(_rule_name(r))
        counts.append(int(surplus or 0))

    order = np.argsort(np.asarray(names, dtype=object), kind="stable")
    return pa.Table.from_arrays(
        [pa.array([names[i] for i in order]),
         pa.array([counts[i] for i in order], pa.int64())],
        names=["rule", "violations"],
    )


def expect_tag(ds, rules: Sequence[Mapping], out_col: str = "bad_rule"):
    """Row-level validation routing: every row gains ``out_col`` = the
    name of the FIRST violated rule (list order = priority) or null —
    the quarantine/dead-letter step of an ingest (filter
    ``out_col is null`` for the clean stream, not-null for the
    quarantine stream with its reject reason attached).

    One vectorized ``map_batches`` sweep, zero shuffle.  Only the
    per-column rule kinds are allowed (``unique`` needs global state
    and stays an aggregate-only check in :func:`expect`).
    """
    known = {"not_null", "between", "in_set", "regex"}
    for r in rules:  # fail fast on the driver, not inside a task
        if r["kind"] == "unique":
            raise ValueError(
                "expect_tag: 'unique' is aggregate-only (use expect())",
            )
        if r["kind"] not in known:
            raise ValueError("unknown expectation kind: {}".format(r["kind"]))
    scan_rules = list(rules)

    def _tag(t: pa.Table) -> pa.Table:
        tag = pa.nulls(t.num_rows, pa.string())
        for r in reversed(scan_rules):  # first rule wins -> apply last
            mask = _violation_mask(t, r)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            tag = pc.if_else(mask, pa.scalar(_rule_name(r)), tag)
        return t.append_column(out_col, tag)

    return ds.map_batches(_tag, batch_format="pyarrow")
