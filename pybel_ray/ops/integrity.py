"""Table integrity operators: order-invariant content digests and keyed
version diffs — the validation primitives of incremental / replicated
pipelines (does the re-run equal the checkpoint? what changed between
snapshot N and N+1?).

:func:`table_digest` — an order- and partitioning-invariant digest:
each row renders its columns canonically (sorted column order, ``\\x1f``
separator, ``\\x00N`` null sentinel), hashes to md5, and the digest is
the exact integer SUM of each hash's first 15 hex chars (60 bits) —
commutative, so block layout never matters, and small enough that even
2^60 rows cannot overflow the arbitrary-precision driver fold.  Only
int/string/bool columns are digestible (float rendering is not
portable across engines — quantize first); the DuckDB oracle recomputes
the same sum digit-by-digit.

:func:`table_diff` — keyed diff of two table versions (keys unique per
side): ``added`` (delta only), ``removed`` (base only), ``changed``
(both sides, value rendering differs).  Three vectorized passes —
ONE bucketed lookup join of the delta's row hash onto the base plus
one bucketed anti-join for additions; value columns never shuffle,
only (key, 60-bit hash) rows move.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["table_digest", "table_diff"]

_SEP = "\x1f"
_NULL = "\x00N"
_DIGESTIBLE = "int8 int16 int32 int64 uint8 uint16 uint32 uint64 string large_string bool"


def _render(t: pa.Table, cols) -> pa.Array:
    """Canonical row rendering: sorted columns cast to string, null
    sentinel, \\x1f-joined.  Matches the SQL COALESCE(CAST(..)) mirror."""
    parts = []
    for c in sorted(cols):
        col = t.column(c)
        if str(col.type) not in _DIGESTIBLE.split():
            raise TypeError(
                "table_digest/diff: column %r has non-digestible type %s"
                " (floats are not portably renderable — quantize first)"
                % (c, col.type),
            )
        if pa.types.is_boolean(col.type):
            # render booleans as 'true'/'false' (the SQL casting)
            col = pc.if_else(col, "true", "false")
        parts.append(pc.fill_null(pc.cast(col, pa.string()), _NULL))
    out = parts[0]
    for p in parts[1:]:
        out = pc.binary_join_element_wise(out, p, _SEP)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _hash60(rendered: pa.Array) -> list[int]:
    return [
        int(hashlib.md5(s.encode("utf8")).hexdigest()[:15], 16)  # noqa: S324
        for s in rendered.to_pylist()
    ]


def table_digest(ds, cols=None) -> pa.Table:
    """One-row ``(n_rows, digest)`` table; ``digest`` is the decimal
    string of the exact hash sum (see module docstring)."""

    def _partial(t: pa.Table) -> pa.Table:
        use = cols if cols is not None else t.column_names
        h = _hash60(_render(t, use)) if t.num_rows else []
        return pa.Table.from_arrays(
            [pa.array([t.num_rows], pa.int64()),
             pa.array([str(sum(h))], pa.string())],
            names=["n", "s"],
        )

    n_rows, total = 0, 0
    for row in ds.map_batches(
        _partial, batch_format="pyarrow",
    ).take_all():  # one row per block
        n_rows += row["n"]
        total += int(row["s"])
    return pa.Table.from_arrays(
        [pa.array([n_rows], pa.int64()), pa.array([str(total)], pa.string())],
        names=["n_rows", "digest"],
    )


def table_diff(
    base,
    delta,
    keys,
    value_cols,
    num_buckets: int = 64,
):
    """``(keys..., status)`` rows for every key that was added, removed
    or changed between ``base`` and ``delta`` (see module docstring).
    Keys must be unique per side and null-free (keyed-table contract).
    """
    from ..struct.degree import bucketed_attach, bucketed_semi_join

    keys = [keys] if isinstance(keys, str) else list(keys)
    value_cols = list(value_cols)

    def _keyed(side_cols):
        def _f(t: pa.Table) -> pa.Table:
            k = _render(t, keys)
            h = pa.array(
                [str(v) for v in _hash60(_render(t, value_cols))],
                pa.string(),
            )
            out = pa.Table.from_arrays(
                [t.column(c) for c in keys] + [k, h],
                names=keys + ["_k", "_h"],
            )
            return out
        return _f

    b = base.select_columns(keys + value_cols).map_batches(
        _keyed(None), batch_format="pyarrow",
    ).materialize()
    d = delta.select_columns(keys + value_cols).map_batches(
        _keyed(None), batch_format="pyarrow",
    ).materialize()

    # removed/changed: one bucketed lookup of the delta hash onto base
    j = bucketed_attach(
        b, "_k", d.select_columns(["_k", "_h"]).map_batches(
            lambda t: t.rename_columns(["_k", "_dh"]),
            batch_format="pyarrow",
        ),
        "_k", ["_dh"], num_buckets=num_buckets, how="left",
    )

    def _status(t: pa.Table) -> pa.Table:
        dh = t.column("_dh").combine_chunks()
        bh = t.column("_h").combine_chunks()
        removed = pc.is_null(dh)
        changed = pc.and_kleene(pc.is_valid(dh), pc.invert(
            pc.equal(dh, bh),
        ))
        status = pc.if_else(
            removed, "removed",
            pc.if_else(pc.fill_null(changed, False), "changed", ""),
        )
        t = t.append_column("status", status)
        t = t.filter(pc.not_equal(t.column("status"), ""))
        return t.select(keys + ["status"])

    base_side = j.map_batches(_status, batch_format="pyarrow")

    added = bucketed_semi_join(
        d, "_k", b.select_columns(["_k"]), keys_key="_k", anti=True,
    ).map_batches(
        lambda t: t.select(keys).append_column(
            "status", pa.array(["added"] * t.num_rows, pa.string()),
        ),
        batch_format="pyarrow",
    )

    return base_side.union(added)
