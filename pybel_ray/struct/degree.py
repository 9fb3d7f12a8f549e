"""Distributed degree aggregates and key-set joins over the edge table.

The degree-dependent deletion ops (reference ``struct/mutation/deletion/
utils.py:20-40``, ``deletion/protein_rna_origins.py:15-60``) need per-node
incident-edge statistics.  At 100 TB the edge table can never visit the
driver, so the primitives here follow SURVEY.md §2.3's prescription
("leaf pruning = degree aggregate + anti-join"):

* :func:`node_degree_stats` — explode ``(src_md5, dst_md5)`` endpoints with
  a per-batch partial aggregation (combiner), then ONE small
  ``groupby(md5).sum`` shuffle.  Only (md5, partial-count) rows move.
* :func:`endpoint_ids` — distinct endpoint md5s, same combiner shape.
* :func:`bucketed_semi_join` — distributed semi/anti join of a Dataset
  against a key Dataset.  Both sides are hash-bucketed on the key and
  co-located by ONE ``groupby(bucket)``; within each bucket the membership
  test is a single vectorized ``pc.is_in`` (no per-key Python calls).

The ``map_groups``-per-bucket trick mirrors ``stages/dedup.py``: grouping
by ``hash(key) % B`` instead of the key itself turns per-unique-key UDF
overhead into ``B`` vectorized calls while preserving exactness (equal
keys always share a bucket).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "node_degree_stats",
    "endpoint_ids",
    "bucketed_semi_join",
    "bucketed_attach",
    "collect_small_key_set",
]


def _value_counts(arr: pa.ChunkedArray) -> tuple:
    """(unique values, counts) of a string column, vectorized."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vc = arr.value_counts()
    return vc.field("values"), vc.field("counts")


def node_degree_stats(edges, central_relations: Optional[Iterable[str]] = None):
    """Per-node degree Dataset: (md5, degree[, central_out]).

    ``degree`` counts every incident edge at either endpoint (an edge with
    src == dst counts twice, matching a Counter over both endpoints).
    With ``central_relations``, ``central_out`` additionally counts edges
    of those relations where the node is the SOURCE (the central-dogma
    origin test of ``prune_protein_rna_origins``).

    Per-batch partials keep the shuffle tiny: a block of a million edges
    collapses to one row per distinct endpoint before the exchange.
    """
    rel_array = (
        pa.array(sorted(central_relations)) if central_relations is not None else None
    )

    def _partial(t: pa.Table) -> pa.Table:
        src = t.column("src_md5")
        dst = t.column("dst_md5")
        both = pa.chunked_array([c for col in (src, dst) for c in col.chunks], type=pa.string())
        vals, counts = _value_counts(both)
        out_md5 = [vals]
        out_deg = [counts.cast(pa.int64())]
        out_central = [pa.nulls(len(vals), pa.int64())]
        if rel_array is not None:
            central_src = t.filter(
                pc.is_in(t.column("relation"), value_set=rel_array),
            ).column("src_md5")
            cvals, ccounts = _value_counts(central_src)
            if len(cvals):
                out_md5.append(cvals)
                out_deg.append(pa.nulls(len(cvals), pa.int64()))
                out_central.append(ccounts.cast(pa.int64()))
        md5 = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_md5])
        deg = pa.concat_arrays(out_deg)
        names = ["md5", "degree"]
        arrays = [md5, pc.fill_null(deg, 0)]
        if rel_array is not None:
            arrays.append(pc.fill_null(pa.concat_arrays(out_central), 0))
            names.append("central_out")
        return pa.Table.from_arrays(arrays, names=names)

    partials = edges.select_columns(
        ["src_md5", "dst_md5"] + (["relation"] if rel_array is not None else []),
    ).map_batches(_partial, batch_format="pyarrow")
    gb = partials.groupby("md5")
    from ray.data.aggregate import Sum

    aggs = [Sum("degree")]
    if rel_array is not None:
        aggs.append(Sum("central_out"))
    out = gb.aggregate(*aggs)

    def _rename(t: pa.Table) -> pa.Table:
        mapping = {"sum(degree)": "degree", "sum(central_out)": "central_out"}
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return out.map_batches(_rename, batch_format="pyarrow")


def endpoint_ids(edges):
    """Distinct endpoint md5s of an edge Dataset (distributed distinct)."""
    from ..stages.dedup import dedup_exact

    def _local(t: pa.Table) -> pa.Table:
        src = t.column("src_md5")
        dst = t.column("dst_md5")
        both = pa.chunked_array([c for col in (src, dst) for c in col.chunks], type=pa.string())
        u = pc.unique(both.combine_chunks())
        return pa.Table.from_arrays([u], names=["md5"])

    ds = edges.select_columns(["src_md5", "dst_md5"]).map_batches(
        _local, batch_format="pyarrow",
    )
    return dedup_exact(ds, "md5", local_first=False)


def bucketed_semi_join(
    ds,
    key: str,
    keys_ds,
    keys_key: Optional[str] = None,
    anti: bool = False,
    num_buckets: int = 64,
):
    """Distributed semi-join (``anti=False``) / anti-join (``anti=True``).

    Keeps rows of ``ds`` whose ``key`` is (not) present in
    ``keys_ds[keys_key]`` without materializing either side on the driver:
    the key side is projected to marker rows carrying ``ds``'s schema (all
    non-key columns null), both sides gain a ``hash(key) % num_buckets``
    column, and one ``groupby(bucket)`` co-locates them; each bucket then
    runs a single vectorized ``pc.is_in`` membership filter.

    Null keys never match markers: a semi-join drops them, an anti-join
    keeps them.
    """
    keys_key = keys_key or key
    schema = ds.schema()
    if schema is None:
        return ds  # executed-empty schema-less input: both joins keep nothing
    base = getattr(schema, "base_schema", None) or schema
    from ..stages.dedup import add_hash_bucket

    def _data_side(t: pa.Table) -> pa.Table:
        t = t.append_column("_semi", pa.array(np.zeros(t.num_rows, dtype=bool)))
        return add_hash_bucket(t, key, num_buckets)

    def _marker_side(t: pa.Table) -> pa.Table:
        keys = t.column(keys_key)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = pc.unique(pc.drop_null(keys))
        arrays, names = [], []
        for f in base:
            names.append(f.name)
            if f.name == key:
                arrays.append(keys.cast(f.type))
            else:
                arrays.append(pa.nulls(len(keys), f.type))
        out = pa.Table.from_arrays(arrays, names=names)
        out = out.append_column("_semi", pa.array(np.ones(len(keys), dtype=bool)))
        return add_hash_bucket(out, key, num_buckets)

    tagged = ds.map_batches(_data_side, batch_format="pyarrow")
    markers = keys_ds.select_columns([keys_key]).map_batches(
        _marker_side, batch_format="pyarrow",
    )

    def _filter(group: pa.Table) -> pa.Table:
        is_marker = pc.fill_null(group.column("_semi"), False)
        marker_keys = pc.unique(
            group.filter(is_marker).column(key).combine_chunks(),
        )
        data = group.filter(pc.invert(is_marker))
        hit = pc.fill_null(
            pc.is_in(data.column(key), value_set=marker_keys), False,
        )
        if anti:
            hit = pc.invert(hit)
        return data.filter(hit)

    out = tagged.union(markers).groupby("_bucket").map_groups(
        _filter, batch_format="pyarrow",
    )
    return out.drop_columns(["_bucket", "_semi"])


def bucketed_attach(
    ds,
    key: str,
    lookup,
    lookup_key: str,
    value_cols,
    num_buckets: int = 64,
    how: str = "inner",
):
    """Distributed lookup join: attach ``value_cols`` from ``lookup`` to
    every row of ``ds`` by key (``how='inner'`` drops non-matching rows,
    ``how='left'`` keeps them with null values).

    Same bucketed union+groupby shape as :func:`bucketed_semi_join`, but
    each bucket resolves a vectorized ``pc.index_in`` + ``take`` instead of
    a membership filter.  ``lookup`` must be unique on ``lookup_key``.
    """
    if how not in ("inner", "left"):
        raise ValueError(how)
    value_cols = list(value_cols)
    schema = ds.schema()
    base = getattr(schema, "base_schema", None) or schema
    lschema = lookup.schema()
    lbase = getattr(lschema, "base_schema", None) or lschema
    ltypes = {f.name: f.type for f in lbase}
    from ..stages.dedup import add_hash_bucket

    def _data_side(t: pa.Table) -> pa.Table:
        for c in value_cols:
            t = t.append_column(c, pa.nulls(t.num_rows, ltypes[c]))
        t = t.append_column("_lkp", pa.array(np.zeros(t.num_rows, dtype=bool)))
        return add_hash_bucket(t, key, num_buckets)

    def _lookup_side(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for f in base:
            names.append(f.name)
            if f.name == key:
                arrays.append(t.column(lookup_key).combine_chunks().cast(f.type))
            else:
                arrays.append(pa.nulls(t.num_rows, f.type))
        out = pa.Table.from_arrays(arrays, names=names)
        for c in value_cols:
            out = out.append_column(c, t.column(c))
        out = out.append_column("_lkp", pa.array(np.ones(t.num_rows, dtype=bool)))
        return add_hash_bucket(out, key, num_buckets)

    tagged = ds.map_batches(_data_side, batch_format="pyarrow")
    lk = lookup.select_columns([lookup_key] + value_cols).map_batches(
        _lookup_side, batch_format="pyarrow",
    )

    def _attach(group: pa.Table) -> pa.Table:
        is_lkp = group.column("_lkp")
        lkp = group.filter(is_lkp)
        data = group.filter(pc.invert(is_lkp))
        keys_arr = lkp.column(key).combine_chunks()
        idx = pc.index_in(data.column(key), value_set=keys_arr)
        if how == "inner":
            mask = pc.is_valid(idx)
            data = data.filter(mask)
            idx = pc.filter(idx, mask)
        # pc.take propagates null indices as null values (the left join)
        for c in value_cols:
            vals = pc.take(lkp.column(c).combine_chunks(), idx)
            data = data.set_column(
                data.schema.get_field_index(c), c, vals,
            )
        return data

    out = tagged.union(lk).groupby("_bucket").map_groups(
        _attach, batch_format="pyarrow",
    )
    return out.drop_columns(["_bucket", "_lkp"])


def collect_small_key_set(ds, key: str) -> set:
    """Collect ONE key column of a small result Dataset to the driver.

    The sanctioned driver touchpoint for victim/seed sets whose size is
    bounded by construction (degree-1 leaves, isolated list abundances…) —
    the inputs that produced them never leave the cluster.  A narrow
    column scan, never ``take_all`` of wide rows.
    """
    out = set()
    for batch in ds.select_columns([key]).iter_batches(batch_format="pyarrow"):
        out.update(batch.column(key).to_pylist())
    return out
