"""Distributed weakly-connected components (min-label propagation).

Reference semantics: ``struct/operations.py:74-96`` (left_outer_join keeps
the components of the right graph touching the left) and the equivalence
collapse survivor classes.  The round-1 engine labelled components with a
driver-side union-find — fine for small relation subsets, fatal when the
component edge set itself is cluster-sized.

Algorithm: min-label propagation.  Every node starts labelled with itself;
each round, every edge endpoint offers its current label to the other
endpoint and nodes take the minimum label seen; converged when no label
changes.  Rounds are O(component diameter) — equivalence/orthology classes
are near-stars, so 2-3 rounds in practice.  Each round costs two bucketed
``groupby`` exchanges over O(E) label-message rows (ids only, never
payloads).  For adversarially deep graphs, raise ``max_iters``; the
function raises if propagation hasn't converged by then rather than
silently returning partial labels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components"]


def connected_components(
    pairs,
    a_col: str = "src_md5",
    b_col: str = "dst_md5",
    max_iters: int = 25,
    num_buckets: int = 64,
):
    """(id, component) Dataset from an edge-pair Dataset; component = the
    lexicographic-min member id, so labels are deterministic.

    Only edge-endpoint nodes appear in the output (isolated nodes are their
    own components by definition — handle them at the call site).
    """
    import ray

    from ..stages.dedup import add_hash_bucket, dedup_exact

    # static (key, neighbor) message topology: each edge contributes both
    # directions; built once, reused every round via materialize
    def _explode(t: pa.Table) -> pa.Table:
        a = t.column(a_col)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        b = t.column(b_col)
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        key = pa.concat_arrays([a, b])
        nbr = pa.concat_arrays([b, a])
        return pa.Table.from_arrays([key, nbr], names=["id", "nbr"])

    topo = pairs.select_columns([a_col, b_col]).map_batches(
        _explode, batch_format="pyarrow",
    ).materialize()

    # labels: id -> current component label, initialized to self (distinct)
    def _self_label(t: pa.Table) -> pa.Table:
        ids = t.column("id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays([ids, ids], names=["id", "label"])

    labels = dedup_exact(
        topo.select_columns(["id"]), "id",
    ).map_batches(_self_label, batch_format="pyarrow").materialize()

    for _ in range(max_iters):
        # 1) attach each node's label to its outgoing messages:
        #    union(topology rows, label rows) grouped by id-bucket; within a
        #    bucket a vectorized dictionary lookup rewrites nbr-messages to
        #    (nbr, label-of-id) rows; label rows pass through as (id, label)
        def _topo_side(t: pa.Table) -> pa.Table:
            return add_hash_bucket(t, "id", num_buckets)

        def _label_side(t: pa.Table) -> pa.Table:
            t = pa.Table.from_arrays(
                [t.column("id"), pa.nulls(t.num_rows, pa.string()),
                 t.column("label")],
                names=["id", "nbr", "label"],
            )
            return add_hash_bucket(t, "id", num_buckets)

        def _widen(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("id"), t.column("nbr"),
                 pa.nulls(t.num_rows, pa.string())],
                names=["id", "nbr", "label"],
            )

        tagged_topo = topo.map_batches(_widen, batch_format="pyarrow").map_batches(
            _topo_side, batch_format="pyarrow",
        )
        tagged_labels = labels.map_batches(_label_side, batch_format="pyarrow")

        def _send(group: pa.Table) -> pa.Table:
            has_label = pc.is_valid(group.column("label"))
            lab = group.filter(has_label)
            msg = group.filter(pc.invert(has_label))
            lab_ids = lab.column("id").combine_chunks()
            lab_vals = lab.column("label").combine_chunks()
            idx = pc.index_in(msg.column("id"), value_set=lab_ids)
            sent = pc.take(lab_vals, idx)
            # messages: (nbr, label-of-id); plus each node keeps its own
            # label in the race for the minimum
            out_id = pa.concat_arrays(
                [msg.column("nbr").combine_chunks(), lab_ids],
            )
            out_label = pa.concat_arrays([
                sent.combine_chunks() if isinstance(sent, pa.ChunkedArray) else sent,
                lab_vals,
            ])
            return pa.Table.from_arrays(
                [out_id, out_label], names=["id", "label"],
            )

        messages = tagged_topo.union(tagged_labels).groupby("_bucket").map_groups(
            _send, batch_format="pyarrow",
        )

        # 2) take the min label per node; count changes vs the old label
        def _local_min(t: pa.Table) -> pa.Table:
            # per-block combiner: one row per id before the exchange
            if t.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], pa.string()), pa.array([], pa.string())],
                    names=["id", "label"],
                )
            t = t.sort_by([("id", "ascending"), ("label", "ascending")])
            ids = t.column("id").combine_chunks()
            codes = ids.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            _, first = np.unique(codes, return_index=True)
            first.sort()
            return t.take(pa.array(first))

        messages = messages.map_batches(_local_min, batch_format="pyarrow")
        new_labels = messages.groupby("id").min("label")

        def _rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                ["id" if c == "id" else "label" for c in t.column_names],
            )

        new_labels = new_labels.map_batches(_rename, batch_format="pyarrow").materialize()

        # convergence: did any label shrink?  join old/new by id-bucket and
        # compare — same bucketed-union shape as above, tiny payload
        def _old_side(t: pa.Table) -> pa.Table:
            t = pa.Table.from_arrays(
                [t.column("id"), t.column("label"),
                 pa.array(np.zeros(t.num_rows, dtype=bool))],
                names=["id", "label", "new"],
            )
            return add_hash_bucket(t, "id", num_buckets)

        def _new_side(t: pa.Table) -> pa.Table:
            t = pa.Table.from_arrays(
                [t.column("id"), t.column("label"),
                 pa.array(np.ones(t.num_rows, dtype=bool))],
                names=["id", "label", "new"],
            )
            return add_hash_bucket(t, "id", num_buckets)

        def _diff(group: pa.Table) -> pa.Table:
            new = group.filter(group.column("new"))
            old = group.filter(pc.invert(group.column("new")))
            idx = pc.index_in(new.column("id"), value_set=old.column("id").combine_chunks())
            old_label = pc.take(old.column("label").combine_chunks(), idx)
            changed = pc.sum(
                pc.cast(pc.not_equal(new.column("label").combine_chunks(), old_label),
                        pa.int64()),
            ).as_py() or 0
            return pa.Table.from_arrays(
                [pa.array([changed], pa.int64())], names=["changed"],
            )

        changed = (
            labels.map_batches(_old_side, batch_format="pyarrow")
            .union(new_labels.map_batches(_new_side, batch_format="pyarrow"))
            .groupby("_bucket").map_groups(_diff, batch_format="pyarrow")
            .sum("changed")
        ) or 0
        labels = new_labels
        if changed == 0:
            return labels.map_batches(
                lambda t: t.rename_columns(["id", "component"]),
                batch_format="pyarrow",
            )
    raise RuntimeError(
        "connected_components did not converge in {} rounds".format(max_iters),
    )
