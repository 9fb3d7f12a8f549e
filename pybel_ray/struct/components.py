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

import logging
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

__all__ = ["connected_components"]


def _snapshot(ds):
    """Materialize ``ds`` and rebind it as a fresh block-ref Dataset.

    ``materialize()`` alone does NOT cut logical-plan lineage: a plan that
    consumes one upstream twice (the label table feeds both sides of the
    pointer-doubling join) embeds that upstream's plan twice, so across
    propagation rounds plan size — and with it per-round planning time —
    grows GEOMETRICALLY (measured 1.7×/round).  Re-wrapping the
    materialized blocks via ``from_arrow_refs`` starts the next round from
    a constant-size plan; block refs stay in the object store, nothing
    moves through the driver.
    """
    import ray.data

    mat = ds.materialize()
    return ray.data.from_arrow_refs(mat.to_arrow_refs())


def connected_components(
    pairs,
    a_col: str = "src_md5",
    b_col: str = "dst_md5",
    max_iters: int = 25,
    num_buckets: int = 64,
    label_blocks: int = 16,
    edge_budget: int = 2_000_000,
    force_distributed: bool = False,
):
    """(id, component) Dataset from an edge-pair Dataset; component = the
    lexicographic-min member id, so labels are deterministic.

    Only edge-endpoint nodes appear in the output (isolated nodes are their
    own components by definition — handle them at the call site).

    Budget hybrid (same shape as ``ops/graph.py`` pagerank/mis/bfs): at
    or under ``edge_budget`` edges the pair list fits one driver
    union-find — identical min-member labels (tested), without the
    per-round exchange overhead that dominates at toy scale.  Above the
    budget (or ``force_distributed=True``) the min-label propagation
    below runs unchanged.
    """
    import ray

    from ..stages.dedup import add_hash_bucket, dedup_exact

    def _drop_null_edges(t: pa.Table) -> pa.Table:
        # rows with a null endpoint drop in BOTH branches (the
        # propagation branch would otherwise crash in the label sort,
        # and the union-find branch must agree with it)
        keep = pc.and_kleene(
            pc.is_valid(t.column(a_col)), pc.is_valid(t.column(b_col)),
        )
        return t.select([a_col, b_col]).filter(keep)

    edges_sel = _snapshot(pairs.select_columns([a_col, b_col]).map_batches(
        _drop_null_edges, batch_format="pyarrow",
    ))
    n_pairs = edges_sel.count()
    if not force_distributed and n_pairs <= edge_budget:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] is not root:
                root = parent[root]
            while parent[x] is not root:
                parent[x], x = root, parent[x]
            return root

        for blk in edges_sel.iter_batches(batch_format="pyarrow"):
            for a, b in zip(
                blk.column(a_col).to_pylist(), blk.column(b_col).to_pylist(),
            ):
                if a is None or b is None:
                    continue
                for v in (a, b):
                    if v not in parent:
                        parent[v] = v
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
        comp_min: dict = {}
        for v in parent:
            r = find(v)
            cur = comp_min.get(r)
            if cur is None or v < cur:
                comp_min[r] = v
        ids = sorted(parent)
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(ids), pa.array([comp_min[find(v)] for v in ids])],
                names=["id", "component"],
            ),
        )
    pairs = edges_sel

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

    topo = _snapshot(pairs.select_columns([a_col, b_col]).map_batches(
        _explode, batch_format="pyarrow",
    ))

    # labels: id -> current component label, initialized to self (distinct)
    def _self_label(t: pa.Table) -> pa.Table:
        ids = t.column("id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays([ids, ids], names=["id", "label"])

    labels = _snapshot(dedup_exact(
        topo.select_columns(["id"]), "id",
    ).map_batches(_self_label, batch_format="pyarrow"))
    sig = _label_signature(labels)

    for round_no in range(max_iters):
        _round_t0 = time.time()
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

        def _min_per_id(t: pa.Table) -> pa.Table:
            # (id, label) rows -> one row per id carrying its min label
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
            out = pa.Table.from_arrays(
                [out_id, out_label], names=["id", "label"],
            )
            # pre-combine (one row per destination id) and re-key on the
            # DESTINATION id's bucket so the min-reduce can group by the
            # int bucket column instead of sort-shuffling string ids
            return add_hash_bucket(_min_per_id(out), "id", num_buckets)

        messages = tagged_topo.union(tagged_labels).groupby("_bucket").map_groups(
            _send, batch_format="pyarrow",
        )

        # 2) min label per node: a bucket holds every message for its ids,
        #    so a bucket-local min is the global min
        def _min_group(group: pa.Table) -> pa.Table:
            return _min_per_id(group.select(["id", "label"]))

        # coalesce to a bounded block count before materializing: union +
        # groupby preserve input block counts, so without this the label
        # table's blocks (and with them per-round fixed costs) grow
        # geometrically round over round
        new_labels = _snapshot(messages.groupby("_bucket").map_groups(
            _min_group, batch_format="pyarrow",
        ).repartition(label_blocks))
        _t_min = time.time() - _round_t0

        # pointer doubling: label := label(label).  One extra bucketed
        # lookup join per round turns O(diameter) convergence into
        # O(log diameter) — a path graph of length 2^k converges in ~k
        # rounds instead of 2^k (labels only ever shrink, so this is safe).
        # Gated to round >= 2: equivalence/orthology classes are near-stars
        # that converge in <=2 plain rounds, so the common case never pays
        # the extra exchange; deep chains start doubling from round 3.
        if round_no >= 2:
            from .degree import bucketed_attach

            lookup = new_labels.map_batches(
                lambda t: t.rename_columns(["lid", "llabel"]),
                batch_format="pyarrow",
            )
            doubled = bucketed_attach(
                new_labels, "label", lookup, "lid", ["llabel"], how="left",
            )

            def _jump(t: pa.Table) -> pa.Table:
                label = pc.coalesce(t.column("llabel"), t.column("label"))
                return pa.Table.from_arrays(
                    [t.column("id").combine_chunks(),
                     label.combine_chunks()
                     if isinstance(label, pa.ChunkedArray) else label],
                    names=["id", "label"],
                )

            new_labels = _snapshot(doubled.map_batches(
                _jump, batch_format="pyarrow",
            ).repartition(label_blocks))

        # convergence: labels only ever shrink, so the (id, label) multiset
        # changes iff ANY label changed — compare an order-independent
        # 50-bit hash signature of the label table against last round's
        # (one tiny per-batch partial + a driver sum; NO extra exchange;
        # false convergence odds ~2^-50 per round)
        _t_dbl = time.time() - _round_t0
        new_sig = _label_signature(new_labels)
        labels = new_labels
        logger.info(
            "connected_components round %d: signature %s -> %s "
            "(%.1fs: min %.1f dbl %.1f sig %.1f)",
            round_no, sig, new_sig, time.time() - _round_t0,
            _t_min, _t_dbl - _t_min, time.time() - _round_t0 - _t_dbl,
        )
        if new_sig == sig:
            return labels.map_batches(
                lambda t: t.rename_columns(["id", "component"]),
                batch_format="pyarrow",
            )
        sig = new_sig
    raise RuntimeError(
        "connected_components did not converge in {} rounds".format(max_iters),
    )


def _label_signature(labels) -> int:
    """Order-independent hash signature of an (id, label) Dataset.

    Per-batch: vectorized row hashes (pandas' uint64 hash) summed with
    wraparound, masked to 50 bits so the driver-side sum of per-batch
    partials stays well inside int64.  Equal multisets always produce
    equal signatures; distinct ones collide with probability ~2^-50.
    """
    import pandas as pd

    def _partial(t: pa.Table) -> pa.Table:
        df = t.select(["id", "label"]).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        s = int(h.sum(dtype=np.uint64) & np.uint64((1 << 50) - 1))
        return pa.Table.from_arrays([pa.array([s], pa.int64())], names=["sig"])

    return int(labels.map_batches(_partial, batch_format="pyarrow").sum("sig") or 0)
