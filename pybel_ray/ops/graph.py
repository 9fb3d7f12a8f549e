"""Generic graph operators over an (src, dst) edge Dataset.

:func:`pagerank` — distributed power iteration in **exact integer
arithmetic**, so results are independent of partitioning, batch layout and
float summation order, and a DuckDB oracle (the same iterations unrolled
as chained CTEs) compares bit-for-bit:

* every node starts at ``scale`` (1e6);
* each iteration a node offers ``rank // outdeg`` along every out-edge
  (floor division — mass loss is deterministic), and
  ``next = (15*scale)//100 + (85 * sum(incoming)) // 100``;
* dangling-node mass simply evaporates (the standard simplified variant).

Scale shape (budget hybrid, same pattern as ``struct/components.py``):
under ``node_budget`` the rank vector lives on the driver as one numpy
array per iteration (O(nodes) driver memory, documented), each iteration
is ONE stateless pass over the edges (per-batch ``pc.index_in`` +
``bincount`` partial sums, only per-batch partials return); above the
budget — or with ``force_distributed=True`` — ranks stay a Dataset and
each iteration is a bucketed lookup join + one ``groupby(dst)`` exchange
+ a bucketed left join back onto the node table.  Both branches produce
identical integers (tested).

The reference engine has no PageRank; this supports the centrality /
hub-scoring step of KG pipelines (compare ``top_hubs``' degree ranking,
``struct/summary.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["edge_nodes", "out_degrees", "pagerank"]


def edge_nodes(edges, src_col: str = "src", dst_col: str = "dst"):
    """Distinct endpoint ids as a (node,) Dataset (one dedup exchange).

    Uses the bucket-sorted exact dedup, NOT ``groupby().map_groups`` —
    map_groups dispatches one Python UDF call per group, which at node
    cardinality (one group per node) dominated pagerank's wall time
    (measured 147k groups ≈ 8 s at sf0.1)."""
    from ..stages.dedup import dedup_exact

    def _local(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            t.column(src_col).combine_chunks(),
            t.column(dst_col).combine_chunks(),
        ])
        return pa.Table.from_arrays([pc.unique(both)], names=["node"])

    local = edges.map_batches(_local, batch_format="pyarrow")
    return dedup_exact(local, "node", local_first=False)


def out_degrees(edges, src_col: str = "src"):
    """(node, outdeg) for every source node: per-batch partial counts →
    one native ``groupby().sum`` (vectorized — see edge_nodes on why not
    map_groups; multi-edges count multiply)."""

    def _partial(t: pa.Table) -> pa.Table:
        src = t.column(src_col).combine_chunks()
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.Table.from_arrays(
            [enc.dictionary, pa.array(cnt.astype(np.int64), pa.int64())],
            names=["node", "outdeg"],
        )

    partial = edges.map_batches(_partial, batch_format="pyarrow")
    out = partial.groupby("node").sum("outdeg")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["outdeg" if c == "sum(outdeg)" else c for c in t.column_names],
        )

    return out.map_batches(_rename, batch_format="pyarrow")


def _snapshot(ds):
    import ray

    return ray.data.from_arrow_refs(ds.materialize().to_arrow_refs())


def pagerank(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
    node_budget: int = 2_000_000,
    force_distributed: bool = False,
    num_buckets: int = 64,
):
    """(node, rank) after ``iters`` integer power iterations (see module
    docstring for the exact recurrence).  ``rank`` sums are int64; with
    ``scale=1e6`` overflow needs > ~9e12 incoming mass per node — beyond
    any realistic graph."""
    import ray

    teleport = (15 * scale) // 100
    edges = _snapshot(edges.select_columns([src_col, dst_col]))
    n_nodes = None
    if not force_distributed:
        n_nodes = edge_nodes(edges, src_col, dst_col).count()
    if force_distributed or n_nodes > node_budget:
        return _pagerank_distributed(
            edges, src_col, dst_col, iters, scale, teleport, num_buckets,
        )

    # ---- broadcast branch: rank vector on the driver -------------------
    # two distributed partial-aggregate drains (node set + out-degrees);
    # both are O(nodes) on the driver, which the budget gate bounds
    deg: dict = {}
    for b in out_degrees(edges, src_col).iter_batches(batch_format="pyarrow"):
        for n_, c_ in zip(b.column("node").to_pylist(),
                          b.column("outdeg").to_pylist()):
            deg[n_] = int(c_)
    node_set: set = set(deg)
    for b in edge_nodes(edges, src_col, dst_col).iter_batches(
        batch_format="pyarrow",
    ):
        node_set.update(b.column("node").to_pylist())

    nodes = np.array(sorted(node_set))
    outdeg = np.array([deg.get(n, 0) for n in nodes], dtype=np.int64)
    safe_deg = np.where(outdeg == 0, 1, outdeg)
    rank = np.full(len(nodes), scale, dtype=np.int64)

    nodes_arr = pa.array(nodes.tolist())
    nodes_ref = ray.put(nodes_arr)
    for _ in range(iters):
        contrib = rank // safe_deg  # dangling rows never matched by edges
        contrib_ref = ray.put(contrib)

        def _partial_in(t: pa.Table, _n=nodes_ref, _c=contrib_ref) -> pa.Table:
            nds = ray.get(_n)
            ctr = ray.get(_c)
            src = t.column(src_col).combine_chunks()
            dst = t.column(dst_col).combine_chunks()
            si = pc.index_in(src, value_set=nds).to_numpy(zero_copy_only=False)
            di = pc.index_in(dst, value_set=nds).to_numpy(zero_copy_only=False)
            sums = np.bincount(di.astype(np.int64),
                               weights=ctr[si.astype(np.int64)].astype(np.float64),
                               minlength=len(nds)).astype(np.int64)
            nz = np.flatnonzero(sums)
            return pa.Table.from_arrays(
                [pa.array(nz, pa.int64()), pa.array(sums[nz], pa.int64())],
                names=["idx", "s"],
            )

        incoming = np.zeros(len(nodes), dtype=np.int64)
        for b in edges.map_batches(
            _partial_in, batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            idx = b.column("idx").to_numpy(zero_copy_only=False)
            s = b.column("s").to_numpy(zero_copy_only=False)
            np.add.at(incoming, idx, s)
        rank = teleport + (85 * incoming) // 100

    return ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array(nodes.tolist()), pa.array(rank, pa.int64())],
        names=["node", "rank"],
    ))


def _pagerank_distributed(
    edges, src_col, dst_col, iters, scale, teleport, num_buckets,
):
    """Ranks stay a Dataset; per iteration: bucketed src-lookup join →
    per-batch partial sums → ``groupby(dst)`` → bucketed left join onto
    the node table."""
    from ..struct.degree import bucketed_attach

    nodes = _snapshot(edge_nodes(edges, src_col, dst_col))
    degs = _snapshot(out_degrees(edges, src_col))

    # rank table starts at scale; carry outdeg alongside to save a join
    ranks = _snapshot(bucketed_attach(
        nodes, "node", degs, "node", ["outdeg"], num_buckets=num_buckets,
        how="left",
    ).map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(t.num_rows, scale, np.int64), pa.int64()),
        ),
        batch_format="pyarrow",
    ))

    for _ in range(iters):
        def _contrib_col(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False)
            d = t.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
            d = np.where(d == 0, 1, d)
            return pa.Table.from_arrays(
                [t.column("node"), pa.array(r // d, pa.int64())],
                names=["node", "contrib"],
            )

        lookup = ranks.map_batches(
            lambda t: _contrib_col(
                t.set_column(
                    t.schema.get_field_index("outdeg"), "outdeg",
                    pc.fill_null(t.column("outdeg"), 1),
                ),
            ),
            batch_format="pyarrow",
        )
        tagged = bucketed_attach(
            edges, src_col, lookup, "node", ["contrib"],
            num_buckets=num_buckets, how="inner",
        )

        def _partial(t: pa.Table) -> pa.Table:
            dst = t.column(dst_col).combine_chunks()
            enc = dst.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64,
            )
            c = t.column("contrib").to_numpy(zero_copy_only=False)
            sums = np.bincount(
                codes, weights=c.astype(np.float64),
                minlength=len(enc.dictionary),
            ).astype(np.int64)
            return pa.Table.from_arrays(
                [enc.dictionary, pa.array(sums, pa.int64())],
                names=["node", "s"],
            )

        def _sum(g: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [
                    g.column("node").slice(0, 1),
                    pa.array([int(pc.sum(g.column("s")).as_py())], pa.int64()),
                ],
                names=["node", "s"],
            )

        incoming = tagged.map_batches(_partial, batch_format="pyarrow") \
            .groupby("node").map_groups(_sum, batch_format="pyarrow")

        joined = bucketed_attach(
            ranks.select_columns(["node", "outdeg"]), "node",
            incoming, "node", ["s"], num_buckets=num_buckets, how="left",
        )

        def _next(t: pa.Table) -> pa.Table:
            s = pc.fill_null(t.column("s"), 0).to_numpy(zero_copy_only=False)
            nxt = teleport + (85 * s.astype(np.int64)) // 100
            return pa.Table.from_arrays(
                [t.column("node"), t.column("outdeg"),
                 pa.array(nxt, pa.int64())],
                names=["node", "outdeg", "rank"],
            )

        ranks = _snapshot(joined.map_batches(_next, batch_format="pyarrow"))

    return ranks.select_columns(["node", "rank"])
