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

__all__ = [
    "edge_nodes",
    "out_degrees",
    "pagerank",
    "triangle_counts",
    "clustering_coefficients",
    "kcore",
    "bfs_distances",
    "edge_reciprocity",
    "hits",
    "colink_similarity",
    "pagerank_weighted",
    "scc",
    "modularity",
    "degree_assortativity",
    "random_walks",
    "sssp_distances",
    "mis",
    "weighted_random_walks",
    "label_propagation",
]


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
    seeds=None,
):
    """(node, rank) after ``iters`` integer power iterations (see module
    docstring for the exact recurrence).  ``rank`` sums are int64; with
    ``scale=1e6`` overflow needs > ~9e12 incoming mass per node — beyond
    any realistic graph.

    ``seeds`` switches to PERSONALIZED PageRank: the teleport mass lands
    only on the seed nodes (``tele(v) = (15*scale)//100`` for seeds, 0
    otherwise; initial rank ``scale`` for seeds, 0 otherwise) — random
    walks restart at the seed set, so rank measures proximity to it.
    Seeds absent from the graph are ignored.  The seed list ships in
    the closure (small by contract — a handful of trusted hosts, not a
    node table); both branches share the same exact-int64 recurrence so
    a seeded unrolled-SQL oracle stays bit-for-bit."""
    import ray

    teleport = (15 * scale) // 100
    seed_list = sorted(set(seeds)) if seeds is not None else None
    edges = _snapshot(edges.select_columns([src_col, dst_col]))
    # budget gate: edge count (free on the snapshot) as the node-count
    # proxy — probing the exact node count cost its own dedup exchange,
    # ~2 s of pure overhead at toy scale.  nodes <= 2*edges, so gating
    # at node_budget // 2 edges bounds driver state by node_budget
    # exactly (trade: dense graphs with edges >> nodes now take the
    # distributed branch the old probe would have kept on broadcast)
    n_edges = edges.count()
    if force_distributed or n_edges > node_budget // 2:
        return _pagerank_distributed(
            edges, src_col, dst_col, iters, scale, teleport, num_buckets,
            seed_list,
        )

    # ---- broadcast branch: rank vector on the driver -------------------
    # ONE partial-aggregate drain (out-degree + endpoint presence per
    # batch, folded in a driver dict — skipping out_degrees' global
    # groupby(node), whose ~150k-group native aggregate measured ~5 s);
    # O(nodes) driver state, which the budget gate bounds
    deg: dict = {}
    node_set: set = set()

    def _deg_partial(t: pa.Table) -> pa.Table:
        sa = t.column(src_col).combine_chunks()
        da = t.column(dst_col).combine_chunks()
        both = pa.concat_arrays([sa, da])
        enc = both.dictionary_encode()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), np.int64,
        )
        n = t.num_rows
        o = np.bincount(codes[:n], minlength=len(enc.dictionary))
        return pa.Table.from_arrays(
            [enc.dictionary, pa.array(o.astype(np.int64))],
            names=["node", "o"],
        )

    for b in edges.map_batches(
        _deg_partial, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for n_, o_ in zip(b.column("node").to_pylist(),
                          b.column("o").to_pylist()):
            node_set.add(n_)
            if o_:
                deg[n_] = deg.get(n_, 0) + int(o_)

    nodes = np.array(sorted(node_set))
    outdeg = np.array([deg.get(n, 0) for n in nodes], dtype=np.int64)
    safe_deg = np.where(outdeg == 0, 1, outdeg)
    if seed_list is None:
        tvec = np.full(len(nodes), teleport, dtype=np.int64)
        rank = np.full(len(nodes), scale, dtype=np.int64)
    else:
        seed_mask = np.isin(nodes, np.asarray(seed_list))
        tvec = np.where(seed_mask, teleport, 0).astype(np.int64)
        rank = np.where(seed_mask, scale, 0).astype(np.int64)

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
        rank = tvec + (85 * incoming) // 100

    return ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array(nodes.tolist()), pa.array(rank, pa.int64())],
        names=["node", "rank"],
    ))


def _pagerank_distributed(
    edges, src_col, dst_col, iters, scale, teleport, num_buckets,
    seed_list=None,
):
    """Ranks stay a Dataset; per iteration: bucketed src-lookup join →
    per-batch partial sums → ``groupby(dst)`` → bucketed left join onto
    the node table.  ``seed_list`` (personalized teleport) ships in the
    closure and materializes as a per-node ``tele`` column."""
    from ..struct.degree import bucketed_attach

    nodes = _snapshot(edge_nodes(edges, src_col, dst_col))
    degs = _snapshot(out_degrees(edges, src_col))

    seed_arr = pa.array(seed_list) if seed_list is not None else None

    def _init(t: pa.Table) -> pa.Table:
        if seed_arr is None:
            tele = np.full(t.num_rows, teleport, np.int64)
            r0 = np.full(t.num_rows, scale, np.int64)
        else:
            mask = pc.is_in(
                t.column("node"), value_set=seed_arr,
            ).to_numpy(zero_copy_only=False)
            tele = np.where(mask, teleport, 0).astype(np.int64)
            r0 = np.where(mask, scale, 0).astype(np.int64)
        return t.append_column("tele", pa.array(tele, pa.int64())) \
            .append_column("rank", pa.array(r0, pa.int64()))

    # rank table starts at scale (seeds only when personalized); carry
    # outdeg + tele alongside to save joins
    ranks = _snapshot(bucketed_attach(
        nodes, "node", degs, "node", ["outdeg"], num_buckets=num_buckets,
        how="left",
    ).map_batches(_init, batch_format="pyarrow"))

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
            ranks.select_columns(["node", "outdeg", "tele"]), "node",
            incoming, "node", ["s"], num_buckets=num_buckets, how="left",
        )

        def _next(t: pa.Table) -> pa.Table:
            s = pc.fill_null(t.column("s"), 0).to_numpy(zero_copy_only=False)
            tele = t.column("tele").to_numpy(zero_copy_only=False)
            nxt = tele.astype(np.int64) + (85 * s.astype(np.int64)) // 100
            return pa.Table.from_arrays(
                [t.column("node"), t.column("outdeg"), t.column("tele"),
                 pa.array(nxt, pa.int64())],
                names=["node", "outdeg", "tele", "rank"],
            )

        ranks = _snapshot(joined.map_batches(_next, batch_format="pyarrow"))

    return ranks.select_columns(["node", "rank"])


def triangle_counts(
    edges,
    a_col: str = "src",
    b_col: str = "dst",
    broadcast_budget: int = 2_000_000,
    _with_degrees: bool = False,
):
    """Per-node triangle counts ``(node, n_triangles)`` over an
    undirected edge Dataset (self-loops dropped, duplicates collapsed).

    Degree-ordered wedge check — the scale-safe formulation: every
    undirected edge is ORIENTED from its lower-(degree, id) endpoint to
    the higher, which bounds every out-neighborhood by O(√E) however
    skewed the raw degrees, so the wedge expansion (the quadratic step)
    is worker-safe; each triangle is then found exactly once, at its
    lowest-order vertex.  Exchanges: one dedup over canonical pairs,
    one ``groupby(node)`` for degrees, one ``groupby(src)`` for wedges,
    one ``groupby(node)`` for the final counts; the degree table and the
    oriented-edge key set broadcast under ``broadcast_budget`` and fall
    back to the bucketed joins in ``struct/degree.py`` beyond it.

    The reference engine has no triangle counting; this supports the
    clustering-coefficient / community step of the graph-analytics
    family (with :func:`pagerank` and
    :func:`pybel_ray.struct.components.connected_components`).
    """
    import ray

    from ..stages.dedup import dedup_exact
    from .relational import groupby_count

    # 1) canonical undirected pairs (lo, hi), deduped
    def _canon(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), pa.string())
        b = pc.cast(t.column(b_col), pa.string())
        keep = pc.not_equal(a, b)
        a, b = pc.filter(a, keep), pc.filter(b, keep)
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        key = pc.binary_join_element_wise(lo, hi, "\x1f")
        return pa.Table.from_arrays(
            [
                lo if isinstance(lo, pa.Array) else lo.combine_chunks(),
                hi if isinstance(hi, pa.Array) else hi.combine_chunks(),
                key if isinstance(key, pa.Array) else key.combine_chunks(),
            ],
            names=["lo", "hi", "_pair"],
        )

    pairs = dedup_exact(
        edges.select_columns([a_col, b_col]).map_batches(
            _canon, batch_format="pyarrow",
        ),
        "_pair",
    ).drop_columns(["_pair"]).materialize()

    # 2) degrees over both endpoints (per-batch combiner + one groupby)
    def _endpoints(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            t.column("lo").combine_chunks(), t.column("hi").combine_chunks(),
        ])
        return pa.Table.from_arrays([node], names=["node"])

    deg = groupby_count(
        pairs.map_batches(_endpoints, batch_format="pyarrow"), "node", "deg",
    ).materialize()
    deg_tbl = None
    if deg.count() <= broadcast_budget:
        deg_batches = list(deg.iter_batches(batch_format="pyarrow")) or [
            pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["node", "deg"],
            ),
        ]
        deg_tbl = pa.concat_tables(deg_batches).combine_chunks()
        deg_ref = ray.put(deg_tbl)

        # 3) orient each edge lower-(deg, id) -> higher-(deg, id)
        def _orient(t: pa.Table) -> pa.Table:
            m = ray.get(deg_ref)
            keys, degs = m.column("node").combine_chunks(), m.column("deg")
            d_lo = pc.take(degs, pc.index_in(t.column("lo"), value_set=keys))
            d_hi = pc.take(degs, pc.index_in(t.column("hi"), value_set=keys))
            dl = d_lo.to_numpy(zero_copy_only=False)
            dh = d_hi.to_numpy(zero_copy_only=False)
            # lo < hi lexicographically, so ties on degree keep lo first
            fwd = dl <= dh
            lo = t.column("lo").combine_chunks()
            hi = t.column("hi").combine_chunks()
            mask = pa.array(fwd)
            inv = pa.array(~fwd)
            u = pa.concat_arrays([lo.filter(mask), hi.filter(inv)])
            v = pa.concat_arrays([hi.filter(mask), lo.filter(inv)])
            dv = np.r_[dh[fwd], dl[~fwd]]
            return pa.Table.from_arrays(
                [u, v, pa.array(dv, pa.int64())], names=["u", "v", "deg_v"],
            )

        oriented = pairs.map_batches(
            _orient, batch_format="pyarrow",
        ).materialize()
    else:
        # distributed orientation: two bucketed lookup-join exchanges
        # attach deg(lo) and deg(hi), then a stateless vectorized flip.
        from ..struct.degree import bucketed_attach

        def _as(name):
            def _r(t: pa.Table, _n=name) -> pa.Table:
                return t.rename_columns(["node", _n])

            return _r

        deg_lo = deg.map_batches(_as("_d_lo"), batch_format="pyarrow")
        deg_hi = deg.map_batches(_as("_d_hi"), batch_format="pyarrow")
        withdeg = bucketed_attach(
            pairs, "lo", deg_lo, "node", ["_d_lo"], how="inner",
        )
        withdeg = bucketed_attach(
            withdeg, "hi", deg_hi, "node", ["_d_hi"], how="inner",
        )

        def _orient_attached(t: pa.Table) -> pa.Table:
            dl = t.column("_d_lo").to_numpy(zero_copy_only=False)
            dh = t.column("_d_hi").to_numpy(zero_copy_only=False)
            fwd = dl <= dh
            lo = t.column("lo").combine_chunks()
            hi = t.column("hi").combine_chunks()
            mask = pa.array(fwd)
            inv = pa.array(~fwd)
            u = pa.concat_arrays([lo.filter(mask), hi.filter(inv)])
            v = pa.concat_arrays([hi.filter(mask), lo.filter(inv)])
            dv = np.r_[dh[fwd], dl[~fwd]]
            return pa.Table.from_arrays(
                [u, v, pa.array(dv, pa.int64())], names=["u", "v", "deg_v"],
            )

        oriented = withdeg.map_batches(
            _orient_attached, batch_format="pyarrow",
        ).materialize()

    # 4) wedges: per source, pairs of out-neighbors in (deg, id) order
    def _wedges(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] * 3,
                names=["x", "y", "witness"],
            )
        g = g.sort_by([("deg_v", "ascending"), ("v", "ascending")])
        vs = g.column("v").combine_chunks()
        ia, ib = np.triu_indices(n, 1)
        return pa.Table.from_arrays(
            [
                pc.take(vs, pa.array(ia)),
                pc.take(vs, pa.array(ib)),
                pc.take(g.column("u").combine_chunks(),
                        pa.array(np.zeros(len(ia), np.int64))),
            ],
            names=["x", "y", "witness"],
        )

    wedges = oriented.groupby("u").map_groups(_wedges, batch_format="pyarrow")

    # 5) a wedge (x, y) closes iff the oriented edge x->y exists
    def _edge_keys(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t.column("u").combine_chunks(), t.column("v").combine_chunks(),
            "\x1f",
        )
        return pa.Table.from_arrays([key], names=["k"])

    keys_ds = oriented.map_batches(_edge_keys, batch_format="pyarrow")
    n_keys = keys_ds.count()
    if n_keys <= broadcast_budget:
        key_batches = list(keys_ds.iter_batches(batch_format="pyarrow")) or [
            pa.Table.from_arrays([pa.array([], pa.string())], names=["k"]),
        ]
        key_tbl = pa.concat_tables(key_batches).combine_chunks()
        key_ref = ray.put(key_tbl.column("k").combine_chunks())

        def _close(t: pa.Table) -> pa.Table:
            ks = ray.get(key_ref)
            key = pc.binary_join_element_wise(
                t.column("x").combine_chunks(),
                t.column("y").combine_chunks(),
                "\x1f",
            )
            hit = pc.is_in(key, value_set=ks)
            tri = t.filter(hit)
            node = pa.concat_arrays([
                tri.column("x").combine_chunks(),
                tri.column("y").combine_chunks(),
                tri.column("witness").combine_chunks(),
            ])
            return pa.Table.from_arrays([node], names=["node"])

        members = wedges.map_batches(_close, batch_format="pyarrow")
    else:
        # distributed wedge check: one bucketed semi-join exchange of the
        # wedge stream against the oriented-edge key set — wedges and keys
        # co-locate by hash(key) bucket, never on the driver.
        from ..struct.degree import bucketed_semi_join

        def _wedge_key(t: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(
                t.column("x").combine_chunks(),
                t.column("y").combine_chunks(),
                "\x1f",
            )
            return t.append_column(
                "k", key if isinstance(key, pa.Array) else key.combine_chunks(),
            )

        closed = bucketed_semi_join(
            wedges.map_batches(_wedge_key, batch_format="pyarrow"),
            "k", keys_ds, "k",
        )

        def _members(t: pa.Table) -> pa.Table:
            node = pa.concat_arrays([
                t.column("x").combine_chunks(),
                t.column("y").combine_chunks(),
                t.column("witness").combine_chunks(),
            ])
            return pa.Table.from_arrays([node], names=["node"])

        members = closed.map_batches(_members, batch_format="pyarrow")
    counts = groupby_count(members, "node", "n_triangles")
    if not _with_degrees:
        return counts
    return counts, deg, deg_tbl


def clustering_coefficients(
    edges,
    a_col: str = "src",
    b_col: str = "dst",
    broadcast_budget: int = 2_000_000,
):
    """Local clustering coefficient per node: ``cc = 2·T(v) /
    (deg(v)·(deg(v)−1))``, quantized to integer micros
    (``floor(cc·1e6 + 0.5)``) so a SQL oracle compares exactly.

    One row per edge-endpoint node — degree-1 nodes score 0.  Reuses
    the triangle machinery's degree table (no extra pass): the small
    triangle-count table attaches onto the degree Dataset via one
    vectorized broadcast probe.  Returns ``(node, deg, n_triangles,
    cc_e6)``.
    """
    import ray

    counts, deg_ds, _deg_tbl = triangle_counts(
        edges, a_col, b_col, broadcast_budget, _with_degrees=True,
    )
    counts = counts.materialize()
    if counts.count() <= broadcast_budget:
        cnt_batches = list(counts.iter_batches(batch_format="pyarrow")) or [
            pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["node", "n_triangles"],
            ),
        ]
        cnt_tbl = pa.concat_tables(cnt_batches).combine_chunks()
        cnt_ref = ray.put(cnt_tbl)

        def _cc(t: pa.Table) -> pa.Table:
            m = ray.get(cnt_ref)
            idx = pc.index_in(
                t.column("node"), value_set=m.column("node").combine_chunks(),
            )
            tri = pc.fill_null(
                pc.take(m.column("n_triangles").combine_chunks(), idx), 0,
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            return _cc_table(t, tri)

        return deg_ds.map_batches(_cc, batch_format="pyarrow")

    # distributed attach: one bucketed lookup-join exchange of the degree
    # Dataset against the triangle-count Dataset (left join, absent -> 0).
    from ..struct.degree import bucketed_attach

    joined = bucketed_attach(
        deg_ds, "node", counts, "node", ["n_triangles"],
        how="left",
    )

    def _cc_joined(t: pa.Table) -> pa.Table:
        tri = pc.fill_null(t.column("n_triangles"), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return _cc_table(t, tri)

    return joined.map_batches(_cc_joined, batch_format="pyarrow")


def _cc_table(t: pa.Table, tri: "np.ndarray") -> pa.Table:
    """(node, deg, n_triangles, cc_e6) from a degree table + aligned
    per-row triangle counts — shared tail of both cc branches."""
    deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
    denom = deg * (deg - 1)
    cc = np.zeros(len(deg), np.float64)
    ok = denom > 0
    cc[ok] = (2.0 * tri[ok]) / denom[ok]
    q = np.floor(cc * 1e6 + 0.5).astype(np.int64)
    return pa.Table.from_arrays(
        [
            t.column("node"), t.column("deg"),
            pa.array(tri, pa.int64()), pa.array(q, pa.int64()),
        ],
        names=["node", "deg", "n_triangles", "cc_e6"],
    )


def kcore(
    edges,
    a_col: str = "src",
    b_col: str = "dst",
    k: int = 2,
    max_iters: int = 50,
    broadcast_budget: int = 2_000_000,
):
    """k-core subgraph: iteratively peel nodes of undirected degree < k
    until fixpoint.  Returns ``(node, deg)`` for surviving nodes, where
    ``deg`` is the node's degree WITHIN the core (distinct neighbors;
    self-loops dropped, parallel edges collapsed — same conventions as
    :func:`triangle_counts`).

    Distributed shape: each round is one ``groupby(node)`` degree
    exchange (per-batch endpoint combiner) + one stateless broadcast
    anti-filter over the edge Dataset (the REMOVED node set ships via
    ``ray.put``; it is the small side by construction — peeling removes
    a shrinking frontier, never the surviving bulk).  A frontier larger
    than ``broadcast_budget`` (e.g. the first peel round of a web-scale
    host graph) switches that round to two
    :func:`~pybel_ray.struct.degree.bucketed_semi_join` anti-join
    exchanges (one per endpoint column) — same fixpoint, no broadcast.  The edge Dataset
    is re-materialized per round so lineage stays one round deep
    instead of re-executing the whole peel chain.  Rounds are bounded
    by graph structure (≤ the longest peel cascade), not by data size;
    ``max_iters`` guards degenerate chains (a path graph peels from the
    ends inward — O(n) rounds — which at scale wants the
    O(log n)-round semi-external algorithms; documented, not needed for
    KG-shaped graphs).

    The fixpoint is iteration-order independent, so a SQL oracle that
    unrolls ANY sufficient number of peel rounds as chained CTEs
    compares exactly.  The reference engine has no k-core; this joins
    pagerank / components / triangles in the graph-analytics family
    (e.g. dense-subgraph mining over a compiled KG).
    """
    import ray

    from ..stages.dedup import dedup_exact
    from .relational import groupby_count

    def _canon(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), pa.string())
        b = pc.cast(t.column(b_col), pa.string())
        keep = pc.not_equal(a, b)
        a, b = pc.filter(a, keep), pc.filter(b, keep)
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        key = pc.binary_join_element_wise(lo, hi, "\x1f")
        return pa.Table.from_arrays(
            [
                lo if isinstance(lo, pa.Array) else lo.combine_chunks(),
                hi if isinstance(hi, pa.Array) else hi.combine_chunks(),
                key if isinstance(key, pa.Array) else key.combine_chunks(),
            ],
            names=["lo", "hi", "_pair"],
        )

    pairs = dedup_exact(
        edges.select_columns([a_col, b_col]).map_batches(
            _canon, batch_format="pyarrow",
        ),
        "_pair",
    ).drop_columns(["_pair"]).materialize()

    def _endpoints(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            t.column("lo").combine_chunks(), t.column("hi").combine_chunks(),
        ])
        return pa.Table.from_arrays([node], names=["node"])

    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.int64())],
        names=["node", "deg"],
    )
    for _ in range(max_iters):
        deg = groupby_count(
            pairs.map_batches(_endpoints, batch_format="pyarrow"),
            "node", "deg",
        ).materialize()
        bad = deg.filter(expr="deg < {}".format(int(k))).materialize()
        n_bad = bad.count()
        if n_bad == 0:
            return deg
        if deg.count() == n_bad:
            # every remaining node is below k: empty core
            import ray.data as rd

            return rd.from_arrow(empty)
        if n_bad > broadcast_budget:
            # distributed removal: two bucketed anti-join exchanges (one
            # per endpoint column) against the peel frontier — no driver
            # or broadcast copy of the removed set.
            from ..struct.degree import bucketed_semi_join

            stripped = bucketed_semi_join(
                pairs, "lo", bad, "node", anti=True,
            )
            stripped = bucketed_semi_join(
                stripped, "hi", bad, "node", anti=True,
            )
            pairs = stripped.materialize()
            continue
        bad_nodes = pa.concat_tables(
            list(bad.select_columns(["node"]).iter_batches(
                batch_format="pyarrow",
            )),
        ).column("node").combine_chunks()
        bad_ref = ray.put(bad_nodes)

        def _strip(t: pa.Table, _ref=bad_ref) -> pa.Table:
            rm = ray.get(_ref)
            keep = pc.and_(
                pc.invert(pc.is_in(t.column("lo"), value_set=rm)),
                pc.invert(pc.is_in(t.column("hi"), value_set=rm)),
            )
            return t.filter(keep)

        pairs = pairs.map_batches(_strip, batch_format="pyarrow").materialize()
    raise RuntimeError(
        "k-core did not converge within max_iters={} rounds".format(max_iters),
    )


def bfs_distances(
    edges,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 64,
    num_buckets: int | None = None,
    edge_budget: int = 2_000_000,
    force_distributed: bool = False,
):
    """Multi-source BFS distances over a directed edge table: one row
    ``(node, dist)`` per node reachable from any seed within
    ``max_rounds`` hops, ``dist`` = fewest hops from the nearest seed.
    Unreachable nodes emit no row.

    Scale shape — frontier expansion, never whole-graph state on the
    driver: each round runs ONE :func:`bucketed_semi_join` exchange
    (edge rows whose source is in the frontier), a pre-aggregated
    ``distinct`` of the hit destinations, and a bucketed anti-join
    against the visited set; newly reached nodes become the next
    frontier.  BFS settles distances on first touch, so no relaxation
    pass is needed and the loop stops as soon as a frontier comes back
    empty (``rounds ≤ eccentricity``).  The visited/frontier tables
    hold one short row per REACHED node and are re-materialized per
    round (the per-round count is the only driver-side value).

    For all-pairs reachability labels use
    :func:`pybel_ray.struct.components.connected_components` instead —
    this operator is the seeded variant (crawl-depth analysis,
    link-distance features).
    """
    import ray
    import ray.data

    from ..struct.degree import bucketed_semi_join
    from .relational import distinct_values

    seed_list = sorted(set(seeds))
    if not seed_list:
        raise ValueError("bfs_distances: empty seed set")
    seed_arr = pa.array(seed_list)
    visited = ray.data.from_arrow(
        pa.Table.from_arrays(
            [seed_arr, pa.array(np.zeros(len(seed_arr), np.int64))],
            names=["node", "dist"],
        ),
    ).materialize()
    frontier = visited.select_columns(["node"])
    # snapshot the narrow edge projection once: every round's semi-join
    # would otherwise re-execute the full upstream lineage
    pruned = _snapshot(edges.select_columns([src_col, dst_col]))
    n_edges = pruned.count()

    if not force_distributed and n_edges <= edge_budget:
        # budget branch (same shape as pagerank/mis): at or under the
        # edge budget one adjacency dict beats ~3 exchanges per round
        # of pure scheduling overhead; identical distances (tested)
        adj: dict = {}
        for b in pruned.iter_batches(batch_format="pyarrow"):
            for s_v, d_v in zip(
                b.column(src_col).to_pylist(),
                b.column(dst_col).to_pylist(),
            ):
                if s_v is not None and d_v is not None:
                    adj.setdefault(s_v, []).append(d_v)
        dist = {x: 0 for x in seed_list}
        front = list(dist)
        for r in range(1, max_rounds + 1):
            nxt = []
            for u in front:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = r
                        nxt.append(v)
            if not nxt:
                break
            front = nxt
        ks = sorted(dist)
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(ks),
                 pa.array([dist[x] for x in ks], pa.int64())],
                names=["node", "dist"],
            ),
        )

    if num_buckets is None:
        # size each round's exchanges to the data — a 64-task exchange
        # on kilobytes is pure scheduling (same rule as equi_join)
        num_buckets = max(1, min(64, n_edges // 100_000 + 1))
    for r in range(1, max_rounds + 1):
        hit = bucketed_semi_join(
            pruned, src_col, frontier, "node", num_buckets=num_buckets,
        )

        def _as_node(t: pa.Table) -> pa.Table:
            c = t.column(dst_col)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return pa.Table.from_arrays([c.drop_null()], names=["node"])

        cand = distinct_values(
            hit.map_batches(_as_node, batch_format="pyarrow"), "node",
        ).materialize()
        # a dead-ended frontier yields zero candidates (and an empty
        # dataset loses its schema, which the bucketed join needs)
        if cand.count() == 0:
            break
        new_nodes = bucketed_semi_join(
            cand, "node", visited.select_columns(["node"]), "node",
            anti=True, num_buckets=num_buckets,
        ).materialize()
        if new_nodes.count() == 0:
            break

        def _with_dist(t: pa.Table, _r=r) -> pa.Table:
            return t.append_column(
                "dist", pa.array(np.full(t.num_rows, _r, np.int64)),
            )

        reached = new_nodes.map_batches(_with_dist, batch_format="pyarrow")
        visited = visited.union(reached).materialize()
        frontier = new_nodes
    return visited


def edge_reciprocity(
    edges, src_col: str = "src", dst_col: str = "dst",
) -> pa.Table:
    """Directed-graph reciprocity: of the distinct non-loop edges
    ``(a, b)``, how many have the reverse edge ``(b, a)``?  Returns one
    row ``(n_edges, n_recip, recip_ppm)`` with
    ``recip_ppm = n_recip * 1_000_000 // n_edges`` (0 when empty) —
    the link-farm / mutual-citation signal on a web host graph.

    Scale shape: dedup to distinct pairs (per-batch local unique +
    the bucketed exact dedup), then ONE bucketed semi-join of the
    forward key against the reversed key — edges never collect on the
    driver; only the two counters do.
    """
    from ..stages.dedup import dedup_exact
    from ..struct.degree import bucketed_semi_join

    sep = "\x1f"

    def _keys(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(src_col), pa.string())
        d = pc.cast(t.column(dst_col), pa.string())
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(s), pc.is_valid(d)),
            pc.invert(pc.equal(s, d)),
        )
        t = pa.Table.from_arrays([s, d], names=["_s", "_d"]).filter(keep)
        t = t.append_column(
            "_fwd", pc.binary_join_element_wise(
                t.column("_s"), t.column("_d"), sep,
            ),
        )
        return t.append_column(
            "_rev", pc.binary_join_element_wise(
                t.column("_d"), t.column("_s"), sep,
            ),
        )

    keyed = edges.select_columns([src_col, dst_col]).map_batches(
        _keys, batch_format="pyarrow",
    )
    distinct = dedup_exact(keyed, "_fwd").materialize()
    n_edges = distinct.count()
    n_recip = bucketed_semi_join(
        distinct, "_fwd", distinct, "_rev",
    ).count() if n_edges else 0
    ppm = n_recip * 1_000_000 // n_edges if n_edges else 0
    return pa.Table.from_arrays(
        [pa.array([n_edges], pa.int64()), pa.array([n_recip], pa.int64()),
         pa.array([ppm], pa.int64())],
        names=["n_edges", "n_recip", "recip_ppm"],
    )


def hits(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
    node_budget: int = 2_000_000,
    force_distributed: bool = False,
    num_buckets: int = 64,
):
    """HITS hubs/authorities in **exact integer arithmetic** —
    ``(node, hub, auth)`` after ``iters`` iterations.

    Recurrence (the DuckDB oracle unrolls it term-for-term):

    * ``hub0 = scale`` for every node;
    * ``raw_a(v) = sum over edges (u, v) of hub(u)`` (parallel edges
      each contribute; no in-edges → 0);
    * ``auth(v) = raw_a(v) // max(1, max_raw_a // scale)``;
    * ``raw_h(u) = sum over edges (u, v) of auth(v)``;
    * ``hub(u) = raw_h(u) // max(1, max_raw_h // scale)``.

    Normalizing by the (exact, single-scalar) **max** instead of the L2
    norm keeps every step int64: scores stay ~``scale`` so the partial
    sums overflow only past ~9e12 weighted in-degree.  Results are
    independent of partitioning and batch layout.

    Scale shape mirrors :func:`pagerank`'s budget hybrid: under
    ``node_budget`` the two score vectors live on the driver (O(nodes)
    driver memory) and each half-iteration is ONE stateless pass over
    the edges (per-batch ``pc.index_in`` + ``bincount`` partials);
    above it scores stay a Dataset and each half-iteration is a
    bucketed lookup join + one ``groupby`` exchange + a bucketed left
    join back onto the node table (only the max scalar reaches the
    driver).  Both branches produce identical integers (tested).

    The reference engine has no HITS; this is the link-analysis
    companion to :func:`pagerank` for crawl-graph hub scoring.
    """
    import ray

    edges = _snapshot(edges.select_columns([src_col, dst_col]))
    # budget gate: snapshot edge count at node_budget // 2 bounds
    # driver node state by node_budget (nodes <= 2*edges) — same
    # rationale and trade as pagerank
    if force_distributed or edges.count() > node_budget // 2:
        return _hits_distributed(
            edges, src_col, dst_col, iters, scale, num_buckets,
        )

    node_set: set = set()
    for b in edges.map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.unique(pa.concat_arrays([
                t.column(src_col).combine_chunks(),
                t.column(dst_col).combine_chunks(),
            ]))], names=["node"],
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        node_set.update(b.column("node").to_pylist())
    nodes = sorted(node_set)
    nodes_arr = pa.array(nodes)
    nodes_ref = ray.put(nodes_arr)

    def _propagate(score: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """One edge pass: raw(to) = sum of score(from) over edges."""
        score_ref = ray.put(score)

        def _partial(t: pa.Table, _n=nodes_ref, _s=score_ref) -> pa.Table:
            nds = ray.get(_n)
            sc = ray.get(_s)
            f = t.column(from_col).combine_chunks()
            to = t.column(to_col).combine_chunks()
            fi = pc.index_in(f, value_set=nds).to_numpy(zero_copy_only=False)
            ti = pc.index_in(to, value_set=nds).to_numpy(zero_copy_only=False)
            sums = np.bincount(
                ti.astype(np.int64),
                weights=sc[fi.astype(np.int64)].astype(np.float64),
                minlength=len(nds),
            ).astype(np.int64)
            nz = np.flatnonzero(sums)
            return pa.Table.from_arrays(
                [pa.array(nz, pa.int64()), pa.array(sums[nz], pa.int64())],
                names=["idx", "s"],
            )

        raw = np.zeros(len(nodes), dtype=np.int64)
        for b in edges.map_batches(
            _partial, batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            idx = b.column("idx").to_numpy(zero_copy_only=False)
            s = b.column("s").to_numpy(zero_copy_only=False)
            np.add.at(raw, idx, s)
        return raw

    hub = np.full(len(nodes), scale, dtype=np.int64)
    auth = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        raw_a = _propagate(hub, src_col, dst_col)
        auth = raw_a // max(1, int(raw_a.max(initial=0)) // scale)
        raw_h = _propagate(auth, dst_col, src_col)
        hub = raw_h // max(1, int(raw_h.max(initial=0)) // scale)

    return ray.data.from_arrow(pa.Table.from_arrays(
        [nodes_arr, pa.array(hub, pa.int64()), pa.array(auth, pa.int64())],
        names=["node", "hub", "auth"],
    ))


def _hits_distributed(edges, src_col, dst_col, iters, scale, num_buckets):
    """Scores stay a Dataset; per half-iteration: bucketed from-side
    lookup join → per-batch partial sums keyed on the to-side →
    ``groupby`` → bucketed left join onto the node table; the max
    normalizer is the only scalar fetched."""
    from ..struct.degree import bucketed_attach

    nodes = _snapshot(edge_nodes(edges, src_col, dst_col))

    def _const(name, val):
        def _f(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("node"),
                 pa.array(np.full(t.num_rows, val, np.int64), pa.int64())],
                names=["node", name],
            )
        return _f

    def _propagate(scores, score_col, from_col, to_col, out_col):
        tagged = bucketed_attach(
            edges, from_col, scores, "node", [score_col],
            num_buckets=num_buckets, how="inner",
        )

        def _partial(t: pa.Table) -> pa.Table:
            to = t.column(to_col).combine_chunks()
            enc = to.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64,
            )
            c = t.column(score_col).to_numpy(zero_copy_only=False)
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

        raw = _snapshot(
            bucketed_attach(
                nodes, "node",
                tagged.map_batches(_partial, batch_format="pyarrow")
                    .groupby("node").map_groups(_sum, batch_format="pyarrow"),
                "node", ["s"], num_buckets=num_buckets, how="left",
            ).map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("node"), pc.fill_null(t.column("s"), 0)],
                    names=["node", "s"],
                ),
                batch_format="pyarrow",
            ),
        )
        mx = raw.max("s") or 0
        q = max(1, int(mx) // scale)

        def _norm(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_arrays(
                [t.column("node"), pa.array(s // q, pa.int64())],
                names=["node", out_col],
            )

        return _snapshot(raw.map_batches(_norm, batch_format="pyarrow"))

    hub = _snapshot(
        nodes.map_batches(_const("hub", scale), batch_format="pyarrow"),
    )
    auth = None
    for _ in range(iters):
        auth = _propagate(hub, "hub", src_col, dst_col, "auth")
        hub = _propagate(auth, "auth", dst_col, src_col, "hub")

    return bucketed_attach(
        hub, "node", auth, "node", ["auth"], num_buckets=num_buckets,
        how="left",
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("node"), t.column("hub"),
             pc.fill_null(t.column("auth"), 0)],
            names=["node", "hub", "auth"],
        ),
        batch_format="pyarrow",
    )


def colink_similarity(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    min_shared: int = 2,
    max_group: int = 100_000,
    num_buckets: int = 64,
):
    """Co-citation similarity: source pairs ``(a < b)`` that link to at
    least ``min_shared`` common distinct targets, with the exact Jaccard
    of their distinct out-link sets in integer micros —
    ``(src_a, src_b, shared, deg_a, deg_b, jaccard_micros)``.

    This is the "related hosts / related pages" primitive of web-graph
    analysis (SimRank's first iteration): two hosts are similar when
    their out-link sets overlap.

    Scale shape: distinct ``(src, dst)`` edges first (ONE bucketed
    dedup — pair generation is per distinct target, so parallel edges
    never inflate it); candidate pairs are generated per ``dst`` group
    (payload = the target's in-degree; groups above ``max_group``
    sources are dropped WITH A LOGGED COUNT — the standard mega-hub cap,
    same policy as the LSH band buckets); per-batch partial pair counts
    → ONE ``groupby`` exchange; out-degrees attach via two bucketed
    lookup joins.  Texts/urls beyond the key columns never move.

    Exact (= the DuckDB self-join oracle) whenever no target exceeds
    ``max_group``.
    """
    import logging

    from ..stages.dedup import dedup_exact
    from ..struct.degree import bucketed_attach
    from ._kernels import runlength_distinct_counts

    sep = "\x1f"

    def _key(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(src_col), pa.string())
        d = pc.cast(t.column(dst_col), pa.string())
        keep = pc.and_kleene(pc.is_valid(s), pc.is_valid(d))
        t = pa.Table.from_arrays([s, d], names=["_s", "_d"]).filter(keep)
        return t.append_column(
            "_k", pc.binary_join_element_wise(
                t.column("_s"), t.column("_d"), sep,
            ),
        )

    distinct = dedup_exact(
        edges.select_columns([src_col, dst_col]).map_batches(
            _key, batch_format="pyarrow",
        ),
        "_k", num_buckets=num_buckets,
    ).select_columns(["_s", "_d"]).materialize()

    deg = distinct.groupby("_s").count().map_batches(
        lambda t: t.rename_columns(["node", "outdeg"]),
        batch_format="pyarrow",
    )

    def _pairs(g: pa.Table) -> pa.Table:
        srcs = np.sort(
            g.column("_s").to_numpy(zero_copy_only=False).astype(object),
        )
        n = len(srcs)
        if n > max_group:
            logging.getLogger(__name__).warning(
                "colink_similarity: dropping target %r with %d sources"
                " (max_group=%d)", g.column("_d")[0].as_py(), n, max_group,
            )
            n = 0
        if n < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string())],
                names=["src_a", "src_b"],
            )
        ia, ib = np.triu_indices(n, k=1)
        return pa.Table.from_arrays(
            [pa.array(srcs[ia], pa.string()), pa.array(srcs[ib], pa.string())],
            names=["src_a", "src_b"],
        )

    pairs = distinct.groupby("_d").map_groups(_pairs, batch_format="pyarrow")

    # per-batch run-length partials, then the one (src_a, src_b) exchange
    def _partial(t: pa.Table) -> pa.Table:
        a = t.column("src_a").combine_chunks()
        b = t.column("src_b").combine_chunks()
        take, counts = runlength_distinct_counts([a, b])
        return pa.Table.from_arrays(
            [pc.take(a, take), pc.take(b, take),
             pa.array(counts, pa.int64())],
            names=["src_a", "src_b", "n"],
        )

    partial = pairs.map_batches(_partial, batch_format="pyarrow")

    def _sum(g: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                g.column("src_a").slice(0, 1),
                g.column("src_b").slice(0, 1),
                pa.array([int(pc.sum(g.column("n")).as_py())], pa.int64()),
            ],
            names=["src_a", "src_b", "shared"],
        )

    def _pairkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pk", pc.binary_join_element_wise(
                t.column("src_a"), t.column("src_b"), sep,
            ),
        )

    shared = partial.map_batches(_pairkey, batch_format="pyarrow") \
        .groupby("_pk").map_groups(_sum, batch_format="pyarrow") \
        .filter(lambda r: r["shared"] >= min_shared)

    out = bucketed_attach(
        bucketed_attach(
            shared, "src_a", deg, "node", ["outdeg"],
            num_buckets=num_buckets, how="inner",
        ).map_batches(
            lambda t: t.rename_columns(
                ["src_a", "src_b", "shared", "deg_a"],
            ),
            batch_format="pyarrow",
        ),
        "src_b", deg, "node", ["outdeg"],
        num_buckets=num_buckets, how="inner",
    ).map_batches(
        lambda t: t.rename_columns(
            ["src_a", "src_b", "shared", "deg_a", "deg_b"],
        ),
        batch_format="pyarrow",
    )

    def _jaccard(t: pa.Table) -> pa.Table:
        s = t.column("shared").to_numpy(zero_copy_only=False).astype(np.int64)
        da = t.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = t.column("deg_b").to_numpy(zero_copy_only=False).astype(np.int64)
        union = da + db - s
        jm = (s * 1_000_000) // np.where(union == 0, 1, union)
        return t.append_column("jaccard_micros", pa.array(jm, pa.int64()))

    return out.map_batches(_jaccard, batch_format="pyarrow")


def pagerank_weighted(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iters: int = 3,
    scale: int = 1_000_000,
    node_budget: int = 2_000_000,
    force_distributed: bool = False,
    num_buckets: int = 64,
):
    """Weighted PageRank in exact integer arithmetic: each out-edge
    carries ``rank(u) * w(e) // W(u)`` where ``W(u)`` is u's total
    out-weight (weights must be positive int64);
    ``next = (15*scale)//100 + (85*sum(incoming))//100`` as in
    :func:`pagerank`.  Every step is int64 (overflow needs
    ``total_mass × max_weight`` past ~9e18 — document per corpus);
    results are layout-invariant and the DuckDB oracle unrolls the
    identical per-edge floor-division recurrence.

    Same budget hybrid as :func:`pagerank`: driver rank vector under
    ``node_budget`` (one stateless edge pass per iteration), bucketed
    join + one groupby exchange per iteration above it.
    """
    import ray

    teleport = (15 * scale) // 100
    edges = _snapshot(edges.select_columns([src_col, dst_col, weight_col]))
    # budget gate: snapshot edge count at node_budget // 2 bounds
    # driver node state by node_budget (nodes <= 2*edges) — same
    # rationale and trade as pagerank
    if force_distributed or edges.count() > node_budget // 2:
        return _pagerank_weighted_distributed(
            edges, src_col, dst_col, weight_col, iters, scale, teleport,
            num_buckets,
        )

    # ---- broadcast branch ----------------------------------------------
    def _wdeg(t: pa.Table) -> pa.Table:
        src = t.column(src_col).combine_chunks()
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.bincount(codes, weights=w.astype(np.float64),
                           minlength=len(enc.dictionary)).astype(np.int64)
        return pa.Table.from_arrays(
            [enc.dictionary, pa.array(sums, pa.int64())],
            names=["node", "wdeg"],
        )

    # ONE partial drain: per-batch weighted-degree partials (plus dst
    # presence) fold in a driver dict — no global groupby, no separate
    # node-set dedup exchange
    wdeg_map: dict = {}
    node_set: set = set()
    for b in edges.map_batches(_wdeg, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for n_, s_ in zip(b.column("node").to_pylist(),
                          b.column("wdeg").to_pylist()):
            if s_:
                wdeg_map[n_] = wdeg_map.get(n_, 0) + int(s_)
            node_set.add(n_)
    for b in edges.select_columns([dst_col]).map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.unique(t.column(dst_col).combine_chunks())],
            names=["node"],
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        node_set.update(b.column("node").to_pylist())
    nodes = sorted(node_set)
    W = np.array([max(wdeg_map.get(n, 0), 1) for n in nodes], np.int64)
    rank = np.full(len(nodes), scale, dtype=np.int64)
    nodes_ref = ray.put(pa.array(nodes))

    for _ in range(iters):
        state_ref = ray.put((rank, W))

        def _partial(t: pa.Table, _n=nodes_ref, _s=state_ref) -> pa.Table:
            nds = ray.get(_n)
            rk, wd = ray.get(_s)
            src = t.column(src_col).combine_chunks()
            dst = t.column(dst_col).combine_chunks()
            si = pc.index_in(src, value_set=nds) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            di = pc.index_in(dst, value_set=nds) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            w = t.column(weight_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            contrib = rk[si] * w // wd[si]
            sums = np.bincount(di, weights=contrib.astype(np.float64),
                               minlength=len(nds)).astype(np.int64)
            nz = np.flatnonzero(sums)
            return pa.Table.from_arrays(
                [pa.array(nz, pa.int64()), pa.array(sums[nz], pa.int64())],
                names=["idx", "s"],
            )

        incoming = np.zeros(len(nodes), dtype=np.int64)
        for b in edges.map_batches(
            _partial, batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            idx = b.column("idx").to_numpy(zero_copy_only=False)
            s = b.column("s").to_numpy(zero_copy_only=False)
            np.add.at(incoming, idx, s)
        rank = teleport + (85 * incoming) // 100

    return ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array(nodes), pa.array(rank, pa.int64())],
        names=["node", "rank"],
    ))


def _pagerank_weighted_distributed(
    edges, src_col, dst_col, weight_col, iters, scale, teleport, num_buckets,
):
    """Dataset-resident ranks: per iteration one bucketed (rank, W)
    lookup onto the edges, per-batch weighted partial sums, one
    ``groupby(dst)`` exchange, one bucketed left join back."""
    from ..struct.degree import bucketed_attach

    nodes = _snapshot(edge_nodes(edges, src_col, dst_col))

    def _wdeg(t: pa.Table) -> pa.Table:
        src = t.column(src_col).combine_chunks()
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.bincount(codes, weights=w.astype(np.float64),
                           minlength=len(enc.dictionary)).astype(np.int64)
        return pa.Table.from_arrays(
            [enc.dictionary, pa.array(sums, pa.int64())],
            names=["node", "wdeg"],
        )

    wdeg = edges.map_batches(_wdeg, batch_format="pyarrow") \
        .groupby("node").sum("wdeg").map_batches(
            lambda t: t.rename_columns(
                ["wdeg" if c == "sum(wdeg)" else c for c in t.column_names],
            ),
            batch_format="pyarrow",
        )

    ranks = _snapshot(bucketed_attach(
        nodes, "node", wdeg, "node", ["wdeg"], num_buckets=num_buckets,
        how="left",
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("node"),
             pc.fill_null(t.column("wdeg"), 1),
             pa.array(np.full(t.num_rows, scale, np.int64), pa.int64())],
            names=["node", "wdeg", "rank"],
        ),
        batch_format="pyarrow",
    ))

    for _ in range(iters):
        tagged = bucketed_attach(
            edges, src_col, ranks, "node", ["rank", "wdeg"],
            num_buckets=num_buckets, how="inner",
        )

        def _partial(t: pa.Table) -> pa.Table:
            dst = t.column(dst_col).combine_chunks()
            enc = dst.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64,
            )
            rk = t.column("rank").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            wd = np.maximum(
                t.column("wdeg").to_numpy(zero_copy_only=False)
                .astype(np.int64), 1,
            )
            w = t.column(weight_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            contrib = rk * w // wd
            sums = np.bincount(codes, weights=contrib.astype(np.float64),
                               minlength=len(enc.dictionary)).astype(np.int64)
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
            ranks.select_columns(["node", "wdeg"]), "node",
            incoming, "node", ["s"], num_buckets=num_buckets, how="left",
        )

        def _next(t: pa.Table) -> pa.Table:
            s = pc.fill_null(t.column("s"), 0).to_numpy(zero_copy_only=False)
            nxt = teleport + (85 * s.astype(np.int64)) // 100
            return pa.Table.from_arrays(
                [t.column("node"), t.column("wdeg"),
                 pa.array(nxt, pa.int64())],
                names=["node", "wdeg", "rank"],
            )

        ranks = _snapshot(joined.map_batches(_next, batch_format="pyarrow"))

    return ranks.select_columns(["node", "rank"])


def _tarjan_scc(adj: dict) -> dict:
    """Iterative Tarjan over a driver-side adjacency dict — returns
    ``node -> scc label`` with the label = lexicographic-min member.
    Explicit stack (no recursion limit)."""
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    out: dict = {}
    counter = [0]

    for root in adj:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            nbrs = adj.get(v, ())
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            else:
                work[-1] = (v, len(nbrs))
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                label = min(comp)
                for w in comp:
                    out[w] = label
    return out


def scc(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    edge_budget: int = 2_000_000,
    force_distributed: bool = False,
    max_outer_rounds: int = 64,
    max_prop_rounds: int = 64,
):
    """Strongly connected components of a directed edge table: one row
    ``(node, scc)`` per edge-endpoint node, ``scc`` = the
    lexicographic-min member (deterministic).  Isolated nodes are their
    own SCCs by definition — handle them at the call site (same
    contract as :func:`~pybel_ray.struct.components.connected_components`).

    Budget hybrid (the same shape as :func:`pagerank` /
    ``near_dedup_corpus``): a distinct-edge set at or under
    ``edge_budget`` drains to the driver for ITERATIVE Tarjan (exact,
    O(V+E), no recursion limit); above the budget the distributed
    forward-backward COLORING algorithm runs — per outer round,
    (1) min-ancestor colors propagate along edge direction to fixpoint
    (one bucketed join + one groupby exchange per hop), (2) every color
    root back-reaches through its own color class simultaneously
    (bucketed semi/anti frontier joins, the :func:`bfs_distances`
    shape), (3) the reached sets are exactly the roots' SCCs — assigned,
    removed, repeat.  Both branches are tested identical.  Worst case
    is ``max_outer_rounds`` for chain-of-SCCs topologies (raises rather
    than returning partial labels); web-ish graphs finish in a few
    rounds because every color class retires its root SCC per round.
    """
    import ray.data

    from ..struct.degree import bucketed_semi_join
    from .relational import distinct_values, equi_join, groupby_agg, groupby_count

    dedup = _snapshot(groupby_count(
        edges.select_columns([src_col, dst_col]), [src_col, dst_col],
    ).select_columns([src_col, dst_col]))

    n_edges = dedup.count()
    if n_edges == 0:
        sch = edges.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}
        nt = types.get(src_col, pa.string())
        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array([], nt), pa.array([], nt)], names=["node", "scc"],
        ))

    if not force_distributed and n_edges <= edge_budget:
        adj: dict = {}
        for b in dedup.iter_batches(batch_format="pyarrow"):
            for s, d in zip(b.column(src_col).to_pylist(),
                            b.column(dst_col).to_pylist()):
                adj.setdefault(s, []).append(d)
                adj.setdefault(d, [])
        labels = _tarjan_scc(adj)
        nodes = sorted(labels)
        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array(nodes), pa.array([labels[n] for n in nodes])],
            names=["node", "scc"],
        ))

    # ---- distributed branch: forward-backward coloring ----------------
    def _finish(parts):
        return _snapshot(parts[0].union(*parts[1:])
                         if len(parts) > 1 else parts[0])

    remaining = _snapshot(edge_nodes(dedup, src_col, dst_col))
    active = dedup
    parts = []
    for _outer in range(max_outer_rounds):
        if remaining.count() == 0:
            return _finish(parts)
        if active.count() == 0:
            # no edges left: every remaining node is a singleton SCC
            parts.append(remaining.map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("node"), t.column("node")],
                    names=["node", "scc"],
                ),
                batch_format="pyarrow",
            ))
            return _finish(parts)

        # (1) color = min node id that can reach you (along edges)
        colors = _snapshot(remaining.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), t.column("node")],
                names=["node", "color"],
            ),
            batch_format="pyarrow",
        ))
        for _hop in range(max_prop_rounds):
            msg = equi_join(
                active,
                colors.map_batches(
                    lambda t: t.rename_columns(["cnode", "color"]),
                    batch_format="pyarrow",
                ),
                on=src_col, right_on="cnode",
            )
            inc = groupby_agg(
                msg.select_columns([dst_col, "color"]),
                dst_col, {"mincol": ("min", "color")},
            )
            upd = equi_join(
                colors, inc, on="node", right_on=dst_col, how="left",
            )

            def _merge(t: pa.Table) -> pa.Table:
                new = pc.min_element_wise(
                    t.column("color"),
                    pc.coalesce(t.column("mincol"), t.column("color")),
                )
                chg = pc.sum(pc.cast(
                    pc.less(new, t.column("color")), pa.int64(),
                )).as_py() or 0
                return pa.Table.from_arrays(
                    [t.column("node"),
                     new.combine_chunks()
                     if isinstance(new, pa.ChunkedArray) else new,
                     pa.array(np.full(t.num_rows, chg, np.int64))],
                    names=["node", "color", "_chg"],
                )

            merged = _snapshot(upd.map_batches(_merge, batch_format="pyarrow"))
            changed = int(merged.max("_chg") or 0)
            colors = _snapshot(merged.drop_columns(["_chg"]))
            if changed == 0:
                break
        else:
            raise RuntimeError(
                "scc: color propagation did not converge within "
                "max_prop_rounds; raise the bound",
            )

        # (2) mono-colored edges; back-reach from the roots
        e1 = equi_join(
            active,
            colors.map_batches(
                lambda t: t.rename_columns(["n1", "c1"]),
                batch_format="pyarrow",
            ),
            on=src_col, right_on="n1",
        )
        e2 = equi_join(
            e1,
            colors.map_batches(
                lambda t: t.rename_columns(["n2", "c2"]),
                batch_format="pyarrow",
            ),
            on=dst_col, right_on="n2",
        )
        mono = _snapshot(e2.map_batches(
            lambda t: t.filter(pc.equal(t.column("c1"), t.column("c2")))
            .select([src_col, dst_col]),
            batch_format="pyarrow",
        ))
        visited = _snapshot(colors.map_batches(
            lambda t: t.filter(pc.equal(t.column("node"),
                                        t.column("color"))),
            batch_format="pyarrow",
        ))
        frontier = visited.select_columns(["node"])
        for _hop in range(max_prop_rounds + 1):
            hit = bucketed_semi_join(mono, dst_col, frontier, "node")
            cand = distinct_values(
                hit.map_batches(
                    lambda t: pa.Table.from_arrays(
                        [t.column(src_col)], names=["node"],
                    ),
                    batch_format="pyarrow",
                ),
                "node",
            ).materialize()
            if cand.count() == 0:
                break
            new_nodes = bucketed_semi_join(
                cand, "node", visited.select_columns(["node"]), "node",
                anti=True,
            ).materialize()
            if new_nodes.count() == 0:
                break
            reached = equi_join(new_nodes, colors, on="node")
            visited = _snapshot(visited.union(reached))
            frontier = new_nodes
        else:
            raise RuntimeError(
                "scc: back-reach did not converge within max_prop_rounds",
            )

        parts.append(_snapshot(visited.map_batches(
            lambda t: t.rename_columns(["node", "scc"]),
            batch_format="pyarrow",
        )))
        remaining = _snapshot(bucketed_semi_join(
            remaining, "node", visited.select_columns(["node"]), "node",
            anti=True,
        ))
        active = _snapshot(bucketed_semi_join(
            bucketed_semi_join(active, src_col, remaining, "node"),
            dst_col, remaining, "node",
        ))
    if remaining.count() == 0:  # labeled in exactly max_outer_rounds
        return _finish(parts)
    raise RuntimeError(
        "scc: max_outer_rounds exhausted (chain-of-SCCs topology?); "
        "raise the bound",
    )


def modularity(
    edges,
    communities,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    node_col: str = "node",
    comm_col: str = "comm",
    num_buckets: int | None = None,
    node_budget: int = 2_000_000,
    force_distributed: bool = False,
):
    """Per-community directed-modularity contributions in EXACT integer
    arithmetic: ``(comm, intra_w, dout_w, din_w, contrib_num)`` where

    * ``m``       = total edge weight (count when ``weight_col`` is None),
    * ``intra_w`` = weight of edges with both endpoints in the community,
    * ``dout_w`` / ``din_w`` = total out/in weight of the community's
      nodes,
    * ``contrib_num = m*intra_w - dout_w*din_w``, so the directed
      Newman modularity of the partition is ``Q = sum(contrib_num)/m**2``
      — the float division happens once, downstream, never in the
      distributed pass.

    This is the partition-quality measure community detection optimizes
    (Newman 2004, "Finding and evaluating community structure in
    networks"); here it scores ANY node→community assignment (components,
    domains, externally supplied clusters).

    Scale shape: ``m`` is one narrow aggregate; community labels attach
    to edges via TWO bucketed lookup joins (:func:`~.struct.degree.
    bucketed_attach` — nodes must all be labeled, inner-join semantics);
    one partial pass emits per-batch per-community ``(intra, dout, din)``
    rows (``np.add.at`` on int64 — exact); ONE ``groupby(comm)`` exchange
    folds them.  Only per-community rows reach the final pass, where
    ``contrib_num`` is computed in Python-int space and range-checked
    (requires ``m < ~3e9`` so ``m**2`` products fit int64; raises
    otherwise — at that scale emit the factors and fold downstream).

    The reference has no community metrics; this extends its summary
    family (``struct/summary/node_summary.py:33-238``) to partition
    scoring.  Weights must be integers; rows with a null endpoint or
    null weight are dropped; ``communities`` MUST be unique per node
    (same contract as ``bucketed_attach`` — a duplicate label would
    count an edge once in the broadcast branch but once per label in
    the join branch).
    """
    from .relational import equi_join

    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])

    def _clean(t: pa.Table) -> pa.Table:
        # rows with a null endpoint or null weight drop here, so the
        # total-weight aggregate and the per-community sums always see
        # the same row set (a null weight folded through int64 casts
        # would silently corrupt the sums)
        keep = pc.and_kleene(
            pc.is_valid(t.column(src_col)), pc.is_valid(t.column(dst_col)),
        )
        if weight_col is not None:
            keep = pc.and_kleene(keep, pc.is_valid(t.column(weight_col)))
        return t.select(cols).filter(keep)

    # snapshot the narrow cleaned projection once: the total-weight
    # aggregate and the join probe would otherwise each re-execute the
    # upstream lineage (2-3 int columns — cheap to hold)
    edges = _snapshot(edges.map_batches(_clean, batch_format="pyarrow"))

    if weight_col is not None:
        m = int(edges.sum(weight_col))
    else:
        m = int(edges.count())

    comm_sel = _snapshot(communities.select_columns([node_col, comm_col]))
    n_comm_rows = comm_sel.count()

    if not force_distributed and n_comm_rows <= node_budget:
        # broadcast branch: the label table fits the driver budget, so
        # it ships ONCE via ray.put and each edge batch resolves labels
        # with one vectorized index_in — no label-join exchange at all
        import ray

        tabs = [t for t in ray.get(comm_sel.to_arrow_refs()) if t.num_rows]
        if tabs:
            lk = pa.concat_tables(tabs).combine_chunks()
            nodes_arr = lk.column(node_col).combine_chunks()
            comm_arr = lk.column(comm_col).combine_chunks()
        else:
            nodes_arr = pa.array([], pa.string())
            comm_arr = pa.array([], pa.string())
        lk_ref = ray.put((nodes_arr, comm_arr))

        def _label(t: pa.Table, _ref=lk_ref) -> pa.Table:
            import ray as _ray

            narr, carr = _ray.get(_ref)
            is_ = pc.index_in(t.column(src_col), value_set=narr)
            id_ = pc.index_in(t.column(dst_col), value_set=narr)
            keep = pc.and_kleene(pc.is_valid(is_), pc.is_valid(id_))
            t = t.filter(keep)
            cs = pc.take(carr, is_.filter(keep))
            cd = pc.take(carr, id_.filter(keep))
            t = t.append_column("_csrc", cs)
            return t.append_column("_cdst", cd)

        e = edges.map_batches(_label, batch_format="pyarrow")
    else:

        def _ren(new):
            def f(t: pa.Table) -> pa.Table:
                return t.rename_columns(
                    [new if c == comm_col else c for c in t.column_names],
                )
            return f

        # equi_join auto mode: a community table under 64 MB broadcasts
        # (the dim-join plan — edges never move); bigger tables take the
        # data-sized bucketed exchange
        e = equi_join(
            edges,
            comm_sel.map_batches(_ren("_csrc"), batch_format="pyarrow"),
            on=src_col, right_on=node_col, how="inner",
            num_buckets=num_buckets,
        )
        e = equi_join(
            e, comm_sel.map_batches(_ren("_cdst"), batch_format="pyarrow"),
            on=dst_col, right_on=node_col, how="inner",
            num_buckets=num_buckets,
        )

    def _partial(t: pa.Table) -> pa.Table:
        cs = t.column("_csrc").combine_chunks()
        cd = t.column("_cdst").combine_chunks()
        if weight_col is not None:
            w = t.column(weight_col).to_numpy(zero_copy_only=False)
            w = np.asarray(w, np.int64)
        else:
            w = np.ones(t.num_rows, np.int64)
        both = pa.concat_arrays([cs, cd])
        enc = both.dictionary_encode()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), np.int64,
        )
        n = t.num_rows
        csrc_codes, cdst_codes = codes[:n], codes[n:]
        k = len(enc.dictionary)
        dout = np.zeros(k, np.int64)
        din = np.zeros(k, np.int64)
        intra = np.zeros(k, np.int64)
        np.add.at(dout, csrc_codes, w)
        np.add.at(din, cdst_codes, w)
        eq = csrc_codes == cdst_codes
        np.add.at(intra, csrc_codes[eq], w[eq])
        return pa.Table.from_arrays(
            [enc.dictionary,
             pa.array(intra, pa.int64()),
             pa.array(dout, pa.int64()),
             pa.array(din, pa.int64())],
            names=[comm_col, "intra_w", "dout_w", "din_w"],
        )

    agg = e.map_batches(_partial, batch_format="pyarrow").groupby(
        comm_col,
    ).sum(["intra_w", "dout_w", "din_w"])

    def _finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns([
            c.replace("sum(", "").replace(")", "") for c in t.column_names
        ])
        contrib = []
        for intra, dout, din in zip(
            t.column("intra_w").to_pylist(),
            t.column("dout_w").to_pylist(),
            t.column("din_w").to_pylist(),
        ):
            v = m * int(intra) - int(dout) * int(din)
            if not -(2**63) <= v < 2**63:
                raise OverflowError(
                    "modularity: contrib_num exceeds int64 (m=%d); emit"
                    " factors and fold downstream" % m,
                )
            contrib.append(v)
        return t.append_column("contrib_num", pa.array(contrib, pa.int64()))

    return agg.map_batches(_finish, batch_format="pyarrow")


def degree_assortativity(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int | None = None,
    edge_budget: int = 10_000_000,
    force_distributed: bool = False,
):
    """Degree-assortativity sufficient statistics: the six EXACT integers
    of the Pearson correlation between the source's out-degree and the
    target's in-degree across all edges (``(n, sum_x, sum_y, sum_xx,
    sum_yy, sum_xy)`` — sums as decimal strings, same contract as
    :func:`~.stats.corr_stats`).  ``r`` derives downstream as
    ``(n*sxy - sx*sy)/sqrt((n*sxx-sx^2)(n*syy-sy^2))`` — one float step
    on six integers (Newman 2002, "Assortative mixing in networks",
    directed out–in variant).

    Scale shape: degree tables are two partial-count passes + native
    ``groupby().sum`` (:func:`out_degrees`); degrees attach to edges via
    two bucketed lookup joins; :func:`~.stats.corr_stats` folds exact
    per-block partials — one row per block reaches the driver.
    """
    import ray

    from .relational import equi_join
    from .stats import corr_stats

    def _clean(t: pa.Table) -> pa.Table:
        # edges with a null endpoint drop entirely (both branches and
        # the degree tables then agree; a null src would otherwise
        # crash the budget branch's bincount and silently vanish from
        # the join branch)
        keep = pc.and_kleene(
            pc.is_valid(t.column(src_col)), pc.is_valid(t.column(dst_col)),
        )
        return t.select([src_col, dst_col]).filter(keep)

    # snapshot the narrow cleaned projection once: both degree passes
    # and the join probe would otherwise re-execute the upstream lineage
    edges = _snapshot(edges.map_batches(_clean, batch_format="pyarrow"))
    n_e = edges.count()

    if not force_distributed and n_e <= edge_budget:
        # broadcast branch (node count <= 2*edges bounds driver memory,
        # and the probe is free on the snapshot): fold per-batch degree
        # partials in one driver dict — SKIPPING the global
        # groupby(node) exchange, whose ~150k-group native aggregate
        # measured ~5 s at toy scale — then one stateless pass attaches
        # (x, y) per edge against the ray.put lookup and corr_stats
        # folds exact per-block partials
        deg_out: dict = {}
        deg_in: dict = {}

        def _deg_partial(t: pa.Table) -> pa.Table:
            sa = t.column(src_col).combine_chunks()
            da = t.column(dst_col).combine_chunks()
            both = pa.concat_arrays([sa, da])
            enc = both.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64,
            )
            k = len(enc.dictionary)
            n = t.num_rows
            o = np.bincount(codes[:n], minlength=k).astype(np.int64)
            i = np.bincount(codes[n:], minlength=k).astype(np.int64)
            return pa.Table.from_arrays(
                [enc.dictionary, pa.array(o), pa.array(i)],
                names=["node", "o", "i"],
            )

        for b in edges.map_batches(
            _deg_partial, batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"):
            for n_v, o_v, i_v in zip(
                b.column("node").to_pylist(),
                b.column("o").to_pylist(), b.column("i").to_pylist(),
            ):
                if o_v:
                    deg_out[n_v] = deg_out.get(n_v, 0) + o_v
                if i_v:
                    deg_in[n_v] = deg_in.get(n_v, 0) + i_v

        node_list = sorted(set(deg_out) | set(deg_in))
        nodes_arr = pa.array(node_list)
        out_np = np.array(
            [deg_out.get(n_v, 0) for n_v in node_list], np.int64,
        )
        in_np = np.array(
            [deg_in.get(n_v, 0) for n_v in node_list], np.int64,
        )
        lk_ref = ray.put((nodes_arr, out_np, in_np))

        def _attach(t: pa.Table, _ref=lk_ref) -> pa.Table:
            import ray as _ray

            narr, onp, inp = _ray.get(_ref)
            idx_s = np.asarray(
                pc.index_in(t.column(src_col), value_set=narr)
                .to_numpy(zero_copy_only=False), np.int64,
            )
            idx_d = np.asarray(
                pc.index_in(t.column(dst_col), value_set=narr)
                .to_numpy(zero_copy_only=False), np.int64,
            )
            return pa.Table.from_arrays(
                [pa.array(onp[idx_s]), pa.array(inp[idx_d])],
                names=["outdeg", "indeg"],
            )

        attached = edges.map_batches(_attach, batch_format="pyarrow")
        return corr_stats(attached, "outdeg", "indeg", scale=1)

    outd = out_degrees(edges, src_col)
    ind = out_degrees(edges, dst_col).map_batches(
        lambda t: t.rename_columns(
            ["indeg" if c == "outdeg" else c for c in t.column_names],
        ),
        batch_format="pyarrow",
    )
    # equi_join auto mode: degree tables under 64 MB broadcast, bigger
    # ones take the data-sized bucketed exchange
    e = equi_join(edges, outd, on=src_col, right_on="node", how="inner",
                  num_buckets=num_buckets)
    e = equi_join(e, ind, on=dst_col, right_on="node", how="inner",
                  num_buckets=num_buckets)
    return corr_stats(e, "outdeg", "indeg", scale=1)


def random_walks(
    edges,
    steps: int,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int | None = None,
):
    """Deterministic "random" walks over a directed graph — the DeepWalk/
    node2vec corpus-generation step (Perozzi et al. 2014) made
    layout/resume/cluster-size invariant: one walk starts at every node
    with at least one out-edge, and step ``t`` moves from ``cur`` to the
    out-neighbor minimizing ``md5(f"{walk}|{t}|{nbr}")`` (hex-lex order,
    ties by neighbor) — a hash-derived pseudo-random uniform choice any
    SQL engine can replay.  Walks at dead ends terminate (emit no
    further rows).  Returns ``(walk, step, node)`` with ``step`` 0..N.

    Scale shape: parallel edges dedup first (pair generation is per
    distinct edge — ONE bucketed dedup); each step is one bucketed
    many-to-many :func:`~.relational.equi_join` (frontier ⋈ edges) plus
    one skew-bounded :func:`~.relational.topk_per_group` ``k=1`` (the
    local combiner caps a mega-hub's candidates at one row per block) —
    2 exchanges per step, frontier never exceeds one row per walk.  The
    md5 per candidate is an unavoidable per-row digest (same policy as
    ``ops/sampling.py``).
    """
    import hashlib

    from ..stages.dedup import dedup_exact
    from .relational import equi_join, topk_per_group

    if steps < 0:
        raise ValueError("steps must be >= 0")

    sep = "\x1f"

    def _key(t: pa.Table) -> pa.Table:
        s = t.column(src_col)
        d = t.column(dst_col)
        keep = pc.and_kleene(pc.is_valid(s), pc.is_valid(d))
        t = t.select([src_col, dst_col]).filter(keep)
        return t.append_column(
            "_k", pc.binary_join_element_wise(
                pc.cast(t.column(src_col), pa.string()),
                pc.cast(t.column(dst_col), pa.string()), sep,
            ),
        )

    distinct = dedup_exact(
        edges.map_batches(_key, batch_format="pyarrow"), "_k",
    ).select_columns([src_col, dst_col]).materialize()

    starts = dedup_exact(
        distinct.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column(src_col)], names=["walk"],
            ),
            batch_format="pyarrow",
        ),
        "walk", local_first=True,
    ).materialize()

    def _step0(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("walk"),
             pa.array(np.zeros(t.num_rows, np.int64)),
             t.column("walk")],
            names=["walk", "step", "node"],
        )

    out_parts = [starts.map_batches(_step0, batch_format="pyarrow")]
    frontier = starts.map_batches(
        lambda t: t.append_column("_cur", t.column("walk")),
        batch_format="pyarrow",
    )

    for t_step in range(1, steps + 1):
        cands = equi_join(
            frontier.select_columns(["walk", "_cur"]), distinct,
            on="_cur", right_on=src_col, how="inner",
            num_buckets=num_buckets,
        )

        def _hash(t: pa.Table, _t=t_step) -> pa.Table:
            walks = t.column("walk").to_pylist()
            nbrs = t.column(dst_col).to_pylist()
            h = [
                hashlib.md5(  # noqa: S324 - layout-invariant choice hash
                    f"{w}|{_t}|{nb}".encode(),
                ).hexdigest()
                for w, nb in zip(walks, nbrs)
            ]
            return t.append_column("_h", pa.array(h, pa.string()))

        chosen = topk_per_group(
            cands.map_batches(_hash, batch_format="pyarrow"),
            "walk", "_h", 1, descending=False, tie_keys=[dst_col],
        ).materialize()

        def _emit(t: pa.Table, _t=t_step) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("walk"),
                 pa.array(np.full(t.num_rows, _t, np.int64)),
                 t.column(dst_col)],
                names=["walk", "step", "node"],
            )

        out_parts.append(chosen.map_batches(_emit, batch_format="pyarrow"))
        frontier = chosen.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("walk"), t.column(dst_col)],
                names=["walk", "_cur"],
            ),
            batch_format="pyarrow",
        )
        if chosen.count() == 0:
            break

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out


def sssp_distances(
    edges,
    seeds,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    num_buckets: int | None = None,
):
    """Bounded-hop weighted shortest paths (multi-source Bellman-Ford):
    one row ``(node, dist)`` per node reachable from any seed within
    ``rounds`` edges, ``dist`` = minimum total integer weight over any
    such path.  Unreachable nodes emit no row.  With non-negative
    weights and ``rounds >= |V|-1`` this is exact SSSP; in general it is
    the min-cost ≤-``rounds``-edge walk (the unrolled-relaxation
    semantics any SQL engine replays).

    The weighted complement of :func:`bfs_distances` (hop counts can't
    settle weighted distances on first touch, so this relaxes instead):
    each round relaxes ONLY the frontier of nodes whose distance
    improved last round — contributions from settled nodes were already
    incorporated the round they last improved, so the result equals
    full Bellman-Ford, round for round (tested).  Per round: one
    bucketed many-to-many :func:`~.relational.equi_join` (frontier ⋈
    out-edges), one ``groupby(node).min`` with a per-batch local min
    combiner, one bucketed lookup join against the current distance
    table (improvement test), and one bucketed anti-join to swap the
    improved rows in — 4 bounded exchanges; the loop exits early when a
    round improves nothing.  Distance tables hold one short row per
    REACHED node; per-round counts are the only driver-side values.

    Weights must be int64 (quantize floats to micros upstream); rows
    with a null weight are ignored.
    """
    import ray.data

    from ..struct.degree import bucketed_attach, bucketed_semi_join
    from .relational import equi_join

    seed_list = sorted(set(seeds))
    if not seed_list:
        raise ValueError("sssp_distances: empty seed set")
    if rounds < 0:
        raise ValueError("sssp_distances: rounds must be >= 0")
    seed_arr = pa.array(seed_list)
    dist = ray.data.from_arrow(
        pa.Table.from_arrays(
            [seed_arr, pa.array(np.zeros(len(seed_arr), np.int64))],
            names=["node", "dist"],
        ),
    ).materialize()
    frontier = dist
    # snapshot once: each round's relax join re-reads this projection
    pruned = _snapshot(edges.select_columns([src_col, dst_col, weight_col]))
    # size the per-round attach/anti exchanges to the data (the relax
    # equi_join sizes itself in auto mode)
    nb = max(1, min(64, pruned.count() // 100_000 + 1))

    for _ in range(rounds):
        cand = equi_join(
            frontier, pruned, on="node", right_on=src_col, how="inner",
            num_buckets=num_buckets,
        )

        def _relax(t: pa.Table) -> pa.Table:
            w = t.column(weight_col)
            keep = pc.is_valid(w)
            t = t.filter(keep)
            nd = pc.add_checked(
                t.column("dist"), pc.cast(t.column(weight_col), pa.int64()),
            )
            out = pa.Table.from_arrays(
                [t.column(dst_col), nd], names=["node", "_nd"],
            )
            # local min combiner: one row per node per batch
            return out.group_by("node").aggregate([("_nd", "min")]).rename_columns(
                ["node", "_nd"],
            )

        relaxed = cand.map_batches(_relax, batch_format="pyarrow")
        nd_min = relaxed.groupby("node").min("_nd").map_batches(
            lambda t: t.rename_columns(
                ["_nd" if c == "min(_nd)" else c for c in t.column_names],
            ),
            batch_format="pyarrow",
        ).materialize()
        if nd_min.count() == 0:
            break
        with_old = bucketed_attach(
            nd_min, "node", dist, "node", ["dist"], how="left",
            num_buckets=nb,
        )

        def _improved(t: pa.Table) -> pa.Table:
            old = t.column("dist")
            nd = t.column("_nd")
            better = pc.or_kleene(
                pc.is_null(old), pc.less(nd, pc.fill_null(old, 0)),
            )
            t = t.filter(pc.fill_null(better, True))
            return pa.Table.from_arrays(
                [t.column("node"), t.column("_nd")], names=["node", "dist"],
            )

        improved = with_old.map_batches(
            _improved, batch_format="pyarrow",
        ).materialize()
        if improved.count() == 0:
            break
        kept = bucketed_semi_join(
            dist, "node", improved.select_columns(["node"]), "node",
            anti=True, num_buckets=nb,
        )
        dist = kept.union(improved).materialize()
        frontier = improved
    return dist


def mis(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 32,
    num_buckets: int = 64,
    edge_budget: int = 2_000_000,
    force_distributed: bool = False,
):
    """Deterministic Luby maximal independent set over an undirected
    graph: one row ``(node, mis_round)`` per selected node.  Node ``v``
    joins in round ``r`` iff its priority key ``md5(f"{r}|{v}") +
    str(v)`` (md5 is fixed-width, so the concat compares as the
    ``(digest, node)`` tuple) is strictly smaller than every remaining
    neighbor's key; winners and their neighbors retire, and the loop
    repeats on the residual graph (Luby 1986, derandomized by hashing —
    the md5 round-salt replays in any SQL engine).  Isolated residual
    nodes always win.  The node set is the edge endpoints (pass
    zero-degree nodes downstream directly — they are trivially in the
    MIS).

    The result is a true MIS of the input graph: independent (two
    winners can never be neighbors — one would have out-prioritized the
    other in its round) and maximal (every retired non-winner lost to
    an adjacent winner).

    Budget hybrid (same shape as :func:`pagerank` / :func:`scc`): at or
    under ``edge_budget`` distinct undirected edges the residual graph
    fits one adjacency dict, so the rounds run on the driver — the
    right call at toy scale, where each distributed round's exchanges
    are pure scheduling overhead.  Above the budget (or with
    ``force_distributed=True``): symmetrize + dedup once (ONE
    exchange); per round the neighbor-minimum needs NO join — the key
    is a pure function of ``(round, node)``, so a per-batch partial min
    + ONE ``groupby(u).min`` computes it; winners resolve via one
    bucketed left lookup join; retirement is one semi-join (neighbor
    discovery) + three anti-joins (remaining, both edge endpoints) —
    ~6 exchanges per round, bucket count sized to the residual data.
    Both branches are rounds-for-rounds identical (tested).  Raises if
    ``max_rounds`` is exhausted with nodes unresolved (rounds are
    O(log n) whp).
    """
    import hashlib

    import ray
    import ray.data

    from ..stages.dedup import dedup_exact
    from ..struct.degree import bucketed_attach, bucketed_semi_join

    sep = "\x1f"

    def _sym(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(a_col), pa.string())
        b = pc.cast(t.column(b_col), pa.string())
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(a), pc.is_valid(b)),
            pc.invert(pc.equal(a, b)),
        )
        a = a.filter(keep)
        b = b.filter(keep)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        u = pa.concat_arrays([a, b])
        v = pa.concat_arrays([b, a])
        t2 = pa.Table.from_arrays([u, v], names=["u", "v"])
        return t2.append_column(
            "_k", pc.binary_join_element_wise(u, v, sep),
        )

    sym = dedup_exact(
        edges.map_batches(_sym, batch_format="pyarrow"), "_k",
        num_buckets=num_buckets,
    ).select_columns(["u", "v"]).materialize()
    n_edges = sym.count()

    def _key_of(vals, r):
        return [
            hashlib.md5(f"{r}|{x}".encode()).hexdigest() + x  # noqa: S324
            for x in vals
        ]

    if not force_distributed and n_edges <= edge_budget:
        # driver branch: one adjacency dict, same rounds, same keys
        tbl = pa.concat_tables(
            ray.get(sym.to_arrow_refs()),
        )
        adj: dict = {}
        for u_val, v_val in zip(
            tbl.column("u").to_pylist(), tbl.column("v").to_pylist(),
        ):
            adj.setdefault(u_val, set()).add(v_val)
        remaining_set = set(adj)
        won: dict = {}
        for r in range(1, max_rounds + 1):
            if not remaining_set:
                break
            keys = {x: k for x, k in zip(
                remaining_set, _key_of(list(remaining_set), r),
            )}
            winners_set = {
                v for v in remaining_set
                if all(
                    keys[v] < keys[u]
                    for u in adj[v] if u in remaining_set
                )
            }
            for v in winners_set:
                won[v] = r
            remaining_set -= winners_set
            for v in winners_set:
                remaining_set -= adj[v]
        if remaining_set:
            raise RuntimeError(
                "mis: max_rounds exhausted with nodes unresolved; raise"
                " the bound",
            )
        nodes = sorted(won)
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(nodes, pa.string()),
                 pa.array([won[x] for x in nodes], pa.int64())],
                names=["node", "mis_round"],
            ),
        )

    # distributed branch: bucket count sized to the data — a 64-task
    # exchange on kilobytes is pure scheduling (same rule as equi_join)
    nb = max(1, min(num_buckets, n_edges // 100_000 + 1))

    remaining = dedup_exact(
        sym.map_batches(
            lambda t: pa.Table.from_arrays([t.column("u")], names=["node"]),
            batch_format="pyarrow",
        ),
        "node", local_first=True,
    ).materialize()

    parts = []
    for r in range(1, max_rounds + 1):
        if remaining.count() == 0:
            break
        if sym.count() == 0:
            # all residual nodes are isolated: they win unconditionally
            def _all_win(t: pa.Table, _r=r) -> pa.Table:
                return pa.Table.from_arrays(
                    [t.column("node"),
                     pa.array(np.full(t.num_rows, _r, np.int64))],
                    names=["node", "mis_round"],
                )

            parts.append(remaining.map_batches(
                _all_win, batch_format="pyarrow",
            ).materialize())
            break

        def _nbr_min(t: pa.Table, _r=r) -> pa.Table:
            keys = pa.array(
                _key_of(t.column("v").to_pylist(), _r), pa.string(),
            )
            t2 = pa.Table.from_arrays(
                [t.column("u"), keys], names=["u", "_nk"],
            )
            return t2.group_by("u").aggregate([("_nk", "min")]).rename_columns(
                ["u", "_nk"],
            )

        mn = sym.map_batches(_nbr_min, batch_format="pyarrow").groupby(
            "u",
        ).min("_nk").map_batches(
            lambda t: t.rename_columns(["u", "_nk"]),
            batch_format="pyarrow",
        ).materialize()
        cand = bucketed_attach(
            remaining, "node", mn, "u", ["_nk"], how="left",
            num_buckets=nb,
        )

        def _winners(t: pa.Table, _r=r) -> pa.Table:
            own = pa.array(
                _key_of(t.column("node").to_pylist(), _r), pa.string(),
            )
            nk = t.column("_nk")
            win = pc.or_kleene(pc.is_null(nk), pc.less(own, nk))
            t = t.filter(pc.fill_null(win, True))
            return pa.Table.from_arrays(
                [t.column("node"),
                 pa.array(np.full(t.num_rows, _r, np.int64))],
                names=["node", "mis_round"],
            )

        winners = cand.map_batches(
            _winners, batch_format="pyarrow",
        ).materialize()
        if winners.count() == 0:
            continue
        parts.append(winners)

        hit = bucketed_semi_join(
            sym, "u", winners.select_columns(["node"]), "node",
            num_buckets=nb,
        )
        nbrs = dedup_exact(
            hit.map_batches(
                lambda t: pa.Table.from_arrays(
                    [t.column("v")], names=["node"],
                ),
                batch_format="pyarrow",
            ),
            "node", local_first=True,
        )
        kill = winners.select_columns(["node"]).union(nbrs).materialize()
        remaining = bucketed_semi_join(
            remaining, "node", kill, "node", anti=True,
            num_buckets=nb,
        ).materialize()
        if remaining.count() == 0:
            break
        sym = bucketed_semi_join(
            bucketed_semi_join(
                sym, "u", remaining, "node", num_buckets=nb,
            ),
            "v", remaining, "node", num_buckets=nb,
        ).materialize()
        n_edges = sym.count()
        nb = max(1, min(num_buckets, n_edges // 100_000 + 1))
    else:
        if remaining.count() > 0:
            raise RuntimeError(
                "mis: max_rounds exhausted with nodes unresolved; raise"
                " the bound",
            )

    if not parts:
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["node", "mis_round"],
            ),
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return out


def weighted_random_walks(
    edges,
    steps: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    num_buckets: int | None = None,
):
    """Deterministic WEIGHTED random walks — the node2vec/DeepWalk corpus
    generator where transition probability is proportional to edge
    weight, derandomized in exact integers: step ``t`` of the walk from
    node ``s`` currently at ``cur`` draws ``r = md5(f"{walk}|{t}")[:15
    hex] mod W(cur)`` (a 60-bit hash-uniform draw; ``W`` = total
    positive out-weight) and moves to the unique out-neighbor whose
    cumulative-weight interval ``[lo, hi)`` contains ``r`` — inverse-CDF
    sampling on integer prefix sums, so heavier edges are chosen
    proportionally more often and any SQL engine replays the choice
    (``('0x' || substr(md5(..),1,15))::UBIGINT % W``).  Returns
    ``(walk, step, node)``; dead ends (no positive-weight out-edge)
    terminate.

    ``edges`` must be unique per ``(src, dst)`` with int64 weights (the
    output of a ``host_graph``-style aggregation); rows with weight
    <= 0 are dropped (zero-weight edges are never drawn).

    Scale shape: the per-source cumulative intervals precompute ONCE
    (one ``groupby(src).map_groups`` exchange — group payload = one
    node's out-degree, the same mega-hub caveat as
    :func:`colink_similarity`); each step is then ONE bucketed
    many-to-many :func:`~.relational.equi_join` plus a stateless filter
    (the interval containment selects exactly one candidate per walk —
    no per-group argmin, no second exchange, unlike
    :func:`random_walks`).
    """
    import hashlib

    from ..stages.dedup import dedup_exact
    from .relational import equi_join

    if steps < 0:
        raise ValueError("steps must be >= 0")

    def _pos(t: pa.Table) -> pa.Table:
        w = pc.cast(t.column(weight_col), pa.int64())
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column(src_col)),
                          pc.is_valid(t.column(dst_col))),
            pc.greater(pc.fill_null(w, 0), 0),
        )
        return t.select([src_col, dst_col, weight_col]).filter(keep)

    def _cum(g: pa.Table) -> pa.Table:
        g = g.sort_by([(dst_col, "ascending")])
        v = np.asarray(
            g.column(weight_col).to_numpy(zero_copy_only=False), np.int64,
        )
        total = int(v.astype(object).sum())  # exact — no int64 wrap
        if total >= 2**63:
            raise OverflowError(
                "weighted_random_walks: total out-weight of a node"
                " exceeds int64; rescale weights upstream",
            )
        cum = np.cumsum(v)
        g = g.append_column("_lo", pa.array((cum - v).astype(np.int64)))
        g = g.append_column("_hi", pa.array(cum.astype(np.int64)))
        return g.append_column(
            "_tot", pa.array(np.full(len(v), cum[-1], np.int64)),
        )

    cumed = edges.map_batches(_pos, batch_format="pyarrow").groupby(
        src_col,
    ).map_groups(_cum, batch_format="pyarrow").materialize()

    starts = dedup_exact(
        cumed.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column(src_col)], names=["walk"],
            ),
            batch_format="pyarrow",
        ),
        "walk", local_first=True,
    ).materialize()

    def _step0(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("walk"),
             pa.array(np.zeros(t.num_rows, np.int64)),
             t.column("walk")],
            names=["walk", "step", "node"],
        )

    out_parts = [starts.map_batches(_step0, batch_format="pyarrow")]
    frontier = starts.map_batches(
        lambda t: t.append_column("_cur", t.column("walk")),
        batch_format="pyarrow",
    )

    for t_step in range(1, steps + 1):
        cands = equi_join(
            frontier.select_columns(["walk", "_cur"]), cumed,
            on="_cur", right_on=src_col, how="inner",
            num_buckets=num_buckets,
        )

        def _pick(t: pa.Table, _t=t_step) -> pa.Table:
            # one digest per DISTINCT walk, gathered back per row — a
            # hub frontier would otherwise recompute the identical md5
            # once per out-edge
            wcol = t.column("walk").combine_chunks()
            enc = wcol.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64,
            )
            uniq_r = np.array(
                [
                    int(hashlib.md5(  # noqa: S324 - derandomized draw
                        f"{w}|{_t}".encode(),
                    ).hexdigest()[:15], 16)
                    for w in enc.dictionary.to_pylist()
                ],
                np.int64,
            )
            r = uniq_r[codes]
            tot = np.asarray(
                t.column("_tot").to_numpy(zero_copy_only=False), np.int64,
            )
            r = r % tot
            lo = np.asarray(
                t.column("_lo").to_numpy(zero_copy_only=False), np.int64,
            )
            hi = np.asarray(
                t.column("_hi").to_numpy(zero_copy_only=False), np.int64,
            )
            win = (lo <= r) & (r < hi)
            t = t.filter(pa.array(win))
            return pa.Table.from_arrays(
                [t.column("walk"), t.column(dst_col)],
                names=["walk", "_next"],
            )

        chosen = cands.map_batches(
            _pick, batch_format="pyarrow",
        ).materialize()

        def _emit(t: pa.Table, _t=t_step) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("walk"),
                 pa.array(np.full(t.num_rows, _t, np.int64)),
                 t.column("_next")],
                names=["walk", "step", "node"],
            )

        out_parts.append(chosen.map_batches(_emit, batch_format="pyarrow"))
        frontier = chosen.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("walk"), t.column("_next")],
                names=["walk", "_cur"],
            ),
            batch_format="pyarrow",
        )
        if chosen.count() == 0:
            break

    out = out_parts[0]
    for p_ in out_parts[1:]:
        out = out.union(p_)
    return out


def label_propagation(
    edges,
    seed_labels,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    num_buckets: int | None = None,
):
    """Seeded label propagation — the weak-supervision label-spreading
    step (propagate a handful of trusted quality/topic labels over a
    similarity or link graph): seeds keep their label; each round every
    still-unlabeled node reachable from labeled nodes takes the
    WEIGHT-MAJORITY label of its labeled in-neighbors (ties break to
    the smallest label — deterministic), and once labeled a node is
    FIXED (label spreading a la Zhu & Ghahramani 2002's hard variant,
    which converges monotonically and unrolls into SQL).  Labels flow
    along edge direction ``src → dst``.  Returns ``(node, label,
    lp_round)`` with seeds at round 0.

    Scale shape per round (4 bounded exchanges): one bucketed
    many-to-many :func:`~.relational.equi_join` (newly-labeled frontier
    ⋈ out-edges), one ``groupby`` on the composite (dst, label) key
    (per-batch ``np.add.at`` partials first, so shuffled rows are
    pre-aggregated), one skew-bounded :func:`~.relational.
    topk_per_group` ``k=1`` argmax, one bucketed anti-join against the
    labeled set.  Only (node, label, weight) triples ever move; the
    loop exits as soon as a round labels nothing new.

    ``seed_labels``: mapping node → label (collected driver-side by
    contract — a handful of trusted seeds, not a node table).
    """
    import ray.data

    from ..stages.dedup import add_hash_bucket  # noqa: F401 (doc link)
    from ..struct.degree import bucketed_semi_join
    from .relational import equi_join, topk_per_group

    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    if not seed_labels:
        raise ValueError("label_propagation: empty seed set")
    sep = "\x1f"
    for k, v in seed_labels.items():
        if sep in str(k) or sep in str(v):
            raise ValueError(
                "label_propagation: node ids and labels must not contain"
                " the \\x1f separator (vote keys render through it)",
            )

    # node ids coerce to their string rendering (same contract as
    # :func:`mis`) so seed keys and edge endpoints always unify
    seeds_sorted = sorted(
        (str(k), str(v)) for k, v in seed_labels.items()
    )
    labeled = ray.data.from_arrow(
        pa.Table.from_arrays(
            [pa.array([k for k, _ in seeds_sorted], pa.string()),
             pa.array([v for _, v in seeds_sorted], pa.string()),
             pa.array(np.zeros(len(seeds_sorted), np.int64))],
            names=["node", "label", "lp_round"],
        ),
    ).materialize()
    frontier = labeled

    cols = [src_col, dst_col] + ([weight_col] if weight_col else [])

    def _clean(t: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.is_valid(t.column(src_col)), pc.is_valid(t.column(dst_col)),
        )
        if weight_col is not None:
            keep = pc.and_kleene(keep, pc.is_valid(t.column(weight_col)))
        t = t.select(cols).filter(keep)
        arrays = [
            pc.cast(t.column(src_col), pa.string()),
            pc.cast(t.column(dst_col), pa.string()),
        ]
        # endpoints render into the \x1f-joined vote key exactly like
        # seed ids do — an id containing the separator would silently
        # mis-split into a wrong (node, label) vote, so reject it here
        # (one vectorized scan, runs once per edge in the snapshot pass)
        for arr in arrays:
            if pc.any(
                pc.match_substring(arr, sep),
            ).as_py():
                raise ValueError(
                    "label_propagation: edge endpoint ids must not contain"
                    " the \\x1f separator (vote keys render through it)",
                )
        if weight_col is not None:
            arrays.append(pc.cast(t.column(weight_col), pa.int64()))
        return pa.Table.from_arrays(arrays, names=cols)

    pruned = _snapshot(edges.map_batches(_clean, batch_format="pyarrow"))

    for r in range(1, rounds + 1):
        cand = equi_join(
            frontier.select_columns(["node", "label"]), pruned,
            on="node", right_on=src_col, how="inner",
            num_buckets=num_buckets,
        )

        def _partial(t: pa.Table) -> pa.Table:
            d = t.column(dst_col)
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            lb = t.column("label")
            if isinstance(lb, pa.ChunkedArray):
                lb = lb.combine_chunks()
            key = pc.binary_join_element_wise(
                pc.cast(d, pa.string()), pc.cast(lb, pa.string()), sep,
            )
            enc = key.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64,
            )
            if weight_col is not None:
                w = np.asarray(
                    t.column(weight_col).to_numpy(zero_copy_only=False),
                    np.int64,
                )
            else:
                w = np.ones(t.num_rows, np.int64)
            acc = np.zeros(len(enc.dictionary), np.int64)
            np.add.at(acc, codes, w)
            return pa.Table.from_arrays(
                [enc.dictionary, pa.array(acc)], names=["_k", "_w"],
            )

        summed = cand.map_batches(_partial, batch_format="pyarrow").groupby(
            "_k",
        ).sum("_w").map_batches(
            lambda t: t.rename_columns(["_k", "_w"]),
            batch_format="pyarrow",
        )

        def _split(t: pa.Table) -> pa.Table:
            parts = pc.split_pattern(t.column("_k"), sep)
            d = pc.list_element(parts, 0)
            lb = pc.list_element(parts, 1)
            return pa.Table.from_arrays(
                [d, lb, t.column("_w")], names=["node", "label", "_w"],
            )

        votes = summed.map_batches(_split, batch_format="pyarrow")
        winners = topk_per_group(
            votes, "node", "_w", 1, descending=True, tie_keys=["label"],
        )
        new_labeled = bucketed_semi_join(
            winners, "node", labeled.select_columns(["node"]), "node",
            anti=True, num_buckets=num_buckets or 64,
        ).materialize()
        if new_labeled.count() == 0:
            break

        def _round(t: pa.Table, _r=r) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("node"), t.column("label"),
                 pa.array(np.full(t.num_rows, _r, np.int64))],
                names=["node", "label", "lp_round"],
            )

        frontier = new_labeled.map_batches(
            _round, batch_format="pyarrow",
        ).materialize()
        labeled = labeled.union(frontier).materialize()
    return labeled
