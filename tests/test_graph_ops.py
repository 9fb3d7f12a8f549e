"""Integer PageRank (broadcast vs distributed branch equality, dangling
mass, determinism across block layouts) and entity co-occurrence."""

import numpy as np
import pyarrow as pa


def _edges_ds(src, dst, blocks=4):
    import ray

    t = pa.Table.from_arrays(
        [pa.array(src, pa.int64()), pa.array(dst, pa.int64())],
        names=["src", "dst"],
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _ref_pagerank(src, dst, iters, scale=1_000_000):
    nodes = sorted(set(src) | set(dst))
    deg = {}
    for s in src:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d in zip(src, dst):
            inc[d] += rank[s] // deg[s]
        rank = {n: (15 * scale) // 100 + (85 * inc[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_reference(ray_session):
    from pybel_ray.ops.graph import pagerank

    rng = np.random.default_rng(11)
    src = [int(x) for x in rng.integers(0, 40, 200)]
    dst = [int(x) for x in rng.integers(40, 80, 200)]
    out = {r["node"]: r["rank"] for r in
           pagerank(_edges_ds(src, dst), iters=4).take_all()}
    assert out == _ref_pagerank(src, dst, 4)


def test_pagerank_branches_and_layout_invariance(ray_session):
    from pybel_ray.ops.graph import pagerank

    rng = np.random.default_rng(5)
    src = [int(x) for x in rng.integers(0, 30, 150)]
    dst = [int(x) for x in rng.integers(0, 30, 150)]
    a = {r["node"]: r["rank"] for r in
         pagerank(_edges_ds(src, dst, blocks=2), iters=3).take_all()}
    b = {r["node"]: r["rank"] for r in
         pagerank(_edges_ds(src, dst, blocks=7), iters=3,
                  force_distributed=True, num_buckets=8).take_all()}
    assert a == b == _ref_pagerank(src, dst, 3)


def test_pagerank_dangling_and_sink(ray_session):
    from pybel_ray.ops.graph import pagerank

    # 1 -> 2 -> 3 (3 is dangling: its mass evaporates)
    out = {r["node"]: r["rank"] for r in
           pagerank(_edges_ds([1, 2], [2, 3]), iters=2).take_all()}
    assert out == _ref_pagerank([1, 2], [2, 3], 2)
    assert out[1] == 150000  # source node gets teleport mass only


def test_cooccurrence_edges(ray_session):
    import ray

    from pybel_ray.ops.linking import cooccurrence_edges

    links = pa.Table.from_pylist([
        {"doc_id": 1, "curie": "A"}, {"doc_id": 1, "curie": "B"},
        {"doc_id": 1, "curie": "A"},  # duplicate mention, one doc-pair
        {"doc_id": 2, "curie": "B"}, {"doc_id": 2, "curie": "A"},
        {"doc_id": 2, "curie": "C"},
        {"doc_id": 3, "curie": "C"},  # singleton doc emits nothing
    ])
    out = {(r["curie_a"], r["curie_b"]): r["n_docs"] for r in
           cooccurrence_edges(
               ray.data.from_arrow(links).repartition(3)).take_all()}
    assert out == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_tumbling_window_agg(ray_session):
    import ray

    from pybel_ray.ops.window import tumbling_window_agg

    rows = [
        {"ts": 1_000_000 * t, "v": v, "k": k}
        for t, v, k in [
            (10, 1, "a"), (250, 2, "a"), (299, 4, "b"),
            (300, 8, "a"), (550, 16, "a"), (900, 32, "b"),
        ]
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(0, "ts", t.column("ts").cast(pa.timestamp("us")))
    ds = ray.data.from_arrow(t).repartition(3)
    out = {(r["window_start"], r["k"]): (r["n"], r["sum_v"]) for r in
           tumbling_window_agg(ds, "ts", 300, keys=["k"],
                               sum_cols=["v"]).take_all()}
    assert out == {
        (0, "a"): (2, 3), (0, "b"): (1, 4),
        (300, "a"): (2, 24), (900, "b"): (1, 32),
    }


def test_mention_contexts_clamped(ray_session):
    import ray

    from pybel_ray.ops.linking import link_entities

    docs = pa.Table.from_pylist(
        [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"}],
    )
    aliases = pa.Table.from_pylist(
        [{"mention": "beta", "curie": "X:1"},
         {"mention": "delta epsilon", "curie": "X:2"}],
    )
    out = {r["curie"]: r["context"] for r in link_entities(
        ray.data.from_arrow(docs), aliases, context_window=2,
    ).take_all()}
    # window clamps at the document start / end
    assert out["X:1"] == "alpha beta gamma delta"
    assert out["X:2"] == "beta gamma delta epsilon zeta"


def test_hopping_window_agg(ray_session):
    import ray

    from pybel_ray.ops.window import hopping_window_agg

    # width 4s, hop 2s: event at t=5 lands in windows starting 2 and 4
    rows = [{"ts": 1_000_000 * t, "v": v} for t, v in
            [(1, 1), (5, 2), (9, 4)]]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(0, "ts", t.column("ts").cast(pa.timestamp("us")))
    out = {r["window_start"]: (r["n"], r["sum_v"]) for r in
           hopping_window_agg(ray.data.from_arrow(t).repartition(2),
                              "ts", 4, 2, sum_cols=["v"]).take_all()}
    assert out == {0: (1, 1), 2: (1, 2), 4: (1, 2), 6: (1, 4), 8: (1, 4)}


def test_json_field_extraction(ray_session):
    import ray

    from pybel_ray.ops.json_cols import json_int_field, json_string_field

    rows = [
        {"id": 0, "props": '{"k": 87, "name": "web"}'},
        {"id": 1, "props": '{"name":"x","k":-3}'},
        {"id": 2, "props": '{"other": 1}'},
        {"id": 3, "props": 'not json'},
        {"id": 4, "props": '{"k": 1.25}'},           # float: NOT an int literal
        {"id": 5, "props": '{"k": 12, "name": "y"}'},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    ints = {r["id"]: r["k"] for r in
            json_int_field(ds, "props", "k").take_all()}
    assert ints == {0: 87, 1: -3, 2: None, 3: None, 4: None, 5: 12}
    strs = {r["id"]: r["name"] for r in
            json_string_field(ds, "props", "name").take_all()}
    assert strs == {0: "web", 1: "x", 2: None, 3: None, 4: None, 5: "y"}


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


def _edge_ds(pairs, blocks=3):
    import ray

    t = pa.Table.from_arrays(
        [pa.array([str(a) for a, _ in pairs], pa.string()),
         pa.array([str(b) for _, b in pairs], pa.string())],
        names=["src", "dst"],
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _brute_triangles(pairs):
    from collections import Counter
    from itertools import combinations

    edges = {frozenset((str(a), str(b))) for a, b in pairs if str(a) != str(b)}
    nodes = sorted({n for e in edges for n in e})
    c = Counter()
    for x, y, z in combinations(nodes, 3):
        if ({frozenset((x, y)), frozenset((y, z)), frozenset((x, z))}
                <= edges):
            c[x] += 1
            c[y] += 1
            c[z] += 1
    return dict(c)


def test_triangles_match_brute(ray_session):
    import numpy as np

    from pybel_ray.ops.graph import triangle_counts

    rs = np.random.RandomState(6)
    # dense-ish random graph on 30 nodes -> plenty of triangles
    pairs = [tuple(sorted((int(rs.randint(30)), int(rs.randint(30)))))
             for _ in range(160)]
    out = triangle_counts(_edge_ds(pairs)).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    want = _brute_triangles(pairs)
    assert got == {k: v for k, v in want.items() if v > 0}


def test_triangles_dup_selfloop_and_direction_invariant(ray_session):
    from pybel_ray.ops.graph import triangle_counts

    base = [("a", "b"), ("b", "c"), ("a", "c")]
    noisy = base + [("b", "a"), ("c", "c"), ("a", "b"), ("c", "b")]
    out = triangle_counts(_edge_ds(noisy, blocks=4)).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangles_none(ray_session):
    from pybel_ray.ops.graph import triangle_counts

    out = triangle_counts(_edge_ds([("a", "b"), ("b", "c")])).to_pandas()
    assert len(out) == 0


def test_triangles_hub_skew_safe(ray_session):
    from pybel_ray.ops.graph import triangle_counts

    # star: hub h connected to 200 leaves, leaves chained pairwise —
    # orientation must point every edge AT the hub (highest degree), so
    # the hub's out-neighborhood stays tiny and wedges are leaf-local
    pairs = [("h", "l%d" % i) for i in range(200)]
    pairs += [("l%d" % i, "l%d" % (i + 1)) for i in range(199)]
    out = triangle_counts(_edge_ds(pairs, blocks=6)).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    # triangles: (h, l_i, l_i+1) for every chained pair
    assert got["h"] == 199
    assert got["l0"] == 1 and got["l199"] == 1 and got["l5"] == 2


def test_clustering_coefficients(ray_session):
    import math

    from pybel_ray.ops.graph import clustering_coefficients

    # triangle a-b-c plus pendant d on a: cc(a)=2*1/(3*2)=1/3,
    # cc(b)=cc(c)=1, cc(d)=0
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    out = clustering_coefficients(_edge_ds(pairs, blocks=2)).to_pandas()
    got = {r.node: (r.deg, r.n_triangles, r.cc_e6) for r in out.itertuples()}
    third = math.floor((2.0 * 1) / (3 * 2) * 1e6 + 0.5)
    assert got["a"] == (3, 1, third)
    assert got["b"] == (2, 1, 1_000_000)
    assert got["c"] == (2, 1, 1_000_000)
    assert got["d"] == (1, 0, 0)


def _brute_kcore(pairs, k):
    E = set()
    for a, b in pairs:
        a, b = str(a), str(b)
        if a != b:
            E.add((min(a, b), max(a, b)))
    iters = 0
    while True:
        deg = {}
        for x, y in E:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg, iters
        E = {(x, y) for x, y in E if x not in bad and y not in bad}
        iters += 1
        if not E:
            return {}, iters


def test_kcore_matches_brute(ray_session):
    from pybel_ray.ops.graph import kcore

    # two 10-blocks: chain + skip-2 everywhere, skip-3 only in block 0 —
    # block 1 dissolves under k=3 (a 5-round cascade), block 0 survives
    ids = list(range(20))
    pairs = [(i, i + 1) for i in ids if i % 10 != 9]
    pairs += [(i, i + 2) for i in ids if i % 10 <= 7]
    pairs += [(i, i + 3) for i in ids if i % 10 <= 6 and (i // 10) % 2 == 0]
    spairs = [("%08d" % a, "%08d" % b) for a, b in pairs]
    for k in (2, 3):
        exp, _ = _brute_kcore(spairs, k)
        exp = {n: d for n, d in exp.items() if d >= k}
        out = kcore(_edge_ds(spairs, blocks=4), k=k).to_pandas()
        got = dict(zip(out["node"], out["deg"]))
        assert got == exp, "k=%d" % k


def test_kcore_empty_core(ray_session):
    from pybel_ray.ops.graph import kcore

    # a path peels to nothing under k=2... but a 4-node path takes 2
    # rounds, and the result must be an EMPTY dataset, not an error
    out = kcore(_edge_ds([("a", "b"), ("b", "c"), ("c", "d")]), k=2)
    assert out.count() == 0


def test_kcore_dedup_and_self_loops(ray_session):
    from pybel_ray.ops.graph import kcore

    # parallel edges collapse and self-loops drop BEFORE degrees count:
    # triangle with a doubled edge and a self-loop is still a 2-core of
    # degree exactly 2 per node
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "c")]
    out = kcore(_edge_ds(pairs), k=2).to_pandas()
    got = dict(zip(out["node"], out["deg"]))
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_planted_cascade_within_oracle_rounds(ray_session):
    # the graph_kcore DuckDB oracle unrolls 6 peel rounds; the planted
    # cascade is block-local, so its depth is scale-invariant — pin it
    ids = list(range(100))
    pairs = [(i, i + 1) for i in ids if i % 10 != 9]
    pairs += [(i, i + 2) for i in ids if i % 10 <= 7]
    pairs += [(i, i + 3) for i in ids if i % 10 <= 6 and (i // 10) % 2 == 0]
    _, iters = _brute_kcore(pairs, 3)
    assert iters <= 6


def test_bfs_distances_matches_python_bfs(ray_session):
    from collections import deque

    import ray.data

    from pybel_ray.ops.graph import bfs_distances

    rng = np.random.default_rng(9)
    e = rng.integers(0, 120, size=(500, 2))
    t = pa.table({
        "src": [f"n{a}" for a in e[:, 0]],
        "dst": [f"n{b}" for b in e[:, 1]],
    })
    seeds = ["n0", "n7"]
    results = {}
    for forced in (False, True):
        out = bfs_distances(
            ray.data.from_arrow(t).repartition(6), seeds,
            force_distributed=forced,
        ).to_pandas()
        results[forced] = dict(zip(out["node"], out["dist"]))
    got = results[False]
    assert results[True] == results[False]

    adj = {}
    for a, b in e:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
    ref, q = {s: 0 for s in seeds}, deque(seeds)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)
    assert got == ref


def test_bfs_distances_unreachable_and_bound(ray_session):
    import ray.data

    from pybel_ray.ops.graph import bfs_distances

    # a directed chain plus a disconnected island
    t = pa.table({
        "src": ["a", "b", "c", "x"],
        "dst": ["b", "c", "d", "y"],
    })
    ds = ray.data.from_arrow(t)
    out = bfs_distances(ds, ["a"]).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # max_rounds truncates the frontier expansion
    capped = bfs_distances(ds, ["a"], max_rounds=2).to_pandas()
    assert dict(zip(capped["node"], capped["dist"])) == {
        "a": 0, "b": 1, "c": 2,
    }


def _hits_reference(edge_list, iters=3, scale=10**6):
    nodes = sorted({x for e in edge_list for x in e})
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iters):
        ra = {n: 0 for n in nodes}
        for u, v in edge_list:
            ra[v] += h[u]
        q = max(1, max(ra.values()) // scale)
        a = {n: ra[n] // q for n in nodes}
        rh = {n: 0 for n in nodes}
        for u, v in edge_list:
            rh[u] += a[v]
        q = max(1, max(rh.values()) // scale)
        h = {n: rh[n] // q for n in nodes}
    return sorted((n, h[n], a[n]) for n in nodes)


def test_hits_matches_reference_and_branches_agree(ray_session):
    import ray.data

    from pybel_ray.ops.graph import hits

    # parallel edge, sink-only node (d has no in-edges, e no out-edges)
    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("a", "b"), ("c", "e"),
    ]
    ds = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in edge_list],
    )
    want = _hits_reference(edge_list)
    got = sorted(
        (r["node"], r["hub"], r["auth"]) for r in hits(ds).take_all()
    )
    assert got == want
    dist = sorted(
        (r["node"], r["hub"], r["auth"])
        for r in hits(ds, force_distributed=True, num_buckets=4).take_all()
    )
    assert dist == want
    # layout invariance: same integers regardless of block boundaries
    relaid = sorted(
        (r["node"], r["hub"], r["auth"])
        for r in hits(ds.repartition(5)).take_all()
    )
    assert relaid == want


def test_colink_similarity_exact_and_cap(ray_session):
    import ray.data

    from pybel_ray.ops.graph import colink_similarity

    edge_list = [
        ("a", "x"), ("a", "y"), ("a", "z"),
        ("b", "x"), ("b", "y"), ("b", "z"),
        ("c", "x"), ("a", "x"),  # parallel edge must not inflate
    ]
    ds = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in edge_list],
    )
    out = colink_similarity(ds, min_shared=1).to_pandas()
    got = {
        (r.src_a, r.src_b): (r.shared, r.deg_a, r.deg_b, r.jaccard_micros)
        for r in out.itertuples()
    }
    assert got == {
        ("a", "b"): (3, 3, 3, 1_000_000),
        ("a", "c"): (1, 3, 1, 333_333),
        ("b", "c"): (1, 3, 1, 333_333),
    }
    # min_shared gates pairs
    strict = colink_similarity(ds, min_shared=2).to_pandas()
    assert set(zip(strict["src_a"], strict["src_b"])) == {("a", "b")}
    # mega-hub cap: target x (3 sources) dropped entirely -> only the
    # y/z co-links survive
    capped = colink_similarity(ds, min_shared=1, max_group=2).to_pandas()
    got_capped = {
        (r.src_a, r.src_b): r.shared for r in capped.itertuples()
    }
    assert got_capped == {("a", "b"): 2}
    # null endpoints are dropped, not crashed on
    withnull = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in edge_list]
        + [{"src": None, "dst": "x"}, {"src": "a", "dst": None}],
    )
    out2 = colink_similarity(withnull, min_shared=1).to_pandas()
    assert len(out2) == 3


def test_pagerank_weighted_matches_reference_and_branches(ray_session):
    import ray.data

    from pybel_ray.ops.graph import pagerank_weighted

    edge_list = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
        ("c", "a", 5), ("d", "c", 4),
    ]
    ds = ray.data.from_items(
        [{"src": s, "dst": d, "w": w} for s, d, w in edge_list],
    )

    def ref(E, iters=3, scale=10**6):
        nodes = sorted({x for e in E for x in e[:2]})
        W = {n: 0 for n in nodes}
        for u, _v, w in E:
            W[u] += w
        r = {n: scale for n in nodes}
        for _ in range(iters):
            inc = {n: 0 for n in nodes}
            for u, v, w in E:
                inc[v] += r[u] * w // max(W[u], 1)
            r = {n: 150_000 + 85 * inc[n] // 100 for n in nodes}
        return sorted(r.items())

    got = sorted(
        (r["node"], r["rank"]) for r in pagerank_weighted(ds).take_all()
    )
    assert got == ref(edge_list)
    dist = sorted(
        (r["node"], r["rank"])
        for r in pagerank_weighted(
            ds, force_distributed=True, num_buckets=4,
        ).take_all()
    )
    assert dist == got


def _ref_ppr(src, dst, seeds, iters, scale=1_000_000):
    nodes = sorted(set(src) | set(dst))
    deg = {n: 0 for n in nodes}
    for s in src:
        deg[s] += 1
    deg = {n: (d if d else 1) for n, d in deg.items()}
    seeds = set(seeds)
    rank = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d in zip(src, dst):
            inc[d] += rank[s] // deg[s]
        rank = {n: ((15 * scale) // 100 if n in seeds else 0)
                + (85 * inc[n]) // 100 for n in nodes}
    return rank


def test_personalized_pagerank_branches_match_reference(ray_session):
    """Seeded teleport: both budget-hybrid branches equal the pure-python
    recurrence; unknown seeds are ignored; mass concentrates near seeds."""
    from pybel_ray.ops.graph import pagerank

    rng = np.random.default_rng(3)
    src = [int(x) for x in rng.integers(0, 30, 150)]
    dst = [int(x) for x in rng.integers(0, 30, 150)]
    seeds = [src[0], dst[1], 9999]  # 9999 not in the graph
    a = {r["node"]: r["rank"] for r in
         pagerank(_edges_ds(src, dst, blocks=2), iters=3,
                  seeds=seeds).take_all()}
    b = {r["node"]: r["rank"] for r in
         pagerank(_edges_ds(src, dst, blocks=7), iters=3, seeds=seeds,
                  force_distributed=True, num_buckets=8).take_all()}
    expect = _ref_ppr(src, dst, seeds, 3)
    assert a == b == expect
    # non-seed nodes hold strictly less than the seeded teleport floor +
    # propagated mass unless linked; a disconnected non-seed stays at 0
    iso_src, iso_dst = src + [500], dst + [501]
    out = {r["node"]: r["rank"] for r in
           pagerank(_edges_ds(iso_src, iso_dst, blocks=3), iters=3,
                    seeds=[src[0]]).take_all()}
    assert out[500] == 0  # unreachable from the seed, no teleport


def _brute_scc(edge_list):
    """Mutual-reachability closure (O(n^3), test oracle only)."""
    nodes = sorted({x for e in edge_list for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    reach = np.eye(n, dtype=bool)
    for s, d in edge_list:
        reach[idx[s], idx[d]] = True
    for k in range(n):
        reach |= np.outer(reach[:, k], reach[k, :])
    return {
        v: min(nodes[j] for j in range(n) if reach[i, j] and reach[j, i])
        for i, v in enumerate(nodes)
    }


def test_scc_driver_matches_brute_closure(ray_session):
    import random

    import ray

    from pybel_ray.ops.graph import scc

    rng = random.Random(5)
    nodes = ["n%02d" % i for i in range(25)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(55)]
    expect = _brute_scc(edges)
    tbl = pa.table({"src": [e[0] for e in edges],
                    "dst": [e[1] for e in edges]})
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = {r["node"]: r["scc"] for r in scc(ds).take_all()}
    assert got == expect
    assert len({v for v in expect.values()}) > 1  # non-trivial structure


def test_scc_distributed_branch_matches_driver(ray_session):
    """Shallow-condensation planted graph (cycles + short tails + a
    self loop): the distributed coloring branch must equal the Tarjan
    branch exactly.  Deep chain-of-SCCs topologies are the documented
    worst case for outer-round count and are excluded here — the branch
    only engages above the 2M-edge budget where per-round costs
    amortize."""
    import ray

    from pybel_ray.ops.graph import scc

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),       # 3-cycle
        ("x", "y"), ("y", "x"), ("c", "x"),       # 2-cycle fed by it
        ("p", "q"), ("q", "r"),                   # chain of singletons
        ("s", "s"),                               # self loop
        ("r", "a"),                               # tail into the cycle
    ]
    expect = _brute_scc(edges)
    tbl = pa.table({"src": [e[0] for e in edges],
                    "dst": [e[1] for e in edges]})
    ds = ray.data.from_arrow(tbl).repartition(3)
    drv = {r["node"]: r["scc"] for r in scc(ds).take_all()}
    dist = {r["node"]: r["scc"]
            for r in scc(ds, force_distributed=True).take_all()}
    assert drv == expect
    assert dist == expect


def _ref_modularity(src, dst, comm, w=None):
    w = w or [1] * len(src)
    m = sum(w)
    agg = {}
    for s, d, wt in zip(src, dst, w):
        cs, cd = comm[s], comm[d]
        a = agg.setdefault(cs, [0, 0, 0])
        a[1] += wt  # dout
        agg.setdefault(cd, [0, 0, 0])[2] += wt  # din
        if cs == cd:
            a[0] += wt
    return {
        c: (i, o, n, m * i - o * n) for c, (i, o, n) in agg.items()
    }


def test_modularity_matches_reference(ray_session):
    from pybel_ray.ops.graph import modularity

    rng = np.random.default_rng(5)
    src = [int(x) for x in rng.integers(0, 30, 150)]
    dst = [int(x) for x in rng.integers(0, 30, 150)]
    comm = {n: n % 4 for n in range(30)}
    import ray

    cds = ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array(list(range(30)), pa.int64()),
         pa.array([comm[n] for n in range(30)], pa.int64())],
        names=["node", "comm"],
    )).repartition(3)
    for blocks, forced in ((1, False), (7, False), (4, True)):
        out = {
            r["comm"]: (r["intra_w"], r["dout_w"], r["din_w"],
                        r["contrib_num"])
            for r in modularity(
                _edges_ds(src, dst, blocks=blocks), cds,
                force_distributed=forced,
            ).take_all()
        }
        assert out == _ref_modularity(src, dst, comm), f"forced={forced}"
    # Q of the trivial one-community partition is exactly 0
    one = ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array(list(range(30)), pa.int64()),
         pa.array([0] * 30, pa.int64())], names=["node", "comm"],
    ))
    rows = modularity(_edges_ds(src, dst), one).take_all()
    assert len(rows) == 1 and rows[0]["contrib_num"] == 0


def test_modularity_weighted(ray_session):
    import ray

    from pybel_ray.ops.graph import modularity

    src = [0, 0, 1, 2, 3]
    dst = [1, 2, 0, 3, 2]
    w = [3, 1, 2, 5, 4]
    comm = {0: 0, 1: 0, 2: 1, 3: 1}
    t = pa.Table.from_arrays(
        [pa.array(src, pa.int64()), pa.array(dst, pa.int64()),
         pa.array(w, pa.int64())],
        names=["src", "dst", "w"],
    )
    cds = ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array([0, 1, 2, 3], pa.int64()),
         pa.array([comm[n] for n in range(4)], pa.int64())],
        names=["node", "comm"],
    ))
    out = {
        r["comm"]: (r["intra_w"], r["dout_w"], r["din_w"], r["contrib_num"])
        for r in modularity(
            ray.data.from_arrow(t).repartition(2), cds, weight_col="w",
        ).take_all()
    }
    assert out == _ref_modularity(src, dst, comm, w)


def test_degree_assortativity_matches_reference(ray_session):
    from pybel_ray.ops.graph import degree_assortativity

    rng = np.random.default_rng(9)
    src = [int(x) for x in rng.integers(0, 25, 120)]
    dst = [int(x) for x in rng.integers(0, 25, 120)]
    outdeg = {}
    indeg = {}
    for s in src:
        outdeg[s] = outdeg.get(s, 0) + 1
    for d in dst:
        indeg[d] = indeg.get(d, 0) + 1
    xs = [outdeg[s] for s in src]
    ys = [indeg[d] for d in dst]
    exp = {
        "n": len(xs),
        "sum_x": str(sum(xs)), "sum_y": str(sum(ys)),
        "sum_xx": str(sum(x * x for x in xs)),
        "sum_yy": str(sum(y * y for y in ys)),
        "sum_xy": str(sum(x * y for x, y in zip(xs, ys))),
    }
    for blocks, forced in ((1, False), (6, False), (4, True)):
        row = degree_assortativity(
            _edges_ds(src, dst, blocks=blocks), force_distributed=forced,
        ).to_pylist()[0]
        assert row == exp, f"forced={forced}"


def test_random_walks_deterministic_and_valid(ray_session):
    import hashlib

    from pybel_ray.ops.graph import random_walks

    rng = np.random.default_rng(3)
    src = [int(x) for x in rng.integers(0, 20, 80)]
    dst = [int(x) for x in rng.integers(0, 20, 80)]
    edge_set = set(zip(src, dst))
    adj = {}
    for s, d in edge_set:
        adj.setdefault(s, set()).add(d)

    def _ref_walks(steps):
        out = []
        for start in sorted(adj):
            cur = start
            out.append((start, 0, start))
            for t in range(1, steps + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(
                    nbrs,
                    key=lambda nb: (hashlib.md5(
                        f"{start}|{t}|{nb}".encode(),
                    ).hexdigest(), nb),
                )
                out.append((start, t, cur))
        return sorted(out)

    exp = _ref_walks(3)
    for blocks in (1, 5):
        rows = random_walks(_edges_ds(src, dst, blocks=blocks), 3).take_all()
        got = sorted((r["walk"], r["step"], r["node"]) for r in rows)
        assert got == exp
    # every non-start row rides an actual edge
    by_walk = {}
    for w, t, n in exp:
        by_walk.setdefault(w, {})[t] = n
    for w, path in by_walk.items():
        for t in range(1, max(path)):
            assert (path[t - 1], path[t]) in edge_set


def test_random_walks_dead_end_terminates(ray_session):
    from pybel_ray.ops.graph import random_walks

    # 0 -> 1 -> 2, 2 has no out-edges: the walk from 0 stops at step 2
    rows = random_walks(_edges_ds([0, 1], [1, 2], blocks=2), 5).take_all()
    got = sorted((r["walk"], r["step"], r["node"]) for r in rows)
    assert got == [
        (0, 0, 0), (0, 1, 1), (0, 2, 2),
        (1, 0, 1), (1, 1, 2),
    ]


def _ref_sssp(src, dst, w, seeds, rounds):
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nd = dict(dist)
        for s, d, wt in zip(src, dst, w):
            if s in dist and (d not in nd or dist[s] + wt < nd[d]):
                nd[d] = min(nd.get(d, dist[s] + wt), dist[s] + wt)
        if nd == dist:
            break
        dist = nd
    return dist


def test_sssp_matches_reference_bellman_ford(ray_session):
    import ray

    from pybel_ray.ops.graph import sssp_distances

    rng = np.random.default_rng(7)
    src = [int(x) for x in rng.integers(0, 30, 160)]
    dst = [int(x) for x in rng.integers(0, 30, 160)]
    w = [int(x) for x in rng.integers(1, 50, 160)]
    t = pa.Table.from_arrays(
        [pa.array(src, pa.int64()), pa.array(dst, pa.int64()),
         pa.array(w, pa.int64())],
        names=["src", "dst", "w"],
    )
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        for rounds in (0, 1, 3):
            got = {r["node"]: r["dist"] for r in
                   sssp_distances(ds, [0, 5], rounds).take_all()}
            assert got == _ref_sssp(src, dst, w, [0, 5], rounds)


def test_sssp_early_exit_and_unreachable(ray_session):
    import ray

    from pybel_ray.ops.graph import sssp_distances

    # 0 -10-> 1 -1-> 2 ; 3 -2-> 4 unreachable from seed 0; a cheaper
    # 2-hop detour 0 -1-> 9 -1-> 1 must beat the direct edge
    t = pa.Table.from_arrays(
        [pa.array([0, 1, 3, 0, 9], pa.int64()),
         pa.array([1, 2, 4, 9, 1], pa.int64()),
         pa.array([10, 1, 2, 1, 1], pa.int64())],
        names=["src", "dst", "w"],
    )
    ds = ray.data.from_arrow(t).repartition(2)
    got = {r["node"]: r["dist"] for r in
           sssp_distances(ds, [0], 10).take_all()}
    assert got == {0: 0, 9: 1, 1: 2, 2: 3}


def _ref_mis(edge_list, max_rounds=32):
    import hashlib

    adj = {}
    for a, b in edge_list:
        a, b = str(a), str(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    remaining = set(adj)
    out = {}
    for r in range(1, max_rounds + 1):
        if not remaining:
            break

        def key(x, _r=r):
            return hashlib.md5(f"{_r}|{x}".encode()).hexdigest() + x

        winners = {
            v for v in remaining
            if all(key(v) < key(u) for u in adj[v] & remaining)
        }
        for v in winners:
            out[v] = r
        remaining -= winners
        for v in winners:
            remaining -= adj[v]
    return out


def test_mis_matches_reference_and_is_valid(ray_session):
    from pybel_ray.ops.graph import mis

    rng = np.random.default_rng(13)
    src = [int(x) for x in rng.integers(0, 40, 140)]
    dst = [int(x) for x in rng.integers(0, 40, 140)]
    pairs = [(s, d) for s, d in zip(src, dst) if s != d]
    exp = _ref_mis(pairs)
    for blocks, forced in ((1, False), (6, False), (4, True)):
        rows = mis(_edges_ds(src, dst, blocks=blocks),
                   a_col="src", b_col="dst",
                   force_distributed=forced).take_all()
        got = {r["node"]: r["mis_round"] for r in rows}
        assert got == {k: v for k, v in exp.items()}, f"forced={forced}"
    # independence + maximality on the undirected graph
    sel = set(got)
    adj = {}
    for s, d in pairs:
        adj.setdefault(str(s), set()).add(str(d))
        adj.setdefault(str(d), set()).add(str(s))
    for v in sel:
        assert not (adj[v] & sel), "MIS not independent"
    for v in set(adj) - sel:
        assert adj[v] & sel, "MIS not maximal"


def test_mis_single_edge_and_isolated_component(ray_session):
    from pybel_ray.ops.graph import mis

    rows = mis(_edges_ds([0, 5], [1, 5], blocks=1),
               a_col="src", b_col="dst").take_all()
    got = {r["node"]: r["mis_round"] for r in rows}
    # self-loop node 5 drops out entirely (no non-loop edges)
    assert set(got) == {"0"} or set(got) == {"1"}


def _ref_weighted_walks(agg_edges, steps):
    """agg_edges: dict (src, dst) -> w (positive)."""
    import hashlib

    adj = {}
    for (s, d), w in sorted(agg_edges.items()):
        if w > 0:
            adj.setdefault(s, []).append((d, w))
    out = []
    for start in sorted(adj):
        cur = start
        out.append((start, 0, start))
        for t in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            tot = sum(w for _, w in nbrs)
            r = int(hashlib.md5(
                f"{start}|{t}".encode(),
            ).hexdigest()[:15], 16) % tot
            acc = 0
            for d, w in nbrs:  # sorted by dst
                if acc <= r < acc + w:
                    cur = d
                    break
                acc += w
            out.append((start, t, cur))
    return sorted(out)


def test_weighted_random_walks_matches_reference(ray_session):
    import ray

    from pybel_ray.ops.graph import weighted_random_walks

    rng = np.random.default_rng(21)
    agg = {}
    for _ in range(120):
        s, d = int(rng.integers(0, 15)), int(rng.integers(0, 15))
        if s != d:
            agg[(s, d)] = agg.get((s, d), 0) + int(rng.integers(1, 9))
    # plant a zero-weight edge: it must never be drawn
    agg[(0, 14)] = 0
    keys = sorted(agg)
    t = pa.Table.from_arrays(
        [pa.array([k[0] for k in keys], pa.int64()),
         pa.array([k[1] for k in keys], pa.int64()),
         pa.array([agg[k] for k in keys], pa.int64())],
        names=["src", "dst", "w"],
    )
    exp = _ref_weighted_walks(agg, 3)
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = weighted_random_walks(ds, 3).take_all()
        got = sorted((r["walk"], r["step"], r["node"]) for r in rows)
        assert got == exp


def test_weighted_random_walks_proportionality(ray_session):
    import ray

    from pybel_ray.ops.graph import weighted_random_walks

    # hub 0 with a 99:1 weight split: across many (src, step) draws the
    # heavy edge must dominate; here just pin determinism + validity of
    # the single draw, and that the chosen nbr's interval contains r
    t = pa.Table.from_arrays(
        [pa.array([0, 0], pa.int64()),
         pa.array([1, 2], pa.int64()),
         pa.array([99, 1], pa.int64())],
        names=["src", "dst", "w"],
    )
    rows = weighted_random_walks(
        ray.data.from_arrow(t), 1,
    ).take_all()
    got = {(r["walk"], r["step"]): r["node"] for r in rows}
    import hashlib

    r = int(hashlib.md5(b"0|1").hexdigest()[:15], 16) % 100
    assert got[(0, 1)] == (1 if r < 99 else 2)


def test_modularity_null_weight_and_endpoint_rows_drop(ray_session):
    import ray

    from pybel_ray.ops.graph import modularity

    t = pa.Table.from_arrays(
        [pa.array([0, 0, None, 1], pa.int64()),
         pa.array([1, 2, 1, None], pa.int64()),
         pa.array([3, None, 2, 2], pa.int64())],
        names=["src", "dst", "w"],
    )
    cds = ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array([0, 1, 2], pa.int64()),
         pa.array([0, 0, 1], pa.int64())],
        names=["node", "comm"],
    ))
    # only the (0 -> 1, w=3) row survives: null weight / endpoints drop
    out = {
        r["comm"]: (r["intra_w"], r["dout_w"], r["din_w"],
                    r["contrib_num"])
        for r in modularity(
            ray.data.from_arrow(t).repartition(2), cds, weight_col="w",
        ).take_all()
    }
    assert out == {0: (3, 3, 3, 3 * 3 - 3 * 3)}


def test_degree_assortativity_null_endpoints_drop(ray_session):
    import ray

    from pybel_ray.ops.graph import degree_assortativity

    t = pa.Table.from_arrays(
        [pa.array([0, None, 1], pa.int64()),
         pa.array([1, 1, None], pa.int64())],
        names=["src", "dst"],
    )
    row = degree_assortativity(
        ray.data.from_arrow(t).repartition(2),
    ).to_pylist()[0]
    # only edge 0->1 survives: outdeg(0)=1, indeg(1)=1
    assert row == {"n": 1, "sum_x": "1", "sum_y": "1",
                   "sum_xx": "1", "sum_yy": "1", "sum_xy": "1"}


def test_weighted_random_walks_overflow_guard(ray_session):
    import pytest
    import ray

    from pybel_ray.ops.graph import weighted_random_walks

    t = pa.Table.from_arrays(
        [pa.array([0, 0], pa.int64()),
         pa.array([1, 2], pa.int64()),
         pa.array([2**62, 2**62], pa.int64())],
        names=["src", "dst", "w"],
    )
    with pytest.raises(Exception, match="out-weight|OverflowError"):
        weighted_random_walks(ray.data.from_arrow(t), 1).count()


def _ref_label_prop(edge_list, w_list, seeds, rounds):
    labeled = {str(k): (str(v), 0) for k, v in seeds.items()}
    frontier = set(labeled)
    for r in range(1, rounds + 1):
        votes = {}
        for (s, d), w in zip(edge_list, w_list):
            s, d = str(s), str(d)
            if s in frontier and d not in labeled:
                lab = labeled[s][0]
                key = (d, lab)
                votes[key] = votes.get(key, 0) + w
        if not votes:
            break
        winners = {}
        for (d, lab), w in votes.items():
            cur = winners.get(d)
            if cur is None or (-w, lab) < (-cur[1], cur[0]):
                winners[d] = (lab, w)
        if not winners:
            break
        frontier = set()
        for d, (lab, _) in winners.items():
            labeled[d] = (lab, r)
            frontier.add(d)
    return {k: v for k, v in labeled.items()}


def test_label_propagation_matches_reference(ray_session):
    import ray

    from pybel_ray.ops.graph import label_propagation

    rng = np.random.default_rng(17)
    pairs = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 25, 120), rng.integers(0, 25, 120))
             if a != b]
    w = [int(x) for x in rng.integers(1, 6, len(pairs))]
    t = pa.Table.from_arrays(
        [pa.array([p[0] for p in pairs], pa.int64()),
         pa.array([p[1] for p in pairs], pa.int64()),
         pa.array(w, pa.int64())],
        names=["src", "dst", "w"],
    )
    seeds = {0: "A", 1: "B", 2: "A"}
    exp = _ref_label_prop(pairs, w, seeds, 5)
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = label_propagation(ds, seeds, 5, weight_col="w").take_all()
        got = {r["node"]: (r["label"], r["lp_round"]) for r in rows}
        assert got == exp
    # unweighted variant agrees with w=1 reference
    rows = label_propagation(
        ray.data.from_arrow(t.select(["src", "dst"])), seeds, 5,
    ).take_all()
    got = {r["node"]: (r["label"], r["lp_round"]) for r in rows}
    assert got == _ref_label_prop(pairs, [1] * len(pairs), seeds, 5)


# ---------------------------------------------------------------------------
# planted over-budget parity: broadcast_budget=0 forces every bucketed
# fallback branch (orientation attach, wedge semi-join, cc attach, peel
# anti-join) and must agree exactly with the broadcast branch
# ---------------------------------------------------------------------------


def _tri_fixture():
    rs = np.random.RandomState(17)
    pairs = [tuple(sorted((int(rs.randint(25)), int(rs.randint(25)))))
             for _ in range(140)]
    # add a hub so degree skew exercises the orientation
    pairs += [(99, i) for i in range(25)]
    return pairs


def test_triangles_bucketed_branch_parity(ray_session):
    from pybel_ray.ops.graph import triangle_counts

    pairs = _tri_fixture()
    fast = triangle_counts(_edge_ds(pairs, blocks=5)).to_pandas()
    slow = triangle_counts(
        _edge_ds(pairs, blocks=5), broadcast_budget=0,
    ).to_pandas()
    assert (dict(zip(fast["node"], fast["n_triangles"]))
            == dict(zip(slow["node"], slow["n_triangles"])))
    assert len(slow) > 0


def test_clustering_bucketed_branch_parity(ray_session):
    from pybel_ray.ops.graph import clustering_coefficients

    pairs = _tri_fixture()
    fast = clustering_coefficients(_edge_ds(pairs, blocks=4)).to_pandas()
    slow = clustering_coefficients(
        _edge_ds(pairs, blocks=4), broadcast_budget=0,
    ).to_pandas()
    key = lambda df: {r.node: (r.deg, r.n_triangles, r.cc_e6)  # noqa: E731
                      for r in df.itertuples()}
    assert key(fast) == key(slow)
    assert (fast["cc_e6"] > 0).any()


def test_kcore_bucketed_branch_parity(ray_session):
    from pybel_ray.ops.graph import kcore

    ids = list(range(20))
    pairs = [(i, i + 1) for i in ids if i % 10 != 9]
    pairs += [(i, i + 2) for i in ids if i % 10 <= 7]
    pairs += [(i, i + 3) for i in ids if i % 10 <= 6 and (i // 10) % 2 == 0]
    spairs = [("%08d" % a, "%08d" % b) for a, b in pairs]
    for k in (2, 3):
        fast = kcore(_edge_ds(spairs, blocks=4), k=k).to_pandas()
        slow = kcore(
            _edge_ds(spairs, blocks=4), k=k, broadcast_budget=0,
        ).to_pandas()
        assert (dict(zip(fast["node"], fast["deg"]))
                == dict(zip(slow["node"], slow["deg"]))), "k=%d" % k
