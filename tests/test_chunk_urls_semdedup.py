"""Chunking, sentence splitting, URL parsing, SemDeDup — planted edge
cases (overlap windows, empty docs, unparseable urls, known duplicate
clusters).  The corpus-vs-DuckDB checks live in test_queries_oracle.py."""

import numpy as np
import pyarrow as pa


def _ds(rows):
    import ray

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_chunk_text_overlap(ray_session):
    from pybel_ray.ops.chunk import chunk_text

    docs = [{"doc_id": 1, "text": "a b c d e f g"}]
    out = sorted(
        (r["chunk_id"], r["chunk"], r["n_tokens"])
        for r in chunk_text(_ds(docs), chunk=4, stride=2).take_all()
    )
    assert out == [
        (0, "a b c d", 4),
        (1, "c d e f", 4),
        (2, "e f g", 3),
        (3, "g", 1),
    ]


def test_chunk_text_no_overlap_and_exact_fit(ray_session):
    from pybel_ray.ops.chunk import chunk_text

    docs = [{"doc_id": 1, "text": "a b c d"}, {"doc_id": 2, "text": "x"}]
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk"])
        for r in chunk_text(_ds(docs), chunk=2, stride=2).take_all()
    )
    assert out == [(1, 0, "a b"), (1, 1, "c d"), (2, 0, "x")]


def test_chunk_whitespace_normalized(ray_session):
    from pybel_ray.ops.chunk import chunk_text

    docs = [{"doc_id": 1, "text": "  a\t b \n c  "}]
    [row] = chunk_text(_ds(docs), chunk=10, stride=10).take_all()
    assert row["chunk"] == "a b c"
    assert row["n_tokens"] == 3


def test_split_sentences(ray_session):
    from pybel_ray.ops.chunk import split_sentences

    docs = [
        {"doc_id": 1, "text": "One two. Three!  Four?!Five... "},
        {"doc_id": 2, "text": "no terminator here"},
        {"doc_id": 3, "text": "..."},
    ]
    out = sorted(
        (r["doc_id"], r["sent_id"], r["sentence"])
        for r in split_sentences(_ds(docs)).take_all()
    )
    assert out == [
        (1, 1, "One two"), (1, 2, "Three"), (1, 3, "Four"), (1, 4, "Five"),
        (2, 1, "no terminator here"),
    ]


def test_add_url_parts(ray_session):
    from pybel_ray.ops.urls import add_url_parts

    rows = [
        {"doc_id": 1, "url": "https://a.example.com/x/y?q=1#frag"},
        {"doc_id": 2, "url": "http://b.org"},
        {"doc_id": 3, "url": "not a url"},
    ]
    out = {r["doc_id"]: r for r in add_url_parts(_ds(rows)).take_all()}
    assert (out[1]["scheme"], out[1]["host"], out[1]["path"]) == (
        "https", "a.example.com", "/x/y",
    )
    assert (out[2]["host"], out[2]["path"]) == ("b.org", "")
    assert (out[3]["scheme"], out[3]["host"], out[3]["path"]) == ("", "", "")


def test_domain_stats(ray_session):
    from pybel_ray.ops.urls import domain_stats

    rows = [
        {"doc_id": i, "url": f"https://{h}/p/{i}", "n_chars": 10 * (i + 1)}
        for i, h in enumerate(["a.com", "b.com", "a.com"])
    ]
    out = {r["host"]: r for r in
           domain_stats(_ds(rows), weight_col="n_chars").take_all()}
    assert out["a.com"]["n_docs"] == 2 and out["a.com"]["total_n_chars"] == 40
    assert out["b.com"]["n_docs"] == 1 and out["b.com"]["total_n_chars"] == 20


def _planted_vectors():
    """Two tight clusters around orthogonal axes + one outlier; vec 0/1
    are the centroids."""
    rng = np.random.default_rng(7)
    a = np.eye(8)[0]
    b = np.eye(8)[1]
    rows = []
    for i, base in enumerate([a, b]):  # centroids, ids 0 and 1
        rows.append({"vec_id": i, "embedding": base.tolist()})
    vid = 2
    for base in (a, b):
        for _ in range(3):  # near-duplicates of each centroid
            v = base + rng.normal(0, 0.01, 8)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    rows.append({"vec_id": vid, "embedding": (-np.eye(8)[2]).tolist()})
    return rows


def test_assign_centroids(ray_session):
    from pybel_ray.ops.semdedup import assign_centroids

    rows = _planted_vectors()
    cent = np.array([rows[0]["embedding"], rows[1]["embedding"]])
    out = {r["vec_id"]: r["centroid_id"] for r in
           assign_centroids(_ds(rows), cent).take_all()}
    assert out[0] == 0 and out[1] == 1
    assert all(out[i] == 0 for i in (2, 3, 4))
    assert all(out[i] == 1 for i in (5, 6, 7))


def test_semantic_dedup_drops_near_dups(ray_session):
    from pybel_ray.ops.semdedup import semantic_dedup

    rows = _planted_vectors()
    cent = np.array([rows[0]["embedding"], rows[1]["embedding"]])
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(_ds(rows), cent, threshold=0.95).take_all()}
    # the lowest id in each cluster survives; its near-dups are dropped
    assert out[0] and not out[2] and not out[3] and not out[4]
    assert out[1] and not out[5] and not out[6] and not out[7]
    assert out[8]  # the outlier has no close lower-id neighbor
    assert len(out) == 9


def test_semantic_dedup_chain_rule(ray_session):
    """A chain a~b, b~c with a!~c drops BOTH b and c: the rule tests for
    any close lower-id neighbor, whether or not that neighbor itself
    survived (visit-order independence — matches the EXISTS oracle)."""
    from pybel_ray.ops.semdedup import semantic_dedup

    th = np.pi / 5  # pairwise angle: adjacent ~cos(36deg)=0.81, ends 0.31
    vecs = [
        [np.cos(0), np.sin(0), 0.0],
        [np.cos(th), np.sin(th), 0.0],
        [np.cos(2 * th), np.sin(2 * th), 0.0],
    ]
    rows = [{"vec_id": i, "embedding": v} for i, v in enumerate(vecs)]
    cent = np.array([[1.0, 0.0, 0.0]])
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(_ds(rows), cent, threshold=0.5).take_all()}
    assert out == {0: True, 1: False, 2: False}


def test_semdedup_oracle_threshold_margin():
    """ADVICE r2: the driver oracle compares strict float thresholds
    (sim > 0.4, argmax) computed by two engines with different operation
    orders.  Verify on the actual bench corpora that every within-cluster
    pairwise similarity and every argmax runner-up gap sits far from the
    decision boundary (>> 1e-9, vastly above accumulated ulp error), so
    the oracle cannot flip on rounding."""
    import os

    import pyarrow.parquet as pq

    THRESHOLD = 0.4  # must match emb_semantic_dedup in __ray_entry__.py
    EPS = 1e-6
    for sf in ("sf0.001", "sf0.01"):
        path = os.path.join("/root/testdata", sf, "embeddings.parquet")
        t = pq.read_table(path)
        order = np.argsort(t.column("vec_id").to_numpy())
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        cent = mat[:8]  # _first_k_centroids: vec_id 0..7
        sims_c = mat @ cent.T
        top2 = np.sort(sims_c, axis=1)[:, -2:]
        gaps = top2[:, 1] - top2[:, 0]
        # argmax margin (ignore the centroids themselves, which tie at 1
        # only with an exact self-match)
        assert gaps.min() > EPS, (sf, gaps.min())
        assign = np.argmax(sims_c, axis=1)
        worst = np.inf
        for c in range(8):
            sub = mat[assign == c]
            if len(sub) < 2:
                continue
            s = sub @ sub.T
            iu = np.triu_indices(len(sub), k=1)
            d = np.abs(s[iu] - THRESHOLD)
            worst = min(worst, d.min())
        assert worst > EPS, (sf, worst)


def test_fim_split_reconstruction_and_short_docs(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.chunk import fim_split

    texts = ["x" * 100, "short", None, "a" * 16]
    t = pa.Table.from_arrays(
        [pa.array([1, 2, 3, 4], pa.int64()),
         pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )
    out = fim_split(
        ray.data.from_arrow(t).repartition(2),
    ).to_pandas().set_index("doc_id")
    for i, txt in zip([1, 2, 3, 4], texts):
        row = out.loc[i]
        assert row.fim_prefix + row.fim_middle + row.fim_suffix == (txt or "")
    # short/null docs pass through untouched
    assert out.loc[2].fim_prefix == "short" and out.loc[2].fim_middle == ""
    assert out.loc[3].fim_prefix == ""
    # long doc actually splits (cut points are hash-chosen but valid)
    assert out.loc[1].fim_middle != "" or out.loc[1].fim_suffix != ""
