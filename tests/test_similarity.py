"""kNN: brute vs LSH (inline + persisted index) cross-checks."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def clustered(ray_session):
    """Vectors with planted cluster structure so LSH buckets are informative."""
    import ray.data

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((8, 32)) * 3
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(40):
            v = centers[c] + rng.standard_normal(32) * 0.3
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    return ray.data.from_items(rows).repartition(4).materialize()


def test_knn_brute_exact(clustered):
    from pybel_ray.ops.similarity import get_vector, knn_brute

    q = get_vector(clustered, 0)
    got = [r["vec_id"] for r in knn_brute(clustered, q, k=5).take_all()]
    # exact: the query itself must rank first
    assert got[0] == 0
    # all top-5 should come from the same planted cluster (ids 0..39)
    assert all(v < 40 for v in got)


def test_knn_lsh_recall_and_index_consistency(clustered, tmp_path):
    from pybel_ray.ops.similarity import (
        build_lsh_index,
        get_vector,
        knn_brute,
        knn_lsh,
    )

    q = get_vector(clustered, 3)
    brute = [r["vec_id"] for r in knn_brute(clustered, q, k=10).take_all()]
    inline = [r["vec_id"] for r in knn_lsh(clustered, q, k=10).take_all()]
    index = build_lsh_index(clustered, str(tmp_path / "idx"))
    indexed = [r["vec_id"] for r in knn_lsh(clustered, q, k=10, index=index).take_all()]
    # the persisted-index path must reproduce the inline path exactly
    assert indexed == inline
    # on clustered data the probe buckets hold the true neighbors
    recall = len(set(inline) & set(brute)) / 10
    assert recall >= 0.8, (recall, inline, brute)


def test_knn_brute_multi_matches_single(clustered):
    import numpy as np

    from pybel_ray.ops.similarity import get_vector, knn_brute, knn_brute_multi

    q0 = get_vector(clustered, 0)
    q1 = get_vector(clustered, 200)
    multi = knn_brute_multi(clustered, np.stack([q0, q1]), k=5).take_all()
    by_query = {}
    for r in multi:
        by_query.setdefault(r["query_idx"], []).append(r["vec_id"])
    single0 = [r["vec_id"] for r in knn_brute(clustered, q0, k=5).take_all()]
    single1 = [r["vec_id"] for r in knn_brute(clustered, q1, k=5).take_all()]
    assert by_query[0] == single0
    assert by_query[1] == single1


def test_ivf_index_recall(clustered, tmp_path):
    from pybel_ray.ops.similarity import (
        build_ivf_index,
        get_vector,
        knn_brute,
        knn_ivf,
    )

    index = build_ivf_index(clustered, str(tmp_path / "ivf"), n_centroids=8)
    q = get_vector(clustered, 45)
    brute = [r["vec_id"] for r in knn_brute(clustered, q, k=10).take_all()]
    approx = [r["vec_id"] for r in knn_ivf(index, q, k=10, nprobe=2).take_all()]
    recall = len(set(approx) & set(brute)) / 10
    # 8 planted clusters, 8 centroids: the query's cluster maps to one
    # centroid, so nprobe=2 must recover nearly all true neighbors
    assert recall >= 0.8, (recall, approx, brute)
    # probing must scan fewer vectors than the corpus
    pruned = index.read_buckets(index.probes_for(q, 2))
    assert pruned.count() < clustered.count()


def test_lsh_index_prunes_partitions(clustered, tmp_path):
    """The indexed read must touch only the probe buckets' files."""
    from pybel_ray.ops.similarity import build_lsh_index, get_vector

    index = build_lsh_index(clustered, str(tmp_path / "idx"))
    q = get_vector(clustered, 100)
    probes = index.probes_for(q)
    pruned = index.read_buckets(probes)
    got_buckets = {
        int(r["bucket"]) for r in pruned.select_columns(["bucket"]).take_all()
    }
    assert got_buckets <= set(probes)
    assert pruned.count() < clustered.count()


def test_quantize_embeddings_roundtrip(ray_session):
    """int8 quantization preserves cosine similarity to ~1% and stays in
    [-127, 127]; the scale is corpus-wide (max element maps to ±127)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pybel_ray.ops.similarity import max_abs_value, quantize_embeddings

    rs = np.random.RandomState(2)
    vecs = rs.randn(200, 32) * 3.0
    t = pa.Table.from_pylist([
        {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)
    ])
    ds = ray.data.from_arrow(t).repartition(5)
    assert abs(max_abs_value(ds) - np.abs(vecs).max()) < 1e-12

    out = quantize_embeddings(ds).take_all()
    q = np.array([r["embedding_q"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert q.min() >= -127 and q.max() <= 127
    assert np.abs(q).max() == 127  # corpus-wide scale saturates once
    # cosine preserved
    for i in range(0, 200, 37):
        a, b = vecs[i], q[i].astype(np.float64)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.995


def test_srp_projection_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from pybel_ray.ops.similarity import (
        signed_random_projection, srp_sign_matrix,
    )

    rng = np.random.default_rng(5)
    x = rng.normal(size=(40, 16)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in x],
                              pa.list_(pa.float32())),
    })
    out = signed_random_projection(
        ray.data.from_arrow(t).repartition(5), k=4,
    ).to_pandas().sort_values(["vec_id", "j"]).reset_index(drop=True)
    q = np.floor(np.asarray(x, np.float64) * 1e6 + 0.5).astype(np.int64)
    ref = q @ srp_sign_matrix(16, 4)
    assert (out.proj_e6.to_numpy().reshape(40, 4) == ref).all()


def test_srp_projection_skips_null_vectors(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.similarity import signed_random_projection

    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], None], pa.list_(pa.float32())),
    })
    out = signed_random_projection(ray.data.from_arrow(t), k=3).to_pandas()
    assert sorted(out.vec_id.unique()) == [0]
    assert len(out) == 3
