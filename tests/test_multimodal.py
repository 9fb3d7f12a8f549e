"""Multimodal actor-pool stages: plumbing is real, kernels fake/gated."""

import pytest


@pytest.fixture(scope="module")
def media(ray_session):
    import ray.data

    from pybel_ray.ops.multimodal import fake_media_table

    return ray.data.from_arrow(fake_media_table(48)).repartition(4).materialize()


def test_feature_extractor(media):
    from pybel_ray.ops.multimodal import MediaFeatureExtractor

    out = media.map_batches(
        MediaFeatureExtractor, fn_constructor_kwargs={"mode": "fake"},
        batch_size=8, concurrency=2, batch_format="pyarrow",
    ).take_all()
    assert len(out) == 48
    assert all(len(r["feature"]) == 8 for r in out)
    # deterministic
    by_id = {r["media_id"]: r["feature"] for r in out}
    out2 = media.map_batches(
        MediaFeatureExtractor, fn_constructor_kwargs={"mode": "fake"},
        batch_size=16, concurrency=2, batch_format="pyarrow",
    ).take_all()
    assert {r["media_id"]: r["feature"] for r in out2} == by_id


def test_image_resizer(media):
    from pybel_ray.ops.multimodal import ImageResizer

    out = media.map_batches(
        ImageResizer, fn_constructor_kwargs={"width": 32, "height": 32},
        batch_size=8, concurrency=2, batch_format="pyarrow",
    ).take_all()
    rows = {r["media_id"]: r for r in out}
    assert len(rows) == 48
    for r in rows.values():
        if r["media_type"] == "image":
            assert r["width"] == 32 and r["height"] == 32
        else:
            # pass-through rows untouched
            assert r["width"] != 32 or r["media_type"] == "image"


def test_video_frame_sampler(media):
    from pybel_ray.ops.multimodal import VideoFrameSampler

    n_videos = sum(
        1 for r in media.take_all()
        if r["media_type"] == "video" and r["duration_ms"]
    )
    out = media.map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"frames_per_video": 4},
        batch_size=8, concurrency=2, batch_format="pyarrow",
    ).take_all()
    assert len(out) == n_videos * 4
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for frames in by_media.values():
        stamps = sorted(f["timestamp_ms"] for f in frames)
        assert len(frames) == 4
        assert stamps == sorted(set(stamps))  # distinct timestamps
        assert all(len(f["frame_payload"]) == 64 for f in frames)


def test_real_mode_gated(media):
    from pybel_ray.ops.multimodal import MediaFeatureExtractor

    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(mode="real")._decode(b"x", "image")


def test_media_embedder_batched_inference(media):
    """decode -> batched matmul inference; output is batch-size invariant,
    deterministic, and L2-normalized."""
    import numpy as np

    from pybel_ray.ops.multimodal import MediaEmbedder, MediaFeatureExtractor

    def run(batch_size):
        feats = media.map_batches(
            MediaFeatureExtractor, fn_constructor_kwargs={"mode": "fake"},
            batch_size=8, concurrency=2, batch_format="pyarrow",
        )
        out = feats.map_batches(
            MediaEmbedder, fn_constructor_kwargs={"out_dim": 16},
            batch_size=batch_size, concurrency=2, batch_format="pyarrow",
        )
        return {
            r["media_id"]: np.asarray(r["embedding"], dtype=np.float32)
            for r in out.take_all()
        }

    a, b = run(64), run(5)
    assert set(a) == set(b) and len(a) == 48
    for mid in a:
        assert a[mid].shape == (16,)
        np.testing.assert_allclose(a[mid], b[mid], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(a[mid]), 1.0, rtol=1e-5)
