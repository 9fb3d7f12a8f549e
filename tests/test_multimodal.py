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
    """compressed audio/video stays codec-gated; non-BMP/PPM image bytes get
    a clear format error from the vendored codec."""
    from pybel_ray.ops.multimodal import (
        AudioResampler, MediaFeatureExtractor, VideoFrameSampler,
    )

    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(mode="real")._decode(b"ID3\x04mp3data", "audio")
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(mode="real")._decode(b"\x00h264", "video")
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(mode="real")._real_frames(b"\x00h264", 1000)
    with pytest.raises(NotImplementedError):
        AudioResampler(rate=8000, mode="real")._resample(b"ID3\x04mp3data")
    with pytest.raises(ValueError, match="unsupported image format"):
        MediaFeatureExtractor(mode="real")._decode(b"\x89PNG1234", "image")


def test_imagecodec_roundtrip():
    import numpy as np

    from pybel_ray.ops.imagecodec import (
        decode_bmp, decode_image, decode_ppm, encode_bmp, encode_ppm,
        resize_nearest, sniff_format,
    )

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(13, 21, 3)).astype(np.uint8)
    bmp = encode_bmp(arr)
    ppm = encode_ppm(arr)
    assert sniff_format(bmp) == "bmp" and sniff_format(ppm) == "ppm"
    np.testing.assert_array_equal(decode_bmp(bmp), arr)
    np.testing.assert_array_equal(decode_ppm(ppm), arr)
    np.testing.assert_array_equal(decode_image(bmp), decode_image(ppm))
    # PPM comment handling
    commented = b"P6\n# a comment\n21 13\n255\n" + arr.tobytes()
    np.testing.assert_array_equal(decode_ppm(commented), arr)
    # nearest resize: identity at same size; 2x downscale picks pixel centers
    np.testing.assert_array_equal(resize_nearest(arr, 21, 13), arr)
    small = resize_nearest(arr, 10, 6)
    assert small.shape == (6, 10, 3)
    assert small[0, 0].tolist() == arr[1, 1].tolist()


def test_image_resizer_real_mode(ray_session):
    """mode='real' end-to-end: decode -> resize -> re-encode in the source
    format, verified by decoding the output payloads back."""
    import numpy as np
    import ray

    from pybel_ray.ops.imagecodec import decode_image, resize_nearest, sniff_format
    from pybel_ray.ops.multimodal import ImageResizer, synthetic_image_table

    src = synthetic_image_table(12)
    out = ray.data.from_arrow(src).map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": 16, "height": 12, "mode": "real"},
        batch_size=4, concurrency=2, batch_format="pyarrow",
    ).take_all()
    src_payloads = {r["media_id"]: r["payload"] for r in src.to_pylist()}
    assert len(out) == 12
    for r in out:
        assert (r["width"], r["height"]) == (16, 12)
        original = src_payloads[r["media_id"]]
        # output keeps the source container format
        assert sniff_format(r["payload"]) == sniff_format(original)
        got = decode_image(r["payload"])
        want = resize_nearest(decode_image(original), 16, 12)
        np.testing.assert_array_equal(got, want)


def test_feature_extractor_real_mode(ray_session):
    """mode='real' features are true pixel statistics of the decoded image."""
    import numpy as np
    import ray

    from pybel_ray.ops.imagecodec import decode_image
    from pybel_ray.ops.multimodal import MediaFeatureExtractor, synthetic_image_table

    src = synthetic_image_table(8)
    out = ray.data.from_arrow(src).map_batches(
        MediaFeatureExtractor, fn_constructor_kwargs={"mode": "real"},
        batch_size=4, concurrency=2, batch_format="pyarrow",
    ).take_all()
    payloads = {r["media_id"]: r["payload"] for r in src.to_pylist()}
    for r in out:
        arr = decode_image(payloads[r["media_id"]]).astype(np.float32)
        feat = np.asarray(r["feature"], dtype=np.float32)
        np.testing.assert_allclose(
            feat[:3], arr.reshape(-1, 3).mean(axis=0) / 255.0, rtol=1e-5,
        )
        np.testing.assert_allclose(
            feat[3:6], arr.reshape(-1, 3).std(axis=0) / 255.0, rtol=1e-4,
        )


def test_audiocodec_roundtrip():
    import io
    import wave

    import numpy as np

    from pybel_ray.ops.audiocodec import (
        decode_wav, encode_wav, resample_nearest, sniff_audio_format,
    )

    rng = np.random.RandomState(3)
    stereo = (rng.standard_normal((700, 2)) * 9000).astype(np.int16)
    payload = encode_wav(stereo, 16000)
    assert sniff_audio_format(payload) == "wav"
    samples, rate = decode_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(samples, stereo)
    # our encoder emits canonical WAV the stdlib reader accepts
    w = wave.open(io.BytesIO(payload))
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (2, 2, 16000)
    assert w.readframes(700) == stereo.tobytes()
    # unknown chunks are skipped per the RIFF spec
    import struct

    riff_len = struct.unpack_from("<I", payload, 4)[0]
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    padded = (payload[:12] + junk + payload[12:4 + 8 + riff_len])
    padded = padded[:4] + struct.pack("<I", riff_len + len(junk)) + padded[8:]
    samples2, rate2 = decode_wav(padded)
    np.testing.assert_array_equal(samples2, stereo)
    # integer-ratio downsample keeps every other frame's neighborhood
    down = resample_nearest(stereo, 16000, 8000)
    assert down.shape == (350, 2)


def test_videocodec_roundtrip():
    import numpy as np

    from pybel_ray.ops.videocodec import decode_avi, encode_avi, sniff_video_format

    rng = np.random.RandomState(4)
    frames = rng.randint(0, 256, size=(6, 11, 19, 3)).astype(np.uint8)
    payload = encode_avi(frames, fps=12.0)
    assert sniff_video_format(payload) == "avi"
    got, fps = decode_avi(payload)
    assert fps == pytest.approx(12.0, rel=1e-4)
    np.testing.assert_array_equal(got, frames)


def test_audio_features_real_mode(ray_session):
    """mode='real' audio features are true signal statistics of the PCM."""
    import numpy as np
    import ray

    from pybel_ray.ops.audiocodec import decode_wav
    from pybel_ray.ops.multimodal import MediaFeatureExtractor, synthetic_audio_table

    src = synthetic_audio_table(10)
    out = ray.data.from_arrow(src).map_batches(
        MediaFeatureExtractor, fn_constructor_kwargs={"mode": "real"},
        batch_size=4, concurrency=2, batch_format="pyarrow",
    ).take_all()
    payloads = {r["media_id"]: r["payload"] for r in src.to_pylist()}
    assert len(out) == 10
    for r in out:
        samples, rate = decode_wav(payloads[r["media_id"]])
        mono = samples.mean(axis=1) / 32768.0
        feat = np.asarray(r["feature"], dtype=np.float32)
        np.testing.assert_allclose(feat[2], np.sqrt(np.mean(mono ** 2)), rtol=1e-4)
        np.testing.assert_allclose(feat[7], np.log1p(rate), rtol=1e-5)
        # a clean sine at f has spectral peak near f/nyquist
        assert 0.0 < feat[5] < 1.0


def test_audio_resampler_real_mode(ray_session):
    """decode -> nearest resample -> re-encode, verified sample-exact."""
    import numpy as np
    import ray

    from pybel_ray.ops.audiocodec import decode_wav, resample_nearest
    from pybel_ray.ops.multimodal import AudioResampler, synthetic_audio_table

    src = synthetic_audio_table(8)
    out = ray.data.from_arrow(src).map_batches(
        AudioResampler, fn_constructor_kwargs={"rate": 4000, "mode": "real"},
        batch_size=4, concurrency=2, batch_format="pyarrow",
    ).take_all()
    payloads = {r["media_id"]: r["payload"] for r in src.to_pylist()}
    for r in out:
        got, rate = decode_wav(r["payload"])
        assert rate == 4000
        orig, orig_rate = decode_wav(payloads[r["media_id"]])
        want = resample_nearest(orig, orig_rate, 4000)
        np.testing.assert_array_equal(got, want)


def test_video_frame_sampler_real_mode(ray_session):
    """mode='real': sampled frame payloads are true decoded AVI frames,
    re-encoded as BMP."""
    import numpy as np
    import ray

    from pybel_ray.ops.imagecodec import decode_image, sniff_format
    from pybel_ray.ops.multimodal import VideoFrameSampler, synthetic_video_table
    from pybel_ray.ops.videocodec import decode_avi

    src = synthetic_video_table(6)
    out = ray.data.from_arrow(src).map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"frames_per_video": 3, "mode": "real"},
        batch_size=2, concurrency=2, batch_format="pyarrow",
    ).take_all()
    assert len(out) == 6 * 3
    source = {r["media_id"]: r["payload"] for r in src.to_pylist()}
    for r in out:
        frames, _fps = decode_avi(source[r["media_id"]])
        n = frames.shape[0]
        src_idx = min(int(n * (r["frame_index"] + 0.5) / 3), n - 1)
        assert sniff_format(r["frame_payload"]) == "bmp"
        np.testing.assert_array_equal(
            decode_image(r["frame_payload"]), frames[src_idx],
        )


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
