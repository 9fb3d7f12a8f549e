"""Property tests for the vendored pure-numpy media codecs: any valid
array round-trips bit-exactly through encode -> decode (these are the
kernels behind every multimodal ``mode='real'`` stage, so shape/padding
edge cases matter more than the synthetic fixtures exercise)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_ppm_roundtrip_any_shape(w, h, seed):
    from pybel_ray.ops.imagecodec import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm,
    )

    arr = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3),
    ).astype(np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(arr)), arr)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4000),
    channels=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([4000, 8000, 11025, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_any_shape(n, channels, rate, seed):
    from pybel_ray.ops.audiocodec import decode_wav, encode_wav

    samples = np.random.RandomState(seed).randint(
        -32768, 32768, size=(n, channels),
    ).astype(np.int16)
    got, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(got, samples)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=8),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_avi_roundtrip_any_shape(n, w, h, seed):
    from pybel_ray.ops.videocodec import decode_avi, encode_avi

    frames = np.random.RandomState(seed).randint(
        0, 256, size=(n, h, w, 3),
    ).astype(np.uint8)
    got, fps = decode_avi(encode_avi(frames, fps=10.0))
    assert fps == 10.0
    np.testing.assert_array_equal(got, frames)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    rate_from=st.sampled_from([8000, 16000, 44100]),
    rate_to=st.sampled_from([4000, 8000, 22050]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_resample_output_length_and_membership(n, rate_from, rate_to, seed):
    """Nearest resampling: output frame count == round(n * to/from), and
    every output frame is one of the input frames (no interpolation)."""
    from pybel_ray.ops.audiocodec import resample_nearest

    samples = np.random.RandomState(seed).randint(
        -32768, 32768, size=(n, 1),
    ).astype(np.int16)
    out = resample_nearest(samples, rate_from, rate_to)
    assert out.shape[0] == max(1, int(round(n * rate_to / rate_from)))
    in_set = set(samples[:, 0].tolist())
    assert set(out[:, 0].tolist()) <= in_set
