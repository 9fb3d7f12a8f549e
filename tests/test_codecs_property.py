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


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_any_shape(w, h, seed):
    from pybel_ray.ops.imagecodec import decode_png, encode_png, sniff_format

    arr = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3),
    ).astype(np.uint8)
    payload = encode_png(arr)
    assert sniff_format(payload) == "png"
    np.testing.assert_array_equal(decode_png(payload), arr)


def _png_with_filters(arr, filters):
    """Hand-build a PNG whose scanlines use the GIVEN filter types —
    the decoder must reverse Sub/Up/Average/Paeth, which our own
    encoder (always filter 0) never produces."""
    import struct
    import zlib

    from pybel_ray.ops.imagecodec import _png_chunk

    h, w, _ = arr.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, np.int64)
    for y, f in zip(range(h), filters):
        cur = arr[y].reshape(-1).astype(np.int64)
        if f == 0:
            filt = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            filt = np.zeros(w * bpp, np.int64)
            for x in range(w * bpp):
                left = cur[x - bpp] if x >= bpp else 0
                filt[x] = (cur[x] - (left + prev[x]) // 2) % 256
        elif f == 4:
            filt = np.zeros(w * bpp, np.int64)
            for x in range(w * bpp):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pcv = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pcv) else (
                    b if pb <= pcv else c)
                filt[x] = (cur[x] - pred) % 256
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (sig + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_all_filter_types_decode(w, h, seed):
    from pybel_ray.ops.imagecodec import decode_png

    rs = np.random.RandomState(seed)
    arr = rs.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    filters = rs.randint(0, 5, size=h).tolist()
    np.testing.assert_array_equal(
        decode_png(_png_with_filters(arr, filters)), arr,
    )


def test_png_gray_and_alpha_color_types():
    """Color types 0/4/6 decode to RGB (gray broadcast, alpha dropped)."""
    import struct
    import zlib

    from pybel_ray.ops.imagecodec import _png_chunk, decode_png

    sig = b"\x89PNG\r\n\x1a\n"
    rs = np.random.RandomState(3)

    def build(color, channels, arr):
        h, w = arr.shape[:2]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        scan = np.zeros((h, w * channels + 1), np.uint8)
        scan[:, 1:] = arr.reshape(h, -1)
        return (sig + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
                + _png_chunk(b"IEND", b""))

    gray = rs.randint(0, 256, size=(5, 7, 1)).astype(np.uint8)
    out = decode_png(build(0, 1, gray))
    np.testing.assert_array_equal(out, np.repeat(gray, 3, axis=2))

    ga = rs.randint(0, 256, size=(5, 7, 2)).astype(np.uint8)
    out = decode_png(build(4, 2, ga))
    np.testing.assert_array_equal(out, np.repeat(ga[:, :, :1], 3, axis=2))

    rgba = rs.randint(0, 256, size=(5, 7, 4)).astype(np.uint8)
    out = decode_png(build(6, 4, rgba))
    np.testing.assert_array_equal(out, rgba[:, :, :3])
