"""Vendored pure-numpy audio codec: RIFF/WAVE PCM (8-bit and 16-bit).

No audio libraries exist in this environment, so the multimodal stages'
``mode='real'`` audio kernels decode canonical WAV files directly from the
public RIFF/WAVE specification: a ``RIFF`` container with a ``WAVE`` form
type, a ``fmt `` chunk (PCM format tag 1, or WAVE_FORMAT_EXTENSIBLE with a
PCM sub-format), and a ``data`` chunk of interleaved little-endian samples.
Unknown chunks (``LIST``, ``fact``, ``cue ``, ...) are skipped by chunk
walking, exactly as the spec requires.  Everything is vectorized numpy —
one ``frombuffer`` + reshape per file, no per-sample Python.

Compressed codecs (MP3/AAC/FLAC/...) remain gated behind external
libraries that are absent here.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_wav",
    "encode_wav",
    "resample_nearest",
    "sniff_audio_format",
]

_PCM_TAGS = (1, 0xFFFE)  # WAVE_FORMAT_PCM, WAVE_FORMAT_EXTENSIBLE


def sniff_audio_format(payload: bytes) -> str | None:
    """'wav' | None from magic bytes."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> ((n_frames, channels) int16 array, sample_rate).

    8-bit unsigned samples are widened to int16 (centered, << 8) so callers
    see one dtype; 16-bit samples pass through zero-copy.
    """
    if sniff_audio_format(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data_off = data_len = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            tag, channels, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            data_off, data_len = body, clen
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_off is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, bits = fmt
    if tag not in _PCM_TAGS:
        raise ValueError("only PCM WAV supported (format tag {})".format(tag))
    if channels < 1:
        raise ValueError("invalid channel count {}".format(channels))
    data_len = min(data_len, len(payload) - data_off)
    if bits == 16:
        count = data_len // 2
        samples = np.frombuffer(payload, dtype="<i2", count=count, offset=data_off)
    elif bits == 8:
        raw = np.frombuffer(payload, dtype=np.uint8, count=data_len, offset=data_off)
        samples = ((raw.astype(np.int16) - 128) << 8)
    else:
        raise ValueError("only 8/16-bit PCM supported (bits={})".format(bits))
    n_frames = samples.shape[0] // channels
    return samples[: n_frames * channels].reshape(n_frames, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) int16 array -> canonical PCM WAV."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be 1-D or 2-D (frames, channels)")
    n_frames, channels = arr.shape
    data = arr.reshape(-1).tobytes()
    block_align = channels * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def resample_nearest(samples: np.ndarray, rate_from: int, rate_to: int) -> np.ndarray:
    """Sample-center nearest-neighbor rate conversion (the audio analog of
    the image codec's pixel-center nearest resize — deterministic, exact
    for integer rate ratios, no filtering)."""
    if rate_from == rate_to:
        return samples
    n_in = samples.shape[0]
    n_out = max(1, int(round(n_in * rate_to / rate_from)))
    idx = np.minimum(
        ((np.arange(n_out) + 0.5) * n_in / n_out).astype(np.int64), n_in - 1,
    )
    return samples[idx]
