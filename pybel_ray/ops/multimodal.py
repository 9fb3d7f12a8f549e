"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata.  ALL
three modalities have real decode kernels via vendored pure-numpy codecs:
images as uncompressed BMP / binary PPM (:mod:`.imagecodec`), audio as
RIFF/WAVE PCM (:mod:`.audiocodec`), video as uncompressed 24-bit RGB AVI
(:mod:`.videocodec`).  Compressed formats (PNG/JPEG, MP3, H.264, ...)
fall back to external libraries when present and raise a clear
``NotImplementedError`` otherwise; ``mode='fake'`` deterministic
hash-based stand-ins remain for plumbing tests that don't want real
payloads.  The Ray-side shape (schema, actor-pool stage, small batches
for large payloads, output layout) is identical in both modes.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "FRAME_SCHEMA",
    "AudioResampler",
    "MediaFeatureExtractor",
    "MediaEmbedder",
    "ImageResizer",
    "VideoFrameSampler",
    "fake_media_table",
    "synthetic_audio_table",
    "synthetic_image_table",
    "synthetic_video_table",
]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("url", pa.string()),
    ("media_type", pa.string()),   # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthetic_image_table(n: int = 16, seed: int = 5) -> pa.Table:
    """Deterministic REAL image rows: gradient+noise pixel arrays encoded
    as uncompressed BMP (id % 3 == 0) / binary PPM (1) / zlib PNG (2) —
    all decodable by the vendored codec, so ``mode='real'`` stages run
    end-to-end in CI including a genuinely compressed format."""
    from .imagecodec import encode_bmp, encode_png, encode_ppm

    rng = np.random.RandomState(seed)
    rows = []
    encoders = [encode_bmp, encode_ppm, encode_png]
    for i in range(n):
        w = 24 + (i % 4) * 8
        h = 16 + (i % 3) * 8
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            rng.randint(0, 256, size=(h, w)),
        ], axis=-1).astype(np.uint8)
        payload = encoders[i % 3](arr)
        rows.append({
            "media_id": i,
            "url": "https://example.org/img/{:06d}".format(i),
            "media_type": "image",
            "payload": payload,
            "width": w,
            "height": h,
            "duration_ms": None,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def synthetic_audio_table(n: int = 16, seed: int = 7) -> pa.Table:
    """Deterministic REAL audio rows: sine + noise int16 PCM encoded as
    canonical WAV — decodable by the vendored codec, so ``mode='real'``
    audio stages run end-to-end in CI."""
    from .audiocodec import encode_wav

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rate = 8000 if i % 2 == 0 else 16000
        channels = 1 if i % 3 else 2
        n_frames = rate // 10 + (i % 5) * rate // 100  # 100-140 ms
        t = np.arange(n_frames) / rate
        freq = 220.0 * (1 + i % 8)
        wave_ = np.sin(2 * np.pi * freq * t) * 12000
        noise = rng.standard_normal(n_frames) * 500
        mono = (wave_ + noise).astype(np.int16)
        samples = mono if channels == 1 else np.stack([mono, mono // 2], axis=1)
        rows.append({
            "media_id": i,
            "url": "https://example.org/audio/{:06d}".format(i),
            "media_type": "audio",
            "payload": encode_wav(samples, rate),
            "width": None,
            "height": None,
            "duration_ms": int(n_frames * 1000 / rate),
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def synthetic_video_table(n: int = 8, seed: int = 9) -> pa.Table:
    """Deterministic REAL video rows: short gradient+noise frame sequences
    encoded as uncompressed 24-bit AVI — decodable by the vendored codec,
    so ``mode='real'`` video stages run end-to-end in CI."""
    from .videocodec import encode_avi

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        w = 16 + (i % 3) * 8
        h = 12 + (i % 2) * 8
        k = 4 + i % 5
        fps = 10.0
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.stack([
            np.stack([
                (xx * 255 // max(w - 1, 1) + 7 * j) % 256,
                (yy * 255 // max(h - 1, 1)) % 256,
                rng.randint(0, 256, size=(h, w)),
            ], axis=-1)
            for j in range(k)
        ]).astype(np.uint8)
        rows.append({
            "media_id": i,
            "url": "https://example.org/video/{:06d}".format(i),
            "media_type": "video",
            "payload": encode_avi(frames, fps=fps),
            "width": w,
            "height": h,
            "duration_ms": int(k * 1000 / fps),
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def fake_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows (payload = seeded pseudo-bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        media_type = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(256 + (i % 7) * 64)
        rows.append({
            "media_id": i,
            "url": "https://example.org/media/{:06d}".format(i),
            "media_type": media_type,
            "payload": payload,
            "width": 64 + (i % 4) * 32 if media_type != "audio" else None,
            "height": 64 + (i % 3) * 32 if media_type != "audio" else None,
            "duration_ms": 1000 * (1 + i % 30) if media_type != "image" else None,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize media payloads.

    Use with small ``batch_size`` (large binary payloads) and
    ``concurrency=(1, N)``:

        ds.map_batches(MediaFeatureExtractor, fn_constructor_kwargs={...},
                       batch_size=8, concurrency=(1, 8),
                       batch_format="pyarrow")

    ``mode='fake'`` produces a deterministic 8-dim feature from the payload
    hash (tests the plumbing); ``mode='real'`` decodes with the vendored
    codecs — BMP/PPM images (per-channel pixel mean/std + log dims),
    WAV audio (level/rms, zero-crossing rate, spectral centroid + peak
    frequency from one rFFT, log frames/rate) and uncompressed AVI video
    (per-channel mean/std over all frames + log frame count/area).
    Compressed formats raise NotImplementedError without external codec
    libraries.
    """

    DIM = 8

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        if mode == "real":  # codec bind happens once per actor
            from . import audiocodec, imagecodec, videocodec

            self._image = imagecodec
            self._audio = audiocodec
            self._video = videocodec

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.mode == "real":
            return self._decode_real(payload, media_type)
        digest = hashlib.blake2b(payload, digest_size=self.DIM * 4).digest()
        return np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / 2**32

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type == "image":
            arr = self._image.decode_image(payload).astype(np.float32)
            flat = arr.reshape(-1, 3)
            return np.concatenate([
                flat.mean(axis=0) / 255.0,
                flat.std(axis=0) / 255.0,
                [np.log1p(arr.shape[1]), np.log1p(arr.shape[0])],
            ]).astype(np.float32)
        if media_type == "audio":
            if self._audio.sniff_audio_format(payload) is None:
                raise NotImplementedError(
                    "compressed audio decode requires codec libraries not "
                    "present in this environment (only PCM WAV supported)",
                )
            samples, rate = self._audio.decode_wav(payload)
            mono = samples.mean(axis=1) / 32768.0  # mixdown, [-1, 1)
            zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            spectrum = np.abs(np.fft.rfft(mono))
            freqs = np.fft.rfftfreq(mono.shape[0], d=1.0 / rate)
            nyquist = rate / 2.0
            total = spectrum.sum()
            centroid = float((spectrum * freqs).sum() / total) if total else 0.0
            peak = float(freqs[int(np.argmax(spectrum))]) if total else 0.0
            return np.array([
                float(mono.mean()),
                float(mono.std()),
                float(np.sqrt(np.mean(mono ** 2))),
                zcr,
                centroid / nyquist,
                peak / nyquist,
                np.log1p(mono.shape[0]),
                np.log1p(rate),
            ], dtype=np.float32)
        if media_type == "video":
            if self._video.sniff_video_format(payload) is None:
                raise NotImplementedError(
                    "compressed video decode requires codec libraries not "
                    "present in this environment (only uncompressed AVI "
                    "supported)",
                )
            frames, _fps = self._video.decode_avi(payload)
            flat = frames.astype(np.float32).reshape(-1, 3)
            return np.concatenate([
                flat.mean(axis=0) / 255.0,
                flat.std(axis=0) / 255.0,
                [np.log1p(frames.shape[0]),
                 np.log1p(frames.shape[1] * frames.shape[2])],
            ]).astype(np.float32)
        raise ValueError("unknown media_type {!r}".format(media_type))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, m)
            for p, m in zip(
                batch.column("payload").to_pylist(),
                batch.column("media_type").to_pylist(),
            )
        ]
        feature_col = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32()),
        )
        out = batch.drop_columns(["payload"])
        return out.append_column("feature", feature_col)


class ImageResizer:
    """Actor-pool stage: resize image payloads to a target box.

    Real mode decodes uncompressed BMP / binary PPM with the vendored
    pure-numpy codec (nearest-neighbor resize, re-encoded in the source
    format) and falls back to Pillow for other formats when present
    (import-gated with a clear error otherwise); fake mode emits a
    deterministic pseudo-thumbnail (payload-hash bytes sized to the target)
    so the Ray-side plumbing — small batches, per-actor setup, binary
    output column, metadata rewrite — is testable without real images.
    Non-image rows pass through unchanged.
    """

    def __init__(self, width: int = 64, height: int = 64, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.width = width
        self.height = height
        self.mode = mode
        self._codec = None
        self._pil = None
        if mode == "real":
            from . import imagecodec  # once per actor

            self._codec = imagecodec
            try:
                import PIL.Image  # noqa: F401

                self._pil = PIL.Image
            except ImportError:
                self._pil = None  # BMP/PPM still work via the vendored codec

    def _resize(self, payload: bytes) -> bytes:
        if self.mode == "real":
            fmt = self._codec.sniff_format(payload)
            if fmt is not None:
                arr = self._codec.decode_image(payload)
                out = self._codec.resize_nearest(arr, self.width, self.height)
                encode = {
                    "bmp": self._codec.encode_bmp,
                    "ppm": self._codec.encode_ppm,
                    "png": self._codec.encode_png,
                }[fmt]
                return encode(out)
            if self._pil is None:  # pragma: no cover - needs Pillow
                raise NotImplementedError(
                    "ImageResizer(mode='real'): payload is not BMP/PPM and "
                    "Pillow is not available for other formats",
                )
            import io  # pragma: no cover - needs Pillow

            img = self._pil.open(io.BytesIO(payload))
            img = img.resize((self.width, self.height))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        size = self.width * self.height // 64 + 32
        out = bytearray()
        counter = 0
        while len(out) < size:
            out += hashlib.blake2b(
                payload + counter.to_bytes(4, "big"), digest_size=32,
            ).digest()
            counter += 1
        return bytes(out[:size])

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        out_payload, out_w, out_h = [], [], []
        for t, p, w, h in zip(types, payloads, widths, heights):
            if t == "image":
                out_payload.append(self._resize(p))
                out_w.append(self.width)
                out_h.append(self.height)
            else:
                out_payload.append(p)
                out_w.append(w)
                out_h.append(h)
        batch = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out_payload, pa.binary()),
        )
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width",
            pa.array(out_w, pa.int32()),
        )
        return batch.set_column(
            batch.schema.get_field_index("height"), "height",
            pa.array(out_h, pa.int32()),
        )


class AudioResampler:
    """Actor-pool stage: resample audio payloads to a target sample rate.

    Real mode decodes PCM WAV with the vendored pure-numpy codec,
    converts the rate with sample-center nearest-neighbor selection and
    re-encodes 16-bit PCM WAV; compressed formats raise a clear
    NotImplementedError.  Fake mode emits a deterministic pseudo-payload
    sized to the target rate so plumbing is testable without real audio.
    Non-audio rows pass through unchanged.
    """

    def __init__(self, rate: int = 8000, mode: str = "real"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.rate = rate
        self.mode = mode
        if mode == "real":
            from . import audiocodec  # once per actor

            self._codec = audiocodec

    def _resample(self, payload: bytes) -> bytes:
        if self.mode == "real":
            if self._codec.sniff_audio_format(payload) is None:
                raise NotImplementedError(
                    "compressed audio decode requires codec libraries not "
                    "present in this environment (only PCM WAV supported)",
                )
            samples, rate = self._codec.decode_wav(payload)
            out = self._codec.resample_nearest(samples, rate, self.rate)
            return self._codec.encode_wav(out, self.rate)
        size = 64 + self.rate // 100
        out = bytearray()
        counter = 0
        while len(out) < size:
            out += hashlib.blake2b(
                payload + counter.to_bytes(4, "big"), digest_size=32,
            ).digest()
            counter += 1
        return bytes(out[:size])

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = [
            self._resample(p) if t == "audio" else p
            for t, p in zip(types, payloads)
        ]
        return batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out, pa.binary()),
        )


FRAME_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("frame_index", pa.int32()),
    ("timestamp_ms", pa.int32()),
    ("frame_payload", pa.binary()),
])


class VideoFrameSampler:
    """Actor-pool stage: explode each video row into k sampled frame rows.

    The sampling plumbing is the same in both modes — evenly spaced
    timestamps over ``duration_ms``, one output row per sampled frame (a
    ``map_batches`` row explosion, the Ray-native flat_map shape).  Real
    mode decodes uncompressed AVI ONCE per row with the vendored codec,
    picks the nearest stored frame per timestamp, and emits each sampled
    frame re-encoded as BMP (so downstream image stages can consume it);
    fake mode emits payload-hash pseudo-frames.  Non-video rows produce
    no output rows.
    """

    def __init__(self, frames_per_video: int = 4, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.k = frames_per_video
        self.mode = mode
        if mode == "real":
            from . import imagecodec, videocodec  # once per actor

            self._video = videocodec
            self._image = imagecodec

    def _frame(self, payload: bytes, ts_ms: int) -> bytes:
        return hashlib.blake2b(
            payload + int(ts_ms).to_bytes(8, "big"), digest_size=64,
        ).digest()

    def _real_frames(self, payload: bytes, duration: int) -> list[tuple[int, bytes]]:
        if self._video.sniff_video_format(payload) is None:
            raise NotImplementedError(
                "compressed video decode requires codec libraries not "
                "present in this environment (only uncompressed AVI "
                "supported)",
            )
        frames, _fps = self._video.decode_avi(payload)  # decode ONCE per row
        n = frames.shape[0]
        out = []
        for j in range(self.k):
            ts = int(duration * (j + 0.5) / self.k)
            src = min(int(n * (j + 0.5) / self.k), n - 1)
            out.append((ts, self._image.encode_bmp(frames[src])))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, stamps, frames = [], [], [], []
        for mid, mtype, payload, duration in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if mtype != "video" or not duration:
                continue
            if self.mode == "real":
                for j, (ts, fr) in enumerate(self._real_frames(payload, duration)):
                    ids.append(mid)
                    idxs.append(j)
                    stamps.append(ts)
                    frames.append(fr)
                continue
            for j in range(self.k):
                ts = int(duration * (j + 0.5) / self.k)
                ids.append(mid)
                idxs.append(j)
                stamps.append(ts)
                frames.append(self._frame(payload, ts))
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(idxs, pa.int32()),
                pa.array(stamps, pa.int32()),
                pa.array(frames, pa.binary()),
            ],
            schema=FRAME_SCHEMA,
        )


class MediaEmbedder:
    """Actor-pool stage: BATCHED model inference over feature vectors.

    The canonical "model on an actor pool" shape: the weight matrix (a
    stand-in for a real encoder checkpoint) is materialized ONCE per actor
    in ``__init__`` — deterministically from ``seed``, so results are
    reproducible without shipping a checkpoint — and ``__call__`` runs one
    matmul per BATCH (never per row), L2-normalizing the outputs.  Chain
    after :class:`MediaFeatureExtractor`:

        feats = media.map_batches(MediaFeatureExtractor, batch_size=8,
                                  concurrency=(1, 8), batch_format="pyarrow")
        emb = feats.map_batches(MediaEmbedder, batch_size=256,
                                concurrency=(1, 4), batch_format="pyarrow")

    Note the differing batch sizes: decode wants small batches (large
    binary payloads), inference wants large ones (amortize the matmul) —
    Ray Data re-batches between the two actor pools.
    """

    IN_DIM = MediaFeatureExtractor.DIM

    def __init__(self, out_dim: int = 16, seed: int = 11):
        self.out_dim = out_dim
        rng = np.random.RandomState(seed)
        # "model load": once per actor, never per batch
        self.weights = rng.standard_normal((self.IN_DIM, out_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = batch.column("feature")
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        # flatten() (not .values) — a re-batched slice has a non-zero
        # offset, and .values would return the unsliced buffer
        flat = np.asarray(feats.flatten(), dtype=np.float32).reshape(-1, self.IN_DIM)
        emb = flat @ self.weights  # one matmul per batch
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(norms, 1e-12)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), self.out_dim,
        )
        return batch.append_column("embedding", col)
