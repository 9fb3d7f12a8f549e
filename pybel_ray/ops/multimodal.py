"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata.  The
decode / feature-extraction kernels require codec libraries that are not in
this environment, so the *kernels* are stubbed behind
``NotImplementedError`` or a deterministic fake — but the Ray-side plumbing
(schema, actor-pool stage shape, small batches for large payloads, output
layout) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "MediaFeatureExtractor", "fake_media_table"]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("url", pa.string()),
    ("media_type", pa.string()),   # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


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
    hash (tests the plumbing); ``mode='real'`` raises NotImplementedError
    until codec libraries are available.
    """

    DIM = 8

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        # model/codec load would happen here, once per actor

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.mode == "real":
            raise NotImplementedError(
                "media decode requires codec libraries not present in this "
                "environment; run with mode='fake' for plumbing tests",
            )
        digest = hashlib.blake2b(payload, digest_size=self.DIM * 4).digest()
        return np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / 2**32

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
