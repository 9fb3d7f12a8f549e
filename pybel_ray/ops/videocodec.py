"""Vendored pure-numpy video codec: uncompressed 24-bit RGB AVI (BI_RGB).

No video libraries exist in this environment, so the multimodal stages'
``mode='real'`` video kernels decode the simplest real, public video
container directly from its specification: a RIFF ``AVI `` form holding a
``hdrl`` LIST (``avih`` main header + one ``vids`` stream whose ``strf`` is
a BITMAPINFOHEADER with ``BI_RGB`` compression) and a ``movi`` LIST whose
``00db`` chunks are uncompressed bottom-up BGR DIB frames — the same pixel
layout the vendored BMP codec already handles.  Chunk walking skips
anything unknown (``idx1``, ``JUNK``, ``INFO`` ...), as the spec requires.
Each frame decodes as one ``frombuffer`` + reshape + slice — no per-pixel
Python.

Compressed codecs (H.264/VP9/...) remain gated behind external libraries
that are absent here.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_avi",
    "encode_avi",
    "sniff_video_format",
]


def sniff_video_format(payload: bytes) -> str | None:
    """'avi' | None from magic bytes."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


def _walk(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_offset, body_len, list_type|None) chunks."""
    pos = start
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid in (b"LIST", b"RIFF"):
            yield cid, body + 4, clen - 4, payload[body:body + 4]
        else:
            yield cid, body, clen, None
        pos = body + clen + (clen & 1)  # word-aligned


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """Uncompressed 24-bit AVI -> ((n, H, W, 3) uint8 RGB frames, fps)."""
    if sniff_video_format(payload) != "avi":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    usec_per_frame = 0
    frames: list[np.ndarray] = []

    def scan(start: int, end: int) -> None:
        nonlocal width, height, usec_per_frame
        for cid, body, blen, ltype in _walk(payload, start, end):
            if ltype is not None:  # LIST — recurse into hdrl/strl/movi
                scan(body, body + blen)
            elif cid == b"avih":
                usec_per_frame = struct.unpack_from("<I", payload, body)[0]
                width, height = struct.unpack_from("<II", payload, body + 32)
            elif cid == b"strf" and blen >= 40:
                bpp, compression = struct.unpack_from("<HI", payload, body + 14)
                if bpp != 24 or compression != 0:
                    raise ValueError(
                        "only uncompressed 24-bit AVI supported "
                        "(bpp={}, compression={})".format(bpp, compression),
                    )
            elif cid in (b"00db", b"00dc") and blen > 0:
                frames.append(_decode_dib(payload, body, blen, width, height))

    def _decode_dib(buf: bytes, off: int, blen: int, w: int, h: int) -> np.ndarray:
        row_bytes = (w * 3 + 3) & ~3
        data = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h, offset=off)
        rows = data.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        return rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB

    scan(12, len(payload))
    if width is None or not frames:
        raise ValueError("AVI missing header or frames")
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return np.stack(frames), fps


def encode_avi(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """(n, H, W, 3) uint8 RGB frames -> canonical uncompressed AVI bytes."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("frames must be (n, H, W, 3) uint8")
    n, h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    frame_bytes = row_bytes * h

    # top-down RGB -> bottom-up BGR with 4-byte row padding, vectorized
    padded = np.zeros((n, h, row_bytes), dtype=np.uint8)
    padded[:, :, : w * 3] = arr[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    movi_frames = [padded[i].tobytes() for i in range(n)]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = int(round(1e6 / fps)) if fps > 0 else 0
    avih = struct.pack(
        "<14I", usec, frame_bytes * max(int(fps), 1), 0, 0x10, n, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1,
                                        max(int(round(fps)), 1), 0, n,
                                        frame_bytes, -1, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", f) for f in movi_frames)
    movi = lst(b"movi", movi_body)

    # idx1: one entry per frame (offset is relative to the 'movi' fourcc)
    idx_entries = []
    off = 4
    for f in movi_frames:
        idx_entries.append(b"00db" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
