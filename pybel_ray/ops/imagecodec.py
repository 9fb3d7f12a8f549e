"""Vendored pure-numpy image codec: uncompressed 24-bit BMP and binary PPM.

No codec libraries exist in this environment, so the multimodal stages'
``mode='real'`` kernels decode these two self-describing uncompressed
formats directly from their public specifications (BMP: BITMAPFILEHEADER +
BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes; PPM: the netpbm
``P6`` header + raw RGB).  Everything is vectorized numpy — one reshape +
slice per image, no per-pixel Python.

This makes the decode → resize → featurize path genuinely executable in
CI; other formats (PNG/JPEG/...) remain gated behind a Pillow import.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_image",
    "decode_bmp",
    "decode_ppm",
    "encode_bmp",
    "encode_ppm",
    "resize_nearest",
    "sniff_format",
]


def sniff_format(payload: bytes) -> str | None:
    """'bmp' | 'ppm' | None from magic bytes."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    return None


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (H, W, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header size {}".format(header_size))
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            "only uncompressed 24-bit BMP supported (bpp={}, compression={})"
            .format(bpp, compression),
        )
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    data = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=pixel_offset,
    ).reshape(height, row_bytes)
    bgr = data[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array -> uncompressed 24-bit bottom-up BMP."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("expected (H, W, 3)")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    pixel_data = rows.tobytes()
    file_size = 14 + 40 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                      2835, 2835, 0, 0)
    return header + dib + pixel_data


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> (H, W, 3) uint8 RGB array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval as whitespace/comment-separated
    # ASCII tokens, then ONE whitespace byte, then raw RGB
    pos = 2
    tokens = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    return np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=pos,
    ).reshape(height, width, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array -> binary PPM (P6)."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("expected (H, W, 3)")
    return "P6\n{} {}\n255\n".format(w, h).encode("ascii") + arr.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode BMP/PPM by magic bytes -> (H, W, 3) uint8 RGB."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    raise ValueError(
        "unsupported image format (magic={!r}); the vendored codec handles "
        "uncompressed BMP and P6 PPM — other formats need Pillow".format(
            payload[:4],
        ),
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with pixel-center sampling — deterministic
    integer arithmetic, one fancy-index gather (no per-pixel Python)."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(height) * 2 + 1) * h // (2 * height), h - 1)
    cols = np.minimum((np.arange(width) * 2 + 1) * w // (2 * width), w - 1)
    return arr[rows][:, cols]
