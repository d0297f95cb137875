"""Minimal dependency-free PNG writer (RGB8).

Fallback for infer.write_frames when cv2 is unavailable (the reference's
only image IO is cv2, video_ds.py:108-110; this keeps inference usable on
a bare Python install). Stores one IDAT chunk, no filtering (filter byte 0
per scanline), zlib default compression.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_bytes(img: "np.ndarray") -> bytes:
    """img: (H, W, 3) uint8 RGB -> PNG file bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"expected (H, W, 3) RGB, got {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def write_png(path: str, img: "np.ndarray") -> None:
    with open(path, "wb") as f:
        f.write(png_bytes(img))
