"""ctypes bindings for the C++ frame decoder (native/videoload.cc).

The reference's only native dependency is OpenCV via python cv2
(reference: rovr/video_ds.py:108-110). Here the decode-resize-split-resize
hot path is a small C++ library (OpenCV C++ + std::thread batch API) loaded
via ctypes; it releases the GIL so DevicePrefetcher threads scale.

Falls back gracefully when the shared library hasn't been built — callers
check `available()` and use cv2.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_LIB_CANDIDATES = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libvideoload.so"),
    os.path.join(os.path.dirname(__file__), "libvideoload.so"),
)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for cand in _LIB_CANDIDATES:
        path = os.path.abspath(cand)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.rovr_decode_half.restype = ctypes.c_int
            lib.rovr_decode_half.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.rovr_decode_clip.restype = ctypes.c_int
            lib.rovr_decode_clip.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _LIB = lib
            return _LIB
    return None


def available() -> bool:
    return _load() is not None


def decode_half(path: str, out_hw: Tuple[int, int], half: int) -> np.ndarray:
    """Decode one frame -> resize 1024x512 -> split -> resize half to out_hw.

    Parity: video_ds.py:107-113. Returns uint8 (H, W, 3) RGB.
    """
    lib = _load()
    assert lib is not None, "native loader not built"
    h, w = out_hw
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.rovr_decode_half(
        path.encode(),
        h,
        w,
        half,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def decode_clip(paths, out_hw: Tuple[int, int], half: int, threads: int = 4) -> np.ndarray:
    """Decode a list of frames in parallel C++ threads. uint8 (S, H, W, 3)."""
    lib = _load()
    assert lib is not None, "native loader not built"
    h, w = out_hw
    n = len(paths)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.rovr_decode_clip(
        arr, n, h, w, half, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"native clip decode failed ({rc})")
    return out
