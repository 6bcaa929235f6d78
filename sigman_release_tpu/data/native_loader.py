"""ctypes bridge to the native C++ image decoder (native/loader.cpp).

Threaded JPEG/PNG decode + bilinear resize without the Python GIL — the
input-pipeline equivalent of the reference's torch DataLoader worker
processes. Falls back to cv2 transparently when the shared library hasn't
been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libsigman_loader.so",
)
_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.slr_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.slr_decode_file.restype = ctypes.c_int
    lib.slr_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.slr_decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def decode_image(path: str, target_h: int, target_w: int,
                 channels: int = 3) -> np.ndarray:
    """Decode + resize one image -> [H,W,C] float32 in [0,1]."""
    lib = _load()
    if lib is None:
        return _cv2_decode(path, target_h, target_w, channels)
    out = np.empty((target_h, target_w, channels), np.float32)
    rc = lib.slr_decode_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_h, target_w, channels,
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


def decode_batch(paths: Sequence[str], target_h: int, target_w: int,
                 channels: int = 3, n_threads: int = 4) -> np.ndarray:
    """Decode + resize many images concurrently -> [N,H,W,C] float32.

    Failed items come back as zeros (matching the reference dataloader's
    try/except fallback); the return is always dense.
    """
    lib = _load()
    n = len(paths)
    if lib is None:
        return np.stack([
            _cv2_decode(p, target_h, target_w, channels, zeros_on_error=True)
            for p in paths
        ])
    out = np.empty((n, target_h, target_w, channels), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.slr_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_h, target_w, channels, n_threads,
    )
    return out


def _cv2_decode(path, th, tw, channels, zeros_on_error=False):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        if zeros_on_error:
            return np.zeros((th, tw, channels), np.float32)
        raise IOError(f"cv2 decode failed: {path}")
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] >= 3:
        img = img[..., [2, 1, 0] + list(range(3, img.shape[-1]))]  # BGR->RGB
    img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] < channels:
        img = np.repeat(img[..., -1:], channels, axis=-1)
    return img[..., :channels].astype(np.float32) / 255.0
