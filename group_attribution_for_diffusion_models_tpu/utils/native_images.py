"""ctypes bridge to the native batched image loader (native/image_loader.cpp).

`load_image_batch` decodes a list of PNG/JPEG files into one
(N, size, size, 3) uint8 array with multithreaded libpng/libjpeg decode and
bilinear resize — the data-loading hot path for CelebA-HQ-scale image dirs
that the reference walks one PIL image at a time (reference
src/datasets.py:313-373). Builds on demand with `make`; returns None when the
toolchain or .so is unavailable so callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libimage_loader.so")

_lib = None
_load_attempted = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libimage_loader.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.load_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ]
        lib.load_images.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        return None
    return _lib


def load_image_batch(
    paths: Sequence[str], size: int, n_threads: int = 0
) -> Optional[np.ndarray]:
    """(N, size, size, 3) uint8 from image files, or None if unavailable.

    Raises FileNotFoundError/ValueError for missing or undecodable files so
    data problems surface instead of silently falling back.
    """
    lib = _ensure_built()
    if lib is None or not paths:
        return None
    out = np.empty((len(paths), size, size, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * len(paths))(
        *[os.fspath(p).encode() for p in paths]
    )
    rc = lib.load_images(
        arr, len(paths), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    if rc != 0:
        bad = paths[rc - 1]
        if not os.path.exists(bad):
            raise FileNotFoundError(bad)
        raise ValueError(f"could not decode image: {bad}")
    return out
