"""ctypes bindings for the native C++ batch decoder (csrc/fastloader.cpp).

Builds the shared library on first use (g++ + libjpeg, both in the image)
and caches it next to the source. Falls back gracefully: callers check
``available()`` and keep the cv2 path otherwise — and any individual image
the native decoder rejects (e.g. PNGs) is retried with cv2 by the caller.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("ic_tpu")

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libfastloader.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _CSRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # missing toolchain/libjpeg: stay on cv2 path
        logger.warning("fastloader build failed (%s); using cv2 decoder", e)
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            if not os.path.exists(os.path.join(_CSRC, "fastloader.cpp")) or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("fastloader load failed (%s); using cv2 decoder", e)
            _build_failed = True
            return None
        lib.fastloader_decode_batch.restype = ctypes.c_int
        lib.fastloader_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    paths: list[str | None],
    out: np.ndarray,
    num_threads: int = 16,
) -> np.ndarray:
    """Decode JPEGs into ``out`` (N, H, W, 3) uint8 in place; returns a
    bool success mask. Failed slots are zero-filled."""
    lib = _load()
    if lib is None:
        raise RuntimeError("fastloader unavailable")
    n, h, w, c = out.shape
    assert c == 3 and out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
    arr = (ctypes.c_char_p * n)(
        *[p.encode() if p is not None else None for p in paths]
    )
    status = np.zeros(n, dtype=np.uint8)
    lib.fastloader_decode_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        num_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return status.astype(bool)
