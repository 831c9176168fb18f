"""ctypes bindings for the native C++ decode library (native/decoder.cpp —
the N4/N6 host-side native substrate: libjpeg/libpng decode straight into
the batch canvas with a std::thread pool, replacing the reference's
PIL-in-worker path).

Falls back gracefully: ``available()`` is False when the shared library has
not been built (``make -C native``), and datasets then use PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libsssegio.so",
)
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _LIB_PATH
    if not os.path.exists(path):
        # Best-effort build (toolchain is available in dev images).
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ssseg_decode_image.restype = ctypes.c_int
    lib.ssseg_decode_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ssseg_decode_label.restype = ctypes.c_int
    lib.ssseg_decode_label.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ssseg_decode_batch.restype = ctypes.c_int
    lib.ssseg_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_image_into(path: str, canvas: np.ndarray) -> Tuple[int, int]:
    """Decode JPEG/PNG into a (H, W, 3) uint8 canvas slot (top-left paste);
    returns the true (h, w) clipped to the canvas."""
    lib = _load()
    assert lib is not None, "native io unavailable"
    assert canvas.dtype == np.uint8 and canvas.ndim == 3 and canvas.flags["C_CONTIGUOUS"]
    hw = (ctypes.c_int * 2)()
    rc = lib.ssseg_decode_image(
        path.encode(),
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas.shape[0],
        canvas.shape[1],
        hw,
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return int(hw[0]), int(hw[1])


def decode_label_into(path: str, canvas: np.ndarray) -> Tuple[int, int]:
    """Decode an 8-bit (gray or palette-index) PNG label into an int32
    canvas slot; palette indices are the class ids (VOC convention)."""
    lib = _load()
    assert lib is not None, "native io unavailable"
    assert canvas.dtype == np.int32 and canvas.ndim == 2 and canvas.flags["C_CONTIGUOUS"]
    hw = (ctypes.c_int * 2)()
    rc = lib.ssseg_decode_label(
        path.encode(),
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        canvas.shape[0],
        canvas.shape[1],
        hw,
    )
    if rc != 0:
        raise IOError(f"native label decode failed ({rc}): {path}")
    return int(hw[0]), int(hw[1])


def decode_batch(paths, canvases: np.ndarray, sizes: np.ndarray, threads: int = 4):
    """Thread-pooled batch decode: paths[i] -> canvases[i], sizes[i]=(h,w)."""
    lib = _load()
    assert lib is not None, "native io unavailable"
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.ssseg_decode_batch(
        arr,
        n,
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvases.shape[1],
        canvases.shape[2],
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        threads,
    )
    if rc != 0:
        raise IOError(f"native batch decode failed ({rc})")
