"""ctypes bindings for the native IO tier (native/libdpft_io.so).

Decoding releases the GIL, so BatchLoader's prefetch threads scale across
cores.  Falls back gracefully when the library is absent (callers check
:func:`available`); ``make -C native`` builds it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DPFT_NO_NATIVE"):
        return None
    so = os.path.join(_NATIVE_DIR, "libdpft_io.so")
    if not os.path.isfile(so):
        try:  # one-shot build attempt
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.isfile(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.dpft_png_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.dpft_png_dims.restype = ctypes.c_int
    lib.dpft_decode_rgb.argtypes = [
        ctypes.c_char_p, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.dpft_decode_rgb.restype = ctypes.c_int
    lib.dpft_decode_depth16.argtypes = [
        ctypes.c_char_p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.dpft_decode_depth16.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _dims(lib, path: str, scale: float) -> Tuple[int, int]:
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.dpft_png_dims(path.encode(), scale, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"dpft_png_dims failed for {path}")
    return h.value, w.value


def read_rgb_chw(path: str, scale: float = 1.0) -> np.ndarray:
    """RGB PNG -> float32 CHW in [0,1], bilinear (cv2-style) resize."""
    lib = _load()
    h, w = _dims(lib, path, scale)
    out = np.empty((3, h, w), np.float32)
    rc = lib.dpft_decode_rgb(
        path.encode(), scale, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w
    )
    if rc != 0:
        raise IOError(f"dpft_decode_rgb failed for {path}")
    return out


def read_depth(
    path: str,
    depth_scale: float = 5000.0,
    scale: float = 1.0,
    clip: Optional[Tuple[float, float]] = (0.5, 5.0),
) -> np.ndarray:
    """16-bit depth PNG -> float32 [1,H,W] meters, nearest resize + clip."""
    lib = _load()
    h, w = _dims(lib, path, scale)
    out = np.empty((h, w), np.float32)
    cmin, cmax = clip if clip is not None else (0.0, -1.0)
    rc = lib.dpft_decode_depth16(
        path.encode(), scale, depth_scale, cmin, cmax,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
    )
    if rc != 0:
        raise IOError(f"dpft_decode_depth16 failed for {path} (rc={rc})")
    return out[None]
