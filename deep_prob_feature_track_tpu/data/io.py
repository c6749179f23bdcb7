"""Host-side image IO and resizing (numpy in/out).

Decode order of preference:
1. the native C++ tier (``native/libdpft_io.so`` — libpng + cv2-exact
   resizes, GIL-free so prefetch threads scale),
2. cv2 (matches the reference's loader semantics exactly:
   INTER_LINEAR color / INTER_NEAREST depth, ref TUM_RGBD.py:425-438),
3. PIL (last-resort; bilinear filter differs slightly from cv2).

Set ``DPFT_NO_NATIVE=1`` to skip the native path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import native_io

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def read_rgb(path: str, scale: float = 1.0) -> np.ndarray:
    """Read an RGB image -> float32 [H,W,3] in [0,1], optionally resized."""
    if native_io.available() and path.endswith(".png"):
        return np.transpose(native_io.read_rgb_chw(path, scale), (1, 2, 0))
    if _HAS_CV2:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        img = img.astype(np.float32) / 255.0
        if scale != 1.0:
            img = cv2.resize(img, None, fx=scale, fy=scale)
        return img
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if scale != 1.0:
        W, H = img.size
        img = img.resize((int(round(W * scale)), int(round(H * scale))), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def read_depth_png(
    path: str,
    depth_scale: float = 5000.0,
    scale: float = 1.0,
    clip: Optional[Tuple[float, float]] = (0.5, 5.0),
) -> np.ndarray:
    """Read a 16-bit depth PNG -> float32 [1,H,W] in meters.

    TUM convention: value/depth_scale = meters; nearest-neighbor resize
    (depth must not blend across boundaries); Kinect-accurate clip
    [0.5, 5.0] (ref TUM_RGBD.py:427-438).
    """
    if native_io.available():
        return native_io.read_depth(path, depth_scale, scale, clip)
    if _HAS_CV2:
        depth = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32) / depth_scale
        if scale != 1.0:
            depth = cv2.resize(depth, None, fx=scale, fy=scale, interpolation=cv2.INTER_NEAREST)
    else:
        from PIL import Image

        img = Image.open(path)
        if scale != 1.0:
            W, H = img.size
            img = img.resize((int(round(W * scale)), int(round(H * scale))), Image.NEAREST)
        depth = np.asarray(img, dtype=np.float32) / depth_scale
    if clip is not None:
        depth = np.clip(depth, clip[0], clip[1])
    return depth[None]


def hwc_to_chw(img: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(img, (2, 0, 1)))
