"""Host-side image IO and resizing helpers (torch-free, numpy in/out)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_rgb(path: str, scale: float = 1.0) -> np.ndarray:
    """Read an RGB image -> float32 [H,W,3] in [0,1], optionally resized."""
    img = Image.open(path).convert("RGB")
    if scale != 1.0:
        W, H = img.size
        img = img.resize((int(round(W * scale)), int(round(H * scale))), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def read_depth_png(
    path: str,
    depth_scale: float = 5000.0,
    scale: float = 1.0,
    clip: tuple | None = (0.5, 5.0),
) -> np.ndarray:
    """Read a 16-bit depth PNG -> float32 [1,H,W] in meters.

    TUM convention: value/5000 = meters; nearest-neighbor resize (depth must
    not be blended across boundaries); Kinect-accurate clip [0.5, 5.0]
    (ref TUM_RGBD.py:427-438).
    """
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
