"""Visualization helpers: mosaics, feature-channel grids, flow coloring.

Headless rewrite of ``code/tools/display.py`` — returns numpy images (no
GUI windows); callers save PNGs or push to TensorBoard.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np


def normalize01(x: np.ndarray) -> np.ndarray:
    lo, hi = float(x.min()), float(x.max())
    if hi - lo < 1e-12:
        return np.zeros_like(x, dtype=np.float32)
    return ((x - lo) / (hi - lo)).astype(np.float32)


def colormap_jet(x: np.ndarray) -> np.ndarray:
    """[H,W] in [0,1] -> [H,W,3] jet-ish colormap (no cv2 dependency)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def image_to_display(img: np.ndarray, cmap: Optional[str] = None) -> np.ndarray:
    """CHW or HW(C) array -> displayable [H,W,3] float image in [0,1]."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[0] < img.shape[-1]:
        img = np.transpose(img, (1, 2, 0))
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        x = normalize01(img[..., 0])
        return colormap_jet(x) if cmap == "jet" else np.repeat(x[..., None], 3, -1)
    return np.clip(img[..., :3], 0.0, 1.0).astype(np.float32)


def create_mosaic(
    images: Sequence[np.ndarray],
    cmap: Optional[Sequence[Optional[str]]] = None,
    rows: Optional[int] = None,
) -> np.ndarray:
    """Stitch images into a grid (ref display.py:89-155)."""
    n = len(images)
    if rows is None:
        rows = int(math.floor(math.sqrt(n)))
    cols = int(math.ceil(n / rows))
    disp = [
        image_to_display(im, cmap[i] if cmap else None) for i, im in enumerate(images)
    ]
    H = max(d.shape[0] for d in disp)
    W = max(d.shape[1] for d in disp)
    canvas = np.zeros((rows * H, cols * W, 3), np.float32)
    for i, d in enumerate(disp):
        r, c = divmod(i, cols)
        canvas[r * H : r * H + d.shape[0], c * W : c * W + d.shape[1]] = d
    return canvas


def visualize_feature_channels(
    feat: np.ndarray, rgb: Optional[np.ndarray] = None, add_avg: bool = True
) -> np.ndarray:
    """Per-channel grid of a [C,H,W] (or [B,C,H,W], first item) feature map
    (ref display.py:200+)."""
    feat = np.asarray(feat)
    if feat.ndim == 4:
        feat = feat[0]
    panels: List[np.ndarray] = []
    if rgb is not None:
        rgb = np.asarray(rgb)
        if rgb.ndim == 4:
            rgb = rgb[0]
        panels.append(image_to_display(rgb))
    if add_avg:
        panels.append(image_to_display(feat.mean(axis=0), cmap="jet"))
    for c in range(feat.shape[0]):
        panels.append(image_to_display(feat[c], cmap="jet"))
    return create_mosaic(panels)


def flow_to_color(flow: np.ndarray) -> np.ndarray:
    """[2,H,W] flow -> HSV-style color wheel image [H,W,3]."""
    fx, fy = flow[0], flow[1]
    mag = np.sqrt(fx * fx + fy * fy)
    ang = (np.arctan2(fy, fx) + np.pi) / (2 * np.pi)  # [0,1]
    val = normalize01(mag)
    # simple HSV -> RGB
    h6 = ang * 6.0
    i = np.floor(h6).astype(int) % 6
    f = h6 - np.floor(h6)
    p = np.zeros_like(val)
    q = val * (1 - f)
    t = val * f
    lut = [
        (val, t, p), (q, val, p), (p, val, t),
        (p, q, val), (t, p, val), (val, p, q),
    ]
    r = np.choose(i, [l[0] for l in lut])
    g = np.choose(i, [l[1] for l in lut])
    b = np.choose(i, [l[2] for l in lut])
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def visualize_matches_on_image(
    image: np.ndarray,
    matches: np.ndarray,
    radius: Optional[int] = None,
    color=(1.0, 0.0, 0.0),
    alpha: float = 0.6,
) -> np.ndarray:
    """Alpha-blended match dots on an image.

    Headless numpy port of the reference's cv2 version
    (ref tools/display.py:168-194): draw a filled disk at every match
    coordinate, then blend ``alpha * marked + (1-alpha) * original``.
    The default radius follows the reference's W/64 rule (10 px at VGA).

    :param image: [H,W,3]/[3,H,W]/[H,W] image (any range; normalized)
    :param matches: [2, N] pixel coordinates, row 0 = u (x), row 1 = v (y)
    :return: [H,W,3] float image in [0,1]
    """
    img = image_to_display(np.asarray(image))
    H, W = img.shape[:2]
    if radius is None:
        radius = max(int(W / 64), 1)
    m = np.rint(np.asarray(matches, np.float64)).astype(int)
    marked = img.copy()
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disk = (xx * xx + yy * yy) <= radius * radius
    col = np.asarray(color, np.float32)
    for i in range(m.shape[1]):
        u, v = int(m[0, i]), int(m[1, i])
        if not (0 <= u < W and 0 <= v < H):
            continue
        y0, y1 = max(v - radius, 0), min(v + radius + 1, H)
        x0, x1 = max(u - radius, 0), min(u + radius + 1, W)
        sub = disk[y0 - (v - radius) : y1 - (v - radius),
                   x0 - (u - radius) : x1 - (u - radius)]
        marked[y0:y1, x0:x1][sub] = col
    return (alpha * marked + (1.0 - alpha) * img).astype(np.float32)


def visualize_frames(
    mat: np.ndarray,
    max_img: Optional[int] = None,
    max_channel: Optional[int] = None,
    step_image: int = 1,
    step_channel: int = 1,
) -> np.ndarray:
    """Batch x channel browser grid of a [B,C,H,W] array.

    Headless equivalent of the reference's cv2-window frame browser
    (ref tools/display.py:332-357 ``visualise_frames``): one mosaic row
    per batch item, one panel per (strided) channel; the caller saves the
    returned image instead of opening a window.
    """
    mat = np.asarray(mat)
    B = mat.shape[0] if max_img is None else min(max_img, mat.shape[0])
    C = mat.shape[1] if max_channel is None else min(max_channel, mat.shape[1])
    panels: List[np.ndarray] = []
    rows = 0
    for i in range(0, B, step_image):
        rows += 1
        for j in range(0, C, step_channel):
            panels.append(mat[i, j])
    return create_mosaic(panels, cmap=["jet"] * len(panels), rows=max(rows, 1))


def save_image(path: str, img: np.ndarray):
    from PIL import Image

    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
