"""Image-space ops: Sobel gradients, pooling pyramids, normal maps, resize.

TPU-native equivalents of the reference's image helpers
(code/models/algorithms.py:1844-1865, :1201-1219, :2148-2171).  Everything is
expressed as XLA ``reduce_window`` / ``conv_general_dilated`` over static
shapes so it fuses and tiles well on TPU.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _replicate_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """Edge-replicate padding of the last two dims of [B,C,H,W]."""
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")


def sobel_gradients(img: jnp.ndarray, normalize_gradient: bool = True):
    """Per-channel Sobel x/y gradients with replicate padding.

    Reference: algorithms.py:1844-1865 (``feature_gradient``).  Optionally
    normalizes the gradient to unit magnitude (the reference default, used
    for the precomputed template feature gradients).

    :param img: ``[B,C,H,W]``
    :return: ``(gx, gy)`` each ``[B,C,H,W]``
    """
    B, C, H, W = img.shape
    p = _replicate_pad(img.reshape(B * C, 1, H, W))
    # Sobel as two separable passes would need two convs anyway; a single
    # 3x3 conv over a 1-channel layout lets XLA lower it to the MXU.
    wx = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=img.dtype
    ).reshape(1, 1, 3, 3)
    wy = jnp.asarray(
        [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], dtype=img.dtype
    ).reshape(1, 1, 3, 3)
    dn = jax.lax.conv_dimension_numbers(p.shape, wx.shape, ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(p, wx, (1, 1), "VALID", dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(p, wy, (1, 1), "VALID", dimension_numbers=dn)
    gx = gx.reshape(B, C, H, W)
    gy = gy.reshape(B, C, H, W)
    if normalize_gradient:
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-8)
        gx = gx / mag
        gy = gy / mag
    return gx, gy


def avg_pool2(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Non-overlapping average pool by ``factor`` on [B,C,H,W]."""
    if factor == 1:
        return x
    out = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, 1, factor, factor),
        (1, 1, factor, factor),
        "VALID",
    )
    return out / float(factor * factor)


def max_pool2(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Non-overlapping max pool by ``factor`` on [B,C,H,W]."""
    if factor == 1:
        return x
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 1, factor, factor),
        (1, 1, factor, factor),
        "VALID",
    )


def image_pyramid(x: jnp.ndarray, scales: Sequence[int] = (0, 1, 2, 3), pool: str = "avg") -> List[jnp.ndarray]:
    """Multi-scale pyramid by 2^s pooling (ref algorithms.py:1201-1219).

    Bool inputs are round-tripped through float like the reference
    (``ImagePyramids.forward``): avg-pooled then cast back, so any window
    containing a True pixel stays True.
    """
    is_bool = x.dtype == jnp.bool_
    xf = x.astype(jnp.float32) if is_bool else x
    fn = avg_pool2 if pool == "avg" else max_pool2
    out = [fn(xf, 1 << s) for s in scales]
    if is_bool:
        out = [o.astype(jnp.bool_) for o in out]
    return out


def compute_normal(vertex_map: jnp.ndarray) -> jnp.ndarray:
    """Normal map as the cross product of Sobel derivatives of the vertex map.

    Reference: algorithms.py:2148-2171 — unnormalized Sobel gradients, cross
    product, L2 normalization, and invalidation where depth equals its
    global min/max (truncated depth).
    """
    B, C, H, W = vertex_map.shape
    gx, gy = sobel_gradients(vertex_map, normalize_gradient=False)
    gx = jnp.moveaxis(gx, 1, -1)  # [B,H,W,3]
    gy = jnp.moveaxis(gy, 1, -1)
    normal = jnp.cross(gx, gy)  # [B,H,W,3]
    normal = jnp.moveaxis(normal, -1, 1)  # [B,3,H,W]
    mag = jnp.linalg.norm(normal, axis=1, keepdims=True)
    normal = normal / (mag + 1e-8)
    depth = vertex_map[:, 2:3]
    invalid = (depth == depth.min()) | (depth == depth.max())
    return jnp.where(invalid, 0.0, normal)


def bilinear_resize(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Bilinear resize of [B,C,H,W] matching torch ``interpolate(mode='bilinear')``
    with ``align_corners=False`` (the reference default at criterions.py:116-117)."""
    B, C, h, w = x.shape
    return jax.image.resize(x, (B, C, H, W), method="linear")


def bilinear_resize_align(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (used for the M-estimator's
    upsampled prior weights, ref algorithms.py:1472)."""
    B, C, h, w = x.shape
    if h == H and w == W:
        return x
    from ..geometry.warp import warp_features

    sy = (h - 1.0) / (H - 1.0) if H > 1 else 0.0
    sx = (w - 1.0) / (W - 1.0) if W > 1 else 0.0
    v = (jnp.arange(H, dtype=x.dtype) * sy)[None, None, :, None]
    u = (jnp.arange(W, dtype=x.dtype) * sx)[None, None, None, :]
    u = jnp.broadcast_to(u, (B, 1, H, W))
    v = jnp.broadcast_to(v, (B, 1, H, W))
    return warp_features(x, u, v)
