"""Warped feature-metric residuals (uncertainty-normalized and plain).

TPU-native rewrite of the residual pipeline of the reference
(code/models/algorithms.py:1919-2015).  All data-dependent boolean indexing
of the reference (``residuals[occ] = 1e-3`` etc.) is expressed as
``jnp.where`` with static shapes so the whole residual computation stays
inside one jitted program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..geometry import warp as W


class ResidualOutput(NamedTuple):
    weighted_res: jnp.ndarray  # [B,C,H,W] res/sigma, invalid -> 1e-6
    res: jnp.ndarray           # [B,C,H,W] raw residual (unmasked)
    sigma: jnp.ndarray         # [B,C,H,W] combined sigma
    invalid: jnp.ndarray       # [B,1,H,W] bool, True where invalid


def merge_object_masks(
    occ: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    obj_mask0: Optional[jnp.ndarray],
    obj_mask1: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Fold object masks into the invalid mask (ref algorithms.py:1999-2008).

    Pixels outside the object in frame 0, or warping outside the object of
    frame 1, are marked invalid.
    """
    if obj_mask0 is not None:
        occ = occ | ~obj_mask0.astype(jnp.bool_)
    if obj_mask1 is not None:
        warped = W.warp_features(obj_mask1.astype(occ.dtype).astype(jnp.float32), u, v)
        occ = occ | ~(warped > 0)
    return occ


def compose_residuals(
    u: jnp.ndarray,
    v: jnp.ndarray,
    invalid: jnp.ndarray,
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    sigma0: jnp.ndarray,
    sigma1: jnp.ndarray,
    eps: float = 1e-6,
    remove_tru_sigma: bool = False,
) -> ResidualOutput:
    """Uncertainty-normalized residual at warped coordinates.

    Reference: algorithms.py:1960-1989 (``compose_residuals``):
    ``res = f1(w(x)) - f0``, ``sigma = sqrt(sigma_r^2 + sigma0^2)``,
    ``weighted = res/sigma`` with invalid pixels replaced by ``eps``.

    ``remove_tru_sigma`` additionally invalidates pixels where either sigma
    map is exactly at its (global, whole-tensor) min or max — the
    truncated-uncertainty areas; this matches the reference's use of
    tensor-wide ``.min()``/``.max()`` (algorithms.py:1976-1978).
    """
    f_r = W.warp_features(f1, u, v)
    sigma_r = W.warp_features(sigma1, u, v)
    res = f_r - f0
    sigma = jnp.sqrt(sigma_r * sigma_r + sigma0 * sigma0)
    weighted = res / sigma

    if remove_tru_sigma:
        sigma_tru = (
            (sigma_r == sigma_r.min())
            | (sigma_r == sigma_r.max())
            | (sigma0 == sigma0.min())
            | (sigma0 == sigma0.max())
        )
        invalid = invalid | sigma_tru[:, 0:1]

    weighted = jnp.where(invalid, eps, weighted)
    return ResidualOutput(weighted, res, sigma, invalid)


def compute_inverse_residuals(
    pose10,
    invD0,
    invD1,
    x0,
    x1,
    sigma0,
    sigma1,
    px,
    py,
    K,
    obj_mask0=None,
    obj_mask1=None,
    remove_tru_sigma: bool = False,
    warp_op=None,
) -> Tuple[ResidualOutput, jnp.ndarray, jnp.ndarray]:
    """Full inverse-compositional residual: warp + occlusion + compose.

    Reference: algorithms.py:1992-2015.  Also returns the warped (u, v) so
    callers can reuse the warp.

    The occlusion depth, feature map, uncertainty map (and object mask)
    are all sampled at the same coordinates, so they warp in ONE fused
    channels-last gather — the gathers dominate the tracker's runtime on
    TPU (the reference issues them as separate grid_sample calls).  Pass
    ``warp_op`` (from :func:`build_inverse_warp_operand`) to reuse the
    stacked operand across GN iterations.
    """
    u, v, inv_z = W.batch_warp_inverse_depth(px, py, invD0, pose10, K)

    if warp_op is None:
        warp_op = build_inverse_warp_operand(invD1, x1, sigma1, obj_mask1)
    warped = W.warp_operand(warp_op[0], warp_op[1], u, v)
    invD1_w, f_r, sigma_r = warped[0], warped[1], warped[2]

    # z-buffer occlusion + out-of-view (ref geometry.py:334-350)
    occ = W.check_occ_prewarped(inv_z, invD1_w, u, v)
    if obj_mask0 is not None:
        occ = occ | ~obj_mask0.astype(jnp.bool_)
    if obj_mask1 is not None:
        occ = occ | ~(warped[3] > 0)

    res = f_r - x0
    sigma = jnp.sqrt(sigma_r * sigma_r + sigma0 * sigma0)
    weighted = res / sigma
    if remove_tru_sigma:
        sigma_tru = (
            (sigma_r == sigma_r.min())
            | (sigma_r == sigma_r.max())
            | (sigma0 == sigma0.min())
            | (sigma0 == sigma0.max())
        )
        occ = occ | sigma_tru[:, 0:1]
    weighted = jnp.where(occ, 1e-6, weighted)
    return ResidualOutput(weighted, res, sigma, occ), u, v


def build_inverse_warp_operand(invD1, x1, sigma1, obj_mask1=None):
    """Stacked channels-last operand of all target maps warped by the U_IC
    iteration (loop-invariant: build once per level)."""
    maps = [invD1, x1, sigma1]
    if obj_mask1 is not None:
        maps.append(obj_mask1.astype(x1.dtype))
    return W.make_warp_operand(maps)


def compute_warped_residual(
    pose10,
    invD0,
    invD1,
    x0,
    x1,
    px,
    py,
    K,
    obj_mask0=None,
    obj_mask1=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain (non-uncertainty) warped residual, paper eq. 12.

    Reference: algorithms.py:1919-1957.  Invalid pixels -> 1e-3.
    """
    u, v, inv_z = W.batch_warp_inverse_depth(px, py, invD0, pose10, K)
    x1_warped = W.warp_features(x1, u, v)
    occ = W.check_occ(inv_z, invD1, u, v)
    occ = merge_object_masks(occ, u, v, obj_mask0, obj_mask1)
    residuals = jnp.where(occ, 1e-3, x1_warped - x0)
    return residuals, occ


def compute_avg_loss(x_list, invalid) -> jnp.ndarray:
    """Per-sample average squared residual over valid pixels.

    Reference: algorithms.py:2119-2137 (``compute_avg_loss``).
    :param invalid: [B,1,H,W] bool
    :return: [B]
    """
    B, _, H, W = invalid.shape
    valid_num = H * W - invalid.reshape(B, -1).sum(axis=1)
    total = jnp.zeros((B,), dtype=x_list[0].dtype)
    for x in x_list:
        masked = jnp.where(invalid, 0.0, x)
        total = total + (masked * masked).sum(axis=(1, 2, 3))
    # all-invalid frames (e.g. out-of-overlap perturbations in the basin
    # study) have total == 0; guard the denominator so they report 0, not NaN
    return total / jnp.maximum(valid_num, 1)


def compute_avg_res(x, invalid) -> jnp.ndarray:
    """Whole-batch average residual NORM over valid pixels (the reference's
    diagnostic print, algorithms.py:2110-2116; cf. compute_avg_loss which is
    per-sample and squared)."""
    B, _, H, W = invalid.shape
    masked = jnp.where(invalid, 0.0, x)
    valid_num = B * H * W - invalid.sum()
    return jnp.linalg.norm(masked.reshape(-1)) / jnp.maximum(valid_num, 1)


def warp_images(invD0, pose10, img1, invD1, K):
    """Convenience: warp an image + inverse depth into the reference frame
    (ref algorithms.py:2140-2146)."""
    B, C, H, W_ = img1.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    u, v, _ = W.batch_warp_inverse_depth(px, py, invD0, pose10, K)
    img1_r, invD1_r = W.warp_multi([img1, invD1], u, v)
    return img1_r, invD1_r
