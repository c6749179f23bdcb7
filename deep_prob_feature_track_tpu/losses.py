"""Training / evaluation criterions (3D end-point-error, relative pose
error, uncertainty-propagating variants).

TPU-native rewrite of ``code/models/criterions.py``; all the reference's
per-sample Python loops over the batch and pyramid (criterions.py:38-46,
:126-128, :237-245) are vectorized into masked reductions and a vmapped
level axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import warp as W
from .geometry.lie import rotation_angle
from .ops.image import bilinear_resize


def epe3d(
    flow_est: jnp.ndarray,
    flow_gt: jnp.ndarray,
    invalid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-sample masked mean of ||flow_est - flow_gt|| (ref :23-46).

    :param flow_est/flow_gt: [B,3,H,W]
    :param invalid: optional [B,1,H,W] (>0 means invalid)
    :return: [B]
    """
    epe_map = jnp.linalg.norm(flow_gt - flow_est, axis=1)  # [B,H,W]
    mask = jnp.any(jnp.isnan(flow_gt), axis=1)
    if invalid is not None:
        mask = mask | (invalid[:, 0] > 0)
    valid = ~mask
    num = jnp.sum(jnp.where(valid, epe_map, 0.0), axis=(1, 2))
    den = jnp.sum(valid, axis=(1, 2))
    return jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0)


def rpe(R: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relative pose error: (angle [rad], translation norm) (ref :49-57)."""
    return rotation_angle(R), jnp.linalg.norm(t, axis=-1)


def compute_rpe_error(
    R_est, t_est, R_gt, t_gt
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPE of estimated vs GT pose (eval path of ref :79-98)."""
    from .geometry.lie import between

    dR, dt = between(R_est, t_est, R_gt, t_gt)
    return rpe(dR, dt)


def compute_rpe_loss(R_est_pyr, t_est_pyr, R_gt, t_gt):
    """Training RPE loss summed over the pose pyramid (ref :86-94)."""

    def level(Ri, ti):
        ang, trs = compute_rpe_error(Ri, ti, R_gt, t_gt)
        return jnp.linalg.norm(ang), jnp.linalg.norm(trs)

    angs, trss = jax.vmap(level, in_axes=(1, 1))(R_est_pyr, t_est_pyr)
    return jnp.sum(angs), jnp.sum(trss)


def _downsampled_geometry(depth0, K, invalid, rH=60, rW=80):
    """Training-time 60x80 downsample with rescaled K (ref :113-123)."""
    B, _, H, W_ = depth0.shape
    rdepth = bilinear_resize(depth0, rH, rW)
    rinvalid = None
    if invalid is not None:
        rinvalid = bilinear_resize(invalid.astype(depth0.dtype), rH, rW)
    rK = W.resize_K(K, float(rW) / W_, float(rH) / H)
    xyz = W.batch_inverse_project(rdepth, rK)
    return xyz, rinvalid


def compute_rt_epe_loss(
    R_est, t_est, R_gt, t_gt, depth0, K, invalid=None
) -> jnp.ndarray:
    """The training loss: EPE3D of induced scene flow (ref :101-136).

    Training mode (R_est.ndim==4): sums EPE3D over all pyramid poses with
    GT flow detached, on the 60x80 downsampled geometry.
    Eval mode (ndim==3): single-pose EPE3D at full resolution.
    :return: [B]
    """
    if R_est.ndim > 3:
        xyz, rinvalid = _downsampled_geometry(depth0, K, invalid)
        flow_gt = jax.lax.stop_gradient(W.batch_transform_xyz(xyz, R_gt, t_gt))

        def level(Ri, ti):
            flow_est = W.batch_transform_xyz(xyz, Ri, ti)
            return epe3d(flow_est, flow_gt, invalid=rinvalid)

        losses = jax.vmap(level, in_axes=(1, 1))(R_est, t_est)  # [N,B]
        return jnp.sum(losses, axis=0)
    xyz = W.batch_inverse_project(depth0, K)
    flow_gt = W.batch_transform_xyz(xyz, R_gt, t_gt)
    flow_est = W.batch_transform_xyz(xyz, R_est, t_est)
    return epe3d(flow_est, flow_gt, invalid=invalid)


# ----------------------------------------------------------------------
# uncertainty-propagating losses
# ----------------------------------------------------------------------


def compute_rpe_uncertainty_loss(
    R_est_pyr, t_est_pyr, R_gt, t_gt, inv_var_pyr
) -> jnp.ndarray:
    """Mahalanobis RPE with log-det regularizer (ref :60-76)."""
    from .geometry.lie import log_so3
    from .ops.solver6 import lev_mar_damp

    w_gt = jax.lax.stop_gradient(log_so3(R_gt))
    t_gt_s = jax.lax.stop_gradient(t_gt)

    def level(Ri, ti, inv_var):
        dR = w_gt - log_so3(Ri)
        dt = t_gt_s - ti
        dksi = jnp.concatenate([dR, dt], axis=-1)[..., None]  # [B,6,1]
        H = lev_mar_damp(inv_var)
        sigma_ksi = jnp.linalg.inv(H)
        det = jnp.clip(jnp.linalg.det(sigma_ksi), 1e-9, None)
        weighted = jnp.einsum("bi,bij,bj->b", dksi[..., 0], inv_var, dksi[..., 0])
        return jnp.sum(weighted + jnp.log(1e-6 + det))

    losses = jax.vmap(level, in_axes=(1, 1, 1))(R_est_pyr, t_est_pyr, inv_var_pyr)
    return jnp.sum(losses)


def uepe3d(
    flow_est, flow_gt, variance, invalid=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gaussian-NLL EPE with per-pixel 3x3 flow covariance (ref :139-208).

    Assumes per-dimension independence (the reference's ``dim_ind`` path):
    variance is diagonal-clamped, error is Mahalanobis + log-diag
    regularizer.
    :param variance: [B, H*W, 3, 3]
    :return: (nll [B], plain epe [B])
    """
    B, _, H, W_ = flow_est.shape
    deltaP = flow_gt - flow_est
    o_epe = jnp.linalg.norm(deltaP, axis=1)  # [B,H,W]
    d = jnp.moveaxis(deltaP.reshape(B, 3, -1), 1, 2)  # [B,HW,3]
    eye = jnp.eye(3, dtype=variance.dtype)
    var = jnp.clip(variance, 1e-3, None) * eye
    inv_var = jnp.linalg.inv(var)
    weighted = jnp.einsum("bpi,bpij,bpj->bp", d, inv_var, d)
    reg = jnp.sum(jnp.log(jnp.diagonal(var, axis1=-2, axis2=-1)), axis=-1)
    nll_map = (weighted + reg).reshape(B, H, W_)

    mask = jnp.any(jnp.isnan(flow_gt), axis=1)
    if invalid is not None:
        mask = mask | (invalid[:, 0] > 0)
    valid = ~mask

    def masked_mean(m):
        num = jnp.sum(jnp.where(valid, m, 0.0), axis=(1, 2))
        den = jnp.sum(valid, axis=(1, 2))
        return jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0)

    return masked_mean(nll_map), masked_mean(o_epe)


def compute_rt_epe_uncertainty_loss(
    R_est_pyr, t_est_pyr, R_gt, t_gt, depth0, K, sigma_ksi_pyr, invalid=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EPE with 6x6 pose covariance pushed through the flow Jacobian
    ``J Sigma J^T`` per pixel (ref :211-247).

    :param sigma_ksi_pyr: [B, N, 6, 6] per-level pose covariances
    :return: (total nll [B], total epe [B])
    """
    xyz, rinvalid = _downsampled_geometry(depth0, K, invalid)
    flow_gt = jax.lax.stop_gradient(W.batch_transform_xyz(xyz, R_gt, t_gt))

    def level(Ri, ti, sigma_ksi):
        flow_est = W.batch_transform_xyz(xyz, Ri, ti)
        J = W.transform_xyz_jacobian(xyz, Ri)  # [B,HW,3,6]
        var = jnp.einsum("bpij,bjk,bplk->bpil", J, sigma_ksi, J)
        return uepe3d(flow_est, flow_gt, var, invalid=rinvalid)

    nll, epe = jax.vmap(level, in_axes=(1, 1, 1))(R_est_pyr, t_est_pyr, sigma_ksi_pyr)
    return jnp.sum(nll, axis=0), jnp.sum(epe, axis=0)
