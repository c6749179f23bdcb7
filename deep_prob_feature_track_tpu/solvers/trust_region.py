"""Trust-region Gauss-Newton solver loops (IC / U_IC / U_FC / ICP tracks).

TPU-native rewrite of the four solver classes of the reference
(code/models/algorithms.py:23-139 ``TrustRegionBase``, :579-997
``TrustRegionInverseWUncertainty``, :999-1198 ``TrustRegionWUncertainty``,
:355-576 ``Inverse_ICP``).  Everything here is a pure function over arrays;
learned components (M-estimator, ScaleNet, damping regressor) enter as
callables so network parameters stay at the flax boundary.  Iteration counts
are static and unrolled, matching the reference's end-to-end autodiff
through every GN solve, and the 6x6 solves run on-device via Cholesky
(no CPU round-trip — cf. algorithms.py:2077-2091).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import warp as W
from ..geometry.lie import compose, exp_so3
from ..ops.image import compute_normal
from ..ops.solver6 import lev_mar_damp, solve_chol
from . import icp as icp_mod
from .jacobians import (
    FactoredJtJ,
    jtj_jtr,
    jtr_only,
    precompute_ic,
    precompute_uic,
    uic_factors,
)
from .residuals import (
    compute_avg_loss,
    compute_inverse_residuals,
    compute_warped_residual,
)

Pose = Tuple[jnp.ndarray, jnp.ndarray]


def run_gn_iterations(body, carry, max_iter: int, unroll: bool,
                      scan_ok: bool = False):
    """Shared GN iteration driver for every track's solver loop.

    - ``unroll=True`` (training default): Python-unroll — backprop through
      ``fori_loop`` stacks per-iteration residuals in channel-minormost
      layouts XLA tile-pads ~16x on TPU (docs/PERF.md round 1).
    - ``unroll=False`` (eval): ``fori_loop`` for ~2x faster compiles.
    - ``DPFT_TRAIN_LOOP=scan_remat`` upgrades the unrolled path to
      ``lax.scan`` over a ``jax.checkpoint``'ed body: the backward
      *recomputes* each iteration's residual pipeline instead of saving
      it, so nothing big is stacked, and both activation memory and HLO
      size shrink by ~max_iter — the enabler for 480x640 training, where
      the unrolled backward's HLO crashes the remote-compile helper
      (docs/PERF.md round 2), at ~1 extra forward of recompute per
      iteration.  Gradient-parity tested vs the unrolled path
      (tests/test_training.py).

    ``scan_ok`` must be set ONLY for bodies that are pure array functions.
    A body that applies a *bound flax module* (whose scope raises
    UnexpectedTracerError inside ``lax.scan``/``jax.checkpoint`` from
    outside a lifted transform) must stay Python-unrolled; the tracker
    avoids this by handing the IC/U_FC loops pure clone-apply twins of
    its M-estimator/damping modules (``LeastSquareTracking._functional``),
    so every track is scannable post-init.
    """
    if not unroll:
        return jax.lax.fori_loop(0, max_iter, body, carry)
    if scan_ok and os.environ.get("DPFT_TRAIN_LOOP") == "scan_remat":
        def step(c, i):
            return jax.checkpoint(body)(i, c), None

        carry, _ = jax.lax.scan(step, carry, jnp.arange(max_iter))
        return carry
    for i in range(max_iter):
        carry = body(i, carry)
    return carry


def inverse_update_pose(H: jnp.ndarray, rhs: jnp.ndarray, pose: Pose) -> Pose:
    """Inverse-compositional update: right-compose ``(exp(xi))^{-1}``.

    Reference: algorithms.py:2035-2054 — ``dR = exp(-xi_rot)``,
    ``dt = -dR @ xi_trs``, then ``pose o delta`` (the reference passes the
    pose as the *increment* argument of its left-compose helper, i.e. the
    net effect is right-composition).
    """
    xi = solve_chol(H, rhs[..., 0])  # [B,6]
    d_R = exp_so3(-xi[:, :3])
    d_t = -jnp.einsum("bij,bj->bi", d_R, xi[:, 3:])
    R, t = pose
    return compose(R, t, d_R, d_t)


def forward_update_pose(H: jnp.ndarray, rhs: jnp.ndarray, pose: Pose) -> Pose:
    """Forward-compositional update ``pose o exp(xi)`` (ref algorithms.py:2057-2074)."""
    xi = solve_chol(H, rhs[..., 0])
    d_R = exp_so3(xi[:, :3])
    d_t = xi[:, 3:]
    R, t = pose
    return compose(R, t, d_R, d_t)


class DirectSolver(NamedTuple):
    """Configuration + learned pieces of the trust-region solve.

    Mirrors ``DirectSolverNet`` (ref algorithms.py:1583-1691):
    ``kind='nodamping'`` is LM-damped GN; ``kind='resvol'`` regresses
    per-axis damping from a residual volume via ``damping_mlp``.
    """

    kind: str = "nodamping"  # 'nodamping' | 'resvol'
    direction: str = "inverse"  # 'inverse' | 'forward'
    samples: int = 10
    damping_mlp: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    # True when damping_mlp is safe inside lax control flow (a pure
    # clone-apply callable, not a BOUND flax module whose scope state
    # raises UnexpectedTracerError across transform boundaries).  With it
    # the resvol loops become scannable (DPFT_TRAIN_LOOP=scan_remat) and
    # eval can use fori_loop instead of the Python unroll.
    damping_pure: bool = False

    @property
    def loop_safe(self) -> bool:
        """Whether GN bodies applying this solver may run under lax.scan/
        jax.checkpoint/fori_loop."""
        return self.kind != "resvol" or self.damping_pure


def _update(solver: DirectSolver, H, JtR, pose) -> Pose:
    if solver.direction == "forward":
        return forward_update_pose(H, JtR, pose)
    return inverse_update_pose(H, JtR, pose)


def _resvol_hessian(
    solver: DirectSolver,
    JtWJ: jnp.ndarray,
    JtR: jnp.ndarray,
    pose: Pose,
    residual_fn: Callable[[Pose], jnp.ndarray],
    jtr_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Residual-volume damping regression (ref algorithms.py:1644-1691).

    The reference loops 10 damping samples in Python; here the 10 virtual
    solves + re-residuals run as one vmapped batch.
    """
    B = JtWJ.shape[0]
    eye = jnp.eye(6, dtype=JtWJ.dtype)
    diagJtJ = eye * JtWJ
    trace = jnp.trace(JtWJ, axis1=-2, axis2=-1)
    epsilon = (trace * 1e-6)[:, None, None] * eye
    lambdas = jnp.logspace(-5.0, 5.0, solver.samples, dtype=JtWJ.dtype)

    def one_sample(lam):
        Hs = JtWJ + lam * diagJtJ + epsilon
        pose_s = inverse_update_pose(Hs, JtR, pose)
        res_s = residual_fn(pose_s)
        return jtr_fn(res_s)  # [B,6,1]

    JtR_vol = jax.vmap(one_sample)(lambdas)  # [S,B,6,1]
    JtR_flat = jnp.moveaxis(JtR_vol[..., 0], 0, 2).reshape(B, -1)  # [B,6*S]
    JtJ_flat = JtWJ.reshape(B, -1)
    damp = solver.damping_mlp(jnp.concatenate([JtR_flat, JtJ_flat], axis=1))  # [B,6]
    R = eye * damp[:, :, None] + epsilon
    return JtWJ + R


def direct_solve(
    solver: DirectSolver,
    JtWJ: jnp.ndarray,
    JtR: jnp.ndarray,
    pose: Pose,
    residual_fn: Optional[Callable[[Pose], jnp.ndarray]] = None,
    jtr_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Pose:
    if solver.kind == "resvol":
        H = _resvol_hessian(solver, JtWJ, JtR, pose, residual_fn, jtr_fn)
    else:
        H = lev_mar_damp(JtWJ)
    return _update(solver, H, JtR, pose)


# --------------------------------------------------------------------------
# U_IC: the paper's main tracker (uncertainty-normalized inverse composition)
# --------------------------------------------------------------------------


def tr_uic_level(
    pose: Pose,
    x0,
    x1,
    invD0,
    invD1,
    K,
    sigma0,
    sigma1,
    w_prior=None,
    depth0=None,
    depth1=None,
    obj_mask0=None,
    obj_mask1=None,
    scale_fn: Optional[Callable] = None,
    max_iter: int = 3,
    remove_tru_sigma: bool = False,
    combine_icp: bool = False,
    icp_sigma: icp_mod.ICPSigmaModel = icp_mod.ICPSigmaModel(),
    unroll: bool = False,
):
    """One pyramid level of the U_IC trust-region solver.

    Reference: algorithms.py:611-723 (``TrustRegionInverseWUncertainty``).
    Returns ``(pose, weights, JtWJ)`` — JtWJ doubles as the 6x6 pose
    information matrix for uncertainty propagation (ref :716-721).

    :param unroll: Python-unroll the GN iterations.  Used in training:
        backprop through ``fori_loop`` stacks per-iteration residuals in
        layouts XLA pads catastrophically on TPU; unrolling reproduces the
        reference's autodiff structure with plain intermediates.
    """
    B, C, H, W_ = x0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)

    if combine_icp:
        vertex0 = W.compute_vertex(depth0, px, py)
        vertex1 = W.compute_vertex(depth1, px, py)
        normal1 = compute_normal(vertex1)

    pre = precompute_uic(invD0, x0, sigma0, px, py, K)
    from .residuals import build_inverse_warp_operand

    # the warped target maps are loop-invariant: stack them channels-last
    # once; each GN iteration then runs a single fused gather
    warp_op = build_inverse_warp_operand(invD1, x1, sigma1, obj_mask1)

    w_icp = None
    if combine_icp:
        # the ICP<->feature scale is computed from the FIRST iteration's
        # residuals and reused (ref algorithms.py:674-679)
        out0, _, _ = compute_inverse_residuals(
            pose, invD0, invD1, x0, x1, sigma0, sigma1, px, py, K,
            obj_mask0=obj_mask0, obj_mask1=obj_mask1,
            remove_tru_sigma=remove_tru_sigma, warp_op=warp_op,
        )
        icp_res0, _, _ = icp_mod.icp_residuals_inverse(
            vertex0, vertex1, normal1, pose, K,
            obj_mask0=obj_mask0, obj_mask1=obj_mask1, sigma_model=icp_sigma,
        )
        w_icp = scale_fn(icp_res0, out0.weighted_res, w_prior)  # [B,1,H,W]

    def gn_iteration(_, carry):
        """One GN iteration; traced once, run max_iter times (the reference
        unrolls the identical body in Python, algorithms.py:646-693)."""
        R, t, _ = carry
        p = (R, t)
        out, _, _ = compute_inverse_residuals(
            p, invD0, invD1, x0, x1, sigma0, sigma1, px, py, K,
            obj_mask0=obj_mask0, obj_mask1=obj_mask1,
            remove_tru_sigma=remove_tru_sigma, warp_op=warp_op,
        )
        fac = uic_factors(pre, out.res, out.sigma, sigma0)
        JtWJ, JtR = jtj_jtr(fac, out.weighted_res)
        if combine_icp:
            icp_res, icp_J, _ = icp_mod.icp_residuals_inverse(
                vertex0, vertex1, normal1, p, K,
                obj_mask0=obj_mask0, obj_mask1=obj_mask1, sigma_model=icp_sigma,
            )
            icp_res = w_icp * icp_res
            icp_J = w_icp.reshape(B, H * W_, 1) * icp_J
            icp_JtJ, icp_JtR = icp_mod.icp_jtj_jtr(icp_J, icp_res)
            JtWJ = JtWJ + icp_JtJ
            JtR = JtR + icp_JtR
        Hd = lev_mar_damp(JtWJ)
        R_new, t_new = inverse_update_pose(Hd, JtR, p)
        return (R_new, t_new, JtWJ)

    jtj_dtype = jnp.result_type(x0, sigma0, invD0, K)
    init = (pose[0], pose[1], jnp.zeros((B, 6, 6), jtj_dtype))
    R, t, JtWJ = run_gn_iterations(
        gn_iteration, init, max_iter, unroll, scan_ok=True
    )
    pose = (R, t)

    # matching the reference exactly (algorithms.py:713-717): the chained
    # prior weight is the learned ICP scale when combining ICP, constant
    # ones otherwise (the paper config's mEst is None, so no per-level
    # M-estimator weights exist to chain here)
    weights = w_icp if combine_icp else jnp.ones_like(x0)
    return pose, weights, JtWJ


def tr_uic_residual(
    pose: Pose,
    x0,
    x1,
    invD0,
    invD1,
    K,
    sigma0,
    sigma1,
    w_prior=None,
    depth0=None,
    depth1=None,
    obj_mask0=None,
    obj_mask1=None,
    scale_fn=None,
    remove_tru_sigma: bool = False,
    combine_icp: bool = False,
    icp_sigma: icp_mod.ICPSigmaModel = icp_mod.ICPSigmaModel(),
):
    """Average residual at a fixed pose (convergence-basin evaluation).

    Reference: algorithms.py:725-786 (``forward_residuals``).
    :return: [B] per-sample average loss
    """
    B, C, H, W_ = x0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    out, _, _ = compute_inverse_residuals(
        pose,
        invD0,
        invD1,
        x0,
        x1,
        sigma0,
        sigma1,
        px,
        py,
        K,
        obj_mask0=obj_mask0,
        obj_mask1=obj_mask1,
        remove_tru_sigma=remove_tru_sigma,
    )
    if combine_icp:
        vertex0 = W.compute_vertex(depth0, px, py)
        vertex1 = W.compute_vertex(depth1, px, py)
        normal1 = compute_normal(vertex1)
        icp_res, _, icp_occ = icp_mod.icp_residuals_inverse(
            vertex0, vertex1, normal1, pose, K, sigma_model=icp_sigma
        )
        w_icp = scale_fn(icp_res, out.weighted_res, w_prior)
        icp_res = w_icp * icp_res
        combined = out.invalid | icp_occ
        return compute_avg_loss([out.weighted_res, icp_res], combined)
    return compute_avg_loss([out.weighted_res], out.invalid)


# --------------------------------------------------------------------------
# IC: plain deep inverse-compositional (DeeperIC baseline)
# --------------------------------------------------------------------------


def tr_ic_level(
    pose: Pose,
    x0,
    x1,
    invD0,
    invD1,
    K,
    mest_fn: Callable,
    solver: DirectSolver,
    w_prior=None,
    obj_mask0=None,
    obj_mask1=None,
    max_iter: int = 3,
    unroll: bool = False,
):
    """One pyramid level of the plain IC solver (ref algorithms.py:45-101).

    Template Jacobian and M-estimator weights are computed once from the
    initial residual; the loop alternates solve / re-residual.  Returns
    ``(pose, weights, JtWJ)`` — the 6x6 information matrix supports
    ``uncer_prop`` on every track, mirroring what the reference exposes for
    U_IC (algorithms.py:716-721).

    :param unroll: Python-unroll the iterations instead of ``fori_loop`` —
        required when the solve itself applies flax modules (Direct-ResVol's
        damping MLP cannot be traced inside lax control flow from outside a
        lifted transform).
    """
    B, C, H, W_ = x0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    pre = precompute_ic(invD0, x0, px, py, K)

    residuals, occ = compute_warped_residual(
        pose, invD0, invD1, x0, x1, px, py, K, obj_mask0=obj_mask0, obj_mask1=obj_mask1
    )
    weights = mest_fn(residuals, x0, x1, w_prior)
    JtWJ, _ = jtj_jtr(pre.fac, residuals, weights=weights)

    def jtr_fn(res):
        return jtr_only(pre.fac, res, weights=weights)

    def residual_fn(p):
        r, _ = compute_warped_residual(
            p, invD0, invD1, x0, x1, px, py, K, obj_mask1=obj_mask1
        )
        return r

    def gn_iteration(_, carry):
        R, t, res = carry
        JtR = jtr_fn(res)
        R_new, t_new = direct_solve(solver, JtWJ, JtR, (R, t), residual_fn, jtr_fn)
        new_res = residual_fn((R_new, t_new))
        return (R_new, t_new, new_res)

    carry = (pose[0], pose[1], residuals)
    # the body is pure jnp except for the resvol damping MLP: with a pure
    # damping callable (solver.loop_safe) the loop is scannable under
    # DPFT_TRAIN_LOOP=scan_remat and eval may use fori_loop; a BOUND flax
    # damping module forces the Python unroll (VERDICT round-2 item 6)
    R, t, residuals = run_gn_iterations(
        gn_iteration, carry, max_iter, unroll or not solver.loop_safe,
        scan_ok=solver.loop_safe,
    )
    return (R, t), weights, JtWJ


def tr_ic_residual(
    pose, x0, x1, invD0, invD1, K, mest_fn, w_prior=None, obj_mask0=None, obj_mask1=None
):
    """IC-track residual evaluation (ref algorithms.py:123-139)."""
    B, C, H, W_ = x0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    residuals, occ = compute_warped_residual(
        pose, invD0, invD1, x0, x1, px, py, K, obj_mask0=obj_mask0, obj_mask1=obj_mask1
    )
    weights = mest_fn(residuals, x0, x1, w_prior)
    return compute_avg_loss([weights * residuals], occ)


# --------------------------------------------------------------------------
# U_FC: forward-compositional with uncertainty
# --------------------------------------------------------------------------


def _warp_forward_depth(dpt0, pose: Pose, K, dpt_thr: float = 1e-6):
    """Forward warp on raw depth with analytic coordinate Jacobians.

    JAX rewrite of ``warp_net`` (ref geometry.py:1051-1113): back-project,
    rigid transform, pinhole project; the 2x6 coordinate-to-[rot,trs]
    Jacobian is ``[J_proj @ (-skew(R p0)) | J_proj]`` with
    ``J_proj = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]``.

    :return: ``(u, v, dpt1, depth_valid, u6, v6)`` with ``u6/v6 [B,HW,6]``
    """
    R, t = pose
    B, _, H, W_ = dpt0.shape
    hw = H * W_
    fx, fy, cx, cy = K[:, 0:1], K[:, 1:2], K[:, 2:3], K[:, 3:4]
    u_pix = jnp.arange(W_, dtype=dpt0.dtype)[None, None, None, :]
    v_pix = jnp.arange(H, dtype=dpt0.dtype)[None, None, :, None]
    x_n = (jnp.broadcast_to(u_pix, (B, 1, H, W_)).reshape(B, hw) - cx) / fx
    y_n = (jnp.broadcast_to(v_pix, (B, 1, H, W_)).reshape(B, hw) - cy) / fy
    ones = jnp.ones_like(x_n)
    pnt0 = jnp.stack([x_n, y_n, ones], axis=1) * dpt0.reshape(B, 1, hw)
    RP = R @ pnt0  # [B,3,HW] (before translation: used by the rot Jacobian)
    pnt1 = RP + t[:, :, None]

    z = pnt1[:, 2]
    z_clip = jnp.where((z >= 0) & (z < dpt_thr), dpt_thr, z)
    z_clip = jnp.where((z_clip < 0) & (z_clip > -dpt_thr), -dpt_thr, z_clip)
    depth_valid = (jnp.abs(z) > dpt_thr).reshape(B, 1, H, W_)
    u = (pnt1[:, 0] / z_clip) * fx + cx
    v = (pnt1[:, 1] / z_clip) * fy + cy

    # projection Jacobian rows
    fx_z = fx / z_clip
    fy_z = fy / z_clip
    du = jnp.stack([fx_z, jnp.zeros_like(fx_z), -fx_z / z_clip * pnt1[:, 0]], axis=-1)
    dv = jnp.stack([jnp.zeros_like(fy_z), fy_z, -fy_z / z_clip * pnt1[:, 1]], axis=-1)
    # rotation Jacobian of the transformed point: -skew(R p0)
    from ..geometry.lie import skew

    J_rot_pnt = -skew(jnp.swapaxes(RP, 1, 2))  # [B,HW,3,3]
    u_rot = jnp.einsum("bpd,bpde->bpe", du, J_rot_pnt)
    v_rot = jnp.einsum("bpd,bpde->bpe", dv, J_rot_pnt)
    u6 = jnp.concatenate([u_rot, du], axis=-1)
    v6 = jnp.concatenate([v_rot, dv], axis=-1)
    return (
        u.reshape(B, 1, H, W_),
        v.reshape(B, 1, H, W_),
        z.reshape(B, 1, H, W_),
        depth_valid,
        u6,
        v6,
    )


def tr_ufc_level(
    pose: Pose,
    x0,
    x1,
    dpt0,
    dpt1,
    K,
    sigma0,
    sigma1,
    mest_fn: Callable,
    solver: DirectSolver,
    w_prior=None,
    obj_mask0=None,
    obj_mask1=None,
    max_iter: int = 3,
    unroll: bool = False,
    mest_loop_fn: Optional[Callable] = None,
    loop_pure: bool = True,
    register_stats: bool = False,
):
    """One level of the forward-compositional uncertainty solver.

    Reference: algorithms.py:1022-1080 (``TrustRegionWUncertainty``).
    Jacobians are recomputed every iteration at the warped coordinates
    (interpolated gradients, ref :1126-1134), residual Jacobian
    ``grad_f1/sigma - res * sigma_r grad_sigma1 / sigma^3`` (ref :1139),
    with the same overall sign flip and forward pose update.  Object masks
    fold into the invalid mask exactly like the inverse tracks
    (algorithms.py:1999-2008): pixels outside the frame-0 object, or warping
    outside the frame-1 object, are excluded.  Returns ``(pose, weights,
    JtWJ)`` for uncertainty propagation.

    :param mest_loop_fn: M-estimator used INSIDE the GN body (defaults to
        ``mest_fn``).  Pass a pure clone-apply twin of a bound flax
        M-estimator so the loop can run under lax control flow
        (fori_loop / scan_remat) instead of the Python unroll.
    :param loop_pure: whether ``mest_loop_fn`` is safe inside lax control
        flow.  False (a bound flax module with parameters) forces the
        Python unroll regardless of ``unroll``/DPFT_TRAIN_LOOP.
    :param register_stats: re-apply the BOUND ``mest_fn`` after the loop
        on EVERY iteration's residual, in iteration order.  A pure
        in-loop estimator drops its BatchNorm batch_stats updates; the
        reference applies the bound M-estimator once per GN iteration
        (ref algorithms.py:1066) so the running-stat EMA compounds
        ``max_iter`` times (``ra = m*ra + (1-m)*stat_i`` sequentially) —
        flax mutable collections are live within an apply, so the
        sequential bound re-applies here reproduce that compounded
        trajectory exactly.  The final call's input equals the final
        in-loop input, so the returned weights (and their gradient path)
        are identical to the pure-twin loop's.  Costs ``max_iter`` extra
        estimator applies plus a stacked ``[max_iter, B, C, H, W]``
        residual buffer, so it is gated to training with a learned
        estimator (tracker.py).
    """
    from ..ops.image import sobel_gradients


    B, C, H, W_ = x0.shape
    gxf1, gyf1 = sobel_gradients(x1)
    gxs1, gys1 = sobel_gradients(sigma1)
    # loop-invariant target maps: one channels-last operand, one gather/iter
    ufc_maps = [dpt1, x1, sigma1, gxf1, gyf1, gxs1, gys1]
    if obj_mask1 is not None:
        ufc_maps.append(obj_mask1.astype(x1.dtype))
    ufc_op, ufc_sizes = W.make_warp_operand(ufc_maps)

    if mest_loop_fn is None:
        mest_loop_fn = mest_fn

    def gn_iteration(i, carry):
        R, t, _, _, wres_acc = carry
        p = (R, t)
        u, v, dpt_r, depth_valid, u6, v6 = _warp_forward_depth(dpt0, p, K)
        warped = W.warp_operand(ufc_op, ufc_sizes, u, v)
        (dpt1_w, f_r, sigma_r, a_f, b_f, a_s, b_s) = warped[:7]
        occ = W.check_occ_prewarped(dpt_r, dpt1_w, u, v) | ~depth_valid
        if obj_mask0 is not None:
            occ = occ | ~obj_mask0.astype(jnp.bool_)
        if obj_mask1 is not None:
            occ = occ | ~(warped[7] > 0)
        res = f_r - x0
        sigma = jnp.sqrt(sigma_r * sigma_r + sigma0 * sigma0)
        from .residuals import ResidualOutput

        out = ResidualOutput(
            jnp.where(occ, 1e-6, res / sigma), res, sigma, occ
        )
        sigma3 = out.sigma**3
        scale = out.res * sigma_r / sigma3
        alpha = jnp.where(out.invalid, 1e-6, a_f / out.sigma - scale * a_s)
        beta = jnp.where(out.invalid, 1e-6, b_f / out.sigma - scale * b_s)
        fac = FactoredJtJ(alpha=alpha, beta=beta, u=u6, v=v6, sign=-1.0)
        weights = mest_loop_fn(out.weighted_res, x0, x1, w_prior)
        JtWJ, _ = jtj_jtr(fac, out.weighted_res, weights=weights)
        JtR = jtr_only(fac, out.weighted_res, weights=weights)
        H6 = lev_mar_damp(JtWJ)
        R_new, t_new = _update(solver, H6, JtR, p)
        if register_stats:
            wres_acc = jax.lax.dynamic_update_index_in_dim(
                wres_acc, out.weighted_res, i, 0
            )
        else:
            wres_acc = out.weighted_res
        return (R_new, t_new, weights, JtWJ, wres_acc)

    w0 = mest_fn(jnp.zeros_like(x0), x0, x1, w_prior)
    jtj0 = jnp.zeros((B, 6, 6), dtype=jnp.result_type(x0, sigma0, K))
    wres0 = (
        jnp.zeros((max_iter,) + x0.shape, x0.dtype)
        if register_stats
        else jnp.zeros_like(x0)
    )
    carry = (pose[0], pose[1], w0, jtj0, wres0)
    body_ok = loop_pure and solver.loop_safe
    R, t, weights, JtWJ, wres_all = run_gn_iterations(
        gn_iteration, carry, max_iter, unroll or not body_ok, scan_ok=body_ok
    )
    if register_stats:
        # bound re-applies, one per iteration IN ORDER: each sows its
        # BatchNorm batch_stats update into the live mutable collection,
        # compounding the EMA exactly like the reference's one-bound-call-
        # per-GN-iteration (algorithms.py:1066); the last input equals the
        # final in-loop input, so `weights` is unchanged vs the pure loop
        for i in range(max_iter):
            weights = mest_fn(wres_all[i], x0, x1, w_prior)
    return (R, t), weights, JtWJ


def tr_ufc_residual(
    pose, x0, x1, dpt0, dpt1, K, sigma0, sigma1, mest_fn=None, w_prior=None, obj_mask1=None
):
    """U_FC residual evaluation at fixed pose."""
    from .residuals import compose_residuals

    u, v, dpt_r, depth_valid, _, _ = _warp_forward_depth(dpt0, pose, K)
    occ = W.check_occ(dpt_r, dpt1, u, v) | ~depth_valid
    out = compose_residuals(u, v, occ, x0, x1, sigma0, sigma1)
    return compute_avg_loss([out.weighted_res], out.invalid)


# --------------------------------------------------------------------------
# ICP: stand-alone inverse point-to-plane track
# --------------------------------------------------------------------------


def tr_icp_level(
    pose: Pose,
    depth0,
    depth1,
    K,
    w_prior=None,
    obj_mask1=None,
    max_iter: int = 3,
    direction: str = "inverse",
    sigma_model: icp_mod.ICPSigmaModel = icp_mod.ICPSigmaModel(baseline=1.0),
    unroll: bool = False,
):
    """One level of the stand-alone ICP tracker (ref algorithms.py:374-425).

    ``direction='forward'`` gives the forward-compositional twin
    (``TrustRegionICP``, ref :161-212).  Returns ``(pose, weights, JtJ)``
    for uncertainty propagation.
    """
    B, _, H, W_ = depth0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    vertex0 = W.compute_vertex(depth0, px, py)
    vertex1 = W.compute_vertex(depth1, px, py)
    normal1 = compute_normal(vertex1)

    def gn_iteration(_, carry):
        R, t, _ = carry
        p = (R, t)
        if direction == "inverse":
            residuals, J, occ = icp_mod.icp_residuals_inverse(
                vertex0, vertex1, normal1, p, K, sigma_model=sigma_model
            )
        else:
            residuals, J, occ = icp_mod.icp_residuals_forward(
                vertex0, vertex1, normal1, p, K, sigma_model=sigma_model
            )
        JtJ, JtR = icp_mod.icp_jtj_jtr(J, residuals)
        Hd = lev_mar_damp(JtJ)
        if direction == "inverse":
            R_new, t_new = inverse_update_pose(Hd, JtR, p)
        else:
            R_new, t_new = forward_update_pose(Hd, JtR, p)
        return (R_new, t_new, JtJ)

    jtj0 = jnp.zeros((B, 6, 6), dtype=jnp.result_type(depth0, K))
    carry = (pose[0], pose[1], jtj0)
    carry = run_gn_iterations(
        gn_iteration, carry, max_iter, unroll, scan_ok=True
    )
    pose = (carry[0], carry[1])
    weights = jnp.ones_like(depth0)
    return pose, weights, carry[2]


def tr_icp_point_level(
    pose: Pose,
    depth0,
    depth1,
    K,
    max_iter: int = 10,
    dist_thr: float = 0.05,
    unroll: bool = False,
):
    """One level of point-to-point ICP (the reference's Open3D Point2Point
    baseline, ref tools/ICP.py:94-99) with projective association.

    Forward-compositional GN over the 3-channel ``T v0 - v1_r`` residual.
    :return: ``(pose, JtJ)``
    """
    B, _, H, W_ = depth0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    vertex0 = W.compute_vertex(depth0, px, py)
    vertex1 = W.compute_vertex(depth1, px, py)

    def gn_iteration(_, carry):
        R, t, _ = carry
        p = (R, t)
        residuals, J, occ = icp_mod.icp_residuals_point2point(
            vertex0, vertex1, p, K, dist_thr=dist_thr
        )
        JtJ, JtR = icp_mod.icp_p2p_jtj_jtr(J, residuals)
        Hd = lev_mar_damp(JtJ)
        R_new, t_new = forward_update_pose(Hd, JtR, p)
        return (R_new, t_new, JtJ)

    jtj0 = jnp.zeros((B, 6, 6), dtype=jnp.result_type(depth0, K))
    carry = (pose[0], pose[1], jtj0)
    carry = run_gn_iterations(
        gn_iteration, carry, max_iter, unroll, scan_ok=True
    )
    return (carry[0], carry[1]), carry[2]


def tr_icp_residual(
    pose, depth0, depth1, K, w_prior=None, obj_mask1=None,
    sigma_model: icp_mod.ICPSigmaModel = icp_mod.ICPSigmaModel(baseline=1.0),
):
    """ICP residual evaluation at fixed pose (ref algorithms.py:427-450)."""
    B, _, H, W_ = depth0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    vertex0 = W.compute_vertex(depth0, px, py)
    vertex1 = W.compute_vertex(depth1, px, py)
    normal1 = compute_normal(vertex1)
    residuals, _, occ = icp_mod.icp_residuals_inverse(
        vertex0, vertex1, normal1, pose, K, sigma_model=sigma_model
    )
    return compute_avg_loss([residuals], occ)
