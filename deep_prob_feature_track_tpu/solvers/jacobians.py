"""IC Gauss-Newton Jacobians with factored (Jacobian-free) JtWJ reductions.

The reference materializes the full chained Jacobian ``[B, C, H*W, 6]`` and
reduces it with huge batched matmuls (code/models/algorithms.py:812-834,
:1867-1882).  On TPU that tensor is pure HBM traffic: the chained Jacobian
has rank-2 structure per pixel,

    J[b,c,p,:] = alpha[b,c,p] * u[b,p,:] + beta[b,c,p] * v[b,p,:]

where ``u = dx/dxi`` and ``v = dy/dxi`` are the 6-vector warp Jacobians
(shared across channels) and ``alpha/beta`` are the per-channel image
x/y-gradient terms.  Channel reductions therefore collapse to three scalar
maps

    A = sum_c alpha^2,  Bx = sum_c alpha*beta,  Cc = sum_c beta^2

and the 6x6 reduction becomes two ``[B,6,HW] @ [B,HW,6]`` matmuls —
MXU-shaped, with O(B*HW*(C+36)) memory traffic instead of O(B*C*HW*6).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.image import sobel_gradients


def compute_jacobian_warping(
    p_invdepth: jnp.ndarray, K: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic 2x6 pixel-coordinate-to-twist Jacobian, linearized at origin.

    Reference: algorithms.py:1884-1917.  Twist order is [rot, trs].

    :return: ``(Jx_p, Jy_p)`` each ``[B, H*W, 6]``
    """
    B, C, H, W = p_invdepth.shape
    x = px.reshape(B, -1)
    y = py.reshape(B, -1)
    invd = p_invdepth.reshape(B, -1)
    xy = x * y
    O = jnp.zeros_like(x)
    dx_dp = jnp.stack([-xy, 1 + x * x, -y, invd, O, -invd * x], axis=-1)
    dy_dp = jnp.stack([-1 - y * y, xy, x, O, invd, -invd * y], axis=-1)
    fx = K[:, 0][:, None, None]
    fy = K[:, 1][:, None, None]
    return dx_dp * fx, dy_dp * fy


class FactoredJtJ(NamedTuple):
    """Per-pixel rank-2 factors of the chained Jacobian."""

    alpha: jnp.ndarray  # [B,C,H,W] x-gradient coefficient
    beta: jnp.ndarray   # [B,C,H,W] y-gradient coefficient
    u: jnp.ndarray      # [B,HW,6] warp Jacobian in x
    v: jnp.ndarray      # [B,HW,6] warp Jacobian in y
    sign: float         # +1 (forward) / -1 (inverse-compositional)


def jtj_jtr(
    fac: FactoredJtJ,
    residual: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute ``(JtWJ [B,6,6], JtWr [B,6,1])`` without materializing J.

    Equivalent to the reference's ``compute_jtj``/``compute_jtr``
    (algorithms.py:812-834) applied to
    ``J = sign * (alpha (x) u + beta (x) v)`` with optional per-pixel
    weights ``w`` (``JtWJ = J^T diag(w) J``).

    Set ``DPFT_PALLAS=1`` to route the unweighted reduction through the
    fused Pallas TPU kernel (``ops/pallas/jtj.py``).
    """
    import os

    B, C, H, W = residual.shape
    if (
        weights is None
        and os.environ.get("DPFT_PALLAS", "0") not in ("", "0")
        and jax.default_backend() not in ("cpu",)
    ):
        from ..ops.pallas.jtj import fused_jtj_jtr

        hw = H * W
        return fused_jtj_jtr(
            fac.alpha.reshape(B, C, hw),
            fac.beta.reshape(B, C, hw),
            residual.reshape(B, C, hw),
            fac.u,
            fac.v,
            sign=fac.sign,
        )
    hw = H * W
    alpha = fac.alpha.reshape(B, C, hw)
    beta = fac.beta.reshape(B, C, hw)
    r = residual.reshape(B, C, hw)
    if weights is not None:
        w = weights.reshape(B, -1, hw)
        wa, wb = w * alpha, w * beta
    else:
        wa, wb = alpha, beta
    # channel-collapsed quadratic coefficients [B,HW]
    A = jnp.einsum("bcp,bcp->bp", wa, alpha)
    Bx = jnp.einsum("bcp,bcp->bp", wa, beta)
    Cc = jnp.einsum("bcp,bcp->bp", wb, beta)
    ar = jnp.einsum("bcp,bcp->bp", wa, r)
    br = jnp.einsum("bcp,bcp->bp", wb, r)

    u, v = fac.u, fac.v
    # JtJ = u^T(A u + Bx v) + v^T(Bx u + Cc v): two [B,6,HW]@[B,HW,6] matmuls
    left1 = u * A[..., None] + v * Bx[..., None]
    left2 = u * Bx[..., None] + v * Cc[..., None]
    JtWJ = jnp.einsum("bpi,bpj->bij", left1, u) + jnp.einsum("bpi,bpj->bij", left2, v)
    JtR = jnp.einsum("bpi,bp->bi", u, ar) + jnp.einsum("bpi,bp->bi", v, br)
    # sign^2 == 1 cancels in JtJ; it survives in JtR.
    return JtWJ, (fac.sign * JtR)[..., None]


def jtr_only(fac: FactoredJtJ, residual: jnp.ndarray, weights=None) -> jnp.ndarray:
    """``J^T (w * r)`` alone (used by the residual-volume damping net)."""
    B, C, H, W = residual.shape
    hw = H * W
    alpha = fac.alpha.reshape(B, C, hw)
    beta = fac.beta.reshape(B, C, hw)
    r = residual.reshape(B, C, hw)
    if weights is not None:
        r = weights.reshape(B, -1, hw) * r
    ar = jnp.einsum("bcp,bcp->bp", alpha, r)
    br = jnp.einsum("bcp,bcp->bp", beta, r)
    JtR = jnp.einsum("bpi,bp->bi", fac.u, ar) + jnp.einsum("bpi,bp->bi", fac.v, br)
    return (fac.sign * JtR)[..., None]


class UICPrecomp(NamedTuple):
    """Template-side precomputations of the U_IC solver (one per level)."""

    gxf: jnp.ndarray  # [B,C,H,W] normalized Sobel d(f0)/dx
    gyf: jnp.ndarray
    gxs: jnp.ndarray  # [B,C,H,W] normalized Sobel d(sigma0)/dx
    gys: jnp.ndarray
    u: jnp.ndarray    # [B,HW,6]
    v: jnp.ndarray


def precompute_uic(invD0, f0, sigma0, px, py, K) -> UICPrecomp:
    """Precompute template gradients + warp Jacobians for the inverse track.

    Reference: algorithms.py:848-865 (``precompute_jacobian_components``).
    """
    gxf, gyf = sobel_gradients(f0)
    gxs, gys = sobel_gradients(sigma0)
    u, v = compute_jacobian_warping(invD0, K, px, py)
    return UICPrecomp(gxf, gyf, gxs, gys, u, v)


def uic_factors(pre: UICPrecomp, res, sigma, sigma0) -> FactoredJtJ:
    """Per-iteration Jacobian coefficients of the uncertainty-normalized
    inverse residual.

    Reference: algorithms.py:867-887 (``compose_inverse_jacobians``):
    ``J_crd = -grad_f0/sigma - res * (sigma0 * grad_sigma0 / sigma^3)`` and
    the overall inverse-compositional sign flip ``J = -J``.
    """
    sigma3 = sigma * sigma * sigma
    scale = res * sigma0 / sigma3
    alpha = -pre.gxf / sigma - scale * pre.gxs
    beta = -pre.gyf / sigma - scale * pre.gys
    return FactoredJtJ(alpha=alpha, beta=beta, u=pre.u, v=pre.v, sign=-1.0)


class ICPrecomp(NamedTuple):
    """Template-side precomputation of the plain IC solver (DeeperIC)."""

    fac: FactoredJtJ  # alpha/beta = normalized template feature gradients


def precompute_ic(invD0, f0, px, py, K) -> ICPrecomp:
    """Plain deep-IC precomputed Jacobian (ref algorithms.py:103-121).

    No sigma, no sign flip (the reference keeps the DIC paper's sign
    convention, algorithms.py:119-121).
    """
    gxf, gyf = sobel_gradients(f0)
    u, v = compute_jacobian_warping(invD0, K, px, py)
    return ICPrecomp(FactoredJtJ(alpha=gxf, beta=gyf, u=u, v=v, sign=1.0))
