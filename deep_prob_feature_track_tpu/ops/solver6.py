"""Batched 6x6 damped normal-equation solves, fully on-device.

The reference bounces every 6x6 Hessian to the CPU for inversion because
small-matrix inverse was faster there on its GPU stack
(code/models/algorithms.py:2077-2091).  On TPU we keep everything on-device:
the damped Hessian is symmetric positive definite, so we use a batched
Cholesky factorization + two triangular solves, which XLA lowers to fused
on-chip linalg with no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lev_mar_damp(
    JtWJ: jnp.ndarray, damping: float = 1e-6, abs_floor: float = 1e-12
) -> jnp.ndarray:
    """Trace-scaled diagonal damping ``H + (eps*trace(diag(H)) + floor)*I``.

    Reference: algorithms.py:2094-2103 (``lev_mar_H``).  The tiny absolute
    floor (absent in the reference) keeps the Cholesky factorization finite
    when JtWJ is exactly zero (e.g. a textureless frame), where trace-only
    damping would leave a singular system; with the floor the solve then
    returns a zero update instead of NaNs.
    """
    eye = jnp.eye(6, dtype=JtWJ.dtype)
    trace = jnp.trace(JtWJ, axis1=-2, axis2=-1)
    return JtWJ + (trace * damping + abs_floor)[..., None, None] * eye


def solve_chol(H: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve ``H x = rhs`` for SPD ``H`` via batched Cholesky.

    :param H: ``[B,6,6]`` damped Hessians (SPD)
    :param rhs: ``[B,6]`` or ``[B,6,1]``
    :return: same trailing shape as ``rhs``
    """
    squeeze = rhs.ndim == H.ndim - 1
    b = rhs[..., None] if squeeze else rhs
    L = jnp.linalg.cholesky(H)
    y = jax.lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0] if squeeze else x


def solve_chol_unrolled(H: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Fully unrolled 6x6 Cholesky solve (straight-line VPU code).

    Runtime-equivalent alternative to :func:`solve_chol`; measured
    marginally faster per step on TPU but considerably slower to compile
    through Mosaic when unrolled across many GN iterations, so the linalg
    path is the default.
    """
    squeeze = rhs.ndim == H.ndim - 1
    b = rhs if squeeze else rhs[..., 0]
    n = 6
    # Cholesky-Crout, fully unrolled: L[i][j] are [B] vectors
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        inv_diag[j] = 1.0 / d
        for i in range(j + 1, n):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_diag[j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_diag[i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_diag[i]
    out = jnp.stack(x, axis=-1)
    return out if squeeze else out[..., None]


def solve_inverse(H: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Plain ``H^{-1} rhs`` matching the reference's differentiable inverse
    (algorithms.py:2017-2032) — kept for parity testing against solve_chol."""
    squeeze = rhs.ndim == H.ndim - 1
    b = rhs[..., None] if squeeze else rhs
    x = jnp.linalg.solve(H, b)
    return x[..., 0] if squeeze else x
