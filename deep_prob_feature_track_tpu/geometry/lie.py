"""Batched SO(3)/SE(3) Lie-group operations, fully vectorized for TPU.

TPU-native rewrite of the geometry kernel of the reference implementation
(reference: code/models/geometry.py:87-288).  Unlike the reference, every
operation here is branch-free and batch-vectorized (the reference's
``batch_mat2twist`` runs a per-sample Python loop, geometry.py:236-246);
small-angle cases are handled with Taylor expansions under ``jnp.where`` so
the functions are safe to differentiate and to ``vmap``/``jit``.

Conventions (matching the reference):
  * a pose is a pair ``(R, t)`` with ``R: [B,3,3]`` and ``t: [B,3]``
  * twists are ordered ``[rot, trs]`` when packed into 6-vectors
  * compose is left-multiplication: ``compose(dR,dt, R0,t0) = [dR@R0 | dR@t0 + dt]``
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[...,3] -> [...,3,3] skew-symmetric matrix (ref geometry.py:146-161)."""
    o = jnp.zeros_like(w[..., 0])
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    rows = jnp.stack(
        [
            jnp.stack([o, -w2, w1], axis=-1),
            jnp.stack([w2, o, -w0], axis=-1),
            jnp.stack([-w1, w0, o], axis=-1),
        ],
        axis=-2,
    )
    return rows


def exp_so3(twist: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3) exponential (Rodrigues), batch-safe at theta -> 0.

    Reference: geometry.py:163-185 (which divides by theta and NaNs at 0;
    here we use the A = sin(t)/t, B = (1-cos(t))/t^2 form with Taylor
    fallbacks so the zero twist maps to the identity and gradients are
    finite).
    """
    theta_sq = jnp.sum(twist * twist, axis=-1)  # [...]
    theta = jnp.sqrt(theta_sq + _EPS)
    small = theta_sq < 1e-8
    # A = sin(theta)/theta ; B = (1 - cos(theta))/theta^2
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / (theta_sq + _EPS))
    w = skew(twist)
    w2 = w @ w
    eye = jnp.broadcast_to(jnp.eye(3, dtype=twist.dtype), w.shape)
    return eye + a[..., None, None] * w + b[..., None, None] * w2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) -> so(3) log map, vectorized (ref geometry.py:209-248).

    The reference loops over the batch in Python; this is the same math
    (Eade eq. 18) expressed with ``where`` so it vectorizes and jits.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    near_identity = jnp.abs(cos_theta) >= 1.0 - 1e-8
    magnitude = jnp.where(
        near_identity, 0.5, 0.5 * theta / jnp.sin(jnp.where(near_identity, 1.0, theta))
    )
    return magnitude[..., None] * vee


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle magnitude of a batch of rotations (ref geometry.py:187-207)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    eps = 1e-7
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0 + eps, 1.0 - eps))


def inverse(R: jnp.ndarray, t: jnp.ndarray):
    """Pose inverse ``[R^T | -R^T t]`` (ref geometry.py:87-103)."""
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    return Rt, t_inv


def compose(d_R: jnp.ndarray, d_t: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray):
    """Left-compose ``[dR@R0 | dR@t0 + dt]`` (ref geometry.py:105-123)."""
    R1 = d_R @ R0
    t1 = jnp.einsum("...ij,...j->...i", d_R, t0) + d_t
    return R1, t1


def between(R0: jnp.ndarray, t0: jnp.ndarray, R1: jnp.ndarray, t1: jnp.ndarray):
    """Relative pose ``T1 o T0^{-1}`` (ref geometry.py:125-144)."""
    dR = R1 @ jnp.swapaxes(R0, -1, -2)
    dt = t1 - jnp.einsum("...ij,...j->...i", dR, t0)
    return dR, dt


def quat_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """3-vector quaternion (w fixed to 1 pre-normalization) -> rotation matrix.

    Reference: geometry.py:251-271.
    """
    ones = jnp.ones_like(quat[..., :1])
    q = jnp.concatenate([ones, quat], axis=-1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


# The 24 euler-angle conventions, encoded as (first axis, parity,
# repetition, frame) — the canonical transforms3d/Gohlke parameterization
# that the reference also ports (geometry.py:447-553).  's'=static
# (extrinsic) frame, 'r'=rotating (intrinsic); the 4-tuple drives one
# shared closed form instead of 24 separate formulas.
_EULER_AXES = {
    "sxyz": (0, 0, 0, 0), "sxyx": (0, 0, 1, 0), "sxzy": (0, 1, 0, 0),
    "sxzx": (0, 1, 1, 0), "syzx": (1, 0, 0, 0), "syzy": (1, 0, 1, 0),
    "syxz": (1, 1, 0, 0), "syxy": (1, 1, 1, 0), "szxy": (2, 0, 0, 0),
    "szxz": (2, 0, 1, 0), "szyx": (2, 1, 0, 0), "szyz": (2, 1, 1, 0),
    "rzyx": (0, 0, 0, 1), "rxyx": (0, 0, 1, 1), "ryzx": (0, 1, 0, 1),
    "rxzx": (0, 1, 1, 1), "rxzy": (1, 0, 0, 1), "ryzy": (1, 0, 1, 1),
    "rzxy": (1, 1, 0, 1), "ryxy": (1, 1, 1, 1), "ryxz": (2, 0, 0, 1),
    "rzxz": (2, 0, 1, 1), "rxyz": (2, 1, 0, 1), "rzyz": (2, 1, 1, 1),
}
_NEXT_AXIS = (1, 2, 0, 1)


def euler_to_matrix(
    ai: jnp.ndarray, aj: jnp.ndarray, ak: jnp.ndarray, axes: str = "sxyz"
) -> jnp.ndarray:
    """Batched euler angles -> rotation matrix, any of the 24 conventions.

    Parity target: reference ``batch_euler2mat`` (geometry.py:447-504),
    itself a port of transforms3d.euler.euler2mat.  ``axes`` is static
    (resolved at trace time), so under jit each convention compiles to a
    straight-line closed form; the default 'sxyz' (the only convention the
    reference's models ever call) is R = Rz(ak) @ Ry(aj) @ Rx(ai).
    """
    first, parity, repetition, frame = _EULER_AXES[axes]
    i = first
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    if frame:
        ai, ak = ak, ai
    if parity:
        ai, aj, ak = -ai, -aj, -ak

    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk

    m = [[None] * 3 for _ in range(3)]
    if repetition:
        m[i][i], m[i][j], m[i][k] = cj, sj * si, sj * ci
        m[j][i], m[j][j], m[j][k] = sj * sk, -cj * ss + cc, -cj * cs - sc
        m[k][i], m[k][j], m[k][k] = -sj * ck, cj * sc + cs, cj * cc - ss
    else:
        m[i][i], m[i][j], m[i][k] = cj * ck, sj * sc - cs, sj * cc + ss
        m[j][i], m[j][j], m[j][k] = cj * sk, sj * ss + cc, sj * cs - sc
        m[k][i], m[k][j], m[k][k] = -sj, cj * si, cj * ci
    rows = [jnp.stack(r, axis=-1) for r in m]
    return jnp.stack(rows, axis=-2)


def matrix_to_euler(M: jnp.ndarray, axes: str = "sxyz"):
    """Inverse of :func:`euler_to_matrix`, vectorized, any convention.

    Reference: ``batch_mat2euler`` (geometry.py:506-553); the gimbal-lock
    branch is a ``where`` select instead of data-dependent control flow so
    the whole thing stays jit- and vmap-compatible.
    """
    first, parity, repetition, frame = _EULER_AXES[axes]
    i = first
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]

    if repetition:
        sy = jnp.sqrt(M[..., i, j] ** 2 + M[..., i, k] ** 2)
        degenerate = sy <= 1e-8
        ax = jnp.where(
            degenerate,
            jnp.arctan2(-M[..., j, k], M[..., j, j]),
            jnp.arctan2(M[..., i, j], M[..., i, k]),
        )
        ay = jnp.arctan2(sy, M[..., i, i])
        az = jnp.where(degenerate, 0.0, jnp.arctan2(M[..., j, i], -M[..., k, i]))
    else:
        cy = jnp.sqrt(M[..., i, i] ** 2 + M[..., j, i] ** 2)
        degenerate = cy <= 1e-8
        ax = jnp.where(
            degenerate,
            jnp.arctan2(-M[..., j, k], M[..., j, j]),
            jnp.arctan2(M[..., k, j], M[..., k, k]),
        )
        ay = jnp.arctan2(-M[..., k, i], cy)
        az = jnp.where(degenerate, 0.0, jnp.arctan2(M[..., j, i], M[..., i, i]))

    if parity:
        ax, ay, az = -ax, -ay, -az
    if frame:
        ax, az = az, ax
    return ax, ay, az


def pose_vec_to_Rt(vec: jnp.ndarray, rotation_mode: str = "euler"):
    """6-DoF vector [rx,ry,rz,tx,ty,tz] -> (R, t) (ref geometry.py:274-288).

    Note the reference feeds the *translation* slice ``vec[:,3:]`` to the
    rotation head as well (geometry.py:282-283) — a long-standing quirk of the
    original code that its shipped checkpoints were trained under.  We
    reproduce it so imported checkpoints behave identically.
    """
    trs = vec[..., 3:]
    rot_compact = vec[..., 3:]
    if rotation_mode == "euler":
        R = euler_to_matrix(rot_compact[..., 0], rot_compact[..., 1], rot_compact[..., 2])
    elif rotation_mode == "quat":
        R = quat_to_matrix(rot_compact)
    else:
        raise ValueError(f"unknown rotation mode {rotation_mode!r}")
    return R, trs


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(w) (Taylor-safe)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS)
    small = theta_sq < 1e-8
    # J = I + B*W + C*W^2 with B=(1-cos)/t^2, C=(t-sin)/t^3
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / (theta_sq + _EPS))
    c = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta + _EPS)
    )
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse SO(3) left Jacobian (Taylor-safe)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS)
    small = theta_sq < 1e-8
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / (theta_sq + _EPS)) * (1.0 - half * jnp.cos(half) / jnp.sin(jnp.where(small, 1.0, half))),
    )
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * (W @ W)


def exp_se3(xi: jnp.ndarray):
    """se(3) -> SE(3): twist [rot(3), trs(3)] -> (R, t).

    ``t = J_l(w) rho`` with the SO(3) left Jacobian.
    """
    w = xi[..., :3]
    rho = xi[..., 3:]
    R = exp_so3(w)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(w), rho)
    return R, t


def log_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """SE(3) -> se(3) twist [rot, trs]."""
    w = log_so3(R)
    rho = jnp.einsum("...ij,...j->...i", _so3_left_jacobian_inv(w), t)
    return jnp.concatenate([w, rho], axis=-1)


def adjoint_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint in [rot, trs] twist order:
    ``Adj = [[R, 0], [skew(t) R, R]]`` (6x6)."""
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bottom = jnp.concatenate([skew(t) @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion [qx,qy,qz,qw] (TUM trajectory order).

    Branch-free Shepperd-style selection expressed with ``where`` so it
    vectorizes; stable for all rotation classes.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate solutions, pick the best-conditioned
    qw0 = 0.5 * safe_sqrt(1.0 + tr)
    c0 = jnp.stack(
        [(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0],
        axis=-1,
    )
    qx1 = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    c1 = jnp.stack(
        [qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)],
        axis=-1,
    )
    qy2 = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    c2 = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)],
        axis=-1,
    )
    qz3 = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    c3 = jnp.stack(
        [(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)],
        axis=-1,
    )
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    alt = jnp.where(
        cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)
    )
    q = jnp.where((tr > 0)[..., None], c0, alt)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def transform_to_matrix4(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> homogeneous 4x4 (ref geometry.py:1139-1149)."""
    B = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), B + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def matrix4_to_Rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]
