"""Pallas TPU kernel: fused factored JtWJ / JtR reduction.

Fuses the channel collapse (A = sum_c alpha^2, Bx = sum_c alpha*beta,
Cc = sum_c beta^2, ar/br = sum_c {alpha,beta}*r) with the 6x6 tile
reduction ``JtJ = u^T(Au + Bxv) + v^T(Bxu + Ccv)`` into a single VMEM
pass over pixel tiles: one load of alpha/beta/res/u/v per tile, MXU
matmuls for the 6x6 blocks, accumulation in a float32 VMEM scratch —
instead of XLA's separate channel-reduction and matmul kernels with the
intermediates round-tripping HBM.

Numerically identical (up to f32 reduction order) to
``solvers.jacobians.jtj_jtr`` — property-tested against it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(alpha_ref, beta_ref, res_ref, u_ref, v_ref, jtj_ref, jtr_ref, acc_ref):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    alpha = alpha_ref[0]  # [C, T]
    beta = beta_ref[0]
    res = res_ref[0]
    u = u_ref[0]  # [T, 8] (6 padded to 8)
    v = v_ref[0]

    A = jnp.sum(alpha * alpha, axis=0)  # [T]
    Bx = jnp.sum(alpha * beta, axis=0)
    Cc = jnp.sum(beta * beta, axis=0)
    ar = jnp.sum(alpha * res, axis=0)
    br = jnp.sum(beta * res, axis=0)

    left1 = u * A[:, None] + v * Bx[:, None]  # [T, 8]
    left2 = u * Bx[:, None] + v * Cc[:, None]
    jtj = jnp.dot(left1.T, u, preferred_element_type=jnp.float32) + jnp.dot(
        left2.T, v, preferred_element_type=jnp.float32
    )  # [8, 8]
    jtr = jnp.sum(u * ar[:, None] + v * br[:, None], axis=0)  # [8]

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[0:8, :] += jtj
    acc_ref[8, :] += jtr

    @pl.when(t == n_t - 1)
    def _():
        jtj_ref[0] = acc_ref[0:8, :]
        jtr_ref[0] = acc_ref[8:9, :]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_jtj_jtr(
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    res: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    sign: float = -1.0,
    tile: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``(JtWJ [B,6,6], JtR [B,6,1])`` from rank-2 Jacobian factors.

    :param alpha, beta, res: ``[B, C, HW]``
    :param u, v: ``[B, HW, 6]`` warp Jacobians
    :param sign: overall Jacobian sign (survives only in JtR)
    """
    B, C, HW = alpha.shape
    n_tiles = max(1, -(-HW // tile))
    pad = n_tiles * tile - HW
    if pad:
        alpha = jnp.pad(alpha, ((0, 0), (0, 0), (0, pad)))
        beta = jnp.pad(beta, ((0, 0), (0, 0), (0, pad)))
        res = jnp.pad(res, ((0, 0), (0, 0), (0, pad)))
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    # pad the twist dim to the 8-sublane boundary
    u = jnp.pad(u, ((0, 0), (0, 0), (0, 2)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 2)))

    grid = (B, n_tiles)
    jtj, jtr = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 8), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 8), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((9, 8), jnp.float32)],
        interpret=interpret,
    )(alpha, beta, res, u, v)
    return jtj[:, :6, :6], (sign * jtr[:, 0, :6])[..., None]
