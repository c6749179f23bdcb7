"""Pallas TPU kernel: fused two-hot MXU bilinear warp (eval forward).

XLA's TPU gather costs ~24 ns per index regardless of layout — the
forward warp's wall (docs/PERF.md "Bandwidth utilization": 6.8 GB/s
effective, 0.8% of HBM bandwidth).  The bilinear corner weights are
separable, so sampling is exactly

    out[n, c] = sum_{h,w} V[n, h] * U[n, w] * F[h, w, c]

with two-hot row/column vectors V/U — the same reformulation that made
the backward splat fast (geometry/warp.py::_splat_twohot).  The XLA
version of this *forward* lost to the gather (39 vs 29 ms) because the
[blk, W*C] intermediate P = V @ F round-trips HBM; this kernel keeps P
in VMEM:

- per grid step, 8 unrolled sample blocks of 256 against a VMEM-resident
  [H, W*C] channels-last feature plane (one DMA per batch image);
- P = V @ F runs as three bf16 MXU passes with an in-kernel hi/lo split
  of both operands (f32-'high'-equivalent, max err ~5e-5; the split must
  live INSIDE the kernel — the TPU XLA pipeline folds
  ``F - f32(bf16(F))`` to zero even behind an optimization_barrier);
- the x-interpolation applies a lane-expanded two-hot U and reduces the
  w-stride by log-halving; the [blk, C] result is transposed in-kernel
  so the output lands directly in the solver's [B, C, N] layout.

Measured 13.3 ms vs the XLA gather's 29.4 ms at the level-0 train shape
(B=64, 120x160, C=10, 1.23M indices) — 2.2x.  Grid-step overhead is the
reason for the 8-block inner unroll: a 1-block-per-step version spends
10.8 ms in bare harness overhead (docs/PERF.md round-2 notes).

Used for the *eval* primal only: the training forward keeps the XLA
corner gather because the backward reuses the materialized corners as
VJP residuals (geometry/warp.py::_bilinear_gather_fwd).

Reference sampling semantics: code/models/geometry.py:353-365
(grid_sample align_corners=True, padding_mode='border').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 256
_INNER = 8
# keep the resident feature plane + the [blk, W*C] intermediates in VMEM
_MAX_PLANE_BYTES = 4 * 1024 * 1024
_MAX_LANES = 4096


def supported(shape, dtype) -> bool:
    """Whether the two-hot kernel applies to this warp shape."""
    B, H, W, C = shape
    if dtype != jnp.float32:
        return False
    if H < 2 or W < 2:
        return False
    if W * C > _MAX_LANES or H * W * C * 4 > _MAX_PLANE_BYTES:
        return False
    return True


def _kernel(aux_ref, f_ref, o_ref, *, H, W, C, blk, Wp, inner):
    F = f_ref[0]  # [H, W*C] f32, resident per batch image
    wl = jax.lax.broadcasted_iota(jnp.int32, (blk, W * C), 1) // C
    ih = jax.lax.broadcasted_iota(jnp.int32, (blk, H), 1)
    # hi/lo bf16 split of the feature plane (must stay in-kernel, see module doc)
    Fh = F.astype(jnp.bfloat16)
    Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    for j in range(inner):
        aux = aux_ref[0, 0, j]  # [blk, 4] f32 = (v0, dv, u0, du)
        v0 = aux[:, 0:1].astype(jnp.int32)
        dv = aux[:, 1:2]
        u0 = aux[:, 2:3].astype(jnp.int32)
        du = aux[:, 3:4]

        V = jnp.where(ih == v0, 1.0 - dv, 0.0) + jnp.where(ih == v0 + 1, dv, 0.0)
        Vh = V.astype(jnp.bfloat16)
        Vl = (V - Vh.astype(jnp.float32)).astype(jnp.bfloat16)
        P = (
            jax.lax.dot_general(Vh, Fh, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vh, Fl, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vl, Fh, dn, preferred_element_type=jnp.float32)
        )  # [blk, W*C], VMEM-resident

        U = jnp.where(wl == u0, 1.0 - du, 0.0) + jnp.where(wl == u0 + 1, du, 0.0)
        Z = P * U
        # sum over w (lane stride C) by log-halving on a pow2-padded width
        if Wp > W:
            Z = jnp.concatenate(
                [Z, jnp.zeros((blk, (Wp - W) * C), jnp.float32)], axis=1
            )
        m = Wp
        while m > 1:
            half = m // 2
            Z = Z[:, : half * C] + Z[:, half * C : m * C]
            m = half
        o_ref[0, :, j * blk : (j + 1) * blk] = Z[:, 0:C].T


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "interpret")
)
def gather_twohot(F_flat, v0, dv, u0, du, *, H, W, C, interpret=False):
    """Bilinear sample via two-hot MXU contractions.

    :param F_flat: [B, H, W*C] f32 channels-last feature plane
    :param v0, u0: [B, N] int corner starts, pre-clamped to [0, size-2]
    :param dv, du: [B, N] f32 fractional weights in [0, 1]
    :return: [B, C, N] f32, bit-compatible layout with the XLA gather path
    """
    B, N = v0.shape
    blk, inner = _BLK, _INNER
    step = blk * inner
    K = -(-N // step)
    N_pad = K * step
    Wp = 1 << (W - 1).bit_length()

    aux = jnp.stack(
        [v0.astype(jnp.float32), dv, u0.astype(jnp.float32), du], axis=-1
    )  # [B, N, 4]
    aux = jnp.pad(aux, ((0, 0), (0, N_pad - N), (0, 0)))
    aux = aux.reshape(B, K, inner, blk, 4)

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, blk=blk, Wp=Wp, inner=inner),
        out_shape=jax.ShapeDtypeStruct((B, C, N_pad), jnp.float32),
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, 1, inner, blk, 4), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant in k -> DMA'd once per batch image
            pl.BlockSpec((1, H, W * C), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, blk * inner), lambda b, k: (b, 0, k),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(aux, F_flat)
    return out[:, :, :N]
