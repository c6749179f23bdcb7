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

Three entry points share the scheme: `gather_twohot` (eval primal),
`gather_twohot_grads` (training forward, also emitting the within-cell
derivative maps saved as VJP residuals), and `splat_twohot` (the
operand-cotangent adjoint with the accumulator plane VMEM-resident).
All are batch-partitionable under a mesh via custom_partitioning
(`_batch_partitioned`).

Reference sampling semantics: code/models/geometry.py:353-365
(grid_sample align_corners=True, padding_mode='border').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

_BLK = 256
_INNER = 8
# keep the resident feature plane + the [blk, W*C] intermediates in VMEM
_MAX_PLANE_BYTES = 4 * 1024 * 1024
# probe-calibrated lane caps (scripts/probe_pallas_shapes{2,3}.py, v5e,
# 2026-08-18/19).  Probe 3 extended the 2048-4096 band: eval (128,8)
# wins 22.2 vs 35.0 ms at W*C=3840 and (128,4) 24.8 vs 34.8 at 4000;
# splat (128,8) wins 28.3 vs 50.5 at 3840 but only ties XLA at 4000
# with the configs that fit; grads at 2720 lanes flips to a narrow win
# at (128,8) (31.8 vs 32.5 — the 256/4 config measured in probe 2 lost)
_MAX_LANES = 4000
_MAX_LANES_GRADS = 2720
_MAX_LANES_SPLAT = 3840


def default_config(kind, H, W, C):
    """Probe-calibrated (blk, inner) for this shape, or None = no safe config.

    Measured on v5e (scripts/probe_pallas_shapes{,2}.py, dependent-chain
    slope timing, B=64).  VMEM-stack safety is the binding constraint:
    Mosaic's scoped 16 MB limit scales with blk*W*C lane-expanded
    temporaries, and the in-train compile has less headroom than a
    standalone one (splat blk=512 at W*C=1360 OOM'd in the train step but
    compiled standalone).  The splat/grads configs therefore keep
    blk*W*C <= 524k — 25% under the 696k product where the 5-matmul
    bodies OOM'd.  The eval branch's big-lane config (256, 4) reaches
    exactly 696,320 at W*C=2720: verified compile-safe in-program on the
    TPU — its 3-matmul body holds ~2 fewer [blk, W*C] temporaries than
    the grads body, so the same product fits where grads does not.
    """
    WC = W * C
    if H * WC * 4 > _MAX_PLANE_BYTES:
        return None
    if kind == "eval":
        if WC <= 2048:
            return (256, 8)
        if WC <= 2720:
            return (256, 4)
        if WC <= 3840:
            return (128, 8)
        return (128, 4) if WC <= _MAX_LANES else None
    if kind in ("train", "grads"):
        if WC <= 2048:
            return (256, 4)
        return (128, 8) if WC <= _MAX_LANES_GRADS else None
    if kind == "splat":
        if WC <= 2048:
            return (256, 8)
        return (128, 8) if WC <= _MAX_LANES_SPLAT else None
    raise ValueError(kind)


def profitable(kind, H, W, C) -> bool:
    """Whether the kernel beats the XLA path at this shape (auto mode).

    eval wins at every measured point (2.2x at W*C=1600/C=10, 2.1x at the
    level-1 C=17 shape, 1.8x at W*C=2720); grads wins modestly inside its
    lane cap.  The splat's grid overhead loses to XLA's two-hot matmul on
    small problems (8.0 vs 4.5 ms at the level-1 C=17 shape) and wins on
    big ones (22-23 vs 34 ms at level-0 C=17): gate on total work
    N*W*C >= 20M (N = H*W samples per image at the solver's levels).
    The 20M crossover is interpolated from those TWO measured points only
    (6.5M loses, 52M wins); shapes near the boundary (e.g. level-0 C=10
    at 30.7M) are classified by interpolation, not measurement — probe
    the boundary region before trusting the gate at a new preset.
    """
    if kind == "splat":
        return (H * W) * (W * C) >= 20_000_000
    return True


def supported(shape, dtype, kind="eval") -> bool:
    """Whether the two-hot kernel applies to this warp shape."""
    B, H, W, C = shape
    if dtype != jnp.float32:
        return False
    if H < 2 or W < 2:
        return False
    return default_config(kind, H, W, C) is not None


def _batch_axis(mesh, arg_shapes):
    """Mesh axis (or axis tuple) sharding dim 0 of the operands, or None.

    Picks the first operand whose PartitionSpec has a non-None dim-0
    entry; falls back to replication when the shard count does not
    divide the batch (pallas_call needs equal concrete per-shard B)."""
    for a in jax.tree.leaves(arg_shapes):
        spec = getattr(a.sharding, "spec", None)
        if spec is None or not len(spec) or spec[0] is None:
            continue
        axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
        n = 1
        for ax in axes:
            n *= mesh.shape[ax]
        return spec[0] if a.shape[0] % n == 0 else None
    return None


def _batch_only(mesh, b, x):
    return NamedSharding(mesh, PartitionSpec(b, *([None] * (len(x.shape) - 1))))


def _batch_partitioned(impl, rule, replicated):
    """Wrap a kernel entry in custom_partitioning, batch-sharded only.

    A pallas_call is an opaque custom call the GSPMD/shardy partitioner
    cannot split; this declares the batch (grid) dimension as the one
    partitionable axis so the kernels stay enabled under a multi-device
    mesh — each shard runs the kernel on its local batch slice, which is
    exactly the data-parallel training layout.  Every other dimension is
    marked need-replication: the partitioner inserts all-gathers if a
    user shards them (the H-sharded spatial mode should therefore run
    with DPFT_PALLAS_GATHER=0 — the XLA gather partitions natively).
    """
    cp = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_axis(mesh, arg_shapes)
        return jax.tree.map(lambda x: _batch_only(mesh, b, x), result_shape)

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis(mesh, arg_shapes)
        arg_sh = jax.tree.map(lambda x: _batch_only(mesh, b, x), arg_shapes)
        out_sh = jax.tree.map(lambda x: _batch_only(mesh, b, x), result_shape)
        return mesh, impl, out_sh, arg_sh

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=replicated,
    )
    return cp


def _reduce_w(Z, *, W, Wp, C, blk):
    """Sum a [blk, W*C] lane-expanded block over w (lane stride C) by
    log-halving on a pow2-padded width; returns [blk, C]."""
    if Wp > W:
        Z = jnp.concatenate(
            [Z, jnp.zeros((blk, (Wp - W) * C), jnp.float32)], axis=1
        )
    m = Wp
    while m > 1:
        half = m // 2
        Z = Z[:, : half * C] + Z[:, half * C : m * C]
        m = half
    return Z[:, 0:C]


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
        Z = _reduce_w(P * U, W=W, Wp=Wp, C=C, blk=blk)
        o_ref[0, :, j * blk : (j + 1) * blk] = Z.T


def _grads_kernel(aux_ref, f_ref, o_ref, gx_ref, gy_ref, *, H, W, C, blk, Wp,
                  inner):
    """Training-forward variant: emit the blend AND the two within-cell
    directional derivatives (ref gx/gy of geometry/warp.py::_bilinear_gather_bwd):

        gx[n] = P[u0+1] - P[u0]          (P = V @ F, dv-blended rows)
        gy[n] = (Vd @ F) blended at u    (Vd = onehot(v0+1) - onehot(v0))

    P is shared between out and gx; Vd has exact ±1 entries, so its hi/lo
    split needs only TWO bf16 passes (no Vl term) — 5 MXU passes total vs
    the eval kernel's 3.
    """
    F = f_ref[0]
    wl = jax.lax.broadcasted_iota(jnp.int32, (blk, W * C), 1) // C
    ih = jax.lax.broadcasted_iota(jnp.int32, (blk, H), 1)
    Fh = F.astype(jnp.bfloat16)
    Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    for j in range(inner):
        aux = aux_ref[0, 0, j]
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
        )
        Vd = (
            jnp.where(ih == v0 + 1, 1.0, 0.0) - jnp.where(ih == v0, 1.0, 0.0)
        ).astype(jnp.bfloat16)
        Pd = jax.lax.dot_general(
            Vd, Fh, dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(Vd, Fl, dn, preferred_element_type=jnp.float32)

        U = jnp.where(wl == u0, 1.0 - du, 0.0) + jnp.where(wl == u0 + 1, du, 0.0)
        Ud = jnp.where(wl == u0 + 1, 1.0, 0.0) - jnp.where(wl == u0, 1.0, 0.0)
        sl = slice(j * blk, (j + 1) * blk)
        o_ref[0, :, sl] = _reduce_w(P * U, W=W, Wp=Wp, C=C, blk=blk).T
        gx_ref[0, :, sl] = _reduce_w(P * Ud, W=W, Wp=Wp, C=C, blk=blk).T
        gy_ref[0, :, sl] = _reduce_w(Pd * U, W=W, Wp=Wp, C=C, blk=blk).T


def _splat_kernel(auxu_ref, auxv_ref, g_ref, o_ref, *, H, W, C, blk, inner):
    """Adjoint of the bilinear gather with the accumulator plane resident
    in VMEM.

    The XLA two-hot splat (geometry/warp.py::_splat_twohot) round-trips
    its [blk, side*C] intermediate P through HBM each block — the same
    loss the forward kernel fixed.  Here everything stays in VMEM:

        acc[h, x*C+c] += sum_n VT[h, n] * Q[n, x*C+c]
        Q = U_exp * tile_W(g)

    tile_W replicates the [blk, C] cotangent across the W lane groups via
    a tiny 0/1-pattern MXU matmul (g @ T, T[c, x*C+c'] = [c==c']); exact
    in two bf16 passes because T is 0/1.  The V contraction runs three
    bf16 hi/lo passes ('high'-equivalent, same scheme as the XLA splat's
    precision='high').  VT is built directly in [H, blk] layout from a
    PRE-TRANSPOSED (v0, dv) aux operand so the MXU contraction is a
    standard [H,blk]x[blk,W*C] matmul — contracting the sublane dim of
    two sample-major operands forces per-block relayouts instead.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    wl = jax.lax.broadcasted_iota(jnp.int32, (blk, W * C), 1) // C
    bh = jax.lax.broadcasted_iota(jnp.int32, (H, blk), 0)
    dn = (((1,), (0,)), ((), ()))

    acc = jnp.zeros((H, W * C), jnp.float32)
    for j in range(inner):
        auxu = auxu_ref[0, 0, j]  # [blk, 2] = (u0, du) sample-major
        auxv = auxv_ref[0, 0, j]  # [2, blk] = (v0, dv) pre-transposed
        u0 = auxu[:, 0:1].astype(jnp.int32)
        du = auxu[:, 1:2]
        v0r = auxv[0:1, :].astype(jnp.int32)
        dvr = auxv[1:2, :]
        g = g_ref[0, 0, j]  # [blk, C]

        # tile the cotangent across the W lane groups by concat (VPU
        # copies): an MXU 0/1-pattern matmul measured slower — a K=C=10
        # contraction wastes the 128-deep systolic array
        gt = jnp.concatenate([g] * W, axis=1)  # [blk, W*C] f32

        U = jnp.where(wl == u0, 1.0 - du, 0.0) + jnp.where(wl == u0 + 1, du, 0.0)
        Q = gt * U
        Qh = Q.astype(jnp.bfloat16)
        Ql = (Q - Qh.astype(jnp.float32)).astype(jnp.bfloat16)

        VT = jnp.where(bh == v0r, 1.0 - dvr, 0.0) + jnp.where(
            bh == v0r + 1, dvr, 0.0
        )  # [H, blk]
        VTh = VT.astype(jnp.bfloat16)
        VTl = (VT - VTh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (
            acc
            + jax.lax.dot_general(VTh, Qh, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(VTh, Ql, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(VTl, Qh, dn, preferred_element_type=jnp.float32)
        )
    o_ref[0] += acc


def _splat_impl(g_nc, v0, dv, u0, du, *, H, W, C, interpret, blk, inner):
    B, N = v0.shape
    step = blk * inner
    K = -(-N // step)
    N_pad = K * step

    def pad(x):
        # zero-cotangent padding samples contribute nothing to the splat
        return jnp.pad(x, ((0, 0), (0, N_pad - N)) + ((0, 0),) * (x.ndim - 2))

    auxu = pad(jnp.stack([u0.astype(jnp.float32), du], axis=-1))
    auxu = auxu.reshape(B, K, inner, blk, 2)
    auxv = pad(jnp.stack([v0.astype(jnp.float32), dv], axis=-1))
    auxv = jnp.swapaxes(auxv.reshape(B, K, inner, blk, 2), 3, 4)
    g_nc = pad(g_nc).reshape(B, K, inner, blk, C)

    out = pl.pallas_call(
        functools.partial(_splat_kernel, H=H, W=W, C=C, blk=blk, inner=inner),
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), jnp.float32),
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, 1, inner, blk, 2), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, inner, 2, blk), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, inner, blk, C), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # constant in k -> the accumulator plane stays VMEM-resident across
        # sample blocks and is written back once per batch image
        out_specs=pl.BlockSpec((1, H, W * C), lambda b, k: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(auxu, auxv, g_nc)
    return out.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def _splat_partitioned(H, W, C, interpret, blk, inner):
    def impl(g_nc, v0, dv, u0, du):
        # a plain closure, not functools.partial: custom_partitioning
        # resolves args via inspect.signature and rejects bound keywords
        return _splat_impl(g_nc, v0, dv, u0, du, H=H, W=W, C=C,
                           interpret=interpret, blk=blk, inner=inner)

    return _batch_partitioned(
        impl, "b n c, b n, b n, b n, b n -> b h w c", ("n", "c", "h", "w")
    )


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "interpret", "blk", "inner")
)
def splat_twohot(g_nc, v0, dv, u0, du, *, H, W, C, interpret=False,
                 blk=None, inner=None):
    """Operand cotangent of the bilinear gather (Pallas, VMEM-resident).

    blk/inner default to the probe-calibrated :func:`default_config`
    ("splat"): blk=512 OOM'd the scoped VMEM inside the real train step
    at W*C=1360 (bench_train --ab, 2026-08-18) even though it compiled
    standalone, so the defaults keep blk*W*C well under that point.
    Batch-partitionable under a mesh via custom_partitioning
    (see _batch_partitioned).

    :param g_nc: [B, N, C] f32 output cotangent (sample-major)
    :param v0, u0: [B, N] int corner starts, pre-clamped to [0, size-2]
    :param dv, du: [B, N] f32 fractional weights in [0, 1]
    :return: [B, H, W, C] f32 operand cotangent
    """
    if blk is None or inner is None:
        cfg = default_config("splat", H, W, C)
        if cfg is None:
            # refuse to run an uncalibrated config at a shape classified
            # unsafe — a Mosaic VMEM OOM is a worse failure than this error
            raise ValueError(
                f"no measured-safe Pallas splat config for H={H} W={W} C={C}"
                " (see default_config); pass blk/inner explicitly to force"
            )
        blk = cfg[0] if blk is None else blk
        inner = cfg[1] if inner is None else inner
    return _splat_partitioned(H, W, C, interpret, blk, inner)(
        g_nc, v0, dv, u0, du
    )


def _call(kernel, n_out, F_flat, v0, dv, u0, du, *, H, W, C, interpret,
          inner=_INNER, blk=_BLK):
    """Shared host wrapper: pack (v0, dv, u0, du) into the blocked aux
    operand, launch over a (B, sample-block) grid, strip the padding."""
    B, N = v0.shape
    step = blk * inner
    K = -(-N // step)
    N_pad = K * step
    Wp = 1 << (W - 1).bit_length()

    aux = jnp.stack(
        [v0.astype(jnp.float32), dv, u0.astype(jnp.float32), du], axis=-1
    )  # [B, N, 4]
    aux = jnp.pad(aux, ((0, 0), (0, N_pad - N), (0, 0)))
    aux = aux.reshape(B, K, inner, blk, 4)

    out_shape = jax.ShapeDtypeStruct((B, C, N_pad), jnp.float32)
    out_spec = pl.BlockSpec((1, C, blk * inner), lambda b, k: (b, 0, k),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(kernel, H=H, W=W, C=C, blk=blk, Wp=Wp, inner=inner),
        out_shape=[out_shape] * n_out,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, 1, inner, blk, 4), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant in k -> DMA'd once per batch image
            pl.BlockSpec((1, H, W * C), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * n_out,
        interpret=interpret,
    )(aux, F_flat)
    return tuple(o[:, :, :N] for o in outs)


@functools.lru_cache(maxsize=None)
def _gather_partitioned(H, W, C, interpret, grads, blk=None, inner=None):
    kernel, n_out = (_grads_kernel, 3) if grads else (_kernel, 1)
    if blk is None or inner is None:
        cfg = default_config("grads" if grads else "eval", H, W, C)
        if cfg is None:
            raise ValueError(
                f"no measured-safe Pallas gather config for H={H} W={W} C={C}"
                f" grads={grads}; pass blk/inner explicitly to force"
            )
        blk = cfg[0] if blk is None else blk
        inner = cfg[1] if inner is None else inner

    def impl(F_flat, v0, dv, u0, du):
        outs = _call(kernel, n_out, F_flat, v0, dv, u0, du,
                     H=H, W=W, C=C, interpret=interpret, inner=inner,
                     blk=blk)
        return outs if grads else outs[0]

    rule = "b h wc, b n, b n, b n, b n -> " + ", ".join(["b c n"] * n_out)
    return _batch_partitioned(impl, rule, ("h", "wc", "n", "c"))


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "interpret", "blk", "inner")
)
def gather_twohot(F_flat, v0, dv, u0, du, *, H, W, C, interpret=False,
                  blk=None, inner=None):
    """Bilinear sample via two-hot MXU contractions.

    Batch-partitionable under a mesh via custom_partitioning
    (see _batch_partitioned).

    :param F_flat: [B, H, W*C] f32 channels-last feature plane
    :param v0, u0: [B, N] int corner starts, pre-clamped to [0, size-2]
    :param dv, du: [B, N] f32 fractional weights in [0, 1]
    :return: [B, C, N] f32, bit-compatible layout with the XLA gather path
    """
    return _gather_partitioned(H, W, C, interpret, False, blk, inner)(
        F_flat, v0, dv, u0, du
    )


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "interpret", "blk", "inner")
)
def gather_twohot_grads(F_flat, v0, dv, u0, du, *, H, W, C, interpret=False,
                        blk=None, inner=None):
    """Training forward: bilinear sample + within-cell derivative maps.

    Same contract as :func:`gather_twohot`, returning ``(out, gx, gy)``
    each [B, C, N]: gx/gy match the corner blends of
    geometry/warp.py::_bilinear_gather_bwd, so the VJP's coordinate
    cotangents are ``sum_c g * gx`` with no corner residuals.

    inner=4: the 5-matmul body's VMEM stack exceeds the 16 MB scoped
    limit by 128 KB at inner=8.
    """
    return _gather_partitioned(H, W, C, interpret, True, blk, inner)(
        F_flat, v0, dv, u0, du
    )
