"""Microbench: Pallas fused two-hot bilinear forward vs the XLA DMA gather.

The XLA two-hot *forward* measured 39.0 ms vs the DMA gather's 28.9 ms at
the level-0 train shape because the [blk, W*C] intermediate P round-trips
HBM (docs/PERF.md round-2 null result).  This kernel keeps P in VMEM:
one MXU matmul P = V @ F per sample block (V = two-hot y-interpolation
rows), then the x-interpolation + strided channel reduction on the VPU.

Usage: python bench_gather_twohot.py  (TPU; slope-timed)
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _setup_cache():
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------- kernel


def _fwd_kernel(v0_ref, dv_ref, u0_ref, du_ref, f_ref, o_ref, *, H, W, C, blk, Wp,
                precision, mode="full"):
    v0 = v0_ref[0, 0]  # [blk, 1] int32  (block (1,1,blk,1))
    dv = dv_ref[0, 0]  # [blk, 1] f32
    u0 = u0_ref[0, 0]
    du = du_ref[0, 0]
    F = f_ref[0]  # [H, W*C]

    if mode == "floor":
        o_ref[0] = jnp.broadcast_to(dv.T, (C, blk)) + F[0, 0]
        return
    if mode == "nomm":
        # ablation: replace the MXU matmul by a cheap broadcast
        P = jnp.broadcast_to(F[0:1, :], (blk, W * C)) * dv
    else:
        ih = jax.lax.broadcasted_iota(jnp.int32, (blk, H), 1)
        V = jnp.where(ih == v0, 1.0 - dv, 0.0) + jnp.where(ih == v0 + 1, dv, 0.0)
        if precision == "split3cat":
            # F arrives pre-split as [3H, W*C] bf16 = [Fh; Fl; Fh]; one MXU
            # matmul with K=3H accumulates all three bf16 passes in f32
            Vf = V
            Vh = Vf.astype(jnp.bfloat16)
            Vl = (Vf - Vh.astype(jnp.float32)).astype(jnp.bfloat16)
            Vcat = jnp.concatenate([Vh, Vh, Vl], axis=1)  # [blk, 3H]
            P = jax.lax.dot_general(
                Vcat, F, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        elif precision == "split3":
            # manual 3-pass bf16 split (~f32 'high'): exact hi parts + cross terms
            Vh = V.astype(jnp.bfloat16)
            Vl = (V - Vh.astype(jnp.float32)).astype(jnp.bfloat16)
            Fh = F.astype(jnp.bfloat16)
            Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            P = (
                jax.lax.dot_general(Vh, Fh, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(Vh, Fl, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(Vl, Fh, dn, preferred_element_type=jnp.float32)
            )
        else:
            P = jax.lax.dot_general(
                V, F, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [blk, W*C]

    if mode == "noU":
        Z = P * du
    else:
        # x-interpolation weights expanded along lanes (w = lane // C)
        wl = wl_c
        U = jnp.where(wl == u0, 1.0 - du, 0.0) + jnp.where(wl == u0 + 1, du, 0.0)
        Z = P * U

    if mode == "nored":
        o_ref[0] = Z[:, 0:C].T
        return
    if mode == "notr":
        pass  # fall through to reduction; untransposed write below
    # strided sum over w (stride C) by log-halving on the padded lane dim
    if Wp > W:
        Z = jnp.concatenate(
            [Z, jnp.zeros((blk, (Wp - W) * C), jnp.float32)], axis=1
        )
    m = Wp
    while m > 1:
        half = m // 2
        Z = Z[:, : half * C] + Z[:, half * C : m * C]
        m = half
    if mode == "notr":
        o_ref[0] = Z[:, 0:C]  # [blk, C]
    else:
        o_ref[0] = Z[:, 0:C].T  # [C, blk]


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "blk", "precision", "mode"))
def twohot_fwd_pallas(F_cl, v0, dv, u0, du, *, H, W, C, blk, precision="highest", mode="full"):
    """F_cl [B, H, W*C]; v0/u0 [B,N] int32; dv/du [B,N] f32 -> [B,C,N]."""
    B, N = v0.shape
    K = -(-N // blk)
    N_pad = K * blk
    Wp = 1 << (W - 1).bit_length()

    def prep(a, dt):
        a = jnp.pad(a.astype(dt), ((0, 0), (0, N_pad - N)))
        return a.reshape(B, K, blk, 1)

    if precision == "split3cat":
        Fh = F_cl.astype(jnp.bfloat16)
        Fl = (F_cl - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
        F_in = jnp.concatenate([Fh, Fl, Fh], axis=1)  # [B, 3H, W*C]
        f_rows = 3 * H
    else:
        F_in = F_cl
        f_rows = H
    if mode == "notr":
        out_shape = jax.ShapeDtypeStruct((B, N_pad, C), jnp.float32)
        out_spec = pl.BlockSpec((1, blk, C), lambda b, k: (b, k, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((B, C, N_pad), jnp.float32)
        out_spec = pl.BlockSpec((1, C, blk), lambda b, k: (b, 0, k),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, H=H, W=W, C=C, blk=blk, Wp=Wp, precision=precision,
            mode=mode,
        ),
        out_shape=out_shape,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, 1, blk, 1), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk, 1), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk, 1), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk, 1), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_rows, W * C), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
    )(prep(v0, jnp.int32), prep(dv, jnp.float32),
      prep(u0, jnp.int32), prep(du, jnp.float32), F_in)
    if mode == "notr":
        return jnp.swapaxes(out[:, :N, :], 1, 2)
    return out[:, :, :N]


def _fwd_kernel_packed(aux_ref, f_ref, o_ref, *, H, W, C, blk, Wp, mode, inner):
    """Packed-aux variant: aux [inner, blk, 4] f32 = (v0, dv, u0, du)."""
    F = f_ref[0]  # [H, W*C] f32
    if mode != "floor":
        wl_c = jax.lax.broadcasted_iota(jnp.int32, (blk, W * C), 1) // C
        ih_c = jax.lax.broadcasted_iota(jnp.int32, (blk, H), 1)
        # split INSIDE the kernel: the TPU-side XLA pass folds
        # F - f32(bf16(F)) to zero when done outside (even behind an
        # optimization_barrier); Mosaic performs it faithfully
        Fh = F.astype(jnp.bfloat16)
        Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
    for j in range(inner):
        aux = aux_ref[0, 0, j]  # [blk, 4]
        v0f = aux[:, 0:1]
        dv = aux[:, 1:2]
        u0f = aux[:, 2:3]
        du = aux[:, 3:4]
        if mode == "floor":
            o_ref[0, :, j * blk : (j + 1) * blk] = (
                jnp.broadcast_to(dv.T, (C, blk)) + F[0, 0].astype(jnp.float32)
            )
            continue
        v0 = v0f.astype(jnp.int32)
        u0 = u0f.astype(jnp.int32)
        ih = ih_c
        V = jnp.where(ih == v0, 1.0 - dv, 0.0) + jnp.where(ih == v0 + 1, dv, 0.0)
        Vh = V.astype(jnp.bfloat16)
        Vl = (V - Vh.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        P = (
            jax.lax.dot_general(Vh, Fh, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vh, Fl, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vl, Fh, dn, preferred_element_type=jnp.float32)
        )
        wl = wl_c
        U = jnp.where(wl == u0, 1.0 - du, 0.0) + jnp.where(wl == u0 + 1, du, 0.0)
        Z = P * U
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


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "blk", "mode", "inner"))
def twohot_fwd_packed(F_cl, v0, dv, u0, du, *, H, W, C, blk, mode="full", inner=1):
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

    F_in = F_cl
    f_rows = H

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_packed, H=H, W=W, C=C, blk=blk, Wp=Wp, mode=mode,
            inner=inner,
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, N_pad), jnp.float32),
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, 1, inner, blk, 4), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_rows, W * C), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, blk * inner), lambda b, k: (b, 0, k),
                               memory_space=pltpu.VMEM),
    )(aux, F_in)
    return out[:, :, :N]


def _fwd_kernel_fori(aux_ref, f_ref, o_ref, *, H, W, C, blk, Wp, K):
    """Whole image per grid step; fori_loop over sample blocks."""
    F = f_ref[0]  # [H, W*C] f32
    wl_c = jax.lax.broadcasted_iota(jnp.int32, (blk, W * C), 1) // C
    ih_c = jax.lax.broadcasted_iota(jnp.int32, (blk, H), 1)
    Fh = F.astype(jnp.bfloat16)
    Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def body(j, _):
        aux = aux_ref[0, pl.ds(j * blk, blk)]  # [blk, 4]
        v0 = aux[:, 0:1].astype(jnp.int32)
        dv = aux[:, 1:2]
        u0 = aux[:, 2:3].astype(jnp.int32)
        du = aux[:, 3:4]
        V = jnp.where(ih_c == v0, 1.0 - dv, 0.0) + jnp.where(ih_c == v0 + 1, dv, 0.0)
        Vh = V.astype(jnp.bfloat16)
        Vl = (V - Vh.astype(jnp.float32)).astype(jnp.bfloat16)
        P = (
            jax.lax.dot_general(Vh, Fh, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vh, Fl, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vl, Fh, dn, preferred_element_type=jnp.float32)
        )
        U = jnp.where(wl_c == u0, 1.0 - du, 0.0) + jnp.where(wl_c == u0 + 1, du, 0.0)
        Z = P * U
        if Wp > W:
            Z = jnp.concatenate(
                [Z, jnp.zeros((blk, (Wp - W) * C), jnp.float32)], axis=1
            )
        m = Wp
        while m > 1:
            half = m // 2
            Z = Z[:, : half * C] + Z[:, half * C : m * C]
            m = half
        o_ref[0, :, pl.ds(j * blk, blk)] = Z[:, 0:C].T
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "blk"))
def twohot_fwd_fori(F_cl, v0, dv, u0, du, *, H, W, C, blk):
    B, N = v0.shape
    K = -(-N // blk)
    N_pad = K * blk
    Wp = 1 << (W - 1).bit_length()
    aux = jnp.stack(
        [v0.astype(jnp.float32), dv, u0.astype(jnp.float32), du], axis=-1
    )
    aux = jnp.pad(aux, ((0, 0), (0, N_pad - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_fori, H=H, W=W, C=C, blk=blk, Wp=Wp, K=K),
        out_shape=jax.ShapeDtypeStruct((B, C, N_pad), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N_pad, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, N_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(aux, F_cl)
    return out[:, :, :N]


# ---------------------------------------------------------------- harness


def slope_time(fn, args, lo=10, hi=30):
    out = fn(*args)
    jax.block_until_ready(out)

    def timed(iters):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    t_lo = timed(lo)
    t_hi = timed(hi)
    assert t_hi > 1.5 * t_lo, (t_lo, t_hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    _setup_cache()
    from deep_prob_feature_track_tpu.geometry import warp

    B, H, W, C = 64, 120, 160, 10
    N = H * W
    rng = np.random.RandomState(0)
    operand = rng.randn(B, H, W, C).astype(np.float32)
    u = rng.uniform(-2, W + 1, (B, N)).astype(np.float32)
    v = rng.uniform(-2, H + 1, (B, N)).astype(np.float32)

    # XLA baseline (the current production path)
    @jax.jit
    def xla_fwd(op, uu, vv):
        return warp._bilinear_gather_fast(op, uu, vv)

    op_d, u_d, v_d = map(jax.device_put, (operand, u, v))
    ref = np.asarray(xla_fwd(op_d, u_d, v_d))
    dt = slope_time(xla_fwd, (op_d, u_d, v_d))
    print(f"xla gather fwd: {dt*1e3:8.2f} ms", flush=True)

    # Pallas two-hot: same corner prep on host side of the kernel
    starts, du, dv, _, _ = warp._corner_weights(operand.shape, jnp.asarray(u), jnp.asarray(v))
    v0 = np.asarray(starts[..., 0])
    u0 = np.asarray(starts[..., 1])
    du = np.asarray(du[:, 0, :])
    dv = np.asarray(dv[:, 0, :])
    F_cl = operand.reshape(B, H, W * C)
    args0 = tuple(map(jax.device_put, (F_cl, v0, dv, u0, du)))

    for blk, mode, inner in [
        (256, "full", 8),
        (256, "fori", 0),
        (512, "fori", 0),
    ]:
            try:
                if mode == "fori":
                    fn = functools.partial(twohot_fwd_fori, H=H, W=W, C=C, blk=blk)
                else:
                    fn = functools.partial(
                        twohot_fwd_packed, H=H, W=W, C=C, blk=blk, mode=mode,
                        inner=inner,
                    )
                out = np.asarray(fn(*args0))
                err = np.abs(out - ref).max()
                dt = slope_time(fn, args0)
                print(
                    f"packed blk={blk} mode={mode} inner={inner}: "
                    f"{dt*1e3:8.2f} ms  maxerr={err:.2e}",
                    flush=True,
                )
            except Exception as e:
                msg = str(e).split("\n")[0][:150]
                print(f"packed blk={blk} mode={mode} inner={inner}: FAIL {msg}",
                      flush=True)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()  # fail fast instead of hanging on a dead relay
    main()
