"""Microbenchmark: bilinear-gather backward scatter variants on real TPU.

Variants:
  A: current  — concat-4 scatter, operand [B,H,W,C], updates [B,4N,C]
  C: sorted   — argsort linear indices, flattened [B,HW,C] scatter, sorted=True
  E: two-hot  — blocked matmul splat (MXU)
  F: layout   — operand [B,C,HW], updates [B,C,4N] (N minormost, fwd-symmetric)
"""
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 64, 120, 160, 10
N = H * W

rng = np.random.RandomState(0)
u = jnp.asarray(rng.uniform(0, W - 1, (B, N)).astype(np.float32))
v = jnp.asarray(rng.uniform(0, H - 1, (B, N)).astype(np.float32))
g = jnp.asarray(rng.randn(B, C, N).astype(np.float32))  # cotangent, NC-last layout


def corner_data(u, v):
    u0 = jnp.minimum(jnp.floor(u), W - 2.0)
    v0 = jnp.minimum(jnp.floor(v), H - 2.0)
    du = (u - u0)[:, None, :]  # [B,1,N]
    dv = (v - v0)[:, None, :]
    starts = jnp.stack([v0.astype(jnp.int32), u0.astype(jnp.int32)], axis=-1)
    weights = [(1 - du) * (1 - dv), du * (1 - dv), (1 - du) * dv, du * dv]
    return starts, weights


OFFSETS = [(0, 0), (0, 1), (1, 0), (1, 1)]


def variant_A(u, v, g):
    starts, weights = corner_data(u, v)
    g_nc = jnp.swapaxes(g, 1, 2)  # [B,N,C]
    idx4 = jnp.concatenate(
        [starts + jnp.asarray([dy, dx], starts.dtype) for (dy, dx) in OFFSETS], axis=1
    )
    upd4 = jnp.concatenate([g_nc * jnp.swapaxes(w, 1, 2) for w in weights], axis=1)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,),
        inserted_window_dims=(1, 2),
        scatter_dims_to_operand_dims=(1, 2),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    return jax.lax.scatter_add(
        jnp.zeros((B, H, W, C), g.dtype), idx4, upd4, dnums,
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def variant_C(u, v, g):
    starts, weights = corner_data(u, v)
    lin = jnp.concatenate(
        [
            (starts[..., 0] + dy) * W + (starts[..., 1] + dx)
            for (dy, dx) in OFFSETS
        ],
        axis=1,
    )  # [B,4N]
    upd4 = jnp.concatenate(
        [jnp.swapaxes(g * w, 1, 2) for w in weights], axis=1
    )  # [B,4N,C]
    order = jnp.argsort(lin, axis=1)
    lin_s = jnp.take_along_axis(lin, order, axis=1)
    upd_s = jnp.take_along_axis(upd4, order[..., None], axis=1)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1,),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    out = jax.lax.scatter_add(
        jnp.zeros((B, N, C), g.dtype), lin_s[..., None], upd_s, dnums,
        indices_are_sorted=True,
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return out.reshape(B, H, W, C)


def variant_E(u, v, g, blk=1200):
    u0 = jnp.minimum(jnp.floor(u), W - 2.0)
    v0 = jnp.minimum(jnp.floor(v), H - 2.0)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    g_nc = jnp.swapaxes(g, 1, 2)  # [B,N,C]
    nblk = N // blk

    def body(acc, xs):
        u0b, dub, v0b, dvb, gb = xs  # [B,blk], ..., [B,blk,C]
        iw = jnp.arange(W, dtype=jnp.int32)
        ih = jnp.arange(H, dtype=jnp.int32)
        U = (iw[None, None, :] == u0b[..., None]) * (1 - dub[..., None]) + (
            iw[None, None, :] == (u0b + 1)[..., None]
        ) * dub[..., None]  # [B,blk,W]
        V = (ih[None, None, :] == v0b[..., None]) * (1 - dvb[..., None]) + (
            ih[None, None, :] == (v0b + 1)[..., None]
        ) * dvb[..., None]  # [B,blk,H]
        P = V[:, :, :, None] * gb[:, :, None, :]  # [B,blk,H,C]
        acc = acc + jnp.einsum(
            "bkw,bkm->bwm", U, P.reshape(B, blk, H * C),
            precision="highest",
        )
        return acc, None

    xs = (
        u0i.reshape(B, nblk, blk).transpose(1, 0, 2),
        du.reshape(B, nblk, blk).transpose(1, 0, 2),
        v0i.reshape(B, nblk, blk).transpose(1, 0, 2),
        dv.reshape(B, nblk, blk).transpose(1, 0, 2),
        g_nc.reshape(B, nblk, blk, C).transpose(1, 0, 2, 3),
    )
    acc0 = jnp.zeros((B, W, H * C), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc.reshape(B, W, H, C).transpose(0, 2, 1, 3)


def variant_F2(u, v, g):
    """operand [B,C,HW]; updates [B,C,4N] (N minormost, fwd-symmetric)
    via update_window_dims=(1,) and indices [B,4N,1]."""
    starts, weights = corner_data(u, v)
    lin = jnp.concatenate(
        [(starts[..., 0] + dy) * W + (starts[..., 1] + dx) for (dy, dx) in OFFSETS],
        axis=1,
    )  # [B,4N]
    upd4 = jnp.concatenate([g * w for w in weights], axis=2)  # [B,C,4N]
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(2,),
        scatter_dims_to_operand_dims=(2,),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    out = jax.lax.scatter_add(
        jnp.zeros((B, C, N), g.dtype),
        lin[..., None],
        upd4,  # [B,C,4N]: axis0 batch, axis1 window(C), axis2 scatter(4N)
        dnums,
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return out.reshape(B, C, H, W).transpose(0, 2, 3, 1)


def run(name, fn, ref=None):
    f = jax.jit(fn)
    try:
        out = f(u, v, g)
        out.block_until_ready()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    if ref is not None:
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < 1e-3, (name, err)
    # slope timing
    def chain(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = f(u, v, g)
        float(o.ravel()[0])
        return time.perf_counter() - t0

    chain(3)
    t10 = chain(10)
    t30 = chain(30)
    dt = (t30 - t10) / 20
    print(f"{name}: {dt*1e3:.2f} ms/call")
    return out


ref = run("A_current", variant_A)
run("E_twohot", variant_E, ref)
run("F2_layout", variant_F2, ref)
