"""Tune the two-hot matmul splat: blk, precision, orientation."""
import os
import time

import numpy as np
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
g = jnp.asarray(rng.randn(B, C, N).astype(np.float32))


def splat(u, v, g, blk, precision, orient):
    u0 = jnp.minimum(jnp.floor(u), W - 2.0)
    v0 = jnp.minimum(jnp.floor(v), H - 2.0)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    g_nc = jnp.swapaxes(g, 1, 2)  # [B,N,C]
    nblk = N // blk
    iw = jnp.arange(W, dtype=jnp.int32)
    ih = jnp.arange(H, dtype=jnp.int32)

    def twohot(idx, frac, size_iota):
        a = (size_iota[None, None, :] == idx[..., None]) * (1 - frac[..., None])
        b = (size_iota[None, None, :] == (idx + 1)[..., None]) * frac[..., None]
        return a + b

    def body(acc, xs):
        u0b, dub, v0b, dvb, gb = xs
        U = twohot(u0b, dub, iw)  # [B,blk,W]
        V = twohot(v0b, dvb, ih)  # [B,blk,H]
        if orient == "w_out":
            P = V[:, :, :, None] * gb[:, :, None, :]  # [B,blk,H,C]
            acc = acc + jnp.einsum(
                "bkw,bkm->bwm", U, P.reshape(B, blk, H * C), precision=precision
            )
        else:
            P = U[:, :, :, None] * gb[:, :, None, :]  # [B,blk,W,C]
            acc = acc + jnp.einsum(
                "bkh,bkm->bhm", V, P.reshape(B, blk, W * C), precision=precision
            )
        return acc, None

    xs = (
        u0i.reshape(B, nblk, blk).transpose(1, 0, 2),
        du.reshape(B, nblk, blk).transpose(1, 0, 2),
        v0i.reshape(B, nblk, blk).transpose(1, 0, 2),
        dv.reshape(B, nblk, blk).transpose(1, 0, 2),
        g_nc.reshape(B, nblk, blk, C).transpose(1, 0, 2, 3),
    )
    if orient == "w_out":
        acc0 = jnp.zeros((B, W, H * C), jnp.float32)
    else:
        acc0 = jnp.zeros((B, H, W * C), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, xs)
    if orient == "w_out":
        return acc.reshape(B, W, H, C).transpose(0, 2, 1, 3)
    return acc.reshape(B, H, W, C)


def time_fn(f):
    out = f(u, v, g)
    out.block_until_ready()

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
    return (t30 - t10) / 20, out


ref = None
for orient in ["h_out", "w_out"]:
    for precision in ["highest", "high"]:
        for blk in [960, 1920, 3840]:
            f = jax.jit(lambda u, v, g, blk=blk, p=precision, o=orient: splat(u, v, g, blk, p, o))
            dt, out = time_fn(f)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"orient={orient} prec={precision} blk={blk}: {dt*1e3:.2f} ms  maxerr={err:.2e}")
