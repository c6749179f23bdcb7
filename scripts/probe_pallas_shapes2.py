"""Probe 2: dependent-chain timing of the two-hot kernels at the REAL
train shapes (C=17), fixing probe 1's unreliable independent-iteration
readings (0.36 ms / negative values on small programs — the relay needs
data-dependent chains, docs/PERF.md).

Each config is timed as jit'ed chains of 8 and 24 dependent reps (the
output's first element feeds back into an operand), reported as
(t24 - t8) / 16 per rep.  Run on TPU: python scripts/probe_pallas_shapes2.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep_prob_feature_track_tpu.ops.pallas.gather import (
        gather_twohot, gather_twohot_grads, splat_twohot,
    )
    from deep_prob_feature_track_tpu.geometry import warp as W_

    B = 64
    results = []

    def report(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    def chain_time(make_step, feed, args, reps_lo=8, reps_hi=24, calls=3):
        """make_step(x, args) -> out; feed(x, out) -> next x."""

        def chain(reps):
            @jax.jit
            def run(x, args):
                for _ in range(reps):
                    out = make_step(x, args)
                    x = feed(x, out)
                return x
            return run

        lo, hi = chain(reps_lo), chain(reps_hi)
        x0, a = args

        def timed(fn):
            out = fn(x0, a)
            np.asarray(out.ravel()[:4])  # warm + sync
            t0 = time.perf_counter()
            o = None
            for _ in range(calls):
                o = fn(x0, a)
            np.asarray(o.ravel()[:4])
            return time.perf_counter() - t0

        t_lo = timed(lo)
        t_hi = timed(hi)
        return (t_hi - t_lo) / (calls * (reps_hi - reps_lo))

    def try_cfg(tag, make_step, feed, args):
        try:
            ms = chain_time(make_step, feed, args) * 1e3
            report(probe=tag, ms=round(ms, 2), ok=True)
        except Exception as e:
            report(probe=tag, ok=False, err=str(e).splitlines()[0][:160])

    rng = np.random.RandomState(0)
    for (H, W, C) in [(60, 80, 17), (120, 160, 17)]:
        N = H * W
        F = jnp.asarray(rng.rand(B, H, W * C).astype(np.float32))
        v0 = jnp.asarray(rng.randint(0, H - 1, (B, N)).astype(np.int32))
        u0 = jnp.asarray(rng.randint(0, W - 1, (B, N)).astype(np.int32))
        dv = jnp.asarray(rng.rand(B, N).astype(np.float32))
        du = jnp.asarray(rng.rand(B, N).astype(np.float32))
        g = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
        starts = jnp.stack([v0, u0], axis=-1)

        aux = (v0, dv, u0, du, starts)
        feed_F = lambda F, out: F + out.ravel()[0] * 1e-30
        feed_g = lambda g, out: g + out.ravel()[0] * 1e-30

        def xla_fwd_grads(F, a, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            op = F.reshape(B, H, W, C)
            duB, dvB = du[:, None, :], dv[:, None, :]
            corners = W_._gather_corners(op, starts)
            out = W_._blend(corners, duB, dvB)
            gx = (corners[:, 0, 1] - corners[:, 0, 0]) * (1 - dvB) + (
                corners[:, 1, 1] - corners[:, 1, 0]) * dvB
            gy = (corners[:, 1, 0] - corners[:, 0, 0]) * (1 - duB) + (
                corners[:, 1, 1] - corners[:, 0, 1]) * duB
            return out + gx + gy  # force all three

        def xla_eval(F, a, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            op = F.reshape(B, H, W, C)
            return W_._blend(W_._gather_corners(op, starts),
                             du[:, None, :], dv[:, None, :])

        def xla_splat(g, a, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            return W_._splat_twohot(
                (B, H, W, C), starts, du[:, None, :], dv[:, None, :],
                jnp.swapaxes(g, 1, 2),
            ).reshape(B, N_out := H * W, C)[:, :N, :]

        def pl_grads(F, a, blk, inner, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            out, gx, gy = gather_twohot_grads(
                F, v0, dv, u0, du, H=H, W=W, C=C, blk=blk, inner=inner)
            return out + gx + gy

        def pl_eval(F, a, blk, inner, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            return gather_twohot(F, v0, dv, u0, du, H=H, W=W, C=C,
                                 blk=blk, inner=inner)

        def pl_splat(g, a, blk, inner, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            return splat_twohot(g, v0, dv, u0, du, H=H, W=W, C=C,
                                blk=blk, inner=inner).reshape(
                B, H * W, C)[:, :N, :]

        lvl = f"{H}x{W}_c{C}"
        try_cfg(f"xla_fwd_grads_{lvl}", xla_fwd_grads, feed_F, (F, aux))
        try_cfg(f"xla_eval_{lvl}", xla_eval, feed_F, (F, aux))
        try_cfg(f"xla_splat_{lvl}", xla_splat, feed_g, (g, aux))
        if W * C <= 2048:
            try_cfg(f"grads_{lvl}_256_4",
                    functools.partial(pl_grads, blk=256, inner=4), feed_F, (F, aux))
            try_cfg(f"eval_{lvl}_256_8",
                    functools.partial(pl_eval, blk=256, inner=8), feed_F, (F, aux))
            try_cfg(f"splat_{lvl}_256_4",
                    functools.partial(pl_splat, blk=256, inner=4), feed_g, (g, aux))
        else:
            try_cfg(f"grads_{lvl}_128_4",
                    functools.partial(pl_grads, blk=128, inner=4), feed_F, (F, aux))
            try_cfg(f"eval_{lvl}_256_4",
                    functools.partial(pl_eval, blk=256, inner=4), feed_F, (F, aux))
            try_cfg(f"splat_{lvl}_256_4",
                    functools.partial(pl_splat, blk=256, inner=4), feed_g, (g, aux))
            try_cfg(f"splat_{lvl}_128_8",
                    functools.partial(pl_splat, blk=128, inner=8), feed_g, (g, aux))

    with open("/tmp/probe_pallas_shapes2.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
