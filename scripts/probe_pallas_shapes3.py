"""Probe 3 (round 3): the 2048-4096 lane band + the splat 20M boundary.

VERDICT round-2 item 3: the lane caps (ops/pallas/gather.py _MAX_LANES
2720 / _MAX_LANES_GRADS 2048) were tightened conservatively and the
2048-4096 range never re-measured; the splat profitability gate
(N*W*C >= 20M) is interpolated from two points only.  This probe
dependent-chain-times (probe 2's methodology — independent-iteration
slope timing under-reports on this relay):

- W*C = 2720 (level-0 C=17): grads at blk=128 (the 256 config lost to
  XLA 33.1 vs 32.3 — is that VMEM pressure or fundamental?)
- W*C = 3840 (120x160 C=24, a plausible wider-feature preset): eval /
  grads / splat at blk=128 — extends the caps toward 4096 if safe
- W*C = 4080 (120x160 C=25.5 -> use 80x160 C=25.5? no: 120x160 C=25
  = 4000): the near-4096 edge
- the splat gate boundary: level-0 C=10 (N*W*C = 30.7M, gate says
  kernel) measured vs the XLA splat to confirm the 20M crossover.

Run on TPU: python scripts/probe_pallas_shapes3.py
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

    from deep_prob_feature_track_tpu.geometry import warp as W_
    from deep_prob_feature_track_tpu.ops.pallas.gather import (
        gather_twohot,
        gather_twohot_grads,
        splat_twohot,
    )

    B = 64
    results = []

    def report(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    def chain_time(make_step, feed, args, reps_lo=8, reps_hi=24, calls=3):
        def chain(reps):
            @jax.jit
            def run(x, a):
                for _ in range(reps):
                    out = make_step(x, a)
                    x = feed(x, out)
                return x

            return run

        lo, hi = chain(reps_lo), chain(reps_hi)
        x0, a = args

        def timed(fn):
            out = fn(x0, a)
            np.asarray(out.ravel()[:4])
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
    # (H, W, C, pallas configs to try per kind)
    cases = [
        # level-0 C=17: can a smaller grads block beat XLA where 256/4 lost?
        (120, 160, 17, {"grads": [(128, 4), (128, 8)], "eval": [], "splat": []}),
        # 3840 lanes: the 2048-4096 band
        (120, 160, 24, {"grads": [(128, 4)], "eval": [(128, 8), (128, 4)],
                        "splat": [(128, 8), (64, 8)]}),
        # 4000 lanes: near the 4096 edge
        (120, 160, 25, {"grads": [], "eval": [(128, 4)], "splat": [(64, 8)]}),
        # splat-gate boundary: level-0 C=10, N*W*C = 30.7M
        (120, 160, 10, {"grads": [], "eval": [], "splat": [(256, 8)]}),
    ]
    for H, W, C, cfgs in cases:
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
                corners[:, 1, 1] - corners[:, 1, 0]
            ) * dvB
            gy = (corners[:, 1, 0] - corners[:, 0, 0]) * (1 - duB) + (
                corners[:, 1, 1] - corners[:, 0, 1]
            ) * duB
            return out + gx + gy

        def xla_eval(F, a, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            op = F.reshape(B, H, W, C)
            return W_._blend(
                W_._gather_corners(op, starts), du[:, None, :], dv[:, None, :]
            )

        def xla_splat(g, a, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            return W_._splat_twohot(
                (B, H, W, C), starts, du[:, None, :], dv[:, None, :],
                jnp.swapaxes(g, 1, 2),
            ).reshape(B, H * W, C)[:, :N, :]

        def pl_grads(F, a, blk, inner, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            out, gx, gy = gather_twohot_grads(
                F, v0, dv, u0, du, H=H, W=W, C=C, blk=blk, inner=inner
            )
            return out + gx + gy

        def pl_eval(F, a, blk, inner, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            return gather_twohot(
                F, v0, dv, u0, du, H=H, W=W, C=C, blk=blk, inner=inner
            )

        def pl_splat(g, a, blk, inner, H=H, W=W, C=C):
            v0, dv, u0, du, starts = a
            return splat_twohot(
                g, v0, dv, u0, du, H=H, W=W, C=C, blk=blk, inner=inner
            ).reshape(B, H * W, C)[:, :N, :]

        lvl = f"{H}x{W}_c{C}"
        if cfgs["grads"]:
            try_cfg(f"xla_fwd_grads_{lvl}", xla_fwd_grads, feed_F, (F, aux))
        if cfgs["eval"]:
            try_cfg(f"xla_eval_{lvl}", xla_eval, feed_F, (F, aux))
        if cfgs["splat"]:
            try_cfg(f"xla_splat_{lvl}", xla_splat, feed_g, (g, aux))
        for blk, inner in cfgs["grads"]:
            try_cfg(f"grads_{lvl}_{blk}_{inner}",
                    functools.partial(pl_grads, blk=blk, inner=inner),
                    feed_F, (F, aux))
        for blk, inner in cfgs["eval"]:
            try_cfg(f"eval_{lvl}_{blk}_{inner}",
                    functools.partial(pl_eval, blk=blk, inner=inner),
                    feed_F, (F, aux))
        for blk, inner in cfgs["splat"]:
            try_cfg(f"splat_{lvl}_{blk}_{inner}",
                    functools.partial(pl_splat, blk=blk, inner=inner),
                    feed_g, (g, aux))

    with open("/tmp/probe_pallas_shapes3.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
