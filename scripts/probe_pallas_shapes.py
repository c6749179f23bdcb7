"""Probe: compile + slope-time the Pallas two-hot kernels at the REAL
train-step shapes (stacked warp operand C=17) across (blk, inner) configs,
against the XLA paths at the same shapes.

Round-2 finding: the kernels were tuned on C=10 microbench shapes; the real
train step stacks feature/sigma/depth into C=17, and splat_twohot at the
level-1 shape (W*C=1360, blk=512) exceeds the 16 MB scoped-VMEM limit by
544 KB (bench_train --ab crash, 2026-08-18).  This probe measures which
(blk, inner) fit and how fast they are, so ops/pallas/gather.py's chooser
can be measured-safe instead of modeled.

TIMING CAVEAT: only the ok/err compile-safety results here are valid.
The ms numbers use independent-iteration slope timing, which this relay
under-reports (0.36 ms / negative readings observed) because repeated
same-input launches overlap; take timings from probe_pallas_shapes2.py,
whose iterations form a dependent chain.

Run on TPU: python scripts/probe_pallas_shapes.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep_prob_feature_track_tpu.ops.pallas.gather import (
        gather_twohot, gather_twohot_grads, splat_twohot,
    )
    from deep_prob_feature_track_tpu.geometry import warp as W_

    def sync(x):
        # relay's block_until_ready under-reports; fetch a dependent value
        return np.asarray(jax.tree.leaves(x)[0].ravel()[:4])

    def slope(fn, args, lo=5, hi=15):
        sync(fn(*args))
        def timed(iters):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(*args)
            sync(out)
            return time.perf_counter() - t0
        t_lo, t_hi = timed(lo), timed(hi)
        return (t_hi - t_lo) / (hi - lo)

    def inputs(B, H, W, C, seed=0):
        rng = np.random.RandomState(seed)
        N = H * W
        F = jnp.asarray(rng.rand(B, H, W * C).astype(np.float32))
        v0 = jnp.asarray(rng.randint(0, H - 1, (B, N)).astype(np.int32))
        u0 = jnp.asarray(rng.randint(0, W - 1, (B, N)).astype(np.int32))
        dv = jnp.asarray(rng.rand(B, N).astype(np.float32))
        du = jnp.asarray(rng.rand(B, N).astype(np.float32))
        g = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
        return F, v0, dv, u0, du, g

    B = 64
    results = []

    def report(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    def try_cfg(tag, fn, args):
        try:
            ms = slope(fn, args) * 1e3
            report(probe=tag, ms=round(ms, 2), ok=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            report(probe=tag, ok=False, err=msg)

    # ---- shapes the train step actually hits (C=17 stacked operand) ----
    for (H, W, C) in [(60, 80, 17), (120, 160, 17)]:
        F, v0, dv, u0, du, g = inputs(B, H, W, C)
        import functools

        # XLA baselines at this shape
        starts = jnp.stack([v0, u0], axis=-1)
        duB, dvB = du[:, None, :], dv[:, None, :]

        @jax.jit
        def xla_fwd(F=F, starts=starts, duB=duB, dvB=dvB, H=H, W=W, C=C):
            op = F.reshape(B, H, W, C)
            corners = W_._gather_corners(op, starts)
            out = W_._blend(corners, duB, dvB)
            gx = (corners[:, 0, 1] - corners[:, 0, 0]) * (1 - dvB) + (
                corners[:, 1, 1] - corners[:, 1, 0]) * dvB
            gy = (corners[:, 1, 0] - corners[:, 0, 0]) * (1 - duB) + (
                corners[:, 1, 1] - corners[:, 0, 1]) * duB
            return out, gx, gy

        try_cfg(f"xla_fwd_grads_{H}x{W}_c{C}", lambda: xla_fwd(), ())

        @jax.jit
        def xla_splat(g=g, starts=starts, duB=duB, dvB=dvB, H=H, W=W, C=C):
            return W_._splat_twohot((B, H, W, C), starts, duB, dvB,
                                    jnp.swapaxes(g, 1, 2))

        try_cfg(f"xla_splat_{H}x{W}_c{C}", lambda: xla_splat(), ())

        grads_cfgs = [(256, 4), (256, 2), (128, 4)] if W * C > 2048 else [(256, 4)]
        for blk, inner in grads_cfgs:
            fn = functools.partial(gather_twohot_grads, H=H, W=W, C=C,
                                   blk=blk, inner=inner)
            try_cfg(f"grads_{H}x{W}_c{C}_blk{blk}_in{inner}",
                    fn, (F, v0, dv.astype(jnp.float32), u0, du))

        splat_cfgs = [(512, 4), (256, 8), (256, 4), (128, 8)]
        for blk, inner in splat_cfgs:
            fn = functools.partial(splat_twohot, H=H, W=W, C=C,
                                   blk=blk, inner=inner)
            try_cfg(f"splat_{H}x{W}_c{C}_blk{blk}_in{inner}",
                    fn, (g, v0, dv, u0, du))

        # eval kernel at the big-lane shape (lane-cap lift candidate)
        if W * C > 2048:
            for blk, inner in [(256, 8), (256, 4)]:
                fn = functools.partial(gather_twohot, H=H, W=W, C=C,
                                       blk=blk, inner=inner)
                try_cfg(f"eval_{H}x{W}_c{C}_blk{blk}_in{inner}",
                        fn, (F, v0, dv, u0, du))

    with open("/tmp/probe_pallas_shapes.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
