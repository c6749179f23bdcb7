"""TPU microbench: tile-slab gather (ops/pallas/gather_tiles.py) vs the
XLA fused gather, at the VGA + level-0 shapes.

Uses probe 2's dependent-chain timing (independent-iteration slope
timing under-reports on this relay).  Coordinates are smooth
tracking-like warps with ~8 px displacement, verified in-band, so the
timed path is the kernel branch of the lax.cond (asserted).

Run on TPU: python scripts/probe_tiles.py
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

    from deep_prob_feature_track_tpu.ops.pallas import gather_tiles as GT

    results = []

    def report(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    def chain_time(make_step, feed, args, reps_lo=4, reps_hi=12, calls=3):
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
    # (B, H, W, C, disp) — VGA eval/train stacked shapes + level-0
    cases = [
        (8, 480, 640, 17, 8.0),
        (8, 480, 640, 10, 8.0),
        (64, 120, 160, 17, 5.0),
        (64, 120, 160, 10, 5.0),
    ]
    for B, H, W, C, disp in cases:
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        u = xx[None] + disp * np.sin(yy[None] / 17.0 + rng.rand(B, 1, 1) * 3)
        v = yy[None] + disp * np.cos(xx[None] / 23.0 + rng.rand(B, 1, 1) * 3)
        uf = np.clip(u, 0.0, W - 1.0)
        vf = np.clip(v, 0.0, H - 1.0)
        u0 = jnp.asarray(np.minimum(np.floor(uf), W - 2).astype(np.int32))
        v0 = jnp.asarray(np.minimum(np.floor(vf), H - 2).astype(np.int32))
        du = jnp.asarray((uf - np.minimum(np.floor(uf), W - 2)).astype(np.float32))
        dv = jnp.asarray((vf - np.minimum(np.floor(vf), H - 2)).astype(np.float32))
        operand = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

        for kind in ("eval", "grads"):
            cfg = GT.default_tile_config(kind, H, W, C, H, W)
            if cfg is None:
                report(probe=f"cfg_{H}x{W}_c{C}_{kind}", ok=False,
                       err="no config")
                continue
            *_, okb, _ = GT._prepare(operand, v0, dv, u0, du, cfg)
            report(probe=f"inband_{H}x{W}_c{C}_{kind}", ok=bool(okb))

        lvl = f"{H}x{W}_c{C}_b{B}"
        feed_F = lambda F, out: F + out.ravel()[0] * 1e-30

        def one_shot(F, a, grads):
            # the REAL competing XLA path (warp.py's fused one-shot corner
            # gather), not GT._xla_fallback — the fallback is scanned over
            # sample blocks since round 4 (memory fix) and would overstate
            # the XLA baseline's time
            from deep_prob_feature_track_tpu.geometry import warp as W_

            v0_, dv_, u0_, du_ = a
            Bq, Hq, Wq, Cq = F.shape
            Nq = v0_.shape[1] * v0_.shape[2]
            starts = jnp.stack(
                [v0_.reshape(Bq, Nq), u0_.reshape(Bq, Nq)], axis=-1
            )
            duB = du_.reshape(Bq, 1, Nq)
            dvB = dv_.reshape(Bq, 1, Nq)
            corners = W_._gather_corners(F, starts)
            out = W_._blend(corners, duB, dvB)
            if not grads:
                return [out]
            gx = (corners[:, 0, 1] - corners[:, 0, 0]) * (1 - dvB) + (
                corners[:, 1, 1] - corners[:, 1, 0]
            ) * dvB
            gy = (corners[:, 1, 0] - corners[:, 0, 0]) * (1 - duB) + (
                corners[:, 1, 1] - corners[:, 0, 1]
            ) * duB
            return [out, gx, gy]

        def xla_eval(F, a):
            return one_shot(F, a, False)[0]

        def xla_grads(F, a):
            o, gx, gy = one_shot(F, a, True)
            return o + gx + gy

        def pl_eval(F, a, cfg=None):
            v0_, dv_, u0_, du_ = a
            return GT.gather_tiles(F, v0_, dv_, u0_, du_, cfg=cfg)

        def pl_grads(F, a, cfg=None):
            v0_, dv_, u0_, du_ = a
            o, gx, gy = GT.gather_tiles_grads(F, v0_, dv_, u0_, du_, cfg=cfg)
            return o + gx + gy

        a = (v0, dv, u0, du)
        try_cfg(f"xla_eval_{lvl}", xla_eval, feed_F, (operand, a))
        try_cfg(f"xla_grads_{lvl}", xla_grads, feed_F, (operand, a))
        ecfg = GT.default_tile_config("eval", H, W, C, H, W)
        gcfg = GT.default_tile_config("grads", H, W, C, H, W)
        if ecfg is not None:
            try_cfg(f"tiles_eval_{lvl}", functools.partial(pl_eval, cfg=ecfg),
                    feed_F, (operand, a))
            # accuracy spot check
            try:
                o_k = pl_eval(operand, a, cfg=ecfg)
                o_x = xla_eval(operand, a)
                err = float(jnp.max(jnp.abs(o_k - o_x)))
                report(probe=f"maxerr_eval_{lvl}", err=err, ok=err < 5e-4)
            except Exception as e:
                report(probe=f"maxerr_eval_{lvl}", ok=False,
                       err=str(e).splitlines()[0][:160])
        if gcfg is not None:
            try_cfg(f"tiles_grads_{lvl}", functools.partial(pl_grads, cfg=gcfg),
                    feed_F, (operand, a))
        # variant configs for the sweep
        if H == 480:
            for th, tw, bv, bu, inner in [(16, 16, 64, 64, 4), (8, 16, 48, 64, 8),
                                          (16, 16, 48, 64, 8)]:
                cfg = GT.TileConfig(th=th, tw=tw, band_v=bv, band_u=bu,
                                    inner=inner, Cp=ecfg.Cp if ecfg else 32)
                try_cfg(f"tiles_eval_{lvl}_t{th}x{tw}_b{bv}x{bu}_i{inner}",
                        functools.partial(pl_eval, cfg=cfg), feed_F,
                        (operand, a))

    with open("/tmp/probe_tiles.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
