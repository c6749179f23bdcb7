"""Round-5 tile-config A/B (VERDICT round-4 item 6).

TILES_r04.json showed t8x16_b48x64_i8 beating the shipping 16x16/b64x64
by 15% at C=17 eval — but INBAND_r05.json shows band_v=48 overflows by 4
rows at kf=4 level-0 on the real frames (the shipping band_v=64 is 100%
in-band at every kf), so b48 cannot ship as a default.  This probe
measures the in-band-SAFE small-tile candidates at C in {10, 17}, both
kinds, both resolutions:

  ship      th16 tw16 band_v64 band_u64 i8   (current default)
  small56   th8  tw16 band_v56 band_u64 i8   (same +-40-row headroom as
                                              ship: 56-8-8 == 64-16-8)
  small64   th8  tw16 band_v64 band_u64 i8   (more headroom than ship)
  small48   th8  tw16 band_v48 band_u64 i8   (round-4 winner, kf=4-unsafe;
                                              measured for the record)

Timing: dependent-chain slope (probe_tiles.py methodology).  Writes
TILES_r05.json at the repo root; default_tile_config is updated from the
results (per-(kind, Cp) pick among the in-band-safe rows only).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "TILES_r05.json")


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
        with open(OUT, "w") as f:
            json.dump({"rows": results, "date": "2026-08-20",
                       "note": "round-5 tile-config A/B; candidates gated "
                       "by INBAND_r05 safety (band_v>=56)"}, f, indent=1)

    def chain_time(make_step, args, reps_lo=4, reps_hi=12, calls=3):
        def chain(reps):
            @jax.jit
            def run(x, a):
                for _ in range(reps):
                    out = make_step(x, a)
                    x = x + out.ravel()[0] * 1e-30
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

    def try_cfg(tag, make_step, args, extra=None):
        try:
            ms = chain_time(make_step, args) * 1e3
            report(probe=tag, ms=round(ms, 2), ok=True, **(extra or {}))
        except Exception as e:  # noqa: BLE001
            report(probe=tag, ok=False, err=str(e).splitlines()[0][:160],
                   **(extra or {}))

    rng = np.random.RandomState(0)
    cases = [
        (8, 480, 640, 17, 8.0),
        (8, 480, 640, 10, 8.0),
        (64, 120, 160, 17, 5.0),
        (64, 120, 160, 10, 5.0),
    ]
    cand = [
        ("ship", (16, 16, 64, 64, 8)),
        ("small56", (8, 16, 56, 64, 8)),
        ("small64", (8, 16, 64, 64, 8)),
        ("small48", (8, 16, 48, 64, 8)),
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
        Cp = max(8, 1 << max(0, (C - 1).bit_length()))
        lvl = f"{H}x{W}_c{C}_b{B}"
        a = (v0, dv, u0, du)

        def pl_eval(F, a, cfg):
            v0_, dv_, u0_, du_ = a
            return GT.gather_tiles(F, v0_, dv_, u0_, du_, cfg=cfg)

        def pl_grads(F, a, cfg):
            v0_, dv_, u0_, du_ = a
            o, gx, gy = GT.gather_tiles_grads(F, v0_, dv_, u0_, du_, cfg=cfg)
            return o + gx + gy

        for name, (th, tw, bv, bu, inner) in cand:
            cfg = GT.TileConfig(th=th, tw=tw, band_v=bv, band_u=bu,
                                inner=inner, Cp=Cp)
            # coverage gates (same as default_tile_config)
            if ((H - bv) // 8) * 8 + bv < H or (
                ((W - bu) // cfg.q) * cfg.q + bu < W
            ):
                report(probe=f"tiles_{lvl}_{name}", ok=False, err="gate")
                continue
            *_, okb, _ = GT._prepare(operand, v0, dv, u0, du, cfg)
            if not bool(okb):
                report(probe=f"tiles_{lvl}_{name}", ok=False, err="oob")
                continue
            try_cfg(f"tiles_eval_{lvl}_{name}",
                    functools.partial(pl_eval, cfg=cfg), (operand, a),
                    extra={"cfg": name, "kind": "eval"})
            # grads body VMEM gate mirrors default_tile_config
            if cfg.blk * bu * Cp <= 524_288 and Cp <= 16:
                try_cfg(f"tiles_grads_{lvl}_{name}",
                        functools.partial(pl_grads, cfg=cfg), (operand, a),
                        extra={"cfg": name, "kind": "grads"})

    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
