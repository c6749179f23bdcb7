"""Sanity probe: does the tile-slab kernel actually ENGAGE at VGA eval?

BENCH_VGA_r04's full-tracker pose parity came out exactly 0.0 — plausible
(the solve contracts a ~1e-5 feature perturbation to <5e-6 pose units at
near-convergence), but worth proving the auto arm really ran the kernel:
compare raw warp_features outputs tiles-auto vs tiles-0 at the VGA eval
operand shape.  Expect ~1e-5 max difference (kernel engaged) — bitwise 0
would mean both arms took the XLA path.  Also times both arms (the
BENCH_VGA eval tiles=0 point that the old block_until_ready sync lost).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import preflight_tpu

    preflight_tpu()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from deep_prob_feature_track_tpu.geometry import warp as W

    B, C, H, Wd = 8, 10, 480, 640
    rng = np.random.RandomState(0)
    F = jnp.asarray(rng.randn(B, C, H, Wd).astype(np.float32))
    # smooth, tracking-realistic coordinates: near-identity plus a few
    # pixels of low-frequency flow (per-tile spread << the 64-px band);
    # high-frequency jitter would (correctly) trip the in-band fallback
    iu = np.broadcast_to(np.arange(Wd, dtype=np.float32), (B, 1, H, Wd))
    iv = np.broadcast_to(
        np.arange(H, dtype=np.float32)[:, None], (B, 1, H, Wd)
    )
    u = jnp.asarray(iu + 3.2 + 2.0 * np.sin(iv / 40.0))
    v = jnp.asarray(iv - 2.1 + 1.5 * np.cos(iu / 55.0))

    outs, times = {}, {}
    for tiles in ("auto", "0"):
        os.environ["DPFT_PALLAS_TILES"] = tiles
        # leave DPFT_PALLAS_GATHER=auto: setting it to 0 gates the tile
        # family too (the H-sharding kill-switch semantics, warp.py), and
        # the two-hot kernel is unsupported at this shape anyway (W*C=6400
        # lanes > its 4000 cap)

        @jax.jit
        def f(F_, u_, v_):
            return W.warp_features(F_, u_, v_)

        out = f(F, u, v)
        np.asarray(out.ravel()[:4])
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(F, u, v)
        np.asarray(out.ravel()[:4])
        t1 = time.perf_counter()
        for _ in range(12):
            out = f(F, u, v)
        np.asarray(out.ravel()[:4])
        t2 = time.perf_counter()
        times[tiles] = ((t2 - t1) - (t1 - t0)) / 8 * 1e3
        outs[tiles] = np.asarray(out)

    d = float(np.abs(outs["auto"] - outs["0"]).max())
    row = {
        "probe": "tiles_engage_eval_480x640_c10_b8",
        "maxdiff_vs_xla": d,
        "engaged": bool(d > 0),
        "tiles_ms": round(times["auto"], 2),
        "xla_ms": round(times["0"], 2),
    }
    print(json.dumps(row), flush=True)

    path = "/root/repo/BENCH_VGA_r04.json"
    with open(path) as fjson:
        doc = json.load(fjson)
    doc["rows"].append(row)
    with open(path, "w") as fjson:
        json.dump(doc, fjson, indent=1)


if __name__ == "__main__":
    main()
