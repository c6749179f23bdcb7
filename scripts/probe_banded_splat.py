"""A/B the banded splat (warp._splat_twohot, DPFT_SPLAT_BAND) on TPU.

PROFILE_VGA_r05.json showed the VGA train backward (801 of 926.9 ms at
B=4) is dominated by the operand-cotangent splat, whose dense two-hot
cost is linear in H.  The banded formulation anchors each raster block's
V-side two-hot at its own v0 minimum (band 64 rows): H/band x fewer MACs
(7.5x at 480x640) behind a whole-call in-band lax.cond.

Measures, tiles/gather flags untouched (shipping auto):
  1. raw level-0 VGA warp fwd+bwd, band=64 vs band=0 (the 211.7 ms unit);
  2. full VGA train step at B=4 and B=8(accum2), both arms;
  3. level-0 120x160 B=64 train step, both arms (the headline shape —
     H=120 gives a smaller 1.9x splat-term reduction);
plus an in-band engagement assertion on tracking-realistic coords.
Writes SPLAT_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DPFT_TRAIN_LOOP", "scan_remat")
os.environ.setdefault("DPFT_BF16_RESIDUALS", "1")

import numpy as np

ROWS = []
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SPLAT_r05.json")


def report(**kw):
    ROWS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump({"rows": ROWS, "date": "2026-08-20",
                   "note": "banded-splat A/B (DPFT_SPLAT_BAND=64 vs 0); "
                   "train = scan_remat + bf16 residuals, kernels auto"}, f,
                  indent=1)


def main():
    from bench import preflight_tpu

    preflight_tpu()
    import jax
    import jax.numpy as jnp

    from bench_train import _setup_cache, measure_train
    from deep_prob_feature_track_tpu.geometry import warp as W_

    _setup_cache()
    rng = np.random.RandomState(0)

    # --- raw warp fwd+bwd unit at VGA, smooth (in-band) coords --------
    B, C, H, Wd = 4, 10, 480, 640
    F = jnp.asarray(rng.randn(B, C, H, Wd).astype(np.float32))
    iu = np.broadcast_to(np.arange(Wd, dtype=np.float32), (B, 1, H, Wd))
    iv = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], (B, 1, H, Wd))
    u = jnp.asarray(np.clip(iu + 3.2 + 2.0 * np.sin(iv / 40.0), 0, Wd - 1.001))
    v = jnp.asarray(np.clip(iv - 2.1 + 1.5 * np.cos(iu / 55.0), 0, H - 1.001))
    t = jnp.asarray(rng.randn(B, C, H, Wd).astype(np.float32))

    def warp_fb(F_, u_, v_):
        return jax.value_and_grad(
            lambda a, b, c: jnp.sum(W_.warp_features(a, b, c) * t),
            argnums=(0, 1, 2))(F_, u_, v_)

    outs = {}
    for band in ("64", "0"):
        os.environ["DPFT_SPLAT_BAND"] = band
        # the custom-VJP bwd trace is cached process-globally; clear so
        # the flipped trace-time env var actually takes effect
        jax.clear_caches()
        jfn = jax.jit(warp_fb)
        out = jfn(F, u, v)
        np.asarray(out[0]).ravel()[:4]

        def timed(iters):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = jfn(F, u, v)
            np.asarray(o[0]).ravel()[:4]
            return time.perf_counter() - t0

        t_lo, t_hi = timed(2), timed(6)
        assert t_hi > 1.5 * t_lo, (band, t_lo, t_hi)
        ms = (t_hi - t_lo) / 4 * 1e3
        outs[band] = np.asarray(out[1][0])
        report(probe=f"warp_l0_fwd_bwd_vga_b4_band{band}", ms=round(ms, 2))
    d = float(np.abs(outs["64"] - outs["0"]).max())
    scale = float(np.abs(outs["0"]).max())
    report(probe="banded_splat_grad_parity_vga", maxdiff=d, scale=scale,
           rel=round(d / max(scale, 1e-9), 8))

    # --- full train steps, both arms ----------------------------------
    # the level-0 shape uses the DEFAULT (unrolled) train loop so its
    # band=0 arm reproduces BENCH_TRAIN_r05's 256.75 fps baseline; the
    # VGA shapes need scan_remat (compile/memory, PERF.md round 2/5)
    for label, B_, Ht, Wt, accum, loop in (
        ("train_vga_b4", 4, 480, 640, 1, "scan_remat"),
        ("train_vga_b8_accum2", 8, 480, 640, 2, "scan_remat"),
        ("train_l0_b64", 64, 120, 160, 1, "unroll"),
    ):
        os.environ["DPFT_TRAIN_LOOP"] = loop
        for band in ("64", "0"):
            os.environ["DPFT_SPLAT_BAND"] = band
            jax.clear_caches()
            try:
                fps = measure_train(B_, Ht, Wt, accum=accum)
                report(metric=f"{label}_band{band}", value=round(fps, 2),
                       unit="frames/s", train_loop=loop,
                       mpx_per_s=round(fps * Ht * Wt / 1e6, 3))
            except Exception as e:  # noqa: BLE001
                report(metric=f"{label}_band{band}", ok=False,
                       train_loop=loop, err=str(e)[:300])

    os.environ.pop("DPFT_SPLAT_BAND", None)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
