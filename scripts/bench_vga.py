"""VGA (480x640) TPU benchmark, round 5: engagement-asserted, two-armed.

VERDICT round-4 item 4: round-4's artifact contained two silent-fallback
rows (tiles arm bitwise-equal to XLA) before an engaged one — an early
probe version set DPFT_PALLAS_GATHER=0 to kill the two-hot family, which
gates the tile family too (warp.py::_tiles_enabled kill-switch
semantics), so the "tiles" arm silently ran XLA.  This bench therefore:

- scrubs every DPFT_PALLAS_* override from its environment up front;
- runs raw ENGAGEMENT probes (eval + grads dispatch sites) at the bench
  shape before any tracker timing, and ABORTS if the auto arm is
  bitwise-equal to the XLA arm;
- times eval AND train on both arms with the dependent-value sync
  (block_until_ready alone under-reports 1000x on some relay programs,
  docs/PERF.md).

Train recipe: scan_remat + bf16 residuals (round 3) — the B>=8 points
additionally need DPFT_REMAT_ENCODER=1 (round 4) unless the compile-500
bisect (scripts/bisect_vga_b8.py, round 5) removed that need.

Writes BENCH_VGA_r05.json; one JSON line per point as it lands.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DPFT_TRAIN_LOOP", "scan_remat")
os.environ.setdefault("DPFT_BF16_RESIDUALS", "1")
# scrub lingering kernel overrides (a stale DPFT_PALLAS_GATHER=0 is the
# diagnosed cause of round-4's silent-fallback rows)
for _k in ("DPFT_PALLAS_GATHER", "DPFT_PALLAS_GATHER_EVAL",
           "DPFT_PALLAS_GATHER_TRAIN", "DPFT_PALLAS_GATHER_SPLAT",
           "DPFT_PALLAS_TILES", "DPFT_PALLAS_INTERPRET"):
    os.environ.pop(_k, None)

import numpy as np

ROWS = []
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_VGA_r05.json",
)


def report(**kw):
    ROWS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump({"rows": ROWS, "date": "2026-08-20",
                   "note": "round-5 VGA suite: engagement-asserted two-armed "
                   "eval+train; train = scan_remat + bf16 residuals"}, f,
                  indent=1)


def _smooth_coords(B, H, Wd):
    """Tracking-realistic warp coordinates: near-identity + low-frequency
    flow (per-tile spread well inside the band; high-frequency jitter
    would correctly trip the in-band fallback)."""
    iu = np.broadcast_to(np.arange(Wd, dtype=np.float32), (B, 1, H, Wd))
    iv = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None],
                         (B, 1, H, Wd))
    u = iu + 3.2 + 2.0 * np.sin(iv / 40.0)
    v = iv - 2.1 + 1.5 * np.cos(iu / 55.0)
    return u.astype(np.float32), v.astype(np.float32)


def assert_engaged(B=8, C=10, H=480, Wd=640):
    """Prove the tile kernel actually dispatches at the bench shape, on
    BOTH training-path (grads) and eval sites, before timing anything:
    the auto arm's raw outputs must differ from the XLA arm's (the kernel
    is 'high'- not f32-exact, ~1e-5), bitwise equality = silent fallback."""
    import jax
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.geometry import warp as W

    rng = np.random.RandomState(0)
    F = jnp.asarray(rng.randn(B, C, H, Wd).astype(np.float32))
    u_np, v_np = _smooth_coords(B, H, Wd)
    u, v = jnp.asarray(u_np), jnp.asarray(v_np)
    t = jnp.asarray(rng.randn(B, C, H, Wd).astype(np.float32))

    for site in ("eval", "grads"):
        outs = {}
        for tiles in ("auto", "0"):
            os.environ["DPFT_PALLAS_TILES"] = tiles

            if site == "eval":

                @jax.jit
                def f(F_, u_, v_):
                    return W.warp_features(F_, u_, v_)

                outs[tiles] = np.asarray(f(F, u, v))
            else:
                # the grads site lives in the custom-VJP fwd rule; the
                # coordinate gradient contracts the kernel's gx/gy maps,
                # so it differs iff the kernel ran
                @jax.jit
                def g(F_, u_, v_):
                    return jax.grad(
                        lambda a, b, c: jnp.sum(W.warp_features(a, b, c) * t),
                        argnums=1,
                    )(F_, u_, v_)

                outs[tiles] = np.asarray(g(F, u, v))
        d = float(np.abs(outs["auto"] - outs["0"]).max())
        row = dict(probe=f"tiles_engage_{site}_{H}x{Wd}_c{C}_b{B}",
                   maxdiff_vs_xla=d, engaged=bool(d > 0))
        report(**row)
        if not row["engaged"]:
            report(fatal=f"tile kernel NOT engaged at the {site} site — "
                   "A/B would be meaningless; aborting")
            raise SystemExit(1)
    os.environ.pop("DPFT_PALLAS_TILES", None)


def pose_parity_real_frames():
    """Full-tracker pose delta tiles-auto vs tiles-0 on real VGA frames."""
    import jax
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.data.simple import SimpleLoader
    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking

    root = "/root/reference/code/data/data_examples/TUM"
    K = [525.0, 525.0, 319.5, 239.5]
    ds = SimpleLoader(os.path.join(root, "color"), os.path.join(root, "depth"), K)
    net = LeastSquareTracking(cfg=get_preset("feature"))

    batch = [ds[i] for i in range(min(4, len(ds)))]
    c0 = jnp.asarray(np.stack([b["color0"] for b in batch]))
    c1 = jnp.asarray(np.stack([b["color1"] for b in batch]))
    d0 = jnp.asarray(np.stack([b["depth0"] for b in batch]))
    d1 = jnp.asarray(np.stack([b["depth1"] for b in batch]))
    Kb = jnp.asarray(np.tile(np.asarray(K, np.float32), (len(batch), 1)))
    variables = net.init(jax.random.PRNGKey(0), c0, c1, d0, d1, Kb, train=False)

    poses = {}
    for tiles in ("auto", "0"):
        os.environ["DPFT_PALLAS_TILES"] = tiles

        @jax.jit
        def forward(a, b, c, d, k):
            return net.apply(variables, a, b, c, d, k, train=False)

        R, t = forward(c0, c1, d0, d1, Kb)
        poses[tiles] = (np.asarray(R), np.asarray(t))
    os.environ.pop("DPFT_PALLAS_TILES", None)
    (Ra, ta), (Rx, tx) = poses["auto"], poses["0"]
    dR = Ra @ np.swapaxes(Rx, 1, 2)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(dR, axis1=1, axis2=2) - 1) / 2, -1, 1))
    )
    dt_cm = np.linalg.norm(ta - tx, axis=1) * 100
    report(
        probe="pose_parity_tiles_vs_xla_real_frames_480x640",
        max_rot_deg=round(float(ang.max()), 5),
        max_trans_cm=round(float(dt_cm.max()), 5),
        trans_cm=[round(float(x), 5) for x in dt_cm],
    )


def main():
    from bench import preflight_tpu

    preflight_tpu()
    from bench_train import _setup_cache, measure_train
    from bench import measure_eval

    _setup_cache()

    assert_engaged()

    for tiles in ("auto", "0"):
        os.environ["DPFT_PALLAS_TILES"] = tiles
        try:
            fps = measure_eval(8, 480, 640, lo=4, hi=12)
            report(
                metric="eval_fps_feature_preset_480x640_b8",
                value=round(fps, 2), unit="frames/s", tiles=tiles,
            )
        except Exception as e:  # noqa: BLE001
            report(metric="eval_480x640_b8", ok=False, tiles=tiles,
                   err=str(e)[:300])

    # tiles=0 only at the A/B pivot batches: each VGA train point costs two
    # slow relay compiles, and the XLA arm exists to price the kernel, not
    # to be the shipping path.  B>=8 uses gradient accumulation to
    # microbatch 4 (single-shot [B>=8,480,640] backwards crash this
    # environment's compile helper — PERF.md round-5 bisect; accum is the
    # shipping recipe, so it is what gets benched)
    for tiles, batches in (("auto", ((2, 1), (4, 1), (8, 2), (16, 4))),
                           ("0", ((4, 1), (8, 2)))):
        os.environ["DPFT_PALLAS_TILES"] = tiles
        for B, accum in batches:
            try:
                fps = measure_train(B, 480, 640, accum=accum)
                report(
                    metric=f"train_step_fps_feature_preset_480x640_b{B}",
                    value=round(fps, 2), unit="frames/s", tiles=tiles,
                    scan_remat=True, bf16_residuals=True, accum_steps=accum,
                    remat_encoder=os.environ.get("DPFT_REMAT_ENCODER") == "1",
                )
            except Exception as e:  # noqa: BLE001
                report(metric=f"train_step_480x640_b{B}", ok=False,
                       tiles=tiles, accum_steps=accum, err=str(e)[:300])

    try:
        pose_parity_real_frames()
    except Exception as e:  # noqa: BLE001
        report(probe="pose_parity_tiles_vs_xla_real_frames_480x640",
               ok=False, err=str(e)[:300])

    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
