"""VGA (480x640) TPU benchmark: train + eval, tile-slab kernel A/B.

VERDICT round-3 items 1-3: prove the tile-slab kernel end-to-end at VGA,
kill the B=8 train OOM, and re-measure the per-pixel train gap — now with
the round-4 changes on top:

- sigma-slim (tracker._slim_sigma): the paper config's stacked U_IC warp
  operand drops from C=17 to C=10 — exactly the regime where the tile
  grads kernel wins (TILES_r04.json);
- grads tile gate Cp<=16 (C=17 grads lose on hardware, measured);
- sample-blocked XLA corner gather (warp._corner_grads) capping the
  diagnosed round-3 OOM buffer on the non-Pallas path too.

Runs (train: scan_remat + bf16 residuals, the VGA recipe of round 3):
  train 480x640 B in {2,4,8,16} x DPFT_PALLAS_TILES in {auto, 0}
  eval  480x640 B=8           x DPFT_PALLAS_TILES in {auto, 0}
  pose parity tiles-auto vs tiles-0 on the 5 real TUM sample frames

Writes BENCH_VGA_r04.json; one JSON line per point as it lands.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DPFT_TRAIN_LOOP", "scan_remat")
os.environ.setdefault("DPFT_BF16_RESIDUALS", "1")

import numpy as np

ROWS = []


def report(**kw):
    ROWS.append(kw)
    print(json.dumps(kw), flush=True)


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
    # to be the shipping path
    for tiles, batches in (("auto", (2, 4, 8, 16)), ("0", (4, 8))):
        os.environ["DPFT_PALLAS_TILES"] = tiles
        for B in batches:
            try:
                fps = measure_train(B, 480, 640)
                report(
                    metric=f"train_step_fps_feature_preset_480x640_b{B}",
                    value=round(fps, 2), unit="frames/s", tiles=tiles,
                    scan_remat=True, bf16_residuals=True,
                )
            except Exception as e:  # noqa: BLE001
                report(metric=f"train_step_480x640_b{B}", ok=False,
                       tiles=tiles, err=str(e)[:300])

    try:
        pose_parity_real_frames()
    except Exception as e:  # noqa: BLE001
        report(probe="pose_parity_tiles_vs_xla_real_frames_480x640",
               ok=False, err=str(e)[:300])

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_VGA_r04.json",
    )
    with open(out, "w") as f:
        json.dump(
            {
                "rows": ROWS,
                "date": "2026-08-20",
                "note": "round-4 VGA suite: sigma-slim (C=17->10 operand) + "
                "Cp<=16 grads tile gate + blocked corner gather; train = "
                "scan_remat + bf16 residuals (the round-3 recipe)",
            },
            f,
            indent=1,
        )
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
