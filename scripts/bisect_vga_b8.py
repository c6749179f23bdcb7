"""Bisect the VGA B=8 train remote-compile HTTP 500 (round 4).

Both tile arms fail identically, so the suspects are the two-hot Mosaic
kernels engaged at VGA pyramid levels 2-3, the blocked corner-gather
scan, bf16 residuals, or a plain compiler-resource blowup at B=8.

Usage: python scripts/bisect_vga_b8.py B [flag=value ...]
  flags: gather=0|auto tiles=0|auto bf16=0|1 loop=scan_remat|unroll
Compile-only (lower().compile()); prints PASS/FAIL one line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
opts = dict(a.split("=", 1) for a in sys.argv[2:])
os.environ["DPFT_PALLAS_GATHER"] = opts.get("gather", "auto")
os.environ["DPFT_PALLAS_TILES"] = opts.get("tiles", "auto")
os.environ["DPFT_BF16_RESIDUALS"] = opts.get("bf16", "1")
os.environ["DPFT_TRAIN_LOOP"] = opts.get("loop", "scan_remat")

import numpy as np


def main():
    from bench import preflight_tpu

    preflight_tpu()
    import jax

    from bench_train import _setup_cache
    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
    from deep_prob_feature_track_tpu.training.train import (
        TrainConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    _setup_cache()
    H, W = 480, 640
    rng = np.random.RandomState(0)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, :3, 3] = rng.randn(B, 3) * 0.01
    batch = {
        "color0": rng.rand(B, 3, H, W).astype(np.float32),
        "color1": rng.rand(B, 3, H, W).astype(np.float32),
        "depth0": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "depth1": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "calib": np.tile(
            [[525.0 * W / 640, 525.0 * H / 480, (W - 0.5) / 2, (H - 0.5) / 2]],
            (B, 1),
        ).astype(np.float32),
        "transform": T,
        "pad_mask": np.ones((B,), bool),
    }
    net = LeastSquareTracking(cfg=get_preset("feature"))
    tcfg = TrainConfig(batch_size=B)
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    state = create_train_state(net, opt, batch)
    step = make_train_step(net, tcfg, opt, donate=True)
    dev_batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    tag = {"B": B, **opts}
    try:
        lowered = step.lower(state, dev_batch)
        lowered.compile()
        print(json.dumps({**tag, "result": "PASS"}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({**tag, "result": "FAIL", "err": str(e)[:400]}),
              flush=True)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
