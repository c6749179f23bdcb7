"""Training-throughput benchmark: full sharded train step (fwd+bwd+Adam).

Prints ONE JSON line with train frames/s for the paper configuration
(feature preset, EPE3D loss, batch 64, 120x160).  vs_baseline compares to
the reference implementation's measured train-step throughput on this
host's CPU (see BENCH_BASELINE.json for the eval-side methodology; the
train baseline below was measured the same way with backward+Adam).

``python bench_train.py --sweep`` additionally measures 640x480 (one JSON
line per point) — the beyond-paper-resolution grid of docs/PERF.md.
"""

import json
import os
import sys
import time

import numpy as np

# reference torch CPU train step (B=8 fwd+bwd+clip+Adam, scaled per-frame):
# re-measured 2026-08-20 with the reference's FULL loss semantics
# (EPE3D*1e2 + global depth-min/max invalid mask) so both sides of
# vs_baseline use identical loss definitions — BENCH_BASELINE.json
# remeasure_r05 (the older 2.99 predates the loss-semantics alignment)
BASELINE_TRAIN_FPS = 2.784


def _setup_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def measure_train(B, H, W, lo=2, hi=6, accum=1, accum_loop="host"):
    """Compile + slope-time the full train step at (B, H, W); returns fps.

    :param accum: gradient-accumulation microbatch count (the compiled
        program has the B/accum shape — the VGA batch-ceiling lever,
        TrainConfig.accum_steps).  accum_loop='host' (the VGA-proven
        mode; 'scan' keeps too many remat copies live at VGA shapes)."""
    import jax

    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
    from deep_prob_feature_track_tpu.training.train import (
        TrainConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

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
    tcfg = TrainConfig(batch_size=B, accum_steps=accum, accum_loop=accum_loop)
    opt = make_optimizer(tcfg, steps_per_epoch=100)
    state = create_train_state(net, opt, batch)
    # donation is essential on the remote-attached chip (state re-upload
    # otherwise dominates); sync every step for honest timing
    step = make_train_step(net, tcfg, opt, donate=True)

    dev_batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    # two warmups: the first compiles, the second compiles again for the
    # committed-device placement of the returned state
    state, metrics = step(state, dev_batch)
    float(metrics["loss"])
    state, metrics = step(state, dev_batch)
    float(metrics["loss"])

    def timed(state, iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, dev_batch)
        # fetching the loss VALUE forces the chain to drain (block_until_ready
        # alone can release early through the remote-attach relay)
        float(metrics["loss"])
        return time.perf_counter() - t0, state

    t_lo, state = timed(state, lo)
    t_hi, state = timed(state, hi)
    assert t_hi > 2.0 * t_lo, (
        f"chained timing not scaling with steps (t{lo}={t_lo:.3f}, t{hi}={t_hi:.3f})"
    )
    dt = (t_hi - t_lo) / float(hi - lo)
    return B / dt


def main():
    _setup_cache()
    fps = measure_train(64, 120, 160)
    print(
        json.dumps(
            {
                "metric": "train_step_fps_feature_preset_120x160_b64",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_TRAIN_FPS, 2),
            }
        )
    )


def sweep():
    """640x480 + batch grid (VERDICT round-1 item #5): one line per point."""
    _setup_cache()
    # VGA B=8 must go through the accumulation recipe (microbatch 4): the
    # single-shot [8,480,640] backward trips the environment's
    # compile-helper ceiling (PERF.md round-5 bisect)
    grid = [(64, 120, 160, 2, 6, 1), (8, 120, 160, 2, 6, 1),
            (8, 480, 640, 2, 6, 2)]
    for B, H, W, lo, hi, accum in grid:
        fps = measure_train(B, H, W, lo=lo, hi=hi, accum=accum)
        print(
            json.dumps(
                {
                    "metric": f"train_step_fps_feature_preset_{H}x{W}_b{B}",
                    "value": round(fps, 2),
                    "unit": "frames/s",
                    "accum_steps": accum,
                    "vs_baseline": (
                        round(fps / BASELINE_TRAIN_FPS, 2)
                        if (H, W, B) == (120, 160, 64)
                        else None
                    ),
                }
            ),
            flush=True,
        )


def ab():
    """A/B the Pallas train kernels vs the XLA paths: one line per arm.

    The dispatch gate reads DPFT_PALLAS_GATHER at trace time, and each
    measure_train call builds (and traces) a fresh train step, so setting
    the env var between arms is sufficient.
    """
    _setup_cache()
    rows = []
    for flag in ("0", "auto"):
        os.environ["DPFT_PALLAS_GATHER"] = flag
        fps = measure_train(64, 120, 160)
        row = {
            "metric": "train_step_fps_feature_preset_120x160_b64",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / BASELINE_TRAIN_FPS, 2),
            "pallas_gather": flag,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    # committed artifact (VERDICT round-4 weak #1: the round-4 A/B lived
    # only in a commit message)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_TRAIN_r05.json")
    with open(out, "w") as f:
        json.dump({"rows": rows, "date": "2026-08-20",
                   "baseline_train_fps": BASELINE_TRAIN_FPS,
                   "note": "within-session slope-timed A/B, XLA arm "
                   "(pallas_gather=0) vs auto kernels; baseline from "
                   "BENCH_BASELINE.json remeasure_r05 (identical loss "
                   "semantics both sides)"}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()  # fail fast instead of hanging on a dead relay
    if "--sweep" in sys.argv:
        sweep()
    elif "--ab" in sys.argv:
        ab()
    else:
        main()
