"""Benchmark: two-view tracking throughput of the flagship 'feature' preset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference PyTorch implementation's eval forward on this
host's CPU measured at 6.0 frames/s (B=8, 120x160, feature preset config:
ConvRGBD2 + laplacian uncertainty + U_IC solver + sfm_net init; measured
with torch.set_num_threads(8); see BENCH_BASELINE.json).  The north-star
target is >=10x reference frames/s per chip.
"""

import json
import os
import time

import numpy as np

BASELINE_FPS = 6.0  # reference torch CPU frames/s (B=8, 120x160)
B, H, W = 8, 120, 160


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking

    rng = np.random.RandomState(0)
    img0 = rng.rand(B, 3, H, W).astype(np.float32)
    img1 = rng.rand(B, 3, H, W).astype(np.float32)
    d0 = rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)
    d1 = rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)
    K = np.tile([[131.25, 131.25, 79.875, 59.875]], (B, 1)).astype(np.float32)

    net = LeastSquareTracking(cfg=get_preset("feature"))
    args = tuple(map(np.asarray, (img0, img1, d0, d1, K)))
    variables = net.init(jax.random.PRNGKey(0), *args, train=False)

    @jax.jit
    def forward(c0, c1, dd0, dd1, kk):
        return net.apply(variables, c0, c1, dd0, dd1, kk, train=False)

    dev_args = [jax.device_put(a) for a in args]
    # warmup / compile
    R, t = forward(*dev_args)
    jax.block_until_ready((R, t))

    def timed(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = forward(*dev_args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    # slope between two pipelined iteration counts: removes the fixed
    # relay round-trip of this dev environment AND verifies the chain
    # really executes (total time must scale with the iteration count)
    t10 = timed(10)
    t30 = timed(30)
    assert t30 > 2.0 * t10, (
        f"pipelined timing not scaling with iterations (t10={t10:.3f}, "
        f"t30={t30:.3f}): execution may be escaping the sync"
    )
    dt = (t30 - t10) / 20.0
    fps = B / dt

    print(
        json.dumps(
            {
                "metric": "two_view_tracking_fps_feature_preset_120x160_b8",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
