"""Scaling-efficiency harness: frames/s at 1 device vs N devices.

Runs the flagship tracking forward data-parallel over 1..N devices of the
local mesh and reports scaling efficiency (the north star asks >=80% at
N>=2 hosts; on a single host this measures ICI scaling, and under
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
it validates the harness itself).

Prints one JSON line per device count plus a summary line.
"""

import json
import time

import numpy as np

B_PER_DEVICE = 8
H, W = 120, 160


def bench_n_devices(n: int, iters: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
    from deep_prob_feature_track_tpu.parallel.mesh import batch_sharding, make_mesh

    devices = jax.devices()[:n]
    mesh = make_mesh(devices)
    B = B_PER_DEVICE * n
    rng = np.random.RandomState(0)
    args = (
        rng.rand(B, 3, H, W).astype(np.float32),
        rng.rand(B, 3, H, W).astype(np.float32),
        rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        np.tile([[131.25, 131.25, 79.875, 59.875]], (B, 1)).astype(np.float32),
    )
    net = LeastSquareTracking(cfg=get_preset("feature"))
    variables = net.init(jax.random.PRNGKey(0), *[jnp.asarray(a[:1]) for a in args[:4]]
                         + [jnp.asarray(args[4][:1])], train=False)

    sharding = batch_sharding(mesh)
    dev_args = [jax.device_put(a, sharding) for a in args]

    fwd = jax.jit(lambda *a: net.apply(variables, *a, train=False))
    out = fwd(*dev_args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*dev_args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    n_dev = len(jax.devices())
    counts = sorted({1, 2, n_dev} & set(range(1, n_dev + 1)))
    results = {}
    for n in counts:
        fps = bench_n_devices(n)
        results[n] = fps
        print(
            json.dumps(
                {"metric": f"tracking_fps_{n}dev", "value": round(fps, 2), "unit": "frames/s"}
            )
        )
    if len(results) > 1:
        base = results[min(results)]
        n_max = max(results)
        eff = results[n_max] / (base * n_max / min(results))
        print(
            json.dumps(
                {
                    "metric": f"scaling_efficiency_{min(results)}to{n_max}dev",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "vs_baseline": round(eff / 0.8, 2),
                }
            )
        )


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()  # fail fast instead of hanging on a dead relay
    main()
