"""Windowed-BA benchmarks on a single TPU chip (1-chip anchor for scaling).

Two JSON lines (same shape as bench.py's):
  1. pose-graph GN refinement  — edges/s over a 16-pose, 128-edge
     (padded all-pairs) window, 10 GN iterations per solve.
  2. dense feature-metric BA   — edge-linearizations/s over a 16-pose,
     32-edge window at level-2 maps (30x40, C=8), 5 GN iterations.

The reference implementation has no multi-frame BA (it tracks frame
pairs only), so ``vs_baseline`` is null for both: these are
beyond-reference capabilities anchored here for round-3 multi-chip
scaling work.  Timing uses the slope method documented in docs/PERF.md
(remote-attached chip: relay round-trip removed, scaling asserted).
"""

import json
import os
import time

import numpy as np

N_POSES = 16
PG_EDGES = 128          # all-pairs (120) padded to a mesh-divisible 128
PG_ITERS = 10
DN_EDGES = 32           # sequential + skip connections, padded
DN_ITERS = 5
DN_C, DN_H, DN_W = 8, 30, 40  # level-2 feature maps of a 120x160 input


def _setup_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _slope(run, lo=10, hi=30):
    """Slope timing: (t_hi - t_lo) / (hi - lo), asserting real execution."""
    t_lo = run(lo)
    t_hi = run(hi)
    assert t_hi > 2.0 * t_lo, (
        f"pipelined timing not scaling with iterations (t{lo}={t_lo:.3f}, "
        f"t{hi}={t_hi:.3f}): execution may be escaping the sync"
    )
    return (t_hi - t_lo) / float(hi - lo)


def bench_pose_graph():
    import jax
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.geometry.lie import compose, exp_se3, inverse
    from deep_prob_feature_track_tpu.parallel.ba import PoseGraph, refine_pose_graph

    rng = np.random.RandomState(0)
    # ground-truth trajectory + noisy initialization
    xi = jnp.asarray(rng.randn(N_POSES, 6) * 0.1, jnp.float32)
    R_gt, t_gt = exp_se3(xi)
    xi_noise = jnp.asarray(rng.randn(N_POSES, 6) * 0.02, jnp.float32)
    dR, dt = exp_se3(xi_noise)
    R0, t0 = compose(R_gt, t_gt, dR, dt)

    pairs = [(i, j) for i in range(N_POSES) for j in range(N_POSES) if i < j]
    pairs = (pairs * 2)[:PG_EDGES]  # pad by repeating edges (info-weighted)
    ei = jnp.asarray([p[0] for p in pairs], jnp.int32)
    ej = jnp.asarray([p[1] for p in pairs], jnp.int32)
    Rj_inv, tj_inv = inverse(R_gt[ej], t_gt[ej])
    mR, mt = compose(Rj_inv, tj_inv, R_gt[ei], t_gt[ei])  # exact T_j^-1 T_i
    graph = PoseGraph(R0, t0, ei, ej, mR, mt, None)

    solve = jax.jit(lambda g: refine_pose_graph(g, iterations=PG_ITERS))
    g_dev = jax.device_put(graph)
    out = solve(g_dev)
    final_cost = float(out[1][-1])
    assert np.isfinite(final_cost), "pose-graph solve diverged"

    def run(iters):
        # chain each solve on the previous refined graph: a real data
        # dependence, so the timed region is `iters` sequential solves;
        # fetching the cost VALUE forces the chain to drain (the relay's
        # block_until_ready can release early)
        t0_ = time.perf_counter()
        g = g_dev
        costs = None
        for _ in range(iters):
            g, costs = solve(g)
        float(costs[-1])
        return time.perf_counter() - t0_

    # a 16-pose solve is ~1 ms; chains must be long enough that the fixed
    # relay round-trip (~100 ms) is small vs the slope window
    dt_solve = _slope(run, lo=300, hi=900)
    eps = PG_EDGES * PG_ITERS / dt_solve
    print(
        json.dumps(
            {
                "metric": "pose_graph_ba_edge_iters_per_s_16pose_128edge",
                "value": round(eps, 1),
                "unit": "edge-iterations/s",
                "vs_baseline": None,
            }
        )
    )


def bench_dense():
    import jax
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.geometry.lie import compose, exp_se3
    from deep_prob_feature_track_tpu.parallel.dense_ba import (
        WindowFrames,
        refine_dense_window,
    )

    rng = np.random.RandomState(1)
    frames = WindowFrames(
        feats=jnp.asarray(rng.rand(N_POSES, DN_C, DN_H, DN_W), jnp.float32),
        sigmas=jnp.asarray(
            rng.uniform(0.1, 1.0, (N_POSES, DN_C, DN_H, DN_W)), jnp.float32
        ),
        invD=jnp.asarray(
            1.0 / rng.uniform(0.5, 3.0, (N_POSES, 1, DN_H, DN_W)), jnp.float32
        ),
        K=jnp.tile(
            jnp.asarray([[32.8, 32.8, 19.97, 14.97]], jnp.float32), (N_POSES, 1)
        ),
    )
    xi = jnp.asarray(rng.randn(N_POSES, 6) * 0.01, jnp.float32)
    R0, t0 = exp_se3(xi)

    pairs = [(i, i + 1) for i in range(N_POSES - 1)] + [
        (i, i + 2) for i in range(N_POSES - 2)
    ]
    pairs = (pairs * 2)[:DN_EDGES]
    ei = jnp.asarray([p[0] for p in pairs], jnp.int32)
    ej = jnp.asarray([p[1] for p in pairs], jnp.int32)
    w = jnp.concatenate(
        [jnp.ones((len(set(pairs)),)), jnp.zeros((DN_EDGES - len(set(pairs)),))]
    ).astype(jnp.float32)

    solve = jax.jit(
        lambda R, t: refine_dense_window(
            frames, R, t, ei, ej, edge_weights=w, iterations=DN_ITERS
        )
    )
    R0d, t0d = jax.device_put(R0), jax.device_put(t0)
    out = solve(R0d, t0d)
    assert np.isfinite(float(out[2][-1])), "dense BA diverged"

    def run(iters):
        # chained solves (each starts from the previous refined poses) +
        # value fetch: see bench_pose_graph for why
        t0_ = time.perf_counter()
        R, t = R0d, t0d
        costs = None
        for _ in range(iters):
            R, t, costs = solve(R, t)
        float(costs[-1])
        return time.perf_counter() - t0_

    dt_solve = _slope(run, lo=20, hi=60)
    eps = DN_EDGES * DN_ITERS / dt_solve
    print(
        json.dumps(
            {
                "metric": "dense_ba_edge_linearizations_per_s_16pose_32edge_30x40",
                "value": round(eps, 1),
                "unit": "edge-linearizations/s",
                "vs_baseline": None,
            }
        )
    )


def main():
    _setup_cache()
    bench_pose_graph()
    bench_dense()


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()  # fail fast instead of hanging on a dead relay
    main()
