"""Decompose the VGA per-pixel train gap (round 5, VERDICT r4 item 5).

Level-0 train runs ~5 Mpx/s; VGA train ~1.4 Mpx/s.  This script
slope-times the train step's constituent programs at the largest
single-shot VGA grad shape (B=4, 480x640 — B=8 single-shot trips the
environment's compile-helper ceiling, PERF.md round-5 bisect) and
decomposes a step into:

  full      = grad + optimizer-apply            (full jitted train step)
  grad      = fwd + backward                    (value_and_grad, no Adam)
  fwd       = preprocess (2x encoder fwd + sfm init) + solver forward
  encoder2  = the two encoder fwd+bwd passes in isolation
  warp      = ONE level-0 fused warp fwd+bwd (the gather VJP unit cost)
  evalfwd   = eval-mode tracker forward (solver fwd without train extras)

plus a scan-recompute A/B: the same grad program under
DPFT_TRAIN_LOOP=scan_remat vs =unroll (no re-materialization).  The
unroll arm may OOM or trip the compile ceiling at VGA — a FAIL row is
itself the answer (recompute is the price of compiling at all).

Every number is slope-timed (lo/hi iteration counts, dependent-value
sync — block_until_ready alone under-reports 1000x through the relay,
docs/PERF.md).  Writes PROFILE_VGA_r05.json.

Usage: python scripts/profile_vga_gap.py [B [H W]]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
W = int(sys.argv[3]) if len(sys.argv) > 3 else 640

os.environ.setdefault("DPFT_TRAIN_LOOP", "scan_remat")
os.environ.setdefault("DPFT_BF16_RESIDUALS", "1")

import numpy as np

ROWS = []
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PROFILE_VGA_r05.json")


def report(**kw):
    ROWS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump({"rows": ROWS, "B": B, "H": H, "W": W,
                   "date": "2026-08-20",
                   "note": "per-stage slope-timed decomposition of the VGA "
                   "train step (VERDICT r4 item 5)"}, f, indent=1)


def slope_time(fn, args, lo=2, hi=6, label=""):
    """Compile, then slope-time fn(*args); returns ms/call.

    Sync via a tiny dependent fetch of the last output's first leaf
    (the relay can release block_until_ready early)."""
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)  # compile + 1st run
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:4]

    def timed(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = jfn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).ravel()[:4]  # drain the device queue
        return time.perf_counter() - t0

    t_lo = timed(lo)
    t_hi = timed(hi)
    assert t_hi > 1.5 * t_lo, f"{label}: timing not scaling ({t_lo:.3f}/{t_hi:.3f})"
    return (t_hi - t_lo) / (hi - lo) * 1e3


def main():
    from bench import preflight_tpu

    preflight_tpu()
    import jax
    import jax.numpy as jnp

    from bench_train import _setup_cache, measure_train
    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
    from deep_prob_feature_track_tpu.training.train import (
        TrainConfig, compute_loss, create_train_state, make_optimizer,
    )

    _setup_cache()
    rng = np.random.RandomState(0)

    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, :3, 3] = rng.randn(B, 3) * 0.01
    batch = {
        "color0": rng.rand(B, 3, H, W).astype(np.float32),
        "color1": rng.rand(B, 3, H, W).astype(np.float32),
        "depth0": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "depth1": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "calib": np.tile([[525.0 * W / 640, 525.0 * H / 480, (W - 0.5) / 2,
                           (H - 0.5) / 2]], (B, 1)).astype(np.float32),
        "transform": T,
        "pad_mask": np.ones((B,), bool),
    }
    net = LeastSquareTracking(cfg=get_preset("feature"))
    tcfg = TrainConfig(batch_size=B)
    state = create_train_state(net, make_optimizer(tcfg, 100), batch)
    dev_batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    # --- full train step (fps, for the per-pixel headline) ---
    fps = measure_train(B, H, W)
    report(stage="full_train_step", fps=round(fps, 3),
           ms_per_step=round(B / fps * 1e3, 1),
           mpx_per_s=round(fps * H * W / 1e6, 3))
    full_ms = B / fps * 1e3

    # --- grad only (no optimizer) ---
    def grad_fn(params, b):
        (loss, stats), grads = jax.value_and_grad(
            lambda p: compute_loss(net, tcfg, p, state.batch_stats, b),
            has_aux=True)(params)
        return loss, grads

    grad_ms = slope_time(grad_fn, (state.params, dev_batch), label="grad")
    report(stage="grad_no_optimizer", ms=round(grad_ms, 1),
           share_of_full=round(grad_ms / full_ms, 3))

    # --- forward only (train-mode loss) ---
    def fwd_fn(params, b):
        loss, stats = compute_loss(net, tcfg, params, state.batch_stats, b)
        return loss

    fwd_ms = slope_time(fwd_fn, (state.params, dev_batch), label="fwd")
    report(stage="fwd_train_mode", ms=round(fwd_ms, 1),
           share_of_full=round(fwd_ms / full_ms, 3),
           backward_ms=round(grad_ms - fwd_ms, 1))

    # --- the two encoder fwd+bwd passes in isolation ---
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ma = jnp.asarray(rng.rand(B, 8, H, W).astype(np.float32))
    mb = jnp.asarray(rng.rand(B, 8, H, W).astype(np.float32))

    def enc2_fn(params, ma, mb):
        def inner(p):
            v = {"params": p, "batch_stats": state.batch_stats}
            s = 0.0
            for m in (ma, mb):
                (feats, sigmas, raws), _ = net.apply(
                    v, m, True,
                    method=lambda mdl, mm, tr: mdl.encoder(mm, tr),
                    mutable=["batch_stats"])
                s = s + sum(jnp.sum(f) for f in feats)
                s = s + sum(jnp.sum(r) for r in raws)
            return s
        return jax.value_and_grad(inner)(params)

    enc_ms = slope_time(enc2_fn, (state.params, ma, mb), label="encoder2")
    report(stage="encoder2_fwd_bwd", ms=round(enc_ms, 1),
           share_of_full=round(enc_ms / full_ms, 3))

    # --- one level-0 fused warp fwd+bwd (the gather-VJP unit) ---
    from deep_prob_feature_track_tpu.geometry import warp as W_

    C = 10
    F = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    u = jnp.asarray((rng.rand(B, 1, H, W) * (W - 1)).astype(np.float32))
    v = jnp.asarray((rng.rand(B, 1, H, W) * (H - 1)).astype(np.float32))
    tgt = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))

    def warp_fn(F, u, v):
        return jax.value_and_grad(
            lambda a, b_, c: jnp.sum(W_.warp_features(a, b_, c) * tgt),
            argnums=(0, 1, 2))(F, u, v)

    warp_ms = slope_time(warp_fn, (F, u, v), label="warp")
    report(stage="warp_l0_fwd_bwd_single", ms=round(warp_ms, 2),
           note="one fused stacked-operand gather fwd+bwd at level-0 shape; "
           "the solver runs this ~max_iter times per level")

    # --- eval-mode forward (solver fwd without train extras) ---
    def eval_fn(c0, c1, d0, d1, K):
        return net.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         c0, c1, d0, d1, K, train=False)

    eval_ms = slope_time(
        eval_fn, (dev_batch["color0"], dev_batch["color1"],
                  dev_batch["depth0"], dev_batch["depth1"],
                  dev_batch["calib"]), lo=3, hi=9, label="evalfwd")
    report(stage="eval_mode_forward", ms=round(eval_ms, 1))

    # --- scan-recompute A/B: same grad program, unroll loop ---
    os.environ["DPFT_TRAIN_LOOP"] = "unroll"
    try:
        unroll_ms = slope_time(grad_fn, (state.params, dev_batch),
                               label="grad_unroll")
        report(stage="grad_no_optimizer_unroll", ms=round(unroll_ms, 1),
               recompute_overhead_ms=round(grad_ms - unroll_ms, 1),
               recompute_share_of_full=round((grad_ms - unroll_ms) / full_ms, 3))
    except Exception as e:  # noqa: BLE001
        report(stage="grad_no_optimizer_unroll", ok=False, err=str(e)[:300],
               note="unroll arm cannot run at VGA -> recompute cost is the "
               "price of compiling/fitting at all")
    finally:
        os.environ["DPFT_TRAIN_LOOP"] = "scan_remat"

    # --- summary ---
    report(stage="summary",
           full_ms=round(full_ms, 1),
           optimizer_ms=round(full_ms - grad_ms, 1),
           backward_ms=round(grad_ms - fwd_ms, 1),
           fwd_ms=round(fwd_ms, 1),
           encoder2_ms=round(enc_ms, 1),
           solver_fwd_plus_bwd_ms=round(grad_ms - enc_ms, 1),
           eval_fwd_ms=round(eval_ms, 1))
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
