"""Bisect the VGA B>=8 train compile HTTP 500 by PROGRAM PART (round 5).

Round-5 findings so far: the failure is independent of every kernel/loop
flag (gather=0 tiles=0 / loop=unroll all FAIL identically at B=8), a
24 GB-live synthetic program PASSES, and a 1200-buffer liveness-heavy
program PASSES in 12 s — so the helper is not dying on memory budget or
assignment complexity, but on some specific lowering in the TRAIN
program (eval B=8 VGA compiles fine).  This script compiles the train
step's pieces in isolation.

Usage: python scripts/bisect_vga_parts.py PART B [H W]
  PART: fwd        train-mode tracker forward (mutable batch_stats)
        grad       value_and_grad of the full loss (no optimizer)
        encoder    fwd+bwd of the FeaturePyramid encoder alone
        warp       fwd+bwd of the level-0 fused warp (stacked C=10
                   operand, corner-grads + splat backward) alone
        loss       fwd+bwd of the EPE3D loss alone (pyr poses as leaves)
        levelsK    (levels0..levels4) grad of sum over the first K solved
                   pyramid levels' poses: backward runs only through
                   levels 3..(4-K) — XLA DCEs the un-consumed finer
                   levels, so K brackets which LEVEL's backward crashes
                   the helper (levels4 = all four, levels3 = no level-0)
Env: same DPFT_* flags as bisect_vga_b8.py (defaults scan_remat, bf16,
gather/tiles auto).  Compile-only; prints PASS/FAIL one line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PART = sys.argv[1] if len(sys.argv) > 1 else "grad"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H = int(sys.argv[3]) if len(sys.argv) > 3 else 480
W = int(sys.argv[4]) if len(sys.argv) > 4 else 640

os.environ.setdefault("DPFT_TRAIN_LOOP", "scan_remat")
os.environ.setdefault("DPFT_BF16_RESIDUALS", "1")

import numpy as np


def main():
    from bench import preflight_tpu

    preflight_tpu()
    import jax
    import jax.numpy as jnp

    from bench_train import _setup_cache
    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking

    _setup_cache()
    rng = np.random.RandomState(0)
    tag = {"part": PART, "B": B, "H": H, "W": W,
           **{k: os.environ[k] for k in os.environ if k.startswith("DPFT_")}}

    def report(fn, example_args):
        t0 = time.time()
        try:
            jax.jit(fn).lower(*example_args).compile()
            print(json.dumps({**tag, "result": "PASS",
                              "sec": round(time.time() - t0)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({**tag, "result": "FAIL",
                              "sec": round(time.time() - t0),
                              "err": str(e)[:200]}), flush=True)
            raise SystemExit(1)

    if PART in ("fwd", "grad", "loss") or PART.startswith("levels"):
        from deep_prob_feature_track_tpu.training.train import (
            TrainConfig, compute_loss, create_train_state, make_optimizer,
        )

        T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        T[:, :3, 3] = rng.randn(B, 3) * 0.01
        batch = {
            "color0": rng.rand(B, 3, H, W).astype(np.float32),
            "color1": rng.rand(B, 3, H, W).astype(np.float32),
            "depth0": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
            "depth1": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
            "calib": np.tile(
                [[525.0 * W / 640, 525.0 * H / 480, (W - 0.5) / 2,
                  (H - 0.5) / 2]], (B, 1)).astype(np.float32),
            "transform": T,
            "pad_mask": np.ones((B,), bool),
        }
        net = LeastSquareTracking(cfg=get_preset("feature"))
        tcfg = TrainConfig(batch_size=B)
        state = create_train_state(net, make_optimizer(tcfg, 100), batch)

        if PART == "fwd":
            def fn(params, batch):
                loss, stats = compute_loss(net, tcfg, params,
                                           state.batch_stats, batch)
                return loss
            report(fn, (state.params, batch))
        elif PART.startswith("levels"):
            Klv = int(PART[len("levels"):])

            def fn(params, batch):
                def inner(p):
                    out, _ = net.apply(
                        {"params": p, "batch_stats": state.batch_stats},
                        batch["color0"], batch["color1"], batch["depth0"],
                        batch["depth1"], batch["calib"], train=True,
                        mutable=["batch_stats"],
                    )
                    pyr_R, pyr_t = out[0], out[1]
                    # pyr entries: [sfm-init, l3, l2, l1, l0]; keep the
                    # init + first Klv solved levels, DCE drops the rest
                    k = 1 + Klv
                    return jnp.sum(pyr_t[:, :k] ** 2) + jnp.sum(
                        pyr_R[:, :k] ** 2)
                return jax.value_and_grad(inner)(params)
            report(fn, (state.params, batch))
        elif PART == "grad":
            def fn(params, batch):
                (loss, stats), grads = jax.value_and_grad(
                    lambda p: compute_loss(net, tcfg, p, state.batch_stats,
                                           batch), has_aux=True)(params)
                return loss, grads
            report(fn, (state.params, batch))
        else:  # loss: EPE3D alone, poses as differentiable leaves
            from deep_prob_feature_track_tpu import losses

            pyr_R = np.tile(np.eye(3, dtype=np.float32), (B, 5, 1, 1))
            pyr_t = rng.randn(B, 5, 3).astype(np.float32) * 0.01

            def fn(pyr_R, pyr_t, depth0, K):
                def inner(pt):
                    return jnp.sum(losses.compute_rt_epe_loss(
                        pyr_R, pt, jnp.asarray(T[:, :3, :3]),
                        jnp.asarray(T[:, :3, 3]), depth0, K))
                return jax.value_and_grad(inner)(pyr_t)
            report(fn, (pyr_R, pyr_t, batch["depth0"], batch["calib"]))

    elif PART == "initpose":
        # the exact levels0 path WITHOUT the solver levels in the jaxpr:
        # _preprocess (invD masking + color normalize + 2 encoder passes +
        # sfm-net init pose), grad of the init pose wrt params
        net = LeastSquareTracking(cfg=get_preset("feature"))
        batch0 = (rng.rand(B, 3, H, W).astype(np.float32),) * 2 + (
            rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),) * 2 + (
            np.tile([[525.0, 525.0, (W - 0.5) / 2, (H - 0.5) / 2]],
                    (B, 1)).astype(np.float32),)
        variables = net.init(jax.random.PRNGKey(0), *batch0, train=False)

        def fn(params, c0, c1, d0, d1):
            def inner(p):
                out, _ = net.apply(
                    {"params": p, **{k: v for k, v in variables.items()
                                     if k != "params"}},
                    c0, c1, d0, d1, None, None, None, True,
                    method=lambda mdl, a, b, c, d, pi, m0, m1, tr:
                        mdl._preprocess(a, b, c, d, pi, m0, m1, tr),
                    mutable=["batch_stats"],
                )
                pose = out[-1]
                return jnp.sum(pose[0] ** 2) + jnp.sum(pose[1] ** 2)
            return jax.value_and_grad(inner)(params)
        report(fn, (variables["params"], *batch0[:4]))

    elif PART == "posenet":
        from deep_prob_feature_track_tpu.models.nets import SFMPoseNet

        x0 = rng.randn(B, 128, H // 8, W // 8).astype(np.float32)
        x1 = rng.randn(B, 128, H // 8, W // 8).astype(np.float32)
        pnet = SFMPoseNet(scale_motion=0.01, multi_hypo="prob_fuse")
        pvars = jax.jit(lambda: pnet.init(jax.random.PRNGKey(0), x0, x1,
                                          train=True))()

        def fn(params, x0, x1):
            def inner(p):
                (R, t), _ = pnet.apply({"params": p["params"]}, x0, x1,
                                       train=True, mutable=["batch_stats"])
                return jnp.sum(R ** 2) + jnp.sum(t ** 2)
            return jax.value_and_grad(inner)(params)
        report(fn, (pvars, x0, x1))

    elif PART == "encoder2":
        # two SEQUENTIAL encoder fwd+bwd passes consuming the raw stage
        # outputs — the exact train-mode _preprocess structure feeding the
        # sfm-net init (tracker.py::_preprocess, train branch)
        net = LeastSquareTracking(cfg=get_preset("feature"))
        batch0 = (rng.rand(B, 3, H, W).astype(np.float32),) * 2 + (
            rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),) * 2 + (
            np.tile([[525.0, 525.0, (W - 0.5) / 2, (H - 0.5) / 2]],
                    (B, 1)).astype(np.float32),)
        variables = net.init(jax.random.PRNGKey(0), *batch0, train=False)
        ma = rng.rand(B, 8, H, W).astype(np.float32)
        mb = rng.rand(B, 8, H, W).astype(np.float32)

        def fn(params, ma, mb):
            def inner(p):
                v = {"params": p, **{k: x for k, x in variables.items()
                                     if k != "params"}}
                s = 0.0
                for m in (ma, mb):
                    (feats, sigmas, raws), _ = net.apply(
                        v, m, True,
                        method=lambda mdl, mm, tr: mdl.encoder(mm, tr),
                        mutable=["batch_stats"],
                    )
                    s = s + sum(jnp.sum(f) for f in feats)
                    s = s + sum(jnp.sum(r) for r in raws)
                return s
            return jax.value_and_grad(inner)(params)
        report(fn, (variables["params"], ma, mb))

    elif PART == "encoder":
        import flax.linen as nn

        net = LeastSquareTracking(cfg=get_preset("feature"))
        m = rng.rand(B, 8, H, W).astype(np.float32)
        variables = net.encoder_init_variables = None
        # init the full net to get encoder params in context
        batch0 = (rng.rand(B, 3, H, W).astype(np.float32),) * 2 + (
            rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),) * 2 + (
            np.tile([[525.0, 525.0, (W - 0.5) / 2, (H - 0.5) / 2]],
                    (B, 1)).astype(np.float32),)
        import jax as _jax
        variables = net.init(_jax.random.PRNGKey(0), *batch0, train=False)

        def fn(params, m):
            def inner(p):
                outs = net.apply(
                    {"params": p, **{k: v for k, v in variables.items()
                                     if k != "params"}},
                    m, True, method=lambda mdl, mm, tr: mdl.encoder(mm, tr),
                    mutable=["batch_stats"],
                )
                (feats, sigmas, raws), _ = outs
                s = sum(jnp.sum(f) for f in feats)
                s += sum(jnp.sum(x) for x in sigmas if x is not None)
                return s
            return jax.value_and_grad(inner)(params)
        report(fn, (variables["params"], m))

    elif PART == "warp":
        from deep_prob_feature_track_tpu.geometry import warp as W_

        C = 10
        F = rng.randn(B, C, H, W).astype(np.float32)
        u = (rng.rand(B, 1, H, W) * (W - 1)).astype(np.float32)
        v = (rng.rand(B, 1, H, W) * (H - 1)).astype(np.float32)
        t = rng.randn(B, C, H, W).astype(np.float32)

        def fn(F, u, v, t):
            def inner(F_, u_, v_):
                return jnp.sum(W_.warp_features(F_, u_, v_) * jnp.asarray(t))
            return jax.value_and_grad(inner, argnums=(0, 1, 2))(F, u, v)
        report(fn, (F, u, v, t))

    else:
        raise SystemExit(f"unknown part {PART}")


if __name__ == "__main__":
    main()
