"""In-band rate of the tile-slab kernel on REAL keyframe motion.

VERDICT round-3 item 1: the tile kernel's locality margin (~±20 rows /
±20..28 cols at the default config) was asserted "generous for a
tracking workload near convergence" but never checked against the 5
in-repo TUM fr1 frames at the kf strides the reference protocol uses.
This probe measures, for kf ∈ {1,2,3,4} (5 frames bound kf at 4):

- the whole-call in-band bit (``GT._prepare``'s ok — what actually
  gates the lax.cond) at every pyramid level where the default config
  applies, for (a) the identity init pose (level entry, worst case) and
  (b) the tracker's converged pose (where most GN iterations run);
- the per-tile overflow distribution (how many rows/cols past the band
  the worst tile reaches) so band sizing is data-driven, not asserted.

Round 5 additionally grades the t8x16_b48x64_i8 candidate config (15%
faster at C=17 eval per TILES_r04.json) — its band_v=48 has 16 fewer
rows of vertical-motion headroom than the shipping 64, so whether it can
become the Cp>16 eval default is a data question this probe answers.

CPU-only (forces the cpu backend; safe to run alongside nothing).
Writes INBAND_r05.json at the repo root.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DPFT_PALLAS_TILES"] = "0"
os.environ["DPFT_PALLAS_GATHER"] = "0"

import numpy as np


def band_stats(u, v, shape, cfg):
    """Replicate gather_tiles._prepare's in-band geometry and return
    (ok, worst row overflow, worst col overflow, frac of tiles in band)."""
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.geometry import warp as W
    from deep_prob_feature_track_tpu.ops.pallas import gather_tiles as GT

    B, H, Wd, C = shape
    starts, du, dv, _, _ = W._corner_weights(shape, u, v)
    Hs, Ws = u.shape[2], u.shape[3]
    v0 = starts[..., 0].reshape(B, Hs, Ws)
    u0 = starts[..., 1].reshape(B, Hs, Ws)
    th, tw, q = cfg.th, cfg.tw, cfg.q
    Hp = -(-Hs // th) * th
    Wp = -(-Ws // tw) * tw
    pads = (Hp - Hs, Wp - Ws)
    v0t = GT._tile_reorder(GT._edge_pad(v0, *pads), th, tw)
    u0t = GT._tile_reorder(GT._edge_pad(u0, *pads), th, tw)
    vmin = jnp.min(v0t, axis=-1)
    vmax = jnp.max(v0t, axis=-1)
    umin = jnp.min(u0t, axis=-1)
    umax = jnp.max(u0t, axis=-1)
    v_start = jnp.clip((vmin // 8) * 8, 0, ((H - cfg.band_v) // 8) * 8)
    u_start = jnp.clip((umin // q) * q, 0, ((Wd - cfg.band_u) // q) * q)
    ov_v = vmax - (v_start + cfg.band_v - 2)  # >0 = overflow rows
    ov_u = umax - (u_start + cfg.band_u - 2)
    in_band = (ov_v <= 0) & (ov_u <= 0)
    return (
        bool(jnp.all(in_band)),
        int(jnp.max(ov_v)),
        int(jnp.max(ov_u)),
        float(jnp.mean(in_band.astype(jnp.float32))),
    )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.data.simple import SimpleLoader
    from deep_prob_feature_track_tpu.geometry.warp import (
        batch_warp_inverse_depth,
        generate_xy_grid,
        scale_K,
    )
    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
    from deep_prob_feature_track_tpu.ops.image import image_pyramid
    from deep_prob_feature_track_tpu.ops.pallas import gather_tiles as GT

    root = "/root/reference/code/data/data_examples/TUM"
    K = [525.0, 525.0, 319.5, 239.5]
    ds = SimpleLoader(os.path.join(root, "color"), os.path.join(root, "depth"), K)

    # full-res frames (SimpleLoader pairs consecutive frames; index the
    # underlying arrays for arbitrary strides)
    frames = [ds[i] for i in range(len(ds))]
    color = [frames[i]["color0"] for i in range(len(frames))]
    color.append(frames[-1]["color1"])
    depth = [frames[i]["depth0"] for i in range(len(frames))]
    depth.append(frames[-1]["depth1"])
    n = len(color)
    print(f"{n} frames at {color[0].shape}", flush=True)

    net = LeastSquareTracking(cfg=get_preset("RGB"))
    c0 = jnp.asarray(color[0])[None]
    d0 = jnp.asarray(depth[0])[None]
    Kb = jnp.asarray(np.asarray(K, np.float32))[None]
    variables = net.init(jax.random.PRNGKey(0), c0, c0, d0, d0, Kb, train=False)

    import functools

    @jax.jit
    def forward(C0, C1, D0, D1):
        return net.apply(variables, C0, C1, D0, D1, Kb, train=False)

    results = []

    def report(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    # configs to grade: the two operand channel counts the VGA solver
    # actually warps (C=17 stacked U_IC operand, C=10 feature/eval stack)
    for kf in (1, 2, 3, 4):
        for i in range(0, n - kf):
            j = i + kf
            C0 = jnp.asarray(color[i])[None]
            C1 = jnp.asarray(color[j])[None]
            D0 = jnp.asarray(depth[i])[None]
            D1 = jnp.asarray(depth[j])[None]
            R, t = forward(C0, C1, D0, D1)
            t_cm = float(jnp.linalg.norm(t) * 100)

            inv_pyr = image_pyramid(1.0 / jnp.clip(D0, 1e-6))
            for pose_name, pose in (
                ("identity", (jnp.eye(3)[None], jnp.zeros((1, 3)))),
                ("converged", (R, t)),
            ):
                for lvl in (0, 1, 2):
                    H = 480 >> lvl
                    Wd = 640 >> lvl
                    Kl = scale_K(Kb, lvl)
                    px, py = generate_xy_grid(1, H, Wd, Kl)
                    u, v, _ = batch_warp_inverse_depth(
                        px, py, inv_pyr[lvl], pose, Kl
                    )
                    for C in (17, 10):
                        # C=17 grads is gated off (Cp>16 loses on hardware)
                        # but its EVAL config is live; band geometry only
                        # depends on (th, tw, bands, q), shared across kinds
                        cands = [
                            ("ship16x16_b64x64",
                             GT.default_tile_config("eval", H, Wd, C, H, Wd)),
                        ]
                        Cp = max(8, 1 << max(0, (C - 1).bit_length()))
                        small = GT.TileConfig(th=8, tw=16, band_v=48,
                                              band_u=64, inner=8, Cp=Cp)
                        if H >= small.band_v and (
                            ((H - small.band_v) // 8) * 8 + small.band_v >= H
                        ):
                            cands.append(("t8x16_b48x64_i8", small))
                        for cfg_name, cfg in cands:
                            if cfg is None:
                                continue
                            ok, ov_v, ov_u, frac = band_stats(
                                u, v, (1, H, Wd, C), cfg
                            )
                            report(
                                kf=kf, pair=(i, j), pose=pose_name, level=lvl,
                                C=C, cfg=cfg_name, ok=ok,
                                frac_tiles_in_band=round(frac, 4),
                                overflow_rows=ov_v, overflow_cols=ov_u,
                                t_cm=round(t_cm, 2),
                            )

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "INBAND_r05.json")
    # summary: whole-call ok rate per (kf, pose, cfg)
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in results:
        k = (r["kf"], r["pose"], r["cfg"])
        agg[k][0] += r["ok"]
        agg[k][1] += 1
    summary = {}
    for k in sorted(agg):
        ok, tot = agg[k]
        line = f"kf={k[0]} pose={k[1]} cfg={k[2]}: {ok}/{tot} calls in band"
        summary[f"kf{k[0]}_{k[1]}_{k[2]}"] = f"{ok}/{tot}"
        print(line, flush=True)
    with open(out, "w") as f:
        json.dump({"rows": results, "summary": summary,
                   "date": "2026-08-20"}, f, indent=1)


if __name__ == "__main__":
    main()
