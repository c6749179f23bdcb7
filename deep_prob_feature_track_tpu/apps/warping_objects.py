"""Object-motion qualitative study on MovingObjects3D.

Rewrite of ``code/experiments/warping_objects.py``: estimate (or take GT)
per-pair object poses, re-warp the live frame into the reference at full
resolution, and save residual mosaics with the object masks for visual
verification.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def warp_residual_mosaic(item, pose, out_path: str):
    """Warp color1 into frame 0 under ``pose`` and save a mosaic of
    [color0 | color1 | warped | residual masked to the object]."""
    import jax.numpy as jnp

    from ..geometry import warp as W
    from ..utils.display import create_mosaic, save_image

    color0 = jnp.asarray(item["color0"][None])
    color1 = jnp.asarray(item["color1"][None])
    depth0 = jnp.asarray(item["depth0"][None])
    K = jnp.asarray(item["calib"][None])
    B, _, H, W_ = depth0.shape
    px, py = W.generate_xy_grid(B, H, W_, K)
    invD0 = 1.0 / depth0
    u, v, _ = W.batch_warp_inverse_depth(px, py, invD0, pose, K)
    warped = W.warp_features(color1, u, v)
    residual = jnp.abs(warped - color0).mean(axis=1, keepdims=True)
    if "obj_mask0" in item:
        residual = residual * jnp.asarray(item["obj_mask0"][None])
    mosaic = create_mosaic(
        [np.asarray(color0[0]), np.asarray(color1[0]), np.asarray(warped[0]),
         np.asarray(residual[0])],
        cmap=[None, None, None, "jet"],
        rows=2,
    )
    save_image(out_path, mosaic)
    return float(residual.mean())


def main(argv=None):
    p = argparse.ArgumentParser(description="Object warping study")
    p.add_argument("--data_root", default=None)
    p.add_argument("--object", default="boat")
    p.add_argument("--preset", default="feature")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--gt_pose", action="store_true", help="use GT instead of tracking")
    p.add_argument("--num_pairs", type=int, default=8)
    p.add_argument("--output_dir", default="warping_objects_out")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.loader import load_data
    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking

    dataset = load_data(
        "MovingObjects3D", [1], "test", select_traj=args.object, root=args.data_root
    )
    os.makedirs(args.output_dir, exist_ok=True)

    forward = None
    if not args.gt_pose:
        net = LeastSquareTracking(cfg=get_preset(args.preset))
        item0 = dataset[0]
        ex = tuple(
            jnp.asarray(item0[k][None])
            for k in ("color0", "color1", "depth0", "depth1", "calib")
        )
        if args.checkpoint:
            from ..training.checkpoints import restore_variables

            raw = restore_variables(args.checkpoint)
            variables = (
                {"params": raw["params"], "batch_stats": raw["batch_stats"]}
                if "params" in raw
                else raw
            )
        else:
            variables = net.init(jax.random.PRNGKey(0), *ex, train=False)

        @jax.jit
        def forward(c0, c1, d0, d1, K, m0, m1):
            return net.apply(
                variables, c0, c1, d0, d1, K, obj_mask0=m0, obj_mask1=m1, train=False
            )

    for i in range(min(args.num_pairs, len(dataset))):
        item = dataset[i]
        if args.gt_pose:
            T = np.asarray(item["transform"])
            pose = (jnp.asarray(T[None, :3, :3]), jnp.asarray(T[None, :3, 3]))
        else:
            R, t = forward(
                *(jnp.asarray(item[k][None])
                  for k in ("color0", "color1", "depth0", "depth1", "calib")),
                jnp.asarray(item["obj_mask0"][None]),
                jnp.asarray(item["obj_mask1"][None]),
            )
            pose = (R, t)
        res = warp_residual_mosaic(
            item, pose, os.path.join(args.output_dir, f"pair_{i:04d}.png")
        )
        print(f"[warping_objects] pair {i}: masked residual {res:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
