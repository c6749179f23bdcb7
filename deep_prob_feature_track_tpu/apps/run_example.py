"""Minimal inference example: track consecutive frames from a PNG folder.

Rewrite of ``code/run_example.py``: a SimpleLoader over color/depth folders,
inputs resized to 120x160 with rescaled intrinsics, a jitted tracker
forward per pair, printed (R, t).

Usage::

    python -m deep_prob_feature_track_tpu.apps.run_example \
        --color_dir <dir>/color --depth_dir <dir>/depth \
        [--preset feature|DeepIC|RGB|ICP|...] [--checkpoint ckpt.msgpack]
"""

from __future__ import annotations

import argparse

import numpy as np


def resize_batch(batch, resizeH=120, resizeW=160):
    """Resize a numpy batch to the training resolution with rescaled K.

    Bilinear (align_corners) for color, nearest for depth, matching the
    reference (run_example.py:21-38).
    """
    import jax.numpy as jnp

    from ..ops.image import bilinear_resize_align

    c0 = jnp.asarray(batch["color0"])
    c1 = jnp.asarray(batch["color1"])
    d0 = jnp.asarray(batch["depth0"])
    d1 = jnp.asarray(batch["depth1"])
    K = jnp.asarray(batch["calib"])
    H, W = c0.shape[-2:]
    C0 = bilinear_resize_align(c0, resizeH, resizeW)
    C1 = bilinear_resize_align(c1, resizeH, resizeW)

    def nearest(x):
        ys = (jnp.arange(resizeH) * (H / resizeH)).astype(jnp.int32)
        xs = (jnp.arange(resizeW) * (W / resizeW)).astype(jnp.int32)
        return x[:, :, ys][:, :, :, xs]

    D0, D1 = nearest(d0), nearest(d1)
    # the reference swaps sx/sy here (run_example.py:29-35); intrinsics are
    # scaled consistently with the resize instead
    sx = resizeW / W
    sy = resizeH / H
    from ..geometry.warp import resize_K

    return C0, C1, D0, D1, resize_K(K, sx, sy)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run the tracker on a folder of frames")
    parser.add_argument("--color_dir", required=True)
    parser.add_argument("--depth_dir", required=True)
    parser.add_argument(
        "--intrinsic",
        default="525.0,525.0,319.5,239.5",
        help="pin-hole intrinsics fx,fy,cx,cy",
    )
    parser.add_argument("--preset", default="feature")
    parser.add_argument("--checkpoint", default="", help="msgpack checkpoint path")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    from ..data.pipeline import BatchLoader
    from ..data.simple import SimpleLoader
    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking

    K = [float(x) for x in args.intrinsic.split(",")]
    dataset = SimpleLoader(args.color_dir, args.depth_dir, K)
    loader = BatchLoader(dataset, batch_size=1, shuffle=False, prefetch=1)

    net = LeastSquareTracking(cfg=get_preset(args.preset))

    first = dataset[0]
    example = resize_batch(
        {k: v[None] if isinstance(v, np.ndarray) else v for k, v in first.items()}
    )
    if args.checkpoint:
        from ..training.checkpoints import restore_variables

        variables = restore_variables(args.checkpoint)
    else:
        print("[run_example] no checkpoint given: using randomly initialized weights")
        variables = net.init(jax.random.PRNGKey(args.seed), *example, train=False)

    @jax.jit
    def forward(C0, C1, D0, D1, Kb):
        return net.apply(variables, C0, C1, D0, D1, Kb, train=False)

    for idx, batch in enumerate(loader):
        C0, C1, D0, D1, Kb = resize_batch(batch)
        R, t = forward(C0, C1, D0, D1, Kb)
        print(f"pair {idx}:")
        print("Rotation:")
        print(np.asarray(R))
        print("translation:")
        print(np.asarray(t))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
