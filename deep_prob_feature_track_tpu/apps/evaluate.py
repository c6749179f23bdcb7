"""Evaluation CLI (rewrite of ``code/evaluate.py``).

Usage::

    python -m deep_prob_feature_track_tpu.apps.evaluate \
        --dataset TUM_RGBD --data_root /path/to/tum \
        --preset feature --checkpoint ckpt.msgpack --keyframes 1,2,4,8

Evaluates per (trajectory x keyframe), dumps per-frame pickles, prints and
saves the cm/deg summary CSV.  ``--tracker ICP`` runs the non-learned ICP
baseline through the same duck-typed interface.
"""

from __future__ import annotations

import argparse
import os


def build_argparser():
    p = argparse.ArgumentParser(description="Evaluate two-view tracking")
    p.add_argument("--dataset", default="TUM_RGBD",
                   choices=("TUM_RGBD", "MovingObjects3D", "ScanNet", "VaryLighting"))
    p.add_argument("--data_root", default=None)
    p.add_argument("--preset", default="feature")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override any TrackerConfig field on top of --preset "
                        "(replaces the reference's per-knob flags)")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--keyframes", default="1,2,4,8")
    p.add_argument("--trajectory", default="")
    p.add_argument("--eval_set", default="test", choices=("test", "validation"))
    p.add_argument("--image_resize", type=float, default=0.25)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--tracker", default="learning_based",
                   choices=("learning_based", "ICP", "Point2Point",
                            "Iter_Point2Plane", "RGBD", "ColorICP",
                            "Iter_ColorICP"))
    p.add_argument("--obj_only", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="shard eval batches over all local devices "
                        "(batch_size must divide the device count)")
    p.add_argument("--output_dir", default="test_results")
    p.add_argument("--time", action="store_true")
    p.add_argument(
        "--save_img", type=int, default=0, metavar="N",
        help="dump per-level feature / sigma / warped-residual mosaics for "
        "the first N batches (PNG, like the reference's vis_res/vis_feat "
        "windows; ref algorithms.py:695-710, LeastSquareTracking.py:448-566)",
    )
    return p


def dump_diagnostics(net, variables, loader, out_dir, n_batches, has_mask=False):
    """Render per-level solver diagnostics to PNG mosaics.

    One directory per batch: ``feat0_l{3..0}.png`` (per-channel grids of the
    template features with the RGB panel), ``sigma0_l*.png``,
    ``residual_l*.png`` (channel-mean |weighted residual|, jet).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..utils import display

    @jax.jit
    def diag_fn(c0, c1, d0, d1, K, m0=None, m1=None):
        return net.apply(
            variables, c0, c1, d0, d1, K, obj_mask0=m0, obj_mask1=m1,
            method="track_diagnostics",
        )

    os.makedirs(out_dir, exist_ok=True)
    for bi, batch in enumerate(loader):
        if bi >= n_batches:
            break
        args = tuple(
            jnp.asarray(batch[k])
            for k in ("color0", "color1", "depth0", "depth1", "calib")
        )
        masks = ()
        if has_mask and "obj_mask0" in batch:
            masks = (jnp.asarray(batch["obj_mask0"]), jnp.asarray(batch["obj_mask1"]))
        _, diag = diag_fn(*args, *masks)
        bdir = os.path.join(out_dir, f"batch{bi:03d}")
        os.makedirs(bdir, exist_ok=True)
        rgb0 = np.asarray(batch["color0"][0])
        for lvl in range(4):
            display.save_image(
                os.path.join(bdir, f"feat0_l{lvl}.png"),
                display.visualize_feature_channels(
                    np.asarray(diag["features0"][lvl][0]), rgb=rgb0
                ),
            )
            display.save_image(
                os.path.join(bdir, f"sigma0_l{lvl}.png"),
                display.image_to_display(
                    np.asarray(diag["sigma0"][lvl][0]).mean(axis=0), cmap="jet"
                ),
            )
            res = np.abs(np.asarray(diag["residual"][lvl][0])).mean(axis=0)
            display.save_image(
                os.path.join(bdir, f"residual_l{lvl}.png"),
                display.image_to_display(res, cmap="jet"),
            )
        # match dots: the finest level's valid correspondences drawn on the
        # TARGET frame (headless twin of ref tools/display.py:168-194)
        coords, ok = diag["matches"][0]
        coords = np.asarray(coords[0])[:, np.asarray(ok[0])]
        display.save_image(
            os.path.join(bdir, "matches.png"),
            display.visualize_matches_on_image(
                np.asarray(batch["color1"][0]), coords
            ),
        )
    print(f"[evaluate] wrote diagnostics mosaics to {out_dir}")


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import numpy as np

    from ..evaluation import create_eval_loaders, evaluate_two_view, summarize_results
    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking
    from ..utils.timers import Timers

    keyframes = [int(k) for k in args.keyframes.split(",")]
    has_mask = args.dataset == "MovingObjects3D"
    timers = Timers(block=True) if args.time else None

    loaders = create_eval_loaders(
        args.dataset, args.eval_set, keyframes, args.batch_size,
        trajectory=args.trajectory, image_resize=args.image_resize,
        root=args.data_root,
    )

    import jax.numpy as jnp

    if args.tracker != "learning_based":
        # non-learned baselines through the batch_track duck-type
        # (ref evaluate.py:248-289 dispatches Open3D trackers the same way)
        from .baselines import ICPOdometry, RGBDOdometry

        tracker = {
            "ICP": lambda: ICPOdometry(),
            "Point2Point": lambda: ICPOdometry(mode="Point2Point"),
            "Iter_Point2Plane": lambda: ICPOdometry(mode="Iter_Point2Plane"),
            "RGBD": lambda: RGBDOdometry(term="hybrid"),
            "ColorICP": lambda: RGBDOdometry(term="color"),
            "Iter_ColorICP": lambda: RGBDOdometry(
                term="color", schedule=((2, 50), (1, 30), (0, 14))
            ),
        }[args.tracker]()
        ckpt_name = f"nolearning_{args.tracker}"

        def forward(c0, c1, d0, d1, K, obj_mask0=None, obj_mask1=None):
            R, t = tracker.batch_track(c0, d0, c1, d1, K)
            return jnp.asarray(R), jnp.asarray(t)

    else:
        from ..models.presets import apply_overrides

        preset = args.preset
        net = LeastSquareTracking(cfg=apply_overrides(get_preset(preset), args.set))

        # init / load weights
        first_loader = next(iter(loaders.values()))
        example = next(iter(first_loader))
        ex_args = tuple(
            jnp.asarray(example[k])
            for k in ("color0", "color1", "depth0", "depth1", "calib")
        )
        if args.checkpoint:
            from ..training.checkpoints import restore_variables

            raw = restore_variables(args.checkpoint)
            # accept either a bare variables dict or a full TrainState dump
            if "params" in raw and "batch_stats" in raw:
                variables = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
            else:
                variables = raw
            ckpt_name = os.path.basename(args.checkpoint).replace(".msgpack", "")
        else:
            print("[evaluate] no checkpoint: random init (non-learned presets unaffected)")
            variables = net.init(jax.random.PRNGKey(0), *ex_args, train=False)
            ckpt_name = f"nolearning_{preset}"

        @jax.jit
        def forward(c0, c1, d0, d1, K, obj_mask0=None, obj_mask1=None):
            return net.apply(
                variables, c0, c1, d0, d1, K,
                obj_mask0=obj_mask0, obj_mask1=obj_mask1, train=False,
            )

    sharding = None
    if args.mesh:
        from ..parallel.mesh import batch_sharding, make_mesh

        n_dev = len(jax.devices())
        if args.batch_size % n_dev:
            raise SystemExit(
                f"--mesh: batch_size {args.batch_size} not divisible by "
                f"{n_dev} devices"
            )
        sharding = batch_sharding(make_mesh())

    results = {}
    for key, loader in loaders.items():
        info = evaluate_two_view(
            loader, forward, has_mask=has_mask, obj_only=args.obj_only,
            timers=timers, sharding=sharding,
        )
        results[key] = info
        if "epes" in info:
            print(
                f"{key}: EPE3D={info['epes'].mean() * 100:.3f}cm  "
                f"axis={np.degrees(info['angular_error'].mean()):.4f}deg  "
                f"trans={info['translation_error'].mean() * 100:.3f}cm  "
                f"({info['epes'].shape[0]} frames)"
            )
        else:
            # GT-less dataset (VaryLighting): poses only
            print(f"{key}: no ground truth; {info['R_est'].shape[0]} poses estimated")

    out_dir = os.path.join(args.output_dir, ckpt_name)
    if args.save_img > 0 and args.tracker == "learning_based":
        dump_diagnostics(
            net, variables, next(iter(loaders.values())),
            os.path.join(out_dir, "vis"), args.save_img, has_mask=has_mask,
        )
    df = summarize_results(
        results, keyframes,
        output_csv=os.path.join(out_dir, "summary.csv"),
        dump_dir=out_dir,
    )
    print(df)
    if timers:
        timers.print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
