"""Training CLI (rewrite of ``code/train.py``).

Usage::

    python -m deep_prob_feature_track_tpu.apps.train \
        --dataset TUM_RGBD --data_root /path/to/tum \
        --preset feature --epochs 30 --batch_size 64 [--mesh]

Per epoch: checkpoint save, validation over (trajectory x keyframe)
loaders, one training epoch with TB/JSONL logging — matching the reference
schedule (train.py:305-353) with mesh-sharded data parallelism instead of
``nn.DataParallel``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import random
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="Train the feature-metric tracker")
    p.add_argument("--dataset", default="TUM_RGBD",
                   choices=("TUM_RGBD", "MovingObjects3D", "ScanNet", "VaryLighting"))
    p.add_argument("--data_root", default=None)
    p.add_argument("--preset", default="feature")
    p.add_argument("--keyframes", default="1,2,4,8")
    p.add_argument("--image_resize", type=float, default=0.25)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--loss", default="EPE3D", choices=("EPE3D", "RPE", "UEPE3D", "URPE"))
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override any TrackerConfig field on top of --preset "
                        "(e.g. --set feature_channel=4 --set combine_icp=1); "
                        "replaces the reference's per-knob flags")
    p.add_argument("--opt", default="adam", choices=("adam", "sgd"))
    p.add_argument("--lr_decay_ratio", type=float, default=0.5)
    p.add_argument("--lr_decay_epochs", default="5,10,20",
                   help="comma-separated epoch boundaries for MultiStepLR")
    p.add_argument("--weight_decay", type=float, default=4e-4)
    p.add_argument("--grad_clip", type=float, default=5.0)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches per step (the "
                        "compiled program has the batch/accum shape; lifts "
                        "the VGA batch ceiling — docs/PERF.md round 5)")
    p.add_argument("--accum_loop", default="host", choices=("host", "scan"),
                   help="accumulation driver: 'host' compiles the "
                        "microbatch-shaped step (VGA-proven), 'scan' is a "
                        "single dispatch for small shapes")
    p.add_argument("--checkpoint", default="", help="resume checkpoint")
    p.add_argument("--checkpoint_folder", default="logs")
    p.add_argument("--save_checkpoint_freq", type=int, default=1)
    p.add_argument("--no_val", action="store_true")
    p.add_argument("--mesh", action="store_true", help="shard batch over all devices")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() before device use")
    p.add_argument("--debug_nan", action="store_true",
                   help="checkify float checks on the train step (slow)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--time", action="store_true", help="stage timing")
    p.add_argument("--max_steps_per_epoch", type=int, default=0,
                   help="truncate epochs (smoke tests)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    # fixed seeds like the reference (train.py:377-378)
    random.seed(args.seed)
    np.random.seed(args.seed)

    if args.distributed:
        import jax

        jax.distributed.initialize()

    import jax

    from ..data.loader import load_data
    from ..data.pipeline import BatchLoader
    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking
    from ..parallel.mesh import make_mesh
    from ..training import checkpoints
    from ..training.train import (
        TrainConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
        train_epoch,
    )
    from ..utils.logger import MetricsLogger, config_fingerprint, git_revision

    from ..models.presets import apply_overrides

    cfg = apply_overrides(get_preset(args.preset), args.set)
    if args.loss in ("UEPE3D", "URPE"):
        cfg = dataclasses.replace(cfg, uncer_prop=True)
    keyframes = [int(k) for k in args.keyframes.split(",")]

    run_name = f"{args.dataset}_{config_fingerprint(cfg)}_lr_{args.lr}_batch_{args.batch_size}"
    logdir = os.path.join(args.checkpoint_folder, run_name)
    logger = MetricsLogger(logdir, is_main_process=jax.process_index() == 0)
    print(f"[train] logdir={logdir} git={git_revision()}")

    train_set = load_data(
        args.dataset, keyframes, "train", image_resize=args.image_resize,
        root=args.data_root, augment_seed=args.seed,
    )
    # --batch_size is the GLOBAL batch; each process loads + feeds only its
    # own shard (shard_batch assembles the global array per host)
    nproc = jax.process_count()
    if args.batch_size % nproc:
        raise SystemExit(
            f"--batch_size {args.batch_size} not divisible by process count {nproc}"
        )
    local_bs = args.batch_size // nproc
    loader = BatchLoader(
        train_set, local_bs, shuffle=True, seed=args.seed, drop_last=True,
        shard_index=jax.process_index(), num_shards=nproc,
    )
    steps_per_epoch = max(len(loader), 1)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)

    net = LeastSquareTracking(cfg=cfg)
    tcfg = TrainConfig(
        loss=args.loss, lr=args.lr, epochs=args.epochs,
        batch_size=args.batch_size, opt=args.opt,
        lr_decay_ratio=args.lr_decay_ratio,
        lr_decay_epochs=tuple(
            int(e) for e in args.lr_decay_epochs.split(",") if e
        ),
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        accum_steps=args.accum_steps, accum_loop=args.accum_loop,
    )
    optimizer = make_optimizer(tcfg, steps_per_epoch)
    example = next(iter(BatchLoader(train_set, local_bs, prefetch=0)))
    example = {k: v for k, v in example.items() if not isinstance(v, list)}
    state = create_train_state(net, optimizer, example, seed=args.seed)
    if args.checkpoint:
        state = checkpoints.restore_train_state(args.checkpoint, state)
        print(f"[train] resumed from {args.checkpoint} at step {int(state.step)}")

    # multi-process ALWAYS runs mesh-sharded (the global batch only exists
    # as a sharded array)
    mesh = make_mesh() if (args.mesh or nproc > 1) else None
    step_fn = make_train_step(net, tcfg, optimizer, mesh=mesh)
    if args.debug_nan:
        from ..utils.debug import checked

        def _raw_step(state, batch):
            return step_fn(state, batch)

        step_fn = checked(_raw_step, jit=False)

    val_loaders = {}
    if not args.no_val:
        from ..evaluation import create_eval_loaders

        try:
            val_loaders = create_eval_loaders(
                args.dataset, "validation", keyframes, args.batch_size,
                image_resize=args.image_resize, root=args.data_root,
            )
        except Exception as e:  # validation data optional
            print(f"[train] validation loaders unavailable: {e}")

    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        if epoch % args.save_checkpoint_freq == 0 and jax.process_index() == 0:
            path = os.path.join(logdir, f"checkpoint_epoch{epoch}.msgpack")
            checkpoints.save_train_state(path, jax.device_get(state))
            print(f"[train] saved {path}")

        if val_loaders:
            from ..evaluation import evaluate_two_view

            variables = {"params": state.params, "batch_stats": state.batch_stats}

            @jax.jit
            def val_forward(c0, c1, d0, d1, K):
                return net.apply(variables, c0, c1, d0, d1, K, train=False)

            for k, vloader in val_loaders.items():
                info = evaluate_two_view(vloader, val_forward)
                logger.scalar(f"val/{k}/epe3d", float(info["epes"].mean()), epoch)

        t0 = time.time()
        state, mean_loss = train_epoch(
            step_fn, state, loader, mesh=mesh, logger=logger,
            max_steps=args.max_steps_per_epoch,
        )
        print(
            f"[train] epoch {epoch}: loss={mean_loss:.4f} "
            f"({time.time() - t0:.1f}s, step={int(state.step)})"
        )
        logger.scalar("train/epoch_loss", mean_loss, epoch)

    if jax.process_index() == 0:
        path = os.path.join(logdir, f"checkpoint_epoch{args.epochs}.msgpack")
        checkpoints.save_train_state(path, jax.device_get(state))
        print(f"[train] saved final {path}")
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
