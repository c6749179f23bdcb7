"""Training driver: optax Adam + multi-step schedule, mesh-sharded step.

TPU-native rewrite of ``code/train.py``: the epoch loop, the EPE3D/RPE/
uncertainty loss selection (train.py:166-178), grad-norm clip 5.0
(:189), Adam(lr 5e-4, wd 4e-4) with x0.5 decay at epochs {5,10,20}
(config.py:141-191, train_utils.py:42-63) — but data parallelism is a
sharded jit over a device Mesh instead of ``nn.DataParallel``, with
cross-replica gradient reduction and batch-norm statistics handled by XLA
from the sharding annotations.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import losses
from ..models.tracker import LeastSquareTracking, TrackerConfig
from ..parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    loss: str = "EPE3D"  # EPE3D | RPE | URPE | UEPE3D
    lr: float = 5e-4
    lr_decay_ratio: float = 0.5
    lr_decay_epochs: Tuple[int, ...] = (5, 10, 20)
    weight_decay: float = 4e-4
    grad_clip: float = 5.0
    epochs: int = 30
    batch_size: int = 64
    opt: str = "adam"  # adam | sgd
    # gradient accumulation: split each batch into this many sequential
    # microbatches inside ONE jitted step (lax.scan), average the grads,
    # apply the optimizer once.  The compiled program has the MICROBATCH
    # shape, which is what lifts the VGA batch ceiling on this
    # environment's remote compile helper (it dies on [B>=8, 480, 640]
    # train backwards — see docs/PERF.md round-5 bisect); it is also the
    # standard lever for batches beyond device memory.  BatchNorm runs
    # per-microbatch with EMA chained across them — the same semantics as
    # the reference's per-GPU nn.DataParallel statistics
    # (ref train.py:295-298).
    accum_steps: int = 1
    # "scan": microbatches inside ONE jitted step (lowest dispatch
    # overhead; XLA's scheduler must fit the whole loop body, which at
    # VGA shapes keeps many remat'd encoder-backward copies live — OOM,
    # measured round 5).  "host": a Python loop over a per-microbatch
    # jitted grad + a tiny jitted apply — the compiled program IS the
    # microbatch-shaped step (the one that fits/compiles), at the cost of
    # accum_steps dispatches per step.  VGA B>=16 uses "host".
    accum_loop: str = "scan"


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """MultiStepLR: lr * ratio^k after each decay epoch (ref config.py:186-191)."""
    boundaries = {
        int(e * steps_per_epoch): cfg.lr_decay_ratio for e in cfg.lr_decay_epochs
    }
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """clip(5.0) -> +wd*param -> adam moments -> lr (torch Adam semantics:
    L2 folded into the gradient, ref train_utils.py:52-55, train.py:189)."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.opt == "adam":
        scaler = optax.scale_by_adam()
    elif cfg.opt == "sgd":
        scaler = optax.trace(decay=0.9)
    else:
        raise ValueError(cfg.opt)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay),
        scaler,
        optax.scale_by_learning_rate(schedule),
    )


def compute_loss(
    net: LeastSquareTracking,
    train_cfg: TrainConfig,
    params,
    batch_stats,
    batch: Dict[str, jnp.ndarray],
):
    """Forward + loss for one batch (ref train.py:134-178).

    Batch keys: color0/1, depth0/1, calib, transform [B,4,4], pad_mask [B],
    optional obj_mask0/1.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = {}
    if "obj_mask0" in batch:
        kwargs["obj_mask0"] = batch["obj_mask0"]
        kwargs["obj_mask1"] = batch["obj_mask1"]
    out, mutated = net.apply(
        variables,
        batch["color0"],
        batch["color1"],
        batch["depth0"],
        batch["depth1"],
        batch["calib"],
        train=True,
        mutable=["batch_stats"],
        **kwargs,
    )
    R_gt = batch["transform"][:, :3, :3]
    t_gt = batch["transform"][:, :3, 3]
    # the reference's "lazy way to bypass invalid pixels": pixels at the
    # GLOBAL depth min/max of the batch tensor are excluded from the loss,
    # OR'd with the inverted object mask when present (ref train.py:129-132)
    depth0 = batch["depth0"]
    invalid = (depth0 == jnp.min(depth0)) | (depth0 == jnp.max(depth0))
    if "obj_mask0" in batch:
        invalid = ~batch["obj_mask0"] | invalid  # loss only on the object

    if net.cfg.uncer_prop:
        pyr_R, pyr_t, sigma_ksi = out
    else:
        pyr_R, pyr_t = out
        sigma_ksi = None

    if train_cfg.loss == "EPE3D":
        # the reference trains on epes3d = EPE3D.mean() * 1e2 (train.py:168)
        # — the x100 matters: it interacts with the 5.0 grad-norm clip
        per_sample = 1e2 * losses.compute_rt_epe_loss(
            pyr_R, pyr_t, R_gt, t_gt, batch["depth0"], batch["calib"], invalid=invalid
        )
    elif train_cfg.loss == "RPE":
        ang, trs = losses.compute_rpe_loss(pyr_R, pyr_t, R_gt, t_gt)
        per_sample = jnp.broadcast_to(ang + trs, pyr_R.shape[:1])
    elif train_cfg.loss == "URPE":
        inv_var = sigma_ksi
        total = losses.compute_rpe_uncertainty_loss(pyr_R, pyr_t, R_gt, t_gt, inv_var)
        per_sample = jnp.broadcast_to(total / pyr_R.shape[0], pyr_R.shape[:1])
    elif train_cfg.loss == "UEPE3D":
        from ..ops.solver6 import lev_mar_damp

        sigma = jnp.linalg.inv(lev_mar_damp(sigma_ksi.reshape(-1, 6, 6))).reshape(
            sigma_ksi.shape
        )
        nll, epe = losses.compute_rt_epe_uncertainty_loss(
            pyr_R, pyr_t, R_gt, t_gt, batch["depth0"], batch["calib"], sigma, invalid=invalid
        )
        per_sample = nll
    else:
        raise ValueError(train_cfg.loss)

    mask = batch.get("pad_mask")
    if mask is None:
        loss = jnp.mean(per_sample)
    else:
        loss = jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1)
    return loss, mutated["batch_stats"]


def make_train_step(
    net: LeastSquareTracking,
    train_cfg: TrainConfig,
    optimizer,
    mesh=None,
    guard_nonfinite: bool = False,
    donate: Optional[bool] = None,
    batch_shardings=None,
) -> Callable:
    """Build the jitted (and mesh-sharded, if given) train step.

    :param batch_shardings: optional pytree of per-leaf NamedShardings for
        the batch (parallel.mesh.batch_shardings) — e.g. the 2-D
        data x spatial layout; default shards the leading dim over 'data'.

    :param guard_nonfinite: skip the parameter/optimizer update whenever the
        loss or gradients are non-finite (the batch is consumed but the
        state is untouched) — keeps long unattended runs alive through
        pathological batches; 'skipped' in the metrics flags it.
    :param donate: donate the input state's buffers (default: True with a
        mesh, False otherwise).  Donation is essential on remote-attached
        TPUs — without it every call re-ships the full state (measured
        ~65x slower through the relay) — but invalidates the caller's old
        state object after each call.
    """

    accum = max(int(getattr(train_cfg, "accum_steps", 1) or 1), 1)
    accum_loop = getattr(train_cfg, "accum_loop", "scan")

    if accum > 1 and accum_loop == "host":
        # Python loop over a per-microbatch jitted grad + one jitted
        # apply.  The compiled program is the MICROBATCH-shaped step —
        # at VGA shapes the scan variant OOMs (XLA keeps many remat'd
        # encoder-backward copies live inside the loop body, measured
        # 28 G at B=16/accum=2 where the standalone B=8 program fits),
        # and B>=8 single-shot programs crash this environment's remote
        # compile helper outright (docs/PERF.md round-5 bisect).  Costs
        # accum dispatches per step; semantics identical to the scan
        # mode (chained BN stats, averaged grads, one optimizer apply).
        assert mesh is None, (
            "accum_loop='host' is single-device (use the mesh data axis "
            "for multi-chip batch scaling instead)"
        )

        # stats is NOT donated: the first call would invalidate
        # state.batch_stats, which apply_fn still receives inside state
        @jax.jit
        def micro_grad(params, stats, mb):
            (l, new_stats), g = jax.value_and_grad(
                lambda p: compute_loss(net, train_cfg, p, stats, mb),
                has_aux=True,
            )(params)
            return l, new_stats, g

        @partial(jax.jit, donate_argnums=(0, 1))
        def accum_add(gacc, lacc, g, l):
            return jax.tree.map(lambda a, b: a + b, gacc, g), lacc + l

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3) if donate else (1, 2, 3))
        def apply_fn(state, gsum, lsum, new_stats):
            grads = jax.tree.map(lambda g: g / accum, gsum)
            loss = lsum / accum
            updates, new_opt = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
            if guard_nonfinite:
                ok = jnp.isfinite(loss) & jnp.isfinite(metrics["grad_norm"])
                keep = lambda new, old: jax.tree.map(
                    lambda a, b: jnp.where(ok, a, b), new, old
                )
                new_params = keep(new_params, state.params)
                new_opt = keep(new_opt, state.opt_state)
                new_stats = keep(new_stats, state.batch_stats)
                metrics["skipped"] = ~ok
            return TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ), metrics

        def host_step(state: TrainState, batch):
            B = next(iter(batch.values())).shape[0]
            assert B % accum == 0, (B, accum)
            mb_sz = B // accum
            stats = state.batch_stats
            gsum = lsum = None
            for i in range(accum):
                mb = {k: v[i * mb_sz:(i + 1) * mb_sz]
                      for k, v in batch.items()}
                l, stats, g = micro_grad(state.params, stats, mb)
                if gsum is None:
                    gsum, lsum = g, l
                else:
                    gsum, lsum = accum_add(gsum, lsum, g, l)
            return apply_fn(state, gsum, lsum, stats)

        return host_step

    def step_fn(state: TrainState, batch):
        if accum > 1:
            # microbatch scan: grads averaged, loss averaged, BatchNorm
            # EMA chained sequentially (per-microbatch statistics — the
            # reference's per-GPU DataParallel semantics).  With a ragged
            # pad_mask the loss/grad weighting is mean-of-microbatch-means
            # rather than global-mask-weighted; microbatches are equal
            # slices of the batch, so full batches are exact.
            def split(x):
                assert x.shape[0] % accum == 0, (
                    f"batch dim {x.shape[0]} not divisible by "
                    f"accum_steps={accum}"
                )
                return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            mbs = jax.tree.map(split, batch)
            gzero = jax.tree.map(jnp.zeros_like, state.params)

            def micro(carry, mb):
                stats, gacc, lacc = carry

                def loss_fn(params):
                    return compute_loss(net, train_cfg, params, stats, mb)

                (l, new_stats), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                gacc = jax.tree.map(lambda a, b: a + b, gacc, g)
                return (new_stats, gacc, lacc + l), None

            (new_stats, gsum, lsum), _ = jax.lax.scan(
                micro, (state.batch_stats, gzero, jnp.float32(0.0)), mbs
            )
            grads = jax.tree.map(lambda g: g / accum, gsum)
            loss = lsum / accum
        else:
            def loss_fn(params):
                return compute_loss(
                    net, train_cfg, params, state.batch_stats, batch
                )

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        if guard_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(metrics["grad_norm"])
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )
            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, state.opt_state)
            new_stats = keep(new_stats, state.batch_stats)
            metrics["skipped"] = ~ok
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    if mesh is None:
        if donate:
            return jax.jit(step_fn, donate_argnums=(0,))
        return jax.jit(step_fn)
    repl = replicated(mesh)
    data = batch_sharding(mesh) if batch_shardings is None else batch_shardings
    donate_args = () if donate is False else (0,)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=donate_args,
    )


def create_train_state(
    net: LeastSquareTracking,
    optimizer,
    example_batch: Dict[str, np.ndarray],
    seed: int = 1,
) -> TrainState:
    # init on a SINGLE-sample slice: every parameter/stat shape is batch-
    # independent, the init forward compiles ~B-times faster, and a full-
    # batch VGA init would trip this environment's compile-helper ceiling
    # for B>=16 480x640 programs (docs/PERF.md round-5 bisect) even when
    # the actual training step — microbatched via accum_steps — fits
    def one(x):
        return jnp.asarray(np.asarray(x)[:1])

    variables = net.init(
        jax.random.PRNGKey(seed),
        one(example_batch["color0"]),
        one(example_batch["color1"]),
        one(example_batch["depth0"]),
        one(example_batch["depth1"]),
        one(example_batch["calib"]),
        train=False,
    )
    params = variables.get("params", {})  # e.g. the RGB preset is param-free
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def train_epoch(
    train_step,
    state: TrainState,
    loader,
    mesh=None,
    log_every: int = 10,
    logger=None,
    max_steps: int = 0,
) -> Tuple[TrainState, float]:
    """One epoch over the loader; returns (state, mean loss).

    Losses are kept on device and reduced once at epoch end so the host
    never blocks the dispatch pipeline mid-epoch (except at ``log_every``
    boundaries, where one scalar is materialized for logging).
    """
    losses = []
    t0 = time.time()
    for i, batch in enumerate(loader):
        if max_steps and i >= max_steps:
            break
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = train_step(state, batch)
        losses.append(metrics["loss"])
        if logger is not None and i % log_every == 0:
            logger.scalar("train/loss", float(metrics["loss"]), int(state.step))
            logger.scalar(
                "train/steps_per_sec", (i + 1) / (time.time() - t0), int(state.step)
            )
    if not losses:
        return state, 0.0
    return state, float(jnp.mean(jnp.stack(losses)))
