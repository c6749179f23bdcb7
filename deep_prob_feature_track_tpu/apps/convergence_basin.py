"""Convergence-basin / cost-landscape study.

Rewrite of ``code/convergence_basin.py``: perturb the ground-truth pose
per-axis (1D: 6 axes x N samples) or on an x/y translation grid (2D: NxN)
and evaluate the average residual at every perturbation and pyramid level.
Where the reference loops perturbations one at a time in Python
(convergence_basin.py:170-187, :336-450), here the whole perturbation set
is evaluated as ONE batched call per level: the pair is encoded once per
chunk and the residual evaluation runs with the perturbations stacked
along the batch axis.

Perturbation ranges follow the reference's keyframe-dependent table
(ref :764-775): +-0.15 / 0.20 / 0.25 / 0.30 for kf 1 / 2 / 4 / 8.
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, Optional

import numpy as np

PERT_RANGE_BY_KF = {1: 0.15, 2: 0.20, 4: 0.25, 8: 0.30}


def perturbation_poses_1d(R_gt, t_gt, pert_range: float, samples: int):
    """Per-axis SE(3) perturbations of the GT pose.

    :return: (poses [6, S, ...], offsets [S])
    """
    import jax.numpy as jnp

    from ..geometry.lie import compose, exp_so3

    offsets = np.linspace(-pert_range, pert_range, samples)
    all_R, all_t = [], []
    for axis in range(6):
        xi = np.zeros((samples, 6), np.float32)
        xi[:, axis] = offsets
        dR = exp_so3(jnp.asarray(xi[:, :3]))
        dt = jnp.asarray(xi[:, 3:])
        R = jnp.broadcast_to(jnp.asarray(R_gt), (samples, 3, 3))
        t = jnp.broadcast_to(jnp.asarray(t_gt), (samples, 3))
        Rp, tp = compose(dR, dt, R, t)
        all_R.append(Rp)
        all_t.append(tp)
    return (jnp.stack(all_R), jnp.stack(all_t)), offsets


def perturbation_poses_2d(R_gt, t_gt, pert_range: float, samples: int):
    """x/y-translation grid perturbations (ref :168-187)."""
    import jax.numpy as jnp

    offsets = np.linspace(-pert_range, pert_range, samples)
    xx, yy = np.meshgrid(offsets, offsets, indexing="ij")
    P = samples * samples
    t = np.tile(np.asarray(t_gt, np.float32), (P, 1))
    t[:, 0] += xx.reshape(-1)
    t[:, 1] += yy.reshape(-1)
    R = jnp.broadcast_to(jnp.asarray(R_gt), (P, 3, 3))
    return (R, jnp.asarray(t)), offsets


def evaluate_basin(
    net,
    variables,
    item: Dict[str, np.ndarray],
    poses,
    levels=(0, 1, 2, 3),
    chunk: int = 64,
):
    """Residual landscape: cost[level, n_poses].

    The pair is tiled to the chunk size and all perturbed poses evaluated
    with the batched residual path.
    """
    import jax
    import jax.numpy as jnp

    R_all, t_all = poses
    flat_R = R_all.reshape(-1, 3, 3)
    flat_t = t_all.reshape(-1, 3)
    P = flat_R.shape[0]
    n_chunks = (P + chunk - 1) // chunk
    pad = n_chunks * chunk - P
    if pad:
        flat_R = jnp.concatenate([flat_R, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))])
        flat_t = jnp.concatenate([flat_t, jnp.zeros((pad, 3))])

    tiled = {
        k: jnp.broadcast_to(jnp.asarray(item[k])[None], (chunk,) + item[k].shape)
        for k in ("color0", "color1", "depth0", "depth1", "calib")
    }

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def residual_at(R, t, level):
        _, loss = net.apply(
            variables,
            tiled["color0"],
            tiled["color1"],
            tiled["depth0"],
            tiled["depth1"],
            tiled["calib"],
            pose_init=(R, t),
            level=level,
            method=type(net).compute_residual,
        )
        return loss

    costs = []
    for level in levels:
        level_costs = []
        for c in range(n_chunks):
            R = flat_R[c * chunk : (c + 1) * chunk]
            t = flat_t[c * chunk : (c + 1) * chunk]
            level_costs.append(np.asarray(residual_at(R, t, level)))
        costs.append(np.concatenate(level_costs)[:P])
    out = np.stack(costs)  # [L, P]
    return out.reshape((len(levels),) + tuple(R_all.shape[:-2]))


def save_plots(data: Dict, out_prefix: str):
    """Cost-landscape figures (the reference's surface/contour plots,
    convergence_basin.py:478-715), rendered headless."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    costs = data["costs"]
    offsets = data["offsets"]
    if data["dimension"] == "1D":
        axes_names = ["rot-x", "rot-y", "rot-z", "trans-x", "trans-y", "trans-z"]
        fig, axs = plt.subplots(2, 3, figsize=(14, 7), sharex=True)
        for a in range(6):
            ax = axs[a // 3][a % 3]
            for lvl in range(costs.shape[0]):
                ax.plot(offsets, costs[lvl, a], label=f"level {lvl}")
            ax.set_title(axes_names[a])
            ax.axvline(0.0, color="k", lw=0.5)
        axs[0][0].legend(fontsize=7)
        fig.suptitle(f"cost landscape ({data['trajectory']}, kf {data['keyframe']})")
        fig.tight_layout()
        fig.savefig(out_prefix + "_1d.png", dpi=110)
        plt.close(fig)
    else:
        n = costs.shape[0]
        S = len(offsets)
        fig, axs = plt.subplots(1, n, figsize=(4 * n, 3.6))
        for lvl in range(n):
            ax = axs[lvl] if n > 1 else axs
            im = ax.contourf(offsets, offsets, costs[lvl].reshape(S, S).T, levels=20)
            ax.plot(0, 0, "r+")
            ax.set_title(f"level {lvl}")
            fig.colorbar(im, ax=ax)
        fig.suptitle("x/y translation cost landscape")
        fig.tight_layout()
        fig.savefig(out_prefix + "_2d.png", dpi=110)
        plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description="Convergence-basin sweep")
    p.add_argument("--dataset", default="TUM_RGBD")
    p.add_argument("--data_root", default=None)
    p.add_argument("--trajectory", required=True)
    p.add_argument("--preset", default="feature")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--keyframe", type=int, default=1)
    p.add_argument("--cb_dimension", default="2D", choices=("1D", "2D"))
    p.add_argument("--pert_samples", type=int, default=31)
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--image_resize", type=float, default=0.25)
    p.add_argument("--output", default="convergence_basin.pkl")
    p.add_argument("--save_img", action="store_true", help="write landscape plots")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.loader import load_data
    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking

    dataset = load_data(
        args.dataset, [args.keyframe], "test", select_traj=args.trajectory,
        image_resize=args.image_resize, root=args.data_root,
    )
    item = dataset[args.frame]
    net = LeastSquareTracking(cfg=get_preset(args.preset))
    ex = tuple(
        jnp.asarray(item[k][None])
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

    T = np.asarray(item["transform"])
    R_gt, t_gt = T[:3, :3], T[:3, 3]
    rng = PERT_RANGE_BY_KF.get(args.keyframe, 0.15)
    if args.cb_dimension == "1D":
        poses, offsets = perturbation_poses_1d(R_gt, t_gt, rng, args.pert_samples)
    else:
        poses, offsets = perturbation_poses_2d(R_gt, t_gt, rng, args.pert_samples)

    costs = evaluate_basin(net, variables, item, poses)
    data = {
        "costs": costs,
        "offsets": offsets,
        "dimension": args.cb_dimension,
        "pert_range": rng,
        "trajectory": args.trajectory,
        "frame": args.frame,
        "keyframe": args.keyframe,
    }
    with open(args.output, "wb") as f:
        pickle.dump(data, f)
    if args.save_img:
        save_plots(data, args.output.replace(".pkl", ""))
    print(f"[convergence_basin] costs {costs.shape} -> {args.output}")
    print(f"  min cost per level: {costs.reshape(costs.shape[0], -1).min(axis=1)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
