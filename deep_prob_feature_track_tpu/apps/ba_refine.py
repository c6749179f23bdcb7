"""Multi-keyframe trajectory refinement: VO + windowed pose-graph BA.

Runs the two-view tracker over all pairs within a sliding keyframe window
(batched — all window edges of a chunk are tracked in one device call),
collects each edge's relative pose and 6x6 information matrix (the U_IC
solver's ``JtWJ``), and refines the trajectory with the distributed
pose-graph backend (``parallel/ba.py``).  Reports ATE before/after when
ground truth is available.

Usage::

    python -m deep_prob_feature_track_tpu.apps.ba_refine \
        --dataset TUM_RGBD --data_root ... --trajectory ... \
        --preset feature --checkpoint ckpt.msgpack --window 5
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import List, Tuple

import numpy as np


def window_pairs(n_frames: int, window: int) -> List[Tuple[int, int]]:
    """All (i, j) pairs with 0 < j - i <= window."""
    pairs = []
    for i in range(n_frames):
        for j in range(i + 1, min(i + window + 1, n_frames)):
            pairs.append((i, j))
    return pairs


def track_pairs(dataset, pairs, forward_fn, batch_size: int = 8):
    """Track a list of frame pairs in batched device calls.

    :return: (meas list of (R, t), info list of [6,6])
    """
    import jax.numpy as jnp

    meas, infos = [], []
    for start in range(0, len(pairs), batch_size):
        chunk = pairs[start : start + batch_size]
        pad = batch_size - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        items = [dataset.pair_frames(i, j) for (i, j) in chunk_p]
        batch = {
            k: jnp.asarray(np.stack([it[k] for it in items]))
            for k in ("color0", "color1", "depth0", "depth1", "calib")
        }
        R, t, JtWJ = forward_fn(
            batch["color0"], batch["color1"], batch["depth0"], batch["depth1"], batch["calib"]
        )
        R = np.asarray(R)
        t = np.asarray(t)
        JtWJ = np.asarray(JtWJ)
        for b in range(len(chunk)):
            meas.append((R[b], t[b]))
            infos.append(JtWJ[b])
    return meas, infos


def main(argv=None):
    p = argparse.ArgumentParser(description="Windowed multi-keyframe BA refinement")
    p.add_argument("--dataset", default="TUM_RGBD")
    p.add_argument("--data_root", default=None)
    p.add_argument("--trajectory", required=True)
    p.add_argument("--preset", default="feature")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--keyframe", type=int, default=1)
    p.add_argument("--window", type=int, default=3)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--image_resize", type=float, default=0.25)
    p.add_argument("--sharded", action="store_true", help="shard edges over the mesh")
    p.add_argument("--dense", action="store_true",
                   help="follow the pose-graph solve with dense feature-metric "
                        "window refinement (direct multi-frame alignment)")
    p.add_argument("--dense_level", type=int, default=1,
                   help="feature-pyramid level for the dense refinement")
    p.add_argument("--dense_iterations", type=int, default=5)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--output", default="ba_trajectory.txt")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.loader import load_data
    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking
    from ..parallel import ba
    from .kf_vo import ate_rmse, write_tum_trajectory

    dataset = load_data(
        args.dataset, [args.keyframe], "test", select_traj=args.trajectory,
        image_resize=args.image_resize, root=args.data_root,
    )

    n_frames = dataset.num_frames()
    if args.max_frames:
        n_frames = min(n_frames, args.max_frames)

    cfg = dataclasses.replace(get_preset(args.preset), uncer_prop=True)
    net = LeastSquareTracking(cfg=cfg)
    item = dataset[0]
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

    @jax.jit
    def forward(c0, c1, d0, d1, K):
        (R, t), JtWJ = net.apply(variables, c0, c1, d0, d1, K, train=False)
        return R, t, JtWJ

    pairs = window_pairs(n_frames, args.window)
    print(f"[ba_refine] tracking {len(pairs)} window edges over {n_frames} frames")
    meas, infos = track_pairs(dataset, pairs, forward, args.batch_size)

    # initial trajectory: chain the odometry edges (j = i+1)
    poses = np.tile(np.eye(4), (n_frames, 1, 1))
    odo = {(i, j): k for k, (i, j) in enumerate(pairs) if j == i + 1}
    for i in range(n_frames - 1):
        k = odo[(i, i + 1)]
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = meas[k]
        poses[i + 1] = poses[i] @ np.linalg.inv(T)

    graph = ba.build_window_graph(poses, pairs, meas, infos)
    if args.sharded:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        n_dev = mesh.shape["data"]
        pad = (-len(pairs)) % n_dev
        if pad:
            pairs_p = pairs + [pairs[0]] * pad
            meas_p = meas + [meas[0]] * pad
            infos_p = infos + [np.zeros((6, 6))] * pad
            graph = ba.build_window_graph(poses, pairs_p, meas_p, infos_p)
        refined, costs = ba.refine_pose_graph_sharded(graph, mesh, args.iterations)
    else:
        refined, costs = ba.refine_pose_graph(graph, args.iterations)
    print(f"[ba_refine] cost {float(costs[0]):.4f} -> {float(costs[-1]):.6f}")

    refined_poses = np.tile(np.eye(4), (n_frames, 1, 1))
    refined_poses[:, :3, :3] = np.asarray(refined.R)
    refined_poses[:, :3, 3] = np.asarray(refined.t)

    if args.dense:
        from ..parallel.dense_ba import WindowFrames, refine_dense_window

        lvl = args.dense_level
        print(f"[ba_refine] dense refinement at pyramid level {lvl}")
        # encode every frame once; take the chosen pyramid level
        frames_feats, frames_sigmas, frames_invd, frames_K = [], [], [], []
        for i in range(n_frames):
            # use each frame paired with its successor for the two-view
            # encoder input (the encoder itself is per-frame)
            j = min(i + 1, n_frames - 1)
            it = dataset.pair_frames(i, j)
            c0 = jnp.asarray(it["color0"][None])
            c1 = jnp.asarray(it["color1"][None])
            d0 = jnp.asarray(it["depth0"][None])
            d1 = jnp.asarray(it["depth1"][None])
            Kb = jnp.asarray(it["calib"][None])
            (x0, x1, s0, s1, _, _, iv0, iv1, _, _, _) = net.apply(
                variables, c0, c1, d0, d1, None, None, None, False,
                method=LeastSquareTracking._preprocess,
            )
            frames_feats.append(x0[lvl][0])
            frames_sigmas.append(s0[lvl][0])
            frames_invd.append(iv0[lvl][0])
            from ..geometry.warp import scale_K

            frames_K.append(scale_K(Kb, lvl)[0])
        window = WindowFrames(
            feats=jnp.stack(frames_feats),
            sigmas=jnp.stack(frames_sigmas),
            invD=jnp.stack(frames_invd),
            K=jnp.stack(frames_K),
        )
        ei = jnp.asarray([p_[0] for p_ in pairs], jnp.int32)
        ej = jnp.asarray([p_[1] for p_ in pairs], jnp.int32)
        Rd, td, dcosts = refine_dense_window(
            window,
            jnp.asarray(refined_poses[:, :3, :3]),
            jnp.asarray(refined_poses[:, :3, 3]),
            ei, ej, iterations=args.dense_iterations,
        )
        print(f"[ba_refine] dense cost {float(dcosts[0]):.4f} -> {float(dcosts[-1]):.4f}")
        refined_poses[:, :3, :3] = np.asarray(Rd)
        refined_poses[:, :3, 3] = np.asarray(td)

    write_tum_trajectory(args.output, refined_poses)
    print(f"[ba_refine] wrote {args.output}")

    # GT comparison when available
    gt = None
    if hasattr(dataset, "cam_pose_seq") and dataset.cam_pose_seq:
        gt_abs = np.stack(dataset.cam_pose_seq[0][:n_frames])
        gt = np.linalg.inv(gt_abs[0])[None] @ gt_abs
        before = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        after = ate_rmse(refined_poses[:, :3, 3], gt[:, :3, 3])
        print(
            f"[ba_refine] ATE-RMSE: odometry {before * 100:.2f} cm -> "
            f"refined {after * 100:.2f} cm"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
