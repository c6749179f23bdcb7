"""Keyframe visual-odometry frontend (headless).

Rewrite of ``code/experiments/kf_vo.py`` without the trimesh/pyglet viewer:
per frame the tracker estimates the pose against the previous frame
(incremental) or against the current keyframe (keyframe mode), chains
``T_WC = T_WK @ inv(T_CK)``, emits drift warnings against GT when
available (ref kf_vo.py:172-194), and writes a TUM-format trajectory file
(``timestamp tx ty tz qx qy qz qw``) plus ATE-RMSE when ground truth
exists.

Usage::

    python -m deep_prob_feature_track_tpu.apps.kf_vo \
        --dataset TUM_RGBD --data_root ... --trajectory rgbd_dataset_freiburg1_desk \
        --vo feature --checkpoint ckpt.msgpack --vo_type keyframe
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np


def ate_rmse(est: np.ndarray, gt: np.ndarray) -> float:
    """Absolute trajectory error after Umeyama(-less) SE(3) alignment of the
    estimated positions to GT (rotation+translation, no scale)."""
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    E = est - mu_e
    G = gt - mu_g
    U, _, Vt = np.linalg.svd(E.T @ G)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = (U @ S @ Vt).T
    aligned = (R @ E.T).T + mu_g
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))


def run_vo(
    dataset,
    forward_fn,
    vo_type: str = "keyframe",
    kf_drift_warn: float = 0.02,
    kf_switch_dist: float = 0.25,
    kf_switch_angle: float = 0.35,
    verbose: bool = False,
    use_gt: bool = False,
):
    """Track a full sequence.

    Keyframe mode tracks every frame against the current keyframe and
    promotes the frame to a new keyframe when the relative motion exceeds
    ``kf_switch_dist`` (m) or ``kf_switch_angle`` (rad) — the reference
    demo keeps keyframe 0 forever (kf_vo.py / TUM get_keypair), which only
    holds up on short sequences; pass ``kf_switch_dist=inf`` to reproduce
    that behavior.

    :param dataset: test-mode dataset exposing pair_frames / __getitem__
    :param forward_fn: (color0,color1,depth0,depth1,K) -> (R [1,3,3], t [1,3])
    :param use_gt: track with the dataset's ground-truth relative poses
        instead of the network (the reference's --gt_tracker debug
        baseline, kf_vo.py:365) — the trajectory then reproduces GT
        exactly, isolating chaining/keyframe logic from tracking error
    :return: (poses_est [N,4,4] world-from-camera, poses_gt or None)
    """
    import jax.numpy as jnp

    n = (
        dataset.num_frames() if hasattr(dataset, "num_frames") else len(dataset) + 1
    )
    T_WC = np.eye(4)
    T_WK = np.eye(4)  # world-from-keyframe
    kf_idx = 0
    poses = [T_WC.copy()]
    gt_abs = [np.eye(4)]
    have_gt = True

    for i in range(1, n):
        if vo_type == "keyframe":
            # pair frame i against the current keyframe: pose[i] then
            # corresponds to frame i, aligned with incremental mode
            item = dataset.pair_frames(kf_idx, i)
        else:
            item = dataset[i - 1]
        if use_gt:
            if item.get("transform") is None:
                raise ValueError("--gt_tracker needs a dataset with GT poses")
            T_CK = np.asarray(item["transform"], np.float64)
        else:
            args = tuple(
                jnp.asarray(item[k][None])
                for k in ("color0", "color1", "depth0", "depth1", "calib")
            )
            R, t = forward_fn(*args)
            T_CK = np.eye(4)  # live-from-reference
            T_CK[:3, :3] = np.asarray(R)[0]
            T_CK[:3, 3] = np.asarray(t)[0]
        if vo_type == "keyframe":
            T_WC = T_WK @ np.linalg.inv(T_CK)
        else:
            T_WC = T_WC @ np.linalg.inv(T_CK)
        poses.append(T_WC.copy())

        transform = item.get("transform")
        if transform is None:
            have_gt = False
        elif have_gt:
            # transform chains the GT trajectory the same way as the estimate
            base = gt_abs[kf_idx] if vo_type == "keyframe" else gt_abs[-1]
            gt_abs.append(base @ np.linalg.inv(np.asarray(transform, np.float64)))
            drift = np.linalg.norm(poses[-1][:3, 3] - gt_abs[-1][:3, 3])
            if verbose and drift > kf_drift_warn:
                print(f"[kf_vo] frame {i}: drift {drift * 100:.2f}cm")

        if vo_type == "keyframe":
            trs = np.linalg.norm(T_CK[:3, 3])
            ang = np.arccos(np.clip((np.trace(T_CK[:3, :3]) - 1) / 2, -1, 1))
            if trs > kf_switch_dist or ang > kf_switch_angle:
                kf_idx = i
                T_WK = T_WC.copy()
                if verbose:
                    print(f"[kf_vo] frame {i}: new keyframe (|t|={trs:.3f}, ang={ang:.3f})")

    poses = np.stack(poses)
    gt = np.stack(gt_abs) if (have_gt and len(gt_abs) == len(poses)) else None
    return poses, gt


def write_tum_trajectory(path: str, poses: np.ndarray, timestamps=None):
    """Write poses [N,4,4] as TUM 'stamp tx ty tz qx qy qz qw' lines."""
    import jax.numpy as jnp

    from ..geometry.lie import matrix_to_quat

    quats = np.asarray(matrix_to_quat(jnp.asarray(poses[:, :3, :3])))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for i, (T, q) in enumerate(zip(poses, quats)):
            ts = timestamps[i] if timestamps is not None else float(i)
            tx, ty, tz = T[:3, 3]
            f.write(
                f"{ts} {tx:.6f} {ty:.6f} {tz:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def main(argv=None):
    p = argparse.ArgumentParser(description="Keyframe visual odometry")
    p.add_argument("--dataset", default="TUM_RGBD")
    p.add_argument("--data_root", default=None)
    p.add_argument("--trajectory", required=True)
    p.add_argument("--vo", default="feature",
                   choices=("DeepIC", "RGB", "ICP", "RGB+ICP", "feature", "feature_icp"))
    p.add_argument("--vo_type", default="incremental", choices=("incremental", "keyframe"))
    p.add_argument("--checkpoint", default="")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override any TrackerConfig field on top of --vo")
    p.add_argument("--gt_tracker", action="store_true",
                   help="track with GT relative poses instead of the network "
                        "(debug baseline, ref kf_vo.py:365)")
    p.add_argument("--image_resize", type=float, default=0.25)
    p.add_argument("--output", default="vo_trajectory.txt")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    import jax

    from ..data.loader import load_data
    from ..models.presets import apply_overrides, get_preset
    from ..models.tracker import LeastSquareTracking

    dataset = load_data(
        args.dataset, [1], "test", select_traj=args.trajectory,
        image_resize=args.image_resize, root=args.data_root,
    )
    net = LeastSquareTracking(cfg=apply_overrides(get_preset(args.vo), args.set))

    item = dataset[0]
    import jax.numpy as jnp

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
        return net.apply(variables, c0, c1, d0, d1, K, train=False)

    poses, gt = run_vo(
        dataset, forward, vo_type=args.vo_type, verbose=args.verbose,
        use_gt=args.gt_tracker,
    )
    write_tum_trajectory(args.output, poses)
    print(f"[kf_vo] wrote {len(poses)} poses to {args.output}")
    if gt is not None:
        print(f"[kf_vo] ATE-RMSE vs GT: {ate_rmse(poses[:, :3, 3], gt[:, :3, 3]) * 100:.2f} cm")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
