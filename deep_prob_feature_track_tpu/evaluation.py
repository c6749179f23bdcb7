"""Batched two-view evaluation pipeline and per-trajectory reporting.

TPU-native rewrite of ``code/evaluate.py``: per-(trajectory x keyframe)
loaders, a jitted no-grad forward accumulating R/t/EPE3D/RPE arrays, and the
pandas summary with the reference's exact unit conversions (EPE/trans x100
-> cm, angle x180/pi -> deg; evaluate.py:344-372) plus per-keyframe mean
rows over trajectories and frames.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from . import losses
from .data.pipeline import BatchLoader
from .data.tum_dicts import EVAL_TRAJECTORIES

# structure/texture subsets of the TUM test scenes (ref evaluate.py:58-89)
SUBSET_TRAJECTORIES = {
    "nostructure": [
        "rgbd_dataset_freiburg3_nostructure_notexture_far",
        "rgbd_dataset_freiburg3_nostructure_notexture_near_withloop",
        "rgbd_dataset_freiburg3_nostructure_texture_far",
        "rgbd_dataset_freiburg3_nostructure_texture_near_withloop",
    ],
    "notexture": [
        "rgbd_dataset_freiburg3_nostructure_notexture_far",
        "rgbd_dataset_freiburg3_nostructure_notexture_near_withloop",
        "rgbd_dataset_freiburg3_structure_notexture_near",
    ],
    "structure_texture": [
        "rgbd_dataset_freiburg3_structure_texture_far",
        "rgbd_dataset_freiburg3_structure_texture_near",
    ],
}


def eval_trajectories(dataset: str, trajectory: str = "") -> List[str]:
    if trajectory == "":
        if dataset not in EVAL_TRAJECTORIES:
            raise ValueError(
                f"{dataset} has no default eval trajectories; pass --trajectory"
            )
        return EVAL_TRAJECTORIES[dataset]
    if trajectory in SUBSET_TRAJECTORIES:
        return SUBSET_TRAJECTORIES[trajectory]
    return [trajectory]


def create_eval_loaders(
    dataset: str,
    eval_type: str,
    keyframes: Sequence[int],
    batch_size: int = 8,
    trajectory: str = "",
    image_resize: float = 0.25,
    root: Optional[str] = None,
) -> Dict[str, BatchLoader]:
    """One loader per (trajectory x keyframe) (ref evaluate.py:92-121)."""
    from .data.loader import load_data

    loaders = {}
    for traj in eval_trajectories(dataset, trajectory):
        for kf in keyframes:
            ds = load_data(
                dataset, [kf], eval_type, select_traj=traj,
                image_resize=image_resize, root=root,
            )
            loaders[f"{traj}_keyframe_{kf}"] = BatchLoader(
                ds, batch_size=batch_size, shuffle=False
            )
    return loaders


def evaluate_two_view(
    loader: BatchLoader,
    forward_fn: Callable,
    objectives: Sequence[str] = ("EPE3D", "RPE"),
    has_mask: bool = False,
    obj_only: bool = False,
    timers=None,
    sharding=None,
) -> Dict[str, np.ndarray]:
    """Two-view eval loop (ref evaluate.py:123-226).

    :param forward_fn: jitted ``(color0, color1, depth0, depth1, K[,
        mask0, mask1]) -> (R, t)``
    :param sharding: optional NamedSharding for the batch inputs
        (parallel.mesh.batch_sharding) — device-puts every array with it,
        so the jitted forward runs SPMD over the mesh (multi-chip eval)
    :return: dict of per-frame arrays (R_est, t_est, epes, angular_error,
        translation_error, names)
    """
    import jax
    import jax.numpy as jnp

    def dev(x):
        arr = jnp.asarray(x)
        return jax.device_put(arr, sharding) if sharding is not None else arr

    out = {"R_est": [], "t_est": [], "names": []}
    if "EPE3D" in objectives:
        out["epes"] = []
    if "RPE" in objectives:
        out["angular_error"] = []
        out["translation_error"] = []

    for batch in loader:
        if timers:
            timers.tic("forward step")
        args = [
            dev(batch[k]) for k in ("color0", "color1", "depth0", "depth1", "calib")
        ]
        kwargs = {}
        if has_mask and obj_only:
            kwargs = {
                "obj_mask0": dev(batch["obj_mask0"]),
                "obj_mask1": dev(batch["obj_mask1"]),
            }
        R, t = forward_fn(*args, **kwargs)
        if timers:
            timers.toc("forward step")

        if timers:
            timers.tic("evaluate")
        mask = batch["pad_mask"]
        out["R_est"].append(np.asarray(R)[mask])
        out["t_est"].append(np.asarray(t)[mask])
        if "transform" not in batch:
            # no ground truth (e.g. VaryLighting): poses only, no metrics
            objectives = ()
        else:
            Rt = jnp.asarray(batch["transform"])
            R_gt, t_gt = Rt[:, :3, :3], Rt[:, :3, 3]
        if "RPE" in objectives:
            ang, trs = losses.compute_rpe_error(R, t, R_gt, t_gt)
            out["angular_error"].append(np.asarray(ang)[mask])
            out["translation_error"].append(np.asarray(trs)[mask])
        if "EPE3D" in objectives:
            depth0 = jnp.asarray(batch["depth0"])
            invalid = (depth0 == depth0.min()) | (depth0 == depth0.max())
            if has_mask and "obj_mask0" in batch:
                invalid = invalid | ~jnp.asarray(batch["obj_mask0"])
            epes = losses.compute_rt_epe_loss(
                R, t, R_gt, t_gt, depth0, jnp.asarray(batch["calib"]), invalid=invalid
            )
            out["epes"].append(np.asarray(epes)[mask])
        names = batch.get("name", [])
        out["names"] += [n for n, m in zip(names, mask) if m]
        if timers:
            timers.toc("evaluate")

    # GT-less datasets (e.g. VaryLighting, ref VaryLighting.py: transform is
    # None) never fill the metric lists — drop those keys entirely so
    # downstream reporting can detect "poses only" instead of crashing on
    # empty arrays
    for key in ("epes", "angular_error", "translation_error"):
        if key in out and not out[key]:
            del out[key]
    return {
        k: (np.concatenate(v) if v and isinstance(v[0], np.ndarray) else v)
        for k, v in out.items()
    }


def summarize_results(
    per_loader: Dict[str, Dict[str, np.ndarray]],
    keyframes: Sequence[int],
    output_csv: Optional[str] = None,
    dump_dir: Optional[str] = None,
):
    """Build the per-trajectory table + per-keyframe means, cm/deg units.

    Reference: evaluate.py:318-372.
    :return: pandas DataFrame
    """
    import pandas as pd

    rows = {}
    for key, info in per_loader.items():
        traj, kf = key.split("_keyframe_")
        # GT-less runs have no metric arrays: report NaN metrics but keep
        # the row (frame counts + pose pickles still matter)
        has_gt = "epes" in info
        rows[key] = pd.Series(
            [
                float(info["epes"].mean()) if has_gt else float("nan"),
                float(info["angular_error"].mean()) if has_gt else float("nan"),
                float(info["translation_error"].mean()) if has_gt else float("nan"),
                int(info["R_est"].shape[0]),
                int(kf),
                traj,
            ],
            index=["3D EPE", "axis error", "trans error", "total frames", "keyframe", "trajectory"],
        )
        if dump_dir:
            os.makedirs(dump_dir, exist_ok=True)
            with open(os.path.join(dump_dir, key + ".pkl"), "wb") as f:
                pickle.dump(info, f)

    df = pd.DataFrame(rows).T
    df["3D EPE"] = df["3D EPE"] * 100.0  # -> cm
    df["axis error"] = df["axis error"] * (180.0 / np.pi)  # -> deg
    df["trans error"] = df["trans error"] * 100.0  # -> cm

    stats = {}
    for kf in keyframes:
        sub = df[df["keyframe"] == kf]
        if len(sub) == 0:
            continue
        stats[f"mean values of trajectories keyframe {kf}"] = pd.Series(
            [sub["3D EPE"].mean(), sub["axis error"].mean(), sub["trans error"].mean(), kf],
            index=["3D EPE", "axis error", "trans error", "keyframe"],
        )
        total = sub["total frames"].sum()
        stats[f"mean values of frames keyframe {kf}"] = pd.Series(
            [
                (sub["3D EPE"] * sub["total frames"]).sum() / total,
                (sub["axis error"] * sub["total frames"]).sum() / total,
                (sub["trans error"] * sub["total frames"]).sum() / total,
                kf,
            ],
            index=["3D EPE", "axis error", "trans error", "keyframe"],
        )
    final = pd.concat([df, pd.DataFrame(stats).T], sort=False)
    if output_csv:
        os.makedirs(os.path.dirname(os.path.abspath(output_csv)), exist_ok=True)
        final.to_csv(output_csv)
    return final
