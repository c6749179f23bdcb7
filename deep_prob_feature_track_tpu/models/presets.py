"""Canonical tracker presets (the reference's ``select_method`` factory).

Reference: code/experiments/select_method.py:11-181 — six tracker
configurations used across the VO / convergence-basin / object studies.
"""

from __future__ import annotations

from .tracker import TrackerConfig

PRESETS = {
    # DeeperIC baseline: 1-ch averaged features, conv M-estimator,
    # residual-volume damping, no uncertainty, identity init
    "DeepIC": TrackerConfig(
        encoder_name="ConvRGBD2",
        direction="inverse",
        mest_type="MultiScale2w",
        solver_type="Direct-ResVol",
        feature_channel=1,
        feature_extract="average",
        uncertainty_type="None",
        combine_icp=False,
        scaler="None",
        init_pose_type="identity",
        train_init_pose=False,
        remove_tru_sigma=False,
    ),
    # plain photometric Gauss-Newton on grayscale
    "RGB": TrackerConfig(
        encoder_name="RGB",
        uncertainty_type="None",
        direction="inverse",
        mest_type="None",
        solver_type="Direct-Nodamping",
        feature_channel=1,
        combine_icp=False,
        scaler="None",
        init_pose_type="identity",
        train_init_pose=False,
        remove_tru_sigma=False,
    ),
    # stand-alone inverse point-to-plane ICP
    "ICP": TrackerConfig(
        encoder_name="ICP",
        uncertainty_type="ICP",
        direction="inverse",
        mest_type="None",
        solver_type="Direct-Nodamping",
        combine_icp=False,
        scaler="None",
        init_pose_type="identity",
        train_init_pose=False,
        remove_tru_sigma=False,
    ),
    # photometric + ICP with fixed 0.2 scale
    "RGB+ICP": TrackerConfig(
        encoder_name="RGB",
        uncertainty_type="identity",
        direction="inverse",
        mest_type="None",
        solver_type="Direct-Nodamping",
        uncertainty_channel=1,
        combine_icp=True,
        scaler="None",
        scale_scaler=0.2,
        init_pose_type="identity",
        train_init_pose=False,
        remove_tru_sigma=False,
    ),
    # the paper model (scripts/eval_tum_rgbd.sh)
    "feature": TrackerConfig(
        encoder_name="ConvRGBD2",
        uncertainty_type="laplacian",
        direction="inverse",
        mest_type="None",
        solver_type="Direct-Nodamping",
        feature_channel=8,
        uncertainty_channel=1,
        feature_extract="conv",
        combine_icp=False,
        remove_tru_sigma=True,
        init_pose_type="sfm_net",
        train_init_pose=True,
        multi_hypo="prob_fuse",
    ),
    # paper model + fused ICP term (scripts/eval_tum_feature_icp.sh)
    "feature_icp": TrackerConfig(
        encoder_name="ConvRGBD2",
        uncertainty_type="laplacian",
        direction="inverse",
        mest_type="None",
        solver_type="Direct-Nodamping",
        feature_channel=8,
        uncertainty_channel=1,
        feature_extract="conv",
        combine_icp=True,
        scale_scaler=0.01,  # options.scale_icp default
        remove_tru_sigma=True,
        init_pose_type="sfm_net",
        train_init_pose=True,
        multi_hypo="prob_fuse",
    ),
}


def get_preset(name: str) -> TrackerConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; choose from {sorted(PRESETS)}")
    return PRESETS[name]
