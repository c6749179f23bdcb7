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


def _coerce(raw: str, current, optional=False):
    """Parse a CLI string by the type of the field's current value.

    'none'/'null' clears ONLY Optional fields: several string fields use
    the literal string "None" as their sentinel (mest_type, scaler,
    uncertainty_type — matching the reference's flag values), and those
    must stay strings.
    """
    if optional and raw.lower() in ("none", "null"):
        return None
    if isinstance(current, bool):
        if raw.lower() in ("1", "true", "yes", "on"):
            return True
        if raw.lower() in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"not a boolean: {raw!r}")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        elem = type(current[0]) if current else int
        return tuple(elem(x) for x in raw.split(",") if x != "")
    if current is None:
        # Optional field with a None default (e.g. scale_scaler): numbers
        # first, string as the fallback
        for cast in (int, float):
            try:
                return cast(raw)
            except ValueError:
                pass
    return raw


def apply_overrides(cfg, pairs):
    """Apply ``key=value`` CLI overrides onto a frozen config dataclass.

    The reference exposes every architecture knob as its own argparse flag
    (code/config.py:7-103: --encoder_name, --mestimator, --solver,
    --direction, --feature_channel, --multi_hypo, ...); here the typed
    dataclass is the source of truth and any field is reachable as
    ``--set key=value`` (repeatable).  Values are coerced by the field's
    default type; tuples parse comma-separated; "none" clears Optionals.
    """
    import dataclasses

    fields = {f.name: f for f in dataclasses.fields(cfg)}
    updates = {}
    for pair in pairs or ():
        key, sep, raw = pair.partition("=")
        if not sep or key not in fields:
            raise SystemExit(
                f"--set {pair!r}: unknown field {key!r}; valid: {sorted(fields)}"
            )
        current = getattr(cfg, key)
        # annotations are strings under `from __future__ import annotations`
        optional = current is None or "Optional" in str(fields[key].type)
        try:
            updates[key] = _coerce(raw, current, optional)
        except ValueError as e:
            raise SystemExit(f"--set {pair!r}: {e}")
    return dataclasses.replace(cfg, **updates)
