"""Import reference PyTorch checkpoints into the flax parameter tree.

Maps the reference's ``state_dict`` naming (code/models/algorithms.py /
LeastSquareTracking.py module layout) onto this framework's flax variables
so pretrained reference checkpoints (e.g. ``checkpoint_epoch29.pth.tar``)
reproduce trajectories without retraining.  Layout conversions:

* Conv2d ``(O,I,kH,kW)`` -> flax kernel ``(kH,kW,I,O)``
* Conv1d ``(O,I,k)`` -> ``(k,I,O)``
* Linear ``(O,I)`` -> ``(I,O)``
* BatchNorm weight/bias -> scale/bias (params); running_mean/var ->
  mean/var (batch_stats)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_convblock(prefix: Tuple[str, ...], sub: str, leaf: str, value, out):
    """torch convLayer Sequential(Conv2d, BN, ELU) -> ConvBlock."""
    if sub == "0":  # Conv2d
        if leaf == "weight":
            _set(out["params"], prefix + ("Conv_0", "kernel"), _conv2d_kernel(value))
        else:
            _set(out["params"], prefix + ("Conv_0", "bias"), value)
    elif sub == "1":  # BatchNorm
        if leaf in _BN_PARAM:
            _set(out["params"], prefix + ("BatchNorm_0", _BN_PARAM[leaf]), value)
        elif leaf in _BN_STATS:
            _set(out["batch_stats"], prefix + ("BatchNorm_0", _BN_STATS[leaf]), value)


def _map_conv1dblock(prefix, sub, leaf, value, out):
    if sub == "0":
        if leaf == "weight":
            _set(out["params"], prefix + ("Conv_0", "kernel"), _conv1d_kernel(value))
        else:
            _set(out["params"], prefix + ("Conv_0", "bias"), value)
    elif sub == "1":
        if leaf in _BN_PARAM:
            _set(out["params"], prefix + ("BatchNorm_0", _BN_PARAM[leaf]), value)
        elif leaf in _BN_STATS:
            _set(out["batch_stats"], prefix + ("BatchNorm_0", _BN_STATS[leaf]), value)


def convert_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Convert a reference ``state_dict`` (torch tensors or numpy arrays)
    into ``{'params': ..., 'batch_stats': ...}``.

    Unrecognized keys are collected under ``'unmapped'`` so callers can
    assert completeness.
    """
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}, "unmapped": {}}
    for name, tensor in state_dict.items():
        # copy=True: torch's .numpy() returns a VIEW of the tensor's
        # memory — without the copy, in-place updates to a live source
        # module (e.g. optimizer steps) would silently mutate the
        # "converted" weights afterwards
        v = np.array(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor,
            copy=True,
        )
        if name.endswith("num_batches_tracked"):
            continue
        name = _canonical_name(name, state_dict)
        if name is None:
            continue
        if not _map_key(name, v, out):
            out["unmapped"][name] = v.shape
    return out


# The reference registers each DeepRobustEstimator / DirectSolverNet twice:
# directly on the facade (mEst_func{i} / solver_func{i},
# ref LeastSquareTracking.py:163-189) AND inside each TrustRegion module
# (tr_update{i}.mEstimator / .directSolver, ref algorithms.py:41-42), so the
# state_dict holds two names for the same tensors.  We map the facade name and
# drop the alias — unless the primary is somehow absent, in which case the
# alias is remapped onto the per-level primary name.
_ALIAS = re.compile(r"tr_update(\d)\.(mEstimator|directSolver)\.(.+)$")
_ALIAS_PRIMARY = {"mEstimator": "mEst_func", "directSolver": "solver_func"}


def _canonical_name(name: str, state_dict: Dict[str, Any]):
    m = _ALIAS.match(name)
    if not m:
        return name
    idx, kind, rest = m.groups()
    base = _ALIAS_PRIMARY[kind]
    for primary in (f"{base}{idx}.{rest}", f"{base}.{rest}"):
        if primary in state_dict:
            return None  # duplicate of an already-mapped facade registration
    return f"{base}{idx}.{rest}"


def _map_key(name: str, v: np.ndarray, out) -> bool:
    # ---------------- encoder ----------------
    m = re.match(r"encoder\.net(\d)\.(\d)\.(\d)\.(\w+)$", name)
    if m:
        stage, block, sub, leaf = m.groups()
        _map_convblock(("encoder", f"net{stage}", f"ConvBlock_{block}"), sub, leaf, v, out)
        return True
    # feature heads: conv/prob_fuse style (Sequential(Conv2d, BN, ELU))
    m = re.match(r"encoder\.f_conv(\d)\.(\d)\.(\w+)$", name)
    if m:
        i, sub, leaf = m.groups()
        _map_convblock(("encoder", f"f_heads_{i}"), sub, leaf, v, out)
        return True
    # feature heads: 1by1 (plain Conv2d)
    m = re.match(r"encoder\.f_conv(\d)\.(weight|bias)$", name)
    if m:
        i, leaf = m.groups()
        key = "kernel" if leaf == "weight" else "bias"
        val = _conv2d_kernel(v) if leaf == "weight" else v
        _set(out["params"], ("encoder", f"f_heads_{i}", key), val)
        return True
    # uncertainty heads: Sequential(convLayer, Conv2d)
    m = re.match(r"encoder\.sigma_conv(\d)\.0\.(\d)\.(\w+)$", name)
    if m:
        i, sub, leaf = m.groups()
        _map_convblock(("encoder", f"s_heads_{i}_0"), sub, leaf, v, out)
        return True
    m = re.match(r"encoder\.sigma_conv(\d)\.1\.(weight|bias)$", name)
    if m:
        i, leaf = m.groups()
        key = "kernel" if leaf == "weight" else "bias"
        val = _conv2d_kernel(v) if leaf == "weight" else v
        _set(out["params"], ("encoder", f"s_heads_{i}_1", key), val)
        return True
    # uncertainty heads: 'feature' type (single convLayer)
    m = re.match(r"encoder\.sigma_conv(\d)\.(\d)\.(\w+)$", name)
    if m:
        i, sub, leaf = m.groups()
        _map_convblock(("encoder", f"s_heads_{i}_0"), sub, leaf, v, out)
        return True

    # ---------------- SFM pose predictor ----------------
    m = re.match(r"pose_predictor\.net\.(\d)\.(\d)\.(\w+)$", name)
    if m:
        block, sub, leaf = m.groups()
        _map_convblock(("pose_predictor", f"ConvBlock_{block}"), sub, leaf, v, out)
        return True
    m = re.match(r"pose_predictor\.final_layer\.0\.(\d)\.(\w+)$", name)
    if m:
        sub, leaf = m.groups()
        _map_conv1dblock(("pose_predictor", "Conv1dBlock_0"), sub, leaf, v, out)
        return True
    m = re.match(r"pose_predictor\.final_layer\.1\.(weight|bias)$", name)
    if m:
        leaf = m.group(1)
        key = "kernel" if leaf == "weight" else "bias"
        val = _conv1d_kernel(v) if leaf == "weight" else v
        _set(out["params"], ("pose_predictor", "Conv_0", key), val)
        return True
    # multi_hypo='None': final_layer is a plain Conv2d
    m = re.match(r"pose_predictor\.final_layer\.(weight|bias)$", name)
    if m:
        leaf = m.group(1)
        key = "kernel" if leaf == "weight" else "bias"
        val = _conv2d_kernel(v) if leaf == "weight" else v
        _set(out["params"], ("pose_predictor", "Conv_0", key), val)
        return True

    # ---------------- M-estimator ----------------
    m = re.match(r"mEst_func(\d?)\.net\.(\d)\.(\d)\.(\w+)$", name)
    if m:
        inst, block, sub, leaf = m.groups()
        idx = inst if inst else "0"
        _map_convblock((f"mests_{idx}", f"ConvBlock_{block}"), sub, leaf, v, out)
        return True

    # ---------------- ScaleNet ----------------
    m = re.match(r"scaler_func(\d?)\.net\.([0-3])\.(\d)\.(\w+)$", name)
    if m:
        inst, block, sub, leaf = m.groups()
        idx = inst if inst else "0"
        _map_convblock((f"scalers_{idx}", f"ConvBlock_{block}"), sub, leaf, v, out)
        return True
    m = re.match(r"scaler_func(\d?)\.net\.4\.(weight|bias)$", name)
    if m:
        inst, leaf = m.groups()
        idx = inst if inst else "0"
        key = "kernel" if leaf == "weight" else "bias"
        val = _conv2d_kernel(v) if leaf == "weight" else v
        _set(out["params"], (f"scalers_{idx}", "Conv_0", key), val)
        return True

    # ---------------- damping regressor ----------------
    m = re.match(r"solver_func(\d?)\.net\.(\d)\.0\.(weight|bias)$", name)
    if m:
        inst, block, leaf = m.groups()
        idx = inst if inst else "0"
        key = "kernel" if leaf == "weight" else "bias"
        val = _linear_kernel(v) if leaf == "weight" else v
        _set(
            out["params"],
            (f"damping_nets_{idx}", f"FcRelu_{block}", "Dense_0", key),
            val,
        )
        return True
    return False


def load_torch_checkpoint(path: str) -> Dict[str, Dict]:
    """Load a reference ``.pth.tar`` checkpoint file and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    # strip DataParallel 'module.' prefixes (ref Logger.py:110-115)
    state = {k[len("module.") :] if k.startswith("module.") else k: v for k, v in state.items()}
    return convert_state_dict(state)


def merge_into_variables(variables: Dict, converted: Dict) -> Dict:
    """Overlay converted weights onto an initialized variables dict,
    validating that every mapped leaf exists with a matching shape."""
    import jax

    def overlay(base, new, path=""):
        out = dict(base)
        for k, v in new.items():
            if isinstance(v, dict):
                if k not in out:
                    raise KeyError(f"converted branch {path}/{k} missing in model")
                out[k] = overlay(out[k], v, f"{path}/{k}")
            else:
                if k not in out:
                    raise KeyError(f"converted leaf {path}/{k} missing in model")
                if tuple(np.shape(out[k])) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: model {np.shape(out[k])} "
                        f"vs checkpoint {v.shape}"
                    )
                out[k] = jax.numpy.asarray(v)
        return out

    merged = dict(variables)
    for coll in ("params", "batch_stats"):
        if converted.get(coll):
            merged[coll] = overlay(variables.get(coll, {}), converted[coll], coll)
    return merged
