"""Helpers to load the reference PyTorch implementation for parity tests.

The reference needs two environment patches to run on modern torch:
a torchvision import stub (only imported, never executed in the forward
path) and ``Tensor.__rshift__`` (float bit-shift, removed from torch; the
reference halves intrinsics with ``K >> level``).
"""

import sys
import types

_REF = "/root/reference/code"


def install_reference():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        tr = types.ModuleType("torchvision.transforms")
        mo = types.ModuleType("torchvision.models")

        def _missing(*a, **k):
            raise RuntimeError("torchvision stub")

        tr.Normalize = _missing
        tr.Compose = _missing
        tr.ToTensor = _missing
        tv.transforms = tr
        tv.models = mo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.models"] = mo
    import torch

    if not hasattr(torch.Tensor, "_dpft_rshift_patch"):
        torch.Tensor.__rshift__ = lambda self, n: self / (2**n)
        torch.Tensor._dpft_rshift_patch = True
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    _patch_ufc_forward()


def _patch_ufc_forward():
    """The reference facade unconditionally passes ``obj_mask1=`` to
    TrustRegionWUncertainty.forward (LeastSquareTracking.py:351-354), whose
    signature (algorithms.py:1022) has no such kwarg — the U_FC facade path
    crashes as shipped.  Accept-and-ignore it so the path executes; the mask
    is None in our parity tests, matching the reference's (mask-free)
    numerical behavior."""
    import models.algorithms as ref_alg

    cls = ref_alg.TrustRegionWUncertainty
    if getattr(cls, "_dpft_mask_patch", False):
        return
    orig = cls.forward

    def forward(self, *args, obj_mask1=None, **kwargs):
        return orig(self, *args, **kwargs)

    cls.forward = forward
    cls._dpft_mask_patch = True


def reference_options(**overrides):
    """The option namespace the reference facade expects."""
    opts = types.SimpleNamespace(
        vis_feat=False,
        train_uncer_prop=False,
        combine_ICP=False,
        feature_extract="conv",
        feature_channel=8,
        uncertainty_channel=1,
        scaler="None",
        remove_tru_sigma=True,
        init_pose="sfm_net",
        train_init_pose=False,
        scale_init_pose=0.01,
        multi_hypo="prob_fuse",
        res_input=False,
        checkpoint="",
    )
    for k, v in overrides.items():
        setattr(opts, k, v)
    return opts
