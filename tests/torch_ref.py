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
        ut = types.ModuleType("torchvision.utils")
        ut.make_grid = _missing
        ut.save_image = _missing
        tv.transforms = tr
        tv.models = mo
        tv.utils = ut
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.models"] = mo
        sys.modules["torchvision.utils"] = ut
    import torch

    if not hasattr(torch.Tensor, "_dpft_rshift_patch"):
        torch.Tensor.__rshift__ = lambda self, n: self / (2**n)
        torch.Tensor._dpft_rshift_patch = True
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    _patch_ufc_forward()
    _patch_inverse_jacobians()


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


def _patch_inverse_jacobians():
    """The reference mutates split views in place (``squeeze_`` on the
    outputs of ``split``, algorithms.py:873-875), which modern torch
    autograd rejects — the reference cannot TRAIN as shipped.  Rebind the
    method with out-of-place indexing; the math is unchanged
    (J = -∇f0/σ - r·σ0·∇σ0/σ³ chained through the warping Jacobian and
    negated for the inverse direction, algorithms.py:867-886)."""
    import models.algorithms as ref_alg

    cls = ref_alg.TrustRegionInverseWUncertainty
    if getattr(cls, "_dpft_train_patch", False):
        return

    def compose_inverse_jacobians(self, res, sigma, sigma0, grad_f0,
                                  grad_sigma0, Jx_p, Jy_p):
        B, C, H, W = sigma0.shape
        res_e = res.unsqueeze(2)
        sig_e = sigma.unsqueeze(2)
        sig0_e = sigma0.unsqueeze(2)
        J_crd = -grad_f0 / sig_e - res_e * (sig0_e * grad_sigma0 / sig_e ** 3)
        J_p = ref_alg.compute_jacobian_dIdp(
            J_crd[:, :, 0], J_crd[:, :, 1], Jx_p, Jy_p
        )
        J_rot, J_trs = J_p.view(B, C, H, W, 6).split(3, dim=-1)
        J_trs = J_trs.permute(0, 1, 4, 2, 3)
        J_rot = J_rot.permute(0, 1, 4, 2, 3)
        J_p = (-J_p).view(B, C, -1, 6)
        return J_p, J_trs, J_rot

    cls.compose_inverse_jacobians = compose_inverse_jacobians
    cls._dpft_train_patch = True


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
