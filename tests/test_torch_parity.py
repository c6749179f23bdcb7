"""Numerical parity against the reference PyTorch implementation.

These tests instantiate the ACTUAL reference networks (randomly
initialized), import their state_dicts through the checkpoint converter,
and require the flax modules to reproduce the torch outputs — validating
layer layouts, padding, BN semantics and the checkpoint import path in one
shot.  This is the guarantee that real pretrained reference checkpoints
will reproduce trajectories.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_ref import install_reference, reference_options  # noqa: E402

install_reference()


@pytest.fixture(scope="module")
def ref_modules():
    import models.algorithms as ref_alg  # reference code

    return ref_alg


def _to_jax_variables(net_torch, flax_net, example_args, prefix_map=None):
    from deep_prob_feature_track_tpu.models.import_torch import (
        convert_state_dict,
        merge_into_variables,
    )

    sd = net_torch.state_dict()
    if prefix_map:
        sd = {prefix_map + k: v for k, v in sd.items()}
    converted = convert_state_dict(sd)
    assert not converted["unmapped"], f"unmapped keys: {converted['unmapped']}"
    if prefix_map:
        # standalone-module test: descend into the facade-level branch
        branch = prefix_map.rstrip(".")
        converted = {
            coll: tree.get(branch, {}) for coll, tree in converted.items() if coll != "unmapped"
        }
    variables = flax_net.init(jax.random.PRNGKey(0), *example_args, train=False)
    return merge_into_variables(variables, converted)


def test_encoder_parity(rng, ref_modules):
    """FeaturePyramid: same weights -> same features/sigmas (paper config)."""
    torch.manual_seed(0)
    ref = ref_modules.FeaturePyramid(
        D=8, w_uncertainty="laplacian", feature_channel=8,
        feature_extract="conv", uncertainty_channel=1,
    )
    ref.eval()

    from deep_prob_feature_track_tpu.models.encoder import FeaturePyramid

    ours = FeaturePyramid(
        feature_channel=8, uncertainty_channel=1,
        feature_extract="conv", uncertainty_type="laplacian",
    )
    x = rng.randn(2, 8, 32, 40).astype(np.float32)
    variables = _to_jax_variables(ref, ours, (jnp.asarray(x),), prefix_map="encoder.")

    with torch.no_grad():
        f_ref, s_ref, raw_ref = ref(torch.from_numpy(x))
    f_j, s_j, raw_j = ours.apply(variables, jnp.asarray(x), train=False)

    for lvl in range(4):
        np.testing.assert_allclose(
            np.asarray(f_j[lvl]), f_ref[lvl].numpy(), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(s_j[lvl]), s_ref[lvl].numpy(), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(raw_j[lvl]), raw_ref[lvl].numpy(), atol=2e-4, rtol=1e-3
        )


def test_sfm_posenet_parity(rng, ref_modules):
    torch.manual_seed(1)
    ref = ref_modules.SFMPoseNet(scale_motion=0.01, multi_hypo="prob_fuse")
    ref.eval()

    from deep_prob_feature_track_tpu.models.nets import SFMPoseNet

    ours = SFMPoseNet(scale_motion=0.01, multi_hypo="prob_fuse")
    x0 = rng.randn(2, 128, 4, 5).astype(np.float32)
    x1 = rng.randn(2, 128, 4, 5).astype(np.float32)
    variables = _to_jax_variables(
        ref, ours, (jnp.asarray(x0), jnp.asarray(x1)), prefix_map="pose_predictor."
    )
    with torch.no_grad():
        R_ref, t_ref = ref(torch.from_numpy(x0), torch.from_numpy(x1))
    R_j, t_j = ours.apply(variables, jnp.asarray(x0), jnp.asarray(x1), train=False)
    np.testing.assert_allclose(np.asarray(R_j), R_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_j), t_ref.numpy(), atol=1e-6)


def test_full_tracker_parity(rng, ref_modules):
    """Full facade parity: reference LeastSquareTracking vs ours with
    imported weights on the same RGB-D pair (feature preset, identity init
    to isolate the solver path, then sfm_net init)."""
    import models.LeastSquareTracking as ref_track

    for init_pose in ("identity", "sfm_net"):
        torch.manual_seed(2)
        opts = reference_options(init_pose=init_pose)
        ref = ref_track.LeastSquareTracking(
            encoder_name="ConvRGBD2",
            uncertainty_type="laplacian",
            max_iter_per_pyr=3,
            mEst_type="None",
            solver_type="Direct-Nodamping",
            direction="inverse",
            options=opts,
        )
        ref.eval()

        import dataclasses

        from deep_prob_feature_track_tpu.models.presets import get_preset
        from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking

        cfg = dataclasses.replace(
            get_preset("feature"), init_pose_type=init_pose, train_init_pose=False
        )
        ours = LeastSquareTracking(cfg=cfg)

        B, H, W = 2, 32, 40
        img0 = rng.rand(B, 3, H, W).astype(np.float32)
        img1 = rng.rand(B, 3, H, W).astype(np.float32)
        depth0 = rng.uniform(0.6, 3.0, (B, 1, H, W)).astype(np.float32)
        depth1 = rng.uniform(0.6, 3.0, (B, 1, H, W)).astype(np.float32)
        K = np.tile([[26.0, 26.0, (W - 1) / 2.0, (H - 1) / 2.0]], (B, 1)).astype(
            np.float32
        )
        args = tuple(jnp.asarray(a) for a in (img0, img1, depth0, depth1, K))
        variables = _to_jax_variables(ref, ours, args)

        with torch.no_grad():
            R_ref, t_ref = ref(
                *(torch.from_numpy(a) for a in (img0, img1, depth0, depth1, K))
            )
        R_j, t_j = ours.apply(variables, *args, train=False)
        np.testing.assert_allclose(
            np.asarray(R_j), R_ref.numpy(), atol=5e-4,
            err_msg=f"init_pose={init_pose}",
        )
        np.testing.assert_allclose(
            np.asarray(t_j), t_ref.numpy().reshape(B, 3), atol=5e-4,
            err_msg=f"init_pose={init_pose}",
        )
