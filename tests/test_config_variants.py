"""Coverage for less-common configuration variants."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_prob_feature_track_tpu.models.encoder import FeaturePyramid
from deep_prob_feature_track_tpu.models.presets import get_preset
from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking


@pytest.mark.parametrize("feature_extract", ["conv", "1by1", "average", "skip", "prob_fuse"])
def test_encoder_feature_heads(rng, feature_extract):
    fc = 1 if feature_extract in ("average", "prob_fuse") else 4
    net = FeaturePyramid(
        feature_channel=fc,
        uncertainty_channel=1,
        feature_extract=feature_extract,
        uncertainty_type="laplacian",
    )
    x = jnp.asarray(rng.randn(1, 8, 16, 20).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    f, s, raw = net.apply(v, x, train=False)
    assert len(f) == 4
    expect_c = {"conv": fc, "1by1": fc, "average": 1, "prob_fuse": 1, "skip": 32}
    assert f[0].shape[1] == expect_c[feature_extract]
    if feature_extract != "skip":
        assert s[0].shape == f[0].shape


@pytest.mark.parametrize(
    "uncertainty_type",
    ["identity", "sigmoid", "gaussian", "laplacian", "old_gaussian", "feature"],
)
def test_encoder_uncertainty_types(rng, uncertainty_type):
    net = FeaturePyramid(
        feature_channel=4,
        uncertainty_channel=4 if uncertainty_type == "feature" else 1,
        feature_extract="conv",
        uncertainty_type=uncertainty_type,
    )
    x = jnp.asarray(rng.randn(1, 8, 16, 20).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    f, s, raw = net.apply(v, x, train=False)
    assert s[0] is not None
    assert np.all(np.isfinite(np.asarray(s[0])))
    if uncertainty_type in ("gaussian", "laplacian", "old_gaussian"):
        assert np.all(np.asarray(s[0]) > 0)
    if uncertainty_type == "sigmoid":
        assert np.all((np.asarray(s[0]) >= 0) & (np.asarray(s[0]) <= 1))
    if uncertainty_type == "identity":
        np.testing.assert_allclose(np.asarray(s[0]), 1.0)


def test_no_weight_sharing(rng):
    cfg = dataclasses.replace(
        get_preset("DeepIC"), no_weight_sharing=True, init_pose_type="identity"
    )
    net = LeastSquareTracking(cfg=cfg)
    B, H, W = 1, 32, 40
    args = (
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray([[26.0, 26.0, 19.5, 15.5]], jnp.float32),
    )
    v = net.init(jax.random.PRNGKey(0), *args, train=False)
    # four independent per-level instances of the M-estimator & damping nets
    assert "mests_3" in v["params"]
    assert "damping_nets_3" in v["params"]
    R, t = net.apply(v, *args, train=False)
    assert np.all(np.isfinite(np.asarray(t)))


def test_conv_rgbd_one_view_encoder(rng):
    cfg = dataclasses.replace(
        get_preset("feature"), encoder_name="ConvRGBD",
        init_pose_type="identity", train_init_pose=False,
    )
    net = LeastSquareTracking(cfg=cfg)
    B, H, W = 1, 32, 40
    args = (
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray([[26.0, 26.0, 19.5, 15.5]], jnp.float32),
    )
    v = net.init(jax.random.PRNGKey(0), *args, train=False)
    R, t = net.apply(v, *args, train=False)
    assert np.all(np.isfinite(np.asarray(t)))


def test_dense_net_pose_initializer(rng):
    cfg = dataclasses.replace(get_preset("feature"), init_pose_type="dense_net")
    net = LeastSquareTracking(cfg=cfg)
    B, H, W = 1, 32, 40
    args = (
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray([[26.0, 26.0, 19.5, 15.5]], jnp.float32),
    )
    v = net.init(jax.random.PRNGKey(0), *args, train=False)
    R, t = net.apply(v, *args, train=False)
    assert np.all(np.isfinite(np.asarray(t)))


def test_apply_overrides_coercion():
    """--set key=value overrides coerce by field type and reject unknowns
    (the reference's per-knob argparse surface, code/config.py:7-103)."""
    from deep_prob_feature_track_tpu.models.presets import apply_overrides
    from deep_prob_feature_track_tpu.training.train import TrainConfig

    cfg = get_preset("feature")
    out = apply_overrides(
        cfg,
        [
            "feature_channel=4",
            "combine_icp=true",
            "scale_icp=0.5",
            "encoder_name=ConvRGBD",
            "scale_scaler=none",
        ],
    )
    assert out.feature_channel == 4 and isinstance(out.feature_channel, int)
    assert out.combine_icp is True
    assert out.scale_icp == 0.5
    assert out.encoder_name == "ConvRGBD"
    assert out.scale_scaler is None
    # untouched fields keep the preset values
    assert out.uncertainty_type == cfg.uncertainty_type

    # string fields whose sentinel is the literal "None" stay strings
    out2 = apply_overrides(cfg, ["mest_type=None", "scaler=None"])
    assert out2.mest_type == "None" and out2.scaler == "None"
    # Optional fields clear via 'none' even when the preset set a value
    icp = apply_overrides(get_preset("feature_icp"), ["scale_scaler=none"])
    assert icp.scale_scaler is None

    tcfg = apply_overrides(TrainConfig(), ["lr_decay_epochs=3,7", "opt=sgd"])
    assert tcfg.lr_decay_epochs == (3, 7)
    assert tcfg.opt == "sgd"

    with pytest.raises(SystemExit):
        apply_overrides(cfg, ["not_a_field=1"])
    with pytest.raises(SystemExit):
        apply_overrides(cfg, ["combine_icp=maybe"])
    with pytest.raises(SystemExit):
        apply_overrides(cfg, ["no_equals_sign"])
