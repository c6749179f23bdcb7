"""Criterion tests (EPE3D / RPE / uncertainty losses)."""

import numpy as np
import jax.numpy as jnp

from deep_prob_feature_track_tpu import losses
from deep_prob_feature_track_tpu.geometry import lie


def test_epe3d_exact():
    flow_gt = jnp.zeros((2, 3, 4, 5))
    flow_est = jnp.ones((2, 3, 4, 5)) * jnp.asarray([3.0, 4.0, 0.0])[None, :, None, None]
    out = np.asarray(losses.epe3d(flow_est, flow_gt))
    np.testing.assert_allclose(out, 5.0, atol=1e-6)


def test_epe3d_invalid_mask():
    flow_gt = jnp.zeros((1, 3, 2, 2))
    flow_est = jnp.ones((1, 3, 2, 2))
    invalid = jnp.asarray([[[[1.0, 1.0], [0.0, 0.0]]]])
    out = np.asarray(losses.epe3d(flow_est, flow_gt, invalid))
    np.testing.assert_allclose(out, np.sqrt(3.0), atol=1e-6)


def test_epe3d_all_invalid_returns_zero():
    flow_gt = jnp.full((1, 3, 2, 2), jnp.nan)
    flow_est = jnp.ones((1, 3, 2, 2))
    out = np.asarray(losses.epe3d(flow_est, flow_gt))
    np.testing.assert_allclose(out, 0.0)


def test_rpe(rng):
    w = jnp.asarray(rng.randn(4, 3) * 0.2)
    R = lie.exp_so3(w)
    t = jnp.asarray(rng.randn(4, 3))
    ang, trs = losses.rpe(R, t)
    np.testing.assert_allclose(
        np.asarray(ang), np.linalg.norm(np.asarray(w), axis=-1), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(trs), np.linalg.norm(np.asarray(t), axis=-1))


def test_rt_epe_loss_zero_at_gt(rng):
    B, H, W = 2, 16, 20
    depth0 = jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)))
    K = jnp.asarray(np.tile([[20.0, 20.0, 9.5, 7.5]], (B, 1)))
    R = lie.exp_so3(jnp.asarray(rng.randn(B, 3) * 0.1))
    t = jnp.asarray(rng.randn(B, 3) * 0.1)
    loss = np.asarray(losses.compute_rt_epe_loss(R, t, R, t, depth0, K))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)


def test_rt_epe_loss_training_shape(rng):
    B, N, H, W = 2, 5, 16, 20
    depth0 = jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)))
    K = jnp.asarray(np.tile([[20.0, 20.0, 9.5, 7.5]], (B, 1)))
    R_gt = lie.exp_so3(jnp.asarray(rng.randn(B, 3) * 0.05))
    t_gt = jnp.asarray(rng.randn(B, 3) * 0.05)
    R_pyr = jnp.stack([R_gt] * N, axis=1)
    t_pyr = jnp.stack([t_gt] * N, axis=1)
    loss = np.asarray(losses.compute_rt_epe_loss(R_pyr, t_pyr, R_gt, t_gt, depth0, K))
    assert loss.shape == (B,)
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)
    # a wrong pose must give strictly positive loss
    t_bad = t_pyr + 0.1
    loss_bad = np.asarray(
        losses.compute_rt_epe_loss(R_pyr, t_bad, R_gt, t_gt, depth0, K)
    )
    assert np.all(loss_bad > 0.01)


def test_uncertainty_epe_loss_runs(rng):
    B, N, H, W = 1, 2, 12, 16
    depth0 = jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)))
    K = jnp.asarray(np.tile([[20.0, 20.0, 7.5, 5.5]], (B, 1)))
    R_gt = lie.exp_so3(jnp.asarray(rng.randn(B, 3) * 0.05))
    t_gt = jnp.asarray(rng.randn(B, 3) * 0.05)
    R_pyr = jnp.stack([R_gt] * N, axis=1)
    t_pyr = jnp.stack([t_gt] * N, axis=1)
    sigma = jnp.broadcast_to(jnp.eye(6) * 10.0, (B, N, 6, 6))
    nll, epe = losses.compute_rt_epe_uncertainty_loss(
        R_pyr, t_pyr, R_gt, t_gt, depth0, K, sigma
    )
    assert np.all(np.isfinite(np.asarray(nll)))
    np.testing.assert_allclose(np.asarray(epe), 0.0, atol=1e-5)


def test_rpe_uncertainty_loss_runs(rng):
    B, N = 2, 3
    R_gt = lie.exp_so3(jnp.asarray(rng.randn(B, 3) * 0.05))
    t_gt = jnp.asarray(rng.randn(B, 3) * 0.05)
    R_pyr = jnp.stack([R_gt] * N, axis=1)
    t_pyr = jnp.stack([t_gt] * N, axis=1)
    inv_var = jnp.broadcast_to(jnp.eye(6), (B, N, 6, 6))
    loss = losses.compute_rpe_uncertainty_loss(R_pyr, t_pyr, R_gt, t_gt, inv_var)
    assert np.isfinite(float(loss))
