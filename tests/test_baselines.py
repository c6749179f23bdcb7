"""Baseline-tracker tests (non-learned ICP / RGB-D odometry)."""

import numpy as np
import jax.numpy as jnp

from deep_prob_feature_track_tpu.apps.baselines import ICPOdometry, RGBDOdometry
from tests.test_trust_region import make_pair, pose_error


def test_rgbd_odometry_converges(rng):
    K, f0, f1, depth0, depth1, pose_gt = make_pair(rng, H=64, W=80)
    # grayscale 'color' images from the synthetic field
    c0 = jnp.repeat(jnp.clip((f0 + 2) / 4, 0, 1), 3, axis=1).astype(jnp.float32)
    c1 = jnp.repeat(jnp.clip((f1 + 2) / 4, 0, 1), 3, axis=1).astype(jnp.float32)
    tracker = RGBDOdometry(term="color", max_iter=5)
    R, t = tracker.batch_track(c0, depth0, c1, depth1, K)
    a0, t0 = pose_error(
        (jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), jnp.zeros((1, 3))), pose_gt
    )
    a1, t1 = pose_error((jnp.asarray(R), jnp.asarray(t)), pose_gt)
    assert t1 < 0.6 * t0 + 1e-5


def test_icp_odometry_runs(rng):
    B, H, W = 2, 32, 40
    K = np.tile([[26.0, 26.0, (W - 1) / 2, (H - 1) / 2]], (B, 1)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = (2.0 + 0.2 * np.sin(xx / 6.0) + 0.15 * np.cos(yy / 5.0)).astype(np.float32)
    d0 = np.tile(base[None, None], (B, 1, 1, 1))
    d1 = d0 - 0.02
    c = np.zeros((B, 3, H, W), np.float32)
    tracker = ICPOdometry(max_iter=4)
    R, t = tracker.batch_track(c, d0, c, d1, K)
    assert R.shape == (B, 3, 3)
    assert np.all(np.isfinite(t))
    # moving toward the scene: tz should be negative
    assert np.all(t[:, 2] < 0)


def test_divergence_guard(rng, monkeypatch):
    tracker = ICPOdometry(max_iter=1)

    def fake(*args):
        import jax.numpy as jnp

        return jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), jnp.asarray([[5.0, 0.0, 0.0]])

    tracker._jit = fake
    c = np.zeros((1, 3, 8, 8), np.float32)
    d = np.ones((1, 1, 8, 8), np.float32)
    K = np.asarray([[5.0, 5.0, 3.5, 3.5]], np.float32)
    R, t = tracker.batch_track(c, d, c, d, K)
    np.testing.assert_allclose(R[0], np.eye(3))
    np.testing.assert_allclose(t[0], 0.0)


def _depth_scene(B, H, W):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = (2.0 + 0.2 * np.sin(xx / 6.0) + 0.15 * np.cos(yy / 5.0)).astype(np.float32)
    return np.tile(base[None, None], (B, 1, 1, 1))


def test_point2point_odometry_converges(rng):
    """Point-to-point mode (ref tools/ICP.py:94-99) recovers a small
    z-translation on a curved synthetic surface."""
    B, H, W = 1, 48, 64
    K = np.tile([[40.0, 40.0, (W - 1) / 2, (H - 1) / 2]], (B, 1)).astype(np.float32)
    d0 = _depth_scene(B, H, W)
    tz = 0.03
    d1 = d0 - tz  # camera moved forward by tz
    c = np.zeros((B, 3, H, W), np.float32)
    tracker = ICPOdometry(mode="Point2Point")
    R, t = tracker.batch_track(c, d0, c, d1, K)
    assert np.all(np.isfinite(t))
    # recovered translation should be ~[0,0,-tz]
    assert abs(t[0, 2] + tz) < 0.015
    np.testing.assert_allclose(R[0], np.eye(3), atol=0.02)


def test_iter_point2plane_matches_plain(rng):
    """Iter_Point2Plane (ref ICP.py:138-168 schedule) runs and improves on
    identity for a known motion."""
    B, H, W = 1, 32, 40
    K = np.tile([[26.0, 26.0, (W - 1) / 2, (H - 1) / 2]], (B, 1)).astype(np.float32)
    d0 = _depth_scene(B, H, W)
    d1 = d0 - 0.02
    c = np.zeros((B, 3, H, W), np.float32)
    tracker = ICPOdometry(mode="Iter_Point2Plane")
    R, t = tracker.batch_track(c, d0, c, d1, K)
    assert np.all(np.isfinite(t))
    assert t[0, 2] < -0.005  # moved toward the scene


def test_iter_coloricp_schedule(rng):
    K, f0, f1, depth0, depth1, pose_gt = make_pair(rng, H=64, W=80)
    c0 = jnp.repeat(jnp.clip((f0 + 2) / 4, 0, 1), 3, axis=1).astype(jnp.float32)
    c1 = jnp.repeat(jnp.clip((f1 + 2) / 4, 0, 1), 3, axis=1).astype(jnp.float32)
    tracker = RGBDOdometry(term="color", schedule=((2, 10), (1, 6), (0, 4)))
    R, t = tracker.batch_track(c0, depth0, c1, depth1, K)
    a0, t0 = pose_error(
        (jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), jnp.zeros((1, 3))), pose_gt
    )
    a1, t1 = pose_error((jnp.asarray(R), jnp.asarray(t)), pose_gt)
    assert t1 < 0.6 * t0 + 1e-5
