"""SO(3)/SE(3) algebra tests (replaces the reference's claimed-but-missing
test_geometry.py; cf. SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_prob_feature_track_tpu.geometry import lie


def random_rotations(rng, n=8):
    from scipy.stats import ortho_group

    Rs = []
    for _ in range(n):
        R = ortho_group.rvs(3, random_state=rng)
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        Rs.append(R)
    return np.stack(Rs).astype(np.float64)


def test_exp_log_roundtrip(rng):
    w = rng.randn(16, 3).astype(np.float64) * 0.5
    R = lie.exp_so3(jnp.asarray(w))
    w2 = lie.log_so3(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-5)


def test_exp_zero_is_identity():
    R = lie.exp_so3(jnp.zeros((4, 3)))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)


def test_exp_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    w = rng.randn(8, 3) * 1.2
    R = np.asarray(lie.exp_so3(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_exp_gradient_finite_at_zero():
    g = jax.grad(lambda w: jnp.sum(lie.exp_so3(w)))(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_log_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    R = random_rotations(rng)
    w = np.asarray(lie.log_so3(jnp.asarray(R)))
    w_ref = Rotation.from_matrix(R).as_rotvec()
    np.testing.assert_allclose(w, w_ref, atol=1e-5)


def test_compose_inverse(rng):
    R = jnp.asarray(random_rotations(rng, 4))
    t = jnp.asarray(rng.randn(4, 3))
    Ri, ti = lie.inverse(R, t)
    Rc, tc = lie.compose(Ri, ti, R, t)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-6)


def test_between(rng):
    R0 = jnp.asarray(random_rotations(rng, 4))
    t0 = jnp.asarray(rng.randn(4, 3))
    R1 = jnp.asarray(random_rotations(rng, 4))
    t1 = jnp.asarray(rng.randn(4, 3))
    dR, dt = lie.between(R0, t0, R1, t1)
    # compose(dR,dt, R0,t0) == (R1,t1)
    Rc, tc = lie.compose(dR, dt, R0, t0)
    np.testing.assert_allclose(np.asarray(Rc), np.asarray(R1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), np.asarray(t1), atol=1e-6)


def test_rotation_angle(rng):
    w = rng.randn(8, 3)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * 0.7
    R = lie.exp_so3(jnp.asarray(w))
    ang = np.asarray(lie.rotation_angle(R))
    np.testing.assert_allclose(ang, 0.7, atol=1e-4)


def test_euler_roundtrip(rng):
    angles = rng.uniform(-1.0, 1.0, size=(8, 3))
    R = lie.euler_to_matrix(
        jnp.asarray(angles[:, 0]), jnp.asarray(angles[:, 1]), jnp.asarray(angles[:, 2])
    )
    ax, ay, az = lie.matrix_to_euler(R)
    np.testing.assert_allclose(np.asarray(ax), angles[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ay), angles[:, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(az), angles[:, 2], atol=1e-5)


def test_euler_matches_transforms3d_convention(rng):
    from scipy.spatial.transform import Rotation

    angles = rng.uniform(-1.0, 1.0, size=(4, 3))
    R = np.asarray(
        lie.euler_to_matrix(
            jnp.asarray(angles[:, 0]), jnp.asarray(angles[:, 1]), jnp.asarray(angles[:, 2])
        )
    )
    # static-frame xyz == intrinsic ZYX applied in reverse order
    R_ref = Rotation.from_euler("xyz", angles).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_quat_to_matrix_is_rotation(rng):
    q = rng.randn(8, 3) * 0.3
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_matrix4_roundtrip(rng):
    R = jnp.asarray(random_rotations(rng, 4))
    t = jnp.asarray(rng.randn(4, 3))
    T = lie.transform_to_matrix4(R, t)
    R2, t2 = lie.matrix4_to_Rt(T)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t))


ALL_EULER_AXES = sorted(lie._EULER_AXES)


@pytest.mark.parametrize("axes", ALL_EULER_AXES)
def test_euler_all_conventions_match_reference(rng, axes):
    """All 24 transforms3d conventions vs the reference torch port
    (geometry.py:447-553)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref import install_reference

    install_reference()
    import torch
    from models import geometry as ref_geo

    angles = rng.uniform(-1.2, 1.2, size=(6, 3))
    ai, aj, ak = (jnp.asarray(angles[:, c]) for c in range(3))
    R = np.asarray(lie.euler_to_matrix(ai, aj, ak, axes=axes))
    R_ref = (
        ref_geo.batch_euler2mat(*(torch.tensor(angles[:, c]) for c in range(3)), axes=axes)
        .numpy()
    )
    np.testing.assert_allclose(R, R_ref, atol=1e-6)

    # inverse parity on the same matrices
    e = lie.matrix_to_euler(jnp.asarray(R), axes=axes)
    e_ref = ref_geo.batch_mat2euler(torch.tensor(R), axes=axes)
    for ours, theirs in zip(e, e_ref):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


@pytest.mark.parametrize("axes", ALL_EULER_AXES)
def test_euler_all_conventions_roundtrip(rng, axes):
    """euler -> matrix -> euler -> matrix reproduces the rotation (angle
    triples themselves are not unique, matrices are)."""
    angles = rng.uniform(-1.0, 1.0, size=(5, 3))
    ai, aj, ak = (jnp.asarray(angles[:, c]) for c in range(3))
    R1 = lie.euler_to_matrix(ai, aj, ak, axes=axes)
    e = lie.matrix_to_euler(R1, axes=axes)
    R2 = lie.euler_to_matrix(*e, axes=axes)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), atol=1e-5)
