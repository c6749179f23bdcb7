"""Image-op parity tests against torch (the reference's op semantics)."""

import numpy as np
import jax.numpy as jnp

from deep_prob_feature_track_tpu.ops import image as I
from deep_prob_feature_track_tpu.ops import solver6


def test_sobel_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    B, C, H, W = 2, 3, 9, 11
    x = rng.randn(B, C, H, W).astype(np.float32)
    gx, gy = I.sobel_gradients(jnp.asarray(x), normalize_gradient=False)

    wx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]).view(1, 1, 3, 3)
    wy = torch.tensor([[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]]).view(1, 1, 3, 3)
    xt = torch.from_numpy(x).view(-1, 1, H, W)
    xp = F.pad(xt, (1, 1, 1, 1), mode="replicate")
    rx = F.conv2d(xp, wx).view(B, C, H, W).numpy()
    ry = F.conv2d(xp, wy).view(B, C, H, W).numpy()
    np.testing.assert_allclose(np.asarray(gx), rx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), ry, atol=1e-5)


def test_sobel_normalized_unit_magnitude(rng):
    x = rng.randn(1, 1, 16, 16).astype(np.float32)
    gx, gy = I.sobel_gradients(jnp.asarray(x), normalize_gradient=True)
    mag = np.asarray(gx) ** 2 + np.asarray(gy) ** 2
    np.testing.assert_allclose(mag, 1.0, atol=1e-3)


def test_avg_max_pool_match_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.randn(2, 3, 16, 20).astype(np.float32)
    for factor in (2, 4):
        a = np.asarray(I.avg_pool2(jnp.asarray(x), factor))
        m = np.asarray(I.max_pool2(jnp.asarray(x), factor))
        ar = F.avg_pool2d(torch.from_numpy(x), factor).numpy()
        mr = F.max_pool2d(torch.from_numpy(x), factor).numpy()
        np.testing.assert_allclose(a, ar, atol=1e-6)
        np.testing.assert_allclose(m, mr, atol=1e-6)


def test_image_pyramid_shapes(rng):
    x = jnp.asarray(rng.randn(2, 1, 32, 40).astype(np.float32))
    pyr = I.image_pyramid(x)
    assert [p.shape for p in pyr] == [
        (2, 1, 32, 40),
        (2, 1, 16, 20),
        (2, 1, 8, 10),
        (2, 1, 4, 5),
    ]


def test_image_pyramid_bool_roundtrip(rng):
    x = jnp.asarray(rng.rand(1, 1, 8, 8) > 0.5)
    pyr = I.image_pyramid(x)
    assert all(p.dtype == jnp.bool_ for p in pyr)


def test_bilinear_resize_align_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.randn(2, 2, 8, 10).astype(np.float32)
    out = np.asarray(I.bilinear_resize_align(jnp.asarray(x), 15, 19))
    ref = F.interpolate(torch.from_numpy(x), (15, 19), mode="bilinear", align_corners=True).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_compute_normal_planar():
    """Normals of a tilted plane z - a*x = 2 must align with (-a, 0, 1).

    (A perfectly constant depth map is degenerate by design: the reference
    invalidates pixels where depth equals its global min/max, which for a
    constant map is everywhere — so we use a tilt.)
    """
    B, H, W = 1, 12, 14
    a = 0.3
    K = jnp.asarray([[30.0, 30.0, (W - 1) / 2.0, (H - 1) / 2.0]])
    from deep_prob_feature_track_tpu.geometry.warp import compute_vertex, generate_xy_grid

    px, py = generate_xy_grid(B, H, W, K)
    depth = 2.0 / (1.0 - a * px)
    vertex = compute_vertex(depth, px, py)
    normal = np.asarray(I.compute_normal(vertex))
    n_ref = np.array([-a, 0.0, 1.0]) / np.sqrt(1 + a * a)
    inner = normal[0, :, 3:-3, 3:-3].reshape(3, -1).T  # [N,3]
    # orientation sign is convention-dependent; compare |cos| to 1
    cos = np.abs(inner @ n_ref)
    assert np.all(cos > 0.999)


def test_lev_mar_damp():
    H6 = jnp.broadcast_to(jnp.eye(6) * 2.0, (3, 6, 6))
    damped = np.asarray(solver6.lev_mar_damp(H6))
    np.testing.assert_allclose(damped[0, 0, 0], 2.0 + 12.0 * 1e-6, rtol=1e-6)


def test_solve_chol_matches_inverse(rng):
    A = rng.randn(4, 6, 6)
    H6 = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 6 * np.eye(6))
    rhs = jnp.asarray(rng.randn(4, 6, 1))
    x1 = np.asarray(solver6.solve_chol(H6, rhs))
    x2 = np.asarray(solver6.solve_inverse(H6, rhs))
    np.testing.assert_allclose(x1, x2, rtol=1e-6, atol=1e-8)
    resid = np.asarray(H6) @ x1 - np.asarray(rhs)
    np.testing.assert_allclose(resid, 0.0, atol=1e-8)


def test_solve_chol_unrolled_matches(rng):
    A = rng.randn(4, 6, 6)
    H6 = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 6 * np.eye(6))
    rhs = jnp.asarray(rng.randn(4, 6))
    x1 = np.asarray(solver6.solve_chol(H6, rhs))
    x2 = np.asarray(solver6.solve_chol_unrolled(H6, rhs))
    np.testing.assert_allclose(x1, x2, rtol=1e-8, atol=1e-10)
