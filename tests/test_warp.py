"""Warping / sampling tests.

The bilinear sampler must match torch ``grid_sample(align_corners=True,
padding_mode='border')`` bit-for-bit (the reference's sampling semantics,
code/models/geometry.py:353-365) — verified here directly against torch CPU.
"""

import numpy as np
import jax.numpy as jnp

from deep_prob_feature_track_tpu.geometry import lie, warp


def test_generate_xy_grid_values():
    K = jnp.asarray([[100.0, 50.0, 8.0, 6.0]])
    px, py = warp.generate_xy_grid(1, 12, 16, K)
    assert px.shape == (1, 1, 12, 16)
    np.testing.assert_allclose(np.asarray(px[0, 0, 0, 0]), (0 - 8.0) / 100.0)
    np.testing.assert_allclose(np.asarray(px[0, 0, 0, 15]), (15 - 8.0) / 100.0)
    np.testing.assert_allclose(np.asarray(py[0, 0, 11, 0]), (11 - 6.0) / 50.0)


def test_warp_features_matches_torch_grid_sample(rng):
    import torch
    import torch.nn.functional as F

    B, C, H, W = 2, 3, 13, 17
    feats = rng.randn(B, C, H, W).astype(np.float32)
    # coordinates including out-of-border values
    u = rng.uniform(-3, W + 2, size=(B, 1, H, W)).astype(np.float32)
    v = rng.uniform(-3, H + 2, size=(B, 1, H, W)).astype(np.float32)

    ours = np.asarray(warp.warp_features(jnp.asarray(feats), jnp.asarray(u), jnp.asarray(v)))

    tu = torch.from_numpy(u)
    tv = torch.from_numpy(v)
    u_n = tu / ((W - 1) / 2) - 1
    v_n = tv / ((H - 1) / 2) - 1
    grid = torch.cat((u_n.view(B, H, W, 1), v_n.view(B, H, W, 1)), dim=3)
    ref = F.grid_sample(
        torch.from_numpy(feats), grid, align_corners=True, mode="bilinear", padding_mode="border"
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_warp_identity(rng):
    B, C, H, W = 1, 2, 8, 10
    feats = rng.randn(B, C, H, W).astype(np.float32)
    u = np.broadcast_to(np.arange(W, dtype=np.float32), (B, 1, H, W)).copy()
    v = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], (B, 1, H, W)).copy()
    out = np.asarray(warp.warp_features(jnp.asarray(feats), jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(out, feats, atol=1e-6)


def test_identity_pose_warp_is_identity(rng):
    B, H, W = 2, 12, 16
    K = jnp.asarray(np.tile([[52.5, 52.5, 8.0, 6.0]], (B, 1)).astype(np.float32))
    px, py = warp.generate_xy_grid(B, H, W, K)
    invD = jnp.asarray(rng.uniform(0.2, 2.0, size=(B, 1, H, W)).astype(np.float32))
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    t = jnp.zeros((B, 3))
    u, v, inv_z = warp.batch_warp_inverse_depth(px, py, invD, (R, t), K)
    uu = np.broadcast_to(np.arange(W, dtype=np.float32), (B, 1, H, W))
    vv = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], (B, 1, H, W))
    np.testing.assert_allclose(np.asarray(u), uu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), vv, atol=1e-4)
    np.testing.assert_allclose(np.asarray(inv_z), np.asarray(invD), atol=1e-6)


def test_warp_consistency_with_pointcloud(rng):
    """Warping via inverse depth == project(transform(backproject(depth)))."""
    B, H, W = 2, 10, 14
    K = jnp.asarray(np.tile([[40.0, 42.0, 7.0, 5.0]], (B, 1)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 3.0, size=(B, 1, H, W)).astype(np.float32))
    invD = 1.0 / depth
    w = rng.randn(B, 3) * 0.05
    R = lie.exp_so3(jnp.asarray(w))
    t = jnp.asarray(rng.randn(B, 3) * 0.05)

    px, py = warp.generate_xy_grid(B, H, W, K)
    u1, v1, inv_z1 = warp.batch_warp_inverse_depth(px, py, invD, (R, t), K)

    xyz = warp.batch_inverse_project(depth, K)
    xyz_t = warp.batch_transform_xyz(xyz, R, t)
    uv = warp.batch_project(xyz_t, K)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(uv[:, 0:1]), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(uv[:, 1:2]), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(inv_z1), np.asarray(1.0 / xyz_t[:, 2:3]), rtol=1e-4, atol=1e-4
    )


def test_check_occ_out_of_view():
    B, H, W = 1, 6, 8
    inv_z = jnp.ones((B, 1, H, W))
    u = jnp.full((B, 1, H, W), -2.0)
    v = jnp.full((B, 1, H, W), 3.0)
    occ = warp.check_occ(inv_z, inv_z, u, v)
    assert bool(np.all(np.asarray(occ)))


def test_scale_K():
    K = jnp.asarray([[400.0, 400.0, 160.0, 120.0]])
    K3 = warp.scale_K(K, 3)
    np.testing.assert_allclose(np.asarray(K3), np.asarray(K) / 8.0)


def test_grad_bilinear_matches_autodiff(rng):
    """Exact interpolation gradients must equal d(warp_features)/d(u,v)."""
    import jax

    B, C, H, W = 1, 2, 9, 11
    F = jnp.asarray(rng.randn(B, C, H, W))
    u = jnp.asarray(rng.uniform(1.0, W - 2.0, (B, 1, 4, 5)))
    v = jnp.asarray(rng.uniform(1.0, H - 2.0, (B, 1, 4, 5)))
    gx, gy, invalid = warp.grad_bilinear_interpolation(F, u, v)
    assert not np.any(np.asarray(invalid))

    # autodiff wrt a scalar shift of u (and v) at each sample point
    # (reverse mode: the sampler's custom VJP does not define a JVP)
    ju = jax.jacrev(lambda du: warp.warp_features(F, u + du, v))(0.0)
    jv = jax.jacrev(lambda dv: warp.warp_features(F, u, v + dv))(0.0)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ju), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(jv), atol=1e-6)


def test_grad_bilinear_invalid_mask(rng):
    F = jnp.asarray(rng.randn(1, 1, 6, 8))
    u = jnp.asarray([[[[-1.0, 3.0]]]])
    v = jnp.asarray([[[[2.0, 5.5]]]])
    _, _, invalid = warp.grad_bilinear_interpolation(F, u, v)
    assert np.asarray(invalid)[0, 0, 0].tolist() == [True, True]  # oob u; v==H-0.5>H-1


def test_warp_features_custom_vjp_matches_autodiff(rng):
    """The hand-written backward must equal reference autodiff grads."""
    import jax

    B, C, H, W = 2, 3, 9, 11
    F = jnp.asarray(rng.randn(B, C, H, W))
    u = jnp.asarray(rng.uniform(-1.0, W, (B, 1, 4, 5)))
    v = jnp.asarray(rng.uniform(-1.0, H, (B, 1, 4, 5)))
    t = jnp.asarray(rng.randn(B, C, 4, 5))  # random cotangent direction

    def naive(F_, u_, v_):
        """take_along_axis bilinear reference (plain autodiff)."""
        uf = jnp.clip(u_.reshape(B, -1), 0.0, W - 1.0)
        vf = jnp.clip(v_.reshape(B, -1), 0.0, H - 1.0)
        u0 = jnp.floor(uf)
        v0 = jnp.floor(vf)
        du = (uf - u0)[:, None]
        dv = (vf - v0)[:, None]
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)
        u1i = jnp.minimum(u0i + 1, W - 1)
        v1i = jnp.minimum(v0i + 1, H - 1)
        flat = F_.reshape(B, C, H * W)
        g = lambda vi, ui: jnp.take_along_axis(flat, (vi * W + ui)[:, None], axis=2)
        out = (
            g(v0i, u0i) * (1 - du) * (1 - dv)
            + g(v0i, u1i) * du * (1 - dv)
            + g(v1i, u0i) * (1 - du) * dv
            + g(v1i, u1i) * du * dv
        )
        return out.reshape(B, C, 4, 5)

    def loss_ours(F_, u_, v_):
        return jnp.sum(warp.warp_features(F_, u_, v_) * t)

    def loss_ref(F_, u_, v_):
        return jnp.sum(naive(F_, u_, v_) * t)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(F, u, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(F, u, v)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_batch_warp_affine_identity(rng):
    B, H, W = 1, 4, 5
    u = jnp.asarray(rng.rand(B, 1, H, W))
    v = jnp.asarray(rng.rand(B, 1, H, W))
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    uo, vo = warp.batch_warp_affine(u, v, eye)
    np.testing.assert_allclose(np.asarray(uo), np.asarray(u))
    np.testing.assert_allclose(np.asarray(vo), np.asarray(v))


def test_warp_images_helper(rng):
    from deep_prob_feature_track_tpu.solvers.residuals import warp_images

    B, H, W = 1, 8, 10
    K = jnp.asarray([[8.0, 8.0, 4.5, 3.5]])
    img1 = jnp.asarray(rng.rand(B, 3, H, W))
    invD = jnp.full((B, 1, H, W), 0.5)
    pose = (jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), jnp.zeros((B, 3)))
    img_r, invD_r = warp_images(invD, pose, img1, invD, K)
    np.testing.assert_allclose(np.asarray(img_r), np.asarray(img1), atol=1e-5)


def test_bf16_residuals_gradient_parity(rng, monkeypatch):
    """DPFT_BF16_RESIDUALS=1 halves the gather VJP's gx/gy residual bytes
    (the dominant training buffers at 480x640) by storing them bf16.
    Only the COORDINATE cotangents flow through them, so operand grads
    must stay exact and coordinate grads within bf16 rounding (~4e-3
    relative of the gradient scale)."""
    import jax

    B, C, H, W = 2, 3, 9, 11
    F = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    u = jnp.asarray(rng.uniform(-1.0, W, (B, 1, 4, 5)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1.0, H, (B, 1, 4, 5)).astype(np.float32))
    t = jnp.asarray(rng.randn(B, C, 4, 5).astype(np.float32))

    def loss(F_, u_, v_):
        return jnp.sum(warp.warp_features(F_, u_, v_) * t)

    monkeypatch.delenv("DPFT_BF16_RESIDUALS", raising=False)
    g0 = jax.grad(loss, argnums=(0, 1, 2))(F, u, v)
    monkeypatch.setenv("DPFT_BF16_RESIDUALS", "1")
    g1 = jax.grad(loss, argnums=(0, 1, 2))(F, u, v)

    # operand gradient path does not touch gx/gy: exact
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]), atol=0)
    for a, b in zip(g1[1:], g0[1:]):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0, atol=4e-3 * max(np.abs(b).max(), 1e-6))


def test_corner_grads_blocked_parity(rng, monkeypatch):
    """The sample-blocked corner-gather path (engaged above _GRADS_BLK to
    cap the VGA training corner temporary, see warp._corner_grads) must
    match the one-shot path exactly — values AND gradients through the
    custom VJP."""
    import jax

    B, C, H, W = 2, 3, 9, 11
    F = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    u = jnp.asarray(rng.uniform(-1.0, W, (B, 1, 6, 5)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1.0, H, (B, 1, 6, 5)).astype(np.float32))
    t = jnp.asarray(rng.randn(B, C, 6, 5).astype(np.float32))

    def loss(F_, u_, v_):
        return jnp.sum(warp.warp_features(F_, u_, v_) * t)

    # value_and_grad routes the forward through the custom-VJP fwd rule,
    # where the blocked path lives
    out0, g0 = jax.value_and_grad(loss, argnums=(0, 1, 2))(F, u, v)
    # N=30 with blk=7 exercises blocking incl. a padded tail block; the
    # env var is read at trace time (warp._grads_blk), so setenv works
    monkeypatch.setenv("DPFT_GRADS_BLK", "7")
    out1, g1 = jax.value_and_grad(loss, argnums=(0, 1, 2))(F, u, v)
    # identical per-sample math, but the two programs fuse differently
    # (FMA contraction), so allow f32 roundoff
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), rtol=1e-6)
    for a, b in zip(g1, g0):
        b = np.asarray(b)
        tol = 1e-6 * max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=tol)


def test_banded_splat_parity_and_dispatch(rng, monkeypatch):
    """The banded splat (warp._splat_twohot, DPFT_SPLAT_BAND) restricts
    the V-side two-hot to a per-block row band — H/band x fewer MACs, the
    VGA train backward's dominant term (PROFILE_VGA_r05.json) — with a
    whole-call lax.cond fallback to the exact dense path when any block's
    v-spread exceeds the band (the gather_tiles in-band pattern).

    Checks: (a) the cond dispatch is actually wired (jaxpr contains the
    cond iff the band is enabled at an eligible shape); (b) operand
    gradients match the dense path on tracking-realistic smooth coords
    (engaged branch, summation-order tolerance); (c) wild random coords
    fall back to results matching the dense path."""
    import jax

    B, C, H, W = 2, 3, 96, 128
    F = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    iu, iv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    # near-identity smooth flow, clipped inside the plane: every
    # 1920-sample raster block spans ~15 rows + <3 rows of flow -> well
    # inside the 64-row band
    u_s = np.clip(iu + 1.7 * np.sin(iv / 23.0), 0, W - 1.001)
    v_s = np.clip(iv - 1.3 * np.cos(iu / 31.0), 0, H - 1.001)
    u_s = jnp.asarray(np.broadcast_to(u_s, (B, 1, H, W)).copy())
    v_s = jnp.asarray(np.broadcast_to(v_s, (B, 1, H, W)).copy())
    t = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))

    def loss(F_, u_, v_):
        return jnp.sum(warp.warp_features(F_, u_, v_) * t)

    grad_op = jax.grad(loss, argnums=0)

    # the custom-VJP bwd trace is cached process-globally, so flipping
    # the trace-time env var needs the trace caches cleared between arms
    monkeypatch.setenv("DPFT_SPLAT_BAND", "0")
    jax.clear_caches()
    assert "cond[" not in str(jax.make_jaxpr(grad_op)(F, u_s, v_s))
    g_dense = np.asarray(grad_op(F, u_s, v_s))

    monkeypatch.setenv("DPFT_SPLAT_BAND", "64")
    jax.clear_caches()
    assert "cond[" in str(jax.make_jaxpr(grad_op)(F, u_s, v_s))
    g_band = np.asarray(grad_op(F, u_s, v_s))

    tol = 1e-5 * max(np.abs(g_dense).max(), 1e-6)
    np.testing.assert_allclose(g_band, g_dense, rtol=0, atol=tol)

    # wild coords: per-block v-spread ~ full plane -> in-band fails ->
    # the cond's dense branch must reproduce the band=0 result
    u_r = jnp.asarray(rng.uniform(0, W - 1.001, (B, 1, H, W)).astype(np.float32))
    v_r = jnp.asarray(rng.uniform(0, H - 1.001, (B, 1, H, W)).astype(np.float32))
    g_band_wild = np.asarray(grad_op(F, u_r, v_r))
    monkeypatch.setenv("DPFT_SPLAT_BAND", "0")
    jax.clear_caches()
    g_dense_wild = np.asarray(grad_op(F, u_r, v_r))
    tol = 1e-6 * max(np.abs(g_dense_wild).max(), 1e-6)
    np.testing.assert_allclose(g_band_wild, g_dense_wild, rtol=0, atol=tol)
