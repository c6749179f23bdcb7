"""Jacobian correctness tests.

Promotes the reference's manual finite-difference checks (code/test.py) into
an automated suite: analytic warp Jacobians are validated against
``jax.jacfwd`` of the actual warp, and the factored JtWJ/JtR reductions are
validated against a naively materialized ``[B,C,HW,6]`` Jacobian (the
reference's representation, algorithms.py:812-834).
"""

import numpy as np
import jax
import jax.numpy as jnp

from deep_prob_feature_track_tpu.geometry import lie, warp
from deep_prob_feature_track_tpu.solvers import jacobians as J


def _setup(rng, B=2, C=3, H=8, W=10):
    K = jnp.asarray(np.tile([[40.0, 42.0, (W - 1) / 2, (H - 1) / 2]], (B, 1)))
    invD = jnp.asarray(rng.uniform(0.3, 2.0, size=(B, 1, H, W)))
    px, py = warp.generate_xy_grid(B, H, W, K)
    return K, invD, px, py


def test_warp_jacobian_matches_jacfwd(rng):
    """The analytic 2x6 warp Jacobian (linearized at origin) must equal
    d(u,v)/d(xi) of warp(exp(xi) o identity) at xi=0."""
    B, H, W = 1, 6, 8
    K, invD, px, py = _setup(rng, B=B, C=1, H=H, W=W)
    u_ana, v_ana = J.compute_jacobian_warping(invD, K, px, py)  # [B,HW,6]

    def warp_uv(xi):
        R = lie.exp_so3(xi[None, :3])
        t = xi[None, 3:]
        u, v, _ = warp.batch_warp_inverse_depth(px, py, invD, (R, t), K)
        return jnp.stack([u.reshape(-1), v.reshape(-1)])  # [2, HW]

    jac = jax.jacfwd(warp_uv)(jnp.zeros(6))  # [2, HW, 6]
    np.testing.assert_allclose(np.asarray(u_ana[0]), np.asarray(jac[0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_ana[0]), np.asarray(jac[1]), rtol=1e-5, atol=1e-6)


def _materialize(fac):
    """Naive [B,C,HW,6] Jacobian from the rank-2 factors (reference layout)."""
    B, C, H, W = fac.alpha.shape
    a = fac.alpha.reshape(B, C, H * W, 1)
    b = fac.beta.reshape(B, C, H * W, 1)
    return fac.sign * (a * fac.u[:, None] + b * fac.v[:, None])


def test_factored_jtj_matches_materialized(rng):
    B, C, H, W = 2, 4, 6, 8
    K, invD, px, py = _setup(rng, B, C, H, W)
    u, v = J.compute_jacobian_warping(invD, K, px, py)
    fac = J.FactoredJtJ(
        alpha=jnp.asarray(rng.randn(B, C, H, W)),
        beta=jnp.asarray(rng.randn(B, C, H, W)),
        u=u,
        v=v,
        sign=-1.0,
    )
    res = jnp.asarray(rng.randn(B, C, H, W))
    JtJ, JtR = J.jtj_jtr(fac, res)

    Jm = _materialize(fac)  # [B,C,HW,6]
    Jm2 = jnp.swapaxes(Jm, 1, 2).reshape(B, -1, 6)  # [B, HW*C, 6]
    JtJ_ref = jnp.einsum("bpi,bpj->bij", Jm2, Jm2)
    r2 = jnp.swapaxes(res.reshape(B, C, -1), 1, 2).reshape(B, -1)
    JtR_ref = jnp.einsum("bpi,bp->bi", Jm2, r2)[..., None]
    np.testing.assert_allclose(np.asarray(JtJ), np.asarray(JtJ_ref), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(JtR), np.asarray(JtR_ref), rtol=1e-6, atol=1e-8)


def test_factored_jtj_with_weights(rng):
    B, C, H, W = 2, 3, 5, 7
    K, invD, px, py = _setup(rng, B, C, H, W)
    u, v = J.compute_jacobian_warping(invD, K, px, py)
    fac = J.FactoredJtJ(
        alpha=jnp.asarray(rng.randn(B, C, H, W)),
        beta=jnp.asarray(rng.randn(B, C, H, W)),
        u=u,
        v=v,
        sign=1.0,
    )
    res = jnp.asarray(rng.randn(B, C, H, W))
    w = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, C, H, W)))
    JtWJ, JtWr = J.jtj_jtr(fac, res, weights=w)

    Jm = _materialize(fac).reshape(B, C, -1, 6)
    wf = w.reshape(B, C, -1, 1)
    JtWJ_ref = jnp.einsum("bcpi,bcpj->bij", Jm, wf * Jm)
    JtWr_ref = jnp.einsum("bcpi,bcp->bi", Jm, (w * res).reshape(B, C, -1))[..., None]
    np.testing.assert_allclose(np.asarray(JtWJ), np.asarray(JtWJ_ref), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(JtWr), np.asarray(JtWr_ref), rtol=1e-6, atol=1e-8)


def test_uic_jacobian_matches_jacfwd_of_residual(rng):
    """Full U_IC chained Jacobian vs automatic differentiation.

    The IC linearization perturbs the *template*: residual as a function of
    xi applied on the template side at the origin is
    r(xi) = f1(w(pose, x)) - f0(w(exp(xi), x)) with sigma warped likewise;
    its derivative at xi=0 must equal the analytic
    -grad_f0/sigma - res*sigma0*grad_sigma0/sigma^3 chained through the warp
    Jacobian (up to the Sobel-vs-exact-interpolation gradient approximation,
    so we check on smooth synthetic maps with a loose tolerance).
    """
    B, C, H, W = 1, 1, 16, 20
    K = jnp.asarray([[30.0, 30.0, (W - 1) / 2.0, (H - 1) / 2.0]])

    # analytic smooth feature & sigma fields sampled on the pixel grid; the
    # jacfwd reference below evaluates the *fields* at warped coordinates so
    # its derivative is the true smooth one (no interpolation kinks), and
    # the only discrepancy left is the Sobel discretization (~1%).
    def f_field(u, v):
        return jnp.sin(u / 6.0) + jnp.cos(v / 5.0)

    def s_field(u, v):
        return 1.5 + 0.3 * jnp.sin(u / 7.0 + 0.5) * jnp.cos(v / 6.0)

    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uu = jnp.asarray(xx, dtype=jnp.float64)[None, None]
    vv = jnp.asarray(yy, dtype=jnp.float64)[None, None]
    f0 = f_field(uu, vv)
    s0 = s_field(uu, vv)
    invD = jnp.full((B, 1, H, W), 1.0)
    px, py = warp.generate_xy_grid(B, H, W, K)

    # The production solver unit-normalizes the Sobel gradients (the
    # reference's normalize_gradient=True, algorithms.py:1860-1863), which
    # deliberately changes the Jacobian's magnitude; to validate the math
    # chain itself we build the precomp with true central-difference
    # gradients (Sobel/8).
    from deep_prob_feature_track_tpu.ops.image import sobel_gradients

    gxf, gyf = sobel_gradients(f0, normalize_gradient=False)
    gxs, gys = sobel_gradients(s0, normalize_gradient=False)
    u_j, v_j = J.compute_jacobian_warping(invD, K, px, py)
    pre = J.UICPrecomp(gxf / 8.0, gyf / 8.0, gxs / 8.0, gys / 8.0, u_j, v_j)

    # analytic factors at pose=identity, f1=f0 shifted (so res nonzero)
    f1 = f0 + 0.1
    s1 = s0 * 1.1
    res = f1 - f0
    sigma = jnp.sqrt(s1**2 + s0**2)
    fac = J.uic_factors(pre, res, sigma, s0)
    Jm = _materialize(fac)[0, 0]  # [HW, 6]

    def residual_of_xi(xi):
        # template-side perturbation: warp template coords by exp(xi), then
        # evaluate the smooth fields there (exact continuous warp)
        R = lie.exp_so3(xi[None, :3])
        t = xi[None, 3:]
        u, v, _ = warp.batch_warp_inverse_depth(px, py, invD, (R, t), K)
        f0_w = f_field(u, v)
        s0_w = s_field(u, v)
        r = f1 - f0_w
        sg = jnp.sqrt(s1**2 + s0_w**2)
        return (r / sg).reshape(-1)

    jac = jax.jacfwd(residual_of_xi)(jnp.zeros(6))  # [HW, 6]
    # interior pixels only (Sobel gradient is off at borders).  The final
    # (sign-flipped) IC Jacobian equals minus the IC-objective derivative.
    mask = np.zeros((H, W), dtype=bool)
    mask[2:-2, 2:-2] = True
    m = mask.reshape(-1)
    np.testing.assert_allclose(np.asarray(Jm)[m], -np.asarray(jac)[m], rtol=0.03, atol=2e-3)


def test_icp_jacobian_matches_jacfwd(rng):
    """Inverse ICP point-to-plane Jacobian vs jacfwd of the residual."""
    from deep_prob_feature_track_tpu.solvers import icp as icp_mod
    from deep_prob_feature_track_tpu.ops.image import compute_normal

    B, H, W = 1, 12, 14
    K = jnp.asarray([[30.0, 30.0, (W - 1) / 2.0, (H - 1) / 2.0]])
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth = (2.0 + 0.1 * np.sin(xx / 5.0) + 0.08 * np.cos(yy / 4.0)).astype(np.float64)
    depth = jnp.asarray(depth)[None, None]
    px, py = warp.generate_xy_grid(B, H, W, K)
    vertex0 = warp.compute_vertex(depth, px, py)
    vertex1 = warp.compute_vertex(depth, px, py)
    normal1 = compute_normal(vertex1)

    pose = (jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), jnp.zeros((B, 3)))
    res0, J_icp, occ = icp_mod.icp_residuals_inverse(
        vertex0, vertex1, normal1, pose, K, normalize_residual=False
    )

    # freeze the projective association at xi=0 (the IC assumption the
    # analytic Jacobian makes): r_vertex1/r_normal1 sampled once
    hw = H * W
    uu = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float64), (B, 1, H, W))
    vv = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float64)[:, None], (B, 1, H, W))
    r_vertex1 = warp.warp_features(vertex1, uu, vv).reshape(B, 3, hw)
    r_normal1 = warp.warp_features(normal1, uu, vv).reshape(B, 3, hw)

    def res_of_xi(xi):
        # inverse (template-side) perturbation: v0 -> exp(xi) v0, pose fixed
        R = lie.exp_so3(xi[None, :3])
        t = xi[None, 3:]
        v0p = warp.batch_transform_xyz(vertex0, R, t).reshape(B, 3, hw)
        diff = v0p - r_vertex1  # pose is identity
        return (r_normal1 * diff).sum(axis=1).reshape(-1)

    jac = jax.jacfwd(res_of_xi)(jnp.zeros(6))  # [HW, 6]
    # valid interior pixels only, where the warp stays put and normals exist
    valid = ~np.asarray(occ).reshape(-1)
    interior = np.zeros((H, W), dtype=bool)
    interior[2:-2, 2:-2] = True
    m = valid & interior.reshape(-1)
    # After the reference's double sign flip, the final ICP Jacobian equals
    # +d(res)/dxi of the template perturbation v0 -> exp(xi) v0 exactly.
    np.testing.assert_allclose(
        np.asarray(J_icp[0])[m], np.asarray(jac)[m], rtol=0.05, atol=1e-4
    )


def test_forward_warp_jacobian_matches_jacfwd(rng):
    """U_FC coordinate Jacobians: u6/v6 must equal d(u,v)/d[w, dt] under the
    perturbation R<-exp(w)R, t<-t+dt (the reference warp_net convention,
    geometry.py:972-1113)."""
    from deep_prob_feature_track_tpu.solvers.trust_region import _warp_forward_depth

    B, H, W = 1, 8, 10
    K = jnp.asarray([[30.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0]])
    dpt0 = jnp.asarray(rng.uniform(0.8, 3.0, (B, 1, H, W)))
    from deep_prob_feature_track_tpu.geometry.lie import exp_so3

    w0 = jnp.asarray(rng.randn(B, 3) * 0.1)
    R_base = exp_so3(w0)
    t_base = jnp.asarray(rng.randn(B, 3) * 0.1)

    u, v, dpt1, valid, u6, v6 = _warp_forward_depth(dpt0, (R_base, t_base), K)

    def uv_of_xi(xi):
        dR = exp_so3(xi[None, :3])
        Rp = dR @ R_base
        tp = t_base + xi[None, 3:]
        uu, vv, _, _, _, _ = _warp_forward_depth(dpt0, (Rp, tp), K)
        return jnp.stack([uu.reshape(-1), vv.reshape(-1)])

    jac = jax.jacfwd(uv_of_xi)(jnp.zeros(6))  # [2, HW, 6]
    np.testing.assert_allclose(np.asarray(u6[0]), np.asarray(jac[0]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v6[0]), np.asarray(jac[1]), rtol=1e-5, atol=1e-7)
