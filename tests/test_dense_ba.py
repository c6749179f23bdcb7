"""Dense feature-metric windowed BA tests on a synthetic textured plane."""

import numpy as np
import jax
import jax.numpy as jnp

from deep_prob_feature_track_tpu.geometry import lie, warp
from deep_prob_feature_track_tpu.parallel import dense_ba
from deep_prob_feature_track_tpu.parallel.mesh import make_mesh


def field(x, y):
    return (
        jnp.sin(x * 14.0) * jnp.cos(y * 11.0)
        + 0.6 * jnp.sin(x * 5.0 + 1.0)
        + 0.4 * jnp.cos(y * 7.0 + 0.5)
    )


def render_window(rng, n_frames=4, H=48, W=64, plane_z=2.0):
    """Render intensity/depth of a textured world plane from n poses.

    World frame = camera 0.  Texture painted by world (x, y).
    :return: WindowFrames, poses_gt [N,4,4]
    """
    K = jnp.asarray(
        np.tile([[0.8 * W, 0.8 * W, (W - 1) / 2.0, (H - 1) / 2.0]], (n_frames, 1)),
        jnp.float32,
    )
    poses = [np.eye(4)]
    for _ in range(n_frames - 1):
        xi = np.concatenate([rng.uniform(-0.02, 0.02, 3), rng.uniform(-0.05, 0.05, 3)])
        dR, dt = lie.exp_se3(jnp.asarray(xi[None]))
        T = np.eye(4)
        T[:3, :3] = np.asarray(dR)[0]
        T[:3, 3] = np.asarray(dt)[0]
        poses.append(poses[-1] @ T)
    poses = np.stack(poses).astype(np.float32)

    px, py = warp.generate_xy_grid(n_frames, H, W, K)
    dirs = jnp.concatenate([px, py, jnp.ones_like(px)], axis=1)  # [N,3,H,W]
    R_wc = jnp.asarray(poses[:, :3, :3])
    t_wc = jnp.asarray(poses[:, :3, 3])
    rdz = jnp.einsum("nj,njhw->nhw", R_wc[:, 2, :], dirs)[:, None]
    z = (plane_z - t_wc[:, 2][:, None, None, None]) / rdz  # cam depth
    Xw = warp.batch_transform_xyz(dirs * z, R_wc, t_wc)
    feats = field(Xw[:, 0:1], Xw[:, 1:2]).astype(jnp.float32)
    frames = dense_ba.WindowFrames(
        feats=feats,
        sigmas=jnp.ones_like(feats),
        invD=(1.0 / z).astype(jnp.float32),
        K=K,
    )
    return frames, poses


def perturb(poses, rng, scale=0.01):
    out = poses.copy()
    for k in range(1, len(poses)):
        xi = rng.randn(6).astype(np.float32) * scale
        dR, dt = lie.exp_se3(jnp.asarray(xi[None]))
        D = np.eye(4, dtype=np.float32)
        D[:3, :3] = np.asarray(dR)[0]
        D[:3, 3] = np.asarray(dt)[0]
        out[k] = out[k] @ D
    return out


def pose_err(R, t, poses_gt):
    errs = []
    for k in range(len(poses_gt)):
        T = np.eye(4)
        T[:3, :3] = np.asarray(R[k])
        T[:3, 3] = np.asarray(t[k])
        D = np.linalg.inv(poses_gt[k]) @ T
        errs.append(np.linalg.norm(D[:3, 3]))
    return np.asarray(errs)


def window_edges(n, span=2):
    ei, ej = [], []
    for i in range(n):
        for j in range(i + 1, min(i + span + 1, n)):
            ei.append(i)
            ej.append(j)
    return jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32)


def test_dense_window_refinement_reduces_error(rng):
    frames, poses_gt = render_window(rng)
    poses_init = perturb(poses_gt, rng, scale=0.01)
    ei, ej = window_edges(len(poses_gt))
    R0 = jnp.asarray(poses_init[:, :3, :3])
    t0 = jnp.asarray(poses_init[:, :3, 3])

    err0 = pose_err(R0, t0, poses_gt).mean()
    R1, t1, costs = dense_ba.refine_dense_window(
        frames, R0, t0, ei, ej, iterations=8
    )
    err1 = pose_err(R1, t1, poses_gt).mean()
    assert float(costs[-1]) < float(costs[0])
    assert err1 < 0.35 * err0, (err0, err1)


def test_dense_window_gt_is_fixed_point(rng):
    frames, poses_gt = render_window(rng)
    ei, ej = window_edges(len(poses_gt))
    R0 = jnp.asarray(poses_gt[:, :3, :3])
    t0 = jnp.asarray(poses_gt[:, :3, 3])
    R1, t1, costs = dense_ba.refine_dense_window(frames, R0, t0, ei, ej, iterations=3)
    err = pose_err(R1, t1, poses_gt)
    # interpolation bias of the rendered frames keeps GT from being an exact
    # fixed point; drift must stay at the few-mm level
    assert err.max() < 6e-3, err


def test_dense_window_sharded_matches(rng):
    frames, poses_gt = render_window(rng, n_frames=5)
    poses_init = perturb(poses_gt, rng, scale=0.008)
    ei, ej = window_edges(len(poses_gt))
    # pad to a mesh-divisible edge count with ZERO-weight edges (no
    # double-counting of real constraints)
    pad = (-len(ei)) % 8
    ei_p = jnp.concatenate([ei, jnp.repeat(ei[:1], pad)])
    ej_p = jnp.concatenate([ej, jnp.repeat(ej[:1], pad)])
    ew = jnp.concatenate([jnp.ones(len(ei)), jnp.zeros(pad)]).astype(jnp.float32)
    R0 = jnp.asarray(poses_init[:, :3, :3])
    t0 = jnp.asarray(poses_init[:, :3, 3])

    R1, t1, c1 = dense_ba.refine_dense_window(
        frames, R0, t0, ei_p, ej_p, edge_weights=ew, iterations=3
    )
    mesh = make_mesh()
    R2, t2, c2 = dense_ba.refine_dense_window(
        frames, R0, t0, ei_p, ej_p, edge_weights=ew, iterations=3, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
