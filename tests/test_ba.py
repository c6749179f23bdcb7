"""Pose-graph / windowed-BA tests (single-device and mesh-sharded)."""

import numpy as np
import jax
import jax.numpy as jnp

from deep_prob_feature_track_tpu.geometry import lie
from deep_prob_feature_track_tpu.parallel import ba
from deep_prob_feature_track_tpu.parallel.mesh import make_mesh


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.randn(16, 6) * 0.4)
    R, t = lie.exp_se3(xi)
    xi2 = lie.log_se3(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)


def test_adjoint_identity(rng):
    """Adj must satisfy T exp(xi) = exp(Adj(T) xi) T."""
    xi = jnp.asarray(rng.randn(4, 6) * 0.2)
    Tw = jnp.asarray(rng.randn(4, 6) * 0.5)
    R, t = lie.exp_se3(Tw)
    dR, dt = lie.exp_se3(xi)
    lhs = lie.compose(R, t, dR, dt)  # T * exp(xi)
    adj_xi = jnp.einsum("bij,bj->bi", lie.adjoint_se3(R, t), xi)
    aR, at = lie.exp_se3(adj_xi)
    rhs = lie.compose(aR, at, R, t)  # exp(Adj xi) * T
    np.testing.assert_allclose(np.asarray(lhs[0]), np.asarray(rhs[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lhs[1]), np.asarray(rhs[1]), atol=1e-5)


def make_noisy_graph(rng, N=8, noise=0.05, loop_closure=True):
    """Ground-truth random walk + odometry edges with noisy initial poses."""
    poses_gt = [np.eye(4)]
    for _ in range(N - 1):
        xi = np.concatenate([rng.randn(3) * 0.1, rng.randn(3) * 0.3])
        R, t = lie.exp_se3(jnp.asarray(xi[None]))
        T = np.eye(4)
        T[:3, :3] = np.asarray(R)[0]
        T[:3, 3] = np.asarray(t)[0]
        poses_gt.append(poses_gt[-1] @ T)
    poses_gt = np.stack(poses_gt)

    pairs = [(i, i + 1) for i in range(N - 1)]
    if loop_closure:
        pairs += [(0, N - 1), (0, N // 2)]
    meas = []
    for i, j in pairs:
        Tij = np.linalg.inv(poses_gt[j]) @ poses_gt[i]  # exact T_j^-1 T_i
        meas.append((Tij[:3, :3], Tij[:3, 3]))

    poses_init = poses_gt.copy()
    for k in range(1, N):
        xi = rng.randn(6) * noise
        dR, dt = lie.exp_se3(jnp.asarray(xi[None]))
        D = np.eye(4)
        D[:3, :3] = np.asarray(dR)[0]
        D[:3, 3] = np.asarray(dt)[0]
        poses_init[k] = poses_init[k] @ D
    return poses_gt, poses_init, pairs, meas


def pose_errors(poses, poses_gt):
    errs = []
    for T, G in zip(poses, poses_gt):
        D = np.linalg.inv(G) @ T
        errs.append(np.linalg.norm(D[:3, 3]))
    return np.asarray(errs)


def graph_to_mat4(graph):
    N = graph.R.shape[0]
    out = np.tile(np.eye(4), (N, 1, 1))
    out[:, :3, :3] = np.asarray(graph.R)
    out[:, :3, 3] = np.asarray(graph.t)
    return out


def test_pose_graph_refinement_converges(rng):
    poses_gt, poses_init, pairs, meas = make_noisy_graph(rng)
    graph = ba.build_window_graph(poses_init, pairs, meas)
    err0 = pose_errors(poses_init, poses_gt).mean()
    refined, costs = ba.refine_pose_graph(graph, iterations=10)
    err1 = pose_errors(graph_to_mat4(refined), poses_gt).mean()
    assert float(costs[-1]) < float(costs[0]) * 1e-3
    assert err1 < 0.05 * err0, (err0, err1)


def test_pose_graph_respects_information(rng):
    """An edge with huge information should dominate a conflicting weak edge."""
    poses_gt, poses_init, pairs, meas = make_noisy_graph(rng, N=3, loop_closure=False)
    # add a deliberately WRONG but weak edge 0->2
    T02 = np.linalg.inv(poses_gt[2]) @ poses_gt[0]
    wrong = T02.copy()
    wrong[:3, 3] += 0.5
    pairs2 = pairs + [(0, 2)]
    meas2 = meas + [(wrong[:3, :3], wrong[:3, 3])]
    infos = [np.eye(6) * 1e4] * len(pairs) + [np.eye(6) * 1e-4]
    graph = ba.build_window_graph(poses_init, pairs2, meas2, infos)
    refined, _ = ba.refine_pose_graph(graph, iterations=10)
    err = pose_errors(graph_to_mat4(refined), poses_gt)
    assert err.mean() < 0.01, err


def test_sharded_matches_single_device(rng):
    poses_gt, poses_init, pairs, meas = make_noisy_graph(rng, N=9)
    # pad edges to a multiple of 8 by repeating with zero information
    E = len(pairs)
    n_pad = (-E) % 8
    infos = [np.eye(6)] * E + [np.zeros((6, 6))] * n_pad
    pairs = pairs + [pairs[0]] * n_pad
    meas = meas + [meas[0]] * n_pad
    graph = ba.build_window_graph(poses_init, pairs, meas, infos)

    refined_single, costs_single = ba.refine_pose_graph(graph, iterations=5)
    mesh = make_mesh()
    refined_sharded, costs_sharded = ba.refine_pose_graph_sharded(
        graph, mesh, iterations=5
    )
    np.testing.assert_allclose(
        np.asarray(costs_single), np.asarray(costs_sharded), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(refined_single.t), np.asarray(refined_sharded.t), atol=1e-5
    )
