"""Dense feature-metric multi-keyframe refinement (direct windowed BA).

Where ``parallel/ba.py`` refines poses against FIXED relative-pose
measurements, this backend re-linearizes the dense uncertainty-normalized
feature-metric residual of every window edge at the current poses on each
Gauss-Newton iteration — direct image alignment jointly over the window,
the multi-frame generalization of the reference's two-view U_IC solver.

Per outer iteration:
1. relative poses ``T_rel = T_j^{-1} T_i`` for all E edges (batched);
2. ONE batched U_IC linearization over the edge axis (frames' feature /
   uncertainty / inverse-depth maps are encoded once per frame and
   indexed per edge) -> per-edge ``(JtWJ_rel [E,6,6], JtR_rel [E,6])``;
3. chain to the global tangent via ``d(delta_rel) = G_i d(delta_i) +
   G_j d(delta_j)`` with ``G_i = I``, ``G_j = -Adj(T_rel^{-1})`` (right
   perturbations), scatter-add into the dense ``[6N,6N]`` system;
4. anchored damped solve, pose update ``T_k <- T_k exp(delta_k)``.

The tracker's GN step solves ``xi = H^{-1} JtR`` and composes
``exp(xi)^{-1}``, i.e. the effective right-increment is ``-xi``; hence the
quadratic model in right-increment coordinates has gradient ``+JtR`` and
Hessian ``JtWJ``, which is what gets chained below.

Distribution: edges shard over the mesh axis, each device linearizes its
shard and the global H/b reduce with ``psum`` (shard_map).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import warp as W
from ..geometry.lie import adjoint_se3, compose, exp_se3, inverse
from ..solvers.jacobians import jtj_jtr, precompute_uic, uic_factors
from ..solvers.residuals import compute_inverse_residuals


class WindowFrames(NamedTuple):
    """Per-frame maps of the refinement window (stacked on axis 0)."""

    feats: jnp.ndarray   # [N,C,H,W]
    sigmas: jnp.ndarray  # [N,C,H,W]
    invD: jnp.ndarray    # [N,1,H,W]
    K: jnp.ndarray       # [N,4]


def edge_linearization(
    frames: WindowFrames, edges_i, edges_j, R_rel, t_rel, remove_tru_sigma=False
):
    """Batched U_IC linearization of all edges at the given relative poses.

    :return: (JtWJ [E,6,6], JtR [E,6], cost [E])
    """
    f0 = frames.feats[edges_i]
    f1 = frames.feats[edges_j]
    s0 = frames.sigmas[edges_i]
    s1 = frames.sigmas[edges_j]
    d0 = frames.invD[edges_i]
    d1 = frames.invD[edges_j]
    K = frames.K[edges_i]
    E, C, H, W_ = f0.shape
    px, py = W.generate_xy_grid(E, H, W_, K)

    pre = precompute_uic(d0, f0, s0, px, py, K)
    out, _, _ = compute_inverse_residuals(
        (R_rel, t_rel), d0, d1, f0, f1, s0, s1, px, py, K,
        remove_tru_sigma=remove_tru_sigma,
    )
    fac = uic_factors(pre, out.res, out.sigma, s0)
    JtWJ, JtR = jtj_jtr(fac, out.weighted_res)
    cost = jnp.sum(out.weighted_res**2, axis=(1, 2, 3))
    return JtWJ, JtR[..., 0], cost


def _assemble(R_rel, t_rel, edges_i, edges_j, JtWJ, JtR, n_poses):
    """Chain per-edge systems into the global [6N,6N] H and [6N] b.

    :param R_rel, t_rel: the relative poses the edges were linearized at
    """
    Rr_inv, tr_inv = inverse(R_rel, t_rel)
    G_j = -adjoint_se3(Rr_inv, tr_inv)  # [E,6,6]; G_i = I

    H_ii = JtWJ
    H_ij = jnp.einsum("eij,ejk->eik", JtWJ, G_j)
    H_jj = jnp.einsum("eji,ejk,ekl->eil", G_j, JtWJ, G_j)
    b_i = JtR
    b_j = jnp.einsum("eji,ej->ei", G_j, JtR)

    Hg = jnp.zeros((n_poses, n_poses, 6, 6), JtWJ.dtype)
    Hg = Hg.at[edges_i, edges_i].add(H_ii)
    Hg = Hg.at[edges_i, edges_j].add(H_ij)
    Hg = Hg.at[edges_j, edges_i].add(jnp.swapaxes(H_ij, -1, -2))
    Hg = Hg.at[edges_j, edges_j].add(H_jj)
    bg = jnp.zeros((n_poses, 6), JtWJ.dtype)
    bg = bg.at[edges_i].add(b_i)
    bg = bg.at[edges_j].add(b_j)
    H_flat = jnp.transpose(Hg, (0, 2, 1, 3)).reshape(n_poses * 6, n_poses * 6)
    return H_flat, bg.reshape(-1)


def refine_dense_window(
    frames: WindowFrames,
    R: jnp.ndarray,
    t: jnp.ndarray,
    edges_i: jnp.ndarray,
    edges_j: jnp.ndarray,
    edge_weights: Optional[jnp.ndarray] = None,
    iterations: int = 5,
    damping: float = 1e-4,
    anchor_weight: float = 1e6,
    remove_tru_sigma: bool = False,
    mesh=None,
    axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jointly refine window poses against dense feature-metric residuals.

    :param R, t: [N,3,3], [N,3] initial camera-to-world poses
    :param edges_i/edges_j: [E] edge endpoints (template=i, live=j)
    :param edge_weights: optional [E] weights; use 0 to pad the edge list
        to a mesh-divisible size without double-counting constraints
    :return: (R [N,...], t [N,...], costs [iterations])
    """
    n_poses = R.shape[0]
    if edge_weights is None:
        edge_weights = jnp.ones_like(edges_i, dtype=R.dtype)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape[axis]
        assert edges_i.shape[0] % n_dev == 0, "pad edges to the mesh size"

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P()),
        )
        def sharded_system(R_, t_, ei, ej, ew):
            Ri = R_[ei]
            ti_ = t_[ei]
            Rj = R_[ej]
            tj = t_[ej]
            Rj_inv, tj_inv = inverse(Rj, tj)
            R_rel, t_rel = compose(Rj_inv, tj_inv, Ri, ti_)
            JtWJ, JtR, cost = edge_linearization(
                frames, ei, ej, R_rel, t_rel, remove_tru_sigma
            )
            JtWJ = JtWJ * ew[:, None, None]
            JtR = JtR * ew[:, None]
            H, b = _assemble(R_rel, t_rel, ei, ej, JtWJ, JtR, n_poses)
            return (
                jax.lax.psum(H, axis),
                jax.lax.psum(b, axis),
                jax.lax.psum(jnp.sum(cost * ew), axis),
            )

        def system(R_, t_):
            return sharded_system(R_, t_, edges_i, edges_j, edge_weights)

    else:

        def system(R_, t_):
            Ri = R_[edges_i]
            ti_ = t_[edges_i]
            Rj = R_[edges_j]
            tj = t_[edges_j]
            Rj_inv, tj_inv = inverse(Rj, tj)
            R_rel, t_rel = compose(Rj_inv, tj_inv, Ri, ti_)
            JtWJ, JtR, cost = edge_linearization(
                frames, edges_i, edges_j, R_rel, t_rel, remove_tru_sigma
            )
            JtWJ = JtWJ * edge_weights[:, None, None]
            JtR = JtR * edge_weights[:, None]
            H, b = _assemble(R_rel, t_rel, edges_i, edges_j, JtWJ, JtR, n_poses)
            return H, b, jnp.sum(cost * edge_weights)

    def body(carry, _):
        R_, t_ = carry
        H, b, cost = system(R_, t_)
        eye = jnp.eye(n_poses * 6, dtype=H.dtype)
        anchor = jnp.zeros((n_poses * 6,), H.dtype).at[:6].set(anchor_weight)
        trace = jnp.trace(H) / (n_poses * 6)
        Hd = H + jnp.diag(anchor) + (damping * trace + 1e-9) * eye
        # tracker convention: step = solve then right-compose exp(delta)^{-1}
        xi = jnp.linalg.solve(Hd, b).reshape(n_poses, 6)
        dR, dt = exp_se3(-xi)
        R_new, t_new = compose(R_, t_, dR, dt)
        return (R_new, t_new), cost

    (R_out, t_out), costs = jax.lax.scan(body, (R, t), None, length=iterations)
    return R_out, t_out, costs
