"""Distributed multi-keyframe pose-graph refinement (windowed BA backend).

New capability beyond the reference (which tracks frame pairs only): given
a window of keyframe poses and pairwise relative-pose constraints from the
tracker — each with its 6x6 information matrix ``JtWJ`` from the U_IC
solver's uncertainty propagation (algorithms.py:716-721) — jointly refine
all poses with Gauss-Newton on SE(3).

Distribution: edges are sharded over the mesh 'data' axis with
``shard_map``; every device accumulates the H/b contributions of its edge
shard and a ``psum`` over ICI reduces them (the Schur-complement reduction
of the north star); the dense 6Nx6N solve then runs replicated.

Math (twist order [rot, trs], right-perturbation ``T <- T exp(delta)``):
edge (i, j) with measurement ``M = T_meas`` of ``T_j^{-1} T_i``:
``r = Log(M^{-1} T_j^{-1} T_i)``; ``dr/ddelta_i = Jr^{-1}(r) ~ I`` and
``dr/ddelta_j = -Jr^{-1}(r) Adj(T_i^{-1} T_j)`` since the perturbation
passes through ``A = T_j^{-1} T_i`` as
``exp(-d) A = A exp(-Adj(A^{-1}) d)``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.lie import adjoint_se3, compose, exp_se3, inverse, log_se3


class PoseGraph(NamedTuple):
    """A window of keyframe poses and pairwise constraints.

    :param R, t: [N,3,3], [N,3] camera-to-world keyframe poses
    :param edges_i, edges_j: [E] int32 endpoint indices
    :param meas_R, meas_t: [E,...] measured relative poses ``T_j^{-1} T_i``
        (the tracker's pose10 for pair (template=i, live=j))
    :param info: [E,6,6] information matrices (JtWJ), or None for identity
    """

    R: jnp.ndarray
    t: jnp.ndarray
    edges_i: jnp.ndarray
    edges_j: jnp.ndarray
    meas_R: jnp.ndarray
    meas_t: jnp.ndarray
    info: Optional[jnp.ndarray] = None


def edge_residuals(graph: PoseGraph) -> jnp.ndarray:
    """Per-edge se(3) residuals [E,6]."""
    Ri = graph.R[graph.edges_i]
    ti = graph.t[graph.edges_i]
    Rj = graph.R[graph.edges_j]
    tj = graph.t[graph.edges_j]
    Rj_inv, tj_inv = inverse(Rj, tj)
    R_rel, t_rel = compose(Rj_inv, tj_inv, Ri, ti)  # T_j^{-1} T_i
    M_inv_R, M_inv_t = inverse(graph.meas_R, graph.meas_t)
    R_err, t_err = compose(M_inv_R, M_inv_t, R_rel, t_rel)
    return log_se3(R_err, t_err)


def _edge_system(graph: PoseGraph, edges_i, edges_j, meas_R, meas_t, info):
    """H/b contributions of one shard of edges.

    :return: (H [6N,6N], b [6N], cost scalar)
    """
    N = graph.R.shape[0]
    sub = PoseGraph(graph.R, graph.t, edges_i, edges_j, meas_R, meas_t, info)
    r = edge_residuals(sub)  # [E,6]

    Ri = graph.R[edges_i]
    ti = graph.t[edges_i]
    Rj = graph.R[edges_j]
    tj = graph.t[edges_j]
    Ri_inv, ti_inv = inverse(Ri, ti)
    # A^{-1} = T_i^{-1} T_j
    R_ainv, t_ainv = compose(Ri_inv, ti_inv, Rj, tj)
    J_i = jnp.broadcast_to(jnp.eye(6, dtype=r.dtype), (r.shape[0], 6, 6))
    J_j = -adjoint_se3(R_ainv, t_ainv)  # [E,6,6]

    lam = info if info is not None else jnp.broadcast_to(
        jnp.eye(6, dtype=r.dtype), (r.shape[0], 6, 6)
    )

    def blocks(Ja, Jb):
        return jnp.einsum("eki,ekl,elj->eij", Ja, lam, Jb)

    H_ii = blocks(J_i, J_i)
    H_ij = blocks(J_i, J_j)
    H_jj = blocks(J_j, J_j)
    lr = jnp.einsum("eij,ej->ei", lam, r)
    b_i = jnp.einsum("eji,ej->ei", J_i, lr)
    b_j = jnp.einsum("eji,ej->ei", J_j, lr)

    # scatter-add the 6x6 blocks into the dense [6N,6N] system
    H = jnp.zeros((N, N, 6, 6), dtype=r.dtype)
    H = H.at[edges_i, edges_i].add(H_ii)
    H = H.at[edges_i, edges_j].add(H_ij)
    H = H.at[edges_j, edges_i].add(jnp.swapaxes(H_ij, -1, -2))
    H = H.at[edges_j, edges_j].add(H_jj)
    b = jnp.zeros((N, 6), dtype=r.dtype)
    b = b.at[edges_i].add(b_i)
    b = b.at[edges_j].add(b_j)

    H_flat = jnp.transpose(H, (0, 2, 1, 3)).reshape(N * 6, N * 6)
    cost = jnp.sum(r * lr)
    return H_flat, b.reshape(-1), cost


def _gn_update(graph: PoseGraph, H, b, anchor_weight: float, damping: float):
    N = graph.R.shape[0]
    eye = jnp.eye(N * 6, dtype=H.dtype)
    # gauge fix: strong prior pinning pose 0 at its current value
    anchor = jnp.zeros((N * 6,), H.dtype).at[:6].set(anchor_weight)
    H = H + jnp.diag(anchor) + damping * eye
    delta = -jnp.linalg.solve(H, b).reshape(N, 6)
    dR, dt = exp_se3(delta)
    R_new, t_new = compose(graph.R, graph.t, dR, dt)  # right-compose
    return graph._replace(R=R_new, t=t_new)


def refine_pose_graph(
    graph: PoseGraph,
    iterations: int = 10,
    damping: float = 1e-6,
    anchor_weight: float = 1e6,
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Single-device Gauss-Newton refinement.

    :return: (refined graph, per-iteration costs [iterations])
    """

    def body(g, _):
        H, b, cost = _edge_system(
            g, g.edges_i, g.edges_j, g.meas_R, g.meas_t, g.info
        )
        return _gn_update(g, H, b, anchor_weight, damping), cost

    graph, costs = jax.lax.scan(body, graph, None, length=iterations)
    return graph, costs


def refine_pose_graph_sharded(
    graph: PoseGraph,
    mesh,
    iterations: int = 10,
    damping: float = 1e-6,
    anchor_weight: float = 1e6,
    axis: str = "data",
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Mesh-distributed refinement: edge shards accumulate H/b locally and
    psum over the mesh axis; the dense solve is replicated.

    Edge count must be divisible by the mesh axis size (pad with repeated
    zero-information edges if needed).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.shape[axis]
    E = graph.edges_i.shape[0]
    assert E % n_dev == 0, f"pad edges to a multiple of {n_dev} (E={E})"

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    def sharded_system(R, t, ei, ej, mR, mt, inf):
        g = PoseGraph(R, t, ei, ej, mR, mt, inf)
        H, b, cost = _edge_system(g, ei, ej, mR, mt, inf)
        return (
            jax.lax.psum(H, axis),
            jax.lax.psum(b, axis),
            jax.lax.psum(cost, axis),
        )

    info = (
        graph.info
        if graph.info is not None
        else jnp.broadcast_to(jnp.eye(6, dtype=graph.R.dtype), (E, 6, 6))
    )

    @jax.jit
    def run(g):
        def body(gg, _):
            H, b, cost = sharded_system(
                gg.R, gg.t, gg.edges_i, gg.edges_j, gg.meas_R, gg.meas_t, info
            )
            return _gn_update(gg, H, b, anchor_weight, damping), cost

        return jax.lax.scan(body, g, None, length=iterations)

    return run(graph)


def build_window_graph(poses_WC: np.ndarray, pairs, meas, infos=None) -> PoseGraph:
    """Assemble a PoseGraph from numpy poses + tracked pair measurements.

    :param poses_WC: [N,4,4] initial camera-to-world poses
    :param pairs: list of (i, j)
    :param meas: list of (R, t) measured ``T_j^{-1} T_i`` per pair
    :param infos: optional list of [6,6] information matrices
    """
    ei = jnp.asarray([p[0] for p in pairs], jnp.int32)
    ej = jnp.asarray([p[1] for p in pairs], jnp.int32)
    mR = jnp.stack([jnp.asarray(m[0]) for m in meas])
    mt = jnp.stack([jnp.asarray(m[1]) for m in meas])
    info = None if infos is None else jnp.stack([jnp.asarray(i) for i in infos])
    return PoseGraph(
        R=jnp.asarray(poses_WC[:, :3, :3]),
        t=jnp.asarray(poses_WC[:, :3, 3]),
        edges_i=ei,
        edges_j=ej,
        meas_R=mR,
        meas_t=mt,
        info=info,
    )
