"""Non-learned baseline trackers with the ``batch_track`` duck-type.

The reference wraps Open3D's ICP / RGB-D odometry (code/tools/ICP.py,
code/tools/rgbd_odometry.py) behind a ``batch_track(color0, depth0,
color1, depth1, K) -> (R, t)`` interface that the evaluation loop treats
interchangeably with the network.  Open3D is CPU-only and unavailable
here; these baselines run the same classical objectives (multiscale
point-to-plane ICP; photometric / hybrid RGB-D odometry) on TPU through
this framework's own solver layer — batched over pairs instead of looping
the batch on the host.  The reference's divergence guard (||t|| > 1 ->
reset to identity, ICP.py:180-192) is preserved.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class _BaseTracker:
    def __init__(self):
        self._jit = None

    def _build(self):
        raise NotImplementedError

    def batch_track(
        self, color0, depth0, color1, depth1, K, batch_objmask0=None, batch_objmask1=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        if self._jit is None:
            self._jit = self._build()
        R, t = self._jit(
            jnp.asarray(np.asarray(color0)),
            jnp.asarray(np.asarray(depth0)),
            jnp.asarray(np.asarray(color1)),
            jnp.asarray(np.asarray(depth1)),
            jnp.asarray(np.asarray(K)),
        )
        R = np.asarray(R)
        t = np.asarray(t)
        # divergence guard: reset to identity (ref ICP.py:180-192)
        bad = np.linalg.norm(t, axis=-1) > 1.0
        if bad.any():
            R = R.copy()
            t = t.copy()
            R[bad] = np.eye(3)
            t[bad] = 0.0
        return R, t


class ICPOdometry(_BaseTracker):
    """Geometric ICP baselines (ref tools/ICP.py modes).

    ``mode``:

    * ``'Point2Plane'`` — multiscale point-to-plane (ref ICP.py:101-126),
      ``max_iter`` GN iterations per pyramid level (Open3D default 10)
    * ``'Point2Point'`` — single-scale point-to-point with projective
      association (ref ICP.py:94-99; KD-tree NN association replaced by
      the jittable projective variant)
    * ``'Iter_Point2Plane'`` — coarse-to-fine schedule with the reference's
      per-scale iteration counts [50, 30, 14] (ref ICP.py:138-168: 3 voxel
      scales; here 3 pyramid scales — the image-space analogue of voxel
      downsampling)
    """

    _ITER_SCHEDULE = ((2, 50), (1, 30), (0, 14))  # ref ICP.py:140-141

    def __init__(self, mode: str = "Point2Plane", max_iter: int = 10, levels=(3, 2, 1, 0)):
        super().__init__()
        if mode not in ("Point2Plane", "Point2Point", "Iter_Point2Plane"):
            raise NotImplementedError(mode)
        self.mode = mode
        self.max_iter = max_iter
        self.levels = levels

    def _build(self):
        import jax
        import jax.numpy as jnp

        from ..geometry.warp import scale_K
        from ..ops.image import image_pyramid
        from ..solvers.icp import ICPSigmaModel
        from ..solvers.trust_region import tr_icp_level, tr_icp_point_level

        mode = self.mode
        if mode == "Iter_Point2Plane":
            schedule = self._ITER_SCHEDULE
        else:
            schedule = tuple((lvl, self.max_iter) for lvl in self.levels)

        @jax.jit
        def track(color0, depth0, color1, depth1, K):
            B = depth0.shape[0]
            d0 = image_pyramid(depth0, pool="max")
            d1 = image_pyramid(depth1, pool="max")
            pose = (
                jnp.broadcast_to(jnp.eye(3, dtype=depth0.dtype), (B, 3, 3)),
                jnp.zeros((B, 3), depth0.dtype),
            )
            if mode == "Point2Point":
                # single-scale like the reference (0.02 max-corr dist on the
                # full cloud); a short coarse warm-up keeps projective
                # association in its convergence basin
                pose, _ = tr_icp_point_level(
                    pose, d0[2], d1[2], scale_K(K, 2), max_iter=10, dist_thr=0.10
                )
                pose, _ = tr_icp_point_level(
                    pose, d0[0], d1[0], K, max_iter=30, dist_thr=0.05
                )
                return pose
            for lvl, iters in schedule:
                pose, _, _ = tr_icp_level(
                    pose, d0[lvl], d1[lvl], scale_K(K, lvl),
                    max_iter=iters, direction="inverse",
                    sigma_model=ICPSigmaModel(baseline=1.0),
                )
            return pose

        return track


class RGBDOdometry(_BaseTracker):
    """Photometric (color-term) or hybrid RGB-D odometry.

    Mirrors ``tools/rgbd_odometry.py``: the 'color' term is grayscale
    photometric IC Gauss-Newton; 'hybrid' additionally fuses the
    point-to-plane ICP term into the same normal equations with a fixed
    scale (the classical Park et al. style balance).

    ``schedule`` overrides the per-level (level, iterations) plan; the
    reference's iterative colored-ICP plan [50, 30, 14] over 3 scales
    (ref ICP.py:138-141, 169-175) is ``((2, 50), (1, 30), (0, 14))``.
    """

    def __init__(
        self,
        term: str = "hybrid",
        max_iter: int = 10,
        icp_scale: float = 0.2,
        schedule=None,
    ):
        super().__init__()
        assert term in ("color", "hybrid")
        self.term = term
        self.max_iter = max_iter
        self.icp_scale = icp_scale
        self.schedule = (
            tuple(schedule)
            if schedule is not None
            else tuple((lvl, max_iter) for lvl in (3, 2, 1, 0))
        )

    def _build(self):
        import jax
        import jax.numpy as jnp

        from ..geometry.warp import scale_K
        from ..models.layers import color_normalize_nchw
        from ..ops.image import image_pyramid
        from ..solvers.trust_region import tr_uic_level

        term = self.term
        icp_scale = self.icp_scale
        schedule = self.schedule

        @jax.jit
        def track(color0, depth0, color1, depth1, K):
            B = depth0.shape[0]
            I0 = color_normalize_nchw(color0)
            I1 = color_normalize_nchw(color1)
            g0 = (I0[:, 0] * 0.299 + I0[:, 1] * 0.587 + I0[:, 2] * 0.114)[:, None]
            g1 = (I1[:, 0] * 0.299 + I1[:, 1] * 0.587 + I1[:, 2] * 0.114)[:, None]
            invD0 = jnp.clip(1.0 / depth0, 0.0, 10.0)
            invD1 = jnp.clip(1.0 / depth1, 0.0, 10.0)
            f0 = image_pyramid(g0)
            f1 = image_pyramid(g1)
            iv0 = image_pyramid(invD0, pool="max")
            iv1 = image_pyramid(invD1, pool="max")
            dp0 = image_pyramid(depth0, pool="max")
            dp1 = image_pyramid(depth1, pool="max")
            pose = (
                jnp.broadcast_to(jnp.eye(3, dtype=depth0.dtype), (B, 3, 3)),
                jnp.zeros((B, 3), depth0.dtype),
            )

            def fixed_scale(icp_res, feat_res, wp):
                return jnp.ones_like(icp_res) * icp_scale

            for lvl, iters in schedule:
                ones = jnp.ones_like(f0[lvl])
                pose, _, _ = tr_uic_level(
                    pose, f0[lvl], f1[lvl], iv0[lvl], iv1[lvl], scale_K(K, lvl),
                    ones, ones,
                    depth0=dp0[lvl], depth1=dp1[lvl],
                    scale_fn=fixed_scale,
                    max_iter=iters,
                    combine_icp=(term == "hybrid"),
                )
            return pose

        return track
