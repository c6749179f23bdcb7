"""LeastSquareTracking facade: encoder + coarse-to-fine trust-region solver.

TPU-native rewrite of ``code/models/LeastSquareTracking.py``: selects the
encoder (RGB / ConvRGBD / ConvRGBD2 / ICP), the track type (IC / U_IC /
U_FC / ICP) from (uncertainty_type, direction), runs preprocessing
(inverse-depth truncation, color normalization, two-view feature pyramids,
depth/mask pyramids, learned pose initialization) and the 4-level
coarse-to-fine solve with per-level intrinsics ``K / 2^l`` and chained
prior weights.  Training returns all per-level poses for deep supervision;
eval returns the final pose (ref LeastSquareTracking.py:314-577).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..geometry import warp as W
from ..solvers import trust_region as TR
from ..solvers.icp import ICPSigmaModel
from .encoder import FeaturePyramid
from .layers import color_normalize_nchw
from .nets import DampingRegressor, DeepRobustEstimator, PoseNet, ScaleNet, SFMPoseNet

Pose = Tuple[jnp.ndarray, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Typed configuration tree (replaces the reference's argparse groups,
    code/config.py:7-103).  Defaults are the paper configuration
    (scripts/eval_tum_rgbd.sh)."""

    encoder_name: str = "ConvRGBD2"  # RGB | ConvRGBD | ConvRGBD2 | ICP
    uncertainty_type: str = "laplacian"
    direction: str = "inverse"  # inverse | forward
    max_iter_per_pyr: int = 3
    mest_type: str = "None"  # None | MultiScale2w
    solver_type: str = "Direct-Nodamping"  # Direct-Nodamping | Direct-ResVol
    tr_samples: int = 10
    feature_channel: int = 8
    uncertainty_channel: int = 1
    feature_extract: str = "conv"  # 1by1 | conv | skip | average | prob_fuse
    combine_icp: bool = False
    scaler: str = "None"  # None | oneResidual | twoResidual | MultiScale2w | expMultiScale
    scale_scaler: Optional[float] = None
    remove_tru_sigma: bool = True
    init_pose_type: str = "sfm_net"  # identity | sfm_net | dense_net
    train_init_pose: bool = True
    scale_init_pose: float = 0.01
    multi_hypo: str = "prob_fuse"  # None | average | prob_fuse
    res_input: bool = False
    uncer_prop: bool = False
    no_weight_sharing: bool = False
    scale_icp: float = 0.01

    @property
    def track_type(self) -> str:
        """Track selection (ref LeastSquareTracking.py:195-293)."""
        if self.uncertainty_type == "ICP":
            return "ICP"
        if self.uncertainty_type == "None" and self.direction == "inverse":
            return "IC"
        if self.uncertainty_type != "None" and self.direction == "forward":
            return "U_FC"
        if self.uncertainty_type != "None" and self.direction == "inverse":
            return "U_IC"
        raise ValueError("unsupported (uncertainty, direction) combination")

    @property
    def predicts_init_pose(self) -> bool:
        return self.init_pose_type != "identity"


class LeastSquareTracking(nn.Module):
    """Deep probabilistic feature-metric tracker (flax module).

    ``__call__(img0, img1, depth0, depth1, K)`` -> pose (eval) or stacked
    per-level poses (train).
    """

    cfg: TrackerConfig = TrackerConfig()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        n_instances = 4 if cfg.no_weight_sharing else 1

        if cfg.encoder_name in ("ConvRGBD", "ConvRGBD2"):
            enc_cls = FeaturePyramid
            if os.environ.get("DPFT_REMAT_ENCODER") == "1":
                # full-recompute checkpoint of the encoder: pairs with
                # DPFT_TRAIN_LOOP=scan_remat to fit 480x640 training
                # (docs/PERF.md "rematerialized training loop"); train is
                # the static arg (position 2 of __call__)
                enc_cls = nn.remat(FeaturePyramid, static_argnums=(2,))
            self.encoder = enc_cls(
                feature_channel=cfg.feature_channel,
                uncertainty_channel=cfg.uncertainty_channel,
                feature_extract=cfg.feature_extract,
                uncertainty_type=cfg.uncertainty_type,
                dtype=self.dtype,
            )
        else:
            self.encoder = None

        self.mests = [
            DeepRobustEstimator(cfg.mest_type, dtype=self.dtype)
            for _ in range(n_instances)
        ]
        self.scalers = [
            ScaleNet(
                cfg.scaler,
                scale=cfg.scale_scaler if cfg.scale_scaler is not None else 0.01,
                dtype=self.dtype,
            )
            for _ in range(n_instances)
        ]
        if cfg.solver_type == "Direct-ResVol":
            self.damping_nets = [DampingRegressor(dtype=self.dtype) for _ in range(n_instances)]
        else:
            self.damping_nets = None

        if cfg.predicts_init_pose:
            if cfg.init_pose_type == "sfm_net":
                self.pose_predictor = SFMPoseNet(
                    scale_motion=cfg.scale_init_pose,
                    multi_hypo=cfg.multi_hypo,
                    res_input=cfg.res_input,
                    dtype=self.dtype,
                )
            elif cfg.init_pose_type == "dense_net":
                self.pose_predictor = PoseNet(
                    scale_motion=cfg.scale_init_pose, dtype=self.dtype
                )
            else:
                raise ValueError(cfg.init_pose_type)
        else:
            self.pose_predictor = None

    # ------------------------------------------------------------------
    def _instance(self, modules, level: int):
        return modules[level] if self.cfg.no_weight_sharing else modules[0]

    # sigma activations whose channels are statically known to be copies of
    # channel 0: the encoder broadcasts a 1-channel head to every feature
    # channel (encoder.py::_extract_sigma, ref algorithms.py:1426-1427), and
    # "identity" is all-ones by construction
    _BCAST_SIGMA_TYPES = (
        "gaussian", "laplacian", "sigmoid", "old_gaussian", "old_laplacian",
        "identity",
    )

    def _slim_sigma(self, sigmas):
        """Drop statically-redundant broadcast sigma channels before the
        solver.

        The paper config (uncertainty_channel=1, feature_channel=8) emits a
        1-channel sigma head that the encoder repeats to 8 channels for
        reference parity — but bilinear warping is per-channel linear and
        every solver consumer broadcasts, so carrying the copies through the
        hot path only inflates the stacked warp operand (U_IC: C=17 -> 10,
        U_FC: 49 -> 28) and the gather-VJP residual maps, the dominant
        train-memory/time terms (docs/PERF.md).  C=10 is also exactly the
        regime where the tile-slab grads kernel beats the XLA gather
        (TILES_r04.json: 49.8 vs 65.4 ms VGA, 23.6 vs 31.2 level-0, while
        C=17/Cp=32 loses).  Values are bitwise-identical; pose parity with
        the broadcast path is pinned in tests/test_tracker.py.
        ``DPFT_SLIM_SIGMA=0`` restores the broadcast layout for A/B.
        """
        cfg = self.cfg
        if os.environ.get("DPFT_SLIM_SIGMA", "1") == "0":
            return sigmas
        if cfg.uncertainty_type not in self._BCAST_SIGMA_TYPES:
            return sigmas
        if cfg.uncertainty_type != "identity" and cfg.uncertainty_channel != 1:
            return sigmas
        return [None if s is None else s[:, :1] for s in sigmas]

    def _functional(self, mod):
        """Pure clone-apply twin of a bound submodule, for GN-loop bodies.

        Bound flax modules cannot be applied across a JAX transform
        boundary (lax.scan / jax.checkpoint / fori_loop) from outside a
        lifted transform — their scope state raises UnexpectedTracerError.
        Capturing the module's variables here and re-applying an unbound
        clone makes the callable a plain array function, so the solver
        loops stay scannable (DPFT_TRAIN_LOOP=scan_remat) for every track.

        BatchNorm caveats: batch_stats UPDATES from the pure calls are
        dropped (the train path re-applies the bound module once PER
        ITERATION after the loop, on the stacked per-iteration residuals,
        reproducing the reference's compounded EMA — see
        tr_ufc_level(register_stats=...)).
        Returns None while initializing: parameters do not exist yet, and
        the unrolled bound path is what creates them.
        """
        if self.is_initializing():
            return None
        variables = mod.variables
        unbound = mod.clone(parent=None)

        def fn(*args, **kwargs):
            out = unbound.apply(variables, *args, mutable=["batch_stats"],
                                **kwargs)
            return out[0]

        return fn

    def _solver(self, level: int) -> TR.DirectSolver:
        cfg = self.cfg
        if cfg.solver_type == "Direct-ResVol":
            net = self._instance(self.damping_nets, level)
            # DampingRegressor is BN-free, so its pure twin is exact in
            # every mode; the bound module is only needed during init
            pure = self._functional(net)
            return TR.DirectSolver(
                kind="resvol",
                direction=cfg.direction,
                samples=cfg.tr_samples,
                damping_mlp=pure if pure is not None else net,
                damping_pure=pure is not None,
            )
        return TR.DirectSolver(kind="nodamping", direction=cfg.direction)

    def _encode(self, I0, invD0, I1, invD1, train: bool):
        """Per-frame feature/uncertainty pyramids (ref :579-597)."""
        from ..ops.image import image_pyramid

        cfg = self.cfg
        if cfg.encoder_name in ("RGB", "ICP"):
            gray = (
                I0[:, 0] * 0.299 + I0[:, 1] * 0.587 + I0[:, 2] * 0.114
            )[:, None]
            x = image_pyramid(gray)
            sigma = [jnp.ones_like(a) for a in x]
            return x, sigma, x
        if cfg.encoder_name == "ConvRGBD":
            m = jnp.concatenate([I0, invD0], axis=1)
        else:  # ConvRGBD2
            m = jnp.concatenate([I0, invD0, I1, invD1], axis=1)
        # positional train: nn.remat's static_argnums needs it positional
        return self.encoder(m, train)

    def _preprocess(
        self, img0, img1, depth0, depth1, pose_init, obj_mask0, obj_mask1, train: bool
    ):
        """Input conditioning (ref LeastSquareTracking.py:653-699)."""
        from ..ops.image import image_pyramid

        cfg = self.cfg
        invD0 = jnp.clip(1.0 / depth0, 0.0, 10.0)
        invD1 = jnp.clip(1.0 / depth1, 0.0, 10.0)
        # zero out truncated inverse depths (tensor-global min/max, matching
        # the reference's boolean-indexed assignment :656-661)
        invD0 = jnp.where((invD0 == invD0.min()) | (invD0 == invD0.max()), 0.0, invD0)
        invD1 = jnp.where((invD1 == invD1.min()) | (invD1 == invD1.max()), 0.0, invD1)

        I0 = color_normalize_nchw(img0)
        I1 = color_normalize_nchw(img1)

        if cfg.encoder_name == "ConvRGBD2" and not train:
            # both view orders in ONE stacked encoder pass (the reference
            # runs two sequential forwards, LeastSquareTracking.py:666-667;
            # eval outputs are identical and dispatch count halves).  In
            # training, two forwards are kept so BatchNorm batch statistics
            # match the reference's training dynamics exactly.
            B = img0.shape[0]
            m = jnp.concatenate(
                [
                    jnp.concatenate([I0, invD0, I1, invD1], axis=1),
                    jnp.concatenate([I1, invD1, I0, invD0], axis=1),
                ],
                axis=0,
            )
            f_all, s_all, raw_all = self.encoder(m, train)
            x0 = [f[:B] for f in f_all]
            x1 = [f[B:] for f in f_all]
            sigma0 = [None if s is None else s[:B] for s in s_all]
            sigma1 = [None if s is None else s[B:] for s in s_all]
            raw0 = [r[:B] for r in raw_all]
            raw1 = [r[B:] for r in raw_all]
        else:
            x0, sigma0, raw0 = self._encode(I0, invD0, I1, invD1, train)
            x1, sigma1, raw1 = self._encode(I1, invD1, I0, invD0, train)

        # solver math always runs in f32 (bf16 encoders cast up here)
        def _f32(lst):
            return [None if a is None else a.astype(jnp.float32) for a in lst]

        x0, x1, sigma0, sigma1 = _f32(x0), _f32(x1), _f32(sigma0), _f32(sigma1)
        sigma0 = self._slim_sigma(sigma0)
        sigma1 = self._slim_sigma(sigma1)
        inv_d0 = image_pyramid(invD0, pool="max")
        inv_d1 = image_pyramid(invD1, pool="max")

        need_depth = cfg.track_type in ("U_FC", "ICP") or cfg.combine_icp
        dpt0_pyr = image_pyramid(depth0, pool="max") if need_depth else [None] * 4
        dpt1_pyr = image_pyramid(depth1, pool="max") if need_depth else [None] * 4
        m0_pyr = image_pyramid(obj_mask0) if obj_mask0 is not None else [None] * 4
        m1_pyr = image_pyramid(obj_mask1) if obj_mask1 is not None else [None] * 4

        if pose_init is None:
            if cfg.predicts_init_pose:
                R0, t0 = self.pose_predictor(raw0[3], raw1[3], train=train)
                R0 = R0.astype(jnp.float32)
                t0 = t0.astype(jnp.float32)
            else:
                B = invD0.shape[0]
                R0 = jnp.broadcast_to(jnp.eye(3, dtype=self.dtype), (B, 3, 3))
                t0 = jnp.zeros((B, 3), dtype=self.dtype)
            pose_init = (R0, t0)

        return (x0, x1, sigma0, sigma1, dpt0_pyr, dpt1_pyr, inv_d0, inv_d1, m0_pyr, m1_pyr, pose_init)

    def _level_update(
        self, level, pose, x0, x1, sigma0, sigma1, inv_d0, inv_d1,
        dpt0, dpt1, K_l, w_prior, m0, m1, train: bool,
    ):
        """Dispatch one pyramid level to the configured track."""
        cfg = self.cfg
        tt = cfg.track_type
        if tt == "U_IC":
            mest = self._instance(self.scalers, level)

            def scale_fn(icp_res, feat_res, wp):
                return mest(icp_res, feat_res, wp, train=train)

            pose, weights, JtWJ = TR.tr_uic_level(
                pose, x0, x1, inv_d0, inv_d1, K_l, sigma0, sigma1,
                w_prior=w_prior, depth0=dpt0, depth1=dpt1,
                obj_mask0=m0, obj_mask1=m1,
                scale_fn=scale_fn,
                max_iter=cfg.max_iter_per_pyr,
                remove_tru_sigma=cfg.remove_tru_sigma,
                combine_icp=cfg.combine_icp,
                unroll=train,  # scan-residual layouts pad badly in backprop
            )
            return pose, weights, JtWJ
        if tt == "IC":
            mest = self._instance(self.mests, level)

            def mest_fn(res, f0, f1, wp):
                return mest(res, f0, f1, wp, train=train)

            pose, weights, JtWJ = TR.tr_ic_level(
                pose, x0, x1, inv_d0, inv_d1, K_l, mest_fn, self._solver(level),
                w_prior=w_prior, obj_mask0=m0, obj_mask1=m1,
                max_iter=cfg.max_iter_per_pyr, unroll=train,
            )
            return pose, weights, JtWJ
        if tt == "U_FC":
            mest = self._instance(self.mests, level)

            def mest_fn(res, f0, f1, wp):
                return mest(res, f0, f1, wp, train=train)

            # "None"/"Huber" estimators touch no variables, so the bound
            # closure is already loop-safe; a learned estimator gets a
            # pure clone-apply twin for the loop body (None during init:
            # the unrolled bound calls create the parameters)
            stateless = cfg.mest_type in ("None", "Huber")
            mest_pure = None if stateless else self._functional(mest)
            if mest_pure is not None:
                def mest_loop_fn(res, f0, f1, wp):
                    return mest_pure(res, f0, f1, wp, train=train)
            else:
                mest_loop_fn = mest_fn

            pose, weights, JtWJ = TR.tr_ufc_level(
                pose, x0, x1, dpt0, dpt1, K_l, sigma0, sigma1,
                mest_fn, self._solver(level), w_prior=w_prior,
                obj_mask0=m0, obj_mask1=m1,
                max_iter=cfg.max_iter_per_pyr,
                unroll=train,
                mest_loop_fn=mest_loop_fn,
                loop_pure=stateless or mest_pure is not None,
                register_stats=train and mest_pure is not None,
            )
            return pose, weights, JtWJ
        if tt == "ICP":
            pose, weights, JtWJ = TR.tr_icp_level(
                pose, dpt0, dpt1, K_l, w_prior=w_prior, obj_mask1=m1,
                max_iter=cfg.max_iter_per_pyr, direction=cfg.direction,
                sigma_model=ICPSigmaModel(baseline=1.0), unroll=train,
            )
            return pose, weights, JtWJ
        raise ValueError(tt)

    # ------------------------------------------------------------------
    def __call__(
        self,
        img0,
        img1,
        depth0,
        depth1,
        K,
        obj_mask0=None,
        obj_mask1=None,
        train: bool = False,
    ):
        """Full coarse-to-fine tracking (ref LeastSquareTracking.py:314-577).

        :param img0/img1: [B,3,H,W] RGB in [0,1]
        :param depth0/depth1: [B,1,H,W] metric depth
        :param K: [B,4] intrinsics [fx,fy,cx,cy]
        :return: eval: final pose (R, t); train: (pyr_R [B,N,3,3],
            pyr_t [B,N,3][, sigma_ksi [B,N,6,6]])
        """
        import jax

        cfg = self.cfg
        with jax.named_scope("preprocess_encode"):
            (x0, x1, sigma0, sigma1, dpt0_pyr, dpt1_pyr, inv_d0, inv_d1, m0_pyr, m1_pyr, pose) = (
                self._preprocess(img0, img1, depth0, depth1, None, obj_mask0, obj_mask1, train)
            )

        poses_R: List[jnp.ndarray] = []
        poses_t: List[jnp.ndarray] = []
        sigma_ksi: List[jnp.ndarray] = []
        if cfg.predicts_init_pose and cfg.train_init_pose:
            poses_R.append(pose[0])
            poses_t.append(pose[1])
            if cfg.uncer_prop:
                B = inv_d0[0].shape[0]
                sigma_ksi.append(jnp.broadcast_to(jnp.eye(6, dtype=self.dtype), (B, 6, 6)))

        w_prior = jnp.ones_like(inv_d0[3]) * 0.001
        for level in (3, 2, 1, 0):
            K_l = W.scale_K(K, level)
            with jax.named_scope(f"trust_region_level{level}"):
                pose, w_prior, JtWJ = self._level_update(
                    level, pose, x0[level], x1[level], sigma0[level], sigma1[level],
                    inv_d0[level], inv_d1[level], dpt0_pyr[level], dpt1_pyr[level],
                    K_l, w_prior, m0_pyr[level], m1_pyr[level], train,
                )
            poses_R.append(pose[0])
            poses_t.append(pose[1])
            if cfg.uncer_prop:
                sigma_ksi.append(JtWJ)

        if train:
            pyr_R = jnp.stack(poses_R, axis=1)
            pyr_t = jnp.stack(poses_t, axis=1)
            if cfg.uncer_prop:
                return pyr_R, pyr_t, jnp.stack(sigma_ksi, axis=1)
            return pyr_R, pyr_t
        if cfg.uncer_prop:
            # eval with uncertainty propagation: the final-level 6x6 pose
            # information matrix rides along (consumed by the BA backend)
            return pose, sigma_ksi[-1]
        return pose

    def compute_residual(
        self,
        img0,
        img1,
        depth0,
        depth1,
        K,
        pose_init: Optional[Pose] = None,
        level: int = 0,
        obj_mask0=None,
        obj_mask1=None,
    ):
        """Average residual at a given pose & level (convergence-basin study,
        ref LeastSquareTracking.py:605-651).

        :return: (pose, avg_residual [B])
        """
        cfg = self.cfg
        (x0, x1, sigma0, sigma1, dpt0_pyr, dpt1_pyr, inv_d0, inv_d1, m0_pyr, m1_pyr, pose) = (
            self._preprocess(img0, img1, depth0, depth1, pose_init, obj_mask0, obj_mask1, False)
        )
        i = level
        K_i = W.scale_K(K, i)
        w_prior = jnp.ones_like(inv_d0[i]) * 0.01
        tt = cfg.track_type
        if tt == "U_IC":
            scaler = self._instance(self.scalers, i)

            def scale_fn(icp_res, feat_res, wp):
                return scaler(icp_res, feat_res, wp)

            loss = TR.tr_uic_residual(
                pose, x0[i], x1[i], inv_d0[i], inv_d1[i], K_i, sigma0[i], sigma1[i],
                w_prior=w_prior, depth0=dpt0_pyr[i], depth1=dpt1_pyr[i],
                obj_mask0=m0_pyr[i], obj_mask1=m1_pyr[i], scale_fn=scale_fn,
                remove_tru_sigma=cfg.remove_tru_sigma, combine_icp=cfg.combine_icp,
            )
        elif tt == "IC":
            mest = self._instance(self.mests, i)
            w_prior = jnp.ones_like(inv_d0[i])

            def mest_fn(res, f0, f1, wp):
                return mest(res, f0, f1, wp)

            loss = TR.tr_ic_residual(
                pose, x0[i], x1[i], inv_d0[i], inv_d1[i], K_i, mest_fn,
                w_prior=w_prior, obj_mask0=m0_pyr[i], obj_mask1=m1_pyr[i],
            )
        elif tt == "U_FC":
            loss = TR.tr_ufc_residual(
                pose, x0[i], x1[i], dpt0_pyr[i], dpt1_pyr[i], K_i, sigma0[i], sigma1[i],
            )
        elif tt == "ICP":
            loss = TR.tr_icp_residual(
                pose, dpt0_pyr[i], dpt1_pyr[i], K_i,
                sigma_model=ICPSigmaModel(baseline=1.0),
            )
        else:
            raise ValueError(tt)
        return pose, loss

    def track_diagnostics(
        self,
        img0,
        img1,
        depth0,
        depth1,
        K,
        obj_mask0=None,
        obj_mask1=None,
    ):
        """Coarse-to-fine solve that also returns per-level visual
        diagnostics: the encoded feature / uncertainty pyramids and the
        warped weighted-residual map at each level's final pose.

        TPU-native analogue of the reference's in-loop ``cv2.imshow``
        debugging (ref algorithms.py:695-710 residual mosaics,
        LeastSquareTracking.py:448-566 feature/sigma visualization): the
        solve stays pure and jittable; the caller (``apps/evaluate.py
        --save_img``) renders the returned arrays to PNG mosaics on host
        via ``utils/display``.

        :return: ``(pose, diag)`` where ``diag`` maps name -> list indexed
            by pyramid level (0 = finest): ``features0/1``, ``sigma0/1``,
            ``residual`` (weighted residual map at the post-level pose),
            ``invalid`` (bool mask), ``poses`` (per-level (R, t)),
            ``matches`` (per-level ``(coords [B,2,N], valid [B,N])`` —
            where a strided grid of frame-0 pixels lands in frame 1 under
            the final level pose; feed to
            ``utils/display.visualize_matches_on_image``, the headless
            twin of ref tools/display.py:168-194).
        """
        from ..solvers.residuals import (
            compute_inverse_residuals,
            compute_warped_residual,
        )

        cfg = self.cfg
        (x0, x1, sigma0, sigma1, dpt0_pyr, dpt1_pyr, inv_d0, inv_d1, m0_pyr, m1_pyr, pose) = (
            self._preprocess(img0, img1, depth0, depth1, None, obj_mask0, obj_mask1, False)
        )
        # visualization consumers expect the sigma channel count to match
        # the feature channel count; _slim_sigma may have reduced the
        # broadcast maps to C=1 on the solver path (round-4 advisor), so
        # re-broadcast for the diagnostics dict (values identical — the
        # slimmed channels are exact copies of channel 0 by construction)
        def _viz_sigma(sigmas, feats):
            return [
                s if s is None or s.shape[1] == f.shape[1]
                else jnp.broadcast_to(s, (s.shape[0], f.shape[1]) + s.shape[2:])
                for s, f in zip(sigmas, feats)
            ]

        diag = {
            "features0": x0,
            "features1": x1,
            "sigma0": _viz_sigma(sigma0, x0),
            "sigma1": _viz_sigma(sigma1, x1),
            "residual": [None] * 4,
            "invalid": [None] * 4,
            "poses": [None] * 4,
            "matches": [None] * 4,
        }
        w_prior = jnp.ones_like(inv_d0[3]) * 0.001
        for level in (3, 2, 1, 0):
            K_l = W.scale_K(K, level)
            pose, w_prior, _ = self._level_update(
                level, pose, x0[level], x1[level], sigma0[level], sigma1[level],
                inv_d0[level], inv_d1[level], dpt0_pyr[level], dpt1_pyr[level],
                K_l, w_prior, m0_pyr[level], m1_pyr[level], train=False,
            )
            B, _, H, W_ = inv_d0[level].shape
            tt = cfg.track_type
            if tt in ("U_IC", "IC"):
                px, py = W.generate_xy_grid(B, H, W_, K_l)
                u, v, _ = W.batch_warp_inverse_depth(
                    px, py, inv_d0[level], pose, K_l
                )
                if tt == "U_IC":
                    out, _, _ = compute_inverse_residuals(
                        pose, inv_d0[level], inv_d1[level], x0[level], x1[level],
                        sigma0[level], sigma1[level], px, py, K_l,
                        obj_mask0=m0_pyr[level], obj_mask1=m1_pyr[level],
                        remove_tru_sigma=cfg.remove_tru_sigma,
                    )
                    res_map, invalid = out.weighted_res, out.invalid
                else:
                    res_map, invalid = compute_warped_residual(
                        pose, inv_d0[level], inv_d1[level], x0[level], x1[level],
                        px, py, K_l, obj_mask0=m0_pyr[level], obj_mask1=m1_pyr[level],
                    )
            elif tt == "U_FC":
                u, v, dpt_r, depth_valid, _, _ = TR._warp_forward_depth(
                    dpt0_pyr[level], pose, K_l
                )
                occ = W.check_occ(dpt_r, dpt1_pyr[level], u, v) | ~depth_valid
                f_r = W.warp_features(x1[level], u, v)
                s_r = W.warp_features(sigma1[level], u, v)
                res = f_r - x0[level]
                sig = jnp.sqrt(s_r * s_r + sigma0[level] * sigma0[level])
                res_map = jnp.where(occ, 1e-6, res / sig)
                invalid = occ
            else:  # ICP: warped-depth discrepancy (the point-to-plane input)
                u, v, dpt_r, depth_valid, _, _ = TR._warp_forward_depth(
                    dpt0_pyr[level], pose, K_l
                )
                dpt1_w = W.warp_features(dpt1_pyr[level], u, v)
                occ = W.check_occ(dpt_r, dpt1_pyr[level], u, v) | ~depth_valid
                res_map = jnp.where(occ, 0.0, dpt1_w - dpt_r)
                invalid = occ
            # sparse correspondence grid: where a strided grid of frame-0
            # pixels lands in frame 1 under this level's final pose (the
            # data ref tools/display.py:168-194 draws as match dots);
            # strided (static) rather than masked so the solve stays
            # jittable — invalid grid points are flagged, not dropped
            sh, sw = max(H // 8, 1), max(W_ // 8, 1)
            us = u[:, 0, ::sh, ::sw].reshape(B, -1)
            vs = v[:, 0, ::sh, ::sw].reshape(B, -1)
            ok = ~invalid[:, :1, ::sh, ::sw].reshape(B, -1)
            diag["matches"][level] = (jnp.stack([us, vs], axis=1), ok)
            diag["residual"][level] = res_map
            diag["invalid"][level] = invalid
            diag["poses"][level] = pose
        return pose, diag
