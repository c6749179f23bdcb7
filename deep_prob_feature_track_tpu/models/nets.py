"""Learned solver components: M-estimator, ScaleNet, damping regressor,
pose initializer networks.

TPU-native rewrites of ``DeepRobustEstimator`` (code/models/algorithms.py:
1432-1498), ``ScaleNet`` (:1501-1580), ``deep_damping_regressor`` (:1834-1842),
``PoseNetFeat``/``PoseNet`` (:1694-1767) and ``SFMPoseNet`` (:1770-1831).
All spatial modules are NHWC internally with NCHW boundaries.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.lie import pose_vec_to_Rt
from ..ops.image import bilinear_resize_align
from .layers import Conv1dBlock, ConvBlock, FcRelu, nchw_to_nhwc, nhwc_to_nchw


class DeepRobustEstimator(nn.Module):
    """Convolutional M-estimator (component B).

    ``estimator_type='MultiScale2w'``: input ``[|r|, x0, x1, w_prev^up]``
    -> 4 dilated convs -> sigmoid weight map (ref algorithms.py:1449-1474).
    ``'None'``: constant ones.  ``'Huber'``: the classical (non-learned)
    Huber weight ``min(1, alpha/|r|)`` with alpha=0.02 (ref
    algorithms.py:1480-1493; the reference flags it non-differentiable, so
    the gradient is stopped here too).
    """

    estimator_type: str = "MultiScale2w"
    huber_alpha: float = 0.02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, residual, x0, x1, w_prior=None, train: bool = False):
        if self.estimator_type == "None":
            return jnp.ones_like(residual)
        if self.estimator_type == "Huber":
            import jax

            abs_r = jnp.abs(jax.lax.stop_gradient(residual))
            return jnp.where(
                abs_r > self.huber_alpha,
                self.huber_alpha / jnp.maximum(abs_r, self.huber_alpha),
                1.0,
            )
        if self.estimator_type != "MultiScale2w":
            raise ValueError(self.estimator_type)
        B, C, H, W = residual.shape
        wl = bilinear_resize_align(w_prior, H, W)
        context = jnp.concatenate([jnp.abs(residual), x0, x1, wl], axis=1)
        y = nchw_to_nhwc(context)
        y = ConvBlock(16, 3, dilation=1, dtype=self.dtype)(y, train)
        y = ConvBlock(32, 3, dilation=2, dtype=self.dtype)(y, train)
        y = ConvBlock(64, 3, dilation=4, dtype=self.dtype)(y, train)
        y = ConvBlock(1, 3, dilation=1, dtype=self.dtype)(y, train)
        return nn.sigmoid(nhwc_to_nchw(y))


class ScaleNet(nn.Module):
    """Learned ICP<->feature scale balancer (ref algorithms.py:1501-1580).

    Input is per-pixel squared-residual maps (rtr) of one/both residuals,
    optionally with the upsampled prior weights; output in (0, scale).
    """

    estimator_type: str = "None"
    scale: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, residual, another_residual=None, w_prior=None, train: bool = False):
        def rtr(res):
            return jnp.sum(res * res, axis=1, keepdims=True)

        et = self.estimator_type
        if et == "None":
            return jnp.ones_like(residual) * self.scale
        if et == "oneResidual":
            inp = rtr(residual)
        elif et == "twoResidual":
            inp = jnp.concatenate([rtr(residual), rtr(another_residual)], axis=1)
        elif et in ("MultiScale2w", "expMultiScale"):
            B, C, H, W = residual.shape
            wl = bilinear_resize_align(w_prior, H, W)
            inp = jnp.concatenate([rtr(residual), rtr(another_residual), wl], axis=1)
        else:
            raise ValueError(et)
        y = nchw_to_nhwc(inp)
        y = ConvBlock(16, 3, dilation=1, dtype=self.dtype)(y, train)
        y = ConvBlock(32, 3, dilation=2, dtype=self.dtype)(y, train)
        y = ConvBlock(64, 3, dilation=4, dtype=self.dtype)(y, train)
        y = ConvBlock(16, 3, dilation=1, dtype=self.dtype)(y, train)
        y = nn.Conv(1, (1, 1), dtype=self.dtype)(y)
        w = nhwc_to_nchw(y)
        if et == "expMultiScale":
            w = jnp.exp(jnp.clip(w, -6.0, 6.0))
        else:
            w = nn.sigmoid(w)
        return w * self.scale


class DampingRegressor(nn.Module):
    """Per-axis damping MLP of the trust-region network (component C).

    Reference: algorithms.py:1834-1842 — FC D->128->256->6, ReLU after every
    layer (the final ReLU keeps damping non-negative).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, 36 + 6*samples]
        x = FcRelu(128, dtype=self.dtype)(x)
        x = FcRelu(256, dtype=self.dtype)(x)
        x = FcRelu(6, dtype=self.dtype)(x)
        return x


class SFMPoseNet(nn.Module):
    """Pose initializer used in the paper (ref algorithms.py:1770-1831).

    Concat level-3 raw features of both frames, 2 dilated convs, then a
    1D head emitting ``hypo_num`` hypotheses fused by confidence softmax
    (``multi_hypo='prob_fuse'``), scaled by ``scale_motion``, decoded to
    (R, t) via the euler path of ``pose_vec_to_Rt``.
    """

    scale_motion: float = 0.01
    multi_hypo: str = "prob_fuse"  # 'None' | 'average' | 'prob_fuse'
    res_input: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.res_input:
            inp = jnp.concatenate([x0, x1, x0 - x1], axis=1)
        else:
            inp = jnp.concatenate([x0, x1], axis=1)
        B = inp.shape[0]
        y = nchw_to_nhwc(inp)
        y = ConvBlock(256, 3, dilation=2, dtype=self.dtype)(y, train)
        y = ConvBlock(256, 3, dilation=2, dtype=self.dtype)(y, train)

        hypo_num = 16 if self.multi_hypo != "None" else 1
        if self.multi_hypo == "None":
            y = nn.Conv(6, (1, 1), dtype=self.dtype)(y)
            pose = jnp.mean(y, axis=(1, 2))  # [B,6]
        else:
            seq = y.reshape(B, -1, y.shape[-1])  # [B, HW, C]
            seq = Conv1dBlock(128, 1, dtype=self.dtype)(seq, train)
            out_c = hypo_num * (7 if self.multi_hypo == "prob_fuse" else 6)
            seq = nn.Conv(out_c, (1,), dtype=self.dtype)(seq)  # [B,HW,out_c]
            pooled = jnp.mean(seq, axis=1)  # [B, out_c]
            if self.multi_hypo == "average":
                pose = pooled.reshape(B, hypo_num, 6).mean(axis=1)
            else:  # prob_fuse
                pose = pooled.reshape(B, hypo_num, 7)
                poses, conf = pose[..., :6], pose[..., 6:]
                conf = nn.softmax(conf, axis=1)
                pose = jnp.sum(poses * conf, axis=1)
        pose = self.scale_motion * pose
        return pose_vec_to_Rt(pose, rotation_mode="euler")


class PoseNetFeat(nn.Module):
    """Dense per-pixel pose embedding (ref algorithms.py:1694-1719)."""

    dtype: jnp.dtype = jnp.float32
    final_C: int = 1024

    @nn.compact
    def __call__(self, feat_map, train: bool = False):
        B = feat_map.shape[0]
        y = nchw_to_nhwc(feat_map)
        y = ConvBlock(128, 3, stride=2, dtype=self.dtype)(y, train)
        y = ConvBlock(128, 3, stride=2, dtype=self.dtype)(y, train)
        seq = y.reshape(B, -1, y.shape[-1])  # [B, N, 128]
        emb1 = Conv1dBlock(256, 1, dtype=self.dtype)(seq, train)
        emb2 = Conv1dBlock(512, 1, dtype=self.dtype)(emb1, train)
        final = Conv1dBlock(self.final_C, 1, dtype=self.dtype)(emb2, train)
        N = final.shape[1]
        ap = jnp.mean(final, axis=1, keepdims=True)  # global avg pool
        ap = jnp.broadcast_to(ap, (B, N, self.final_C))
        return emb1, emb2, ap  # 256 + 512 + 1024 channels


class PoseNet(nn.Module):
    """Dense-feature pose regressor (``init_pose='dense_net'``).

    Reference: algorithms.py:1722-1767 — shared PoseNetFeat on both frames,
    three 1D-conv heads (rot / trans / confidence) with softmax-weighted
    pooling over pixels, euler-decoded rotation.
    """

    scale_motion: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, train: bool = False):
        feat_net = PoseNetFeat(dtype=self.dtype)
        e1_0, e2_0, ap_0 = feat_net(x0, train)
        e1_1, e2_1, ap_1 = feat_net(x1, train)
        feat = jnp.concatenate([e1_0, e1_1, e2_0, e2_1, ap_0, ap_1], axis=-1)

        def head(out_c):
            def f(z):
                z = Conv1dBlock(640, 1, dtype=self.dtype)(z, train)
                z = Conv1dBlock(256, 1, dtype=self.dtype)(z, train)
                z = Conv1dBlock(128, 1, dtype=self.dtype)(z, train)
                return nn.Conv(out_c, (1,), dtype=self.dtype)(z)

            return f

        rot = head(3)(feat)  # [B,N,3]
        trs = head(3)(feat)
        conf = head(1)(feat)
        conf = nn.softmax(conf, axis=1)
        rot = self.scale_motion * jnp.sum(rot * conf, axis=1)  # [B,3]
        trs = self.scale_motion * jnp.sum(trs * conf, axis=1)
        from ..geometry.lie import euler_to_matrix

        R = euler_to_matrix(rot[:, 0], rot[:, 1], rot[:, 2])
        return R, trs
