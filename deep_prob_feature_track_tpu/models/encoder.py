"""Feature/uncertainty pyramid encoder (the paper's component A).

TPU-native rewrite of ``FeaturePyramid`` (code/models/algorithms.py:1221-1430):
4 conv stages of 3 dilated 3x3 conv+BN+ELU blocks with avg-pool /2 between
stages, per-level feature heads (conv / 1by1 / average / skip / prob_fuse)
and per-level uncertainty heads with the gaussian/laplacian/sigmoid/identity
activations.  Channels [32, 64, 96, 128].  All convs run in NHWC; the
returned pyramids are NCHW for the solver layer.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import avg_pool2
from .layers import ConvBlock, nchw_to_nhwc, nhwc_to_nchw

STAGE_CHANNELS = (32, 64, 96, 128)


class _Stage(nn.Module):
    """One encoder stage: conv(k3) -> conv(k3,d2) -> conv(k3,d2)."""

    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.mid, 3, dtype=self.dtype)(x, train)
        x = ConvBlock(self.out, 3, dilation=2, dtype=self.dtype)(x, train)
        x = ConvBlock(self.out, 3, dilation=2, dtype=self.dtype)(x, train)
        return x


class FeaturePyramid(nn.Module):
    """4-level feature + uncertainty pyramid.

    :param feature_extract: 'conv' | '1by1' | 'average' | 'skip' | 'prob_fuse'
    :param uncertainty_type: 'None' | 'identity' | 'sigmoid' | 'feature' |
        'gaussian' | 'laplacian' | 'old_gaussian' | 'old_laplacian'
    Returns ``(features[4], sigmas[4], raw[4])``, all NCHW lists, fine->coarse.
    """

    feature_channel: int = 8
    uncertainty_channel: int = 1
    feature_extract: str = "conv"
    uncertainty_type: str = "laplacian"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.uncertainty_channel in (1, self.feature_channel)
        c0, c1, c2, c3 = STAGE_CHANNELS
        # stage mid-channels mirror the reference: net0 is 16->32->32,
        # net1 32->64->64, net2 64->96->96, net3 96->128->128
        self.net0 = _Stage(16, c0, self.dtype)
        self.net1 = _Stage(c0, c1, self.dtype)
        self.net2 = _Stage(c1, c2, self.dtype)
        self.net3 = _Stage(c2, c3, self.dtype)

        out_c = self.feature_channel
        if self.feature_extract == "prob_fuse":
            out_c = 16  # 8 features + 8 gates (ref algorithms.py:1283-1292)
        if self.feature_extract in ("conv", "prob_fuse"):
            self.f_heads = [
                ConvBlock(out_c, 1, dtype=self.dtype) for _ in range(4)
            ]
        elif self.feature_extract == "1by1":
            self.f_heads = [
                nn.Conv(out_c, (1, 1), kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype)
                for _ in range(4)
            ]
        elif self.feature_extract in ("average", "skip"):
            self.f_heads = None
        else:
            raise ValueError(f"unknown feature_extract {self.feature_extract!r}")

        ut = self.uncertainty_type
        if ut in ("gaussian", "laplacian", "old_gaussian", "old_laplacian", "sigmoid"):
            self.s_heads = [
                (
                    ConvBlock(16, 1, dtype=self.dtype),
                    nn.Conv(self.uncertainty_channel, (1, 1), dtype=self.dtype),
                )
                for _ in range(4)
            ]
        elif ut == "feature":
            self.s_heads = [
                (ConvBlock(self.feature_channel, 1, dtype=self.dtype), None) for _ in range(4)
            ]
        else:
            self.s_heads = None

    def _extract_feature(self, i: int, x, train: bool):
        fe = self.feature_extract
        if fe == "skip":
            return x
        if fe == "average":
            return jnp.mean(x, axis=-1, keepdims=True)
        if fe in ("conv", "1by1"):
            head = self.f_heads[i]
            return head(x, train) if fe == "conv" else head(x)
        if fe == "prob_fuse":
            y = self.f_heads[i](x, train)
            f, p = jnp.split(y, 2, axis=-1)
            p = nn.sigmoid(p)
            return jnp.sum(f * p, axis=-1, keepdims=True)
        raise ValueError(fe)

    def _extract_sigma(self, i: int, x, f, train: bool):
        ut = self.uncertainty_type
        if ut == "None":
            return None
        if ut == "identity":
            return jnp.ones_like(f)
        if ut == "feature":
            head, _ = self.s_heads[i]
            return head(x, train)
        head, final = self.s_heads[i]
        s = final(head(x, train))
        if ut == "gaussian":
            s = jnp.exp(0.5 * jnp.clip(s, -6.0, 6.0))
        elif ut == "laplacian":
            s = jnp.exp(jnp.clip(s, -3.0, 3.0))
        elif ut == "sigmoid":
            s = nn.sigmoid(s)
        elif ut == "old_gaussian":
            s = jnp.exp(0.5 * jnp.clip(s, 1e-3, 1e3))
        elif ut == "old_laplacian":
            s = jnp.exp(jnp.clip(s, 1e-3, 1e3))
        else:
            raise ValueError(ut)
        # broadcast a 1-channel sigma to every feature channel (ref :1426-1427)
        if (
            self.uncertainty_channel == 1
            and f.shape[-1] != 1
        ):
            s = jnp.repeat(s, f.shape[-1], axis=-1)
        return s

    def __call__(
        self, x_nchw: jnp.ndarray, train: bool = False
    ) -> Tuple[List[jnp.ndarray], List[Optional[jnp.ndarray]], List[jnp.ndarray]]:
        """:param x_nchw: [B, D, H, W] input (D = 4 one-view / 8 two-view)"""
        x = nchw_to_nhwc(x_nchw)
        x0 = self.net0(x, train)
        x1 = self.net1(self._down(x0), train)
        x2 = self.net2(self._down(x1), train)
        x3 = self.net3(self._down(x2), train)
        raw = [x0, x1, x2, x3]

        feats, sigmas = [], []
        for i, xi in enumerate(raw):
            f = self._extract_feature(i, xi, train)
            s = self._extract_sigma(i, xi, f, train)
            feats.append(nhwc_to_nchw(f))
            sigmas.append(None if s is None else nhwc_to_nchw(s))
        return feats, sigmas, [nhwc_to_nchw(r) for r in raw]

    @staticmethod
    def _down(x):
        # NHWC avg-pool /2 (ref downsample, algorithms.py:1323)
        import jax

        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
