"""Basic NN building blocks (conv+BN+ELU etc.) as flax modules.

TPU-native rewrite of the reference's submodules
(code/models/submodules.py:20-106).  Internally everything is NHWC (the
TPU-friendly conv layout); the facade transposes to the solver's NCHW at
the boundary.  Padding is explicit symmetric ``(k-1)//2 + d - 1`` to match
torch Conv2d semantics exactly for every stride/dilation combination, so
reference checkpoints can be imported weight-for-weight.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# CIFAR-style color statistics (ref submodules.py:20-23)
RGB_MEAN = (0.4914, 0.4822, 0.4465)
RGB_STD = (0.2023, 0.1994, 0.2010)


def color_normalize_nchw(color: jnp.ndarray) -> jnp.ndarray:
    """Normalize an RGB image [B,3,H,W] with CIFAR statistics."""
    mean = jnp.asarray(RGB_MEAN, dtype=color.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(RGB_STD, dtype=color.dtype).reshape(1, 3, 1, 1)
    return (color - mean) / std


class ConvBlock(nn.Module):
    """Conv2d [+ BatchNorm] + ELU, torch-padding-compatible.

    Reference: submodules.py:25-40 (``convLayer``).  With ``batch_norm``
    the conv has no bias (folded into BN); otherwise bias is used.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    batch_norm: bool = True
    activate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 + self.dilation - 1
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=not self.batch_norm,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(x)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.activate:
            x = nn.elu(x)
        return x


class Conv1dBlock(nn.Module):
    """Conv1d [+ BatchNorm1d] + ELU over [B, N, C] (ref submodules.py:42-57)."""

    features: int
    kernel_size: int = 1
    batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size,),
            padding=((pad, pad),),
            use_bias=not self.batch_norm,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(x)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
            )(x)
        return nn.elu(x)


class FcRelu(nn.Module):
    """Linear + ReLU (ref submodules.py:59-63)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        return nn.relu(x)


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))
