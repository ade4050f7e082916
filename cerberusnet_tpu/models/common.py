"""Shared model building blocks (NHWC, TPU-friendly).

Conventions:
  * All modules take/return NHWC tensors (channels in the XLA minor dim —
    the natural TPU conv layout).
  * ``dtype`` is the compute dtype (bf16 for TPU inference/training),
    ``param_dtype`` stays float32; flax handles the casts.
  * LeakyReLU(0.1) activations throughout, per the PWC-Net family
    (SURVEY.md §9.1). No batch norm anywhere in the pyramid/estimator path —
    matches the reference family and keeps the train step purely functional.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def upsample2x(x, method: str = "bilinear"):
    """Spatial x2 upsample of an NHWC tensor."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method=method)


def upsample_to(x, hw, method: str = "bilinear"):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method=method)


class ConvBlock(nn.Module):
    """Conv 3x3 + LeakyReLU(0.1)."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        return leaky(x)


class DenseEstimator(nn.Module):
    """DenseNet-style estimator trunk (SURVEY.md §9.4 step 4).

    Each conv sees the concatenation of the block input and all previous
    conv outputs; returns the final concatenated feature stack (the context
    network and the prediction conv both consume it).
    """

    channels: Sequence[int] = (128, 128, 96, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for ch in self.channels:
            y = ConvBlock(ch, dtype=self.dtype)(x)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class ContextNetwork(nn.Module):
    """Dilated-conv refinement (SURVEY.md §9.4 step 5): 7 convs with
    dilations 1,2,4,8,16,1,1 producing a residual for the prediction."""

    out_channels: int = 2
    channels: Sequence[int] = (128, 128, 128, 96, 64, 32)
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for ch, dil in zip(self.channels, self.dilations):
            x = ConvBlock(ch, dilation=dil, dtype=self.dtype)(x)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
