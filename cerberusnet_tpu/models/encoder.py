"""Shared feature-pyramid encoder (SURVEY.md §3 C4, §9.1).

Six levels; level l has resolution H/2^l x W/2^l with channel widths
(16, 32, 64, 96, 128, 196) — the PWC-Net feature extractor family. Each
level: one stride-2 conv followed by two stride-1 convs, LeakyReLU(0.1).

This single encoder is shared by all three decoder heads (disparity / flow /
segmentation) and is applied to each input frame (left_t, right_t,
left_{t-1}); under jit the three applications batch/fuse into one XLA
program (SURVEY.md §2 TPU-native restatement).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from cerberusnet_tpu.models.common import ConvBlock


class PyramidEncoder(nn.Module):
    channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 3) image -> list of 6 feature maps, levels 1..6."""
        feats = []
        for ch in self.channels:
            x = ConvBlock(ch, stride=2, dtype=self.dtype)(x)
            x = ConvBlock(ch, dtype=self.dtype)(x)
            x = ConvBlock(ch, dtype=self.dtype)(x)
            feats.append(x)
        return feats
