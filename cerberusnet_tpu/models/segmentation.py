"""Semantic-segmentation decoder head (SURVEY.md §3 C7).

A lightweight FPN-style decoder over the shared pyramid: 1x1 lateral convs
project levels 2..6 to a common width, a top-down pathway upsamples and adds,
each merged level gets a 3x3 smoothing conv, and the level-2 map is
classified into ``num_classes`` logits (19 Cityscapes trainIds,
[BASELINE:L5,L7] via SURVEY.md §3 C7) then bilinearly resized to full
resolution. The reference's seg-decoder internals are unrecoverable
(SURVEY.md §0); this is the standard design for the capability with a
TPU-friendly, norm-free conv stack.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from cerberusnet_tpu.models.common import ConvBlock, leaky, upsample_to
from cerberusnet_tpu.models.encoder import PyramidEncoder


class SegmentationHead(nn.Module):
    num_classes: int = 19
    levels: Sequence[int] = (2, 3, 4, 5, 6)
    fpn_channels: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, out_hw):
        """feats: pyramid list (levels 1..6); out_hw: (H, W) full resolution.

        Returns (B, H, W, num_classes) logits (float32 — logits stay in full
        precision even when the trunk computes in bf16).
        """
        levels = sorted(self.levels, reverse=True)  # coarse -> fine
        laterals = {
            l: leaky(
                nn.Conv(self.fpn_channels, (1, 1), dtype=self.dtype)(feats[l - 1])
            )
            for l in levels
        }
        x = laterals[levels[0]]
        for l in levels[1:]:
            x = upsample_to(x, laterals[l].shape[1:3]) + laterals[l]
            x = ConvBlock(self.fpn_channels, dtype=self.dtype)(x)
        x = ConvBlock(self.fpn_channels, dtype=self.dtype)(x)
        logits = nn.Conv(self.num_classes, (3, 3), padding="SAME", dtype=jnp.float32)(
            x
        )
        return upsample_to(logits, out_hw)


class SegNet(nn.Module):
    """Single-task segmentation baseline (SURVEY.md §3 C4 row; also the
    minimum end-to-end slice of the build plan, SURVEY.md §7 step 3)."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    num_classes: int = 19
    fpn_channels: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image):
        feats = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)(image)
        return SegmentationHead(
            self.num_classes, fpn_channels=self.fpn_channels, dtype=self.dtype
        )(feats, image.shape[1:3])
