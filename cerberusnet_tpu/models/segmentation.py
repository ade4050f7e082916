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


class ASPPSegmentationHead(nn.Module):
    """Atrous-spatial-pyramid-pooling decoder (DeepLab family) — the
    higher-accuracy segmentation head variant alongside the default FPN
    head. Operates on the level-3 (1/8-res) pyramid features: parallel
    dilated 3x3 convs + an image-level pooled branch, concatenated and
    projected, with a low-level (level-2) skip refinement before the
    classifier. All convs are static-shape and norm-free (TPU-friendly,
    same conventions as the rest of the model zoo)."""

    num_classes: int = 19
    channels: int = 128
    rates: Sequence[int] = (1, 6, 12, 18)
    level: int = 3
    skip_level: int = 2
    skip_channels: int = 48
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, out_hw):
        x = feats[self.level - 1]
        branches = [
            ConvBlock(self.channels, dilation=r, dtype=self.dtype)(x)
            for r in self.rates
        ]
        # image-level context: global average pool -> 1x1 -> broadcast back
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = leaky(nn.Conv(self.channels, (1, 1), dtype=self.dtype)(pooled))
        branches.append(jnp.broadcast_to(pooled, x.shape[:3] + (self.channels,)))
        y = jnp.concatenate(branches, axis=-1)
        y = leaky(nn.Conv(self.channels, (1, 1), dtype=self.dtype)(y))
        # low-level skip at 1/4 res
        skip = leaky(
            nn.Conv(self.skip_channels, (1, 1), dtype=self.dtype)(
                feats[self.skip_level - 1]
            )
        )
        y = upsample_to(y, skip.shape[1:3])
        y = jnp.concatenate([y, skip], axis=-1)
        y = ConvBlock(self.channels, dtype=self.dtype)(y)
        y = ConvBlock(self.channels, dtype=self.dtype)(y)
        logits = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=jnp.float32
        )(y)
        return upsample_to(logits, out_hw)


def make_seg_head(kind: str, num_classes: int, fpn_channels: int, dtype):
    """Factory for the segmentation decoder family: 'fpn' (default,
    lightweight top-down) or 'aspp' (dilated-pyramid, higher capacity)."""
    if kind == "fpn":
        return SegmentationHead(num_classes, fpn_channels=fpn_channels, dtype=dtype)
    if kind == "aspp":
        return ASPPSegmentationHead(num_classes, dtype=dtype)
    raise ValueError(f"unknown seg head {kind!r} (expected 'fpn' | 'aspp')")


class SegNet(nn.Module):
    """Single-task segmentation baseline (SURVEY.md §3 C4 row; also the
    minimum end-to-end slice of the build plan, SURVEY.md §7 step 3)."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    num_classes: int = 19
    fpn_channels: int = 96
    seg_head: str = "fpn"  # fpn | aspp
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image):
        feats = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)(image)
        return make_seg_head(
            self.seg_head, self.num_classes, self.fpn_channels, self.dtype
        )(feats, image.shape[1:3])
