"""DCVFlowNet — dilated-cost-volume optical flow (warping-free variant).

A second flow-model family alongside the PWC-Net-style FlowDecoder, built on
the dilated cost volumes of DCVNet (PAPERS.md: 'DCVNet: Dilated Cost Volume
Networks for Fast Optical Flow'; the warping-free theme also in WAFT): all
cost volumes are computed ONCE at a single pyramid level with several
dilation rates — covering a large displacement range without the sequential
coarse-to-fine warp loop — and a decoder predicts flow directly from the
stacked volumes. TPU-friendly properties: no per-level warping gathers, one
shot of embarrassingly parallel correlation work that XLA fuses, and a
shallower (lower-latency) graph than the sequential pyramid decoder.

Displacement coverage at level l with max_disp d and dilations R:
max(R)*d * 2^l pixels at full resolution (defaults: level 3, d=4,
R=(1,2,4,8) -> 256 px at 1024x512).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from cerberusnet_tpu.models.common import (
    encode_pair,
    ContextNetwork,
    DenseEstimator,
    FusedDenseEstimator,
    _ConvMirror,
    leaky,
    upsample2x,
)


from cerberusnet_tpu.models.encoder import PyramidEncoder
from cerberusnet_tpu.ops.correlation import correlation2d


def _estimate(x0, est_channels, out_ch, fused, dtype):
    """DenseNet trunk + narrow prediction conv, fused or naive (identical
    math and param tree; explicit names keep the trees aligned). ``x0`` may
    be a LIST of components in fused mode (e.g. the dilated cost volumes +
    features) — consumed in place without an input concat."""
    if fused:
        comps = list(x0) if isinstance(x0, (list, tuple)) else [x0]
        total_ch = sum(c.shape[-1] for c in comps)
        pred_kb = _ConvMirror(out_ch, total_ch + sum(est_channels),
                              name="Conv_0")()
        x, (pred,) = FusedDenseEstimator(
            tuple(est_channels), dtype=dtype, name="DenseEstimator_0"
        )(comps, (pred_kb,))
    else:
        if isinstance(x0, (list, tuple)):
            x0 = jnp.concatenate(list(x0), axis=-1)
        x = DenseEstimator(
            tuple(est_channels), dtype=dtype, name="DenseEstimator_0"
        )(x0)
        pred = nn.Conv(
            out_ch, (3, 3), padding="SAME", dtype=dtype, name="Conv_0"
        )(x)
    return x, pred


class DCVFlowDecoder(nn.Module):
    """Single-level dilated-cost-volume flow decoder."""

    level: int = 3
    max_disp: int = 4
    dilations: Sequence[int] = (1, 2, 4, 8)
    est_channels: Sequence[int] = (128, 96, 64, 32)
    ctx_channels: Sequence[int] = (96, 64, 32)
    corr_impl: str | None = None
    fused: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats1, feats2):
        f1 = feats1[self.level - 1]
        f2 = feats2[self.level - 1]
        volumes = [
            leaky(
                correlation2d(
                    f1, f2, max_disp=self.max_disp, impl=self.corr_impl, dilation=r
                )
            )
            for r in self.dilations
        ]
        x, flow = _estimate(
            volumes + [f1], self.est_channels, 2, self.fused, self.dtype
        )
        flow = flow + ContextNetwork(2, tuple(self.ctx_channels), dtype=self.dtype)(x)
        # full resolution: x2 per level with value scaling
        full = flow
        for _ in range(self.level):
            full = 2.0 * upsample2x(full)
        return {"flow": full, "flow_pyramid": {self.level: flow}}


class DCVFlowNet(nn.Module):
    """Encoder + dilated-cost-volume flow decoder (single-task)."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    level: int = 3
    max_disp: int = 4
    dilations: Sequence[int] = (1, 2, 4, 8)
    est_channels: Sequence[int] = (128, 96, 64, 32)
    ctx_channels: Sequence[int] = (96, 64, 32)
    corr_impl: str | None = None
    fused: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, im1, im2):
        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        return DCVFlowDecoder(
            level=self.level,
            max_disp=self.max_disp,
            dilations=tuple(self.dilations),
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            dtype=self.dtype,
        )(*encode_pair(enc, im1, im2))


class DCVStereoDecoder(nn.Module):
    """1-D dilated-cost-volume disparity decoder (warping-free stereo).

    The epipolar analogue of DCVFlowDecoder: one-sided horizontal cost
    volumes at several dilations computed once at a single level, covering
    max(dilations)*max_disp*2^level px of full-resolution disparity."""

    level: int = 3
    max_disp: int = 4
    dilations: Sequence[int] = (1, 2, 3)
    est_channels: Sequence[int] = (128, 96, 64, 32)
    ctx_channels: Sequence[int] = (96, 64, 32)
    corr_impl: str | None = None
    fused: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats_left, feats_right):
        from cerberusnet_tpu.ops.correlation import correlation1d

        f1 = feats_left[self.level - 1]
        f2 = feats_right[self.level - 1]
        volumes = [
            leaky(
                correlation1d(
                    f1, f2, max_disp=self.max_disp, impl=self.corr_impl, dilation=r
                )
            )
            for r in self.dilations
        ]
        x, disp = _estimate(
            volumes + [f1], self.est_channels, 1, self.fused, self.dtype
        )
        disp = disp + ContextNetwork(1, tuple(self.ctx_channels), dtype=self.dtype)(x)
        full = disp
        for _ in range(self.level):
            full = 2.0 * upsample2x(full)
        return {"disp": full, "disp_pyramid": {self.level: disp}}


class DCVStereoNet(nn.Module):
    """Encoder + 1-D dilated-cost-volume disparity decoder (single-task)."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    level: int = 3
    max_disp: int = 4
    dilations: Sequence[int] = (1, 2, 3)
    est_channels: Sequence[int] = (128, 96, 64, 32)
    ctx_channels: Sequence[int] = (96, 64, 32)
    corr_impl: str | None = None
    fused: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right):
        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        return DCVStereoDecoder(
            level=self.level,
            max_disp=self.max_disp,
            dilations=tuple(self.dilations),
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            dtype=self.dtype,
        )(*encode_pair(enc, left, right))


class CerberusDCV(nn.Module):
    """Joint three-head model on the warping-free DCV decoders: one shared
    pyramid encoder + dilated-cost-volume flow and stereo heads + the FPN
    segmentation head. Same I/O contract as CerberusNet; a much shallower
    graph (no coarse-to-fine warp loops) for low-latency deployment."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    num_classes: int = 19
    level: int = 3
    flow_max_disp: int = 4
    flow_dilations: Sequence[int] = (1, 2, 4, 8)
    disp_max_disp: int = 4
    disp_dilations: Sequence[int] = (1, 2, 3)
    est_channels: Sequence[int] = (128, 96, 64, 32)
    ctx_channels: Sequence[int] = (96, 64, 32)
    fpn_channels: int = 96
    corr_impl: str | None = None
    fused: bool = True
    seg_head: str = "fpn"  # fpn | aspp
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right, temporal):
        from cerberusnet_tpu.models.segmentation import make_seg_head

        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        # separate applications — batching measured slower end-to-end (see
        # common.encode_pair docstring)
        f_left = enc(left)
        f_right = enc(right)
        f_temporal = enc(temporal)
        disp_out = DCVStereoDecoder(
            level=self.level,
            max_disp=self.disp_max_disp,
            dilations=tuple(self.disp_dilations),
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            dtype=self.dtype,
        )(f_left, f_right)
        flow_out = DCVFlowDecoder(
            level=self.level,
            max_disp=self.flow_max_disp,
            dilations=tuple(self.flow_dilations),
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            dtype=self.dtype,
        )(f_left, f_temporal)
        seg_logits = make_seg_head(
            self.seg_head, self.num_classes, self.fpn_channels, self.dtype
        )(f_left, left.shape[1:3])
        return {
            "seg_logits": seg_logits,
            "flow": flow_out["flow"].astype(jnp.float32),
            "disp": disp_out["disp"].astype(jnp.float32),
            "flow_pyramid": flow_out["flow_pyramid"],
            "disp_pyramid": disp_out["disp_pyramid"],
        }
