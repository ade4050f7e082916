"""Optical-flow decoder head (SURVEY.md §3 C5, §9.4; PWC-Net family).

Coarse-to-fine over pyramid levels 6 -> 2. At each level:
  1. up_flow = 2 * upsample2x(flow_{l+1})           (zero at level 6)
  2. f2_warped = warp2d(f2_l, up_flow)              (Pallas-free XLA gather)
  3. cost = LeakyReLU(correlation2d(f1_l, f2_warped, d=4))   (Pallas kernel)
  4. estimator: concat(cost, f1_l, up_flow, up_feat) -> DenseNet trunk
     -> conv to 2 channels
  5. at the finest level only: dilated context network adds a residual.

Flow values are in PIXELS AT THAT LEVEL's resolution (the warp consumes them
directly); the final full-resolution flow is the level-2 prediction resized
x4 with values scaled x4. This is the modern convention (PAPERS.md "Models
Matter, So Does Training") rather than the Caffe-era /20 normalization; the
loss layer weights levels per SURVEY.md §9.6.

Flow channel order: (u, v) = (x-displacement, y-displacement); flow maps
frame-1 pixels to frame-2 positions (warp pulls f2 back onto f1's grid).
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
    conv_transpose_over_components,
    conv_transpose_subpixel,
    leaky,
    upsample2x,
)
from cerberusnet_tpu.models.encoder import PyramidEncoder
from cerberusnet_tpu.ops.correlation import correlation2d
from cerberusnet_tpu.ops.warp import warp2d


class FlowDecoder(nn.Module):
    """Consumes two feature pyramids (lists, levels 1..6), emits flow."""

    max_disp: int = 4
    levels: Sequence[int] = (6, 5, 4, 3, 2)
    est_channels: Sequence[int] = (128, 128, 96, 64, 32)
    ctx_channels: Sequence[int] = (128, 128, 128, 96, 64, 32)
    up_feat_channels: int = 2
    corr_impl: str | None = None
    fused: bool = True  # fused estimator+prediction (identical math/params)
    # perf knobs, bit-identical math (A/B'd in tools/ab_forward.py):
    corr_stack: str = "major"  # cost-volume assembly (ops/correlation.py)
    distribute_outputs: bool = True  # skip estimator output-stack concat
    upfeat_impl: str = "subpixel"  # subpixel | convt (identical math; r3 A/B winner)
    upsample_impl: str = "resize"  # resize | phase (identical math; common.py)
    # estimator input assembly (identical math): "split" consumes the cost
    # volume as its own component (skips the input concat; round-2 choice),
    # "concat" feeds one concatenated tensor. concat WON the honest r3
    # interleaved A/B on the joint model (10.25 vs 10.68 ms/frame median,
    # chain r3i): the explicit concatenate is cheaper than the layout
    # copies the odd-width (81/25-ch) cost volume forces around the
    # estimator convs. Default = the measured winner.
    est_input: str = "concat"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats1, feats2):
        flow_pyramid = {}
        flow = None
        up_feat = None
        for i, l in enumerate(self.levels):
            f1, f2 = feats1[l - 1], feats2[l - 1]
            if flow is None:
                up_flow = jnp.zeros(f1.shape[:3] + (2,), f1.dtype)
                f2w = f2
                inputs = []
            else:
                up_flow = 2.0 * upsample2x(flow, impl=self.upsample_impl)
                f2w = warp2d(f2, up_flow)
                inputs = [up_flow, up_feat]
            cost = leaky(
                correlation2d(f1, f2w, max_disp=self.max_disp,
                              impl=self.corr_impl, stack=self.corr_stack)
            )
            # explicit child names keep fused/unfused param trees identical
            if self.fused:
                # est_input="split": the 81-ch cost volume stays a separate
                # component — the fused estimator consumes it in place,
                # skipping one full input-concat copy per level;
                # concat_stack=False keeps the OUTPUT stack as components
                # too (the only consumers — context net / up-feat
                # ConvTranspose — distribute over them)
                if self.est_input == "concat":
                    comps = [jnp.concatenate([cost, f1] + inputs, axis=-1)]
                else:
                    comps = [cost, jnp.concatenate([f1] + inputs, axis=-1)]
                total_ch = sum(c.shape[-1] for c in comps)
                pred_kb = _ConvMirror(
                    2, total_ch + sum(self.est_channels), name=f"Conv_{i}"
                )()
                x, (flow,) = FusedDenseEstimator(
                    tuple(self.est_channels),
                    dtype=self.dtype,
                    concat_stack=not self.distribute_outputs,
                    name=f"DenseEstimator_{i}",
                )(comps, (pred_kb,))
            else:
                x0 = jnp.concatenate([cost, f1] + inputs, axis=-1)
                x = DenseEstimator(
                    tuple(self.est_channels),
                    dtype=self.dtype,
                    name=f"DenseEstimator_{i}",
                )(x0)
                flow = nn.Conv(
                    2, (3, 3), padding="SAME", dtype=self.dtype, name=f"Conv_{i}"
                )(x)
            if inputs:
                flow = flow + up_flow  # predict residual on top of upsampled flow
            if l == self.levels[-1]:
                flow = flow + ContextNetwork(
                    2, tuple(self.ctx_channels), dtype=self.dtype,
                    name="ContextNetwork_0",
                )(x)
            elif self.fused and self.distribute_outputs:
                stack_ch = sum(c.shape[-1] for c in x)
                kt, bt = _ConvMirror(
                    self.up_feat_channels, stack_ch, kernel_size=(4, 4),
                    name=f"ConvTranspose_{i}",
                )()
                if self.upfeat_impl == "subpixel":
                    up_feat = leaky(
                        conv_transpose_subpixel(x, kt, bt, self.dtype)
                    )
                else:
                    up_feat = leaky(
                        conv_transpose_over_components(
                            x, kt, bt, (2, 2), self.dtype
                        )
                    )
            else:
                up_feat = leaky(
                    nn.ConvTranspose(
                        self.up_feat_channels,
                        (4, 4),
                        strides=(2, 2),
                        padding="SAME",
                        dtype=self.dtype,
                        name=f"ConvTranspose_{i}",
                    )(x)
                )
            flow_pyramid[l] = flow
        # Full-resolution flow: level-2 prediction x4 in size and magnitude.
        full = 4.0 * upsample2x(
            upsample2x(flow, impl=self.upsample_impl), impl=self.upsample_impl
        )
        return {"flow": full, "flow_pyramid": flow_pyramid}


class FlowNet(nn.Module):
    """Single-task optical-flow baseline (SURVEY.md §3 C4 row: 'single-task
    baselines (PWC-Net flow)'): encoder + flow decoder."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    max_disp: int = 4
    est_channels: Sequence[int] = (128, 128, 96, 64, 32)
    ctx_channels: Sequence[int] = (128, 128, 128, 96, 64, 32)
    corr_impl: str | None = None
    fused: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, im1, im2):
        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        return FlowDecoder(
            max_disp=self.max_disp,
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            dtype=self.dtype,
        )(*encode_pair(enc, im1, im2))
