"""Stereo-disparity decoder head (SURVEY.md §3 C6, §9.2b, §9.4).

The 1-D epipolar variant of the flow machinery: per pyramid level the right
features are horizontally warped by the upsampled disparity, correlated with
the left features over a one-sided displacement window k in 0..D_l with
D_l = max(max_disp_full / 2^l, 4) (max_disp_full = 96 at full resolution,
[BASELINE:L8] via SURVEY.md §9.2b), then a DenseNet estimator predicts a
1-channel disparity residual; the finest level gets a dilated context
refinement.

Disparity is in pixels at the level's own resolution, non-negative by
convention (positive = leftward shift into the right image); the full-res
output is the level-2 map resized x4 with values scaled x4.
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
from cerberusnet_tpu.ops.correlation import correlation1d
from cerberusnet_tpu.ops.warp import warp1d


class DisparityDecoder(nn.Module):
    """Consumes left/right feature pyramids, emits disparity."""

    max_disp_full: int = 96
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
    est_input: str = "concat"  # concat | split (identical math; concat won the r3 race — see flow.py)
    dtype: jnp.dtype = jnp.float32

    def level_max_disp(self, level: int) -> int:
        return max(self.max_disp_full // (2**level), 4)

    @nn.compact
    def __call__(self, feats_left, feats_right):
        disp_pyramid = {}
        disp = None
        up_feat = None
        for i, l in enumerate(self.levels):
            f1, f2 = feats_left[l - 1], feats_right[l - 1]
            if disp is None:
                up_disp = jnp.zeros(f1.shape[:3] + (1,), f1.dtype)
                f2w = f2
                inputs = []
            else:
                up_disp = 2.0 * upsample2x(disp, impl=self.upsample_impl)
                f2w = warp1d(f2, up_disp)
                inputs = [up_disp, up_feat]
            cost = leaky(
                correlation1d(
                    f1, f2w, max_disp=self.level_max_disp(l),
                    impl=self.corr_impl, stack=self.corr_stack,
                )
            )
            # explicit child names keep fused/unfused param trees identical
            if self.fused:
                # cost volume consumed in place (see flow.py note)
                if self.est_input == "concat":
                    comps = [jnp.concatenate([cost, f1] + inputs, axis=-1)]
                else:
                    comps = [cost, jnp.concatenate([f1] + inputs, axis=-1)]
                total_ch = sum(c.shape[-1] for c in comps)
                pred_kb = _ConvMirror(
                    1, total_ch + sum(self.est_channels), name=f"Conv_{i}"
                )()
                x, (disp,) = FusedDenseEstimator(
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
                disp = nn.Conv(
                    1, (3, 3), padding="SAME", dtype=self.dtype, name=f"Conv_{i}"
                )(x)
            if inputs:
                disp = disp + up_disp
            if l == self.levels[-1]:
                disp = disp + ContextNetwork(
                    1, tuple(self.ctx_channels), dtype=self.dtype,
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
            disp_pyramid[l] = disp
        full = 4.0 * upsample2x(
            upsample2x(disp, impl=self.upsample_impl), impl=self.upsample_impl
        )
        return {"disp": full, "disp_pyramid": disp_pyramid}


class StereoNet(nn.Module):
    """Single-task stereo-disparity baseline (SURVEY.md §3 C4 row)."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    max_disp_full: int = 96
    est_channels: Sequence[int] = (128, 128, 96, 64, 32)
    ctx_channels: Sequence[int] = (128, 128, 128, 96, 64, 32)
    corr_impl: str | None = None
    fused: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right):
        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        return DisparityDecoder(
            max_disp_full=self.max_disp_full,
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            dtype=self.dtype,
        )(*encode_pair(enc, left, right))
