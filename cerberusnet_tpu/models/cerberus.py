"""CerberusNet: the joint three-headed multi-task model (SURVEY.md §3 C8).

One shared pyramid encoder applied to (left, right, temporal), feeding:
  * disparity head on (left, right)     — stereo depth, anchored at left
  * flow head on (left, temporal)       — flow anchored at LEFT pointing into
    the second temporal frame. With KITTI pairs, left = frame _10 and
    temporal = frame _11, so every ground truth (flow _10->_11, disparity
    @_10, segmentation @ left) anchors at the same frame (SURVEY.md §9.5).
    For Cityscapes sequences, temporal is the previous frame.
  * segmentation head on left's pyramid — 19-class Cityscapes logits

The whole forward is one jitted XLA program: encoder convs on the MXU, the
Pallas correlation kernels inlined between them, zero per-op launch overhead
(SURVEY.md §2 "TPU-native restatement", §4.1).

Inputs are NHWC float images (normalized by the data pipeline); compute
dtype is configurable (bf16 for the TPU fast path, [BASELINE:L10]).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from cerberusnet_tpu.models.disparity import DisparityDecoder
from cerberusnet_tpu.models.encoder import PyramidEncoder
from cerberusnet_tpu.models.flow import FlowDecoder
from cerberusnet_tpu.models.segmentation import make_seg_head


class CerberusNet(nn.Module):
    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    num_classes: int = 19
    max_disp_full: int = 96
    flow_max_disp: int = 4
    est_channels: Sequence[int] = (128, 128, 96, 64, 32)
    ctx_channels: Sequence[int] = (128, 128, 128, 96, 64, 32)
    fpn_channels: int = 96
    corr_impl: str | None = None
    fused: bool = True  # fused estimator+prediction convs (identical math)
    corr_stack: str = "major"  # cost-volume assembly (ops/correlation.py)
    distribute_outputs: bool = True  # skip estimator output-stack concats
    upfeat_impl: str = "subpixel"  # subpixel | convt (identical math; subpixel won the honest interleaved A/B r3: 11.90 vs 12.48 ms/frame)
    upsample_impl: str = "resize"  # resize | phase (identical math; common.py)
    est_input: str = "concat"  # concat | split estimator feed (identical math; concat won the honest r3 A/B: 10.25 vs 10.68 ms/frame median — the explicit concatenate is cheaper than the odd-width cost-volume relayouts; flow.py)
    batched_encoder: bool = True  # one B*3 encoder pass (identical math; won the honest r3 A/B: 10.8/10.0 vs 12.0 ms/frame — the round-2 "loses" verdict came from the DCE'd harness)
    # stacked_input: __call__ takes ONE (3B, H, W, 3) tensor with the
    # left/right/temporal frames pre-stacked along batch by the PRODUCER
    # (data loader / serving frontend — a host-side arrangement that costs
    # nothing there), so the device never executes the 3-way input concat
    # + relayout copies the r3 forward profile attributes ~1.06 ms/frame
    # to. Identical math and param tree (tests/test_models.py); requires
    # batched_encoder.
    stacked_input: bool = False
    s2d_stem: bool = False  # space-to-depth level-1 conv (identical math)
    stem_pad_channels: int = 0  # zero-pad image channels for the stem conv (identical math; encoder.py)
    s2d_levels: int = 0  # run the first N encoder levels in s2d space (identical math; encoder.py)
    entry_grad: str = "auto"  # auto | phase: subpixel input-gradient for the stride-2 encoder convs (identical math; common.py conv_s2_phase)
    pallas_levels: int = 0  # first N encoder levels as fused Pallas kernels (identical math; ops/pallas/encoder_level.py)
    pallas_grad: str = "xla"  # xla | pallas backward for the fused levels
    seg_head: str = "fpn"  # fpn | aspp (models/segmentation.py factory)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right=None, temporal=None):
        """left/right/temporal: (B, H, W, 3) NHWC frames (see module doc).

        With ``stacked_input=True`` the single positional argument is the
        (3B, H, W, 3) producer-stacked [left; right; temporal] tensor and
        ``right``/``temporal`` must be omitted.

        Returns a dict:
          seg_logits:    (B, H, W, num_classes) float32
          flow:          (B, H, W, 2) full-res flow left -> temporal
          disp:          (B, H, W, 1) full-res left-image disparity
          flow_pyramid:  {level: (B, H/2^l, W/2^l, 2)}
          disp_pyramid:  {level: (B, H/2^l, W/2^l, 1)}
        """
        encoder = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype,
                                 s2d_stem=self.s2d_stem,
                                 stem_pad_channels=self.stem_pad_channels,
                                 s2d_levels=self.s2d_levels,
                                 entry_grad=self.entry_grad,
                                 pallas_levels=self.pallas_levels,
                                 pallas_grad=self.pallas_grad)
        if self.stacked_input:
            if right is not None or temporal is not None:
                raise ValueError(
                    "stacked_input=True takes one (3B,H,W,3) tensor")
            stacked = left
            if stacked.shape[0] % 3 != 0:
                raise ValueError(
                    "stacked_input=True expects a (3B,H,W,3) tensor whose "
                    f"leading dim is divisible by 3, got {stacked.shape}")
            b = stacked.shape[0] // 3
            feats = encoder(stacked)
            f_left = [f[:b] for f in feats]
            f_right = [f[b : 2 * b] for f in feats]
            f_temporal = [f[2 * b :] for f in feats]
            full_hw = stacked.shape[1:3]
        elif right is None or temporal is None:
            raise ValueError(
                "right/temporal are required unless stacked_input=True "
                "(pass one (3B,H,W,3) tensor in that mode)")
        elif self.batched_encoder:
            # One batched encoder application over the three frames:
            # identical math. Round 2 measured this net-negative, but that
            # verdict came from the DCE'd harness (1-2 of the 3 encoder
            # passes were pruned, understating the batched benefit by
            # construction); the honest round-3 interleaved A/B has it
            # WINNING 10.8 vs 12.0 ms/frame median, so it is the default.
            b = left.shape[0]
            feats = encoder(jnp.concatenate([left, right, temporal], axis=0))
            f_left = [f[:b] for f in feats]
            f_right = [f[b : 2 * b] for f in feats]
            f_temporal = [f[2 * b :] for f in feats]
            full_hw = left.shape[1:3]
        else:
            f_left = encoder(left)
            f_right = encoder(right)
            f_temporal = encoder(temporal)
            full_hw = left.shape[1:3]

        disp_out = DisparityDecoder(
            max_disp_full=self.max_disp_full,
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            corr_stack=self.corr_stack,
            distribute_outputs=self.distribute_outputs,
            upfeat_impl=self.upfeat_impl,
            upsample_impl=self.upsample_impl,
            est_input=self.est_input,
            dtype=self.dtype,
        )(f_left, f_right)
        flow_out = FlowDecoder(
            max_disp=self.flow_max_disp,
            est_channels=tuple(self.est_channels),
            ctx_channels=tuple(self.ctx_channels),
            corr_impl=self.corr_impl,
            fused=self.fused,
            corr_stack=self.corr_stack,
            distribute_outputs=self.distribute_outputs,
            upfeat_impl=self.upfeat_impl,
            upsample_impl=self.upsample_impl,
            est_input=self.est_input,
            dtype=self.dtype,
        )(f_left, f_temporal)
        seg_logits = make_seg_head(
            self.seg_head, self.num_classes, self.fpn_channels, self.dtype
        )(f_left, full_hw)
        return {
            "seg_logits": seg_logits,
            "flow": flow_out["flow"].astype(jnp.float32),
            "disp": disp_out["disp"].astype(jnp.float32),
            "flow_pyramid": flow_out["flow_pyramid"],
            "disp_pyramid": disp_out["disp_pyramid"],
        }
