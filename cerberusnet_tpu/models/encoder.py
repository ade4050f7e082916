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

import jax
import jax.numpy as jnp
import flax.linen as nn

from cerberusnet_tpu.models.common import (
    ConvBlock,
    _ConvBlockMirror,
    conv_s2_phase,
    leaky,
)


def _s2d_stem_conv(x, kernel, bias, dtype):
    """Stride-2 3x3 SAME conv on a (B, H, W, C) input, computed as a
    stride-1 2x2 conv on the space-to-depth(2) input with the SAME 3x3
    kernel rearranged — mathematically identical products (XLA SAME padding
    for k=3/stride 2 on even extents is (0, 1), i.e. output pixel i reads
    input rows 2i..2i+2 with the last row zero-padded).

    Why: the raw 3-channel image input forces a ~74 us tiled-layout copy
    per frame in front of the first conv (round-2 profile: the single
    largest copy shape, bf16[512,8,132,3]); after s2d the conv input has
    4C channels at half resolution and the rearrangement is a cheap
    reshape/transpose chain XLA fuses."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"s2d stem needs even H/W, got {h}x{w}")
    f = kernel.shape[-1]
    # [3,3,C,F] -> zero-pad taps to [4,4,C,F] -> [Dy,dy,Dx,dx,C,F]
    k4 = jnp.pad(kernel.astype(dtype), ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = (
        k4.reshape(2, 2, 2, 2, c, f)
        .transpose(0, 2, 1, 3, 4, 5)  # [Dy,Dx,dy,dx,C,F]
        .reshape(2, 2, 4 * c, f)
    )
    x2 = (
        x.astype(dtype)
        .reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)  # [B, H/2, W/2, dy, dx, C]
        .reshape(b, h // 2, w // 2, 4 * c)
    )
    y = jax.lax.conv_general_dilated(
        x2, k2, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def _space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C], phase-major channel order
    (dy, dx, C) — the same rearrangement _s2d_stem_conv uses."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def _depth_to_space(z, c):
    """Inverse of _space_to_depth."""
    b, h2, w2, _ = z.shape
    z = z.reshape(b, h2, w2, 2, 2, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def _phase_placement(stride: int):
    """0/1 placement tensor P[o, d, D, t] for one spatial axis: original
    kernel tap t of output phase D lands on s2d-space tap offset o reading
    input phase d.

    stride 1 (full-res 3x3 SAME conv in s2d space): output row 2i+D reads
    input row 2i+D+t-1 = s2d cell i + floor((D+t-1)/2), phase (D+t-1) mod 2
    -> a 3-tap (o in 0..2, SAME pad (1,1)) s2d conv.

    stride 2 (level-entry conv, XLA SAME pad (0,1) on even extents: output
    p reads rows 2p..2p+2): output row 2i+D reads input row 4i+2D+t = s2d
    cell 2i + D + t//2, phase t mod 2 -> a 3-tap stride-2 s2d conv with
    pad (0, 1)."""
    import numpy as np

    p = np.zeros((3, 2, 2, 3), np.float32)
    for D in (0, 1):
        for t in range(3):
            if stride == 1:
                o, d = divmod(D + t - 1, 2)
                o += 1
            else:
                o, d = D + t // 2, t % 2
            p[o, d, D, t] = 1.0
    return p


def _k_to_s2d(kernel, stride: int):
    """Rearrange a [3,3,C,F] kernel into the zero-structured [3,3,4C,4F]
    kernel computing the same conv entirely in space-to-depth space.
    75% zeros (4x FLOPs) — but every conv then runs with 4x the channels,
    which keeps XLA in one channel-minor layout instead of bouncing the
    small-C tensors through spatial-in-lanes relayout copies (the r3
    profiles: 4.65 ms/step fwd, 23.3 ms/step train, mostly at C=16/32)."""
    py = jnp.asarray(_phase_placement(stride), kernel.dtype)
    # K'[oy,dy,Dy, ox,dx,Dx, c,f] = sum_{ty,tx} P[oy,dy,Dy,ty] P[ox,dx,Dx,tx] K[ty,tx,c,f]
    kp = jnp.einsum("yabt,xcdu,tuef->yaxcebdf", py, py, kernel)
    # -> [oy, ox, (dy, dx, c), (Dy, Dx, f)]
    kh, kw, c, f = kernel.shape
    kp = kp.transpose(0, 2, 1, 3, 4, 5, 6, 7)  # oy,ox,dy,dx,c,Dy,Dx,f
    return kp.reshape(3, 3, 4 * c, 4 * f)


def _s2d_conv(z, kernel, bias, dtype, stride: int):
    """Conv in s2d space: z = s2d(x), returns s2d(conv(x, kernel)) with the
    ORIGINAL [3,3,C,F] kernel/bias (stride 1 SAME, or the stride-2 level
    entry). Math-identical to the full-res conv (tests/test_models.py)."""
    kp = _k_to_s2d(kernel.astype(dtype), stride)
    pad = ((1, 1), (1, 1)) if stride == 1 else ((0, 1), (0, 1))
    y = jax.lax.conv_general_dilated(
        z.astype(dtype), kp, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.tile(bias.astype(dtype), 4)


def _padded_stem_conv(x, kernel, bias, dtype, pad_to: int):
    """Stride-2 3x3 SAME conv with the input's channel axis zero-padded from
    C to ``pad_to`` and the kernel's input axis zero-padded to match —
    mathematically identical (padded channels multiply zero kernel taps).

    Why: the raw 3-channel image forces XLA into a spatial-in-lanes layout
    for the stem conv, and the relayout copy of each bf16[512,8,132,3]
    input costs ~220 us on v5e (round-3 profile, 'copy' by shape — the
    single largest copy shape, 664 us/step over the three frames). A
    lane-aligned channel count keeps the image in its natural channel-minor
    layout. The extra stem FLOPs are negligible (first conv only)."""
    b_, h, w, c = x.shape
    xp = jnp.pad(x.astype(dtype), ((0, 0), (0, 0), (0, 0), (0, pad_to - c)))
    kp = jnp.pad(
        kernel.astype(dtype), ((0, 0), (0, 0), (0, pad_to - c), (0, 0))
    )
    y = jax.lax.conv_general_dilated(
        xp, kp, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + bias.astype(dtype)


class PyramidEncoder(nn.Module):
    channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    dtype: jnp.dtype = jnp.float32
    # Compute the level-1 stride-2 conv via space-to-depth (math- and
    # param-tree-identical; see _s2d_stem_conv). Off until the interleaved
    # end-to-end A/B on hardware ranks it (tools/ab_forward.py).
    s2d_stem: bool = False
    # Zero-pad the image (and stem kernel) channel axis to this many
    # channels before the level-1 conv (math-identical; _padded_stem_conv).
    # 0 = off. Mutually exclusive with s2d_stem.
    stem_pad_channels: int = 0
    # Run the first N levels ENTIRELY in space-to-depth space (all three
    # convs per level at 4x channels / half resolution, zero-structured
    # kernels — math- and param-tree-identical; _s2d_conv). Targets the
    # small-channel layout-copy thrash the r3 profiles located at levels
    # 1-2. 0 = off. Supersedes s2d_stem / stem_pad_channels when > 0.
    s2d_levels: int = 0
    # "phase": compute the stride-2 level-entry convs via conv_s2_phase —
    # forward-identical, but the input gradient lowers as one dense
    # stride-1 conv + depth-to-space instead of XLA's lhs-dilated
    # convolution (the relayout-heavy backward pattern the r3 train profile
    # flags). Train-step A/B knob; falls back to nn.Conv on odd extents.
    entry_grad: str = "auto"
    # Run the first N levels as fused Pallas kernels (one program per level:
    # entry s2 conv + two s1 convs + leakys, all intermediates in VMEM in a
    # lane-aligned W-folded layout — ops/pallas/encoder_level.py). Targets
    # the 1.78 ms/step of small-channel layout copies every XLA-level
    # reformulation failed to remove (r3 verdict item 2). Math- and
    # param-tree-identical; custom VJP recomputes via XLA so gradients are
    # bit-equal to the plain path. Requires H%2==0, W%4==0 at each level.
    # NOT valid under spatial sharding (no halo exchange across shards);
    # the trainer forces it off when spatial mesh > 1.
    pallas_levels: int = 0
    # Backward path of the fused Pallas levels: "xla" recomputes with plain
    # convs (bit-equal grads), "pallas" runs the fused reverse-sweep kernel
    # (dx+dw+db in one program — the train-step copy-frontier lever).
    pallas_grad: str = "xla"

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 3) image -> list of 6 feature maps, levels 1..6."""
        feats = []
        # explicit names pin the ConvBlock_{i} layout so the s2d branch
        # (whose mirror would otherwise desync flax auto-numbering) yields
        # an identical param tree
        n = 0
        if self.pallas_levels:
            if self.s2d_levels or self.s2d_stem or self.stem_pad_channels:
                raise ValueError(
                    "pallas_levels is mutually exclusive with the s2d/stem "
                    "reformulation knobs")
            from cerberusnet_tpu.ops.pallas.encoder_level import encoder_level

            cin = x.shape[-1]
            x = x.astype(self.dtype)
            for i in range(min(self.pallas_levels, len(self.channels))):
                ch = self.channels[i]
                kbs = []
                for j in range(3):
                    k, b = _ConvBlockMirror(
                        ch, cin if j == 0 else ch, name=f"ConvBlock_{n}"
                    )()
                    kbs.append((k, b))
                    n += 1
                x = encoder_level(
                    x,
                    kbs[0][0], kbs[0][1],
                    kbs[1][0], kbs[1][1],
                    kbs[2][0], kbs[2][1],
                    grad=self.pallas_grad,
                )
                feats.append(x)
                cin = ch
        if self.s2d_levels:
            # z holds s2d(level input); after each level's three convs it
            # holds s2d(level output), which is EXACTLY the next level's
            # entry-conv input — levels chain with no rearrangement between
            # them (one s2d of the image in, one d2s per emitted feature).
            z = _space_to_depth(x)
            cin = x.shape[-1]
            for i in range(min(self.s2d_levels, len(self.channels))):
                ch = self.channels[i]
                for j in range(3):
                    k, b = _ConvBlockMirror(
                        ch, cin if j == 0 else ch, name=f"ConvBlock_{n}"
                    )()
                    z = leaky(
                        _s2d_conv(z, k, b, self.dtype, stride=2 if j == 0 else 1)
                    )
                    n += 1
                feats.append(_depth_to_space(z, ch))
                cin = ch
            x = feats[-1]
        for i, ch in enumerate(self.channels):
            if i < len(feats):
                continue
            if i == 0 and self.s2d_stem:
                k, b = _ConvBlockMirror(ch, x.shape[-1], name=f"ConvBlock_{n}")()
                x = leaky(_s2d_stem_conv(x, k, b, self.dtype))
            elif i == 0 and self.stem_pad_channels:
                if self.stem_pad_channels < x.shape[-1]:
                    raise ValueError(
                        f"stem_pad_channels={self.stem_pad_channels} < input "
                        f"channels {x.shape[-1]}"
                    )
                k, b = _ConvBlockMirror(ch, x.shape[-1], name=f"ConvBlock_{n}")()
                x = leaky(
                    _padded_stem_conv(x, k, b, self.dtype, self.stem_pad_channels)
                )
            elif self.entry_grad == "phase" and not (
                x.shape[1] % 2 or x.shape[2] % 2
            ):
                k, b = _ConvBlockMirror(ch, x.shape[-1], name=f"ConvBlock_{n}")()
                x = leaky(
                    conv_s2_phase(
                        x.astype(self.dtype), k.astype(self.dtype)
                    )
                    + b.astype(self.dtype)
                )
            else:
                x = ConvBlock(ch, stride=2, dtype=self.dtype,
                              name=f"ConvBlock_{n}")(x)
            n += 1
            for _ in range(2):
                x = ConvBlock(ch, dtype=self.dtype, name=f"ConvBlock_{n}")(x)
                n += 1
            feats.append(x)
        return feats
