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


def upsample2x(x, method: str = "bilinear", impl: str = "resize"):
    """Spatial x2 upsample of an NHWC tensor.

    impl="resize" goes through jax.image.resize (gather/matmul lowering);
    impl="phase" uses the phase-split formulation below — same math
    (half-pixel bilinear, edge-renormalized) to fp-reassociation tolerance,
    but lowered entirely as slices + weighted adds + an interleave reshape,
    with no spatial-dim matmuls or transposes for XLA to relayout around.
    """
    if impl == "phase" and method == "bilinear":
        return upsample2x_phase(x)
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method=method)


def _up2_phase_dim(x, axis: int):
    """Half-pixel bilinear 2x along one spatial axis.

    Output o maps to input (o + 0.5)/2 - 0.5, so the two output phases are
    2-tap filters of the input: y[2q] = 0.25*x[q-1] + 0.75*x[q] and
    y[2q+1] = 0.75*x[q] + 0.25*x[q+1]. At the borders jax.image.resize drops
    the out-of-range tap and renormalizes the row to sum 1, which is exactly
    edge-clamping (0.25*x[0] + 0.75*x[0] = x[0]) — equality to resize is
    pinned by tests/test_models.py::TestUpsamplePhase."""
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    prev = jnp.concatenate(
        [first, jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis
    )
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), last], axis
    )
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def upsample2x_phase(x):
    """Bilinear 2x upsample as two separable phase-split passes (H then W)."""
    return _up2_phase_dim(_up2_phase_dim(x, 1), 2)


def upsample_to(x, hw, method: str = "bilinear"):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method=method)


def encode_pair(encoder, im1, im2):
    """Encode both frames with the shared encoder (two separate passes).

    History: round 2 measured the batched single-pass variant 1.2-1.4 ms
    SLOWER end-to-end, but that A/B raced a DCE'd graph (the harness pruned
    1-2 of the encoder passes); the honest round-3 harness has the batched
    encoder WINNING on the joint model (10.8 vs 12.0 ms/frame median), and
    CerberusNet.batched_encoder now defaults True. The two-frame single-task
    models keep separate passes until raced honestly on their own graphs."""
    return encoder(im1), encoder(im2)


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


class _ConvMirror(nn.Module):
    """Parameter-compatible stand-in for ``nn.Conv(features, kernel_size)``:
    declares the identical {kernel, bias} params (same names, shapes, and
    initializers, hence identical RNG-derived init values) but returns them
    as arrays instead of computing, so callers can fuse the convolution."""

    features: int
    in_features: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvBlockMirror(nn.Module):
    """Param-tree mirror of ConvBlock (ConvBlock_i/Conv_0/{kernel,bias})."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _ConvMirror(self.features, self.in_features, name="Conv_0")()


def _conv_same(x, k, dilation: int = 1):
    return jax.lax.conv_general_dilated(
        x,
        k,
        (1, 1),
        "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_over_components(comps, kernel, bias, dtype, dilation: int = 1):
    """``conv(concat(comps, -1), kernel) + bias`` without materializing the
    concatenation: the kernel's input axis is sliced per component and the
    partial sums accumulated (convolution is linear over input channels).

    This removes the widest activation concat in the network — the
    DenseEstimator output stack (565ch at flow level 2) was only ever
    consumed by a single conv, and XLA materialized it as a 194 us
    concatenate per level (round-2 profile, tools/profile_forward.py)."""
    acc = None
    off = 0
    for c in comps:
        n = c.shape[-1]
        sl = kernel[:, :, off : off + n, :].astype(dtype)
        y = _conv_same(c.astype(dtype), sl, dilation)
        acc = y if acc is None else acc + y
        off += n
    return acc + bias.astype(dtype)


def conv_transpose_subpixel(comps, kernel, bias, dtype):
    """``conv_transpose(concat(comps, -1), k4x4, strides (2,2), SAME)`` as a
    stride-1 VALID conv + depth-to-space (subpixel decomposition), distributed
    over the components like conv_transpose_over_components.

    Motivation (VERDICT r1 item 2): lax.conv_transpose lowers to an
    lhs-dilated convolution, a suspected source of the ~3.8 ms/frame XLA
    layout copies in the round-1 profile. The subpixel form is a dense
    stride-1 convolution the MXU tiles natively. Math: with SAME padding at
    stride 2 the transposed conv reduces per dimension to
      y[2q]   = x[q-1]*K[0] + x[q]*K[2]
      y[2q+1] = x[q]  *K[1] + x[q+1]*K[3]
    so each of the 4 output phases is a 2x2 sub-kernel correlation; embedding
    the sub-kernels in a 3x3 window (zero tap per dim) makes all phases one
    conv over the 1-padded input, interleaved back by depth-to-space.
    Verified equal to lax.conv_transpose to fp-reassociation tolerance
    (tests/test_fused_estimator.py)."""
    cout = kernel.shape[3]

    def sub(ph_h, ph_w, ksl):
        ih = (0, 2) if ph_h == 0 else (1, 3)
        iw = (0, 2) if ph_w == 0 else (1, 3)
        k2 = ksl[jnp.array(ih)][:, jnp.array(iw)]  # (2,2,cin_c,cout)
        pads = (
            (0, 1) if ph_h == 0 else (1, 0),
            (0, 1) if ph_w == 0 else (1, 0),
        )
        return jnp.pad(k2, (pads[0], pads[1], (0, 0), (0, 0)))

    acc = None
    off = 0
    for c in comps:
        n = c.shape[-1]
        ksl = kernel[:, :, off : off + n, :].astype(dtype)
        ksub = jnp.concatenate(
            [sub(a, b, ksl) for a in (0, 1) for b in (0, 1)], axis=-1
        )  # (3,3,cin_c,4*cout)
        xp = jnp.pad(c.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, ksub, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        acc = y if acc is None else acc + y
        off += n
    b, h, w, _ = acc.shape
    acc = acc + jnp.tile(bias.astype(dtype), 4)
    acc = acc.reshape(b, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return acc.reshape(b, 2 * h, 2 * w, cout)


def _conv_s2_dx_kernel(k):
    """[3,3,Cin,Cout] -> (2,2,Cout,4*Cin) phase kernel computing the
    stride-2 SAME input gradient as ONE stride-1 conv (see conv_s2_phase).

    Per spatial dim (XLA SAME pad for k=3/stride 2 on even extents is
    (0,1): output p reads input rows 2p..2p+2), the input-gradient phases
    are  dx[2q] = g[q]*K[0] + g[q-1]*K[2]  and  dx[2q+1] = g[q]*K[1]  —
    a 2-tap window over g padded (1,0). Window position w in {0,1} reads
    g row q-1+w, so tap selector S[phase][w] = ((K2, K0), (zero, K1))."""
    _, _, cin, cout = k.shape
    sel = ((2, 0), (None, 1))
    zero = jnp.zeros((cout, cin), k.dtype)
    blocks = []
    for a in (0, 1):
        for b in (0, 1):
            rows = []
            for wy in (0, 1):
                cols = []
                for wx in (0, 1):
                    ty, tx = sel[a][wy], sel[b][wx]
                    cols.append(
                        zero if ty is None or tx is None
                        else k[ty, tx].T  # (Cout, Cin)
                    )
                rows.append(jnp.stack(cols, 0))
            blocks.append(jnp.stack(rows, 0))  # (2,2,Cout,Cin), phase (a,b)
    return jnp.concatenate(blocks, axis=-1)  # phase-major (a,b,cin)


def _conv_s2_dx(g, k):
    """Input gradient of the stride-2 SAME 3x3 conv, computed as one dense
    stride-1 conv over the output cotangent + depth-to-space — the subpixel
    decomposition of the lhs-dilated convolution XLA's default transpose
    rule emits (the relayout-heavy pattern the train profile localizes to
    the encoder level-entry convs; same trick as conv_transpose_subpixel)."""
    cin = k.shape[2]
    k4 = _conv_s2_dx_kernel(k)
    gp = jnp.pad(g, ((0, 0), (1, 0), (1, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        gp, k4, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    b, h2, w2, _ = y.shape
    y = y.reshape(b, h2, w2, 2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h2, 2 * w2, cin)


def _conv_s2(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@jax.custom_vjp
def conv_s2_phase(x, k):
    """Stride-2 3x3 SAME conv (NHWC/HWIO), forward-identical to
    lax.conv_general_dilated, whose custom backward computes the INPUT
    gradient via the phase decomposition above instead of XLA's lhs-dilated
    convolution. Weight gradient keeps XLA's native path (a window-dilated
    conv — not the pattern this vjp replaces). Requires even H/W (the
    SAME padding decomposition assumes pad (0,1) per dim); gradients are
    pinned against jax.vjp of the plain conv in tests/test_models.py."""
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(f"conv_s2_phase needs even H/W, got {x.shape}")
    return _conv_s2(x, k)


def _conv_s2_phase_fwd(x, k):
    return conv_s2_phase(x, k), (x, k)


def _conv_s2_phase_bwd(res, g):
    x, k = res
    _, pull = jax.vjp(lambda kk: _conv_s2(x, kk), k)
    (dk,) = pull(g)
    return _conv_s2_dx(g, k), dk


conv_s2_phase.defvjp(_conv_s2_phase_fwd, _conv_s2_phase_bwd)


def conv_transpose_over_components(comps, kernel, bias, strides, dtype):
    """``conv_transpose(concat(comps, -1), kernel) + bias`` distributed over
    the components (same linearity as conv_over_components). Mirrors flax
    nn.ConvTranspose semantics: channels-last, HWIO kernel, SAME padding."""
    acc = None
    off = 0
    for c in comps:
        n = c.shape[-1]
        sl = kernel[:, :, off : off + n, :].astype(dtype)
        y = jax.lax.conv_transpose(c.astype(dtype), sl, strides, "SAME")
        acc = y if acc is None else acc + y
        off += n
    return acc + bias.astype(dtype)


class FusedDenseEstimator(nn.Module):
    """MXU-efficient computation of DenseEstimator (+ same-input extra heads
    such as the flow/disparity prediction conv), math-identical and
    param-tree-identical to the naive modules.

    The naive DenseNet trunk re-reads the whole growing concat stack at every
    conv, and the narrow prediction conv (2 or 1 output channels) costs a
    full 128-wide MXU pass over the ~5000-channel stack. Here every stack
    component is convolved ONCE against the output-axis concatenation of all
    its consumers' kernel slices (conv(concat(a, b), K) == conv(a, K_a) +
    conv(b, K_b)); consumers accumulate partial sums and apply bias +
    LeakyReLU at finalization. Measured on v5e at the flow level-2 shape:
    1.6x over the naive trunk+prediction (tests pin equality to the oracle).

    extra_kb: sequence of (kernel, bias) for extra convs reading the final
    stack (declared by the caller with _ConvMirror so the param tree matches
    the unfused layout). Returns (stack, [extra outputs…], components).
    """

    channels: Sequence[int] = (128, 128, 96, 64, 32)
    dtype: jnp.dtype = jnp.float32
    # False: return the raw component list instead of concatenating the
    # final stack — callers whose only stack consumer is a single linear op
    # (ContextNetwork first conv, up-feat ConvTranspose) distribute that op
    # over the components and skip the concat entirely.
    concat_stack: bool = True

    @nn.compact
    def __call__(self, x0, extra_kb=()):
        """x0: the estimator input — one tensor, or a LIST of tensors taken
        as pre-split stack components (e.g. [cost_volume, features]); the
        math is identical to concatenating them first, but each component
        is consumed where it stands, skipping the input-concat copy."""
        initial = list(x0) if isinstance(x0, (list, tuple)) else [x0]
        n0 = len(initial)
        n_est = len(self.channels)
        kbs = []
        cin = sum(c.shape[-1] for c in initial)
        for i, ch in enumerate(self.channels):
            kbs.append(_ConvBlockMirror(ch, cin, name=f"ConvBlock_{i}")())
            cin += ch

        # est conv i consumes the n0 initial components + y_1..y_i
        consumers = [
            {"k": k, "b": b, "needs": n0 + i, "acc": None}
            for i, (k, b) in enumerate(kbs)
        ]
        consumers += [
            {"k": k, "b": b, "needs": n0 + n_est, "acc": None}
            for (k, b) in extra_kb
        ]

        components = list(initial)
        offset = 0
        for j in range(n0 + n_est):
            c = components[j]
            lo, hi = offset, offset + c.shape[-1]
            offset = hi
            takers = [t for t in consumers if t["needs"] > j]
            merged = jnp.concatenate(
                [t["k"][:, :, lo:hi, :].astype(self.dtype) for t in takers], -1
            )
            out = _conv_same(c.astype(self.dtype), merged)
            pos = 0
            for t in takers:
                n = t["k"].shape[-1]
                part = out[..., pos : pos + n]
                pos += n
                t["acc"] = part if t["acc"] is None else t["acc"] + part
            i_est = j - (n0 - 1)  # y_{i_est+1} finalizes after component j
            if 0 <= i_est < n_est:
                t = consumers[i_est]
                components.append(leaky(t["acc"] + t["b"].astype(self.dtype)))

        stack = (
            jnp.concatenate(components, axis=-1)
            if self.concat_stack
            else components
        )
        extra_outs = [
            t["acc"] + t["b"].astype(self.dtype) for t in consumers[n_est:]
        ]
        return stack, extra_outs


class ContextNetwork(nn.Module):
    """Dilated-conv refinement (SURVEY.md §9.4 step 5): 7 convs with
    dilations 1,2,4,8,16,1,1 producing a residual for the prediction.

    ``x`` may be a LIST of tensors taken as pre-split channel components of
    the input stack (the FusedDenseEstimator concat_stack=False output): the
    first conv is then distributed over the components
    (conv_over_components), skipping the stack concatenation. Param tree and
    math are identical either way (explicit child names pin the layout)."""

    out_channels: int = 2
    channels: Sequence[int] = (128, 128, 128, 96, 64, 32)
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        start = 0
        if isinstance(x, (list, tuple)):
            comps = list(x)
            cin = sum(c.shape[-1] for c in comps)
            k, b = _ConvBlockMirror(self.channels[0], cin, name="ConvBlock_0")()
            x = leaky(
                conv_over_components(
                    comps, k, b, self.dtype, dilation=self.dilations[0]
                )
            )
            start = 1
        for i in range(start, len(self.channels)):
            x = ConvBlock(
                self.channels[i],
                dilation=self.dilations[i],
                dtype=self.dtype,
                name=f"ConvBlock_{i}",
            )(x)
        return nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="Conv_0",
        )(x)
