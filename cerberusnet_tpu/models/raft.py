"""RAFTFlowNet — iterative all-pairs refinement optical flow (RAFT family).

A third flow-model family beyond the reference's PWC-style head (SURVEY.md
§3 C5) and the dilated-cost-volume DCVFlowNet: RAFT (PAPERS.md lineage —
'RAFT: Recurrent All-Pairs Field Transforms', Teed & Deng 2020) computes a
single ALL-PAIRS correlation volume at one resolution and refines a flow
field with a weight-tied convolutional GRU that indexes the volume around
the current flow estimate. The reference repo predates RAFT; this family is
the accuracy-ceiling option ("beats, not just matches") while CerberusNet /
DCV remain the latency options.

TPU-first design decisions:
  * All-pairs correlation is ONE batched matmul — (B, N, C) x (B, C, N) —
    the ideal MXU shape, instead of the reference family's shifted-window
    correlation loops. The 4-level correlation pyramid is built once by
    average pooling and reused by every iteration.
  * The lookup operator (sample the volume in a (2r+1)^2 window around the
    current flow, bilinearly) uses the same flattened row-gather technique
    as ops/warp.py: 4 corner `take_along_axis` gathers on a (B*N, hk*wk)
    matrix — no per-element VMEM gathers, no dynamic shapes, XLA lowers it
    to the TPU dynamic-gather it already handles for warp2d.
  * The update iterations are weight-tied and run under `nn.scan` (one
    traced block, compact HLO — CLAUDE.md rule 8 caps unrolled op counts on
    the remote compiler); `unroll_iters=True` unrolls instead, kept as an
    interleaved-A/B perf knob since unrolling can let XLA fuse across
    iterations.
  * Convex upsampling (the RAFT learned-mask upsample) is expressed as 9
    static shifted views + a depth-to-space reshape — no gather at all.

Output contract matches the framework's flow heads: {"flow": full-res f32,
"flow_pyramid": {level: low-res}} plus "flow_iterates" (T, B, h, w, 2) for
the RAFT sequence loss (train/losses.py raft_sequence_loss).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from cerberusnet_tpu.models.common import leaky
from cerberusnet_tpu.models.encoder import PyramidEncoder


def allpairs_correlation(f1, f2):
    """All-pairs correlation: (B, h, w, C) x (B, h, w, C) -> (B, h*w, h, w).

    corr[b, n, y2, x2] = <f1[b, n], f2[b, y2, x2]> / sqrt(C). One batched
    matmul on the MXU; accumulation in f32 regardless of input dtype.
    """
    b, h, w, c = f1.shape
    a = f1.reshape(b, h * w, c)
    bb = f2.reshape(b, h * w, c)
    corr = jnp.einsum(
        "bnc,bmc->bnm", a, bb, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(c))
    return corr.reshape(b, h * w, h, w)


def correlation_pyramid(corr, num_levels: int):
    """Average-pool the LAST TWO dims (the frame-2 grid) num_levels times.

    Returns a list of (B, N, hk, wk) volumes, level k pooled by 2^k. Pooling
    the target grid (not the query grid) keeps one volume row per query
    pixel at every level — each level widens the displacement context the
    lookup window covers.
    """
    pyramid = [corr]
    x = corr
    for _ in range(num_levels - 1):
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) * 0.25
        pyramid.append(x)
    return pyramid


def _interp_matrix(pos, size: int, radius: int):
    """Per-query bilinear interpolation matrix for a (2r+1) window.

    pos: (B, N) fractional positions. Returns (B, N, 2r+1, size) f32 with
    M[b, n, d, j] = bilinear weight of grid cell j for the sample at
    pos + (d - r); cells outside [0, size-1] simply never match the
    equality test, which reproduces the corner-mask zero-outside
    convention exactly.
    """
    pos = pos.astype(jnp.float32)
    x0 = jnp.floor(pos)
    f = (pos - x0)[..., None, None]  # (B, N, 1, 1)
    base = (
        x0[..., None, None]
        + jnp.arange(-radius, radius + 1, dtype=jnp.float32)[None, None, :, None]
    )  # (B, N, P, 1): left corner cell of each window sample
    cells = jnp.arange(size, dtype=jnp.float32)[None, None, None, :]
    is0 = (cells == base).astype(jnp.float32)
    is1 = (cells == base + 1.0).astype(jnp.float32)
    return is0 * (1.0 - f) + is1 * f


def _corr_lookup_onehot(pyramid, coords, radius: int):
    """Gather-free lookup: the bilinear window sample is LINEAR in the
    volume, so it factors into two tiny batched matmuls per level,
    vol' = A_y @ vol @ A_x^T, with the per-query interpolation matrices of
    _interp_matrix. All MXU/VPU work — no gathers. Math identical to the
    gather path (fp reassociation only); pinned in tests/test_raft.py.

    Motivation (round 4): the r4e RAFT envelope sweep measured ~27 ms per
    GRU iteration at a 32x64 latent — the scalar volume gathers dominate
    (TPU gathers move one element per index; 4 corners x 81 window x 4
    levels x 2048 queries/iter). The matmul form moves the same data as
    ~90 MFLOP of batched contractions instead.
    """
    b, h, w, _ = coords.shape
    n = h * w
    p = 2 * radius + 1
    cf = coords.astype(jnp.float32).reshape(b, n, 2)
    outs = []
    for k, vol in enumerate(pyramid):
        hk, wk = vol.shape[2], vol.shape[3]
        xs = cf[..., 0] / (2.0**k)
        ys = cf[..., 1] / (2.0**k)
        ay = _interp_matrix(ys, hk, radius)  # (B, N, P, hk)
        ax = _interp_matrix(xs, wk, radius)  # (B, N, P, wk)
        v = vol.astype(jnp.float32)
        rows = jnp.einsum(
            "bndy,bnyx->bndx", ay, v, preferred_element_type=jnp.float32
        )
        out = jnp.einsum(
            "bndx,bnex->bnde", rows, ax, preferred_element_type=jnp.float32
        )  # (B, N, P(dy), P(dx)) — matches the meshgrid('xy') ravel order
        outs.append(out.reshape(b, n, p * p))
    return jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)


def corr_lookup(pyramid, coords, radius: int, impl: str = "gather"):
    """Sample each pyramid level in a (2r+1)^2 window around ``coords``.

    pyramid: list of (B, N, hk, wk) volumes (N = h*w query pixels).
    coords:  (B, h, w, 2) absolute sample positions (x, y) in level-0 pixels
             of the frame-2 grid (i.e. base_grid + current flow).
    Returns (B, h, w, len(pyramid) * (2r+1)^2) lookup features, f32.

    Bilinear, zero outside the frame (ops/warp.py convention).
    impl='gather': each corner read is one flattened row-gather (volume
    rows are (hk*wk,) vectors, take_along_axis on the minor dim).
    impl='onehot': gather-free two-matmul factorization (see
    _corr_lookup_onehot) — identical math.
    """
    if impl not in ("gather", "onehot"):
        # ModelConfig.raft_lookup flows here unvalidated; a typo must not
        # silently select the 12-58x slower gather path (ADVICE r4).
        raise ValueError(
            f"corr_lookup impl must be 'gather' or 'onehot', got {impl!r}")
    if impl == "onehot":
        return _corr_lookup_onehot(pyramid, coords, radius)
    b, h, w, _ = coords.shape
    n = h * w
    p = 2 * radius + 1
    dx, dy = jnp.meshgrid(
        jnp.arange(-radius, radius + 1, dtype=jnp.float32),
        jnp.arange(-radius, radius + 1, dtype=jnp.float32),
        indexing="xy",
    )
    delta = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (P, 2)

    cf = coords.astype(jnp.float32).reshape(b, n, 1, 2)
    outs = []
    for k, vol in enumerate(pyramid):
        hk, wk = vol.shape[2], vol.shape[3]
        pts = cf / (2.0**k) + delta  # (B, N, P, 2)
        xs, ys = pts[..., 0], pts[..., 1]
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        wx = xs - x0
        wy = ys - y0

        flat = vol.reshape(b * n, hk * wk).astype(jnp.float32)

        def corner(cx, cy):
            inb = (cx >= 0) & (cx <= wk - 1) & (cy >= 0) & (cy <= hk - 1)
            xi = jnp.clip(cx, 0, wk - 1).astype(jnp.int32)
            yi = jnp.clip(cy, 0, hk - 1).astype(jnp.int32)
            idx = (yi * wk + xi).reshape(b * n, p * p)
            vals = jnp.take_along_axis(flat, idx, axis=1)
            return vals.reshape(b, n, p * p) * inb.reshape(b, n, p * p)

        v00 = corner(x0, y0)
        v01 = corner(x0 + 1, y0)
        v10 = corner(x0, y0 + 1)
        v11 = corner(x0 + 1, y0 + 1)
        wxf = wx.reshape(b, n, p * p)
        wyf = wy.reshape(b, n, p * p)
        out = (
            v00 * (1 - wxf) * (1 - wyf)
            + v01 * wxf * (1 - wyf)
            + v10 * (1 - wxf) * wyf
            + v11 * wxf * wyf
        )
        outs.append(out)
    return jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)


def allpairs_correlation_1d(f1, f2):
    """Epipolar all-pairs correlation: (B, h, w, C) x2 -> (B, h*w, w).

    corr[b, y*w + x1, x2] = <f1[b, y, x1], f2[b, y, x2]> / sqrt(C) — every
    pixel against every candidate on ITS OWN row (the rectified-stereo
    search space). One batched matmul per row on the MXU.
    """
    b, h, w, c = f1.shape
    corr = jnp.einsum(
        "bhic,bhjc->bhij", f1, f2, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(c))
    return corr.reshape(b, h * w, w)


def correlation_pyramid_1d(corr, num_levels: int):
    """Average-pool the LAST dim (the candidate axis) num_levels times;
    list of (B, N, wk) volumes."""
    pyramid = [corr]
    x = corr
    for _ in range(num_levels - 1):
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2), (1, 1, 2), "VALID"
        ) * 0.5
        pyramid.append(x)
    return pyramid


def corr_lookup_1d(pyramid, coords_x, radius: int, impl: str = "gather"):
    """1-D lookup: sample each level in a (2r+1) window around ``coords_x``.

    pyramid: list of (B, N, wk); coords_x: (B, h, w) absolute x positions in
    the right image (level-0 pixels). Returns (B, h, w, L*(2r+1)), f32.
    Linear interpolation, zero outside the row (the warp1d convention).
    impl='onehot': gather-free single-matmul factorization (the 1-D
    instance of _corr_lookup_onehot) — identical math.
    """
    if impl not in ("gather", "onehot"):
        raise ValueError(
            f"corr_lookup_1d impl must be 'gather' or 'onehot', got {impl!r}")
    b, h, w = coords_x.shape
    if impl == "onehot":
        n, p = h * w, 2 * radius + 1
        cf = coords_x.astype(jnp.float32).reshape(b, n)
        outs = []
        for k, vol in enumerate(pyramid):
            wk = vol.shape[2]
            ax = _interp_matrix(cf / (2.0**k), wk, radius)  # (B, N, P, wk)
            out = jnp.einsum(
                "bnx,bndx->bnd", vol.astype(jnp.float32), ax,
                preferred_element_type=jnp.float32,
            )
            outs.append(out)
        return jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)
    n = h * w
    p = 2 * radius + 1
    delta = jnp.arange(-radius, radius + 1, dtype=jnp.float32)

    cf = coords_x.astype(jnp.float32).reshape(b, n, 1)
    outs = []
    for k, vol in enumerate(pyramid):
        wk = vol.shape[2]
        xs = cf / (2.0**k) + delta  # (B, N, P)
        x0 = jnp.floor(xs)
        wx = xs - x0
        flat = vol.reshape(b * n, wk).astype(jnp.float32)

        def corner(cx):
            inb = (cx >= 0) & (cx <= wk - 1)
            xi = jnp.clip(cx, 0, wk - 1).astype(jnp.int32)
            vals = jnp.take_along_axis(flat, xi.reshape(b * n, p), axis=1)
            return vals.reshape(b, n, p) * inb

        out = corner(x0) * (1 - wx) + corner(x0 + 1) * wx
        outs.append(out)
    return jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)


def base_grid(b, h, w):
    """(B, h, w, 2) grid of absolute (x, y) pixel positions."""
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    return jnp.stack([xs, ys], axis=-1)


def convex_upsample(flow, mask, factor: int):
    """RAFT convex upsampling: each fine pixel is a learned convex combo of
    its coarse pixel's 3x3 neighbourhood.

    flow: (B, h, w, C) in COARSE-pixel units (C=2 flow, C=1 disparity);
    mask: (B, h, w, factor^2 * 9) unnormalized logits. Returns
    (B, h*factor, w*factor, C) in FINE-pixel units (values scaled by
    ``factor``). Gather-free: the 9 neighbours are static pad+slice shifts,
    the upsample is a depth-to-space reshape.
    """
    b, h, w, c = flow.shape
    m = mask.astype(jnp.float32).reshape(b, h, w, factor * factor, 9)
    m = jax.nn.softmax(m, axis=-1)

    fp = jnp.pad(
        flow.astype(jnp.float32) * factor,
        ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="edge",
    )
    neigh = jnp.stack(
        [
            fp[:, i : i + h, j : j + w, :]
            for i in range(3)
            for j in range(3)
        ],
        axis=3,
    )  # (B, h, w, 9, C)
    up = jnp.einsum("bhwkn,bhwnc->bhwkc", m, neigh)  # (B, h, w, f*f, C)
    up = up.reshape(b, h, w, factor, factor, c)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * factor, w * factor, c)
    return up


class ConvGRU(nn.Module):
    """3x3 convolutional GRU cell (the RAFT 'SmallUpdateBlock' recurrence)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(
            nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=self.dtype,
                    name="convz")(hx)
        )
        r = nn.sigmoid(
            nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=self.dtype,
                    name="convr")(hx)
        )
        q = nn.tanh(
            nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=self.dtype,
                    name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1.0 - z) * h + z * q


class MotionEncoder(nn.Module):
    """Encode (correlation lookup, current flow) into motion features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr, flow):
        c = leaky(nn.Conv(96, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = leaky(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                          name="convc2")(c))
        f = leaky(nn.Conv(64, (5, 5), padding="SAME", dtype=self.dtype,
                          name="convf1")(flow))
        f = leaky(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                          name="convf2")(f))
        out = leaky(
            nn.Conv(80, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv")(jnp.concatenate([c, f], axis=-1))
        )
        # re-append raw flow so the GRU always sees the current estimate
        return jnp.concatenate([out, flow], axis=-1)


class UpdateBlock(nn.Module):
    """One RAFT refinement step: lookup -> motion encoder -> GRU -> deltas.

    Returns (new_hidden, delta_field, upsample_mask_logits). pred_channels
    is 2 for flow, 1 for disparity (RAFT-Stereo)."""

    hidden: int
    upsample_factor: int
    pred_channels: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, corr_feat, flow, context):
        motion = MotionEncoder(dtype=self.dtype, name="motion")(
            corr_feat.astype(self.dtype), flow.astype(self.dtype)
        )
        inp = jnp.concatenate([context, motion], axis=-1)
        hidden = ConvGRU(self.hidden, dtype=self.dtype, name="gru")(hidden, inp)
        head = leaky(
            nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="flow_head1")(hidden)
        )
        delta = nn.Conv(self.pred_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name="flow_head2")(head)
        mh = leaky(
            nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="mask_head1")(hidden)
        )
        mask = nn.Conv(
            self.upsample_factor**2 * 9, (1, 1), dtype=self.dtype,
            name="mask_head2",
        )(mh)
        return hidden, delta.astype(jnp.float32), mask


class RAFTFlowDecoder(nn.Module):
    """Iterative all-pairs flow decoder over pyramid features (features
    taken at 1/2^level resolution, projected to fdim).

    iters is static (fixed trace); at inference a smaller iters can be used
    by constructing a second module with the same params (weight-tied
    update block — the param tree is iteration-count independent).
    """

    level: int = 3  # 1/8 resolution, the RAFT operating point
    fdim: int = 128  # correlation feature dim
    hdim: int = 96  # GRU hidden dim
    cdim: int = 64  # context dim
    corr_levels: int = 4
    radius: int = 4
    iters: int = 12
    unroll_iters: bool = False  # perf knob: unroll instead of nn.scan
    lookup_impl: str = "onehot"  # onehot | gather volume lookup (onehot raced 12-58x faster, chain r4f)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats1, feats2):
        f1 = feats1[self.level - 1]
        f2 = feats2[self.level - 1]

        # correlation features: shared 1x1 projection (no activation — raw
        # dot products, per RAFT)
        proj = nn.Conv(self.fdim, (1, 1), dtype=self.dtype, name="corr_proj")
        g1 = proj(f1)
        g2 = proj(f2)
        corr = allpairs_correlation(g1, g2)
        pyramid = correlation_pyramid(corr, self.corr_levels)

        # context features from frame 1 only: hidden init (tanh) + context
        # (relu), per RAFT
        ctx = nn.Conv(
            self.hdim + self.cdim, (3, 3), padding="SAME", dtype=self.dtype,
            name="context_proj",
        )(f1)
        hidden = nn.tanh(ctx[..., : self.hdim])
        context = nn.relu(ctx[..., self.hdim:])

        b, h, w, _ = f1.shape
        grid = base_grid(b, h, w)
        flow0 = jnp.zeros((b, h, w, 2), jnp.float32)
        factor = 2**self.level

        if self.unroll_iters:
            update = UpdateBlock(
                self.hdim, factor, dtype=self.dtype, name="update"
            )
            flows, masks = [], []
            flow = flow0
            for _ in range(self.iters):
                corr_feat = corr_lookup(
                    pyramid, grid + flow, self.radius, impl=self.lookup_impl
                )
                hidden, delta, mask = update(hidden, corr_feat, flow, context)
                flow = flow + delta
                flows.append(flow)
                masks.append(mask)
            iterates = jnp.stack(flows, axis=0)
            final_flow, final_mask = flows[-1], masks[-1]
        else:
            ScanUpdate = nn.scan(
                _ScanBody,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast,
                out_axes=0,
                length=self.iters,
            )
            # carry pytree structure is fixed across iterations: seed the
            # mask slot with zeros of the update block's output shape/dtype
            mask0 = jnp.zeros((b, h, w, factor * factor * 9), self.dtype)
            (hidden, flow, mask), iterates = ScanUpdate(
                self.hdim, factor, self.radius,
                lookup_impl=self.lookup_impl, dtype=self.dtype,
                name="update",
            )((hidden, flow0, mask0), pyramid, grid, context)
            final_flow, final_mask = flow, mask

        up = convex_upsample(final_flow, final_mask, factor)
        return {
            "flow": up.astype(jnp.float32),
            "flow_pyramid": {self.level: final_flow},
            "flow_iterates": iterates,
        }


class RAFTFlowNet(nn.Module):
    """Pyramid encoder + iterative all-pairs flow decoder (single-task)."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    level: int = 3
    fdim: int = 128
    hdim: int = 96
    cdim: int = 64
    corr_levels: int = 4
    radius: int = 4
    iters: int = 12
    unroll_iters: bool = False
    lookup_impl: str = "onehot"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, im1, im2):
        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        return RAFTFlowDecoder(
            level=self.level,
            fdim=self.fdim,
            hdim=self.hdim,
            cdim=self.cdim,
            corr_levels=self.corr_levels,
            radius=self.radius,
            iters=self.iters,
            unroll_iters=self.unroll_iters,
            lookup_impl=self.lookup_impl,
            dtype=self.dtype,
        )(enc(im1), enc(im2))


class _ScanBody(nn.Module):
    """nn.scan body: carry = (hidden, field, last_mask); emits each iterate.

    ``field`` is the 2-ch flow (mode='flow') or 1-ch disparity
    (mode='stereo'; lookup at grid_x - d per the framework's
    positive-disparity-samples-left convention, CLAUDE.md conventions).
    Param tree: to keep scan/unroll trees identical the inner UpdateBlock
    submodules are declared directly on this module (name='update' on the
    parent maps both variants to params['update'][...]).
    """

    hidden_dim: int
    upsample_factor: int
    radius: int
    mode: str = "flow"  # flow | stereo
    lookup_impl: str = "onehot"  # onehot | gather (identical math)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, pyramid, grid, context):
        hidden, field, _ = carry
        if self.mode == "flow":
            corr_feat = corr_lookup(
                pyramid, grid + field, self.radius, impl=self.lookup_impl
            )
        else:
            corr_feat = corr_lookup_1d(
                pyramid, grid - field[..., 0], self.radius,
                impl=self.lookup_impl,
            )
        motion = MotionEncoder(dtype=self.dtype, name="motion")(
            corr_feat.astype(self.dtype), field.astype(self.dtype)
        )
        inp = jnp.concatenate([context, motion], axis=-1)
        hidden = ConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(
            hidden, inp
        )
        head = leaky(
            nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="flow_head1")(hidden)
        )
        delta = nn.Conv(field.shape[-1], (3, 3), padding="SAME",
                        dtype=self.dtype, name="flow_head2")(head)
        field = field + delta.astype(jnp.float32)
        mh = leaky(
            nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="mask_head1")(hidden)
        )
        mask = nn.Conv(
            self.upsample_factor**2 * 9, (1, 1), dtype=self.dtype,
            name="mask_head2",
        )(mh)
        return (hidden, field, mask), field


class RAFTStereoDecoder(nn.Module):
    """RAFT-Stereo decoder: the 1-D epipolar instance of the iterative
    family (Lipson et al. 2021 lineage). Identical update machinery to
    RAFTFlowDecoder; the correlation volume is per-row all-pairs (one
    matmul per row batch), the lookup is a linear 1-D window at ``x - d``,
    and the prediction is 1-channel disparity (positive samples LEFT in
    the right image — the framework convention).
    """

    level: int = 3
    fdim: int = 128
    hdim: int = 96
    cdim: int = 64
    corr_levels: int = 4
    radius: int = 4
    iters: int = 12
    unroll_iters: bool = False
    lookup_impl: str = "onehot"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats1, feats2):
        f1 = feats1[self.level - 1]
        f2 = feats2[self.level - 1]

        proj = nn.Conv(self.fdim, (1, 1), dtype=self.dtype, name="corr_proj")
        corr = allpairs_correlation_1d(proj(f1), proj(f2))
        pyramid = correlation_pyramid_1d(corr, self.corr_levels)

        ctx = nn.Conv(
            self.hdim + self.cdim, (3, 3), padding="SAME", dtype=self.dtype,
            name="context_proj",
        )(f1)
        hidden = nn.tanh(ctx[..., : self.hdim])
        context = nn.relu(ctx[..., self.hdim:])

        b, h, w, _ = f1.shape
        grid_x = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
        disp0 = jnp.zeros((b, h, w, 1), jnp.float32)
        factor = 2**self.level

        if self.unroll_iters:
            update = UpdateBlock(
                self.hdim, factor, pred_channels=1, dtype=self.dtype,
                name="update",
            )
            disps, masks = [], []
            disp = disp0
            for _ in range(self.iters):
                corr_feat = corr_lookup_1d(
                    pyramid, grid_x - disp[..., 0], self.radius,
                    impl=self.lookup_impl,
                )
                hidden, delta, mask = update(hidden, corr_feat, disp, context)
                disp = disp + delta
                disps.append(disp)
                masks.append(mask)
            iterates = jnp.stack(disps, axis=0)
            final_disp, final_mask = disps[-1], masks[-1]
        else:
            ScanUpdate = nn.scan(
                _ScanBody,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast,
                out_axes=0,
                length=self.iters,
            )
            mask0 = jnp.zeros((b, h, w, factor * factor * 9), self.dtype)
            (hidden, disp, mask), iterates = ScanUpdate(
                self.hdim, factor, self.radius, mode="stereo",
                lookup_impl=self.lookup_impl, dtype=self.dtype,
                name="update",
            )((hidden, disp0, mask0), pyramid, grid_x, context)
            final_disp, final_mask = disp, mask

        up = convex_upsample(final_disp, final_mask, factor)
        # One disp contract repo-wide: (B, H, W, 1), matching the
        # CerberusNet family (VERDICT r4 item 6 — the rank-3 fork here was
        # being patched consumer-by-consumer: panel, tiled, TTA).
        return {
            "disp": up.astype(jnp.float32),
            "disp_pyramid": {self.level: final_disp},
            "disp_iterates": iterates,
        }


class RAFTStereoNet(nn.Module):
    """Pyramid encoder + RAFT-Stereo decoder (single-task)."""

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    level: int = 3
    fdim: int = 128
    hdim: int = 96
    cdim: int = 64
    corr_levels: int = 4
    radius: int = 4
    iters: int = 12
    unroll_iters: bool = False
    lookup_impl: str = "onehot"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right):
        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        return RAFTStereoDecoder(
            level=self.level,
            fdim=self.fdim,
            hdim=self.hdim,
            cdim=self.cdim,
            corr_levels=self.corr_levels,
            radius=self.radius,
            iters=self.iters,
            unroll_iters=self.unroll_iters,
            lookup_impl=self.lookup_impl,
            dtype=self.dtype,
        )(enc(left), enc(right))


class CerberusRAFT(nn.Module):
    """Joint three-head model on the iterative decoders: one shared pyramid
    encoder + RAFT flow (left->temporal) + RAFT-Stereo disparity
    (left->right) + the FPN/ASPP segmentation head. Same I/O contract as
    CerberusNet; the accuracy-ceiling joint flagship (the latency options
    are CerberusNet and CerberusDCV).
    """

    encoder_channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    num_classes: int = 19
    level: int = 3
    fdim: int = 128
    hdim: int = 96
    cdim: int = 64
    corr_levels: int = 4
    radius: int = 4
    iters: int = 12
    unroll_iters: bool = False
    lookup_impl: str = "onehot"
    fpn_channels: int = 96
    seg_head: str = "fpn"  # fpn | aspp
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right, temporal):
        from cerberusnet_tpu.models.segmentation import make_seg_head

        enc = PyramidEncoder(tuple(self.encoder_channels), dtype=self.dtype)
        # separate applications (models/common.py encode_pair rationale)
        f_left = enc(left)
        f_right = enc(right)
        f_temporal = enc(temporal)
        kw = dict(
            level=self.level,
            fdim=self.fdim,
            hdim=self.hdim,
            cdim=self.cdim,
            corr_levels=self.corr_levels,
            radius=self.radius,
            iters=self.iters,
            unroll_iters=self.unroll_iters,
            lookup_impl=self.lookup_impl,
            dtype=self.dtype,
        )
        flow_out = RAFTFlowDecoder(**kw)(f_left, f_temporal)
        disp_out = RAFTStereoDecoder(**kw)(f_left, f_right)
        seg_logits = make_seg_head(
            self.seg_head, self.num_classes, self.fpn_channels, self.dtype
        )(f_left, left.shape[1:3])
        return {
            "seg_logits": seg_logits,
            "flow": flow_out["flow"],
            "disp": disp_out["disp"],
            "flow_pyramid": flow_out["flow_pyramid"],
            "disp_pyramid": disp_out["disp_pyramid"],
            "flow_iterates": flow_out["flow_iterates"],
            "disp_iterates": disp_out["disp_iterates"],
        }
