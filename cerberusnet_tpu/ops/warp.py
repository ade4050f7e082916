"""Bilinear warping (resample2d) ops.

TPU-native replacement for the reference's CUDA resample2d package
(SURVEY.md §3 C2, §9.3; flownet2-pytorch lineage).

Semantics (SURVEY.md §9.3, zero-pad convention, guarded by golden tests):

  warp(f, w)(x) = sum_{q in N4(x + w(x))} bilinear_weight(q, x + w(x)) * f(q)

Out-of-bounds neighbours contribute zero (each of the four corners is masked
independently — the flownet2 ``resample2d`` convention). Gradients flow to both
``f`` (linear in f) and the flow ``w`` (piecewise-linear bilinear weights);
plain JAX autodiff through this formulation yields exactly those VJPs, so no
custom_vjp is needed.

Flow channel convention: ``flow[..., 0] = u`` (x / width displacement),
``flow[..., 1] = v`` (y / height displacement), in pixels at the input's own
resolution.

Implementation note (TPU): the four corner reads are one flattened
``take_along_axis`` row-gather each — channels are contiguous in the minor
dimension, which XLA lowers to an efficient per-row dynamic-gather on TPU. A
Pallas formulation was evaluated and rejected: Mosaic does not support
per-element dynamic gathers from VMEM (verified at build time), and the
displacement window of a warp is unbounded so no static-shift kernel exists.
This op is memory-bound either way; the XLA gather reads each of f/flow once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def warp2d(f, flow):
    """Backward-warp ``f`` by ``flow``: out(x) = f(x + flow(x)), bilinear.

    Args:
      f:    (B, H, W, C) features/image to sample from.
      flow: (B, H, W, 2) displacement field, channels (u, v) in pixels.

    Returns:
      (B, H, W, C) warped tensor; out-of-frame samples contribute zero.
    """
    b, h, w, c = f.shape
    if flow.shape != (b, h, w, 2):
        raise ValueError(f"flow shape {flow.shape} != {(b, h, w, 2)}")
    orig_dtype = f.dtype
    fl = flow.astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2) + fl[..., 0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1) + fl[..., 1]

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0  # in [0, 1); d(wx)/d(u) = 1
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Gather in f's ORIGIN dtype and widen after: f32(x)[i] == f32(x[i]),
    # so results are bitwise identical while the gathers move half the
    # bytes for bf16 inputs (measured 1.2x at the level-2 shape).
    flat = f.reshape(b, h * w, c)
    out = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0i + dx
            iy = y0i + dy
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            wgt = jnp.where(dx == 1, wx, 1.0 - wx) * jnp.where(dy == 1, wy, 1.0 - wy)
            wgt = jnp.where(valid, wgt, 0.0)
            idx = (jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)).reshape(
                b, h * w, 1
            )
            corner = (
                jnp.take_along_axis(flat, idx, axis=1)
                .reshape(b, h, w, c)
                .astype(jnp.float32)
            )
            out = out + wgt[..., None] * corner
    return out.astype(orig_dtype)


@jax.jit
def warp1d(f, disp):
    """Horizontal-only backward warp for stereo: out(x) = f(x - disp(x)).

    Positive disparity samples to the LEFT (standard rectified-stereo
    convention: a left-image pixel at x appears in the right image at x - d).
    Used by the disparity head to warp right-image features onto the left view
    (SURVEY.md §9.3 "for disparity warping, w = (-disp, 0)").

    Args:
      f:    (B, H, W, C) right-image features.
      disp: (B, H, W, 1) or (B, H, W) non-negative disparities in pixels.

    Returns:
      (B, H, W, C) warped tensor.
    """
    if disp.ndim == f.ndim:
        disp = disp[..., 0]
    flow = jnp.stack([-disp, jnp.zeros_like(disp)], axis=-1)
    return warp2d(f, flow)
