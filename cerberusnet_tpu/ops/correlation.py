"""Correlation cost-volume ops (2-D for optical flow, 1-D for stereo disparity).

TPU-native replacement for the reference's custom CUDA correlation package
(SURVEY.md §3 C1, §9.2/§9.2b; flownet2-pytorch lineage, PWC-Net §3).

Semantics (SURVEY.md §9.2, fixed here and guarded by golden tests):

  2-D:  corr(x, o) = (1/C) * sum_c f1_c(x) * f2_c(x + o),  o in {-d..d}^2
        output channel index k = (o_y + d) * (2d+1) + (o_x + d)
  1-D:  corr(x, k) = (1/C) * sum_c f1_c(y, x) * f2_c(y, x - k),  k in {0..D}
        (stereo epipolar: right-image features sampled to the LEFT)

Out-of-bounds f2 samples contribute zero (zero padding). All accumulation is
float32 regardless of input dtype; output dtype matches input dtype.

Layout is NHWC (TPU-native: channels in the minor/lane dimension).

Three implementations share these exact semantics:
  * ``impl='pure'``  — jnp shifted multiply-reduce, fully fused by XLA.
  * ``impl='pallas'``— v1 Pallas TPU kernels in NHWC layout (fwd + two bwd
    kernels via jax.custom_vjp) in cerberusnet_tpu.ops.pallas.correlation.
  * ``impl='pallas_wl'`` — v2 Pallas forward in W-in-lanes layout
    ((B,H,C,W) operands, full-tile per-channel stores), backward = autodiff
    of the pure oracle. Measured v5e level-2 bf16 forward: 0.041 ms vs
    0.401 ms pure (9.7x) for 2-D.

``impl=None`` ('auto') picks PURE — a decision made twice on real v5e
end-to-end measurements, worth recording:
  * v1 NHWC Pallas kernels lost to pure XLA ~2-3x standalone (460 vs
    1100 us level-2 forward): C=32 fills only a quarter of the 128 VPU
    lanes and each output channel was a strided single-lane store.
  * v2 ``pallas_wl`` FIXES that (W fills the lanes, full-tile stores):
    0.041 ms vs 0.401 ms standalone at the level-2 shape — 9.7x. But in
    the FULL jitted model it is a wash (interleaved A/B, 3 rounds: pure
    9.5-10.0 ms joint, wl 9.9-10.3 ms): XLA fuses the pure formulation's
    pad/slice/multiply/reduce chain into the surrounding leaky/concat/conv
    consumers, so its standalone cost never materializes — while the
    custom call forces layout transposes and fusion barriers at both
    edges. Standalone kernel wins do not compose past fusion boundaries;
    measure end-to-end before switching a dispatch.
Both kernel generations stay unit-tested and opt-in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_IMPLS = (None, "auto", "pure", "purev", "pallas", "pallas_wl")


def _resolve_impl(impl, op):
    """op in {'2d', '1d'} -> one of 'pure' | 'pallas' | 'pallas_wl'."""
    if impl not in _IMPLS:
        raise ValueError(f"unknown impl {impl!r}")
    if impl in (None, "auto"):
        return "pure"  # end-to-end winner; see module docstring
    return impl


# ---------------------------------------------------------------------------
# Pure-JAX oracle implementations (differentiable; autodiff gives exact VJPs).
# ---------------------------------------------------------------------------


def _stack_maps(maps, stack):
    """Assemble per-displacement maps into the (B,H,W,D) cost volume.

    stack="minor": plain channel-axis stack — XLA assembles it as ~D chained
    full-buffer dynamic-update-slices at levels 3..5 (each 1-channel slice is
    a sub-tile write; ~280 MB/frame HBM traffic at D=81, round-2 profile).
    stack="major": stack along axis 1 (whole-tile-aligned, one concatenate)
    then a single moveaxis transpose the consumer layout usually absorbs.
    Bit-identical outputs either way; which is faster is decided by
    interleaved A/B in the full model (tools/ab_forward.py)."""
    if stack == "minor":
        return jnp.stack(maps, axis=-1)
    return jnp.moveaxis(jnp.stack(maps, axis=1), 1, -1)


def _correlation2d_pure(f1, f2, max_disp, dilation=1, stack="major"):
    b, h, w, c = f1.shape
    d = max_disp * dilation
    f1f = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0)))
    maps = []
    for dy in range(0, 2 * d + 1, dilation):
        for dx in range(0, 2 * d + 1, dilation):
            shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
            # divide + cast per map (bit-identical to stack-then-divide-
            # then-cast, which keeps the two stack modes interchangeable)
            m = (jnp.sum(f1f * shifted, axis=-1) / jnp.float32(c)).astype(f1.dtype)
            maps.append(m)
    return _stack_maps(maps, stack)


def _correlation1d_pure(f1, f2, max_disp, dilation=1, stack="major"):
    b, h, w, c = f1.shape
    dmax = max_disp * dilation
    f1f = f1.astype(jnp.float32)
    # corr(x, k) = f1(x) . f2(x - k*dilation): pad f2 on the left by D.
    f2p = jnp.pad(f2.astype(jnp.float32), ((0, 0), (0, 0), (dmax, 0), (0, 0)))
    maps = []
    for k in range(0, dmax + 1, dilation):
        shifted = jax.lax.dynamic_slice(f2p, (0, 0, dmax - k, 0), (b, h, w, c))
        m = (jnp.sum(f1f * shifted, axis=-1) / jnp.float32(c)).astype(f1.dtype)
        maps.append(m)
    return _stack_maps(maps, stack)


def _correlation2d_purev(f1, f2, max_disp, dilation=1):
    """vmapped-displacement formulation: the whole displacement loop becomes
    ONE batched-start dynamic-slice (a gather) + ONE multiply-reduce + ONE
    transpose, instead of ~10 XLA ops per displacement.

    Motivation (round-2 profile, tools/profile_report.py on the headline
    forward): the per-displacement 'pure' loop compiles to ~800 device ops
    per step (405 sub-tile copies + 167 fusions + update-slices) for ~0.6 ms
    of busy time — and on this backend each device op carries a measured
    wall overhead the trace never shows (tools/overhead_diag.py), so op
    count is a first-class cost. Values match 'pure' up to f32
    reduction-order rounding (~1e-7 rel; the batched reduce may use a
    different summation tree)."""
    b, h, w, c = f1.shape
    d = max_disp * dilation
    f1f = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0)))
    offs = jnp.array(
        [
            (dy, dx)
            for dy in range(0, 2 * d + 1, dilation)
            for dx in range(0, 2 * d + 1, dilation)
        ],
        jnp.int32,
    )

    def one(o):
        shifted = jax.lax.dynamic_slice(f2p, (0, o[0], o[1], 0), (b, h, w, c))
        return (jnp.sum(f1f * shifted, axis=-1) / jnp.float32(c)).astype(f1.dtype)

    maps = jax.vmap(one)(offs)  # (D, B, H, W)
    return jnp.moveaxis(maps, 0, -1)


def _correlation1d_purev(f1, f2, max_disp, dilation=1):
    """1-D analogue of _correlation2d_purev (see its docstring)."""
    b, h, w, c = f1.shape
    dmax = max_disp * dilation
    f1f = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32), ((0, 0), (0, 0), (dmax, 0), (0, 0)))
    offs = jnp.array(
        [dmax - k for k in range(0, dmax + 1, dilation)], jnp.int32
    )

    def one(o):
        shifted = jax.lax.dynamic_slice(f2p, (0, 0, o, 0), (b, h, w, c))
        return (jnp.sum(f1f * shifted, axis=-1) / jnp.float32(c)).astype(f1.dtype)

    maps = jax.vmap(one)(offs)  # (D, B, H, W)
    return jnp.moveaxis(maps, 0, -1)


# ---------------------------------------------------------------------------
# Public dispatching entry points.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("max_disp", "impl", "dilation", "stack")
)
def correlation2d(f1, f2, max_disp: int = 4, impl: str | None = None,
                  dilation: int = 1, stack: str = "major"):
    """2-D correlation cost volume. (B,H,W,C)x2 -> (B,H,W,(2*max_disp+1)**2).

    ``dilation`` samples displacements at offsets dilation*o (o in
    {-d..d}^2) — the dilated cost volumes of DCVNet (PAPERS.md) that trade
    warping for a one-shot wide receptive field. ``stack`` picks the
    cost-volume assembly order for the pure impl (see _stack_maps) —
    bit-identical results. See module docstring for exact semantics
    (SURVEY.md §9.2).
    """
    if f1.shape != f2.shape:
        raise ValueError(f"f1/f2 shape mismatch: {f1.shape} vs {f2.shape}")
    chosen = _resolve_impl(impl, "2d")
    if chosen == "pallas_wl":
        from cerberusnet_tpu.ops.pallas.correlation import correlation2d_wl

        return correlation2d_wl(f1, f2, max_disp, None, dilation)
    if chosen == "pallas":
        if dilation != 1:
            raise NotImplementedError("pallas correlation supports dilation=1")
        from cerberusnet_tpu.ops.pallas.correlation import correlation2d_pallas

        return correlation2d_pallas(f1, f2, max_disp)
    if chosen == "purev":
        return _correlation2d_purev(f1, f2, max_disp, dilation)
    return _correlation2d_pure(f1, f2, max_disp, dilation, stack)


@functools.partial(
    jax.jit, static_argnames=("max_disp", "impl", "dilation", "stack")
)
def correlation1d(f1, f2, max_disp: int = 24, impl: str | None = None,
                  dilation: int = 1, stack: str = "major"):
    """1-D (epipolar) correlation. (B,H,W,C)x2 -> (B,H,W,max_disp+1).

    ``f1`` is the left-image features, ``f2`` the right-image features;
    channel k correlates f1(x) with f2(x - k*dilation) (dilated variant for
    the DCV stereo family). See SURVEY.md §9.2b.
    """
    if f1.shape != f2.shape:
        raise ValueError(f"f1/f2 shape mismatch: {f1.shape} vs {f2.shape}")
    chosen = _resolve_impl(impl, "1d")
    if chosen == "pallas_wl":
        from cerberusnet_tpu.ops.pallas.correlation import correlation1d_wl

        return correlation1d_wl(f1, f2, max_disp, None, dilation)
    if chosen == "pallas":
        if dilation != 1:
            raise NotImplementedError("pallas correlation supports dilation=1")
        from cerberusnet_tpu.ops.pallas.correlation import correlation1d_pallas

        return correlation1d_pallas(f1, f2, max_disp)
    if chosen == "purev":
        return _correlation1d_purev(f1, f2, max_disp, dilation)
    return _correlation1d_pure(f1, f2, max_disp, dilation, stack)
