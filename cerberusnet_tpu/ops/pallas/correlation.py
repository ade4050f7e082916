"""Pallas TPU kernels for correlation cost volumes (2-D flow / 1-D stereo).

TPU-native rebuild of the reference's CUDA correlation package (SURVEY.md §3
C1, §4.5, §9.2): forward plus the two asymmetric backward kernels, wired up
with ``jax.custom_vjp`` exactly like the reference's autograd.Function wraps
its CUDA kernels — but compiled into the same XLA program as the surrounding
convs, so there is no per-pyramid-level launch overhead (SURVEY.md §4.1).

Kernel strategy
  * Displacements are STATIC (a (2d+1)^2 or D+1 window), so every shifted
    read is a static slice of a VMEM-resident row tile — no gathers.
  * Grid is (B, H/TH) row tiles. The 2-D window needs a +-d ROW halo, which
    uniform BlockSpec tiling cannot express directly; instead the row-padded
    operand is passed TWICE with index maps (i) and (i+1) and the two tiles
    are concatenated in-kernel into a (2*TH)-row slab (TH >= 2d), from which
    every dy-shift is a static slice. XLA dedupes the underlying buffer; the
    only cost is a bounded (TH+2d)/TH read amplification.
  * Horizontal shifts are handled by host-side zero padding of the minor-2
    (W) dim; zero padding doubles as out-of-bounds-contributes-zero
    semantics (SURVEY.md §9.2). Host rows are likewise padded to TH multiples
    so kernels are entirely mask-free.
  * Products accumulate in float32 irrespective of input dtype (bf16-safe:
    SURVEY.md §7 "accumulate in fp32 inside the kernel").

Gradient math (SURVEY.md §9.2):
  dL/df1_c(x) = (1/C) sum_o g(x, o)     * f2_c(x + o)
  dL/df2_c(y) = (1/C) sum_o g(y - o, o) * f1_c(y - o)
The f2 gradient's transposed-displacement reads are realised by padding g and
f1 by the window radius and slicing at (2d - dy, 2d - dx) — index arithmetic
stays non-negative, so no masking is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default():
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _pick_tile(h, d, cap):
    """Row-tile size: <= cap, >= 2d (so tile i,i+1 cover the halo window)."""
    th = min(cap, _cdiv(h, 8) * 8)
    return max(th, 2 * d, 8)


def _tiled_spec(th, *rest):
    return pl.BlockSpec((1, th) + tuple(rest), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _halo_specs(th, *rest):
    """Two specs over the same row-padded array: tiles i and i+1."""
    return [
        pl.BlockSpec((1, th) + tuple(rest), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th) + tuple(rest), lambda b, i: (b, i + 1, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _pad_haloed(x, d_top, d_side, h, th, nrow_tiles):
    """Pad rows to (nrow_tiles + 1) * th with d_top zeros on top, and the
    columns by d_side on each requested side (left, right)."""
    total_rows = (nrow_tiles + 1) * th
    bottom = total_rows - d_top - h
    left, right = d_side
    return jnp.pad(x, ((0, 0), (d_top, bottom), (left, right), (0, 0)))


# ===========================================================================
# 2-D correlation
# ===========================================================================


def _corr2d_fwd_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, *, w, d, c):
    f1 = f1_ref[0].astype(jnp.float32)  # (TH, W, C)
    slab = jnp.concatenate([f2a_ref[0], f2b_ref[0]], axis=0).astype(jnp.float32)
    th = f1.shape[0]
    inv_c = jnp.float32(1.0 / c)
    k = 0
    for dy in range(2 * d + 1):
        rows = slab[dy : dy + th]
        for dx in range(2 * d + 1):
            sh = rows[:, dx : dx + w, :]
            out_ref[0, :, :, k] = (jnp.sum(f1 * sh, axis=-1) * inv_c).astype(
                out_ref.dtype
            )
            k += 1


def _corr2d_bwd_f1_kernel(g_ref, f2a_ref, f2b_ref, df1_ref, acc_ref, *, w, d, c):
    # Accumulate through the fp32 VMEM scratch ref: a pure jnp add-chain of
    # 81 terms keeps every temporary live on the Mosaic stack (observed 70 MB
    # scoped-vmem OOM on v5e); storing per term bounds liveness to one term.
    g = g_ref[0].astype(jnp.float32)  # (TH, W, K)
    slab = jnp.concatenate([f2a_ref[0], f2b_ref[0]], axis=0).astype(jnp.float32)
    th = g.shape[0]
    k = 0
    for dy in range(2 * d + 1):
        rows = slab[dy : dy + th]
        for dx in range(2 * d + 1):
            term = g[:, :, k : k + 1] * rows[:, dx : dx + w, :]
            if k == 0:
                acc_ref[:] = term
            else:
                acc_ref[:] = acc_ref[:] + term
            k += 1
    df1_ref[0] = (acc_ref[:] * jnp.float32(1.0 / c)).astype(df1_ref.dtype)


def _corr2d_bwd_f2_kernel(ga_ref, gb_ref, f1a_ref, f1b_ref, df2_ref, acc_ref, *, w, d, c):
    gslab = jnp.concatenate([ga_ref[0], gb_ref[0]], axis=0).astype(jnp.float32)
    fslab = jnp.concatenate([f1a_ref[0], f1b_ref[0]], axis=0).astype(jnp.float32)
    th = df2_ref.shape[1]
    k = 0
    for dy in range(2 * d + 1):
        g_rows = gslab[2 * d - dy : 2 * d - dy + th]
        f_rows = fslab[2 * d - dy : 2 * d - dy + th]
        for dx in range(2 * d + 1):
            gsl = g_rows[:, 2 * d - dx : 2 * d - dx + w, k]
            fsl = f_rows[:, 2 * d - dx : 2 * d - dx + w, :]
            term = gsl[:, :, None] * fsl
            if k == 0:
                acc_ref[:] = term
            else:
                acc_ref[:] = acc_ref[:] + term
            k += 1
    df2_ref[0] = (acc_ref[:] * jnp.float32(1.0 / c)).astype(df2_ref.dtype)


def _corr2d_forward(f1, f2, max_disp, interpret):
    b, h, w, c = f1.shape
    d = max_disp
    nk = (2 * d + 1) ** 2
    # Tile cap 8: the 81-channel output block + fp32 temporaries at tile 16
    # exceed v5e's 16 MB VMEM in bf16 (measured 17.1 MB scoped).
    th = _pick_tile(h, d, 8)
    n = _cdiv(h, th)
    hp = n * th
    f1p = jnp.pad(f1, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    f2p = _pad_haloed(f2, d, (d, d), h, th, n)
    out = pl.pallas_call(
        functools.partial(_corr2d_fwd_kernel, w=w, d=d, c=c),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, nk), f1.dtype),
        grid=(b, n),
        in_specs=[_tiled_spec(th, w, c)] + _halo_specs(th, w + 2 * d, c),
        out_specs=_tiled_spec(th, w, nk),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * nk,
            bytes_accessed=(2 * b * h * w * c + b * h * w * nk) * f1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1p, f2p, f2p)
    return out[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation2d_pallas(f1, f2, max_disp: int = 4, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret_default()
    return _corr2d_forward(f1, f2, max_disp, interpret)


def _corr2d_vjp_fwd(f1, f2, max_disp, interpret):
    if interpret is None:
        interpret = _interpret_default()
    return _corr2d_forward(f1, f2, max_disp, interpret), (f1, f2)


def _corr2d_vjp_bwd(max_disp, interpret, res, g):
    if interpret is None:
        interpret = _interpret_default()
    f1, f2 = res
    b, h, w, c = f1.shape
    d = max_disp
    nk = (2 * d + 1) ** 2
    # Backward tiles carry (2d+1)^2-channel gradient blocks; keep them small
    # to fit the ~16 MB physical VMEM (verified against real v5e compiles).
    th = _pick_tile(h, d, 8)
    n = _cdiv(h, th)
    hp = n * th

    gp = jnp.pad(g, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    f2p = _pad_haloed(f2, d, (d, d), h, th, n)
    df1 = pl.pallas_call(
        functools.partial(_corr2d_bwd_f1_kernel, w=w, d=d, c=c),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), f1.dtype),
        grid=(b, n),
        in_specs=[_tiled_spec(th, w, nk)] + _halo_specs(th, w + 2 * d, c),
        out_specs=_tiled_spec(th, w, c),
        scratch_shapes=[pltpu.VMEM((th, w, c), jnp.float32)],
        interpret=interpret,
    )(gp, f2p, f2p)[:, :h]

    # Transposed displacements sample g/f1 at (y - o), o in [-d, d]: a d
    # top/left pad makes every slice offset (2d - dy, 2d - dx) non-negative.
    # The 81-channel g tiles are big, so use a smaller row tile here.
    th2 = _pick_tile(h, d, 8)
    n2 = _cdiv(h, th2)
    gpp = _pad_haloed(g, d, (d, d), h, th2, n2)
    f1pp = _pad_haloed(f1, d, (d, d), h, th2, n2)
    df2 = pl.pallas_call(
        functools.partial(_corr2d_bwd_f2_kernel, w=w, d=d, c=c),
        out_shape=jax.ShapeDtypeStruct((b, n2 * th2, w, c), f2.dtype),
        grid=(b, n2),
        in_specs=_halo_specs(th2, w + 2 * d, nk) + _halo_specs(th2, w + 2 * d, c),
        out_specs=_tiled_spec(th2, w, c),
        scratch_shapes=[pltpu.VMEM((th2, w, c), jnp.float32)],
        interpret=interpret,
    )(gpp, gpp, f1pp, f1pp)[:, :h]
    return df1, df2


correlation2d_pallas.defvjp(_corr2d_vjp_fwd, _corr2d_vjp_bwd)


# ===========================================================================
# 1-D (epipolar) correlation — no vertical halo, every operand row-tiled.
# ===========================================================================


def _corr1d_fwd_kernel(f1_ref, f2_ref, out_ref, *, w, dmax, c):
    f1 = f1_ref[0].astype(jnp.float32)  # (TH, W, C)
    rows = f2_ref[0].astype(jnp.float32)  # (TH, W+D, C), left-padded by D
    inv_c = jnp.float32(1.0 / c)
    for k in range(dmax + 1):
        sh = rows[:, dmax - k : dmax - k + w, :]
        out_ref[0, :, :, k] = (jnp.sum(f1 * sh, axis=-1) * inv_c).astype(out_ref.dtype)


def _corr1d_bwd_f1_kernel(g_ref, f2_ref, df1_ref, acc_ref, *, w, dmax, c):
    g = g_ref[0].astype(jnp.float32)  # (TH, W, K)
    rows = f2_ref[0].astype(jnp.float32)  # (TH, W+D, C)
    for k in range(dmax + 1):
        term = g[:, :, k : k + 1] * rows[:, dmax - k : dmax - k + w, :]
        if k == 0:
            acc_ref[:] = term
        else:
            acc_ref[:] = acc_ref[:] + term
    df1_ref[0] = (acc_ref[:] * jnp.float32(1.0 / c)).astype(df1_ref.dtype)


def _corr1d_bwd_f2_kernel(gp_ref, f1p_ref, df2_ref, acc_ref, *, w, dmax, c):
    # dL/df2(y) = (1/C) sum_k g(x + k, k) * f1(x + k): g/f1 right-padded by D.
    g = gp_ref[0].astype(jnp.float32)  # (TH, W+D, K)
    f1 = f1p_ref[0].astype(jnp.float32)  # (TH, W+D, C)
    for k in range(dmax + 1):
        term = g[:, k : k + w, k][:, :, None] * f1[:, k : k + w, :]
        if k == 0:
            acc_ref[:] = term
        else:
            acc_ref[:] = acc_ref[:] + term
    df2_ref[0] = (acc_ref[:] * jnp.float32(1.0 / c)).astype(df2_ref.dtype)


def _pad_rows_cols(x, hp, left, right):
    return jnp.pad(x, ((0, 0), (0, hp - x.shape[1]), (left, right), (0, 0)))


def _corr1d_forward(f1, f2, max_disp, interpret):
    b, h, w, c = f1.shape
    dmax = max_disp
    nk = dmax + 1
    th = _pick_tile(h, 0, 8)
    n = _cdiv(h, th)
    hp = n * th
    f1p = _pad_rows_cols(f1, hp, 0, 0)
    f2p = _pad_rows_cols(f2, hp, dmax, 0)
    out = pl.pallas_call(
        functools.partial(_corr1d_fwd_kernel, w=w, dmax=dmax, c=c),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, nk), f1.dtype),
        grid=(b, n),
        in_specs=[_tiled_spec(th, w, c), _tiled_spec(th, w + dmax, c)],
        out_specs=_tiled_spec(th, w, nk),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * nk,
            bytes_accessed=(2 * b * h * w * c + b * h * w * nk) * f1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1p, f2p)
    return out[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation1d_pallas(f1, f2, max_disp: int = 24, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret_default()
    return _corr1d_forward(f1, f2, max_disp, interpret)


def _corr1d_vjp_fwd(f1, f2, max_disp, interpret):
    if interpret is None:
        interpret = _interpret_default()
    return _corr1d_forward(f1, f2, max_disp, interpret), (f1, f2)


def _corr1d_vjp_bwd(max_disp, interpret, res, g):
    if interpret is None:
        interpret = _interpret_default()
    f1, f2 = res
    b, h, w, c = f1.shape
    dmax = max_disp
    nk = dmax + 1
    th = _pick_tile(h, 0, 8)
    n = _cdiv(h, th)
    hp = n * th

    gp = _pad_rows_cols(g, hp, 0, 0)
    f2p = _pad_rows_cols(f2, hp, dmax, 0)
    df1 = pl.pallas_call(
        functools.partial(_corr1d_bwd_f1_kernel, w=w, dmax=dmax, c=c),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), f1.dtype),
        grid=(b, n),
        in_specs=[_tiled_spec(th, w, nk), _tiled_spec(th, w + dmax, c)],
        out_specs=_tiled_spec(th, w, c),
        scratch_shapes=[pltpu.VMEM((th, w, c), jnp.float32)],
        interpret=interpret,
    )(gp, f2p)[:, :h]

    gpr = _pad_rows_cols(g, hp, 0, dmax)
    f1pr = _pad_rows_cols(f1, hp, 0, dmax)
    df2 = pl.pallas_call(
        functools.partial(_corr1d_bwd_f2_kernel, w=w, dmax=dmax, c=c),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), f2.dtype),
        grid=(b, n),
        in_specs=[_tiled_spec(th, w + dmax, nk), _tiled_spec(th, w + dmax, c)],
        out_specs=_tiled_spec(th, w, c),
        scratch_shapes=[pltpu.VMEM((th, w, c), jnp.float32)],
        interpret=interpret,
    )(gpr, f1pr)[:, :h]
    return df1, df2


correlation1d_pallas.defvjp(_corr1d_vjp_fwd, _corr1d_vjp_bwd)


# ===========================================================================
# v2 forward kernels: W-in-lanes layout ("wl").
#
# The v1 kernels keep the NHWC layout, so the VPU lane dimension holds the
# feature axis C (32 at the hot level-2 shape -> 25% of the 128 lanes) and
# every output channel is written through a strided single-lane store. Here
# operands are transposed host-side to (B, H, C, W): W fills the lanes
# (256 = 2 full lane tiles at level 2), the displacement shifts become cheap
# static LANE slices, the C-reduction is a native sublane reduce, and each
# output channel k is one full (TH, W) tile store into a (B, NK, H, W)
# buffer (transposed back host-side). Measured v5e level-2 bf16 forward:
# ~3x over the pure-XLA formulation that previously won (see module
# docstring of ops/correlation.py for the dispatch history).
#
# Backward reuses the autodiff of the pure-XLA oracle via jax.custom_vjp —
# exactly the same gradient math/semantics as impl='pure'.
# ===========================================================================


def _corr2d_wl_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, *, w, d, c, dilation):
    f1 = f1_ref[0].astype(jnp.float32)  # (TH, C, W)
    slab = jnp.concatenate([f2a_ref[0], f2b_ref[0]], axis=0).astype(jnp.float32)
    th = f1.shape[0]
    inv_c = jnp.float32(1.0 / c)
    k = 0
    for dy in range(0, 2 * d + 1, dilation):
        rows = slab[dy : dy + th]  # (TH, C, W + 2d)
        for dx in range(0, 2 * d + 1, dilation):
            sh = rows[:, :, dx : dx + w]  # static lane slice
            out_ref[0, k] = (jnp.sum(f1 * sh, axis=1) * inv_c).astype(
                out_ref.dtype
            )
            k += 1


def _corr1d_wl_kernel(f1_ref, f2_ref, out_ref, *, w, dmax, c):
    f1 = f1_ref[0].astype(jnp.float32)  # (TH, C, W)
    rows = f2_ref[0].astype(jnp.float32)  # (TH, C, W + D), left-padded by D
    inv_c = jnp.float32(1.0 / c)
    for k in range(dmax + 1):
        sh = rows[:, :, dmax - k : dmax - k + w]
        out_ref[0, k] = (jnp.sum(f1 * sh, axis=1) * inv_c).astype(out_ref.dtype)


def _wl_tiled_spec(th, *rest):
    return pl.BlockSpec((1, th) + tuple(rest), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _wl_out_spec(nk, th, w):
    # out (B, NK, Hp, W): grid step i walks H; k-planes written whole.
    return pl.BlockSpec((1, nk, th, w), lambda b, i: (b, 0, i, 0),
                        memory_space=pltpu.VMEM)


def _corr2d_wl_forward(f1, f2, max_disp, interpret, dilation=1):
    b, h, w, c = f1.shape
    d = max_disp * dilation  # window radius in pixels (dilated sampling)
    nk = (2 * max_disp + 1) ** 2
    th = _pick_tile(h, d, 16)
    n = _cdiv(h, th)
    hp = n * th
    # (B, H, C, W) with W in lanes; f2 gets the row halo + lane padding.
    f1t = jnp.transpose(f1, (0, 1, 3, 2))
    f2t = jnp.transpose(f2, (0, 1, 3, 2))
    f1p = jnp.pad(f1t, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    total_rows = (n + 1) * th
    f2p = jnp.pad(
        f2t, ((0, 0), (d, total_rows - d - h), (0, 0), (d, d))
    )
    out = pl.pallas_call(
        functools.partial(_corr2d_wl_kernel, w=w, d=d, c=c, dilation=dilation),
        out_shape=jax.ShapeDtypeStruct((b, nk, hp, w), f1.dtype),
        grid=(b, n),
        in_specs=[_wl_tiled_spec(th, c, w)]
        + [
            pl.BlockSpec((1, th, c, w + 2 * d), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, c, w + 2 * d), lambda b_, i: (b_, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_wl_out_spec(nk, th, w),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * nk,
            bytes_accessed=(2 * b * h * w * c + b * h * w * nk) * f1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1p, f2p, f2p)
    return jnp.transpose(out[:, :, :h, :], (0, 2, 3, 1))


def _corr1d_wl_forward(f1, f2, max_disp, interpret):
    b, h, w, c = f1.shape
    dmax = max_disp
    nk = dmax + 1
    th = _pick_tile(h, 0, 16)
    n = _cdiv(h, th)
    hp = n * th
    f1t = jnp.transpose(f1, (0, 1, 3, 2))
    f2t = jnp.transpose(f2, (0, 1, 3, 2))
    f1p = jnp.pad(f1t, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    f2p = jnp.pad(f2t, ((0, 0), (0, hp - h), (0, 0), (dmax, 0)))
    out = pl.pallas_call(
        functools.partial(_corr1d_wl_kernel, w=w, dmax=dmax, c=c),
        out_shape=jax.ShapeDtypeStruct((b, nk, hp, w), f1.dtype),
        grid=(b, n),
        in_specs=[_wl_tiled_spec(th, c, w), _wl_tiled_spec(th, c, w + dmax)],
        out_specs=_wl_out_spec(nk, th, w),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * nk,
            bytes_accessed=(2 * b * h * w * c + b * h * w * nk) * f1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1p, f2p)
    return jnp.transpose(out[:, :, :h, :], (0, 2, 3, 1))


def _make_wl(fwd, pure, dilated):
    """custom_vjp: wl Pallas forward + the pure-XLA oracle's autodiff
    backward (identical gradient semantics to impl='pure')."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
    def op(f1, f2, max_disp: int, interpret: bool | None = None,
           dilation: int = 1):
        if interpret is None:
            interpret = _interpret_default()
        if dilated:
            return fwd(f1, f2, max_disp, interpret, dilation)
        if dilation != 1:
            raise NotImplementedError("1-D wl kernel supports dilation=1 only")
        return fwd(f1, f2, max_disp, interpret)

    def vjp_fwd(f1, f2, max_disp, interpret, dilation):
        return op(f1, f2, max_disp, interpret, dilation), (f1, f2)

    def vjp_bwd(max_disp, interpret, dilation, res, g):
        f1, f2 = res
        _, pullback = jax.vjp(
            lambda a, b: pure(a, b, max_disp, dilation), f1, f2
        )
        return pullback(g)

    op.defvjp(vjp_fwd, vjp_bwd)
    return op


def _pure2d(f1, f2, max_disp, dilation=1):
    from cerberusnet_tpu.ops.correlation import _correlation2d_pure

    return _correlation2d_pure(f1, f2, max_disp, dilation)


def _pure1d(f1, f2, max_disp, dilation=1):
    from cerberusnet_tpu.ops.correlation import _correlation1d_pure

    return _correlation1d_pure(f1, f2, max_disp, dilation)


def _corr1d_wl_fwd_nodil(f1, f2, max_disp, interpret):
    return _corr1d_wl_forward(f1, f2, max_disp, interpret)


correlation2d_wl = _make_wl(_corr2d_wl_forward, _pure2d, dilated=True)
correlation1d_wl = _make_wl(_corr1d_wl_fwd_nodil, _pure1d, dilated=False)
