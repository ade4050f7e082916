"""Fused pyramid-encoder level: one Pallas TPU kernel per level (round 4).

STATUS (round 5): RETIRED OPT-IN. The forward race tied within variance
(chain r4g: lv3 -4.2% vs 3.2 ms spread), the reverse-sweep kernel cannot
compile inside a train unroll on this tunnel (remote-helper OOM) and
exceeds scoped VMEM at level 1, and the >=120 fps mission the kernels
served is now met by CerberusRAFT level-4 at the canonical resolution
(144.6 fps, chain r5a). The deep-fold variant was evaluated and declined
(BASELINE.md round-5 "Fused Pallas encoder levels: RETIRED"). The kernels
remain equality-pinned (tests/test_pallas_encoder.py), hardware-verified
(tools/penc_smoke.py rc=0), and usable via `pallas_levels`/`pallas_grad`;
the Mosaic backend limitations documented below are reference material
for future kernels.

Motivation (VERDICT r3 item 2 / missing #1): the honest forward profile
charges 1.78 ms/step of layout copies to the small-channel encoder levels
(`runs/profiles/forward_512x1024_b1_r3.txt`, 'copy' by source -> leaky), and
the train profile 10.4 ms/step to the same region's backward. Every XLA-level
reformulation (s2d stem, channel pad, whole-level s2d) LOST its honest race —
XLA keeps bouncing C=3/16/32 activations between spatial-in-lanes and
channel-minor layouts around each conv. This kernel removes those copies by
construction: one Pallas program computes a whole pyramid level (stride-2
entry conv + two stride-1 convs, LeakyReLU(0.1) after each), holding every
intermediate in VMEM, so XLA never sees — and never relayouts — the
small-channel intermediates.

Layout contract (the part that makes the boundary free):
  * input   x  [B, H, W, C]  crosses as the W-FOLDED view  [B, H, W/4, 4C]
  * output  y  [B, H/2, W/2, F]  is written as  [B, H/2, W/4, 2F]
  A W-fold is a row-major minor-dims collapse — a pure bitcast, no
  transpose, no copy. Inside the kernel every conv tap is then a +-1
  SUBLANE (group) shift; there are NO strided-lane accesses (which Mosaic
  lowers poorly — the r2 purev verdict) and no gathers.

Tap algebra (XLA conventions; pinned by tests/test_pallas_encoder.py):
  * stride-2 SAME on even extents pads (0, 1) per dim: output p reads input
    rows/cols 2p..2p+2.  In the 4-fold view, output col w2 = 2g+px
    (px in {0,1}) reads input cols 4g + (2px+tx); offsets 0..3 land in
    group g, offset 4 in group g+1 — so the operand is the lane-concat of
    group slices [g] and [g+1] and the kernel is rearranged to
    K1f[ty, 8C, 2F] with zeros on unused taps.
  * stride-1 SAME pads (1, 1): output col w = 2g+px reads cols w+dx-1,
    which span groups g-1, g, g+1 -> operand is the 3-slice lane concat
    [6F], kernel K2f[dy, 6F, 2F].
  Row handling is identical with local row bases. Stride-2 row selection
  slices an EVEN-length row window and reshapes (rows,...) ->
  (rows/2, 2, ...) phase 0 — Mosaic's vector.extract_strided_slice is
  stride-1 only, and value scatters (v.at[].set) don't lower at all, so
  out-of-image rows are zeroed through ref slice stores.

Halos: the input strip for T output rows spans 2T+10 input rows, which
plain overlapping BlockSpecs cannot express and an in-kernel DMA cannot
fetch (Mosaic rejects slicing an HBM memref to the non-tile-aligned 4C
lane extent). So the overlapping strips are PRE-BUILT in XLA — one cheap
pad + static slices + stack per call, a single extra HBM pass over a small
input — with the convs' SAME padding (zero halo rows, zero right group
column) baked in, and standard BlockSpec pipelining streams strip i to
program i. Out-of-image rows of the y1/y2 scratch strips are explicitly
zeroed (computing them would bake in leaky(bias) != 0).

Backward: `encoder_level` carries a custom VJP whose backward recomputes the
level with plain XLA convs and differentiates THAT (jax.vjp) — gradients are
bit-identical to the unfused path, at the cost of re-running three cheap
small-channel convs in the backward. The forward bench/serving path never
pays this.

Reference lineage: the reference encoder is plain framework convs (SURVEY.md
§3 C4 [RECALL] — reference tree empty, §0); this fusion is a TPU-specific
performance reformulation with identical math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default():
    return jax.default_backend() != "tpu"


def leaky(x):
    return jnp.maximum(x, 0.1 * x)


# ---------------------------------------------------------------------------
# Kernel rearrangements (run in XLA, on [3,3,Cin,F] weights — negligible)
# ---------------------------------------------------------------------------


def _entry_kernel_fold(k):
    """[3,3,C,F] -> [3, 8C, 2F] for the stride-2 entry conv in 4-fold space.

    j = s*4C + o*C + c  (s: group shift 0/1, o: col offset in group, c: ch)
    column = px*F + f   (px: output phase, f: out channel)
    value  = k[ty, tx, c, f] where 2px+tx = 4s+o (tx in 0..2), else 0."""
    _, _, c, f = k.shape
    cols = []
    for px in (0, 1):
        rows = []
        for s in (0, 1):
            for o in range(4):
                tx = 4 * s + o - 2 * px
                rows.append(
                    k[:, tx] if 0 <= tx <= 2
                    else jnp.zeros((3, c, f), k.dtype)
                )  # each [3, C, F]
        cols.append(jnp.concatenate(rows, axis=1))  # [3, 8C, F]
    return jnp.concatenate(cols, axis=2)  # [3, 8C, 2F]


def _s1_kernel_fold(k):
    """[3,3,F,F'] -> [3, 6F, 2F'] for a stride-1 SAME conv in 2-fold space.

    j = s*2F + off*F + f (s: group g-1+s, off: col in group); output col
    2g+px reads col 2(g-1+s)+off when 2s+off = px+dx+1, dx in 0..2."""
    _, _, fi, fo = k.shape
    cols = []
    for px in (0, 1):
        rows = []
        for s in (0, 1, 2):
            for off in (0, 1):
                dx = 2 * s + off - px - 1
                rows.append(
                    k[:, dx] if 0 <= dx <= 2
                    else jnp.zeros((3, fi, fo), k.dtype)
                )
        cols.append(jnp.concatenate(rows, axis=1))  # [3, 6F, F']
    return jnp.concatenate(cols, axis=2)  # [3, 6F, 2F']


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _dot(a2, k2):
    # NOTE on f32 inputs: the MXU rounds f32 matmul operands to bf16 at
    # default precision, so the f32 kernel path differs from XLA's conv by
    # ~1e-3 relative (r4g smoke measured 6.6e-4 at the level-2 shape).
    # Mosaic rejects Precision.HIGH and the HIGHEST 6-pass decomposition
    # blows the scoped-VMEM budget, so this is documented rather than
    # fixed: the production path is bf16 end-to-end, where default
    # precision is exact-by-construction.
    return jax.lax.dot_general(
        a2, k2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# Mosaic cannot concatenate vector slices whose sublane offsets differ
# ("result/input offset mismatch on non-concat dimension" — chain r4e
# ab_penc), so the folded-operand assembly concat([v[:, 0:Wg], v[:, 1:Wg+1],
# ...], -1) @ K is computed as the algebraically identical per-shift sum
# sum_s v[:, s:s+Wg] @ K[s*L:(s+1)*L]. Result concats of freshly computed
# dots keep matching zero offsets and remain fine.


def _shift_dots(v, r0, nrows, wg, kf):
    """sum_s dot(v[r0:r0+nrows, s:s+wg].flat, kf[s*L:(s+1)*L]); the shift
    count is kf.shape[0] // v.shape[-1]."""
    L = v.shape[-1]
    acc = None
    for s in range(kf.shape[0] // L):
        a = v[r0 : r0 + nrows, s : s + wg, :].reshape(nrows * wg, L)
        y = _dot(a, kf[s * L : (s + 1) * L])
        acc = y if acc is None else acc + y
    return acc


def _entry_shift_dots(xs, ty, t_out, wg, kf):
    """Entry-conv operand: stride-2 rows (even-window phase trick) x two
    group shifts; kf = k1f[ty] with rows [0:4C | 4C:8C] per shift."""
    c4 = xs.shape[-1]
    acc = None
    for s in (0, 1):
        sub = jax.lax.slice(xs, (ty, s, 0), (ty + 2 * t_out, s + wg, c4))
        ph = sub.reshape(t_out, 2, wg, c4)[:, 0].reshape(t_out * wg, c4)
        y = _dot(ph, kf[s * c4 : (s + 1) * c4])
        acc = y if acc is None else acc + y
    return acc


def _dot_t(a2, g2):
    return jax.lax.dot_general(
        a2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _patch_dots_t(v, r0, nrows, wg, n_shift, gflat):
    """Weight-grad patches: blocks_s = v[r0:r0+nrows, s:s+wg].flat^T @ g,
    stacked along the kernel-row axis (fresh results — concat is safe)."""
    L = v.shape[-1]
    blocks = []
    for s in range(n_shift):
        a = v[r0 : r0 + nrows, s : s + wg, :].reshape(
            nrows * wg, L).astype(jnp.float32)
        blocks.append(_dot_t(a, gflat))
    return jnp.concatenate(blocks, axis=0)


def _entry_patch_dots_t(xs, r0ty, t_out, wg, gflat):
    """Entry-conv weight-grad patches (phase trick x two group shifts)."""
    c4 = xs.shape[-1]
    blocks = []
    for s in (0, 1):
        sub = jax.lax.slice(xs, (r0ty, s, 0), (r0ty + 2 * t_out, s + wg, c4))
        ph = sub.reshape(t_out, 2, wg, c4)[:, 0].reshape(
            t_out * wg, c4).astype(jnp.float32)
        blocks.append(_dot_t(ph, gflat))
    return jnp.concatenate(blocks, axis=0)  # (8C, N)


def _level_kernel(
    xb_ref, k1_ref, b1_ref, k2_ref, b2_ref, k3_ref, b3_ref, out_ref,
    y1, y2,
    *, T, Wg, F2a, F2, n_tiles, out_dtype,
):
    """One (batch, row-tile) program.

    xb_ref block: [1, 1, 2T+10, Wg+1, C4] — the pre-built overlapping input
      strip for this tile (4-fold view, zero halo rows and right group
      column baked in by the XLA-side pad+stack; standard BlockSpec
      pipelining feeds it — a manual in-kernel DMA cannot slice the
      12-lane HBM memref, Mosaic rejects non-tile-aligned slice extents).
    y1: [T+4, Wg+2, F2a]  level-entry output strip (2-fold, zero side cols)
    y2: [T+2, Wg+2, F2]   second conv output strip
    out_ref block: [1, T, Wg, F2]

    Row-window notes: strip rows are EVEN (2T+10) so stride-2 row selection
    slices an even-length window and phase-splits it (Mosaic's
    vector.extract_strided_slice is stride-1 only).
    """
    i = pl.program_id(1)

    # zero side group-columns of the intermediate strips (they model the
    # convs' SAME padding; interior writes never touch them). Scratch
    # persists across grid programs, so garbage here would leak.
    y1[:, 0:1, :] = jnp.zeros((y1.shape[0], 1, F2a), y1.dtype)
    y1[:, Wg + 1 :, :] = jnp.zeros((y1.shape[0], 1, F2a), y1.dtype)
    y2[:, 0:1, :] = jnp.zeros((y2.shape[0], 1, F2), y2.dtype)
    y2[:, Wg + 1 :, :] = jnp.zeros((y2.shape[0], 1, F2), y2.dtype)

    xs = xb_ref[0, 0]  # [2T+10, Wg+1, C4]

    # ---- entry conv (stride 2 both dims) -> y1 rows [iT-2, iT+T+2)
    t1 = T + 4
    acc = jnp.broadcast_to(b1_ref[0].astype(jnp.float32), (t1, Wg, F2a))
    for ty in range(3):
        acc = acc + _entry_shift_dots(
            xs, ty, t1, Wg, k1_ref[ty]
        ).reshape(t1, Wg, F2a)
    v1 = leaky(acc)
    # zero out-of-image rows (rows abs < 0 or >= H/2). Mosaic has no
    # value-scatter (v.at[].set) — zero via ref slice stores instead.
    if n_tiles == 1:
        y1[:, 1 : Wg + 1, :] = v1.astype(y1.dtype)
        y1[0:2, 1 : Wg + 1, :] = jnp.zeros((2, Wg, F2a), y1.dtype)
        y1[t1 - 2 :, 1 : Wg + 1, :] = jnp.zeros((2, Wg, F2a), y1.dtype)
    else:
        y1[:, 1 : Wg + 1, :] = v1.astype(y1.dtype)

        @pl.when(i == 0)
        def _z1top():
            y1[0:2, 1 : Wg + 1, :] = jnp.zeros(
                (2, Wg, F2a), y1.dtype
            )

        @pl.when(i == n_tiles - 1)
        def _z1bot():
            y1[t1 - 2 :, 1 : Wg + 1, :] = jnp.zeros(
                (2, Wg, F2a), y1.dtype
            )

    # ---- conv2 (stride 1) -> y2 rows [iT-1, iT+T+1)
    t2 = T + 2
    ys1 = y1[...]
    acc = jnp.broadcast_to(b2_ref[0].astype(jnp.float32), (t2, Wg, F2))
    for dy in range(3):
        acc = acc + _shift_dots(
            ys1, dy, t2, Wg, k2_ref[dy]
        ).reshape(t2, Wg, F2)
    v2 = leaky(acc)
    if n_tiles == 1:
        y2[:, 1 : Wg + 1, :] = v2.astype(y2.dtype)
        y2[0:1, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2.dtype)
        y2[t2 - 1 :, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2.dtype)
    else:
        y2[:, 1 : Wg + 1, :] = v2.astype(y2.dtype)

        @pl.when(i == 0)
        def _z2top():
            y2[0:1, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2.dtype)

        @pl.when(i == n_tiles - 1)
        def _z2bot():
            y2[t2 - 1 :, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2.dtype)

    # ---- conv3 (stride 1) -> out rows [iT, iT+T)
    ys2 = y2[...]
    acc = jnp.broadcast_to(b3_ref[0].astype(jnp.float32), (T, Wg, F2))
    for dy in range(3):
        acc = acc + _shift_dots(
            ys2, dy, T, Wg, k3_ref[dy]
        ).reshape(T, Wg, F2)
    out_ref[0] = leaky(acc).astype(out_dtype)


def _pick_tile(h2, cap=16):
    """Rows per program: probe the power-of-two-ish ladder (cap, cap/2, 4)
    for a divisor of H/2, then fall back to the largest divisor <= cap,
    then to h2 itself (prime-ish small extents). The ladder deliberately
    skips intermediate divisors (h2=12 at cap=16 picks 4, not 12): larger
    tiles only amortize halo work, and the measured VMEM cliff is at the
    cap, not between ladder rungs.

    cap=16: kernel VALUES are lane-padded vregs (a C4=12 lane dim pads to
    128, 10.6x), so a 32-row tile's live set blows the 16 MB VMEM scoped
    budget at the level-1 bench shape (measured: 18.2M at T=32, fits at
    T=16)."""
    for t in (cap, cap // 2, 4):
        if t >= 1 and h2 % t == 0:
            return t
    for t in range(min(cap, h2), 0, -1):
        if h2 % t == 0:
            return t
    return h2


def _level_pallas_raw(x, k1, b1, k2, b2, k3, b3, *, interpret=None):
    if interpret is None:
        interpret = _interpret_default()
    b, h, w, c = x.shape
    f = k1.shape[-1]
    if h % 2 or w % 4:
        raise ValueError(f"pallas encoder level needs H%2==0, W%4==0: {x.shape}")
    h2, wg = h // 2, w // 4
    t = _pick_tile(h2)
    n_tiles = h2 // t
    dt = x.dtype

    x4 = x.reshape(b, h, wg, 4 * c)
    k1f = _entry_kernel_fold(k1.astype(dt))
    k2f = _s1_kernel_fold(k2.astype(dt))
    k3f = _s1_kernel_fold(k3.astype(dt))

    # Pre-build the overlapping input strips in XLA (one cheap pad + static
    # slices — a single extra HBM pass over a small input). Tile i's strip
    # covers absolute rows [2iT-4, 2iT+2T+6), with the convs' SAME padding
    # (zero halo rows, zero right group column) baked in. An in-kernel DMA
    # cannot do this: Mosaic rejects slicing an HBM memref to the
    # non-tile-aligned 4C lane extent.
    sx_rows = 2 * t + 10
    xp = jnp.pad(x4, ((0, 0), (4, 6), (0, 1), (0, 0)))
    strips = jnp.stack(
        [
            jax.lax.slice_in_dim(xp, 2 * i * t, 2 * i * t + sx_rows, axis=1)
            for i in range(n_tiles)
        ],
        axis=1,
    )  # (B, n_tiles, 2T+10, Wg+1, 4C)

    kernel = functools.partial(
        _level_kernel,
        T=t, Wg=wg, F2a=2 * f, F2=2 * f,
        n_tiles=n_tiles, out_dtype=dt,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, sx_rows, wg + 1, 4 * c),
                lambda bb, ii: (bb, ii, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            vspec, vspec, vspec, vspec, vspec, vspec,  # k1f b1 k2f b2 k3f b3
        ],
        out_specs=pl.BlockSpec(
            (1, t, wg, 2 * f), lambda bb, ii: (bb, ii, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h2, wg, 2 * f), dt),
        scratch_shapes=[
            pltpu.VMEM((t + 4, wg + 2, 2 * f), dt),
            pltpu.VMEM((t + 2, wg + 2, 2 * f), dt),
        ],
        # every program writes disjoint output blocks and recomputes its
        # scratch from scratch: parallel semantics let Mosaic stream the
        # blocks instead of holding whole outputs VMEM-resident
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        strips,
        k1f, jnp.tile(b1.astype(dt), 2)[None],
        k2f, jnp.tile(b2.astype(dt), 2)[None],
        k3f, jnp.tile(b3.astype(dt), 2)[None],
    )
    return out.reshape(b, h2, w // 2, f)


# ---------------------------------------------------------------------------
# Backward kernel (round 4, train-step frontier): dx + dw + db for the whole
# level in ONE Pallas program per (batch, row-tile). The r3 train profile
# charges 23.3 ms/step (b2) to copies, concentrated around the small-channel
# encoder backward (lhs-dilated input-grad convs + weight-grad transposes);
# this kernel keeps the entire reverse sweep in VMEM in the same W-folded
# lane-aligned layout as the forward.
#
# Strategy per program:
#   * DMA strips of x (for recompute + dw1 patches), y3 (the level output,
#     saved as residual — it is materialized anyway), and the cotangent g.
#   * Recompute y1, y2 in-kernel (cheap small-channel convs; LeakyReLU masks
#     come from the sign of the outputs, since leaky is sign-preserving).
#   * Reverse sweep: g3 = g * mask(y3); dy2 = convT(g3, k3); g2 = dy2 *
#     mask(y2); dy1 = convT(g2, k2); g1 = dy1 * mask(y1); dx = entryT(g1).
#     Transposed stride-1 convs are forward-style folded convs with the
#     180-degree-rotated, in/out-transposed kernel; the entry transpose
#     splits into row-phase slabs written as a [T, 2, Wg, 4C] block that the
#     caller merges with a free reshape.
#   * dw/db accumulate in f32 into constant-index output blocks (grid
#     programs run sequentially per core, so the block stays resident);
#     each tile contributes exactly its OWNED rows [iT, iT+T) of every
#     cotangent, so overlap-computed halo rows are never double-counted.
# ---------------------------------------------------------------------------


def _rot_t(k):
    """Kernel of the transposed stride-1 SAME conv: rotate 180 in space,
    swap in/out channels."""
    return k[::-1, ::-1].transpose(0, 1, 3, 2)


def _entry_bwd_kernel_folds(k):
    """[3,3,C,F] -> three [4F, 4C] matrices KT[(e,d)] for the entry-conv
    input gradient in folded space, keyed (row-phase e, row-shift d) in
    ((0,0), (0,1), (1,0)) with ty = 2d+e:

      dx[2q+e, 4g+o, c] += sum_f KT[(s*2+px)*F+f, o*C+c] * g1[q-d, grp, f]
      where s=0 reads group g-1 (u = o+4), s=1 reads group g (u = o),
      and tx = u - 2px must lie in 0..2."""
    _, _, c, f = k.shape
    mats = {}
    for (e, d) in ((0, 0), (0, 1), (1, 0)):
        ty = 2 * d + e
        m = jnp.zeros((4 * f, 4 * c), k.dtype)
        for s in (0, 1):
            for px in (0, 1):
                for o in range(4):
                    u = o + 4 if s == 0 else o
                    tx = u - 2 * px
                    if 0 <= tx <= 2:
                        blk = k[ty, tx]  # [C, F]
                        m = m.at[
                            (s * 2 + px) * f : (s * 2 + px + 1) * f,
                            o * c : (o + 1) * c,
                        ].set(blk.T)
        mats[(e, d)] = m
    return mats[(0, 0)], mats[(0, 1)], mats[(1, 0)]


def _s1_kernel_unfold(dkf, f_in, f_out):
    """Adjoint of _s1_kernel_fold: [3, 6F, 2F'] -> [3, 3, F, F'] (each
    original tap was placed at exactly 2 (px, s, off) slots; sum them)."""
    dk = jnp.zeros((3, 3, f_in, f_out), dkf.dtype)
    for px in (0, 1):
        for s in (0, 1, 2):
            for off in (0, 1):
                dx = 2 * s + off - px - 1
                if 0 <= dx <= 2:
                    dk = dk.at[:, dx].add(
                        dkf[:, (s * 2 + off) * f_in : (s * 2 + off + 1) * f_in,
                            px * f_out : (px + 1) * f_out]
                    )
    return dk


def _entry_kernel_unfold(dkf, c, f):
    """Adjoint of _entry_kernel_fold: [3, 8C, 2F] -> [3, 3, C, F]."""
    dk = jnp.zeros((3, 3, c, f), dkf.dtype)
    for px in (0, 1):
        for s in (0, 1):
            for o in range(4):
                tx = 4 * s + o - 2 * px
                if 0 <= tx <= 2:
                    dk = dk.at[:, tx].add(
                        dkf[:, (s * 4 + o) * c : (s * 4 + o + 1) * c,
                            px * f : (px + 1) * f]
                    )
    return dk


def _mask(y):
    return jnp.where(y > 0, jnp.float32(1.0), jnp.float32(0.1))


def _level_bwd_kernel(
    xb_ref, y3b_ref, gb_ref,
    k1f_ref, k2f_ref, k3f_ref, b1_ref, b2_ref, b3_ref,
    kt2_ref, kt3_ref, e00_ref, e01_ref, e10_ref,
    dx_ref, dk1_ref, dk2_ref, dk3_ref, db1_ref, db2_ref, db3_ref,
    y1s, y2s, g3s, g2s, g1s,
    *, T, Wg, F2, n_tiles,
):
    """Strip blocks (built XLA-side like the forward — see _level_kernel):
    xb  [1,1, 2T+14, Wg+1, C4]  x rows [2iT-6, 2iT+2T+8), zero halos/right col
    y3b [1,1, T+6, Wg, F2]      y3 rows [iT-3, iT+T+3), zero halos
    gb  [1,1, T+6, Wg, F2]      cotangent rows likewise.
    2T+14 (even) so every stride-2 row selection can slice an even-length
    window and phase-split it (see the forward kernel note): the largest
    is the y1 recompute, ty=2 + 2*t6 = 2T+14 rows."""
    i = pl.program_id(1)
    t6 = T + 6

    first = i == 0
    last = i == n_tiles - 1

    for ref, width in ((y1s, F2), (y2s, F2), (g3s, F2), (g1s, F2),
                       (g2s, F2)):
        ref[:, 0:1, :] = jnp.zeros((ref.shape[0], 1, width), ref.dtype)
        ref[:, Wg + 1 :, :] = jnp.zeros((ref.shape[0], 1, width), ref.dtype)

    xs = xb_ref[0, 0]
    sy3 = y3b_ref[0, 0]
    sg = gb_ref[0, 0]
    C4 = xs.shape[-1]

    # ---- recompute y1 rows [iT-3, iT+T+3) (local 0..t6)
    acc = jnp.broadcast_to(b1_ref[0].astype(jnp.float32), (t6, Wg, F2))
    for ty in range(3):
        acc = acc + _entry_shift_dots(
            xs, ty, t6, Wg, k1f_ref[ty]
        ).reshape(t6, Wg, F2)
    v1 = leaky(acc)
    # zero out-of-image rows: local row l is abs r_start + l (ref slice
    # stores — Mosaic has no value-scatter)
    if n_tiles == 1:
        y1s[:, 1 : Wg + 1, :] = v1.astype(y1s.dtype)
        y1s[0:3, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), y1s.dtype)
        y1s[t6 - 3 :, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), y1s.dtype)
    else:
        y1s[:, 1 : Wg + 1, :] = v1.astype(y1s.dtype)

        @pl.when(first)
        def _zy1t():
            y1s[0:3, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), y1s.dtype)

        @pl.when(last)
        def _zy1b():
            y1s[t6 - 3 :, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), y1s.dtype)

    # ---- recompute y2 rows [iT-2, iT+T+2) (local 1..t6-1)
    ys1 = y1s[...]
    t2n = t6 - 2
    acc = jnp.broadcast_to(b2_ref[0].astype(jnp.float32), (t2n, Wg, F2))
    for dy in range(3):
        acc = acc + _shift_dots(
            ys1, dy, t2n, Wg, k2f_ref[dy]
        ).reshape(t2n, Wg, F2)
    v2 = leaky(acc)
    if n_tiles == 1:
        y2s[1 : t6 - 1, 1 : Wg + 1, :] = v2.astype(y2s.dtype)
        y2s[1:3, 1 : Wg + 1, :] = jnp.zeros((2, Wg, F2), y2s.dtype)
        y2s[t6 - 3 : t6 - 1, 1 : Wg + 1, :] = jnp.zeros(
            (2, Wg, F2), y2s.dtype)
        y2s[0:1, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2s.dtype)
        y2s[t6 - 1 :, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2s.dtype)
    else:
        y2s[1 : t6 - 1, 1 : Wg + 1, :] = v2.astype(y2s.dtype)
        y2s[0:1, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2s.dtype)
        y2s[t6 - 1 :, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), y2s.dtype)

        @pl.when(first)
        def _zy2t():
            y2s[0:3, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), y2s.dtype)

        @pl.when(last)
        def _zy2b():
            # y2 rows abs >= H2 (local >= T+3) are SAME padding: zero
            y2s[T + 3 :, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), y2s.dtype)

    # ---- g3 = g * mask(y3), all t6 rows (OOB rows are zero via sg/sy3)
    g3 = sg.astype(jnp.float32) * _mask(sy3.astype(jnp.float32))
    g3s[:, 1 : Wg + 1, :] = g3[:, :Wg, :].astype(g3s.dtype)

    # ---- db3, dw3 from OWNED rows (local 3..3+T)
    own_g3 = g3[3 : 3 + T, :Wg, :]
    db3 = jnp.sum(own_g3, axis=(0, 1))  # [2F]
    # dw3[dy] = y2-patch(owned rows + dy)^T @ own_g3, per group shift
    ys2 = y2s[...]
    g3flat = own_g3.reshape(T * Wg, F2)
    dk3_tile = jnp.stack([
        _patch_dots_t(ys2, 2 + dy, T, Wg, 3, g3flat) for dy in range(3)
    ])  # [3, 6F, 2F]

    # ---- dy2 rows [iT-2, iT+T+1): transposed conv of g3 (kernel kt3)
    gs3 = g3s[...]
    tn = t6 - 2  # rows [iT-2, iT+T+2)
    acc = jnp.zeros((tn, Wg, F2), jnp.float32)
    for dy in range(3):
        acc = acc + _shift_dots(
            gs3, dy, tn, Wg, kt3_ref[dy]
        ).reshape(tn, Wg, F2)
    # g2 = dy2 * mask(y2): y2s local rows 1..t6-1 = abs [iT-2, ...] match
    g2 = acc * _mask(ys2[1 : 1 + tn, 1 : Wg + 1, :].astype(jnp.float32))
    g2s[1 : 1 + tn, 1 : Wg + 1, :] = g2.astype(g2s.dtype)
    g2s[0:1, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), g2s.dtype)
    g2s[t6 - 1 :, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), g2s.dtype)
    # out-of-image dy2 rows do not exist in the true transpose: zero them
    # (rows abs < 0 on the first tile, abs >= H2 on the last)
    if n_tiles == 1:
        g2s[0:3, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), g2s.dtype)
        g2s[T + 3 :, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), g2s.dtype)
    else:
        @pl.when(first)
        def _zg2t():
            g2s[0:3, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), g2s.dtype)

        @pl.when(last)
        def _zg2b():
            g2s[T + 3 :, 1 : Wg + 1, :] = jnp.zeros((3, Wg, F2), g2s.dtype)

    # ---- db2, dw2 from owned rows: g2 local (in g2s) rows 3..3+T
    own_g2 = g2s[3 : 3 + T, 1 : Wg + 1, :].astype(jnp.float32)
    db2 = jnp.sum(own_g2, axis=(0, 1))
    g2flat = own_g2.reshape(T * Wg, F2)
    dk2_tile = jnp.stack([
        _patch_dots_t(ys1, 2 + dy, T, Wg, 3, g2flat) for dy in range(3)
    ])

    # ---- dy1 rows [iT-1, iT+T): transposed conv of g2 (kernel kt2)
    gs2 = g2s[...]
    tm = T + 1
    acc = jnp.zeros((tm, Wg, F2), jnp.float32)
    for dy in range(3):
        acc = acc + _shift_dots(
            gs2, 1 + dy, tm, Wg, kt2_ref[dy]
        ).reshape(tm, Wg, F2)
    # g1 = dy1 * mask(y1): y1s local rows for abs [iT-1, iT+T) = 2..2+tm
    g1 = acc * _mask(ys1[2 : 2 + tm, 1 : Wg + 1, :].astype(jnp.float32))
    # store at local base 2 (abs iT-1) in g1s
    g1s[2 : 2 + tm, 1 : Wg + 1, :] = g1.astype(g1s.dtype)
    g1s[0:2, 1 : Wg + 1, :] = jnp.zeros((2, Wg, F2), g1s.dtype)
    g1s[2 + tm :, 1 : Wg + 1, :] = jnp.zeros(
        (t6 - 2 - tm, Wg, F2), g1s.dtype
    )
    # dy1 row abs -1 (local 2) exists only as halo garbage on the first tile
    if n_tiles == 1:
        g1s[2:3, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), g1s.dtype)
    else:
        @pl.when(first)
        def _zg1t():
            g1s[2:3, 1 : Wg + 1, :] = jnp.zeros((1, Wg, F2), g1s.dtype)

    # ---- db1, dw1 from owned g1 rows (local 3..3+T in g1s)
    own_g1 = g1s[3 : 3 + T, 1 : Wg + 1, :].astype(jnp.float32)
    db1 = jnp.sum(own_g1, axis=(0, 1))
    g1flat = own_g1.reshape(T * Wg, F2)
    # entry patches of x at owned rows: y1 row p=iT+j reads x rows 2p+ty;
    # x local base is 2iT-6, so x row 2p+ty = local 2(p-iT)+6+ty
    dk1_tile = jnp.stack([
        _entry_patch_dots_t(xs, 6 + ty, T, Wg, g1flat) for ty in range(3)
    ])  # [3, 8C, 2F]

    # ---- dx rows [2iT, 2iT+2T) as phase slabs [T, 2, Wg, 4C]
    gs1 = g1s[...]
    # g1 local row for abs q is q - (iT-3); owned q rows local 3..3+T
    slabs = []
    for e in (0, 1):
        acc = jnp.zeros((T, Wg, C4), jnp.float32)
        for d in ((0, 1) if e == 0 else (0,)):
            ref = e00_ref if (e, d) == (0, 0) else (
                e01_ref if (e, d) == (0, 1) else e10_ref)
            acc = acc + _shift_dots(
                gs1, 3 - d, T, Wg, ref[...]
            ).reshape(T, Wg, C4)
        slabs.append(acc)
    dx = jnp.stack(slabs, axis=1)  # [T, 2, Wg, 4C]
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # ---- per-tile dw/db output blocks, summed XLA-side (grid-resident
    # VMEM accumulator blocks held the whole output in VMEM for the call's
    # duration and blew the 16 MB scoped budget at batch 3)
    dk1_ref[0, 0] = dk1_tile
    dk2_ref[0, 0] = dk2_tile
    dk3_ref[0, 0] = dk3_tile
    db1_ref[0, 0] = db1[None]
    db2_ref[0, 0] = db2[None]
    db3_ref[0, 0] = db3[None]


def _level_pallas_bwd(x, y3, g, k1, b1, k2, b2, k3, b3, *, interpret=None):
    """Pallas backward of the fused level: returns (dx, dk1, db1, ...)."""
    if interpret is None:
        interpret = _interpret_default()
    b, h, w, c = x.shape
    f = k1.shape[-1]
    h2, wg = h // 2, w // 4
    # The reverse sweep holds ~3x the forward's live set (recomputed
    # activations + three cotangent strips): cap=4 keeps the scoped-VMEM
    # stack under the 16 MB budget at the bench shapes (T=16 and T=8
    # both measured OOM at level 1 b3).
    t = _pick_tile(h2, cap=4)
    n_tiles = h2 // t
    dt = x.dtype

    x4 = x.reshape(b, h, wg, 4 * c)
    y3v = y3.reshape(b, h2, wg, 2 * f)
    gv = g.astype(dt).reshape(b, h2, wg, 2 * f)
    k1f = _entry_kernel_fold(k1.astype(dt))
    k2f = _s1_kernel_fold(k2.astype(dt))
    k3f = _s1_kernel_fold(k3.astype(dt))
    kt2 = _s1_kernel_fold(_rot_t(k2).astype(dt))
    kt3 = _s1_kernel_fold(_rot_t(k3).astype(dt))
    e00, e01, e10 = _entry_bwd_kernel_folds(k1.astype(dt))

    kernel = functools.partial(
        _level_bwd_kernel,
        T=t, Wg=wg, F2=2 * f, n_tiles=n_tiles,
    )
    t6 = t + 6
    # pre-built overlapping strips (see _level_pallas_raw): x rows
    # [2iT-6, 2iT+2T+8) with the zero right group column; y3/g rows
    # [iT-3, iT+T+3)
    sx_rows = 2 * t + 14

    def _strips(arr, pad_top, pad_bot, rows, stride, pad_col):
        ap = jnp.pad(
            arr, ((0, 0), (pad_top, pad_bot), (0, pad_col), (0, 0))
        )
        return jnp.stack(
            [
                jax.lax.slice_in_dim(ap, i * stride, i * stride + rows,
                                     axis=1)
                for i in range(n_tiles)
            ],
            axis=1,
        )

    xstr = _strips(x4, 6, 8, sx_rows, 2 * t, 1)
    y3str = _strips(y3v, 3, 3, t6, t, 0)
    gstr = _strips(gv, 3, 3, t6, t, 0)

    def _strip_spec(rows, cols, ch):
        return pl.BlockSpec(
            (1, 1, rows, cols, ch), lambda bb, ii: (bb, ii, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _tile_out(*s):
        return pl.BlockSpec(
            (1, 1) + s, lambda bb, ii: (bb, ii) + (0,) * len(s),
            memory_space=pltpu.VMEM,
        )

    outs = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            _strip_spec(sx_rows, wg + 1, 4 * c),
            _strip_spec(t6, wg, 2 * f),
            _strip_spec(t6, wg, 2 * f),
        ]
        + [vspec] * 11,
        out_specs=(
            pl.BlockSpec((1, t, 2, wg, 4 * c),
                         lambda bb, ii: (bb, ii, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _tile_out(3, 8 * c, 2 * f),
            _tile_out(3, 6 * f, 2 * f),
            _tile_out(3, 6 * f, 2 * f),
            _tile_out(1, 2 * f),
            _tile_out(1, 2 * f),
            _tile_out(1, 2 * f),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h2, 2, wg, 4 * c), dt),
            jax.ShapeDtypeStruct((b, n_tiles, 3, 8 * c, 2 * f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 3, 6 * f, 2 * f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 3, 6 * f, 2 * f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 1, 2 * f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 1, 2 * f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 1, 2 * f), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((t6, wg + 2, 2 * f), dt),  # y1
            pltpu.VMEM((t6, wg + 2, 2 * f), dt),  # y2
            pltpu.VMEM((t6, wg + 2, 2 * f), dt),  # g3
            pltpu.VMEM((t6, wg + 2, 2 * f), dt),  # g2
            pltpu.VMEM((t6, wg + 2, 2 * f), dt),  # g1
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        xstr, y3str, gstr,
        k1f, k2f, k3f,
        jnp.tile(b1.astype(dt), 2)[None],
        jnp.tile(b2.astype(dt), 2)[None],
        jnp.tile(b3.astype(dt), 2)[None],
        kt2, kt3, e00, e01, e10,
    )
    dxv, dk1t, dk2t, dk3t, db1t, db2t, db3t = outs
    dx = dxv.reshape(b, h, wg, 4 * c).reshape(b, h, w, c)
    dk1f = dk1t.sum(axis=(0, 1))
    dk2f = dk2t.sum(axis=(0, 1))
    dk3f = dk3t.sum(axis=(0, 1))
    db1f = db1t.sum(axis=(0, 1))
    db2f = db2t.sum(axis=(0, 1))
    db3f = db3t.sum(axis=(0, 1))
    dk1 = _entry_kernel_unfold(dk1f, c, f).astype(k1.dtype)
    dk2 = _s1_kernel_unfold(dk2f, f, f).astype(k2.dtype)
    dk3 = _s1_kernel_unfold(dk3f, f, f).astype(k3.dtype)
    db1 = (db1f[0, :f] + db1f[0, f:]).astype(b1.dtype)
    db2 = (db2f[0, :f] + db2f[0, f:]).astype(b2.dtype)
    db3 = (db3f[0, :f] + db3f[0, f:]).astype(b3.dtype)
    return dx, dk1, db1, dk2, db2, dk3, db3


def encoder_level_xla(x, k1, b1, k2, b2, k3, b3):
    """Reference: the same level as three plain XLA convs (ConvBlock math)."""

    def cb(v, k, bb, stride):
        y = jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return leaky(y + bb.astype(v.dtype))

    x = cb(x, k1, b1, 2)
    x = cb(x, k2, b2, 1)
    return cb(x, k3, b3, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _encoder_level_p(x, k1, b1, k2, b2, k3, b3, interpret, grad):
    return _level_pallas_raw(x, k1, b1, k2, b2, k3, b3, interpret=interpret)


def _enc_fwd(x, k1, b1, k2, b2, k3, b3, interpret, grad):
    out = _level_pallas_raw(x, k1, b1, k2, b2, k3, b3, interpret=interpret)
    res = (x, k1, b1, k2, b2, k3, b3) + ((out,) if grad == "pallas" else ())
    return out, res


def _bwd_fits_vmem(x):
    """Conservative scoped-VMEM fit test for the reverse-sweep kernel.

    Kernel values are lane-padded vregs: a C4-lane value costs
    ceil(128/C4)x its logical size, and the (Wg+1)-sublane width does not
    shrink with the row tile. Measured on the v5e AOT compiler: level-1
    at Wg=256 (C4=12, waste 10x) OOMs the 16 MB scoped budget for any
    batch > 1; Wg=128 at the same C4 fits through batch 6, as do all
    C4>=64 levels. Falling back costs only the XLA-recompute gradient for
    that level."""
    b, h, w, c = x.shape
    wg, c4 = w // 4, 4 * c
    waste = max(1, 128 // c4)
    return wg * waste <= 1400 or (b == 1 and wg * waste <= 2600)


def _enc_bwd(interpret, grad, res, g):
    if grad == "pallas" and _bwd_fits_vmem(res[0]):
        # Whole-level reverse sweep in one Pallas program (dx+dw+db): the
        # train-step frontier — no lhs-dilated convs, no small-channel
        # relayouts, leaky masks from the recomputed VMEM intermediates.
        x, k1, b1, k2, b2, k3, b3, y3 = res
        return _level_pallas_bwd(
            x, y3, g, k1, b1, k2, b2, k3, b3, interpret=interpret
        )
    if grad == "pallas":
        # ADVICE r4: the silent VMEM-fit fallback switches gradient
        # numerics (~1e-3 rel, MXU f32->bf16 rounding) purely as a
        # function of shape — make the chosen path diagnosable.
        import warnings

        warnings.warn(
            "encoder_level grad='pallas' falls back to the XLA-recompute "
            f"gradient at input shape {tuple(res[0].shape)} (reverse-sweep "
            "kernel exceeds the 16 MB scoped-VMEM budget; see "
            "_bwd_fits_vmem). Gradients are the XLA formulation's.",
            stacklevel=2,
        )
        res = res[:7]  # drop the saved y3; the xla path recomputes
    # grad == "xla": gradients of the XLA formulation (identical math):
    # recompute the three cheap convs and pull back through them. Costs one
    # extra level forward in the backward; the inference path never runs it.
    x, k1, b1, k2, b2, k3, b3 = res
    _, pull = jax.vjp(encoder_level_xla, x, k1, b1, k2, b2, k3, b3)
    return pull(g.astype(jnp.result_type(x)))


_encoder_level_p.defvjp(_enc_fwd, _enc_bwd)


def encoder_level(x, k1, b1, k2, b2, k3, b3, *, impl="pallas",
                  grad="xla", interpret=None):
    """One full pyramid level: stride-2 entry + two stride-1 convs, each
    followed by LeakyReLU(0.1). impl='pallas' runs the fused kernel with a
    custom VJP — grad='xla' recomputes the backward with plain XLA convs
    (bit-equal to the unfused path), grad='pallas' runs the fused Pallas
    reverse sweep. impl='xla' is the oracle."""
    if impl == "xla":
        return encoder_level_xla(x, k1, b1, k2, b2, k3, b3)
    if interpret is None:
        interpret = _interpret_default()
    return _encoder_level_p(x, k1, b1, k2, b2, k3, b3, interpret, grad)
