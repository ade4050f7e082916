"""Tiled (sliding-window) inference for resolutions beyond one pass.

Two ways to run huge inputs through the model:
  * spatial sharding (parallel/mesh.py): split activations across DEVICES,
    XLA inserts halo exchanges — the TPU-native route when a mesh is
    available (SURVEY.md §6.7);
  * tiling (this module): split the IMAGE into overlapping windows on one
    device, run the normal jitted forward per tile (one compile — all
    tiles share a shape), and blend the outputs back. The classic
    sliding-window trick used for high-resolution Cityscapes evaluation.

Blending uses separable triangular windows so overlapping predictions
cross-fade (weights sum to a constant in the interior); seg logits, flow,
and disparity all blend linearly — flow/disparity values are
translation-invariant, so tile-local predictions stitch directly.
"""

from __future__ import annotations

import weakref

import numpy as np
import jax
import jax.numpy as jnp

# jit wrappers cached per forward-fn so a val-split loop pays the trace/
# compile once, not per batch (ADVICE r1). Weak keys: dropping the forward
# drops its executable.
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jitted(forward):
    if isinstance(forward, jax.stages.Wrapped):
        return forward  # caller already jitted it
    try:
        cached = _JIT_CACHE.get(forward)
        if cached is None:
            cached = jax.jit(forward)
            _JIT_CACHE[forward] = cached
        return cached
    except TypeError:  # not weakref-able (e.g. some callables) — no cache
        return jax.jit(forward)


def _starts(full: int, tile: int, stride: int):
    """Window starts covering [0, full) with the last window flush."""
    if tile >= full:
        return [0]
    s = list(range(0, full - tile, stride))
    s.append(full - tile)
    return s


def _tri_window(n: int):
    # triangular, strictly positive (avoids zero-weight seams at edges)
    ramp = np.minimum(np.arange(1, n + 1), np.arange(n, 0, -1)).astype(np.float32)
    return ramp / ramp.max()


def tiled_forward(forward, variables, batch, tile_hw, overlap: float = 0.25,
                  batch_tiles: bool = False):
    """Run ``forward`` over overlapping tiles and blend.

    forward: trainer-style ``forward(variables, batch) -> outputs dict``;
             may already be jax.jit-wrapped (used as-is), otherwise it is
             jitted once and cached across calls per function object
    batch:   dict of (B, H, W, 3) inputs (left / right / temporal ...)
    tile_hw: (th, tw) window fed to the model (its compile shape)
    overlap: fraction of the tile shared between neighbours (0..0.9)
    batch_tiles: run every window in ONE forward call at batch b*ntiles
             (identical math; one dispatch; costs ntiles x the activation
             memory — use when the tile count and model fit HBM)

    Returns averaged full-res ``seg_logits`` / ``flow`` / ``disp`` (f32).
    """
    th, tw = tile_hw
    ref = next(iter(batch.values()))
    b, h, w = ref.shape[:3]
    sy = max(int(th * (1 - overlap)), 1)
    sx = max(int(tw * (1 - overlap)), 1)
    wy = _tri_window(min(th, h))
    wx = _tri_window(min(tw, w))
    wmask = jnp.asarray(np.outer(wy, wx))[None, :, :, None]  # (1, th, tw, 1)

    jit_forward = _jitted(forward)
    positions = [
        (y0, x0) for y0 in _starts(h, th, sy) for x0 in _starts(w, tw, sx)
    ]

    # batch_tiles: run ALL windows as one forward at batch b*ntiles — one
    # dispatch instead of ntiles (each dispatch costs wall time on remote
    # backends) and better chip utilization at small tile sizes. Identical
    # math: convolutions are independent across the batch axis.
    outs = None
    if batch_tiles and len(positions) > 1:
        stacked = {
            k: jnp.concatenate(
                [v[:, y0 : y0 + th, x0 : x0 + tw] for (y0, x0) in positions],
                axis=0,
            )
            for k, v in batch.items()
        }
        big = jit_forward(variables, stacked)
        # model outputs nest pyramid dicts — slice every array leaf, not
        # the top-level values (a dict indexed with a slice KeyErrors)
        outs = [
            jax.tree.map(lambda v, i=i: v[i * b : (i + 1) * b], big)
            for i in range(len(positions))
        ]

    total: dict = {}
    weight = jnp.zeros((1, h, w, 1), jnp.float32)
    for ti, (y0, x0) in enumerate(positions):
        if outs is not None:
            out = outs[ti]
        else:
            tile = {
                k: v[:, y0 : y0 + th, x0 : x0 + tw] for k, v in batch.items()
            }
            out = jit_forward(variables, tile)
        weight = jax.lax.dynamic_update_slice(
            weight,
            jax.lax.dynamic_slice(
                weight, (0, y0, x0, 0), (1, min(th, h), min(tw, w), 1)
            )
            + wmask,
            (0, y0, x0, 0),
        )
        for key in ("seg_logits", "flow", "disp"):
            if key not in out:
                continue
            o = out[key].astype(jnp.float32) * wmask
            if key not in total:
                total[key] = jnp.zeros(
                    (b, h, w, o.shape[-1]), jnp.float32
                )
            total[key] = jax.lax.dynamic_update_slice(
                total[key],
                jax.lax.dynamic_slice(
                    total[key],
                    (0, y0, x0, 0),
                    (b, min(th, h), min(tw, w), o.shape[-1]),
                )
                + o,
                (0, y0, x0, 0),
            )
    return {k: v / weight for k, v in total.items()}
