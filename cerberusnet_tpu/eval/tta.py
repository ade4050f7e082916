"""Test-time augmentation evaluation (multi-scale + horizontal flip).

The standard Cityscapes/KITTI val-time trick the reference family uses for
its reported numbers: average predictions over resized and mirrored inputs,
with the CORRECT inverse transform per task:

  * seg logits — resize back to base resolution; un-flip.
  * flow       — resize back AND rescale the (u, v) values by the inverse
                 scale factors (flow is measured in pixels, SURVEY.md §9.5
                 resize-scaling invariant); un-flip negates u.
  * disparity  — resize back, values / s_x; under a horizontal flip the
                 stereo pair must ALSO be swapped (the mirrored left camera
                 is the right camera — same geometry as the stereo-aware
                 training flip in data/augment.py), then un-flip.

Everything is pure jnp — wrap in jax.jit per (scale, flip) combination or
call through ``Trainer.evaluate_tta``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _resize(img, hw):
    b, _, _, c = img.shape
    return jax.image.resize(img, (b, hw[0], hw[1], c), method="bilinear")


def _flip_batch(batch):
    """Mirror all image inputs; swap left/right if a stereo pair is present."""
    out = {k: v[:, :, ::-1] for k, v in batch.items()}
    if "left" in out and "right" in out:
        out["left"], out["right"] = out["right"], out["left"]
    return out


def _one_pass(forward, variables, batch, scale, flip, base_hw):
    h, w = base_hw
    sh, sw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    fed = {k: _resize(v, (sh, sw)) for k, v in batch.items()}
    if flip:
        fed = _flip_batch(fed)
    out = forward(variables, fed)

    acc = {}
    if "seg_logits" in out:
        seg = out["seg_logits"]
        if flip:
            seg = seg[:, :, ::-1]
        acc["seg_logits"] = _resize(seg.astype(jnp.float32), (h, w))
    if "flow" in out:
        flow = out["flow"].astype(jnp.float32)
        if flip:
            flow = flow[:, :, ::-1] * jnp.asarray([-1.0, 1.0], jnp.float32)
        flow = _resize(flow, (h, w)) * jnp.asarray(
            [w / sw, h / sh], jnp.float32
        )
        acc["flow"] = flow
    if "disp" in out:
        disp = out["disp"].astype(jnp.float32)
        if flip:
            disp = disp[:, :, ::-1]
        acc["disp"] = _resize(disp, (h, w)) * jnp.float32(w / sw)
    return acc


def tta_forward(
    forward,
    variables,
    batch,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
):
    """Average predictions over ``scales`` x {identity, mirror}.

    forward: trainer-style ``forward(variables, batch) -> outputs dict``
    batch:   dict of (B, H, W, 3) image inputs (left / right / temporal …)
    Returns dict with the averaged full-res ``seg_logits`` / ``flow`` /
    ``disp`` (whichever the model produces), float32.
    """
    base_hw = next(iter(batch.values())).shape[1:3]
    flips = (False, True) if flip else (False,)
    total = {}
    n = 0
    for s in scales:
        for f in flips:
            acc = _one_pass(forward, variables, batch, s, f, base_hw)
            for k, v in acc.items():
                total[k] = v if k not in total else total[k] + v
            n += 1
    return {k: v / n for k, v in total.items()}
