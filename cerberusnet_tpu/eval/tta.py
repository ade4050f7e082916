"""Test-time augmentation evaluation (multi-scale + horizontal flip).

The standard Cityscapes/KITTI val-time trick the reference family uses for
its reported numbers: average predictions over resized and mirrored inputs,
with the CORRECT inverse transform per task:

  * seg logits — resize back to base resolution; un-flip.
  * flow       — resize back AND rescale the (u, v) values by the inverse
                 scale factors (flow is measured in pixels, SURVEY.md §9.5
                 resize-scaling invariant); un-flip negates u.
  * disparity  — resize back, values / s_x.

Flip anchoring (round-2 fix, ADVICE r1): seg and flow anchor at the LEFT
camera, so their mirrored pass must feed mirror(left)/mirror(temporal)
WITHOUT swapping the stereo pair — a swapped pass would predict seg/flow for
the right view, misaligned with the unflipped (left-anchored) predictions by
per-pixel disparity.  Disparity is the opposite: a mirrored pair is only
geometrically valid if the views are ALSO swapped (mirror(right) acts as the
left camera of the mirrored scene), and even then the un-flipped result is
the RIGHT-view disparity — an approximation of the left-view map, offset by
the per-pixel disparity itself.  So joint models run the mirrored pass once
per anchor, and the disparity flip contribution is opt-in
(``disp_flip="swap"``) with ``"skip"`` (scales-only averaging for disp) as
the exact-by-default choice.  Note this intentionally differs from training:
data/augment.py SKIPS horizontal flips when disparity GT is present.

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


def _flip_batch(batch, swap_stereo: bool):
    """Mirror all image inputs; optionally swap a stereo pair (disp anchor)."""
    out = {k: v[:, :, ::-1] for k, v in batch.items()}
    if swap_stereo and "left" in out and "right" in out:
        out["left"], out["right"] = out["right"], out["left"]
    return out


def _one_pass(forward, variables, batch, scale, base_hw, *, flip, swap_stereo,
              keep):
    """One forward at ``scale`` (mirrored iff flip), returning the inverse-
    transformed predictions restricted to ``keep`` (None = all)."""
    h, w = base_hw
    sh, sw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    fed = {k: _resize(v, (sh, sw)) for k, v in batch.items()}
    if flip:
        fed = _flip_batch(fed, swap_stereo)
    out = forward(variables, fed)

    acc = {}
    if "seg_logits" in out and (keep is None or "seg_logits" in keep):
        seg = out["seg_logits"]
        if flip:
            seg = seg[:, :, ::-1]
        acc["seg_logits"] = _resize(seg.astype(jnp.float32), (h, w))
    if "flow" in out and (keep is None or "flow" in keep):
        flow = out["flow"].astype(jnp.float32)
        if flip:
            flow = flow[:, :, ::-1] * jnp.asarray([-1.0, 1.0], jnp.float32)
        flow = _resize(flow, (h, w)) * jnp.asarray(
            [w / sw, h / sh], jnp.float32
        )
        acc["flow"] = flow
    if "disp" in out and (keep is None or "disp" in keep):
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
    disp_flip: str = "skip",
):
    """Average predictions over ``scales`` x {identity, mirror}.

    forward: trainer-style ``forward(variables, batch) -> outputs dict``
    batch:   dict of (B, H, W, 3) image inputs (left / right / temporal ...)
    disp_flip: what the mirrored pass does for disparity —
      * "skip" (default): disparity averages over scales only; exact.
      * "swap": swapped-pair mirrored pass; right-view-disparity
        approximation (see module docstring).
    Returns dict with the averaged full-res ``seg_logits`` / ``flow`` /
    ``disp`` (whichever the model produces), float32.  Per-key counts: with
    flip on, seg/flow average over 2x len(scales) passes while disp averages
    over len(scales) (or 2x with disp_flip="swap").
    """
    if disp_flip not in ("skip", "swap"):
        raise ValueError(f"disp_flip must be 'skip' or 'swap', got {disp_flip!r}")
    base_hw = next(iter(batch.values())).shape[1:3]
    total, counts = {}, {}

    def add(acc):
        for k, v in acc.items():
            total[k] = v if k not in total else total[k] + v
            counts[k] = counts.get(k, 0) + 1

    for s in scales:
        acc = _one_pass(forward, variables, batch, s, base_hw,
                        flip=False, swap_stereo=False, keep=None)
        add(acc)
        if not flip:
            continue
        produces = set(acc)
        # Left-anchored tasks: mirrored pass, stereo pair NOT swapped.
        if produces & {"seg_logits", "flow"}:
            add(_one_pass(forward, variables, batch, s, base_hw,
                          flip=True, swap_stereo=False,
                          keep={"seg_logits", "flow"}))
        # Disparity: swapped-pair mirrored pass, opt-in approximation.
        if "disp" in produces and disp_flip == "swap":
            add(_one_pass(forward, variables, batch, s, base_hw,
                          flip=True, swap_stereo=True, keep={"disp"}))
    return {k: v / counts[k] for k, v in total.items()}
