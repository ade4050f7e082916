"""Loss functions (SURVEY.md §3 C11, §9.6).

All losses are pure jittable functions over NHWC tensors, masked by validity
(KITTI ground truth is sparse — losses are masked means over valid pixels,
SURVEY.md §9.5). Everything reduces in float32.

  * segmentation: cross-entropy with ignore_index (optional focal variant)
  * flow: multi-scale EPE-style loss over the prediction pyramid with
    PWC-Net level weights; robust (|.|_1 + eps)^q fine-tune variant;
    optional unsupervised photometric + edge-aware smoothness terms for
    sparse-GT training
  * disparity: berHu (inverse Huber) with adaptive threshold
  * joint: fixed weighted sum per config ([BASELINE:L11] via SURVEY.md §9.6)
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from cerberusnet_tpu.ops.warp import warp2d

# PWC-Net multi-scale weights, levels 6..2 (SURVEY.md §9.6).
DEFAULT_LEVEL_WEIGHTS: Mapping[int, float] = {6: 0.32, 5: 0.08, 4: 0.02, 3: 0.01, 2: 0.005}


def _masked_mean(x, mask):
    """Mean of x over mask (float 0/1); 0 if mask is empty."""
    num = jnp.sum(x * mask)
    den = jnp.sum(mask)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------


def segmentation_loss(logits, labels, ignore_index: int = 255, focal_gamma=None):
    """Cross-entropy over valid pixels.

    logits: (B, H, W, C) float; labels: (B, H, W) int (trainIds, 255=ignore).
    focal_gamma: if set, focal-loss modulation (1-p)^gamma (SURVEY.md §9.6
    'CE with ignore_index (optionally focal)').
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index).astype(jnp.float32)
    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot dot instead of take_along_axis: a full-res gather forces a
    # slow per-pixel dynamic-gather (and a scatter in the VJP); the one-hot
    # multiply+reduce fuses into the softmax chain and is exactly equal
    # (single nonzero per pixel).
    onehot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32)
    ll = jnp.sum(logp * onehot, axis=-1)
    ce = -ll
    if focal_gamma is not None:
        ce = ce * (1.0 - jnp.exp(ll)) ** focal_gamma
    return _masked_mean(ce, valid)


# ---------------------------------------------------------------------------
# Flow
def rmi_loss(
    logits,
    labels,
    ignore_index: int = 255,
    pool_stride: int = 4,
    radius: int = 3,
    eps: float = 5e-4,
):
    """Region Mutual Information loss (SURVEY.md §3 C11 'CE w/ ignore-index
    (+ focal/RMI variants)'; Zhao et al., NeurIPS 2019).

    Treats each pixel together with its (radius x radius) neighbourhood as a
    multivariate distribution and minimizes the log-determinant of the
    conditional covariance of the one-hot GT regions given the predicted
    probability regions — a lower bound on -I(Y; P). All linear algebra is
    over tiny (R x R, R = radius^2) matrices batched over (batch, class):
    einsum + cholesky, fully jittable with static shapes.

    logits: (B, H, W, C) float; labels: (B, H, W) int (255 = ignore).
    pool_stride: spatial downsample before region extraction (avg-pool for
    probabilities, max-pool for the one-hot GT — class presence survives).
    Returns a scalar; lower is better (0-ish for perfect confident preds).
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index).astype(jnp.float32)[..., None]
    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    y = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32) * valid
    p = jax.nn.softmax(logits, axis=-1) * valid

    if pool_stride > 1:
        s = pool_stride
        window = (1, s, s, 1)
        p = jax.lax.reduce_window(
            p, 0.0, jax.lax.add, window, window, "VALID"
        ) / float(s * s)
        y = jax.lax.reduce_window(y, 0.0, jax.lax.max, window, window, "VALID")

    # (radius x radius) shifted crops -> region vectors (B, C, R, N).
    b, h, w, c = p.shape
    hh, ww = h - radius + 1, w - radius + 1
    crops_y, crops_p = [], []
    for i in range(radius):
        for j in range(radius):
            crops_y.append(y[:, i : i + hh, j : j + ww, :])
            crops_p.append(p[:, i : i + hh, j : j + ww, :])
    # stack -> (B, R, hh, ww, C) -> (B, C, R, N)
    ym = jnp.stack(crops_y, 1).transpose(0, 4, 1, 2, 3).reshape(b, c, radius * radius, -1)
    pm = jnp.stack(crops_p, 1).transpose(0, 4, 1, 2, 3).reshape(b, c, radius * radius, -1)
    n = ym.shape[-1]
    ym = ym - jnp.mean(ym, axis=-1, keepdims=True)
    pm = pm - jnp.mean(pm, axis=-1, keepdims=True)

    cov_yy = jnp.einsum("bcrn,bcsn->bcrs", ym, ym) / n
    cov_yp = jnp.einsum("bcrn,bcsn->bcrs", ym, pm) / n
    cov_pp = jnp.einsum("bcrn,bcsn->bcrs", pm, pm) / n
    r = radius * radius
    eye = jnp.eye(r, dtype=jnp.float32)
    # sigma_{y|p} = cov_yy - cov_yp (cov_pp + eps I)^-1 cov_yp^T
    inv_term = jnp.linalg.solve(cov_pp + eps * eye, jnp.swapaxes(cov_yp, -1, -2))
    sigma = cov_yy - cov_yp @ inv_term + eps * eye
    chol = jnp.linalg.cholesky(sigma)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.maximum(jnp.diagonal(chol, axis1=-2, axis2=-1), 1e-8)), axis=-1
    )
    # 0.5 logdet per (b, c), normalized by region size as in the paper.
    return jnp.mean(0.5 * logdet) / float(r)


# ---------------------------------------------------------------------------


def _sumpool2(x):
    """2x2 stride-2 sum pool of an NHWC tensor (one cascade step)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).sum(axis=(2, 4))


def _gt_sums_cascade(gt, valid, levels):
    """Yield (level, gsum, vsum) for each requested level via cascaded 2x2
    sum pools: sums over 2^l x 2^l cells are associative, so pooling the
    previous level's SUMS is exactly the one-shot reduce_window (up to f32
    add reassociation) while reading the full-res GT once instead of once
    per level — the one-shot form cost one full-res reduce_window per level
    per task in every train step.
    """
    vm = valid[..., None].astype(jnp.float32)
    gsum = gt.astype(jnp.float32) * vm
    vsum = vm
    cur = 0
    for level in sorted(levels):
        while cur < level:
            gsum = _sumpool2(gsum)
            vsum = _sumpool2(vsum)
            cur += 1
        yield level, gsum, vsum


def _finalize_gt(gsum, vsum, level, scale_values: bool):
    gt_l = jnp.where(vsum > 0, gsum / jnp.maximum(vsum, 1.0), 0.0)
    if scale_values:
        gt_l = gt_l / (2**level)
    return gt_l, (vsum[..., 0] > 0).astype(jnp.float32)


def downsample_gt(gt, valid, level: int, scale_values: bool):
    """Valid-aware average pooling of dense-or-sparse GT to pyramid level.

    gt: (B, H, W, C); valid: (B, H, W) 0/1. Returns (gt_l, valid_l) where
    gt_l is the mean over valid source pixels in each 2^level x 2^level cell
    and valid_l marks cells with any valid source. Flow/disparity values are
    divided by 2^level when scale_values (SURVEY.md §9.5 resize scaling).
    Computed as a cascade of 2x2 sum pools (see _gt_sums_cascade).
    """
    (_, gsum, vsum), = _gt_sums_cascade(gt, valid, (level,))
    return _finalize_gt(gsum, vsum, level, scale_values)


def gt_pyramid(gt, valid, levels, scale_values: bool):
    """{level: (gt_l, valid_l)} for all levels with ONE shared sum cascade."""
    return {
        level: _finalize_gt(gsum, vsum, level, scale_values)
        for level, gsum, vsum in _gt_sums_cascade(gt, valid, levels)
    }


def multiscale_flow_loss(
    flow_pyramid: Mapping[int, jax.Array],
    gt_flow,
    valid=None,
    level_weights: Mapping[int, float] = DEFAULT_LEVEL_WEIGHTS,
    robust_q=None,
    robust_eps: float = 0.01,
):
    """Sum over levels of weighted masked flow error (SURVEY.md §9.6).

    gt_flow: (B, H, W, 2) at FULL resolution in full-res pixels; per level it
    is valid-aware downsampled and value-scaled by 1/2^l to match the
    decoder's level-pixel convention. robust_q: if set, the fine-tune variant
    (|.|_1 + eps)^q instead of the L2 norm.
    """
    if valid is None:
        valid = jnp.ones(gt_flow.shape[:3], jnp.float32)
    total = 0.0
    pyr = gt_pyramid(gt_flow, valid, flow_pyramid.keys(), scale_values=True)
    for level, flow_l in flow_pyramid.items():
        gt_l, valid_l = pyr[level]
        diff = flow_l.astype(jnp.float32) - gt_l
        if robust_q is not None:
            err = (jnp.sum(jnp.abs(diff), axis=-1) + robust_eps) ** robust_q
        else:
            err = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        total = total + level_weights.get(level, 0.0) * _masked_mean(err, valid_l)
    return total


def raft_sequence_loss(
    iterates,
    gt_flow,
    valid=None,
    level: int = 3,
    gamma: float = 0.8,
):
    """RAFT sequence loss: exponentially-weighted L1 over ALL refinement
    iterates (Teed & Deng 2020 eq. 7) — supervises every GRU step so early
    iterations learn coarse motion and late ones learn residuals.

    iterates: (T, B, h, w, 2) low-res flows in level-pixel units (the
    RAFTFlowNet "flow_iterates" output). GT is valid-aware downsampled to
    the operating level ONCE and value-scaled (the framework's multiscale
    convention, losses.downsample_gt) — comparing at the operating
    resolution instead of upsampling each iterate keeps the T upsample
    passes out of the backward graph (one convex upsample per step is pure
    overhead on TPU; the final full-res field is still trained through the
    level term since upsampling is linear in the flow).
    """
    if valid is None:
        valid = jnp.ones(gt_flow.shape[:3], jnp.float32)
    gt_l, valid_l = downsample_gt(gt_flow, valid, level, scale_values=True)
    t = iterates.shape[0]
    err = jnp.sum(
        jnp.abs(iterates.astype(jnp.float32) - gt_l[None]), axis=-1
    )  # (T, B, h, w)
    per_iter = jnp.sum(err * valid_l[None], axis=(1, 2, 3)) / jnp.maximum(
        jnp.sum(valid_l), 1.0
    )
    weights = gamma ** jnp.arange(t - 1, -1, -1, dtype=jnp.float32)
    return jnp.sum(weights * per_iter)


def photometric_loss(im1, im2, flow, alpha: float = 0.85):
    """Unsupervised photometric term: warped-image SSIM + L1 mixture
    (SURVEY.md §3 C11 'unsupervised photometric ... option for sparse
    KITTI'). flow maps im1 pixels into im2; im2 is pulled back onto im1."""
    im2w = warp2d(im2, flow).astype(jnp.float32)
    im1 = im1.astype(jnp.float32)
    l1 = jnp.mean(jnp.abs(im1 - im2w))
    ssim_val = _ssim(im1, im2w)
    return alpha * (1.0 - ssim_val) * 0.5 + (1.0 - alpha) * l1


def _ssim(a, b, c1: float = 0.01**2, c2: float = 0.03**2):
    """Mean SSIM with 3x3 average pooling windows."""

    def pool(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    mu_a, mu_b = pool(a), pool(b)
    var_a = pool(a * a) - mu_a**2
    var_b = pool(b * b) - mu_b**2
    cov = pool(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def smoothness_loss(field, image):
    """First-order edge-aware smoothness: |d field| * exp(-|d image|)."""
    field = field.astype(jnp.float32)
    image = image.astype(jnp.float32)

    def grad_x(x):
        return x[:, :, 1:] - x[:, :, :-1]

    def grad_y(x):
        return x[:, 1:] - x[:, :-1]

    wx = jnp.exp(-jnp.mean(jnp.abs(grad_x(image)), axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(grad_y(image)), axis=-1, keepdims=True))
    return jnp.mean(jnp.abs(grad_x(field)) * wx) + jnp.mean(
        jnp.abs(grad_y(field)) * wy
    )


# ---------------------------------------------------------------------------
# Disparity
# ---------------------------------------------------------------------------


def berhu_loss(pred, gt, valid=None, c_frac: float = 0.2):
    """berHu / inverse-Huber (SURVEY.md §9.6): L1 below threshold c,
    (d^2 + c^2) / (2c) above, with c = c_frac * max batch error."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if pred.ndim == gt.ndim + 1:
        pred = pred[..., 0]
    if valid is None:
        valid = jnp.ones(gt.shape, jnp.float32)
    err = jnp.abs(pred - gt) * valid
    c = jnp.maximum(c_frac * jnp.max(err), 1e-6)
    loss = jnp.where(err <= c, err, (err * err + c * c) / (2.0 * c))
    return _masked_mean(loss, valid)


def multiscale_disparity_loss(
    disp_pyramid: Mapping[int, jax.Array],
    gt_disp,
    valid=None,
    level_weights: Mapping[int, float] = DEFAULT_LEVEL_WEIGHTS,
):
    """Per-level berHu over the disparity pyramid (same downsampling and
    value-scaling rules as flow; disparity scales with width)."""
    if gt_disp.ndim == 3:
        gt_disp = gt_disp[..., None]
    if valid is None:
        valid = jnp.ones(gt_disp.shape[:3], jnp.float32)
    total = 0.0
    pyr = gt_pyramid(gt_disp, valid, disp_pyramid.keys(), scale_values=True)
    for level, disp_l in disp_pyramid.items():
        gt_l, valid_l = pyr[level]
        total = total + level_weights.get(level, 0.0) * berhu_loss(
            disp_l, gt_l[..., 0], valid_l
        )
    return total


# ---------------------------------------------------------------------------
# Joint
# ---------------------------------------------------------------------------


def joint_loss(outputs, batch, weights=None, focal_gamma=None, robust_q=None,
               photometric_weight: float = 0.0, smoothness_weight: float = 0.0,
               rmi_weight: float = 0.0, seq_gamma: float = 0.8):
    """Weighted multi-task loss (SURVEY.md §3 C11 'joint weighted sum').

    Tasks contribute only when both the model output and the GT are
    present. outputs: forward dict; batch: dict with any of seg_labels
    (B,H,W int), flow_gt (B,H,W,2) + flow_valid, disp_gt (B,H,W) +
    disp_valid. Missing tasks contribute zero. Returns (total, components).
    """
    weights = weights or {"seg": 1.0, "flow": 1.0, "disp": 1.0}
    comps = {}
    total = 0.0
    if "seg_labels" in batch and "seg_logits" in outputs:
        comps["seg"] = segmentation_loss(
            outputs["seg_logits"], batch["seg_labels"], focal_gamma=focal_gamma
        )
        if rmi_weight:
            # Mix as in the RMI paper: (1-w)*CE + w*RMI.
            comps["rmi"] = rmi_loss(outputs["seg_logits"], batch["seg_labels"])
            comps["seg"] = (1.0 - rmi_weight) * comps["seg"] + (
                rmi_weight * comps["rmi"]
            )
        total = total + weights.get("seg", 1.0) * comps["seg"]
    if "flow_gt" in batch and "flow_iterates" in outputs:
        # Iterative-refinement models (RAFT family) supervise every GRU
        # iterate; the multiscale pyramid term is subsumed (the final
        # iterate IS the pyramid entry).
        (level,) = outputs["flow_pyramid"].keys()
        comps["flow"] = raft_sequence_loss(
            outputs["flow_iterates"],
            batch["flow_gt"],
            batch.get("flow_valid"),
            level=level,
            gamma=seq_gamma,
        )
        total = total + weights.get("flow", 1.0) * comps["flow"]
    elif "flow_gt" in batch and "flow_pyramid" in outputs:
        comps["flow"] = multiscale_flow_loss(
            outputs["flow_pyramid"],
            batch["flow_gt"],
            batch.get("flow_valid"),
            robust_q=robust_q,
        )
        total = total + weights.get("flow", 1.0) * comps["flow"]
    if "disp_gt" in batch and "disp_iterates" in outputs:
        # RAFT-Stereo: supervise every refinement iterate (L1 sequence).
        (level,) = outputs["disp_pyramid"].keys()
        gt_d = batch["disp_gt"]
        if gt_d.ndim == 3:
            gt_d = gt_d[..., None]
        comps["disp"] = raft_sequence_loss(
            outputs["disp_iterates"],
            gt_d,
            batch.get("disp_valid"),
            level=level,
            gamma=seq_gamma,
        )
        total = total + weights.get("disp", 1.0) * comps["disp"]
    elif "disp_gt" in batch and "disp_pyramid" in outputs:
        comps["disp"] = multiscale_disparity_loss(
            outputs["disp_pyramid"], batch["disp_gt"], batch.get("disp_valid")
        )
        total = total + weights.get("disp", 1.0) * comps["disp"]
    # Unsupervised auxiliary terms for sparse-GT training (SURVEY.md §3 C11):
    # photometric consistency between left and the flow-warped temporal
    # frame, and edge-aware flow smoothness.
    if photometric_weight and "flow" in outputs and "temporal" in batch:
        comps["photometric"] = photometric_loss(
            batch["left"], batch["temporal"], outputs["flow"]
        )
        total = total + photometric_weight * comps["photometric"]
    if smoothness_weight and "flow" in outputs and "left" in batch:
        comps["smoothness"] = smoothness_loss(outputs["flow"], batch["left"])
        total = total + smoothness_weight * comps["smoothness"]
    comps["total"] = total
    return total, comps


def uncertainty_weighted_total(comps, log_vars):
    """Kendall et al. homoscedastic multi-task weighting (SURVEY.md §9.6
    'uncertainty weighting a la Kendall'): total = sum_t exp(-s_t) * L_t
    + 0.5 * s_t over tasks present, with learnable log-variances s_t."""
    total = 0.0
    for task, s in log_vars.items():
        if task in comps:
            total = total + jnp.exp(-s) * comps[task] + 0.5 * s
    return total
