"""Evaluation metrics (SURVEY.md §3 C12): seg mIoU, flow EPE/Fl-all,
disparity MAE/D1-all.

Design: on-device ACCUMULATORS, not per-batch Python floats — each update is
a pure function returning a new small pytree (confusion matrix / running
sums) that lives on device across the whole validation epoch and is reduced
once at the end (SURVEY.md §6.5 'on-device metric accumulators ... donated
across steps'). Under data parallelism the accumulators are summed with
jax.lax.psum / a final cross-device reduction — they are linear in the data.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Segmentation: confusion-matrix mIoU
# ---------------------------------------------------------------------------


def confusion_matrix(pred, labels, num_classes: int, ignore_index: int = 255):
    """(B,H,W) int pred/labels -> (C, C) counts[label, pred], ignoring
    ignore_index. Implemented as a bincount over label*C+pred (XLA scatter)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    idx = safe_labels * num_classes + pred
    counts = jnp.bincount(
        idx.reshape(-1),
        weights=valid.reshape(-1).astype(jnp.float32),
        length=num_classes * num_classes,
    )
    return counts.reshape(num_classes, num_classes)


def iou_per_class(cm):
    """(C,C) confusion -> ((C,) IoU, (C,) present mask). IoU is 0 for
    classes absent from both GT and prediction (mask them with `present`)."""
    tp = jnp.diag(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    denom = tp + fp + fn
    iou = jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), 0.0)
    return iou, denom > 0


def miou_from_confusion(cm):
    """Mean IoU over classes present in GT or prediction."""
    iou, present = iou_per_class(cm)
    n = jnp.maximum(jnp.sum(present), 1)
    return jnp.sum(jnp.where(present, iou, 0.0)) / n


# ---------------------------------------------------------------------------
# Flow: EPE + Fl-all
# ---------------------------------------------------------------------------


def flow_error_sums(pred, gt, valid=None):
    """Returns (epe_sum, outlier_sum, count) over valid pixels.

    EPE = ||pred - gt||_2; outlier (KITTI Fl): err > 3px AND err > 5% of
    ||gt|| (SURVEY.md §3 C12 'flow EPE (+Fl-all outlier %)')."""
    if valid is None:
        valid = jnp.ones(gt.shape[:3], jnp.float32)
    valid = valid.astype(jnp.float32)
    err = jnp.sqrt(jnp.sum((pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2, -1))
    mag = jnp.sqrt(jnp.sum(gt.astype(jnp.float32) ** 2, -1))
    outlier = ((err > 3.0) & (err > 0.05 * mag)).astype(jnp.float32)
    return (
        jnp.sum(err * valid),
        jnp.sum(outlier * valid),
        jnp.sum(valid),
    )


# ---------------------------------------------------------------------------
# Disparity: MAE + D1-all
# ---------------------------------------------------------------------------


def disparity_error_sums(pred, gt, valid=None):
    """Returns (abs_err_sum, d1_sum, count). D1: err > 3px AND err > 5% of
    gt (KITTI-2015 convention; SURVEY.md §9.6)."""
    if pred.ndim == gt.ndim + 1:
        pred = pred[..., 0]
    if valid is None:
        valid = (gt > 0).astype(jnp.float32)
    valid = valid.astype(jnp.float32)
    err = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    d1 = ((err > 3.0) & (err > 0.05 * jnp.abs(gt))).astype(jnp.float32)
    return jnp.sum(err * valid), jnp.sum(d1 * valid), jnp.sum(valid)


# ---------------------------------------------------------------------------
# Accumulator pytree
# ---------------------------------------------------------------------------


@struct.dataclass
class MetricState:
    """Device-resident running metric state (a pytree: psum/donate-friendly)."""

    confusion: jax.Array  # (C, C)
    flow_sums: jax.Array  # (3,) epe_sum, outlier_sum, count
    disp_sums: jax.Array  # (3,) abs_err_sum, d1_sum, count

    @classmethod
    def zeros(cls, num_classes: int = 19):
        return cls(
            confusion=jnp.zeros((num_classes, num_classes), jnp.float32),
            flow_sums=jnp.zeros((3,), jnp.float32),
            disp_sums=jnp.zeros((3,), jnp.float32),
        )

    def update(self, outputs, batch, ignore_index: int = 255):
        """Accumulate one batch. ``batch["_sample_mask"]`` ((B,) float,
        1=real / 0=padding) excludes pad samples appended by
        data.loader.pad_batch for the final partial eval batch."""
        new = self
        smask = batch.get("_sample_mask")
        if "seg_labels" in batch and "seg_logits" in outputs:
            pred = jnp.argmax(outputs["seg_logits"], axis=-1)
            labels = batch["seg_labels"]
            if smask is not None:
                labels = jnp.where(
                    smask[:, None, None] > 0, labels, ignore_index
                )
            cm = confusion_matrix(
                pred, labels, self.confusion.shape[0], ignore_index
            )
            new = new.replace(confusion=new.confusion + cm)
        if "flow_gt" in batch and "flow" in outputs:
            valid = batch.get(
                "flow_valid", jnp.ones(batch["flow_gt"].shape[:3], jnp.float32)
            )
            if smask is not None:
                valid = valid * smask[:, None, None]
            s = flow_error_sums(outputs["flow"], batch["flow_gt"], valid)
            new = new.replace(flow_sums=new.flow_sums + jnp.stack(s))
        if "disp_gt" in batch and "disp" in outputs:
            gt = batch["disp_gt"]
            valid = batch.get("disp_valid")
            if valid is None:
                valid = (
                    (gt[..., 0] if gt.ndim == 4 else gt) > 0
                ).astype(jnp.float32)
            if smask is not None:
                valid = valid * smask[:, None, None]
            s = disparity_error_sums(outputs["disp"], gt, valid)
            new = new.replace(disp_sums=new.disp_sums + jnp.stack(s))
        return new

    def merge(self, other: "MetricState"):
        return MetricState(
            confusion=self.confusion + other.confusion,
            flow_sums=self.flow_sums + other.flow_sums,
            disp_sums=self.disp_sums + other.disp_sums,
        )

    def compute(self, per_class: bool = False, class_names=None):
        """Final scalar metrics as a plain dict of python floats.

        per_class=True appends per-class IoUs as ``iou/<name>`` (Cityscapes
        trainId names by default — the standard per-class val report)."""
        fs = self.flow_sums
        ds = self.disp_sums
        fcount = max(float(fs[2]), 1.0)
        dcount = max(float(ds[2]), 1.0)
        out = {
            "miou": float(miou_from_confusion(self.confusion)),
            "flow_epe": float(fs[0]) / fcount,
            "flow_fl_all": float(fs[1]) / fcount,
            "disp_mae": float(ds[0]) / dcount,
            "disp_d1_all": float(ds[1]) / dcount,
        }
        if per_class:
            iou, present = iou_per_class(self.confusion)
            iou, present = jax.device_get((iou, present))
            if class_names is None:
                from cerberusnet_tpu.data.encodings import CITYSCAPES_CLASS_NAMES

                class_names = CITYSCAPES_CLASS_NAMES
            for i in range(len(iou)):
                name = class_names[i] if i < len(class_names) else str(i)
                out[f"iou/{name}"] = float(iou[i]) if present[i] else float("nan")
        return out
