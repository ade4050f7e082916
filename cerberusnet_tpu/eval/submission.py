"""KITTI / Cityscapes benchmark-submission writers.

The reference family's eval tooling emits predictions in the public
benchmark formats (SURVEY.md §9.5 encodings — these are the exact inverses
of the GT decodes in data/encodings.py):

  * KITTI flow: 16-bit RGB PNG, R = u*64 + 2^15, G = v*64 + 2^15, B = valid.
  * KITTI disparity: 16-bit gray PNG, val = disp*256 (0 = invalid).
  * Cityscapes semantics: 8-bit labelId PNG (trainIds mapped back through
    the canonical 19-class -> labelId table).

All writers take model outputs as returned by the CerberusNet forward
(seg_logits / flow / disp, full resolution, NHWC) and write one file per
batch row.
"""

from __future__ import annotations

import os

import numpy as np

from cerberusnet_tpu.data.encodings import (
    encode_kitti_disparity,
    encode_kitti_flow,
)
from cerberusnet_tpu.data.io import write_png16

# trainId (0..18) -> Cityscapes labelId: the canonical mapping used by the
# official evaluation scripts (inverse of CITYSCAPES_LABELID_TO_TRAINID,
# picking each class's labelId).
TRAINID_TO_LABELID = np.array(
    [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33],
    np.uint8,
)


def write_flow_png(path: str, flow: np.ndarray, valid: np.ndarray | None = None):
    """flow: (H, W, 2) float; valid: (H, W) or None (all valid)."""
    flow = np.asarray(flow, np.float32)
    if valid is None:
        valid = np.ones(flow.shape[:2], np.float32)
    write_png16(path, encode_kitti_flow(flow, np.asarray(valid)))


def write_disparity_png(path: str, disp: np.ndarray,
                        valid: np.ndarray | None = None):
    """disp: (H, W) or (H, W, 1) float; valid: (H, W) or None."""
    disp = np.asarray(disp, np.float32)
    if disp.ndim == 3:
        disp = disp[..., 0]
    if valid is None:
        valid = np.ones(disp.shape, np.float32)
    write_png16(path, encode_kitti_disparity(disp, np.asarray(valid)))


def write_seg_png(path: str, seg: np.ndarray):
    """seg: (H, W) trainIds or (H, W, C) logits -> labelId PNG."""
    import cv2

    seg = np.asarray(seg)
    if seg.ndim == 3:
        seg = seg.argmax(-1)
    labelids = TRAINID_TO_LABELID[np.clip(seg, 0, 18).astype(np.int64)]
    # ignore (255) trainIds would be clipped to 18 above — map explicitly
    labelids = np.where(seg == 255, np.uint8(0), labelids)
    if not cv2.imwrite(str(path), labelids):
        raise IOError(f"failed to write {path}")


def _to_native(head: str, arr: np.ndarray, native_hw) -> np.ndarray:
    """Resize one prediction (H, W[, C]) to the dataset-native resolution
    with benchmark-correct VALUE scaling (SURVEY.md §9.5 resize rules):
    flow u scales with the width ratio and v with the height ratio,
    disparity with the width ratio; seg resizes as argmax labels (nearest).
    """
    import cv2

    h_in, w_in = arr.shape[:2]
    h_out, w_out = native_hw
    if (h_in, w_in) == (h_out, w_out):
        return arr
    if head == "seg_logits":
        labels = arr.argmax(-1).astype(np.uint8) if arr.ndim == 3 else arr
        return cv2.resize(labels, (w_out, h_out),
                          interpolation=cv2.INTER_NEAREST)
    out = cv2.resize(np.asarray(arr, np.float32), (w_out, h_out),
                     interpolation=cv2.INTER_LINEAR)
    if head == "flow":
        out = out * np.asarray([w_out / w_in, h_out / h_in], np.float32)
    else:  # disparity: horizontal displacement
        out = out * np.float32(w_out / w_in)
    return out


def write_predictions(outputs, out_dir: str, names, native_hw=None):
    """Write one submission file per head per batch row.

    outputs: forward dict with any of seg_logits (B,H,W,C), flow (B,H,W,2),
             disp (B,H,W,1); names: sequence of B frame stems (e.g.
             '000000_10'); native_hw: optional (H, W) to resize every
             prediction to the dataset's native resolution with correct
             value rescaling (real submissions are graded at native res).
    Layout mirrors the public benchmarks: flow/<stem>.png,
    disp_0/<stem>.png, semantic/<stem>.png.
    """
    b = len(names)
    made = []
    for head, sub in (("flow", "flow"), ("disp", "disp_0"),
                      ("seg_logits", "semantic")):
        if head not in outputs:
            continue
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        arr = np.asarray(outputs[head], np.float32)
        assert arr.shape[0] == b, (head, arr.shape, b)
        for i, stem in enumerate(names):
            path = os.path.join(d, f"{stem}.png")
            row = arr[i]
            if native_hw is not None:
                row = _to_native(head, row, native_hw)
            if head == "flow":
                write_flow_png(path, row)
            elif head == "disp":
                write_disparity_png(path, row)
            else:
                write_seg_png(path, row)
            made.append(path)
    return made
