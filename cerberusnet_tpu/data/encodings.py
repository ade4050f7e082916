"""Ground-truth encodings and device-side preprocessing (SURVEY.md §9.5).

Host side (numpy): only raw PNG decode and the bit-level GT conversions.
Everything geometric/numeric (resize, normalization, GT rescaling) is
jittable jnp code executed on device (SURVEY.md §4.4 'decode on host ...
all geometric/numeric work inside the jitted graph').

Encodings (all from the public KITTI/Cityscapes conventions, SURVEY.md §9.5):
  * KITTI flow PNG (16-bit RGB): u = (R - 2^15)/64, v = (G - 2^15)/64,
    valid = B > 0. Sparse.
  * KITTI disparity PNG (16-bit gray): disp = val/256, val == 0 invalid.
  * Cityscapes seg: labelIds (0..33) -> 19 trainIds, ignore = 255.
  * Resize by (s_x, s_y): flow channels scale by (s_x, s_y), disparity by
    s_x, seg labels use nearest-neighbor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics — the fixed normalization choice (SURVEY.md §9.5 note).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# Cityscapes labelId -> trainId (the public 19-class mapping).
_LUT = np.full(256, 255, np.uint8)
for label_id, train_id in {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}.items():
    _LUT[label_id] = train_id
CITYSCAPES_LABELID_TO_TRAINID = _LUT

CITYSCAPES_CLASS_NAMES = (
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
)


# ---------------------------------------------------------------------------
# Host-side bit-level decodes (numpy, applied right after PNG decode)
# ---------------------------------------------------------------------------


def decode_kitti_flow(png: np.ndarray):
    """(H, W, 3) uint16 KITTI flow PNG -> (flow (H,W,2) f32, valid (H,W) f32)."""
    png = np.asarray(png)
    if png.dtype != np.uint16:
        raise ValueError(f"KITTI flow PNG must be uint16, got {png.dtype}")
    u = (png[..., 0].astype(np.float32) - 2.0**15) / 64.0
    v = (png[..., 1].astype(np.float32) - 2.0**15) / 64.0
    valid = (png[..., 2] > 0).astype(np.float32)
    return np.stack([u, v], axis=-1) * valid[..., None], valid


def encode_kitti_flow(flow: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Inverse of decode_kitti_flow (used to synthesize test fixtures)."""
    u16 = np.zeros(flow.shape[:2] + (3,), np.uint16)
    u16[..., 0] = np.clip(flow[..., 0] * 64.0 + 2.0**15, 0, 65535).astype(np.uint16)
    u16[..., 1] = np.clip(flow[..., 1] * 64.0 + 2.0**15, 0, 65535).astype(np.uint16)
    u16[..., 2] = (valid > 0).astype(np.uint16)
    return u16


def decode_kitti_disparity(png: np.ndarray):
    """(H, W) uint16 KITTI disparity PNG -> (disp (H,W) f32, valid (H,W) f32)."""
    png = np.asarray(png)
    if png.dtype != np.uint16:
        raise ValueError(f"KITTI disparity PNG must be uint16, got {png.dtype}")
    valid = (png > 0).astype(np.float32)
    return png.astype(np.float32) / 256.0, valid


def encode_kitti_disparity(disp: np.ndarray, valid: np.ndarray) -> np.ndarray:
    out = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
    return np.where(valid > 0, np.maximum(out, 1), 0).astype(np.uint16)


def labelids_to_trainids(labels: np.ndarray) -> np.ndarray:
    """Cityscapes labelId image -> trainId image (255 = ignore)."""
    return CITYSCAPES_LABELID_TO_TRAINID[np.asarray(labels, np.uint8)]


def decode_cityscapes_disparity(png: np.ndarray):
    """Cityscapes precomputed disparity PNG: d = (val - 1) / 256, val>0."""
    png = np.asarray(png)
    valid = (png > 0).astype(np.float32)
    disp = np.where(png > 0, (png.astype(np.float32) - 1.0) / 256.0, 0.0)
    return disp, valid


# ---------------------------------------------------------------------------
# Device-side jitted preprocessing
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_hw",))
def preprocess_image(img_u8, out_hw=None):
    """uint8 (B,H,W,3) -> normalized float32 NHWC, optionally resized."""
    x = img_u8.astype(jnp.float32) / 255.0
    if out_hw is not None and out_hw != img_u8.shape[1:3]:
        x = jax.image.resize(x, (x.shape[0], *out_hw, 3), "bilinear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_flow(flow, valid, out_hw):
    """Resize flow + valid to out_hw; values scale by (s_x, s_y)
    (SURVEY.md §9.5). Nearest-neighbor keeps sparse GT exact-valued."""
    b, h, w, _ = flow.shape
    sy, sx = out_hw[0] / h, out_hw[1] / w
    f = jax.image.resize(flow, (b, *out_hw, 2), "nearest")
    f = f * jnp.asarray([sx, sy], jnp.float32)
    v = jax.image.resize(valid, (b, *out_hw), "nearest")
    return f, v


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_disparity(disp, valid, out_hw):
    b, h, w = disp.shape
    sx = out_hw[1] / w
    d = jax.image.resize(disp, (b, *out_hw), "nearest") * sx
    v = jax.image.resize(valid, (b, *out_hw), "nearest")
    return d, v


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_labels(labels, out_hw):
    return jax.image.resize(labels, (labels.shape[0], *out_hw), "nearest")
