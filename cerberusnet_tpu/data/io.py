"""Host-side image IO.

Thin wrappers over OpenCV for 8-bit images and 16-bit PNG ground truth
(KITTI GT is 16-bit; SURVEY.md §9.5). All functions return RGB-ordered numpy
arrays; everything downstream of decode is jitted device code
(SURVEY.md §4.4). A C++ decode path can replace this module behind the same
interface.
"""

from __future__ import annotations

import os

import numpy as np

import cv2

from cerberusnet_tpu.data import native_io


def _use_native(path: str) -> bool:
    return (
        os.environ.get("CERBERUS_NATIVE_DECODE", "1") != "0"
        and str(path).lower().endswith(".png")
        and native_io.available()
    )


def read_image_u8(path: str) -> np.ndarray:
    """(H, W, 3) uint8 RGB."""
    if _use_native(path):
        try:
            img = native_io.decode_png(path)
            if img.dtype == np.uint8:
                if img.ndim == 2:
                    return np.repeat(img[..., None], 3, axis=-1)
                return np.ascontiguousarray(img[..., :3])  # strip alpha
        except ValueError:
            pass  # unsupported sub-format (palette/interlaced) -> OpenCV
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def read_image_gray_u8(path: str) -> np.ndarray:
    """(H, W) uint8 single-channel (e.g. Cityscapes labelIds)."""
    if _use_native(path):
        try:
            img = native_io.decode_png(path)
            if img.dtype == np.uint8 and img.ndim == 2:
                return img
        except ValueError:
            pass
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def read_png16(path: str) -> np.ndarray:
    """16-bit PNG: (H, W) or (H, W, 3) uint16, RGB channel order."""
    if _use_native(path):
        try:
            img = native_io.decode_png(path)
            if img.dtype == np.uint16:
                return img
        except ValueError:
            pass
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.uint16)


def write_image_u8(path: str, img: np.ndarray) -> None:
    cv2.imwrite(str(path), cv2.cvtColor(np.asarray(img, np.uint8), cv2.COLOR_RGB2BGR))


def write_png16(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, np.uint16)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    if not cv2.imwrite(str(path), img):
        raise IOError(f"failed to write {path}")
