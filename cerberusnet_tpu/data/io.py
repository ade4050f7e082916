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


_FLO_MAGIC = 202021.25  # Middlebury sanity-check float ("PIEH" as LE f32)


def read_flo(path: str) -> np.ndarray:
    """Middlebury/Sintel .flo optical flow: (H, W, 2) float32, (u, v).

    Format (public Middlebury spec, used verbatim by MPI-Sintel and
    FlyingChairs): little-endian f32 magic 202021.25, i32 width, i32
    height, then H*W*2 f32 row-major interleaved (u, v).
    """
    with open(path, "rb") as f:
        magic = np.fromfile(f, "<f4", 1)
        if magic.size == 0 or magic[0] != _FLO_MAGIC:
            raise IOError(f"{path}: not a .flo file (magic {magic})")
        w, h = np.fromfile(f, "<i4", 2)
        data = np.fromfile(f, "<f4", int(w) * int(h) * 2)
    if data.size != w * h * 2:
        raise IOError(f"{path}: truncated .flo ({data.size} of {w * h * 2})")
    return data.reshape(int(h), int(w), 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    flow = np.asarray(flow, "<f4")
    if flow.ndim != 3 or flow.shape[-1] != 2:
        raise ValueError(f"flow must be (H, W, 2), got {flow.shape}")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.asarray([_FLO_MAGIC], "<f4").tofile(f)
        np.asarray([w, h], "<i4").tofile(f)
        np.ascontiguousarray(flow).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    """Portable FloatMap (.pfm): (H, W) or (H, W, 3) float32, top-down rows.

    FlyingThings3D ships disparity and optical flow as PFM. Header: 'Pf'
    (gray) or 'PF' (color), whitespace, width height, scale whose SIGN is
    the endianness (negative = little). Rows are stored bottom-up; this
    returns them top-down to match every other loader here.
    """
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header not in (b"PF", b"Pf"):
            raise IOError(f"{path}: not a PFM file (header {header!r})")
        color = header == b"PF"
        dims = f.readline()
        while dims.startswith(b"#"):  # comment lines are legal
            dims = f.readline()
        w, h = (int(x) for x in dims.split())
        scale = float(f.readline().rstrip())
        dtype = "<f4" if scale < 0 else ">f4"
        data = np.fromfile(f, dtype, w * h * (3 if color else 1))
    shape = (h, w, 3) if color else (h, w)
    if data.size != int(np.prod(shape)):
        raise IOError(f"{path}: truncated PFM")
    return np.ascontiguousarray(data.reshape(shape)[::-1].astype(np.float32))


def write_pfm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, np.float32)
    if img.ndim == 3 and img.shape[-1] not in (1, 3):
        raise ValueError(f"PFM supports 1 or 3 channels, got {img.shape}")
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    color = img.ndim == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        np.ascontiguousarray(img[::-1].astype("<f4")).tofile(f)


def write_image_u8(path: str, img: np.ndarray) -> None:
    cv2.imwrite(str(path), cv2.cvtColor(np.asarray(img, np.uint8), cv2.COLOR_RGB2BGR))


def write_png16(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, np.uint16)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    if not cv2.imwrite(str(path), img):
        raise IOError(f"failed to write {path}")
