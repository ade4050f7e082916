"""ctypes binding for the native C++ PNG decoder (native/dataload).

The reference decodes its images and 16-bit ground truth through OpenCV's
C++ imdecode (SURVEY.md §3 C9/C10); this is the framework's own native
decode path — a dependency-light C++ PNG decoder covering exactly the
formats KITTI-2015/Cityscapes ship (8/16-bit, gray/RGB/alpha,
non-interlaced). ctypes drops the GIL during the call, so the DataLoader's
decode thread pool parallelizes over it like it does over cv2.

Build once with `make -C native/dataload`; `available()` reports whether
the shared library is present. data/io.py uses it automatically when built
(set CERBERUS_NATIVE_DECODE=0 to force OpenCV).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "dataload",
    "libpng_decode.so",
)

_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cnt_png_decode.restype = ctypes.c_int
    lib.cnt_png_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.cnt_png_free.restype = None
    lib.cnt_png_free.argtypes = [ctypes.c_void_p]
    lib.cnt_png_error.restype = ctypes.c_char_p
    lib.cnt_png_error.argtypes = [ctypes.c_int]
    lib.cnt_png_to_input.restype = ctypes.c_int
    lib.cnt_png_to_input.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_int,
        ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_png(path: str) -> np.ndarray:
    """Decode a PNG with the native library.

    Returns (H, W) for single-channel or (H, W, C) otherwise; dtype uint8
    or uint16 (native endianness). Raises on unsupported inputs (palette,
    interlaced) — callers fall back to the OpenCV path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native decoder not built (make -C native/dataload)"
        )
    data = ctypes.c_void_p()
    h = ctypes.c_uint32()
    w = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    depth = ctypes.c_uint32()
    rc = lib.cnt_png_decode(
        os.fsencode(path),
        ctypes.byref(data),
        ctypes.byref(h),
        ctypes.byref(w),
        ctypes.byref(ch),
        ctypes.byref(depth),
    )
    if rc != 0:
        msg = lib.cnt_png_error(rc).decode()
        if rc == 1:
            raise FileNotFoundError(f"{path}: {msg}")
        raise ValueError(f"{path}: {msg}")
    try:
        dtype = np.uint8 if depth.value == 8 else np.uint16
        count = h.value * w.value * ch.value
        arr = np.ctypeslib.as_array(
            ctypes.cast(data, ctypes.POINTER(ctypes.c_uint8)),
            shape=(count * dtype().itemsize,),
        )
        out = np.frombuffer(arr, dtype=dtype, count=count).reshape(
            h.value, w.value, ch.value
        ).copy()
    finally:
        lib.cnt_png_free(data)
    if out.shape[-1] == 1:
        out = out[..., 0]
    return out


def png_to_input(path: str, hw, dtype: str = "bfloat16") -> np.ndarray:
    """Native decode + preprocess of an exact-size 8-bit PNG into the model
    input tensor (1, H, W, 3): (x/255 - imagenet_mean)/std in f32, cast to
    `dtype` (bfloat16 uses round-to-nearest-even). Matches the Python
    path (data/io.py -> encodings.preprocess_image -> astype) to 2 f32 ULP
    (XLA folds the divisions into reciprocal multiplies); the same C code
    feeds the C++ PJRT runner's --pngs serving mode."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (make -C native/dataload)")
    h, w = hw
    if dtype == "float32":
        code, np_dtype = 0, np.float32
    elif dtype == "bfloat16":
        import ml_dtypes

        code, np_dtype = 1, np.dtype(ml_dtypes.bfloat16)
    else:
        raise ValueError(f"unsupported dtype {dtype!r}")
    out = np.empty((1, h, w, 3), np_dtype)
    rc = lib.cnt_png_to_input(
        os.fsencode(path), h, w, code, out.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        raise ValueError(f"{path}: {lib.cnt_png_error(rc).decode()}")
    return out
