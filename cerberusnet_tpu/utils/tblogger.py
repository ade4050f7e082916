"""Dependency-free TensorBoard event-file writer (SURVEY.md §3 C18, §6.5).

The reference logged training scalars and image panels to TensorBoard
[RECALL]; this is the rebuild's equivalent, implemented directly against
the TFRecord + event.proto wire formats with the stdlib only (no
tensorflow/tensorboard import in the training path — torch's SummaryWriter
would drag a full TF-stack import into every trainer start).

Wire formats implemented:
  * TFRecord framing: <u64 len><u32 masked_crc32c(len)><payload>
    <u32 masked_crc32c(payload)>, CRC32C = Castagnoli, masked per the
    TFRecord spec (rotate 15 + 0xa282ead8).
  * tensorflow.Event / Summary / Summary.Value / Summary.Image protobuf
    messages, hand-encoded (varint + tagged fields).

Compatibility is pinned by tests/test_tblogger.py, which reads the files
back with the real `tensorboard` EventAccumulator.
"""

from __future__ import annotations

import os
import socket
import struct
import time

import numpy as np

# -- CRC32C (Castagnoli), table-driven ---------------------------------------

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ (poly if c & 1 else 0)
        _CRC_TABLE.append(c)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    table = _CRC_TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- minimal protobuf encoding ------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(field: int, value: int) -> bytes:
    return _varint(field << 3) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def _field_bytes(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _field_double(field: int, value: float) -> bytes:
    return _varint((field << 3) | 1) + struct.pack("<d", value)


def _field_float(field: int, value: float) -> bytes:
    return _varint((field << 3) | 5) + struct.pack("<f", value)


def _encode_image(img_u8: np.ndarray) -> bytes:
    """Summary.Image proto from an (H, W, 3) uint8 RGB array (PNG-encoded)."""
    import cv2

    img_u8 = np.ascontiguousarray(np.asarray(img_u8, np.uint8))
    ok, png = cv2.imencode(".png", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
    if not ok:
        raise IOError("PNG encode failed")
    h, w = img_u8.shape[:2]
    return (
        _field_varint(1, h)
        + _field_varint(2, w)
        + _field_varint(3, 3)  # colorspace RGB
        + _field_bytes(4, png.tobytes())
    )


def _event(step: int, summary: bytes | None = None,
           file_version: str | None = None, wall_time: float | None = None):
    body = _field_double(1, time.time() if wall_time is None else wall_time)
    body += _field_varint(2, step)
    if file_version is not None:
        body += _field_bytes(3, file_version.encode())
    if summary is not None:
        body += _field_bytes(5, summary)
    return body


# -- the writer ----------------------------------------------------------------

class TBLogger:
    """Append-only TensorBoard event writer.

    >>> tb = TBLogger(logdir)
    >>> tb.scalar("loss/total", 1.23, step=10)
    >>> tb.image("eval/panel", panel_u8, step=10)
    >>> tb.flush()
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s.%d.v2" % (
            int(time.time()), socket.gethostname(), os.getpid()
        )
        self.path = os.path.join(logdir, fname)
        self._f = open(self.path, "ab")
        self._record(_event(0, file_version="brain.Event:2"))

    def _record(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def scalar(self, tag: str, value: float, step: int):
        val = _field_bytes(1, tag.encode()) + _field_float(2, float(value))
        self._record(_event(int(step), summary=_field_bytes(1, val)))

    def scalars(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass  # skip non-numeric entries

    def image(self, tag: str, img_u8: np.ndarray, step: int):
        val = _field_bytes(1, tag.encode()) + _field_bytes(4, _encode_image(img_u8))
        self._record(_event(int(step), summary=_field_bytes(1, val)))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
