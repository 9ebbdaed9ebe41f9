"""Minimal TensorBoard event-file writer — zero TF dependency.

The reference logs per-step scalars via ``tf.contrib.summary``
(eager_trainer.py:203-207) into ``result/<exp>/log`` and views them with the
``visual`` mode (main.py:34-36). This module writes the same on-disk format
(TFRecord-framed ``Event`` protobufs with masked CRC32C) by hand, so standard
TensorBoard can read our logs without TensorFlow being installed here.

Wire format implemented:
- TFRecord: u64 length | u32 masked_crc(length) | payload | u32 masked_crc(payload)
- Event proto: wall_time(1,double) step(2,int64) file_version(3,string)
  summary(5,msg); Summary { Value { tag(1,string) simple_value(2,float)
  image(4,msg) } }; Summary.Image { height(1) width(2) colorspace(3)
  encoded_image_string(4,bytes) } — the legacy image summary, which
  TensorBoard's image plugin still migrates and renders (beyond the
  reference, which logs scalars only — eager_trainer.py:203-207).
"""

from __future__ import annotations

import os
import struct
import time
from typing import Iterable, Tuple

# ------------------------------------------------------------------ crc32c --

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78  # Castagnoli, reflected
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ----------------------------------------------------------- proto encoding --


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


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _encode_value(tag: str, value: float) -> bytes:
    body = _len_delim(1, tag.encode()) + _key(2, 5) + struct.pack("<f", value)
    return body


def _encode_image_value(tag: str, height: int, width: int, colorspace: int, png: bytes) -> bytes:
    img = (
        _key(1, 0) + _varint(height)
        + _key(2, 0) + _varint(width)
        + _key(3, 0) + _varint(colorspace)
        + _len_delim(4, png)
    )
    return _len_delim(1, tag.encode()) + _len_delim(4, img)


def _encode_event(
    wall_time: float,
    step: int,
    scalars: Iterable[Tuple[str, float]] = (),
    file_version: str | None = None,
) -> bytes:
    ev = _key(1, 1) + struct.pack("<d", wall_time)
    ev += _key(2, 0) + _varint(step & 0xFFFFFFFFFFFFFFFF)
    if file_version is not None:
        ev += _len_delim(3, file_version.encode())
    vals = b"".join(_len_delim(1, _encode_value(t, v)) for t, v in scalars)
    if vals:
        ev += _len_delim(5, vals)
    return ev


# ------------------------------------------------------------------- writer --


class SummaryWriter:
    """Append-only scalar event writer, TensorBoard-compatible."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.littlegan.{os.getpid()}"
        self._f = open(os.path.join(logdir, fname), "ab", buffering=0)
        self._record(_encode_event(time.time(), 0, file_version="brain.Event:2"))

    def _record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(
            header
            + struct.pack("<I", _masked_crc(header))
            + payload
            + struct.pack("<I", _masked_crc(payload))
        )

    def scalar(self, tag: str, value: float, step: int) -> None:
        self.scalars([(tag, value)], step)

    def scalars(self, pairs: Iterable[Tuple[str, float]], step: int) -> None:
        pairs = [(t, float(v)) for t, v in pairs]
        if pairs:
            self._record(_encode_event(time.time(), step, pairs))

    def image(self, tag: str, array, step: int) -> None:
        """Log an HWC uint8 image (C in {1, 3, 4}) under TB's Images tab.

        PNG-encoded (lossless; TB accepts any format PIL writes). [-1,1]
        float batches should go through utils/image.py rescaling first —
        this method takes display-ready uint8 pixels.
        """
        import io

        import numpy as np
        from PIL import Image  # local import, same policy as utils/image.py

        arr = np.asarray(array)
        if arr.ndim != 3 or arr.dtype != np.uint8 or arr.shape[2] not in (1, 3, 4):
            raise ValueError(f"need HWC uint8 with 1/3/4 channels, got {arr.dtype} {arr.shape}")
        mode = {1: "L", 3: "RGB", 4: "RGBA"}[arr.shape[2]]
        buf = io.BytesIO()
        Image.fromarray(arr[:, :, 0] if mode == "L" else arr, mode).save(buf, format="PNG")
        value = _encode_image_value(tag, arr.shape[0], arr.shape[1], arr.shape[2], buf.getvalue())
        ev = _key(1, 1) + struct.pack("<d", time.time())
        ev += _key(2, 0) + _varint(step & 0xFFFFFFFFFFFFFFFF)
        ev += _len_delim(5, _len_delim(1, value))
        self._record(ev)

    def flush(self) -> None:
        os.fsync(self._f.fileno())

    def close(self) -> None:
        try:
            self.flush()
        finally:
            self._f.close()
