"""Dependency-free TensorBoard scalar event writer.

The reference logs through tensorboardX (``utils/log_buffer.py:12-90``,
``train_scannetv2.py:124,238-239``); that package is not available here, so
this module writes the TensorBoard ``events.out.tfevents.*`` format
directly: TFRecord framing (little-endian length + masked CRC32C) around
hand-encoded ``tensorflow.Event`` protobufs carrying
``Summary{value {tag, simple_value}}``.  TensorBoard reads these files
natively — no tensorflow/tensorboardX import anywhere.

Wire format references: tensorflow/core/util/event.proto (Event: 1=wall_time
double, 2=step int64, 3=file_version string, 5=summary), summary.proto
(Summary: repeated 1=Value; Value: 1=tag string, 2=simple_value float),
tensorflow/core/lib/hash/crc32c (Castagnoli polynomial + mask).
"""
from __future__ import annotations

import os
import socket
import struct
import time

__all__ = ["TBEventWriter", "crc32c", "masked_crc"]

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78  # Castagnoli, reflected
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        _CRC_TABLE.append(c)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _bytes_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _double_field(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _float_field(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _int_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _scalar_event(tag: str, value: float, step: int, wall_time: float) -> bytes:
    value_msg = _bytes_field(1, tag.encode()) + _float_field(2, float(value))
    summary = _bytes_field(1, value_msg)  # repeated Summary.Value
    return _double_field(1, wall_time) + _int_field(2, int(step)) + _bytes_field(5, summary)


def _version_event(wall_time: float) -> bytes:
    return _double_field(1, wall_time) + _bytes_field(3, b"brain.Event:2")


class TBEventWriter:
    """Minimal ``SummaryWriter``-alike: ``add_scalar(tag, value, step)``."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        host = socket.gethostname()
        path = os.path.join(log_dir, f"events.out.tfevents.{time.time():.6f}.{host}")
        self._f = open(path, "ab")
        self.path = path
        self._record(_version_event(time.time()))
        self._f.flush()

    def _record(self, event: bytes):
        header = struct.pack("<Q", len(event))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc(header)))
        self._f.write(event)
        self._f.write(struct.pack("<I", masked_crc(event)))

    def add_scalar(self, tag: str, value: float, step: int):
        self._record(_scalar_event(tag, value, step, time.time()))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.flush()
        self._f.close()
