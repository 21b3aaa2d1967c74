"""Dependency-free TensorBoard scalar writer.

The reference pins ``tensorboard``/``tensorboardX`` in requirements.txt:134,136
but never imports either (SURVEY §5 observability: the rebuild target is an
*optional* TensorBoard dump). This module writes standard
``events.out.tfevents.*`` files readable by stock TensorBoard without
depending on tensorflow/tensorboard at runtime:

  * TFRecord framing: little-endian uint64 length + masked-CRC32C(length)
    + payload + masked-CRC32C(payload);
  * hand-encoded ``Event``/``Summary`` protobuf messages (only the scalar
    subset: wall_time=1, step=2, file_version=3, summary=5 with
    Value{tag=1, simple_value=2});
  * CRC32C (Castagnoli) table-driven, with TensorFlow's rotate+offset mask.

Scope is scalars only — the training CLIs log losses/throughput. Images and
histograms stay in the JSON/JSONL accumulators (eval/metrics_io.py), which
remain the source of truth for the reference's METRIC_*/ZS_* protocol.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
from typing import Optional

# ---------------------------------------------------------------- crc32c ---

_CRC_TABLE = []
_POLY = 0x82F63B78  # Castagnoli, reflected


def _build_table():
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ _POLY if crc & 1 else crc >> 1
        _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TensorFlow's record mask: rotate right by 15, add a constant."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------- protobuf ----


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


def _double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _scalar_event(tag: str, value: float, step: int, wall_time: float) -> bytes:
    # Summary.Value { tag = 1 (string), simple_value = 2 (float) }
    val = _bytes(1, tag.encode("utf-8")) + _float(2, float(value))
    summary = _bytes(1, val)  # Summary { repeated Value value = 1 }
    # Event { wall_time = 1 (double), step = 2 (int64), summary = 5 }
    return _double(1, wall_time) + _int64(2, int(step)) + _bytes(5, summary)


def _version_event(wall_time: float) -> bytes:
    # Event { wall_time = 1, file_version = 3 (string) }
    return _double(1, wall_time) + _bytes(3, b"brain.Event:2")


def _record(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", masked_crc32c(header)) + payload
            + struct.pack("<I", masked_crc32c(payload)))


# --------------------------------------------------------------- writer ----


class SummaryWriter:
    """Minimal ``tensorboardX``-shaped scalar writer.

    >>> w = SummaryWriter("/tmp/tb/run1")
    >>> w.add_scalar("train/loss", 4.67, step=1)
    >>> w.close()

    Thread-safe; appends are buffered and flushed on ``flush``/``close`` and
    every ``flush_every`` scalars. Files are standard TFRecord event files —
    ``tensorboard --logdir /tmp/tb`` renders them.
    """

    def __init__(self, logdir: str, flush_every: int = 64):
        os.makedirs(logdir, exist_ok=True)
        host = socket.gethostname().split(".")[0] or "host"
        self.path = os.path.join(
            logdir, f"events.out.tfevents.{int(time.time())}.{host}.{os.getpid()}")
        self._lock = threading.Lock()
        self._buf = bytearray(_record(_version_event(time.time())))
        self._pending = 0
        self._flush_every = max(1, flush_every)
        self._file = open(self.path, "ab")

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: Optional[float] = None):
        rec = _record(_scalar_event(tag, value, step,
                                    time.time() if wall_time is None
                                    else wall_time))
        with self._lock:
            self._buf += rec
            self._pending += 1
            if self._pending >= self._flush_every:
                self._flush_locked()

    def _flush_locked(self):
        if self._buf:
            self._file.write(bytes(self._buf))
            self._file.flush()
            self._buf = bytearray()
            self._pending = 0

    def flush(self):
        with self._lock:
            self._flush_locked()

    def close(self):
        with self._lock:
            self._flush_locked()
            if not self._file.closed:
                self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------- reader ---
# Independent decode path used by tests (and handy for quick inspection
# without TensorBoard).


def read_scalars(path: str):
    """Decode an event file back into ``[(tag, value, step, wall_time), ...]``,
    verifying both CRCs of every record."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        header = data[pos:pos + 8]
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        if masked_crc32c(header) != hcrc:
            raise ValueError(f"bad header crc at byte {pos}")
        payload = data[pos + 12:pos + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, pos + 12 + length)
        if masked_crc32c(payload) != pcrc:
            raise ValueError(f"bad payload crc at byte {pos}")
        pos += 16 + length
        out.extend(_decode_event(payload))
    return out


def _read_varint(buf: bytes, pos: int):
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _decode_event(payload: bytes):
    wall = 0.0
    step = 0
    scalars = []
    for field, wire, val in _fields(payload):
        if field == 1 and wire == 1:
            (wall,) = struct.unpack("<d", val)
        elif field == 2 and wire == 0:
            step = val if val < 1 << 63 else val - (1 << 64)
        elif field == 5 and wire == 2:  # Summary
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 2:  # Value
                    tag, sval = None, None
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 2:
                            tag = v3.decode("utf-8")
                        elif f3 == 2 and w3 == 5:
                            (sval,) = struct.unpack("<f", v3)
                    if tag is not None and sval is not None:
                        scalars.append((tag, sval, step, wall))
    return scalars
