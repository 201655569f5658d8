"""Pure-python TensorBoard event writer (scalar summaries).

Reference capability: the trainers log through HF Accelerate's TensorBoard
tracker (`models/base/new_trainer.py:683-692`). No TensorBoard/TF package
is available here, so this writes the tfevents wire format directly:
TFRecord framing (length + masked CRC32C) around hand-encoded `Event`
protobufs — scalar summaries only, readable by standard TensorBoard.
"""

from __future__ import annotations

import struct
import time
from pathlib import Path

# -- CRC32C (Castagnoli), table-driven ---------------------------------------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


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
    # Summary.Value: tag=1 (string), simple_value=2 (float)
    val = _bytes(1, tag.encode()) + _float(2, float(value))
    summary = _bytes(1, val)  # Summary.value = 1 (repeated)
    # Event: wall_time=1 (double), step=2 (int64), summary=5
    return _double(1, wall_time) + _int64(2, int(step)) + _bytes(5, summary)


def _version_event(wall_time: float) -> bytes:
    # Event.file_version = 3 (string)
    return _double(1, wall_time) + _bytes(3, b"brain.Event:2")


class SummaryWriter:
    """Append scalar summaries to a `events.out.tfevents.*` file."""

    def __init__(self, log_dir: str | Path):
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        import socket

        name = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._f = open(log_dir / name, "ab")
        self._write_record(_version_event(time.time()))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(_scalar_event(tag, value, step, time.time()))

    def add_scalars(self, scalars: dict, step: int) -> None:
        for tag, value in scalars.items():
            self.add_scalar(tag, float(value), step)

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def read_scalars(path: str | Path) -> list[tuple[int, str, float]]:
    """Decode (step, tag, value) triples back out of a tfevents file —
    the round-trip check used by tests (and a TensorBoard-free inspector)."""
    out = []
    data = Path(path).read_bytes()
    pos = 0
    while pos + 12 <= len(data):
        (n,) = struct.unpack_from("<Q", data, pos)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == _masked_crc(data[pos:pos + 8]), "header crc mismatch"
        rec = data[pos + 12:pos + 12 + n]
        (dcrc,) = struct.unpack_from("<I", data, pos + 12 + n)
        assert dcrc == _masked_crc(rec), "data crc mismatch"
        pos += 12 + n + 4
        out.extend(_decode_event(rec))
    return out


def _decode_event(rec: bytes):
    step, summary = 0, b""
    for field, wire, val in _iter_fields(rec):
        if field == 2 and wire == 0:
            step = val
        elif field == 5 and wire == 2:
            summary = val
    out = []
    for field, wire, val in _iter_fields(summary):
        if field == 1 and wire == 2:  # Summary.Value
            tag, sv = "", None
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == 2:
                    tag = v2.decode()
                elif f2 == 2 and w2 == 5:
                    (sv,) = struct.unpack("<f", v2)
            if sv is not None:
                out.append((step, tag, sv))
    return out


def _iter_fields(data: bytes):
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(data, pos)
        elif wire == 1:
            val, pos = data[pos:pos + 8], pos + 8
        elif wire == 2:
            n, pos = _read_varint(data, pos)
            val, pos = data[pos:pos + n], pos + n
        elif wire == 5:
            val, pos = data[pos:pos + 4], pos + 4
        else:  # pragma: no cover
            raise ValueError(f"wire type {wire}")
        yield field, wire, val


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out, shift = 0, 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
