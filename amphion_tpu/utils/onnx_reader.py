"""Minimal ONNX reader: protobuf wire parsing, no `onnx` package.

Reference capability: two reference components ship weights as ONNX
graphs rather than torch checkpoints — the UVR-MDX vocal separator
(`/root/reference/preprocessors/Emilia/models/separate_fast.py:60-70`)
and the DNSMOS P.835 quality model (`.../models/dnsmos.py:46-51`). To
ingest those into the native flax rebuilds (`models/mdx_net.py`,
`models/dnsmos.py`) we only need the graph *initializers* (the weight
tensors) plus enough node topology to map them onto module parameters —
a small subset of ONNX, parsed here directly from the protobuf wire
format (the encoding sibling of `utils/tbwriter.py`, which hand-encodes
Event protos the same way).

Supports: ModelProto → GraphProto → TensorProto initializers (raw_data
and repeated-field storage, f32/f16/f64/i8..i64 dtypes), NodeProto
topology with scalar/tensor attributes. Anything fancier (sparse
tensors, external data files, subgraphs) raises.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

# TensorProto.DataType → numpy
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long — corrupt protobuf")


def _parse_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message.

    value: int for wire 0, bytes for wire 2, 8-byte bytes for wire 1,
    4-byte bytes for wire 5.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fieldnum, wire = key >> 3, key & 7
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
        yield fieldnum, wire, val


def _zigzag(v: int) -> int:
    # ONNX int64 fields are plain varints (not zigzag); negatives arrive
    # as 2^64 complements
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    """TensorProto → (name, ndarray)."""
    dims: list[int] = []
    data_type = 1
    raw: bytes | None = None
    name = ""
    floats: list[float] = []
    ints: list[int] = []
    doubles: list[float] = []
    for f, wire, val in _parse_fields(buf):
        if f == 1:  # dims (repeated int64; may arrive packed)
            if wire == 0:
                dims.append(_zigzag(val))
            else:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    dims.append(_zigzag(v))
        elif f == 2:
            data_type = val
        elif f == 4:  # float_data, packed
            floats.extend(
                struct.unpack(f"<{len(val) // 4}f", val)
                if wire == 2 else struct.unpack("<f", val))
        elif f == 5 or f == 7:  # int32_data / int64_data, packed varints
            if wire == 0:
                ints.append(_zigzag(val))
            else:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    ints.append(_zigzag(v))
        elif f == 8:
            name = val.decode("utf-8")
        elif f == 9:
            raw = bytes(val)
        elif f == 10:  # double_data
            doubles.extend(
                struct.unpack(f"<{len(val) // 8}d", val)
                if wire == 2 else struct.unpack("<d", val))
        elif f == 13:  # data_location: 1 = external — not supported
            if val == 1:
                raise ValueError(
                    f"tensor {name!r} uses external data — unsupported")
    dtype = _DTYPES.get(data_type)
    if dtype is None:
        raise ValueError(f"tensor {name!r}: unsupported data_type {data_type}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif doubles:
        arr = np.asarray(doubles, np.float64)
    elif ints:
        arr = np.asarray(ints, dtype)
    else:
        arr = np.zeros(0, dtype)
    # empty dims on a 1-element tensor = ONNX scalar, shape ()
    return name, arr.reshape(dims)


def _parse_attribute(buf: bytes):
    """AttributeProto → (name, python value)."""
    name = ""
    out = None
    floats: list[float] = []
    ints: list[int] = []
    strings: list[bytes] = []
    for f, wire, val in _parse_fields(buf):
        if f == 1:
            name = val.decode("utf-8")
        elif f == 2:  # f
            out = struct.unpack("<f", val)[0]
        elif f == 3:  # i
            out = _zigzag(val)
        elif f == 4:  # s
            out = val
        elif f == 5:  # t (TensorProto)
            out = _parse_tensor(val)[1]
        elif f == 7:  # floats
            floats.extend(
                struct.unpack(f"<{len(val) // 4}f", val)
                if wire == 2 else struct.unpack("<f", val))
        elif f == 8:  # ints
            if wire == 0:
                ints.append(_zigzag(val))
            else:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    ints.append(_zigzag(v))
        elif f == 9:
            strings.append(bytes(val))
    if floats:
        out = floats
    elif ints:
        out = ints
    elif strings:
        out = strings
    return name, out


@dataclass
class OnnxNode:
    op_type: str
    name: str = ""
    inputs: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)
    attrs: dict = field(default_factory=dict)


@dataclass
class OnnxGraph:
    name: str = ""
    nodes: list[OnnxNode] = field(default_factory=list)
    initializers: dict[str, np.ndarray] = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)

    def weights_in_graph_order(self, op_types=("Conv", "ConvTranspose",
                                               "Gemm", "MatMul")):
        """[(node, [initializer arrays consumed by it])] in node order —
        the mapping substrate for architecture converters."""
        out = []
        for node in self.nodes:
            if node.op_type in op_types:
                ws = [self.initializers[i] for i in node.inputs
                      if i in self.initializers]
                if ws:
                    out.append((node, ws))
        return out


def _parse_node(buf: bytes) -> OnnxNode:
    node = OnnxNode(op_type="")
    for f, _wire, val in _parse_fields(buf):
        if f == 1:
            node.inputs.append(val.decode("utf-8"))
        elif f == 2:
            node.outputs.append(val.decode("utf-8"))
        elif f == 3:
            node.name = val.decode("utf-8")
        elif f == 4:
            node.op_type = val.decode("utf-8")
        elif f == 5:
            k, v = _parse_attribute(val)
            node.attrs[k] = v
    return node


def _value_info_name(buf: bytes) -> str:
    for f, _wire, val in _parse_fields(buf):
        if f == 1:
            return val.decode("utf-8")
    return ""


def _parse_graph(buf: bytes) -> OnnxGraph:
    g = OnnxGraph()
    for f, _wire, val in _parse_fields(buf):
        if f == 1:
            g.nodes.append(_parse_node(val))
        elif f == 2:
            g.name = val.decode("utf-8")
        elif f == 5:
            name, arr = _parse_tensor(val)
            g.initializers[name] = arr
        elif f == 11:
            g.inputs.append(_value_info_name(val))
        elif f == 12:
            g.outputs.append(_value_info_name(val))
    return g


def read_onnx(path: str | Path) -> OnnxGraph:
    """Parse an .onnx file → `OnnxGraph` (initializers + node topology)."""
    buf = Path(path).read_bytes()
    graph = None
    for f, _wire, val in _parse_fields(buf):
        if f == 7:  # ModelProto.graph
            graph = _parse_graph(val)
    if graph is None:
        raise ValueError(f"{path}: no GraphProto found — not an ONNX model?")
    return graph


def write_onnx(path: str | Path, graph: OnnxGraph) -> None:
    """Encode an `OnnxGraph` back to a (minimal, valid) .onnx file.

    Used by round-trip tests and by fixture builders — the converters can
    then be tested with hand-built graphs without the `onnx` package.
    """
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

    def _field(num: int, wire: int) -> bytes:
        return _varint((num << 3) | wire)

    def _ld(num: int, payload: bytes) -> bytes:
        return _field(num, 2) + _varint(len(payload)) + payload

    def _vi(num: int, v: int) -> bytes:
        return _field(num, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)

    _NP2ONNX = {np.dtype(v): k for k, v in _DTYPES.items()}

    def _tensor(name: str, arr: np.ndarray) -> bytes:
        body = b""
        for d in arr.shape:
            body += _vi(1, d)
        body += _vi(2, _NP2ONNX[arr.dtype])
        body += _ld(8, name.encode())
        body += _ld(9, np.ascontiguousarray(arr).tobytes())
        return body

    def _attr(name: str, v) -> bytes:
        body = _ld(1, name.encode())
        if isinstance(v, float):
            body += _field(2, 5) + struct.pack("<f", v) + _vi(20, 1)
        elif isinstance(v, int):
            body += _vi(3, v) + _vi(20, 2)
        elif isinstance(v, bytes):
            body += _ld(4, v) + _vi(20, 3)
        elif isinstance(v, list) and v and isinstance(v[0], int):
            for i in v:
                body += _vi(8, i)
            body += _vi(20, 7)
        elif isinstance(v, list) and v and isinstance(v[0], float):
            for x in v:
                body += _field(7, 5) + struct.pack("<f", x)
            body += _vi(20, 6)
        elif isinstance(v, np.ndarray):
            body += _ld(5, _tensor("", v)) + _vi(20, 4)
        else:
            raise TypeError(f"attr {name}: {type(v)}")
        return body

    def _node(n: OnnxNode) -> bytes:
        body = b""
        for i in n.inputs:
            body += _ld(1, i.encode())
        for o in n.outputs:
            body += _ld(2, o.encode())
        body += _ld(3, n.name.encode())
        body += _ld(4, n.op_type.encode())
        for k, v in n.attrs.items():
            body += _ld(5, _attr(k, v))
        return body

    gbody = b""
    for n in graph.nodes:
        gbody += _ld(1, _node(n))
    gbody += _ld(2, graph.name.encode())
    for name, arr in graph.initializers.items():
        gbody += _ld(5, _tensor(name, arr))
    for i in graph.inputs:
        gbody += _ld(11, _ld(1, i.encode()))
    for o in graph.outputs:
        gbody += _ld(12, _ld(1, o.encode()))
    model = _vi(1, 8) + _ld(7, gbody) + _ld(8, _vi(2, 17))  # ir v8, opset 17
    Path(path).write_bytes(model)
