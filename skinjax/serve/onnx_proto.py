"""Minimal ONNX protobuf writer/reader (no onnx / protobuf dependency).

The reference ships ONNX export (export_model_onnx.py:32-46, opset 13,
dynamic batch). This container has neither ``onnx`` nor ``onnxruntime``, so
skinjax serializes ModelProto bytes directly against the onnx.proto3 wire
schema. The reader exists so tests can parse the emitted bytes back and
execute them with the numpy evaluator (onnx_runtime.py) — parity is proven
on the serialized artifact, not an in-memory stand-in.

Wire format: each field = varint key ((field_number << 3) | wire_type) +
payload; wire types used: 0 varint, 2 length-delimited, 5 fixed32.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

# onnx TensorProto.DataType
F32, U8, I8, I32, I64, BOOL, F16, F64, BF16 = 1, 2, 3, 6, 7, 9, 10, 11, 16

NP_TO_ONNX = {
    np.dtype(np.float32): F32, np.dtype(np.uint8): U8, np.dtype(np.int8): I8,
    np.dtype(np.int32): I32, np.dtype(np.int64): I64, np.dtype(np.bool_): BOOL,
    np.dtype(np.float16): F16, np.dtype(np.float64): F64,
}
ONNX_TO_NP = {v: k for k, v in NP_TO_ONNX.items()}

# AttributeProto.AttributeType
A_FLOAT, A_INT, A_STRING, A_TENSOR, A_FLOATS, A_INTS, A_STRINGS = (
    1, 2, 3, 4, 6, 7, 8,
)


# -- varint / field encoding --------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1
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


def f_varint(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(int(value))


def f_bytes(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def f_str(field: int, s: str) -> bytes:
    return f_bytes(field, s.encode())


def f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


# -- message builders ---------------------------------------------------------

def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b""
    for d in arr.shape:
        out += f_varint(1, d)
    out += f_varint(2, NP_TO_ONNX[arr.dtype])
    out += f_str(8, name)
    out += f_bytes(9, arr.tobytes())  # raw_data
    return out


def _tensor_shape(shape: Sequence, dynamic_batch: bool) -> bytes:
    dims = b""
    for i, d in enumerate(shape):
        if i == 0 and dynamic_batch:
            dim = f_str(2, "batch")  # dim_param
        else:
            dim = f_varint(1, int(d))  # dim_value
        dims += f_bytes(1, dim)
    return dims


def value_info(name: str, elem_type: int, shape: Sequence,
               dynamic_batch: bool = False) -> bytes:
    tensor_type = f_varint(1, elem_type) + f_bytes(
        2, _tensor_shape(shape, dynamic_batch)
    )
    type_proto = f_bytes(1, tensor_type)
    return f_str(1, name) + f_bytes(2, type_proto)


def attribute(name: str, value: Any) -> bytes:
    out = f_str(1, name)
    if isinstance(value, bool):
        out += f_varint(3, int(value)) + f_varint(20, A_INT)
    elif isinstance(value, int):
        out += f_varint(3, value) + f_varint(20, A_INT)
    elif isinstance(value, float):
        out += f_float(2, value) + f_varint(20, A_FLOAT)
    elif isinstance(value, str):
        out += f_bytes(4, value.encode()) + f_varint(20, A_STRING)
    elif isinstance(value, np.ndarray):
        out += f_bytes(5, tensor_proto("", value)) + f_varint(20, A_TENSOR)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            for v in value:
                out += f_varint(8, v)
            out += f_varint(20, A_INTS)
        elif all(isinstance(v, float) for v in value):
            for v in value:
                out += f_float(7, v)
            out += f_varint(20, A_FLOATS)
        else:
            raise TypeError(f"attribute list {name}: {value!r}")
    else:
        raise TypeError(f"attribute {name}: {value!r}")
    return out


def node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
         name: str = "", **attrs) -> bytes:
    out = b""
    for i in inputs:
        out += f_str(1, i)
    for o in outputs:
        out += f_str(2, o)
    if name:
        out += f_str(3, name)
    out += f_str(4, op_type)
    for k, v in attrs.items():
        out += f_bytes(5, attribute(k, v))
    return out


def graph(nodes: Sequence[bytes], name: str, inputs: Sequence[bytes],
          outputs: Sequence[bytes], initializers: Sequence[bytes]) -> bytes:
    out = b""
    for n in nodes:
        out += f_bytes(1, n)
    out += f_str(2, name)
    for t in initializers:
        out += f_bytes(5, t)
    for i in inputs:
        out += f_bytes(11, i)
    for o in outputs:
        out += f_bytes(12, o)
    return out


def model(graph_bytes: bytes, opset: int = 13,
          producer: str = "skinjax") -> bytes:
    opset_id = f_str(1, "") + f_varint(2, opset)
    out = f_varint(1, 8)  # ir_version 8
    out += f_str(2, producer)
    out += f_str(3, "0.2")
    out += f_bytes(7, graph_bytes)
    out += f_bytes(8, opset_id)
    return out


# -- reader (for tests / the numpy evaluator) ---------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_message(buf: bytes) -> Dict[int, List]:
    """Parse one protobuf message into {field_number: [raw values]}."""
    fields: Dict[int, List] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        elif wire == 1:
            val = struct.unpack("<d", buf[pos:pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"wire type {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    f = parse_message(buf)
    dims = [int(d) for d in f.get(1, [])]
    dtype = ONNX_TO_NP[f[2][0]]
    name = f.get(8, [b""])[0].decode()
    if 9 in f:
        arr = np.frombuffer(f[9][0], dtype=dtype).reshape(dims)
    elif 4 in f:  # float_data
        arr = np.asarray(f[4], dtype=np.float32).reshape(dims)
    elif 7 in f:  # int64_data
        arr = np.asarray([_signed64(v) for v in f[7]], np.int64).reshape(dims)
    else:
        arr = np.zeros(dims, dtype)
    return name, arr


def parse_attribute(buf: bytes) -> Tuple[str, Any]:
    f = parse_message(buf)
    name = f[1][0].decode()
    atype = f.get(20, [0])[0]
    if atype == A_INT:
        return name, _signed64(f[3][0])
    if atype == A_FLOAT:
        return name, f[2][0]
    if atype == A_STRING:
        return name, f[4][0].decode()
    if atype == A_TENSOR:
        return name, parse_tensor(f[5][0])[1]
    if atype == A_INTS:
        return name, [_signed64(v) for v in f.get(8, [])]
    if atype == A_FLOATS:
        return name, list(f.get(7, []))
    raise ValueError(f"attr type {atype}")


class OnnxNode:
    def __init__(self, buf: bytes):
        f = parse_message(buf)
        self.inputs = [b.decode() for b in f.get(1, [])]
        self.outputs = [b.decode() for b in f.get(2, [])]
        self.name = f.get(3, [b""])[0].decode()
        self.op_type = f[4][0].decode()
        self.attrs = dict(parse_attribute(a) for a in f.get(5, []))


class OnnxModel:
    def __init__(self, buf: bytes):
        m = parse_message(buf)
        self.ir_version = m.get(1, [0])[0]
        self.producer = m.get(2, [b""])[0].decode()
        ops = [parse_message(o) for o in m.get(8, [])]
        self.opset = int(ops[0][2][0]) if ops else 0
        g = parse_message(m[7][0])
        self.graph_name = g.get(2, [b""])[0].decode()
        self.nodes = [OnnxNode(n) for n in g.get(1, [])]
        self.initializers = dict(parse_tensor(t) for t in g.get(5, []))
        self.inputs = [self._vi(v) for v in g.get(11, [])]
        self.outputs = [self._vi(v) for v in g.get(12, [])]

    @staticmethod
    def _vi(buf: bytes) -> Dict[str, Any]:
        f = parse_message(buf)
        name = f[1][0].decode()
        type_proto = parse_message(f[2][0])
        tensor_type = parse_message(type_proto[1][0])
        elem = tensor_type.get(1, [0])[0]
        shape: List[Any] = []
        if 2 in tensor_type:
            shp = parse_message(tensor_type[2][0])
            for dim_buf in shp.get(1, []):
                d = parse_message(dim_buf)
                if 1 in d:
                    shape.append(int(d[1][0]))
                elif 2 in d:
                    shape.append(d[2][0].decode())
        return {"name": name, "elem_type": elem, "shape": shape}
