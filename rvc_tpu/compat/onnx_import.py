"""Minimal ONNX initializer extraction — no onnx/onnxruntime dependency.

The reference executes MDX separation models as ONNX graphs through
onnxruntime (lib/mdx.py:81-84). The TPU build reimplements the network
natively (models/mdx_net.py) and only needs the *weights* out of the ONNX
file. This module walks the protobuf wire format directly (ModelProto →
graph(7) → initializer(5) → TensorProto{dims(1), data_type(2),
float_data(4), name(8), raw_data(9)}), so extraction works in the
zero-dependency environment.
"""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    6: np.int32,
    7: np.int64,
    10: np.float16,
    11: np.float64,
}


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_tensor(buf: memoryview) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = np.float32
    name = ""
    raw = None
    floats: list[float] = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            dims.append(val)  # type: ignore[arg-type]
        elif field == 1 and wire == 2:  # packed dims
            pos = 0
            mv = val  # type: ignore[assignment]
            while pos < len(mv):
                d, pos = _read_varint(mv, pos)
                dims.append(d)
        elif field == 2:
            dtype = _DTYPES.get(val, np.float32)  # type: ignore[arg-type]
        elif field == 4 and wire == 2:  # packed float_data
            floats.extend(struct.unpack(f"<{len(val) // 4}f", bytes(val)))
        elif field == 4 and wire == 5:
            floats.append(struct.unpack("<f", val)[0])  # type: ignore[arg-type]
        elif field == 8:
            name = bytes(val).decode()
        elif field == 9:
            raw = bytes(val)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    else:
        arr = np.asarray(floats, dtype=np.float32)
    if dims:
        arr = arr.reshape(dims)
    return name, arr


def read_onnx_initializers(path: str) -> dict[str, np.ndarray]:
    """All initializer tensors from an .onnx file, keyed by name."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    out: dict[str, np.ndarray] = {}
    for field, wire, val in _fields(data):
        if field == 7 and wire == 2:  # ModelProto.graph
            for gfield, gwire, gval in _fields(val):  # type: ignore[arg-type]
                if gfield == 5 and gwire == 2:  # GraphProto.initializer
                    name, arr = _parse_tensor(gval)  # type: ignore[arg-type]
                    out[name] = arr
    return out
