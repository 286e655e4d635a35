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

import re
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
    return read_onnx_graph(path)[0]


def _parse_node(buf: memoryview) -> tuple[str, list[str], list[str]]:
    """NodeProto → (op_type, inputs, outputs)."""
    op = ""
    inputs: list[str] = []
    outputs: list[str] = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 2:
            inputs.append(bytes(val).decode())
        elif field == 2 and wire == 2:
            outputs.append(bytes(val).decode())
        elif field == 4 and wire == 2:
            op = bytes(val).decode()
    return op, inputs, outputs


def read_onnx_graph(path: str):
    """(initializers, nodes) from an .onnx file; nodes are
    (op_type, inputs, outputs) in stored (topological/trace) order."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    inits: dict[str, np.ndarray] = {}
    nodes: list[tuple[str, list[str], list[str]]] = []
    for field, wire, val in _fields(data):
        if field == 7 and wire == 2:  # ModelProto.graph
            for gfield, gwire, gval in _fields(val):  # type: ignore[arg-type]
                if gfield == 5 and gwire == 2:  # GraphProto.initializer
                    name, arr = _parse_tensor(gval)  # type: ignore[arg-type]
                    inits[name] = arr
                elif gfield == 1 and gwire == 2:  # GraphProto.node
                    nodes.append(_parse_node(gval))  # type: ignore[arg-type]
    return inits, nodes


# ---------------------------------------------------------------------------
# auto-mapping extracted weights onto models/mdx_net.ConvTDFNetTrim
# ---------------------------------------------------------------------------

# kuielab/UVR torch module names → our flax paths (same patterns as the
# TFC-TDF parity mapping in compat/torch_import.build_tree usage)
_MDX_RENAMES = [
    (r"blocks\.(\d+)\.tfc1\.(\d+)", r"blocks_\1_tfc1_\2"),
    (r"blocks\.(\d+)\.tfc2\.(\d+)", r"blocks_\1_tfc2_\2"),
    (r"blocks\.(\d+)\.tdf\.(\d+)", r"blocks_\1_tdf_\2"),
    (r"blocks\.(\d+)\.shortcut", r"blocks_\1_shortcut"),
    (r"^ds_dense\.(\d+)\.", r"ds_dense_\1."),
    (r"^us_dense\.(\d+)\.", r"us_dense_\1."),
    (r"^ds\.(\d+)\.(\d+\.)?", r"ds_\1."),
    (r"^us\.(\d+)\.(\d+\.)?", r"us_\1."),
    (r"^first_conv\.(\d+\.)?", r"first_conv."),
    (r"^final_conv\.(\d+\.)?", r"final_conv."),
]


def _flatten_with_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten_with_paths(v, prefix + (k,)))
    else:
        out.append((prefix, tree))
    return out


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convtdf_params_from_onnx(path: str, model=None) -> dict:
    """UVR MDX ``.onnx`` → flax params for models/mdx_net.ConvTDFNetTrim.

    Two strategies (reference runs these graphs via onnxruntime,
    lib/mdx.py:81-84; we need the weights in our module tree):

    1. *Name-based*: torchscript exports keep state_dict names as
       initializer names — regex-map them onto our module paths.
    2. *Structural*: names were lost (``onnx::Conv_123`` style) — walk the
       graph nodes in trace order, bucket parameter tensors by op category
       (Conv / ConvTranspose / MatMul-Gemm / norm scale+bias), and zip each
       bucket against our param leaves in module-creation order, requiring
       exact shape agreement at every step.

    `model` (a ConvTDFNetTrim instance) is required for the structural
    path to know the expected shapes; pass it when available.
    """
    from .torch_import import build_tree

    inits, nodes = read_onnx_graph(path)
    named = sum(1 for k in inits if "." in k and not k.startswith("onnx::"))
    if inits and named >= max(1, int(0.8 * len(inits))):
        tree = build_tree(inits, renames=_MDX_RENAMES,
                          skip=(r"num_batches_tracked",))
        return {"params": tree}

    if model is None:
        raise ValueError(
            "initializer names are anonymized; pass model=ConvTDFNetTrim(...) "
            "for structural mapping")

    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, model.dim_f, 4), jnp.float32)))
    by_path = dict(_flatten_with_paths(shapes["params"]))

    def categorize_mine(path_, shape):
        leaf = path_[-1]
        if len(shape) == 4:
            is_tr = re.fullmatch(r"us_\d+", path_[-2]) and leaf == "weight"
            return "convtr" if is_tr else "conv"
        if len(shape) == 2:
            return "linear"
        return {"weight": "nscale", "bias": "nbias", "running_mean": "nmean",
                "running_var": "nvar"}.get(leaf, "other")

    # Explicit module-creation order mirroring ConvTDFNetTrim.__call__ —
    # pytree dict iteration is sorted, NOT creation-ordered, so the trace
    # order must be reconstructed from the architecture.
    def ordered_paths():
        n = model.num_blocks // 2
        has_norm = model.norm != "none"
        norm_leaves = (("weight",), ("bias",)) if has_norm else ()
        stats = ("running_mean", "running_var") if model.norm == "BatchNorm" else ()

        def dense(prefix):
            for b in range(model.l):
                yield (*prefix, f"blocks_{b}_shortcut", "weight")
                for sub in ("tfc1_0",):
                    for leaf in ("weight", "bias", *stats):
                        yield (*prefix, f"blocks_{b}_{sub}", leaf)
                yield (*prefix, f"blocks_{b}_tfc1_2", "weight")
                for leaf in ("weight", "bias", *stats):
                    yield (*prefix, f"blocks_{b}_tdf_0", leaf)
                yield (*prefix, f"blocks_{b}_tdf_2", "weight")
                for leaf in ("weight", "bias", *stats):
                    yield (*prefix, f"blocks_{b}_tdf_3", leaf)
                yield (*prefix, f"blocks_{b}_tdf_5", "weight")
                for leaf in ("weight", "bias", *stats):
                    yield (*prefix, f"blocks_{b}_tfc2_0", leaf)
                yield (*prefix, f"blocks_{b}_tfc2_2", "weight")

        yield ("first_conv", "weight")
        for i in range(n):
            yield from dense((f"ds_dense_{i}",))
            yield (f"ds_{i}", "weight")
        yield from dense(("mid_dense",))
        for i in range(n):
            yield (f"us_{i}", "weight")
            yield from dense((f"us_dense_{i}",))
        yield ("final_conv", "weight")

    ordered = list(ordered_paths())
    missing = [p for p in ordered if p not in by_path]
    extra = set(by_path) - set(ordered)
    if missing or extra:
        raise ValueError(f"param-order model mismatch: missing {missing[:3]}, "
                         f"extra {sorted(extra)[:3]}")

    mine: dict[str, list] = {}
    for p in ordered:
        shape = by_path[p].shape
        mine.setdefault(categorize_mine(p, shape), []).append((p, shape))

    theirs: dict[str, list[np.ndarray]] = {}
    for op, inputs, _ in nodes:
        ws = [inits[i] for i in inputs if i in inits]
        if op == "Conv" and ws:
            theirs.setdefault("conv", []).append(ws[0])
        elif op == "ConvTranspose" and ws:
            theirs.setdefault("convtr", []).append(ws[0])
        elif op in ("MatMul", "Gemm") and ws:
            w = ws[0]
            theirs.setdefault("linear", []).append(w)
        elif op in ("BatchNormalization",) and len(ws) >= 4:
            theirs.setdefault("nscale", []).append(ws[0])
            theirs.setdefault("nbias", []).append(ws[1])
            theirs.setdefault("nmean", []).append(ws[2])
            theirs.setdefault("nvar", []).append(ws[3])
        elif op == "Mul" and ws and ws[0].ndim >= 1:
            theirs.setdefault("nscale", []).append(ws[0].reshape(-1))
        elif op == "Add" and ws and ws[0].ndim >= 1:
            theirs.setdefault("nbias", []).append(ws[0].reshape(-1))

    tree: dict = {}
    for cat, entries in mine.items():
        avail = theirs.get(cat, [])
        if len(avail) != len(entries):
            raise ValueError(
                f"structural mapping failed: {len(avail)} ONNX tensors vs "
                f"{len(entries)} params in category {cat!r}")
        for (p, shape), arr in zip(entries, avail):
            a = np.asarray(arr, np.float32)
            if cat == "linear" and a.shape[::-1] == tuple(shape):
                a = a.T  # ONNX MatMul stores (in, out); ours is (out, in)
            if a.shape != tuple(shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(p)}: onnx {a.shape} vs "
                    f"expected {tuple(shape)}")
            _set_path(tree, p, a)
    return {"params": tree}
