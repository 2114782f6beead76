"""Minimal ONNX model loader — ModelProto parsing + a JAX interpreter.

The reference's onnx plugin (ext/onnx/gstonnxclient.cpp) hands the model
file to onnxruntime; here the model FILE is parsed directly (a varint
protobuf reader over the ONNX ModelProto subset below — the `onnx` python
package is not in this environment) and lowered to a jittable JAX
function, so inference fuses into the pipeline's window program like any
other element.

Supported graph surface (raise loudly otherwise):
- initializers: float32/float64/int64/int32 tensors (raw_data or the
  typed repeated fields)
- ops: Conv (groups/pads/strides/dilations), Gemm, MatMul, Add, Sub,
  Mul, Div, Relu, LeakyRelu, Sigmoid, Tanh, Softmax, Exp, Concat,
  Reshape, Flatten, Transpose, MaxPool, AveragePool,
  GlobalAveragePool, BatchNormalization (inference form), Identity,
  Constant, Clip, Shape+Gather+Unsqueeze (the static-shape idioms)
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# protobuf wire-format reader (varint subset; no proto schema compiler)
# ---------------------------------------------------------------------------


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's bytes."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:      # varint
            val, i = _varint(buf, i)
        elif wtype == 1:    # 64-bit
            val = buf[i:i + 8]
            i += 8
        elif wtype == 2:    # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wtype == 5:    # 32-bit
            val = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"onnx: unsupported wire type {wtype}")
        yield fnum, wtype, val


def _packed_varints(val) -> List[int]:
    if isinstance(val, int):
        return [val]
    out, i = [], 0
    while i < len(val):
        v, i = _varint(val, i)
        out.append(v)
    return out


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


class Tensor:
    def __init__(self, buf: bytes):
        self.dims: List[int] = []
        self.data_type = 1
        self.name = ""
        raw = b""
        floats: List[float] = []
        int64s: List[int] = []
        int32s: List[int] = []
        for fnum, wtype, val in _fields(buf):
            if fnum == 1:
                self.dims += [_signed(v) for v in _packed_varints(val)]
            elif fnum == 2:
                self.data_type = val
            elif fnum == 4:
                if wtype == 5:
                    floats.append(struct.unpack("<f", val)[0])
                else:
                    floats += list(np.frombuffer(val, "<f4"))
            elif fnum == 5:
                int32s += [_signed(v) for v in _packed_varints(val)]
            elif fnum == 7:
                int64s += [_signed(v) for v in _packed_varints(val)]
            elif fnum == 8:
                self.name = val.decode()
            elif fnum == 9:
                raw = val
        dt = {1: "<f4", 6: "<i4", 7: "<i8", 11: "<f8"}.get(self.data_type)
        if dt is None:
            raise ValueError(f"onnx: unsupported tensor data_type "
                             f"{self.data_type} ({self.name!r})")
        if raw:
            arr = np.frombuffer(raw, dt)
        elif floats:
            arr = np.array(floats, dt)
        elif int64s:
            arr = np.array(int64s, dt)
        elif int32s:
            arr = np.array(int32s, dt)
        else:
            arr = np.zeros(0, dt)
        self.array = arr.reshape(self.dims) if self.dims else arr


class Attribute:
    def __init__(self, buf: bytes):
        self.name = ""
        self.f = None
        self.i = None
        self.s = None
        self.t = None
        self.floats: List[float] = []
        self.ints: List[int] = []
        for fnum, wtype, val in _fields(buf):
            if fnum == 1:
                self.name = val.decode()
            elif fnum == 2:
                self.f = struct.unpack("<f", val)[0]
            elif fnum == 3:
                self.i = _signed(val)
            elif fnum == 4:
                self.s = val
            elif fnum == 5:
                self.t = Tensor(val)
            elif fnum == 7:
                if wtype == 5:
                    self.floats.append(struct.unpack("<f", val)[0])
                else:
                    self.floats += list(np.frombuffer(val, "<f4"))
            elif fnum == 8:
                self.ints += [_signed(v) for v in _packed_varints(val)]


class Node:
    def __init__(self, buf: bytes):
        self.inputs: List[str] = []
        self.outputs: List[str] = []
        self.op = ""
        self.name = ""
        self.attrs: Dict[str, Attribute] = {}
        for fnum, _, val in _fields(buf):
            if fnum == 1:
                self.inputs.append(val.decode())
            elif fnum == 2:
                self.outputs.append(val.decode())
            elif fnum == 3:
                self.name = val.decode()
            elif fnum == 4:
                self.op = val.decode()
            elif fnum == 5:
                a = Attribute(val)
                self.attrs[a.name] = a


def _vi_name_shape(buf: bytes):
    """ValueInfoProto -> (name, shape list or None)."""
    name, shape = "", None
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            name = val.decode()
        elif fnum == 2:  # TypeProto
            for f2, _, v2 in _fields(val):
                if f2 == 1:  # tensor_type
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:  # shape
                            shape = []
                            for f4, _, v4 in _fields(v3):
                                if f4 == 1:  # dim
                                    dv = 0
                                    for f5, _, v5 in _fields(v4):
                                        if f5 == 1:
                                            dv = _signed(v5)
                                    shape.append(dv)
    return name, shape


class Graph:
    def __init__(self, buf: bytes):
        self.nodes: List[Node] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.inputs: List[Tuple[str, list]] = []
        self.outputs: List[str] = []
        self.name = ""
        for fnum, _, val in _fields(buf):
            if fnum == 1:
                self.nodes.append(Node(val))
            elif fnum == 2:
                self.name = val.decode()
            elif fnum == 5:
                t = Tensor(val)
                self.initializers[t.name] = t.array
            elif fnum == 11:
                self.inputs.append(_vi_name_shape(val))
            elif fnum == 12:
                self.outputs.append(_vi_name_shape(val)[0])
        init = set(self.initializers)
        self.inputs = [(n, s) for n, s in self.inputs if n not in init]


def load_model(path_or_bytes) -> Graph:
    data = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
            else open(path_or_bytes, "rb").read())
    for fnum, _, val in _fields(bytes(data)):
        if fnum == 7:  # ModelProto.graph
            return Graph(val)
    raise ValueError("onnx: no graph in model file")


# ---------------------------------------------------------------------------
# JAX interpreter
# ---------------------------------------------------------------------------


def _conv(x, w, b, attrs, group):
    import jax.lax as lax
    strides = tuple(attrs.get("strides", [1, 1]))
    dil = tuple(attrs.get("dilations", [1, 1]))
    pads = attrs.get("pads", [0] * 4)
    pad = tuple((int(pads[i]), int(pads[i + len(pads) // 2]))
                for i in range(len(pads) // 2))
    y = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad, rhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group)
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


def _pool(x, attrs, kind):
    import jax.lax as lax
    import jax.numpy as jnp
    ks = tuple(attrs["kernel_shape"])
    strides = tuple(attrs.get("strides", list(ks)))
    pads = attrs.get("pads", [0] * 4)
    pad = ((0, 0), (0, 0)) + tuple(
        (int(pads[i]), int(pads[i + len(pads) // 2]))
        for i in range(len(pads) // 2))
    dims = (1, 1) + ks
    s = (1, 1) + strides
    if kind == "max":
        return lax.reduce_window(x, -jnp.inf, lax.max, dims, s, pad)
    sums = lax.reduce_window(x, 0.0, lax.add, dims, s, pad)
    counts = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, dims, s, pad)
    return sums / counts


def to_jax(graph: Graph):
    """Graph -> (fn(*inputs) -> [outputs], input_names, output_names)."""
    import jax.numpy as jnp

    input_names = [n for n, _ in graph.inputs]
    consts = {k: jnp.asarray(v) for k, v in graph.initializers.items()}
    np_consts = dict(graph.initializers)

    def fn(*args):
        env: Dict[str, object] = dict(consts)
        env.update(dict(zip(input_names, args)))
        for node in graph.nodes:
            at = {n: (a.i if a.i is not None else a.f if a.f is not None
                      else a.ints if a.ints else a.floats if a.floats
                      else a.t if a.t is not None else a.s)
                  for n, a in node.attrs.items()}
            ins = [env[i] if i else None for i in node.inputs]
            op = node.op
            if op == "Conv":
                out = _conv(ins[0], ins[1],
                            ins[2] if len(ins) > 2 else None, at,
                            int(at.get("group", 1)))
            elif op == "Gemm":
                a, b = ins[0], ins[1]
                if at.get("transA", 0):
                    a = a.T
                if at.get("transB", 0):
                    b = b.T
                out = at.get("alpha", 1.0) * (a @ b)
                if len(ins) > 2 and ins[2] is not None:
                    out = out + at.get("beta", 1.0) * ins[2]
            elif op == "MatMul":
                out = ins[0] @ ins[1]
            elif op in ("Add", "Sub", "Mul", "Div"):
                f = {"Add": jnp.add, "Sub": jnp.subtract,
                     "Mul": jnp.multiply, "Div": jnp.divide}[op]
                out = f(ins[0], ins[1])
            elif op == "Relu":
                out = jnp.maximum(ins[0], 0)
            elif op == "LeakyRelu":
                alpha = at.get("alpha", 0.01)
                out = jnp.where(ins[0] >= 0, ins[0], alpha * ins[0])
            elif op == "Sigmoid":
                out = 1.0 / (1.0 + jnp.exp(-ins[0]))
            elif op == "Tanh":
                out = jnp.tanh(ins[0])
            elif op == "Exp":
                out = jnp.exp(ins[0])
            elif op == "Softmax":
                axis = int(at.get("axis", -1))
                z = ins[0] - jnp.max(ins[0], axis=axis, keepdims=True)
                e = jnp.exp(z)
                out = e / jnp.sum(e, axis=axis, keepdims=True)
            elif op == "Clip":
                lo = ins[1] if len(ins) > 1 and ins[1] is not None \
                    else at.get("min", -jnp.inf)
                hi = ins[2] if len(ins) > 2 and ins[2] is not None \
                    else at.get("max", jnp.inf)
                out = jnp.clip(ins[0], lo, hi)
            elif op == "Concat":
                out = jnp.concatenate(ins, axis=int(at.get("axis", 0)))
            elif op == "Reshape":
                shape = np.asarray(np_consts.get(node.inputs[1],
                                                 ins[1])).tolist()
                out = ins[0].reshape([int(s) for s in shape])
            elif op == "Flatten":
                ax = int(at.get("axis", 1))
                lead = int(np.prod(ins[0].shape[:ax])) if ax else 1
                out = ins[0].reshape(lead, -1)
            elif op == "Transpose":
                out = jnp.transpose(ins[0], at.get("perm"))
            elif op == "MaxPool":
                out = _pool(ins[0], at, "max")
            elif op == "AveragePool":
                out = _pool(ins[0], at, "avg")
            elif op == "GlobalAveragePool":
                out = jnp.mean(ins[0], axis=(2, 3), keepdims=True)
            elif op == "BatchNormalization":
                x, scale, bias, mean, var = ins[:5]
                eps = at.get("epsilon", 1e-5)
                shp = (1, -1) + (1,) * (x.ndim - 2)
                out = ((x - mean.reshape(shp))
                       / jnp.sqrt(var.reshape(shp) + eps)
                       * scale.reshape(shp) + bias.reshape(shp))
            elif op == "Identity":
                out = ins[0]
            elif op == "Constant":
                t = node.attrs["value"].t
                out = jnp.asarray(t.array)
            else:
                raise ValueError(f"onnx: unsupported op {op!r} "
                                 f"(node {node.name!r})")
            env[node.outputs[0]] = out
        return [env[o] for o in graph.outputs]

    return fn, input_names, list(graph.outputs)
