"""NumPy executor for the ONNX graphs emitted by model/onnx_export.py.

This is the sandbox stand-in for onnxruntime: it parses a ``ModelProto`` byte blob
(generic protobuf wire parsing reused from sources/s2s.py — the exporter and this
parser share no state, so a roundtrip is a real encode/decode check) and evaluates
the graph with NumPy kernels. Op coverage is exactly the set the exporter emits
(~20 ops); kernels use the same float32 expressions as model/bilstm.py so the
BiLSTM path is bit-identical to the native NumPy backend.

``numpy_session_factory`` satisfies OnnxTagBackend's ``session_factory`` seam: the
returned session exposes onnxruntime's ``run(output_names, feeds) -> [arrays]``
subset. Production swaps this factory for onnxruntime without touching the
operator, the bundle format, or the exporter.

Scan semantics follow the ONNX spec (opset 9+ Scan, no batch axis): inputs =
[initial states..., scan inputs...], body receives states + per-step slices and
returns updated states + scan outputs; ``scan_input_directions`` /
``scan_output_directions`` flip iteration/stacking per tensor. Subgraph nodes may
reference outer-scope names (the exporter's weight initializers live in the main
graph).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..sources.s2s import _iter_fields, _read_varint, _WT_I32, _WT_LEN, _WT_VARINT

_DTYPES = {1: "<f4", 6: "<i4", 7: "<i8", 9: "?", 11: "<f8"}


# ------------------------------------------------------------- proto parsing

def _signed64(v: int) -> int:
    """Fold a varint back to signed int64 (protobuf negatives are two's complement)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_varints(buf) -> list[int]:
    out = []
    pos = 0
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    n = len(mv)
    while pos < n:
        v, pos = _read_varint(mv, pos)
        out.append(_signed64(v))
    return out


def parse_tensor(buf) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = 1
    name = ""
    raw = None
    floats: list[float] = []
    i64s: list[int] = []
    for fno, wt, v in _iter_fields(memoryview(buf)):
        if fno == 1:
            dims.extend(_packed_varints(v) if wt == _WT_LEN else [v])
        elif fno == 2:
            dtype = v
        elif fno == 4:  # float_data (packed or unpacked)
            if wt == _WT_LEN:
                floats.extend(np.frombuffer(bytes(v), dtype="<f4").tolist())
            else:
                floats.extend(np.frombuffer(v, dtype="<f4").tolist())
        elif fno == 7:  # int64_data
            i64s.extend(_packed_varints(v) if wt == _WT_LEN else [v])
        elif fno == 8:
            name = bytes(v).decode()
        elif fno == 9:
            raw = bytes(v)
    np_dt = np.dtype(_DTYPES[dtype])
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dt)
    elif floats:
        arr = np.asarray(floats, dtype=np_dt)
    else:
        arr = np.asarray(i64s, dtype=np_dt)
    return name, arr.reshape(dims).copy()


def _parse_attr(buf) -> tuple[str, object]:
    name = ""
    val: object = None
    atype = 0
    ints: list[int] = []
    floats: list[float] = []
    for fno, wt, v in _iter_fields(memoryview(buf)):
        if fno == 1:
            name = bytes(v).decode()
        elif fno == 2:
            floats.append(float(np.frombuffer(v, dtype="<f4")[0]))
        elif fno == 3:
            ints.append(_signed64(v))
        elif fno == 4:
            val = bytes(v)
        elif fno == 5:
            val = parse_tensor(v)[1]
        elif fno == 6:
            val = parse_graph(v)
        elif fno == 7:
            if wt == _WT_LEN:
                floats.extend(np.frombuffer(bytes(v), dtype="<f4").tolist())
            else:
                floats.append(float(np.frombuffer(v, dtype="<f4")[0]))
        elif fno == 8:
            ints.extend(_packed_varints(v) if wt == _WT_LEN else [_signed64(v)])
        elif fno == 20:
            atype = v
    if val is None:
        if atype in (2,):      # INT
            val = ints[0]
        elif atype in (7,):    # INTS
            val = ints
        elif atype in (1,):    # FLOAT
            val = floats[0]
        elif atype in (6,):    # FLOATS
            val = floats
    return name, val


@dataclass
class Node:
    op: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict


@dataclass
class Graph:
    name: str = ""
    nodes: list[Node] = field(default_factory=list)
    inits: dict[str, np.ndarray] = field(default_factory=dict)
    input_names: list[str] = field(default_factory=list)
    output_names: list[str] = field(default_factory=list)


def _parse_node(buf) -> Node:
    inputs: list[str] = []
    outputs: list[str] = []
    op = ""
    attrs: dict = {}
    for fno, _wt, v in _iter_fields(memoryview(buf)):
        if fno == 1:
            inputs.append(bytes(v).decode())
        elif fno == 2:
            outputs.append(bytes(v).decode())
        elif fno == 4:
            op = bytes(v).decode()
        elif fno == 5:
            k, a = _parse_attr(v)
            attrs[k] = a
    return Node(op, inputs, outputs, attrs)


def _vinfo_name(buf) -> str:
    for fno, _wt, v in _iter_fields(memoryview(buf)):
        if fno == 1:
            return bytes(v).decode()
    return ""


def parse_graph(buf) -> Graph:
    g = Graph()
    for fno, _wt, v in _iter_fields(memoryview(buf)):
        if fno == 1:
            g.nodes.append(_parse_node(v))
        elif fno == 2:
            g.name = bytes(v).decode()
        elif fno == 5:
            name, arr = parse_tensor(v)
            g.inits[name] = arr
        elif fno == 11:
            g.input_names.append(_vinfo_name(v))
        elif fno == 12:
            g.output_names.append(_vinfo_name(v))
    return g


def parse_model(data: bytes) -> Graph:
    graph = None
    for fno, _wt, v in _iter_fields(memoryview(data)):
        if fno == 7:
            graph = parse_graph(v)
    if graph is None:
        raise ValueError("ModelProto has no graph (field 7)")
    return graph


# ------------------------------------------------------------- evaluation

def _layer_norm(x, g, b, eps):
    # identical expression to model/bilstm._layer_norm — bit-parity is the contract
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _slice(ins):
    data, starts, ends = ins[0], ins[1], ins[2]
    axes = ins[3] if len(ins) > 3 and ins[3] is not None else np.arange(len(starts))
    steps = ins[4] if len(ins) > 4 and ins[4] is not None else None
    sl = [slice(None)] * data.ndim
    for i, ax in enumerate(np.asarray(axes).tolist()):
        step = int(steps[i]) if steps is not None else 1
        sl[ax] = slice(int(starts[i]), int(ends[i]), step)
    return data[tuple(sl)]


def _reshape(data, shape):
    out = [int(data.shape[i]) if s == 0 else int(s) for i, s in enumerate(shape)]
    return data.reshape(out)


def _softmax(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def _eval_scan(node: Node, env: dict) -> None:
    body: Graph = node.attrs["body"]
    m = int(node.attrs["num_scan_inputs"])
    n_states = len(node.inputs) - m
    in_dirs = node.attrs.get("scan_input_directions") or [0] * m
    n_scan_out = len(node.outputs) - n_states
    out_dirs = node.attrs.get("scan_output_directions") or [0] * n_scan_out
    states = [env[n] for n in node.inputs[:n_states]]
    scans = [env[n] for n in node.inputs[n_states:]]
    t_len = scans[0].shape[0]
    collected: list[list] = [[] for _ in range(n_scan_out)]
    for t in range(t_len):
        local = dict(env)  # outer-scope visibility (spec: subgraphs may refer out)
        local.update(body.inits)
        step_ins = states + [s[t_len - 1 - t] if d else s[t]
                             for s, d in zip(scans, in_dirs)]
        for nm, val in zip(body.input_names, step_ins):
            local[nm] = val
        for n2 in body.nodes:
            _eval_node(n2, local)
        outs = [local[nm] for nm in body.output_names]
        states = outs[:n_states]
        for i, v in enumerate(outs[n_states:]):
            collected[i].append(v)
    scan_outs = [np.stack(c[::-1] if d else c, axis=0)
                 for c, d in zip(collected, out_dirs)]
    for nm, val in zip(node.outputs, states + scan_outs):
        env[nm] = val


def _eval_node(node: Node, env: dict) -> None:
    ins = [env[n] if n else None for n in node.inputs]
    op = node.op
    a = node.attrs
    if op == "MatMul":
        out = ins[0] @ ins[1]
    elif op == "Add":
        out = ins[0] + ins[1]
    elif op == "Mul":
        out = ins[0] * ins[1]
    elif op == "Sub":
        out = ins[0] - ins[1]
    elif op == "Div":
        out = ins[0] / ins[1]
    elif op == "Gather":
        out = np.take(ins[0], ins[1], axis=a.get("axis", 0))
    elif op == "Transpose":
        out = np.transpose(ins[0], a["perm"])
    elif op == "Concat":
        out = np.concatenate(ins, axis=a["axis"])
    elif op == "Slice":
        out = _slice(ins)
    elif op == "Sigmoid":
        out = 1.0 / (1.0 + np.exp(-ins[0]))
    elif op == "Tanh":
        out = np.tanh(ins[0])
    elif op == "Relu":
        out = np.maximum(ins[0], 0.0)
    elif op == "Softmax":
        out = _softmax(ins[0], a.get("axis", -1))
    elif op == "LayerNormalization":
        out = _layer_norm(ins[0], ins[1], ins[2],
                          np.float32(a.get("epsilon", 1e-5)))
    elif op == "Identity":
        out = ins[0]
    elif op == "Shape":
        out = np.asarray(ins[0].shape, dtype=np.int64)
    elif op == "ConstantOfShape":
        value = a.get("value")
        fill = value.reshape(-1)[0] if value is not None else np.float32(0.0)
        out = np.full(tuple(int(x) for x in ins[0]), fill,
                      dtype=value.dtype if value is not None else np.float32)
    elif op == "Equal":
        out = ins[0] == ins[1]
    elif op == "Where":
        out = np.where(ins[0], ins[1], ins[2])
    elif op == "Unsqueeze":
        out = ins[0]
        for ax in sorted(int(x) for x in ins[1]):
            out = np.expand_dims(out, ax)
    elif op == "Reshape":
        out = _reshape(ins[0], ins[1])
    elif op == "Scan":
        _eval_scan(node, env)
        return
    else:
        raise NotImplementedError(f"op {op} not implemented in the NumPy executor")
    env[node.outputs[0]] = out


class NumpyOnnxSession:
    """onnxruntime.InferenceSession stand-in over the parsed graph — the subset
    OnnxTagBackend uses: ``run(None, feeds) -> [outputs in graph order]``."""

    def __init__(self, onnx_bytes: bytes):
        self.graph = parse_model(onnx_bytes)

    def run(self, _output_names, feeds: dict) -> list[np.ndarray]:
        g = self.graph
        env: dict = dict(g.inits)
        for k, v in feeds.items():
            env[k] = np.asarray(v)
        for node in g.nodes:
            _eval_node(node, env)
        return [env[n] for n in g.output_names]


def numpy_session_factory(onnx_bytes: bytes) -> NumpyOnnxSession:
    return NumpyOnnxSession(onnx_bytes)
