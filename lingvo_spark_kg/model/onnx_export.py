"""ONNX exporter for the tagger encoders — hand-rolled protobuf, zero dependencies.

The production inference path (SURVEY.md §1.2) exports the encoder to ONNX and runs
one onnxruntime session per executor (model/backend.OnnxTagBackend). The ONNX file
format is protobuf, and sources/s2s.py already implements the wire encoding for the
reference's .s2s files — this module reuses those primitives to emit a real
``ModelProto`` (field numbers from the public onnx/onnx.proto; opset 17, default
domain only):

 * BiLSTM (reference architecture BiEncoder.cs:62-103): embedding Gather + ×√d Mul
   (TensorUtils.cs:65-69), per layer two ``Scan`` ops (forward / reverse directions)
   whose body is the LayerNorm-LSTM cell (LSTMCell.cs:39-65) built from
   Concat/MatMul/Add/LayerNormalization/Slice/Sigmoid/Tanh/Mul, classifier head
   MatMul+Add (SeqLabel.cs:171-173 — argmax decode stays in OnnxTagBackend);
 * Transformer (TransformerEncoder.cs:63-89): sinusoidal table as an initializer
   Slice'd to T, pad self-attention mask derived in-graph from ``ids == EOS_ID``
   (padding is the only source of EOS ids — BuildInTokens.PadSentences), pre-norm
   attention + FFN blocks with Reshape/Transpose head splits, Softmax, final
   LayerNormalization.

Graphs take one input ``ids`` int64 (B, T) and produce ``logits`` float32
(B, T, n_tags) — exactly the contract OnnxTagBackend._predict_batch speaks. The
NumPy graph executor (model/onnx_numpy.py) runs these bytes end-to-end in this
sandbox; on a production image the same bytes feed onnxruntime unchanged.
"""

from __future__ import annotations

import io
import struct

import numpy as np

from ..sources.s2s import _write_len_delimited, _write_tag, _write_varint, _WT_I32, _WT_VARINT

# TensorProto.DataType (onnx.proto)
DT_FLOAT, DT_INT64 = 1, 7
# AttributeProto.AttributeType
AT_FLOAT, AT_INT, AT_TENSOR, AT_GRAPH, AT_INTS = 1, 2, 4, 5, 7

OPSET = 17
IR_VERSION = 8


# ------------------------------------------------------------- proto builders

def _tensor(name: str, arr: np.ndarray) -> bytes:
    """TensorProto: dims=1, data_type=2, name=8, raw_data=9 (little-endian)."""
    if arr.dtype == np.float32:
        dt, raw = DT_FLOAT, np.ascontiguousarray(arr, dtype="<f4").tobytes()
    elif arr.dtype == np.int64:
        dt, raw = DT_INT64, np.ascontiguousarray(arr, dtype="<i8").tobytes()
    else:
        raise TypeError(f"unsupported initializer dtype {arr.dtype} for {name}")
    out = io.BytesIO()
    for d in arr.shape:
        _write_tag(out, 1, _WT_VARINT)
        _write_varint(out, d)
    _write_tag(out, 2, _WT_VARINT)
    _write_varint(out, dt)
    _write_len_delimited(out, 8, name.encode())
    _write_len_delimited(out, 9, raw)
    return out.getvalue()


def _vinfo(name: str, elem_type: int, dims: tuple) -> bytes:
    """ValueInfoProto{name=1, type=2}; dims entries: int (dim_value) or str (dim_param)."""
    shape = io.BytesIO()
    for dv in dims:
        d = io.BytesIO()
        if isinstance(dv, str):
            _write_len_delimited(d, 2, dv.encode())
        else:
            _write_tag(d, 1, _WT_VARINT)
            _write_varint(d, dv)
        _write_len_delimited(shape, 1, d.getvalue())
    tt = io.BytesIO()  # TypeProto.Tensor{elem_type=1, shape=2}
    _write_tag(tt, 1, _WT_VARINT)
    _write_varint(tt, elem_type)
    _write_len_delimited(tt, 2, shape.getvalue())
    tp = io.BytesIO()  # TypeProto{tensor_type=1}
    _write_len_delimited(tp, 1, tt.getvalue())
    vi = io.BytesIO()
    _write_len_delimited(vi, 1, name.encode())
    _write_len_delimited(vi, 2, tp.getvalue())
    return vi.getvalue()


def _attr(name: str, atype: int, payload_writer) -> bytes:
    out = io.BytesIO()
    _write_len_delimited(out, 1, name.encode())
    payload_writer(out)
    _write_tag(out, 20, _WT_VARINT)
    _write_varint(out, atype)
    return out.getvalue()


def _write_int64(out, v: int) -> None:
    # protobuf int64: negatives as 10-byte two's-complement varints (axis=-1 etc.)
    _write_varint(out, v & 0xFFFFFFFFFFFFFFFF if v < 0 else v)


def attr_i(name: str, v: int) -> bytes:
    def w(out):
        _write_tag(out, 3, _WT_VARINT)
        _write_int64(out, v)
    return _attr(name, AT_INT, w)


def attr_f(name: str, v: float) -> bytes:
    def w(out):
        _write_tag(out, 2, _WT_I32)
        out.write(struct.pack("<f", v))
    return _attr(name, AT_FLOAT, w)


def attr_ints(name: str, vals) -> bytes:
    def w(out):
        for v in vals:  # unpacked repeated int64 — legal proto3, parsers accept both
            _write_tag(out, 8, _WT_VARINT)
            _write_int64(out, v)
    return _attr(name, AT_INTS, w)


def attr_tensor(name: str, t: bytes) -> bytes:
    return _attr(name, AT_TENSOR, lambda out: _write_len_delimited(out, 5, t))


def attr_graph(name: str, g: bytes) -> bytes:
    return _attr(name, AT_GRAPH, lambda out: _write_len_delimited(out, 6, g))


def _node(op_type: str, inputs: list[str], outputs: list[str],
          attrs: tuple = ()) -> bytes:
    out = io.BytesIO()
    for n in inputs:
        _write_len_delimited(out, 1, n.encode())
    for n in outputs:
        _write_len_delimited(out, 2, n.encode())
    _write_len_delimited(out, 4, op_type.encode())
    for a in attrs:
        _write_len_delimited(out, 5, a)
    return out.getvalue()


def _graph(name: str, nodes: list[bytes], inputs: list[bytes], outputs: list[bytes],
           initializers: list[bytes] = ()) -> bytes:
    out = io.BytesIO()
    for n in nodes:
        _write_len_delimited(out, 1, n)
    _write_len_delimited(out, 2, name.encode())
    for t in initializers:
        _write_len_delimited(out, 5, t)
    for v in inputs:
        _write_len_delimited(out, 11, v)
    for v in outputs:
        _write_len_delimited(out, 12, v)
    return out.getvalue()


def _model(graph: bytes) -> bytes:
    out = io.BytesIO()
    _write_tag(out, 1, _WT_VARINT)
    _write_varint(out, IR_VERSION)
    _write_len_delimited(out, 2, b"lingvo_spark_kg")
    _write_len_delimited(out, 7, graph)
    opset = io.BytesIO()  # OperatorSetIdProto{domain=1 (default ""), version=2}
    _write_len_delimited(opset, 1, b"")
    _write_tag(opset, 2, _WT_VARINT)
    _write_varint(opset, OPSET)
    _write_len_delimited(out, 8, opset.getvalue())
    return out.getvalue()


def _i64(name: str, vals) -> bytes:
    return _tensor(name, np.asarray(vals, dtype=np.int64))


def _f32(name: str, arr) -> bytes:
    return _tensor(name, np.asarray(arr, dtype=np.float32))


# ------------------------------------------------------------- BiLSTM export

def _lstm_body(p: str, in_dim: int, H: int) -> bytes:
    """Scan body = one LayerNorm-LSTM step (LSTMCell.cs:39-65). Weights/index
    tensors are outer-scope references into the main graph's initializers; the body
    declares only its per-step inputs (h_in, c_in, x_t) and outputs
    (h_out, c_out, h_scan)."""
    nodes = [
        _node("Concat", [f"{p}.x_t", f"{p}.h_in"], [f"{p}.cat"], (attr_i("axis", 1),)),
        _node("MatMul", [f"{p}.cat", f"{p}.Wxh"], [f"{p}.mm"]),
        _node("Add", [f"{p}.mm", f"{p}.b"], [f"{p}.a"]),
        _node("LayerNormalization", [f"{p}.a", f"{p}.ln1.g", f"{p}.ln1.b"], [f"{p}.z"],
              (attr_i("axis", -1), attr_f("epsilon", 1e-5))),
        _node("Slice", [f"{p}.z", "i64.zero", "i64.h3", "i64.ax1"], [f"{p}.gz"]),
        _node("Sigmoid", [f"{p}.gz"], [f"{p}.gates"]),
        _node("Slice", [f"{p}.z", "i64.h3", "i64.h4", "i64.ax1"], [f"{p}.cwz"]),
        _node("Tanh", [f"{p}.cwz"], [f"{p}.cw"]),
        _node("Slice", [f"{p}.gates", "i64.zero", "i64.h1", "i64.ax1"], [f"{p}.i"]),
        _node("Slice", [f"{p}.gates", "i64.h1", "i64.h2", "i64.ax1"], [f"{p}.f"]),
        _node("Slice", [f"{p}.gates", "i64.h2", "i64.h3", "i64.ax1"], [f"{p}.o"]),
        _node("Mul", [f"{p}.f", f"{p}.c_in"], [f"{p}.fc"]),
        _node("Mul", [f"{p}.i", f"{p}.cw"], [f"{p}.icw"]),
        _node("Add", [f"{p}.fc", f"{p}.icw"], [f"{p}.c_out"]),
        _node("LayerNormalization", [f"{p}.c_out", f"{p}.ln2.g", f"{p}.ln2.b"],
              [f"{p}.ln2c"], (attr_i("axis", -1), attr_f("epsilon", 1e-5))),
        _node("Tanh", [f"{p}.ln2c"], [f"{p}.tc"]),
        _node("Mul", [f"{p}.o", f"{p}.tc"], [f"{p}.h_out"]),
        _node("Identity", [f"{p}.h_out"], [f"{p}.h_scan"]),
    ]
    inputs = [
        _vinfo(f"{p}.h_in", DT_FLOAT, ("B", H)),
        _vinfo(f"{p}.c_in", DT_FLOAT, ("B", H)),
        _vinfo(f"{p}.x_t", DT_FLOAT, ("B", in_dim)),
    ]
    outputs = [
        _vinfo(f"{p}.h_out", DT_FLOAT, ("B", H)),
        _vinfo(f"{p}.c_out", DT_FLOAT, ("B", H)),
        _vinfo(f"{p}.h_scan", DT_FLOAT, ("B", H)),
    ]
    return _graph(f"{p}.step", nodes, inputs, outputs)


def bilstm_to_onnx_bytes(model) -> bytes:
    """BiLSTMTaggerModel → ONNX ModelProto bytes (ids int64 (B,T) → logits float32
    (B,T,n_tags); greedy argmax lives in OnnxTagBackend, as in the reference's
    SeqLabel.cs:171-173). The NumPy session executes this bit-identically to
    model/bilstm.py's forward (same float32 kernels in the same order)."""
    if "crf.T" in model.weights:
        raise ValueError(
            "ONNX export covers the greedy-argmax decode only; a CRF/Viterbi model "
            "must run on the NumPy backend (the reference itself decodes greedily — "
            "SeqLabel.cs:171-173)"
        )
    w = model.weights
    H = model.hidden_dim
    K = len(model.tgt_tags)

    inits = [
        _f32("emb", w["emb"]),
        _f32("scale", np.float32(np.sqrt(model.emb_dim))),
        _f32("ff.W", w["ff.W"]),
        _f32("ff.b", w["ff.b"]),
        _i64("i64.zero", [0]),
        _i64("i64.h1", [H]),
        _i64("i64.h2", [2 * H]),
        _i64("i64.h3", [3 * H]),
        _i64("i64.h4", [4 * H]),
        _i64("i64.ax1", [1]),
        _i64("i64.idx0", [0]),
        _i64("i64.hvec", [H]),
    ]
    nodes = [
        # zero initial states with runtime batch size: Shape → Gather[0] → Concat[H]
        _node("Shape", ["ids"], ["ids.shape"]),
        _node("Gather", ["ids.shape", "i64.idx0"], ["b.vec"], (attr_i("axis", 0),)),
        _node("Concat", ["b.vec", "i64.hvec"], ["state.shape"], (attr_i("axis", 0),)),
        _node("ConstantOfShape", ["state.shape"], ["state0"],
              (attr_tensor("value", _f32("zerof", np.zeros(1, np.float32))),)),
        # embedding lookup ×√d (TensorUtils.cs:65-69), time-major for Scan
        _node("Gather", ["emb", "ids"], ["x.emb"], (attr_i("axis", 0),)),
        _node("Mul", ["x.emb", "scale"], ["x.scaled"]),
        _node("Transpose", ["x.scaled"], ["x.l0"], (attr_ints("perm", [1, 0, 2]),)),
    ]

    in_dim = model.emb_dim
    cur = "x.l0"
    for layer in range(model.depth):
        for d, reverse in (("fwd", 0), ("bwd", 1)):
            p = f"enc.{layer}.{d}"
            for suffix in ("Wxh", "b", "ln1.g", "ln1.b", "ln2.g", "ln2.b"):
                inits.append(_f32(f"{p}.{suffix}", w[f"{p}.{suffix}"]))
            nodes.append(_node(
                "Scan", ["state0", "state0", cur],
                [f"{p}.hN", f"{p}.cN", f"{p}.out"],
                (attr_graph("body", _lstm_body(p, in_dim, H)),
                 attr_i("num_scan_inputs", 1),
                 attr_ints("scan_input_directions", [reverse]),
                 attr_ints("scan_output_directions", [reverse])),
            ))
        nodes.append(_node("Concat", [f"enc.{layer}.fwd.out", f"enc.{layer}.bwd.out"],
                           [f"x.l{layer + 1}"], (attr_i("axis", 2),)))
        cur = f"x.l{layer + 1}"
        in_dim = 2 * H

    nodes += [
        _node("Transpose", [cur], ["y"], (attr_ints("perm", [1, 0, 2]),)),
        _node("MatMul", ["y", "ff.W"], ["y.mm"]),
        _node("Add", ["y.mm", "ff.b"], ["logits"]),
    ]
    g = _graph("bilstm_tagger", nodes,
               [_vinfo("ids", DT_INT64, ("B", "T"))],
               [_vinfo("logits", DT_FLOAT, ("B", "T", K))], inits)
    return _model(g)


# ------------------------------------------------------------- Transformer export

def transformer_to_onnx_bytes(model) -> bytes:
    """TransformerTaggerModel → ONNX bytes. The pad self-attention mask is derived
    in-graph from ``ids == 0`` (EOS_ID) — padding is the only source of EOS ids in
    the backend's batches (BuildInTokens.PadSentences semantics), so no second
    ``lengths`` input is needed. Matches the NumPy forward at tag level (the NumPy
    model's attention arithmetic promotes to float64 mid-graph; the ONNX graph stays
    float32 — noise orders of magnitude under the pinned models' argmax margins,
    verified exhaustively in tests)."""
    w = model.weights
    D = model.emb_dim
    Hh = model.n_heads
    hd = D // Hh
    K = len(model.tgt_tags)

    inits = [
        _f32("emb", w["emb"]),
        _f32("pos", w["pos"]),
        _f32("scale", np.float32(np.sqrt(D))),
        _f32("neg.big", np.float32(-1e9)),
        _f32("zero.f", np.float32(0.0)),
        _f32("inv.sqrt.hd", np.float32(1.0) / np.float32(np.sqrt(hd))),
        _i64("i64.zero", [0]),
        _i64("i64.one", [1]),
        _i64("i64.ax0", [0]),
        _i64("i64.pad.axes", [1, 2]),
        _i64("i64.head.shape", [0, 0, Hh, hd]),
        _i64("i64.merge.shape", [0, 0, D]),
        _i64("zero.i64", np.int64(0)),
        _f32("ln_f.g", w["ln_f.g"]), _f32("ln_f.b", w["ln_f.b"]),
        _f32("ff.W", w["ff.W"]), _f32("ff.b", w["ff.b"]),
    ]
    nodes = [
        # x = emb[ids]×√d + pos[:T]  (PositionEmbedding.cs:30-53)
        _node("Shape", ["ids"], ["ids.shape"]),
        _node("Gather", ["ids.shape", "i64.one"], ["t.vec"], (attr_i("axis", 0),)),
        _node("Gather", ["emb", "ids"], ["x.emb"], (attr_i("axis", 0),)),
        _node("Mul", ["x.emb", "scale"], ["x.scaled"]),
        _node("Slice", ["pos", "i64.zero", "t.vec", "i64.ax0"], ["pos.t"]),
        _node("Add", ["x.scaled", "pos.t"], ["x.0"]),
        # pad mask (B,1,1,T) from ids==EOS (ComputeGraphTensor BuildPadSelfMask analog)
        _node("Equal", ["ids", "zero.i64"], ["pad.bool"]),
        _node("Where", ["pad.bool", "neg.big", "zero.f"], ["pad.f"]),
        _node("Unsqueeze", ["pad.f", "i64.pad.axes"], ["mask"]),
    ]

    x = "x.0"
    for layer in range(model.depth):
        p = f"enc.{layer}"
        for nm in ("q", "k", "v", "o"):
            inits += [_f32(f"{p}.attn.{nm}.W", w[f"{p}.attn.{nm}.W"]),
                      _f32(f"{p}.attn.{nm}.b", w[f"{p}.attn.{nm}.b"])]
        for nm in ("ln1.g", "ln1.b", "ln2.g", "ln2.b", "ffn.W1", "ffn.b1",
                   "ffn.W2", "ffn.b2"):
            inits.append(_f32(f"{p}.{nm}", w[f"{p}.{nm}"]))

        nodes.append(_node("LayerNormalization", [x, f"{p}.ln1.g", f"{p}.ln1.b"],
                           [f"{p}.xn"], (attr_i("axis", -1), attr_f("epsilon", 1e-5))))
        for nm in ("q", "k", "v"):
            nodes += [
                _node("MatMul", [f"{p}.xn", f"{p}.attn.{nm}.W"], [f"{p}.{nm}.mm"]),
                _node("Add", [f"{p}.{nm}.mm", f"{p}.attn.{nm}.b"], [f"{p}.{nm}.p"]),
                _node("Reshape", [f"{p}.{nm}.p", "i64.head.shape"], [f"{p}.{nm}.r"]),
                _node("Transpose", [f"{p}.{nm}.r"], [f"{p}.{nm}"],
                      (attr_ints("perm", [0, 2, 1, 3]),)),
            ]
        nodes += [
            _node("Transpose", [f"{p}.k"], [f"{p}.kt"],
                  (attr_ints("perm", [0, 1, 3, 2]),)),
            _node("MatMul", [f"{p}.q", f"{p}.kt"], [f"{p}.qk"]),
            _node("Mul", [f"{p}.qk", "inv.sqrt.hd"], [f"{p}.qk.s"]),
            _node("Add", [f"{p}.qk.s", "mask"], [f"{p}.scores"]),
            _node("Softmax", [f"{p}.scores"], [f"{p}.att"], (attr_i("axis", -1),)),
            _node("MatMul", [f"{p}.att", f"{p}.v"], [f"{p}.ctx.h"]),
            _node("Transpose", [f"{p}.ctx.h"], [f"{p}.ctx.t"],
                  (attr_ints("perm", [0, 2, 1, 3]),)),
            _node("Reshape", [f"{p}.ctx.t", "i64.merge.shape"], [f"{p}.ctx"]),
            _node("MatMul", [f"{p}.ctx", f"{p}.attn.o.W"], [f"{p}.o.mm"]),
            _node("Add", [f"{p}.o.mm", f"{p}.attn.o.b"], [f"{p}.o.p"]),
            _node("Add", [x, f"{p}.o.p"], [f"{p}.x.att"]),
            _node("LayerNormalization",
                  [f"{p}.x.att", f"{p}.ln2.g", f"{p}.ln2.b"], [f"{p}.xn2"],
                  (attr_i("axis", -1), attr_f("epsilon", 1e-5))),
            _node("MatMul", [f"{p}.xn2", f"{p}.ffn.W1"], [f"{p}.ff1.mm"]),
            _node("Add", [f"{p}.ff1.mm", f"{p}.ffn.b1"], [f"{p}.ff1.p"]),
            _node("Relu", [f"{p}.ff1.p"], [f"{p}.ff1"]),
            _node("MatMul", [f"{p}.ff1", f"{p}.ffn.W2"], [f"{p}.ff2.mm"]),
            _node("Add", [f"{p}.ff2.mm", f"{p}.ffn.b2"], [f"{p}.ff2.p"]),
            _node("Add", [f"{p}.x.att", f"{p}.ff2.p"], [f"{p}.x.out"]),
        ]
        x = f"{p}.x.out"

    nodes += [
        _node("LayerNormalization", [x, "ln_f.g", "ln_f.b"], ["x.f"],
              (attr_i("axis", -1), attr_f("epsilon", 1e-5))),
        _node("MatMul", ["x.f", "ff.W"], ["y.mm"]),
        _node("Add", ["y.mm", "ff.b"], ["logits"]),
    ]
    g = _graph("transformer_tagger", nodes,
               [_vinfo("ids", DT_INT64, ("B", "T"))],
               [_vinfo("logits", DT_FLOAT, ("B", "T", K))], inits)
    return _model(g)


def to_onnx_bytes(model) -> bytes:
    """Dispatch on model type — the one-call export used by the pipeline tests."""
    from .transformer import TransformerTaggerModel

    if isinstance(model, TransformerTaggerModel):
        return transformer_to_onnx_bytes(model)
    return bilstm_to_onnx_bytes(model)


def to_onnx_bundle(model) -> bytes:
    """Model → the broadcastable OnnxTagBackend bundle (graph + vocab + tag set)."""
    from .backend import OnnxTagBackend

    return OnnxTagBackend.to_bundle(to_onnx_bytes(model), model.src_vocab,
                                    model.tgt_tags)
