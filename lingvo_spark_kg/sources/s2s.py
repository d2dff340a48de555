"""`.s2s` model file source/sink (S5): the reference's protobuf-net serialization.

A `.s2s` file is one protobuf message written by protobuf-net
(``ProtoBuf.Serializer.Serialize(fs, Model_4_ProtoBufSerializer)`` —
reference: Network/BaseSeq2SeqFramework.cs:186-192, load at 204-221; field layout
Models/Model_4_ProtoBufSerializer.cs:36-57; vocab sub-message
Models/Vocab_4_ProtoBufSerializer.cs:16-23). This module implements the wire format
directly (varint/length-delimited/fixed32|64 — no protobuf library needed):

 * field 1  Name2Weights        map<string, float[]>  (pair msg: 1=key, 2=floats;
                                 reader accepts packed AND unpacked float encoding)
 * field 3  EncoderEmbeddingDim varint
 * field 5  EncoderLayerDepth   varint
 * field 7  EncoderType         varint enum (0=BiLSTM, 1=Transformer —
                                 Utils/EncoderTypeEnums.cs:6-10)
 * field 8  HiddenDim           varint
 * field 10 MultiHeadNum        varint
 * field 11 SrcVocab            msg{1: map<string,int32>, 2: map<int32,string>, 3: bool}
 * field 12 TgtVocab            same shape
 * field 21 BestPrimaryScores   map<string, double>

Weight tensors are stored FLAT (protobuf float[]); shapes are reconstructed from the
hyperparameters exactly as the reference re-creates its network then loads by name
(SeqLabel.cs:70-90, LoadParameters). Reference weight names for the BiLSTM regimen:
``SrcEmbeddings``, ``BiLSTMEncoder.{Forward|Backward}_LSTM_{i}.m_Wxh|m_b|
m_layerNorm1.m_alpha|...``, ``FeedForward.m_Whd|m_Bd`` (BiEncoder.cs:30-36,
LSTMCell.cs:27-34, LayerNormalization.cs:17-18, SeqLabel.cs:73).
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass, field

import numpy as np

ENCODER_BILSTM = 0
ENCODER_TRANSFORMER = 1

# ---------------------------------------------------------------- wire primitives

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError(
                f"corrupt/truncated protobuf: varint at offset {pos} runs past "
                f"end of buffer (len {n})"
            )
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _write_varint(out: io.BytesIO, v: int) -> None:
    if v < 0:
        # protobuf-net would emit a 10-byte two's-complement varint; no valid model
        # field here (ids, dims, enums) is negative, so fail loudly instead of
        # spinning forever on Python's arithmetic right-shift of a negative int
        raise ValueError(f"negative varint not supported: {v}")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _write_tag(out: io.BytesIO, field_no: int, wire_type: int) -> None:
    _write_varint(out, (field_no << 3) | wire_type)


def _write_len_delimited(out: io.BytesIO, field_no: int, payload: bytes) -> None:
    _write_tag(out, field_no, _WT_LEN)
    _write_varint(out, len(payload))
    out.write(payload)


def _iter_fields(buf: memoryview):
    """Yield (field_no, wire_type, value) for one message. LEN values come back as
    memoryview; varints as int; fixed32/64 as raw 4/8 bytes.

    Every LEN/fixed payload is bounds-checked: a truncated or bit-rotted file raises
    ValueError at read time instead of silently yielding clamped (shortened)
    memoryviews that would parse into wrong vocab entries or score doubles."""
    pos = 0
    n = len(buf)

    def _need(end: int, what: str) -> None:
        if end > n:
            raise ValueError(
                f"corrupt/truncated protobuf: {what} at offset {pos} needs bytes "
                f"up to {end} but buffer ends at {n}"
            )

    while pos < n:
        key, pos = _read_varint(buf, pos)
        field_no, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            v, pos = _read_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            _need(pos + ln, f"LEN payload of field {field_no} ({ln} bytes)")
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == _WT_I32:
            _need(pos + 4, f"fixed32 of field {field_no}")
            v = bytes(buf[pos : pos + 4])
            pos += 4
        elif wt == _WT_I64:
            _need(pos + 8, f"fixed64 of field {field_no}")
            v = bytes(buf[pos : pos + 8])
            pos += 8
        else:  # pragma: no cover — groups (wt 3/4) never written by protobuf-net here
            raise ValueError(f"unsupported wire type {wt} for field {field_no}")
        yield field_no, wt, v


# ---------------------------------------------------------------- model message

@dataclass
class S2SModel:
    """Parsed Model_4_ProtoBufSerializer payload."""

    name2weights: dict[str, np.ndarray] = field(default_factory=dict)  # flat float32
    encoder_embedding_dim: int = 0
    encoder_layer_depth: int = 1
    encoder_type: int = ENCODER_BILSTM
    hidden_dim: int = 0
    multi_head_num: int = 0
    src_word2id: dict[str, int] = field(default_factory=dict)
    tgt_word2id: dict[str, int] = field(default_factory=dict)
    src_ignore_case: bool = False
    tgt_ignore_case: bool = False
    best_primary_scores: dict[str, float] = field(default_factory=dict)


def _parse_weight_pair(buf: memoryview) -> tuple[str, np.ndarray]:
    name = ""
    chunks: list[np.ndarray] = []
    for fno, wt, v in _iter_fields(buf):
        if fno == 1:
            name = bytes(v).decode("utf-8")
        elif fno == 2:
            if wt == _WT_LEN:  # packed floats
                chunks.append(np.frombuffer(bytes(v), dtype="<f4"))
            elif wt == _WT_I32:  # unpacked: one float per tagged element
                chunks.append(np.frombuffer(v, dtype="<f4"))
    vals = np.concatenate(chunks) if chunks else np.empty(0, np.float32)
    return name, vals.astype(np.float32, copy=False)


def _parse_str_int_map_entry(buf: memoryview) -> tuple[str, int]:
    k, val = "", 0
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            k = bytes(v).decode("utf-8")
        elif fno == 2:
            val = int(v)
            # protobuf encodes negative int32 as a 10-byte two's-complement varint;
            # fold back to signed instead of returning a huge positive id
            if val >= 1 << 63:
                val -= 1 << 64
    return k, val


def _parse_vocab(buf: memoryview) -> tuple[dict[str, int], bool]:
    word2id: dict[str, int] = {}
    ignore_case = False
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:  # _WordToIndex entry
            k, i = _parse_str_int_map_entry(v)
            word2id[k] = i
        elif fno == 3:
            ignore_case = bool(v)
        # fno 2 (_IndexToWord) is redundant with 1 — skipped
    return word2id, ignore_case


def read_s2s(data: bytes) -> S2SModel:
    m = S2SModel()
    for fno, _wt, v in _iter_fields(memoryview(data)):
        if fno == 1:
            name, w = _parse_weight_pair(v)
            m.name2weights[name] = w
        elif fno == 3:
            m.encoder_embedding_dim = int(v)
        elif fno == 5:
            m.encoder_layer_depth = int(v)
        elif fno == 7:
            m.encoder_type = int(v)
        elif fno == 8:
            m.hidden_dim = int(v)
        elif fno == 10:
            m.multi_head_num = int(v)
        elif fno == 11:
            m.src_word2id, m.src_ignore_case = _parse_vocab(v)
        elif fno == 12:
            m.tgt_word2id, m.tgt_ignore_case = _parse_vocab(v)
        elif fno == 21:
            # each dictionary entry is one repeated field-21 message {1: key, 2: value}
            key, score = "", 0.0
            for fno2, _wt2, v2 in _iter_fields(v):
                if fno2 == 1:
                    key = bytes(v2).decode("utf-8")
                elif fno2 == 2:
                    score = struct.unpack("<d", v2)[0]
            m.best_primary_scores[key] = score
        # other fields: NOT USED by the reference loader — ignored
    return m


def _write_vocab(word2id: dict[str, int], ignore_case: bool) -> bytes:
    out = io.BytesIO()
    for w, i in word2id.items():
        pair = io.BytesIO()
        _write_len_delimited(pair, 1, w.encode("utf-8"))
        _write_tag(pair, 2, _WT_VARINT)
        _write_varint(pair, i)
        _write_len_delimited(out, 1, pair.getvalue())
        # redundant _IndexToWord mirror, as protobuf-net emits for field 2
        rev = io.BytesIO()
        _write_tag(rev, 1, _WT_VARINT)
        _write_varint(rev, i)
        _write_len_delimited(rev, 2, w.encode("utf-8"))
        _write_len_delimited(out, 2, rev.getvalue())
    if ignore_case:
        _write_tag(out, 3, _WT_VARINT)
        _write_varint(out, 1)
    return out.getvalue()


def write_s2s(m: S2SModel) -> bytes:
    """Serialize in the same layout protobuf-net produces (unpacked float elements —
    protobuf-net's default repeated-primitive encoding)."""
    out = io.BytesIO()
    for name, w in m.name2weights.items():
        pair = io.BytesIO()
        _write_len_delimited(pair, 1, name.encode("utf-8"))
        flat = np.ascontiguousarray(w, dtype="<f4").ravel()
        raw = flat.tobytes()
        for off in range(0, len(raw), 4):
            _write_tag(pair, 2, _WT_I32)
            pair.write(raw[off : off + 4])
        _write_len_delimited(out, 1, pair.getvalue())
    for fno, val in ((3, m.encoder_embedding_dim), (5, m.encoder_layer_depth),
                     (7, m.encoder_type), (8, m.hidden_dim), (10, m.multi_head_num)):
        _write_tag(out, fno, _WT_VARINT)
        _write_varint(out, val)
    _write_len_delimited(out, 11, _write_vocab(m.src_word2id, m.src_ignore_case))
    _write_len_delimited(out, 12, _write_vocab(m.tgt_word2id, m.tgt_ignore_case))
    for key, score in m.best_primary_scores.items():
        entry = io.BytesIO()
        _write_len_delimited(entry, 1, key.encode("utf-8"))
        _write_tag(entry, 2, _WT_I64)
        entry.write(struct.pack("<d", score))
        _write_len_delimited(out, 21, entry.getvalue())
    return out.getvalue()


# ---------------------------------------------------------------- tagger bridge

def _vocab_from_word2id(word2id: dict[str, int]):
    from ..model.vocab import START_MEANING_INDEX, Vocab

    ordered = [w for w, i in sorted(word2id.items(), key=lambda kv: kv[1])
               if i >= START_MEANING_INDEX]
    return Vocab(ordered)


def to_tagger_model(m: S2SModel):
    """S2SModel → BiLSTM/Transformer tagger model with reference weight names mapped
    onto the NumPy forward pass's keys (shape reconstruction mirrors the reference's
    network re-creation before LoadParameters, SeqLabel.cs:70-90)."""
    if m.encoder_type == ENCODER_TRANSFORMER:
        return _to_transformer_model(m)
    from ..model.bilstm import BiLSTMTaggerModel

    emb_dim, hidden, depth = m.encoder_embedding_dim, m.hidden_dim, m.encoder_layer_depth
    src_vocab = _vocab_from_word2id(m.src_word2id)
    tgt_tags = [w for w, _i in sorted(m.tgt_word2id.items(), key=lambda kv: kv[1])]
    nw = m.name2weights

    def t(name: str, *shape: int) -> np.ndarray:
        w = nw[name]
        if w.size != int(np.prod(shape)):
            raise ValueError(f"{name}: got {w.size} floats, expected shape {shape}")
        return w.reshape(shape)

    weights: dict[str, np.ndarray] = {
        "emb": t("SrcEmbeddings", len(src_vocab), emb_dim),
        "ff.W": t("FeedForward.m_Whd", hidden * 2, len(tgt_tags)),
        "ff.b": t("FeedForward.m_Bd", len(tgt_tags)),
    }
    in_dim = emb_dim
    for layer in range(depth):
        for ours, theirs in (("fwd", "Forward"), ("bwd", "Backward")):
            rp = f"BiLSTMEncoder.{theirs}_LSTM_{layer}"
            p = f"enc.{layer}.{ours}"
            weights[f"{p}.Wxh"] = t(f"{rp}.m_Wxh", in_dim + hidden, hidden * 4)
            weights[f"{p}.b"] = t(f"{rp}.m_b", hidden * 4)
            weights[f"{p}.ln1.g"] = t(f"{rp}.m_layerNorm1.m_alpha", hidden * 4)
            weights[f"{p}.ln1.b"] = t(f"{rp}.m_layerNorm1.m_beta", hidden * 4)
            weights[f"{p}.ln2.g"] = t(f"{rp}.m_layerNorm2.m_alpha", hidden)
            weights[f"{p}.ln2.b"] = t(f"{rp}.m_layerNorm2.m_beta", hidden)
        in_dim = hidden * 2
    # this engine's additive CRF slot (not a reference tensor — the format is an
    # open name→float[] dict, so the extra names ride along): restoring them keeps
    # save→reload→identical-tags true for Viterbi-decoding models too
    if "crf.T" in nw:
        weights["crf.T"] = t("crf.T", len(tgt_tags), len(tgt_tags))
    if "crf.start" in nw:
        weights["crf.start"] = t("crf.start", len(tgt_tags))
    return BiLSTMTaggerModel(weights, src_vocab, tgt_tags, emb_dim, hidden, depth)


def _to_transformer_model(m: S2SModel):
    """Transformer mapping: the reference encoder uses sharedQKV MultiHeadAttention
    (one packed (inputDim, 3H) projection viewed as (…, 3, heads, D) and select-sliced
    — MultiHeadAttention.cs:61-62,84-88), so columns [0:H]=Q, [H:2H]=K, [2H:3H]=V,
    head-major inside each block — exactly our per-matrix reshape order. Layer names:
    TransformerEncoder.SelfAttn_i.{Q,Qb,W0,b0,layerNormQ.*},
    TransformerEncoder.PosFFN_i.{feedForwardLayer1|2.m_Whd|m_Bd, layerNorm2.*},
    TransformerEncoder.layerNorm.* (TransformerEncoder.cs:44-57); the sinusoidal
    PosEmbedding is static (isStaticWeights, SeqLabel.cs:84-85 — not serialized) and
    is regenerated. Requires hiddenDim == embeddingDim as the reference asserts
    (TransformerEncoder.cs:32).

    VALIDATION CAVEAT: the reference repo ships no model binaries and this sandbox
    has no .NET runtime to produce one, so the packing is derived from the reference
    source (the cited view/select lines) and verified self-inverse
    (from_tagger_model→to_tagger_model roundtrip to identical tags) — not against a
    reference-serialized byte fixture. If a real file ever disagrees, read_s2s still
    exposes the raw named tensors for re-mapping."""
    from ..model.transformer import TransformerTaggerModel, sinusoidal_position_embedding

    emb_dim, hidden, depth = m.encoder_embedding_dim, m.hidden_dim, m.encoder_layer_depth
    if hidden != emb_dim:
        raise ValueError(
            f"Transformer .s2s requires HiddenDim == EncoderEmbeddingDim "
            f"(got {hidden} != {emb_dim}) — TransformerEncoder.cs:32"
        )
    src_vocab = _vocab_from_word2id(m.src_word2id)
    tgt_tags = [w for w, _i in sorted(m.tgt_word2id.items(), key=lambda kv: kv[1])]
    nw = m.name2weights

    def t(name: str, *shape: int) -> np.ndarray:
        w = nw[name]
        if w.size != int(np.prod(shape)):
            raise ValueError(f"{name}: got {w.size} floats, expected shape {shape}")
        return w.reshape(shape)

    H = hidden
    weights: dict[str, np.ndarray] = {
        "emb": t("SrcEmbeddings", len(src_vocab), emb_dim),
        "ln_f.g": t("TransformerEncoder.layerNorm.m_alpha", H),
        "ln_f.b": t("TransformerEncoder.layerNorm.m_beta", H),
        "ff.W": t("FeedForward.m_Whd", H, len(tgt_tags)),
        "ff.b": t("FeedForward.m_Bd", len(tgt_tags)),
    }
    for layer in range(depth):
        a = f"TransformerEncoder.SelfAttn_{layer}"
        f_ = f"TransformerEncoder.PosFFN_{layer}"
        p = f"enc.{layer}"
        qkv = t(f"{a}.Q", emb_dim, 3 * H)
        qkv_b = t(f"{a}.Qb", 3 * H)
        for j, name in enumerate(("q", "k", "v")):
            weights[f"{p}.attn.{name}.W"] = qkv[:, j * H : (j + 1) * H]
            weights[f"{p}.attn.{name}.b"] = qkv_b[j * H : (j + 1) * H]
        weights[f"{p}.attn.o.W"] = t(f"{a}.W0", H, H)
        weights[f"{p}.attn.o.b"] = t(f"{a}.b0", H)
        weights[f"{p}.ln1.g"] = t(f"{a}.layerNormQ.m_alpha", H)
        weights[f"{p}.ln1.b"] = t(f"{a}.layerNormQ.m_beta", H)
        weights[f"{p}.ffn.W1"] = t(f"{f_}.feedForwardLayer1.m_Whd", H, 4 * H)
        weights[f"{p}.ffn.b1"] = t(f"{f_}.feedForwardLayer1.m_Bd", 4 * H)
        weights[f"{p}.ffn.W2"] = t(f"{f_}.feedForwardLayer2.m_Whd", 4 * H, H)
        weights[f"{p}.ffn.b2"] = t(f"{f_}.feedForwardLayer2.m_Bd", H)
        weights[f"{p}.ln2.g"] = t(f"{f_}.layerNorm2.m_alpha", H)
        weights[f"{p}.ln2.b"] = t(f"{f_}.layerNorm2.m_beta", H)
    max_len = 512
    weights["pos"] = sinusoidal_position_embedding(max_len + 2, emb_dim)
    n_heads = m.multi_head_num
    # fail at load time, not mid-predict on an executor: a zero MultiHeadNum means a
    # malformed file (reference default is 8, Options.cs), and heads must tile emb_dim
    if n_heads <= 0:
        raise ValueError(
            f"Transformer .s2s has MultiHeadNum={n_heads} — malformed file "
            "(the reference never writes 0; its default is 8)"
        )
    if emb_dim % n_heads != 0:
        raise ValueError(
            f"MultiHeadNum={n_heads} does not divide EncoderEmbeddingDim={emb_dim}"
        )
    return TransformerTaggerModel(weights, src_vocab, tgt_tags, emb_dim, n_heads,
                                  depth, max_len=max_len)


def from_tagger_model(model) -> S2SModel:
    """Tagger model → S2SModel with reference-convention names (model sink for
    interop fixtures; inverse of to_tagger_model). Dispatches on model type."""
    from ..model.transformer import TransformerTaggerModel

    if isinstance(model, TransformerTaggerModel):
        return _from_transformer_model(model)
    w = model.weights
    nw: dict[str, np.ndarray] = {
        "SrcEmbeddings": w["emb"],
        "FeedForward.m_Whd": w["ff.W"],
        "FeedForward.m_Bd": w["ff.b"],
    }
    for layer in range(model.depth):
        for ours, theirs in (("fwd", "Forward"), ("bwd", "Backward")):
            rp = f"BiLSTMEncoder.{theirs}_LSTM_{layer}"
            p = f"enc.{layer}.{ours}"
            nw[f"{rp}.m_Wxh"] = w[f"{p}.Wxh"]
            nw[f"{rp}.m_b"] = w[f"{p}.b"]
            nw[f"{rp}.m_layerNorm1.m_alpha"] = w[f"{p}.ln1.g"]
            nw[f"{rp}.m_layerNorm1.m_beta"] = w[f"{p}.ln1.b"]
            nw[f"{rp}.m_layerNorm2.m_alpha"] = w[f"{p}.ln2.g"]
            nw[f"{rp}.m_layerNorm2.m_beta"] = w[f"{p}.ln2.b"]
    for crf_key in ("crf.T", "crf.start"):  # additive Viterbi slot — see to_tagger_model
        if crf_key in w:
            nw[crf_key] = w[crf_key]
    return S2SModel(
        name2weights=nw,
        encoder_embedding_dim=model.emb_dim,
        encoder_layer_depth=model.depth,
        encoder_type=ENCODER_BILSTM,
        hidden_dim=model.hidden_dim,
        multi_head_num=0,
        src_word2id=dict(model.src_vocab.word2id),
        tgt_word2id={t: i for i, t in enumerate(model.tgt_tags)},
        best_primary_scores={"": 0.0},
    )


def _from_transformer_model(model) -> S2SModel:
    w = model.weights
    H = model.emb_dim
    nw: dict[str, np.ndarray] = {
        "SrcEmbeddings": w["emb"],
        "TransformerEncoder.layerNorm.m_alpha": w["ln_f.g"],
        "TransformerEncoder.layerNorm.m_beta": w["ln_f.b"],
        "FeedForward.m_Whd": w["ff.W"],
        "FeedForward.m_Bd": w["ff.b"],
    }
    for layer in range(model.depth):
        a = f"TransformerEncoder.SelfAttn_{layer}"
        f_ = f"TransformerEncoder.PosFFN_{layer}"
        p = f"enc.{layer}"
        nw[f"{a}.Q"] = np.concatenate(
            [w[f"{p}.attn.{n}.W"] for n in ("q", "k", "v")], axis=1)
        nw[f"{a}.Qb"] = np.concatenate(
            [w[f"{p}.attn.{n}.b"] for n in ("q", "k", "v")])
        nw[f"{a}.W0"] = w[f"{p}.attn.o.W"]
        nw[f"{a}.b0"] = w[f"{p}.attn.o.b"]
        nw[f"{a}.layerNormQ.m_alpha"] = w[f"{p}.ln1.g"]
        nw[f"{a}.layerNormQ.m_beta"] = w[f"{p}.ln1.b"]
        nw[f"{f_}.feedForwardLayer1.m_Whd"] = w[f"{p}.ffn.W1"]
        nw[f"{f_}.feedForwardLayer1.m_Bd"] = w[f"{p}.ffn.b1"]
        nw[f"{f_}.feedForwardLayer2.m_Whd"] = w[f"{p}.ffn.W2"]
        nw[f"{f_}.feedForwardLayer2.m_Bd"] = w[f"{p}.ffn.b2"]
        nw[f"{f_}.layerNorm2.m_alpha"] = w[f"{p}.ln2.g"]
        nw[f"{f_}.layerNorm2.m_beta"] = w[f"{p}.ln2.b"]
    return S2SModel(
        name2weights=nw,
        encoder_embedding_dim=model.emb_dim,
        encoder_layer_depth=model.depth,
        encoder_type=ENCODER_TRANSFORMER,
        hidden_dim=H,
        multi_head_num=model.n_heads,
        src_word2id=dict(model.src_vocab.word2id),
        tgt_word2id={t: i for i, t in enumerate(model.tgt_tags)},
        best_primary_scores={"": 0.0},
    )


def load_tagger(path: str):
    """Convenience: .s2s file → ready BiLSTM/Transformer tagger model."""
    with open(path, "rb") as f:
        return to_tagger_model(read_s2s(f.read()))
