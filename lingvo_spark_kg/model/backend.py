"""Inference-backend seam: how tagger weights become per-executor predict functions.

The Spark tag operator (operators/tag.py) is backend-agnostic: it broadcasts an opaque
``bytes`` blob and a *loader* that rehydrates it once per worker process into an
object with ``predict_tags(list[list[str]]) -> list[list[str]]``. Production mapping
(SURVEY.md §1.2/§2.3): export the encoder to ONNX, broadcast the ONNX bytes, and run
one onnxruntime ``InferenceSession`` per executor — ``OnnxTagBackend`` implements
exactly that seam (reference architecture being exported: BiEncoder.cs:62-103 /
TransformerEncoder.cs:63-89; greedy decode SeqLabel.cs:171-173).

The whole hop EXECUTES in this sandbox: ``model/onnx_export.py`` serializes the
BiLSTM/Transformer as a real ONNX ``ModelProto`` (hand-rolled protobuf, no
dependency) and ``model/onnx_numpy.py`` re-parses and runs the graph with NumPy
kernels — bit-identical logits to the native forward on the BiLSTM path
(tests/test_model_io.py::test_onnx_export_bilstm_bit_parity, operator end-to-end in
test_tag_operator_onnx_end_to_end). This sandbox has no onnxruntime, so the session
construction is injectable (``session_factory``): ``onnx_numpy.numpy_session_factory``
here, the default onnxruntime factory (clear ImportError when absent) in production —
same bundle bytes either way.
"""

from __future__ import annotations

import io
from typing import Callable, Protocol

import numpy as np

from .vocab import EOS_ID, UNK_ID, Vocab


class InferenceBackend(Protocol):
    def predict_tags(self, sentences: list[list[str]],
                     max_sent_length: int = 220) -> list[list[str]]: ...


def numpy_backend(encoder: str = "bilstm") -> Callable[[bytes], InferenceBackend]:
    """Loader for the NumPy forward-pass models (this environment's default)."""
    if encoder == "transformer":
        from .transformer import TransformerTaggerModel

        return TransformerTaggerModel.from_bytes
    from .bilstm import BiLSTMTaggerModel

    return BiLSTMTaggerModel.from_bytes


def onnx_backend(session_factory: Callable | None = None) -> Callable[[bytes], InferenceBackend]:
    """Loader for ONNX bundles (production image: onnxruntime present)."""
    return lambda blob: OnnxTagBackend.from_bytes(blob, session_factory=session_factory)


def probs_from_logits(logits: np.ndarray, tgt_tags: list[str],
                      sentence: list[str], word2id: dict
                      ) -> tuple[list[list[tuple[str, float]]], float]:
    """THE probability post-processing (SeqLabel.cs:175-218) — single copy shared by
    the NumPy models' ``predict_probs`` AND ``OnnxTagBackend.predict_probs``: since
    the exported graph's logits are bit-identical to the native forward (BiLSTM
    parity pinned in tests), running the SAME softmax/sort/round here makes the
    probability output backend-independent bit-for-bit. ``logits``: (T, n_tags)
    for the sentence; returns (per-token sorted [(class, prob)] lists,
    WordsInDictRatio)."""
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    probs = e / e.sum(axis=-1, keepdims=True)
    out = []
    for t in range(len(sentence)):
        ranked = sorted(zip(tgt_tags, probs[t].tolist()),
                        key=lambda kv: (-kv[1], kv[0]))
        out.append([(c, round(p, 6)) for c, p in ranked])
    in_dict = sum(1 for t in sentence if t in word2id)
    return out, round(in_dict / len(sentence), 6)


def long_sentence_chunk_bounds(n: int, max_len: int = 220) -> list[tuple[int, int]]:
    """THE chunk policy for an n-token (> max_len) sentence — single copy
    (SeqLabel.cs:259-311): overflow ≤10% of max_len → ONE truncated chunk
    [0, max_len) (the tail [max_len, n) gets no model prediction; the decode driver
    pads it with the last tag); otherwise contiguous max_len chunks covering every
    token. The demo-model trainer (model/demo.py) builds its training examples from
    these same bounds, so 'train on exactly the inputs the decoder presents' holds
    by construction."""
    if n - max_len <= max_len * 0.1:
        return [(0, max_len)]
    return [(off, min(off + max_len, n)) for off in range(0, n, max_len)]


def bucketed_chunked_predict(sentences: list[list[str]], predict_batch,
                             max_sent_length: int = 220,
                             bucket_by_length: bool = True) -> list[list[str]]:
    """THE decode driver (single copy — BiLSTM, Transformer and ONNX backends all
    delegate here): length bucketing + the reference's long-sentence chunking
    (>220 tokens chunked; ≤10% overflow truncated — SeqLabel.cs:259-311, default 220
    Options.cs:31). DELIBERATE DEVIATION: the reference returns NO tags for the
    truncated ≤10% tail (its Predict drops the overflow tokens); we pad the tail with
    the last predicted tag instead so every token keeps a tag and token/tag alignment
    survives downstream zips — the reference's behavior would desynchronize our
    per-token output rows.

    ``bucket_by_length=True`` = equal-length batches, so no sentence ever sees pad
    tokens — required for pad-mask-less encoders (the reference BiLSTM,
    BiEncoder.cs:62-103) to stay batch-composition-invariant. ``False`` = one padded
    batch of all normal-length sentences, for encoders with a pad attention mask
    (Transformer, Encoder.cs:91)."""
    out: list[list[str]] = [None] * len(sentences)  # type: ignore[list-item]
    normal_idx = []
    by_len: dict[int, list[int]] = {}
    long_idx = []
    for k, s in enumerate(sentences):
        if len(s) <= max_sent_length:
            normal_idx.append(k)
            by_len.setdefault(len(s), []).append(k)
        else:
            long_idx.append(k)
    if bucket_by_length:
        groups = [idxs for _, idxs in sorted(by_len.items())]
    else:
        groups = [normal_idx] if normal_idx else []
    for idxs in groups:
        for k, t in zip(idxs, predict_batch([sentences[k] for k in idxs])):
            out[k] = t
    for k in long_idx:
        s = sentences[k]
        n = len(s)
        tags = []
        for lo, hi in long_sentence_chunk_bounds(n, max_sent_length):
            tags.extend(predict_batch([s[lo:hi]])[0])
        if len(tags) < n:  # truncated-overflow tail: pad with the last tag
            tags = tags + [tags[-1]] * (n - len(tags))
        out[k] = tags
    return out


def _default_session_factory(onnx_bytes: bytes):
    try:
        import onnxruntime  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover — not present in this sandbox
        raise ImportError(
            "onnxruntime is required for the ONNX inference backend; this sandbox "
            "image ships without it — use the NumPy backend (numpy_backend()) or "
            "inject a session_factory"
        ) from e
    opts = onnxruntime.SessionOptions()
    opts.intra_op_num_threads = 1  # Spark task = the parallelism unit; don't oversubscribe
    return onnxruntime.InferenceSession(onnx_bytes, sess_options=opts,
                                        providers=["CPUExecutionProvider"])


class OnnxTagBackend:
    """ONNX execution backend: encode tokens via the bundled vocab, run the session on
    a padded (B, T) int64 ``ids`` input expecting (B, T, n_tags) ``logits``, greedy
    argmax decode (SeqLabel.cs:171-173), shared bucketing/chunking driver."""

    def __init__(self, session, vocab: Vocab, tgt_tags: list[str]):
        self.session = session
        self.vocab = vocab
        self.tgt_tags = list(tgt_tags)

    # bundle = npz{__onnx__: uint8 model bytes, __meta_tags__, __meta_vocab__} —
    # same meta conventions as the NumPy models' to_bytes (bilstm.py:86-101)
    @staticmethod
    def to_bundle(onnx_bytes: bytes, vocab: Vocab, tgt_tags: list[str]) -> bytes:
        buf = io.BytesIO()
        vocab_words = "\n".join(w for w, _ in sorted(vocab.word2id.items(),
                                                     key=lambda kv: kv[1]))
        np.savez(
            buf,
            __onnx__=np.frombuffer(onnx_bytes, dtype=np.uint8),
            __meta_tags__=np.frombuffer("\n".join(tgt_tags).encode(), dtype=np.uint8),
            __meta_vocab__=np.frombuffer(vocab_words.encode(), dtype=np.uint8),
        )
        return buf.getvalue()

    @staticmethod
    def from_bytes(blob: bytes, session_factory: Callable | None = None) -> "OnnxTagBackend":
        z = np.load(io.BytesIO(blob))
        tags = bytes(z["__meta_tags__"]).decode().split("\n")
        vocab_words = bytes(z["__meta_vocab__"]).decode().split("\n")
        onnx_bytes = bytes(z["__onnx__"])
        factory = session_factory or _default_session_factory
        return OnnxTagBackend(factory(onnx_bytes), Vocab(vocab_words[3:]), tags)

    def _predict_batch(self, sentences: list[list[str]]) -> list[list[str]]:
        if not sentences:
            return []
        lens = [len(s) for s in sentences]
        T = max(lens)
        if T == 0:
            return [[] for _ in sentences]
        ids = np.full((len(sentences), T), EOS_ID, dtype=np.int64)
        w2i = self.vocab.word2id
        for r, s in enumerate(sentences):
            for t, tok in enumerate(s):
                ids[r, t] = w2i.get(tok, UNK_ID)
        (logits,) = self.session.run(None, {"ids": ids})
        pred = np.argmax(logits, axis=2)
        tags = self.tgt_tags
        return [[tags[pred[r, t]] for t in range(lens[r])] for r in range(len(sentences))]

    def predict_tags(self, sentences: list[list[str]],
                     max_sent_length: int = 220) -> list[list[str]]:
        return bucketed_chunked_predict(sentences, self._predict_batch, max_sent_length)

    def predict_probs(self, sentence: list[str]
                      ) -> tuple[list[list[tuple[str, float]]], float]:
        """Per-class probabilities from the exported graph, batch-1 path — the
        logits come from the session (bit-parity with the native forward on the
        BiLSTM path), the softmax/sort/round is the shared ``probs_from_logits``,
        so the output is bit-identical to the NumPy model's ``predict_probs``
        (pinned in tests/test_round5.py)."""
        if not sentence:
            return [], 0.0
        w2i = self.vocab.word2id
        ids = np.array([[w2i.get(t, UNK_ID) for t in sentence]], dtype=np.int64)
        (logits,) = self.session.run(None, {"ids": ids})
        return probs_from_logits(logits[0], self.tgt_tags, sentence, w2i)
