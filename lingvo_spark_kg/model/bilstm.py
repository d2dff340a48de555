"""Vectorized NumPy forward pass of the reference sequence-labeling network.

Architecture re-implemented from the reference (cited for parity, no code copied):
 * embedding lookup + ×√dim scale (Network/TensorUtils.cs:21-76, scale at 65-69;
   call site Network/Encoder.cs:106);
 * depth × {forward, backward} LayerNorm-LSTM cells — per step:
   concat(x, h_prev) → affine → LayerNorm → split 3H/H → sigmoid gates + tanh write →
   c = f⊙c_prev + i⊙ĉ → h = o⊙tanh(LayerNorm(c))
   (Network/Layers/LSTMCell.cs:39-65); fwd/bwd outputs concatenated per layer
   (Network/BiEncoder.cs:62-103 — note the reference indexes layer-0 forward outputs for
   deeper layers, an apparent accumulation bug; we implement standard stacking);
 * classifier head: affine (2H → n_tags) (Network/Layers/FeedForwardLayer.cs:37-42,
   created Applications/SeqLabel.cs:73);
 * row softmax + per-token argmax — greedy decode, NO CRF/Viterbi in the reference
   (SeqLabel.cs:133,171-173; BeamSearch exists but is never called by SeqLabel).

Weights are plain float32 ndarrays in a dict (the analog of the reference's
Name2Weights, Models/Model.cs:12-60) so the whole model broadcasts to executors as one
NumPy archive; each executor process runs the forward pass over Arrow-batch-sized
padded id matrices — the reference's multi-device data-parallel predict
(BaseSeq2SeqFramework.cs:630-703) is replaced by Spark partition parallelism.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from .vocab import EOS_ID, Vocab


LN_EPS = 1e-5  # shared with the training backward pass (model/train.py)


def _layer_norm(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + LN_EPS) * gamma + beta


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


@dataclass
class BiLSTMTaggerModel:
    """Pinned deterministic model: reference BiLSTM architecture, seeded weights."""

    weights: dict[str, np.ndarray]
    src_vocab: Vocab
    tgt_tags: list[str]
    emb_dim: int
    hidden_dim: int
    depth: int
    max_ending_length: int = 4

    # ---- construction ----
    @staticmethod
    def create_pinned(src_vocab: Vocab, tgt_tags: list[str], emb_dim: int = 32,
                      hidden_dim: int = 32, depth: int = 1, seed: int = 42,
                      max_ending_length: int = 4) -> "BiLSTMTaggerModel":
        rng = np.random.default_rng(seed)
        w: dict[str, np.ndarray] = {}

        def uniform(*shape: int) -> np.ndarray:
            scale = np.sqrt(6.0 / sum(shape))
            return rng.uniform(-scale, scale, size=shape).astype(np.float32)

        w["emb"] = uniform(len(src_vocab), emb_dim)
        in_dim = emb_dim
        for layer in range(depth):
            for d in ("fwd", "bwd"):
                p = f"enc.{layer}.{d}"
                w[f"{p}.Wxh"] = uniform(in_dim + hidden_dim, hidden_dim * 4)
                w[f"{p}.b"] = np.zeros((hidden_dim * 4,), dtype=np.float32)
                w[f"{p}.ln1.g"] = np.ones((hidden_dim * 4,), dtype=np.float32)
                w[f"{p}.ln1.b"] = np.zeros((hidden_dim * 4,), dtype=np.float32)
                w[f"{p}.ln2.g"] = np.ones((hidden_dim,), dtype=np.float32)
                w[f"{p}.ln2.b"] = np.zeros((hidden_dim,), dtype=np.float32)
            in_dim = hidden_dim * 2
        w["ff.W"] = uniform(hidden_dim * 2, len(tgt_tags))
        w["ff.b"] = np.zeros((len(tgt_tags),), dtype=np.float32)
        return BiLSTMTaggerModel(w, src_vocab, list(tgt_tags), emb_dim, hidden_dim,
                                 depth, max_ending_length)

    # ---- serialization (for spark broadcast) ----
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        meta = {
            "tgt_tags": "\n".join(self.tgt_tags),
            "vocab": "\n".join(w for w, _ in sorted(self.src_vocab.word2id.items(),
                                                    key=lambda kv: kv[1])),
            "dims": np.array([self.emb_dim, self.hidden_dim, self.depth,
                              self.max_ending_length], dtype=np.int64),
        }
        np.savez(buf, __meta_tags__=np.frombuffer(meta["tgt_tags"].encode(), dtype=np.uint8),
                 __meta_vocab__=np.frombuffer(meta["vocab"].encode(), dtype=np.uint8),
                 __meta_dims__=meta["dims"], **self.weights)
        return buf.getvalue()

    @staticmethod
    def from_bytes(data: bytes) -> "BiLSTMTaggerModel":
        z = np.load(io.BytesIO(data))
        tags = bytes(z["__meta_tags__"]).decode().split("\n")
        vocab_words = bytes(z["__meta_vocab__"]).decode().split("\n")
        dims = z["__meta_dims__"]
        vocab = Vocab(vocab_words[3:])  # first 3 are the predefined tokens
        weights = {k: z[k] for k in z.files if not k.startswith("__meta_")}
        return BiLSTMTaggerModel(weights, vocab, tags, int(dims[0]), int(dims[1]),
                                 int(dims[2]), int(dims[3]))

    # ---- forward ----
    def _lstm_dir(self, x: np.ndarray, prefix: str, reverse: bool) -> np.ndarray:
        """x: (B, T, D) → (B, T, H). Per-timestep LayerNorm-LSTM (LSTMCell.cs:39-65)."""
        w = self.weights
        B, T, _ = x.shape
        H = self.hidden_dim
        Wxh = w[f"{prefix}.Wxh"]
        b = w[f"{prefix}.b"]
        g1, b1 = w[f"{prefix}.ln1.g"], w[f"{prefix}.ln1.b"]
        g2, b2 = w[f"{prefix}.ln2.g"], w[f"{prefix}.ln2.b"]
        h = np.zeros((B, H), dtype=np.float32)
        c = np.zeros((B, H), dtype=np.float32)
        out = np.empty((B, T, H), dtype=np.float32)
        steps = range(T - 1, -1, -1) if reverse else range(T)
        for t in steps:
            z = np.concatenate([x[:, t, :], h], axis=1) @ Wxh + b
            z = _layer_norm(z, g1, b1)
            gates = _sigmoid(z[:, : 3 * H])
            cell_write = np.tanh(z[:, 3 * H :])
            i_g = gates[:, :H]
            f_g = gates[:, H : 2 * H]
            o_g = gates[:, 2 * H :]
            c = f_g * c + i_g * cell_write
            h = o_g * np.tanh(_layer_norm(c, g2, b2))
            out[:, t, :] = h
        return out

    def logits(self, ids: np.ndarray) -> np.ndarray:
        """ids: (B, T) int32 padded with EOS → (B, T, n_tags) float32."""
        w = self.weights
        x = w["emb"][ids] * np.float32(np.sqrt(self.emb_dim))
        for layer in range(self.depth):
            fwd = self._lstm_dir(x, f"enc.{layer}.fwd", reverse=False)
            bwd = self._lstm_dir(x, f"enc.{layer}.bwd", reverse=True)
            x = np.concatenate([fwd, bwd], axis=2)
        return x @ w["ff.W"] + w["ff.b"]

    def predict_ids(self, ids: np.ndarray) -> np.ndarray:
        """Greedy per-token argmax decode (SeqLabel.cs:171-173)."""
        return np.argmax(self.logits(ids), axis=2)

    # ---- CRF upgrade slot (north-star "BiLSTM-CRF-style decode with Viterbi") ----
    def with_crf(self, seed: int = 42, bio: bool = False) -> "BiLSTMTaggerModel":
        """Attach a pinned transition matrix (and BIO structural masks when the tag
        set is BIO); decode switches to exact Viterbi. The reference itself decodes
        greedily (no CRF — SeqLabel.cs:171-173), so this is additive: with zero
        transitions Viterbi ≡ argmax."""
        from .viterbi import bio_start_mask, bio_transition_mask

        K = len(self.tgt_tags)
        rng = np.random.default_rng([seed, 99])
        trans = (rng.uniform(-0.5, 0.5, size=(K, K))).astype(np.float32)
        if bio:
            trans = trans + bio_transition_mask(self.tgt_tags)
            self.weights["crf.start"] = bio_start_mask(self.tgt_tags)
        self.weights["crf.T"] = trans
        return self

    def _decode(self, ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        if "crf.T" in self.weights:
            from .viterbi import viterbi_decode

            return viterbi_decode(self.logits(ids), self.weights["crf.T"], lengths,
                                  self.weights.get("crf.start"))
        return self.predict_ids(ids)

    def predict_tags(self, sentences: list[list[str]],
                     max_sent_length: int = 220) -> list[list[str]]:
        """Full predict path: encode via vocab, pad to batch max with EOS
        (BuildInTokens.PadSentences, Corpus/BuildInTokens.cs:29-75), forward, argmax,
        slice to true length. Length bucketing + >220-token chunking live in the
        shared decode driver (model/backend.py bucketed_chunked_predict); bucketing is
        REQUIRED here — the reference BiLSTM has no pad mask (BiEncoder.cs:62-103), so
        a padded mixed-length batch would leak pad tokens into backward states and
        make results batch-composition-dependent."""
        from .backend import bucketed_chunked_predict

        return bucketed_chunked_predict(sentences, self._predict_batch,
                                        max_sent_length, bucket_by_length=True)

    def predict_probs(self, sentence: list[str]) -> tuple[list[list[tuple[str, float]]], float]:
        """Per-class probabilities, batch-1 path (SeqLabel.cs:175-218): per word the
        sorted [(class, prob)] list; plus WordsInDictRatio = share of tokens found in
        the source vocab (SeqLabel.cs:194-216)."""
        if not sentence:
            return [], 0.0
        from .backend import probs_from_logits
        from .vocab import UNK_ID

        w2i = self.src_vocab.word2id
        ids = np.array([[w2i.get(t, UNK_ID) for t in sentence]], dtype=np.int64)
        # softmax/sort/round live in the shared probs_from_logits (same ops,
        # bit-identical to the pre-refactor inline version) so the ONNX backend's
        # predict_probs cannot drift from this one
        return probs_from_logits(self.logits(ids)[0], self.tgt_tags, sentence, w2i)

    def _predict_batch(self, sentences: list[list[str]]) -> list[list[str]]:
        if not sentences:
            return []
        lens = [len(s) for s in sentences]
        T = max(lens)
        if T == 0:
            return [[] for _ in sentences]
        ids = np.full((len(sentences), T), EOS_ID, dtype=np.int64)
        w2i = self.src_vocab.word2id
        from .vocab import UNK_ID

        for r, s in enumerate(sentences):
            for t, tok in enumerate(s):
                ids[r, t] = w2i.get(tok, UNK_ID)
        pred = self._decode(ids, np.asarray(lens, dtype=np.int64))
        tags = self.tgt_tags
        return [[tags[pred[r, t]] for t in range(lens[r])] for r in range(len(sentences))]
