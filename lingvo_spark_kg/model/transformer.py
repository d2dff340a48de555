"""Vectorized NumPy forward pass of the reference pre-norm Transformer encoder.

Architecture re-implemented from the reference (no code copied):
 * sinusoidal position embedding added to the scaled token embeddings — Transformer
   path only (Network/PositionEmbedding.cs:12-53; wiring Applications/SeqLabel.cs:80-90);
 * depth × { pre-norm multi-head self-attention with residual
   (Network/Layers/MultiHeadAttention.cs:76-135, residual add :123), pre-norm
   position-wise FFN with residual } + final LayerNorm
   (Network/TransformerEncoder.cs:63-89); hiddenDim must equal embeddingDim
   (TransformerEncoder.cs:32);
 * pad self-attention mask from true lengths when batch > 1
   (ComputeGraphTensor.cs:1717 BuildPadSelfMask; call Network/Encoder.cs:91);
 * classifier head + softmax + greedy argmax identical to the BiLSTM path
   (FeedForwardLayer.cs:37-42; SeqLabel.cs:133,171-173).

Same weights-dict / broadcast-bytes conventions as bilstm.BiLSTMTaggerModel so the
Spark tag operator can run either encoder ("EncoderType" option of the reference,
Applications/Options.cs).
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np

from .vocab import EOS_ID, UNK_ID, Vocab


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * g + b


def sinusoidal_position_embedding(max_len: int, dim: int) -> np.ndarray:
    """Fixed sin/cos table, rows = max_len (PositionEmbedding.cs:30-53)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    i = np.arange(dim, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    out = np.zeros((max_len, dim), dtype=np.float32)
    out[:, 0::2] = np.sin(angle[:, 0::2])
    out[:, 1::2] = np.cos(angle[:, 1::2])
    return out


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


@dataclass
class TransformerTaggerModel:
    weights: dict[str, np.ndarray]
    src_vocab: Vocab
    tgt_tags: list[str]
    emb_dim: int
    n_heads: int
    depth: int
    max_ending_length: int = 4
    max_len: int = 512

    @staticmethod
    def create_pinned(src_vocab: Vocab, tgt_tags: list[str], emb_dim: int = 32,
                      n_heads: int = 4, depth: int = 2, seed: int = 42,
                      max_ending_length: int = 4, max_len: int = 512) -> "TransformerTaggerModel":
        assert emb_dim % n_heads == 0
        rng = np.random.default_rng(seed)
        w: dict[str, np.ndarray] = {}

        def uniform(*shape: int) -> np.ndarray:
            scale = np.sqrt(6.0 / sum(shape))
            return rng.uniform(-scale, scale, size=shape).astype(np.float32)

        w["emb"] = uniform(len(src_vocab), emb_dim)
        for layer in range(depth):
            p = f"enc.{layer}"
            for name in ("q", "k", "v", "o"):
                w[f"{p}.attn.{name}.W"] = uniform(emb_dim, emb_dim)
                w[f"{p}.attn.{name}.b"] = np.zeros((emb_dim,), dtype=np.float32)
            w[f"{p}.ln1.g"] = np.ones((emb_dim,), dtype=np.float32)
            w[f"{p}.ln1.b"] = np.zeros((emb_dim,), dtype=np.float32)
            w[f"{p}.ffn.W1"] = uniform(emb_dim, emb_dim * 4)
            w[f"{p}.ffn.b1"] = np.zeros((emb_dim * 4,), dtype=np.float32)
            w[f"{p}.ffn.W2"] = uniform(emb_dim * 4, emb_dim)
            w[f"{p}.ffn.b2"] = np.zeros((emb_dim,), dtype=np.float32)
            w[f"{p}.ln2.g"] = np.ones((emb_dim,), dtype=np.float32)
            w[f"{p}.ln2.b"] = np.zeros((emb_dim,), dtype=np.float32)
        w["ln_f.g"] = np.ones((emb_dim,), dtype=np.float32)
        w["ln_f.b"] = np.zeros((emb_dim,), dtype=np.float32)
        w["ff.W"] = uniform(emb_dim, len(tgt_tags))
        w["ff.b"] = np.zeros((len(tgt_tags),), dtype=np.float32)
        w["pos"] = sinusoidal_position_embedding(max_len + 2, emb_dim)
        return TransformerTaggerModel(w, src_vocab, list(tgt_tags), emb_dim, n_heads,
                                      depth, max_ending_length, max_len)

    # --- serialization (same convention as BiLSTMTaggerModel) ---
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez(
            buf,
            __meta_tags__=np.frombuffer("\n".join(self.tgt_tags).encode(), dtype=np.uint8),
            __meta_vocab__=np.frombuffer(
                "\n".join(w for w, _ in sorted(self.src_vocab.word2id.items(),
                                               key=lambda kv: kv[1])).encode(),
                dtype=np.uint8,
            ),
            __meta_dims__=np.array([self.emb_dim, self.n_heads, self.depth,
                                    self.max_ending_length, self.max_len], dtype=np.int64),
            **self.weights,
        )
        return buf.getvalue()

    @staticmethod
    def from_bytes(data: bytes) -> "TransformerTaggerModel":
        z = np.load(io.BytesIO(data))
        tags = bytes(z["__meta_tags__"]).decode().split("\n")
        vocab_words = bytes(z["__meta_vocab__"]).decode().split("\n")
        d = z["__meta_dims__"]
        weights = {k: z[k] for k in z.files if not k.startswith("__meta_")}
        return TransformerTaggerModel(weights, Vocab(vocab_words[3:]), tags,
                                      int(d[0]), int(d[1]), int(d[2]), int(d[3]), int(d[4]))

    # --- forward ---
    def logits(self, ids: np.ndarray, lengths: np.ndarray | None = None) -> np.ndarray:
        w = self.weights
        B, T = ids.shape
        x = w["emb"][ids] * np.float32(np.sqrt(self.emb_dim)) + w["pos"][:T][None, :, :]
        H, D = self.n_heads, self.emb_dim
        hd = D // H
        if lengths is None:
            lengths = np.full(B, T, dtype=np.int64)
        pad = np.arange(T)[None, :] >= lengths[:, None]  # (B, T) True at pads
        mask = np.where(pad[:, None, None, :], np.float32(-1e9), np.float32(0.0))
        for layer in range(self.depth):
            p = f"enc.{layer}"
            xn = _layer_norm(x, w[f"{p}.ln1.g"], w[f"{p}.ln1.b"])
            q = (xn @ w[f"{p}.attn.q.W"] + w[f"{p}.attn.q.b"]).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
            k = (xn @ w[f"{p}.attn.k.W"] + w[f"{p}.attn.k.b"]).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
            v = (xn @ w[f"{p}.attn.v.W"] + w[f"{p}.attn.v.b"]).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
            att = _softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd) + mask, axis=-1)
            ctx = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
            x = x + (ctx @ w[f"{p}.attn.o.W"] + w[f"{p}.attn.o.b"])
            xn = _layer_norm(x, w[f"{p}.ln2.g"], w[f"{p}.ln2.b"])
            h = np.maximum(xn @ w[f"{p}.ffn.W1"] + w[f"{p}.ffn.b1"], 0.0)
            x = x + (h @ w[f"{p}.ffn.W2"] + w[f"{p}.ffn.b2"])
        x = _layer_norm(x, w["ln_f.g"], w["ln_f.b"])
        return x @ w["ff.W"] + w["ff.b"]

    def predict_tags(self, sentences: list[list[str]],
                     max_sent_length: int = 220) -> list[list[str]]:
        """Padded batch decode WITH the pad self-attention mask (so results are
        batch-composition independent — no length bucketing needed, unlike the
        unmasked BiLSTM); chunking semantics (SeqLabel.cs:259-311) live in the shared
        decode driver."""
        from .backend import bucketed_chunked_predict

        return bucketed_chunked_predict(sentences, self._predict_batch,
                                        max_sent_length, bucket_by_length=False)

    def _predict_batch(self, sentences: list[list[str]]) -> list[list[str]]:
        if not sentences:
            return []
        lens = np.array([len(s) for s in sentences], dtype=np.int64)
        T = int(lens.max(initial=0))
        if T == 0:
            return [[] for _ in sentences]
        ids = np.full((len(sentences), T), EOS_ID, dtype=np.int64)
        w2i = self.src_vocab.word2id
        for r, s in enumerate(sentences):
            for t, tok in enumerate(s):
                ids[r, t] = w2i.get(tok, UNK_ID)
        pred = np.argmax(self.logits(ids, lens), axis=2)
        tags = self.tgt_tags
        return [[tags[pred[r, t]] for t in range(int(lens[r]))] for r in range(len(sentences))]

    def predict_probs(self, sentence: list[str]) -> tuple[list[list[tuple[str, float]]], float]:
        """Per-class probabilities, batch-1 path (SeqLabel.cs:175-218): per word, the
        sorted [(class, prob)] list, plus WordsInDictRatio — the share of non-predefined
        tokens found in the source vocab (SeqLabel.cs:194-216)."""
        if not sentence:
            return [], 0.0
        from .backend import probs_from_logits

        w2i = self.src_vocab.word2id
        ids = np.array([[w2i.get(t, UNK_ID) for t in sentence]], dtype=np.int64)
        # shared post-processing (backend.probs_from_logits) — elementwise-identical
        # to the previous inline _softmax over the batch-of-1 logits
        return probs_from_logits(self.logits(ids, np.array([len(sentence)]))[0],
                                 self.tgt_tags, sentence, w2i)
