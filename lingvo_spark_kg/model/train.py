"""Training math for the BiLSTM tagger: loss + analytic gradients + the reference's
Adam, in NumPy.

Mirrors the reference's training semantics (cited for parity, no code copied):
 * loss = token-level softmax NLL summed over the batch, gradient at the logits =
   probs − one-hot (SeqLabel.RunForwardOnSingleDevice training branch,
   Applications/SeqLabel.cs:133-168: ``cost += -log(p)``; ``SetWeightAt(p − 1)``);
 * backprop through the exact forward of model/bilstm.py — embedding ×√d, depth ×
   {fwd, bwd} LayerNorm-LSTM cells (LSTMCell.cs:39-65), classifier head;
 * Adam per the CPU kernel (Tensors/TensorApplyCPU.cs:1073-1113): grad /= batchSize,
   clip to ±gradClip, m/v EMAs (β1=0.9, β2=0.98 — AdamOptimizer.cs:26), bias-corrected
   step, gradient zeroing, zero-grad elements skipped.

Gradients are computed in float64 (weights stay float32) and verified against
numerical differentiation in tests/test_training.py — the correctness gate for every
formula below.
"""

from __future__ import annotations

import numpy as np

from .bilstm import LN_EPS as _EPS  # the SAME epsilon the inference forward uses —
# a drifting copy would train a different network than predict_tags runs


def _ln_forward(x: np.ndarray, g: np.ndarray, b: np.ndarray):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    std = np.sqrt(var + _EPS)
    xhat = (x - mu) / std
    return xhat * g + b, (xhat, std)


def _ln_backward(dy: np.ndarray, cache, g: np.ndarray):
    xhat, std = cache
    dg = (dy * xhat).sum(axis=0)
    db = dy.sum(axis=0)
    dxhat = dy * g
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) / std
    return dx, dg, db


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _lstm_dir_forward(x: np.ndarray, w: dict, prefix: str, H: int, reverse: bool):
    """x: (B,T,D) float64 → (out (B,T,H), caches per step)."""
    B, T, _ = x.shape
    Wxh, b = w[f"{prefix}.Wxh"], w[f"{prefix}.b"]
    g1, b1 = w[f"{prefix}.ln1.g"], w[f"{prefix}.ln1.b"]
    g2, b2 = w[f"{prefix}.ln2.g"], w[f"{prefix}.ln2.b"]
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    out = np.empty((B, T, H))
    steps = range(T - 1, -1, -1) if reverse else range(T)
    caches = []
    for t in steps:
        cat = np.concatenate([x[:, t, :], h], axis=1)
        a = cat @ Wxh + b
        z, ln1_cache = _ln_forward(a, g1, b1)
        gates = _sigmoid(z[:, : 3 * H])
        cw = np.tanh(z[:, 3 * H :])
        i_g, f_g, o_g = gates[:, :H], gates[:, H : 2 * H], gates[:, 2 * H :]
        c_prev = c
        c = f_g * c_prev + i_g * cw
        ln2c, ln2_cache = _ln_forward(c, g2, b2)
        tc = np.tanh(ln2c)
        h = o_g * tc
        out[:, t, :] = h
        caches.append((t, cat, ln1_cache, i_g, f_g, o_g, cw, c_prev, ln2_cache, tc))
    return out, caches


def _lstm_dir_backward(dout: np.ndarray, x_dim: int, caches, w: dict, prefix: str,
                       H: int, grads: dict):
    """dout: (B,T,H) → dx (B,T,x_dim); accumulates weight grads into ``grads``."""
    Wxh = w[f"{prefix}.Wxh"]
    g1 = w[f"{prefix}.ln1.g"]
    g2 = w[f"{prefix}.ln2.g"]
    B, T, _ = dout.shape
    dx = np.zeros((B, T, x_dim))
    dWxh = np.zeros_like(Wxh)
    db = np.zeros_like(w[f"{prefix}.b"])
    dg1 = np.zeros_like(g1)
    db1 = np.zeros_like(w[f"{prefix}.ln1.b"])
    dg2 = np.zeros_like(g2)
    db2 = np.zeros_like(w[f"{prefix}.ln2.b"])
    dh_next = np.zeros((B, H))
    dc_next = np.zeros((B, H))
    for (t, cat, ln1_cache, i_g, f_g, o_g, cw, c_prev, ln2_cache, tc) in reversed(caches):
        dh = dout[:, t, :] + dh_next
        do = dh * tc
        dtc = dh * o_g
        dln2c = dtc * (1.0 - tc * tc)
        dc, dg2_t, db2_t = _ln_backward(dln2c, ln2_cache, g2)
        dg2 += dg2_t
        db2 += db2_t
        dc = dc + dc_next
        df = dc * c_prev
        dc_next = dc * f_g
        di = dc * cw
        dcw = dc * i_g
        dz = np.concatenate(
            [
                di * i_g * (1.0 - i_g),
                df * f_g * (1.0 - f_g),
                do * o_g * (1.0 - o_g),
                dcw * (1.0 - cw * cw),
            ],
            axis=1,
        )
        da, dg1_t, db1_t = _ln_backward(dz, ln1_cache, g1)
        dg1 += dg1_t
        db1 += db1_t
        dWxh += cat.T @ da
        db += da.sum(axis=0)
        dcat = da @ Wxh.T
        dx[:, t, :] += dcat[:, :x_dim]
        dh_next = dcat[:, x_dim:]
    grads[f"{prefix}.Wxh"] = grads.get(f"{prefix}.Wxh", 0) + dWxh
    grads[f"{prefix}.b"] = grads.get(f"{prefix}.b", 0) + db
    grads[f"{prefix}.ln1.g"] = grads.get(f"{prefix}.ln1.g", 0) + dg1
    grads[f"{prefix}.ln1.b"] = grads.get(f"{prefix}.ln1.b", 0) + db1
    grads[f"{prefix}.ln2.g"] = grads.get(f"{prefix}.ln2.g", 0) + dg2
    grads[f"{prefix}.ln2.b"] = grads.get(f"{prefix}.ln2.b", 0) + db2
    return dx


def loss_and_grads(weights: dict[str, np.ndarray], emb_dim: int, hidden_dim: int,
                   depth: int, ids: np.ndarray, tgt: np.ndarray
                   ) -> tuple[float, dict[str, np.ndarray], int]:
    """One equal-length batch: ids/tgt (B,T) int → (summed NLL, grads, n_tokens).
    Gradient SUMS (not means) — the /batchSize normalization happens inside Adam,
    exactly as the reference (TensorApplyCPU.cs:1091)."""
    # no-op when the caller pre-cast once per partition (train_loop does)
    w64 = {k: (v if v.dtype == np.float64 else v.astype(np.float64))
           for k, v in weights.items()}
    B, T = ids.shape
    H = hidden_dim
    scale = np.sqrt(float(emb_dim))

    x = w64["emb"][ids] * scale  # (B,T,E)
    layer_inputs = []
    layer_caches = []
    for layer in range(depth):
        fwd, cf = _lstm_dir_forward(x, w64, f"enc.{layer}.fwd", H, reverse=False)
        bwd, cb = _lstm_dir_forward(x, w64, f"enc.{layer}.bwd", H, reverse=True)
        layer_inputs.append(x)
        layer_caches.append((cf, cb))
        x = np.concatenate([fwd, bwd], axis=2)

    flat = x.reshape(B * T, 2 * H)
    logits = flat @ w64["ff.W"] + w64["ff.b"]
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    probs = e / e.sum(axis=1, keepdims=True)
    tgt_flat = tgt.reshape(B * T)
    rows = np.arange(B * T)
    cost = float(-np.log(np.maximum(probs[rows, tgt_flat], 1e-30)).sum())

    dlogits = probs
    dlogits[rows, tgt_flat] -= 1.0  # probs − one-hot (SeqLabel.cs:166)

    grads: dict[str, np.ndarray] = {}
    grads["ff.W"] = flat.T @ dlogits
    grads["ff.b"] = dlogits.sum(axis=0)
    dx = (dlogits @ w64["ff.W"].T).reshape(B, T, 2 * H)

    for layer in range(depth - 1, -1, -1):
        cf, cb = layer_caches[layer]
        x_in = layer_inputs[layer]
        x_dim = x_in.shape[2]
        dxf = _lstm_dir_backward(dx[:, :, :H], x_dim, cf, w64, f"enc.{layer}.fwd", H, grads)
        dxb = _lstm_dir_backward(dx[:, :, H:], x_dim, cb, w64, f"enc.{layer}.bwd", H, grads)
        dx = dxf + dxb

    demb = np.zeros_like(w64["emb"])
    np.add.at(demb, ids.reshape(-1), dx.reshape(B * T, emb_dim) * scale)
    grads["emb"] = demb
    return cost, grads, B * T


# --------------------------------------------------------------- transformer BPTT
# eps mirrors transformer._layer_norm (1e-5) — a drifting copy would train a
# different network than the inference forward runs
_TR_EPS = 1e-5


def _ln_fwd_nd(x: np.ndarray, g: np.ndarray, b: np.ndarray):
    """LayerNorm over the trailing axis of an (..., D) tensor."""
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    std = np.sqrt(var + _TR_EPS)
    xhat = (x - mu) / std
    return xhat * g + b, (xhat, std)


def _ln_bwd_nd(dy: np.ndarray, cache, g: np.ndarray):
    """dg/db summed over ALL leading axes (the (B,T,D) case the per-step LSTM
    helpers above never need)."""
    xhat, std = cache
    lead = tuple(range(dy.ndim - 1))
    dg = (dy * xhat).sum(axis=lead)
    db = dy.sum(axis=lead)
    dxhat = dy * g
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) / std
    return dx, dg, db


def transformer_loss_and_grads(weights: dict[str, np.ndarray], emb_dim: int,
                               n_heads: int, depth: int, ids: np.ndarray,
                               tgt: np.ndarray) -> tuple[float, dict[str, np.ndarray], int]:
    """One equal-length batch through the PRE-NORM Transformer encoder
    (model/transformer.py logits — same ops, same eps, same weight names):
    emb ×√d + fixed sinusoidal pos table, depth × {pre-LN multi-head self-attention
    + residual, pre-LN position-wise FFN + residual}, final LN, classifier head,
    token-softmax NLL. Returns (summed NLL, gradient SUMS, n_tokens) with the same
    conventions as ``loss_and_grads`` (the /batchSize normalization lives in Adam).
    The fixed ``pos`` table gets no gradient (PositionEmbedding.cs is a constant
    buffer in the reference too). Training batches are equal-length (the inference
    bucketing), so the pad mask is identically zero and is omitted.

    Reference parity: the reference trains BOTH encoder types through one option
    (Applications/Options.cs EncoderType; ModelBuilding ModelBuilder.cs) — this
    closes the R-family asymmetry for EncoderType=Transformer. Verified against
    numerical differentiation in tests/test_training.py (the same gradcheck gate
    as the BiLSTM kernel)."""
    w64 = {k: (v if v.dtype == np.float64 else v.astype(np.float64))
           for k, v in weights.items()}
    B, T = ids.shape
    D, H = emb_dim, n_heads
    hd = D // H
    scale = np.sqrt(float(emb_dim))

    x = w64["emb"][ids] * scale + w64["pos"][:T][None, :, :]
    caches = []
    for layer in range(depth):
        p = f"enc.{layer}"
        xn1, ln1c = _ln_fwd_nd(x, w64[f"{p}.ln1.g"], w64[f"{p}.ln1.b"])
        q = (xn1 @ w64[f"{p}.attn.q.W"] + w64[f"{p}.attn.q.b"]) \
            .reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = (xn1 @ w64[f"{p}.attn.k.W"] + w64[f"{p}.attn.k.b"]) \
            .reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = (xn1 @ w64[f"{p}.attn.v.W"] + w64[f"{p}.attn.v.b"]) \
            .reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
        m = scores.max(axis=-1, keepdims=True)
        e = np.exp(scores - m)
        att = e / e.sum(axis=-1, keepdims=True)
        ctx = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        x1 = x + (ctx @ w64[f"{p}.attn.o.W"] + w64[f"{p}.attn.o.b"])
        xn2, ln2c = _ln_fwd_nd(x1, w64[f"{p}.ln2.g"], w64[f"{p}.ln2.b"])
        pre = xn2 @ w64[f"{p}.ffn.W1"] + w64[f"{p}.ffn.b1"]
        h1 = np.maximum(pre, 0.0)
        x2 = x1 + (h1 @ w64[f"{p}.ffn.W2"] + w64[f"{p}.ffn.b2"])
        caches.append((xn1, ln1c, q, k, v, att, ctx, x1, xn2, ln2c, h1))
        x = x2
    xf, lnfc = _ln_fwd_nd(x, w64["ln_f.g"], w64["ln_f.b"])
    flat = xf.reshape(B * T, D)
    logits = flat @ w64["ff.W"] + w64["ff.b"]
    mm = logits.max(axis=1, keepdims=True)
    ee = np.exp(logits - mm)
    probs = ee / ee.sum(axis=1, keepdims=True)
    tgt_flat = tgt.reshape(B * T)
    rows = np.arange(B * T)
    cost = float(-np.log(np.maximum(probs[rows, tgt_flat], 1e-30)).sum())

    dlogits = probs
    dlogits[rows, tgt_flat] -= 1.0  # probs − one-hot (SeqLabel.cs:166)

    grads: dict[str, np.ndarray] = {}
    grads["ff.W"] = flat.T @ dlogits
    grads["ff.b"] = dlogits.sum(axis=0)
    dxf = (dlogits @ w64["ff.W"].T).reshape(B, T, D)
    dx, grads["ln_f.g"], grads["ln_f.b"] = _ln_bwd_nd(dxf, lnfc, w64["ln_f.g"])

    for layer in range(depth - 1, -1, -1):
        p = f"enc.{layer}"
        xn1, ln1c, q, k, v, att, ctx, x1, xn2, ln2c, h1 = caches[layer]
        # FFN + residual: x2 = x1 + relu(xn2@W1+b1)@W2+b2
        dh1 = dx @ w64[f"{p}.ffn.W2"].T
        grads[f"{p}.ffn.W2"] = h1.reshape(B * T, -1).T @ dx.reshape(B * T, D)
        grads[f"{p}.ffn.b2"] = dx.sum(axis=(0, 1))
        dpre = dh1 * (h1 > 0.0)
        grads[f"{p}.ffn.W1"] = xn2.reshape(B * T, D).T @ dpre.reshape(B * T, -1)
        grads[f"{p}.ffn.b1"] = dpre.sum(axis=(0, 1))
        dxn2 = dpre @ w64[f"{p}.ffn.W1"].T
        dln2, grads[f"{p}.ln2.g"], grads[f"{p}.ln2.b"] = _ln_bwd_nd(
            dxn2, ln2c, w64[f"{p}.ln2.g"])
        dx1 = dx + dln2  # residual + pre-norm branch
        # attention + residual: x1 = x + (ctx@Wo+bo)
        grads[f"{p}.attn.o.W"] = ctx.reshape(B * T, D).T @ dx1.reshape(B * T, D)
        grads[f"{p}.attn.o.b"] = dx1.sum(axis=(0, 1))
        dctx = (dx1 @ w64[f"{p}.attn.o.W"].T).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        datt = dctx @ v.transpose(0, 1, 3, 2)
        dv = att.transpose(0, 1, 3, 2) @ dctx
        dscores = att * (datt - (datt * att).sum(axis=-1, keepdims=True))
        dscores /= np.sqrt(hd)
        dq = dscores @ k
        dk = dscores.transpose(0, 1, 3, 2) @ q
        dxn1 = np.zeros_like(xn1)
        for name, dmat in (("q", dq), ("k", dk), ("v", dv)):
            flat_d = dmat.transpose(0, 2, 1, 3).reshape(B * T, D)
            grads[f"{p}.attn.{name}.W"] = xn1.reshape(B * T, D).T @ flat_d
            grads[f"{p}.attn.{name}.b"] = flat_d.sum(axis=0)
            dxn1 += (flat_d @ w64[f"{p}.attn.{name}.W"].T).reshape(B, T, D)
        dln1, grads[f"{p}.ln1.g"], grads[f"{p}.ln1.b"] = _ln_bwd_nd(
            dxn1, ln1c, w64[f"{p}.ln1.g"])
        dx = dx1 + dln1

    demb = np.zeros_like(w64["emb"])
    np.add.at(demb, ids.reshape(-1), dx.reshape(B * T, D) * scale)
    grads["emb"] = demb
    return cost, grads, B * T


def add_grads(a: dict[str, np.ndarray] | None, b: dict[str, np.ndarray]) -> dict:
    if a is None:
        return b
    for k, v in b.items():
        a[k] = a.get(k, 0) + v
    return a


class AdamOptimizer:
    """Reference Adam (AdamOptimizer.cs:26, kernel TensorApplyCPU.cs:1073-1113):
    per element — g/batchSize, clip ±grad_clip, m/v EMAs, bias-corrected step;
    elements with zero gradient are skipped (their m/v state freezes too)."""

    def __init__(self, grad_clip: float = 3.0, beta1: float = 0.9, beta2: float = 0.98,
                 eps: float = 1e-9):
        self.grad_clip = grad_clip
        self.beta1 = beta1
        self.beta2 = beta2
        self.eps = eps
        self.iter = 0
        self._m: dict[str, np.ndarray] = {}
        self._v: dict[str, np.ndarray] = {}

    def step(self, weights: dict[str, np.ndarray], grads: dict[str, np.ndarray],
             batch_size: int, lr: float) -> None:
        self.iter += 1
        for name, g in grads.items():
            w = weights[name]
            m = self._m.setdefault(name, np.zeros(w.shape, dtype=np.float64))
            v = self._v.setdefault(name, np.zeros(w.shape, dtype=np.float64))
            g = np.asarray(g, dtype=np.float64).reshape(w.shape)
            nz = g != 0.0  # zero-grad elements untouched (TensorApplyCPU.cs:1089)
            g2 = np.clip(g / batch_size, -self.grad_clip, self.grad_clip)
            m[nz] = m[nz] * self.beta1 + (1.0 - self.beta1) * g2[nz]
            v[nz] = v[nz] * self.beta2 + (1.0 - self.beta2) * g2[nz] * g2[nz]
            m_cap = m[nz] / (1.0 - self.beta1 ** self.iter)
            v_cap = v[nz] / (1.0 - self.beta2 ** self.iter)
            upd = w.astype(np.float64)
            upd_nz = upd[nz] - lr * m_cap / (np.sqrt(v_cap) + self.eps)
            upd[nz] = upd_nz
            weights[name] = upd.astype(np.float32)
