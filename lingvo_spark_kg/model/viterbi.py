"""CRF-style Viterbi decode over per-token emission scores.

The reference decodes greedily — per-token argmax, no CRF (SeqLabel.cs:171-173;
BeamSearch.cs exists but is never called). The north-star spec frames the new engine's
decode as "BiLSTM-CRF-style sequence decode with Viterbi", so this module provides that
upgrade slot: a (n_tags × n_tags) transition matrix scored jointly with the emissions,
decoded by exact max-sum dynamic programming, vectorized over the batch in NumPy.

For BIO tag sets, ``bio_transition_mask`` forbids ill-formed sequences (O→I-X,
B-X→I-Y, start→I-X), so NER spans are structurally valid by construction — something
greedy argmax cannot guarantee.

With a zero transition matrix Viterbi reduces exactly to per-token argmax (tested), so
the pinned models remain reference-parity by default and the CRF layer is purely
additive.
"""

from __future__ import annotations

import numpy as np

NEG_INF = np.float32(-1e9)


def bio_transition_mask(tags: list[str]) -> np.ndarray:
    """(n_tags, n_tags) additive mask: 0 for allowed y_{t-1}→y_t, -1e9 for forbidden
    BIO transitions (I-X only after B-X or I-X)."""
    n = len(tags)
    mask = np.zeros((n, n), dtype=np.float32)
    for j, to_tag in enumerate(tags):
        if not to_tag.startswith("I-"):
            continue
        etype = to_tag[2:]
        for i, from_tag in enumerate(tags):
            if from_tag not in (f"B-{etype}", f"I-{etype}"):
                mask[i, j] = NEG_INF
    return mask


def bio_start_mask(tags: list[str]) -> np.ndarray:
    """(n_tags,) additive mask for the first token: I-X cannot start a sentence."""
    return np.array([NEG_INF if t.startswith("I-") else 0.0 for t in tags],
                    dtype=np.float32)


def viterbi_decode(emissions: np.ndarray, transitions: np.ndarray,
                   lengths: np.ndarray | None = None,
                   start_mask: np.ndarray | None = None) -> np.ndarray:
    """Batch max-sum decode.

    emissions: (B, T, K) scores; transitions: (K, K) additive scores (row = from,
    col = to); lengths: (B,) true lengths (defaults to T). → (B, T) best tag ids
    (positions past the true length hold the last in-range decision's padding — slice
    by length at the call site).
    """
    B, T, K = emissions.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    score = emissions[:, 0, :].astype(np.float32).copy()
    if start_mask is not None:
        score += start_mask[None, :]
    back = np.zeros((B, T, K), dtype=np.int32)
    for t in range(1, T):
        # (B, K_from, 1) + (K_from, K_to) → best over K_from
        cand = score[:, :, None] + transitions[None, :, :]
        best_from = np.argmax(cand, axis=1)                    # (B, K_to)
        best_score = np.take_along_axis(cand, best_from[:, None, :], axis=1)[:, 0, :]
        active = (t < lengths)[:, None]
        new_score = best_score + emissions[:, t, :]
        score = np.where(active, new_score, score)
        back[:, t, :] = np.where(active, best_from, 0)
    out = np.zeros((B, T), dtype=np.int64)
    last = np.argmax(score, axis=1)
    for b in range(B):
        L = int(lengths[b])
        tag = int(last[b])
        for t in range(L - 1, -1, -1):
            out[b, t] = tag
            if t > 0:
                tag = int(back[b, t, tag])
    return out
