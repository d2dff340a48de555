"""Transformer encoder regimen tests (M4/M7/M11 in SURVEY.md §2.3)."""

import numpy as np

from lingvo_spark_kg.model.transformer import (
    TransformerTaggerModel,
    sinusoidal_position_embedding,
)
from lingvo_spark_kg.model.vocab import Vocab


def small(seed=42):
    v = Vocab(["ав", "бс", "_кий", "_ние", "вд"])
    return TransformerTaggerModel.create_pinned(v, ["A", "B", "C"], emb_dim=16,
                                                n_heads=4, depth=2, seed=seed)


def test_position_embedding_shape_and_values():
    pe = sinusoidal_position_embedding(8, 6)
    assert pe.shape == (8, 6)
    assert pe[0, 0] == 0.0 and abs(pe[0, 1] - 1.0) < 1e-6  # sin(0), cos(0)
    assert abs(pe[1, 0] - np.sin(1.0)) < 1e-6


def test_determinism_and_roundtrip():
    m1, m2 = small(), small()
    s = [["ав", "бс", "_кий"]]
    assert m1.predict_tags(s) == m2.predict_tags(s)
    m3 = TransformerTaggerModel.from_bytes(m1.to_bytes())
    assert m3.predict_tags(s) == m1.predict_tags(s)


def test_pad_mask_gives_batch_invariance_even_with_mixed_lengths():
    # unlike the BiLSTM (no mask in the reference), the Transformer path masks pads
    # (Encoder.cs:91) so MIXED-length batches decode identically to batch-1
    m = small()
    a = ["ав", "бс", "_кий", "вд", "ав"]
    b = ["бс"]
    c = ["_ние", "ав", "бс"]
    singles = [m.predict_tags([s])[0] for s in (a, b, c)]
    assert m.predict_tags([a, b, c]) == singles


def test_chunking():
    m = small()
    for n in (219, 220, 221, 243, 441):
        assert len(m.predict_tags([["ав"] * n])[0]) == n


def test_predict_probs_and_words_in_dict_ratio():
    m = small()
    probs, ratio = m.predict_probs(["ав", "неизвестное", "бс", "тоже"])
    assert len(probs) == 4
    for ranked in probs:
        ps = [p for _, p in ranked]
        assert abs(sum(ps) - 1.0) < 1e-4
        assert ps == sorted(ps, reverse=True)
    assert ratio == 0.5  # 2 of 4 in vocab (SeqLabel.cs:194-216 analog)


def test_bilstm_predict_probs():
    from lingvo_spark_kg.model.bilstm import BiLSTMTaggerModel

    v = Vocab(["ав", "бс"])
    m = BiLSTMTaggerModel.create_pinned(v, ["A", "B"], emb_dim=8, hidden_dim=8)
    probs, ratio = m.predict_probs(["ав", "xxx"])
    assert len(probs) == 2 and ratio == 0.5
    assert abs(sum(p for _, p in probs[0]) - 1.0) < 1e-4
