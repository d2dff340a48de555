"""THE pinned deterministic tagger fixtures — single definition.

The driver queries (__spark_entry__), their golden mirrors (golden.py), the bench
(bench.py) and the pipeline's DNN default (pipeline.py) all tag with the same
seeded POS+NER model pair; this module is the one place its recipe (vocab, dims,
seeds) lives, so the five consumers cannot drift apart — any drift would silently
break the tag_* golden parity that anchors the DNN correctness story.
"""

from __future__ import annotations

from .lexicon import NER_TAGS, POS_TAGS
from .vocab import Vocab

PINNED_EMB_DIM = 16
PINNED_HIDDEN_DIM = 16
PINNED_POS_SEED = 42
PINNED_NER_SEED = 43


def pinned_vocab() -> Vocab:
    """Russian vowel-ending features + single letters — covers the ending tokens
    the fixture corpus produces."""
    return Vocab([f"_{s}" for s in "аеиоуыэюя"] + list("абвгдежзиклмнопрстуфхцчшщэюя"))


def pinned_tagger_models(encoder: str = "bilstm") -> tuple:
    """→ (pos_model, ner_model), deterministic for a given encoder."""
    if encoder == "transformer":
        from .transformer import TransformerTaggerModel

        vocab = pinned_vocab()
        pos_m = TransformerTaggerModel.create_pinned(
            vocab, POS_TAGS, emb_dim=PINNED_EMB_DIM, n_heads=4, depth=2,
            seed=PINNED_POS_SEED)
        ner_m = TransformerTaggerModel.create_pinned(
            vocab, NER_TAGS, emb_dim=PINNED_EMB_DIM, n_heads=4, depth=2,
            seed=PINNED_NER_SEED)
        return pos_m, ner_m
    from .bilstm import BiLSTMTaggerModel

    vocab = pinned_vocab()
    pos_m = BiLSTMTaggerModel.create_pinned(
        vocab, POS_TAGS, emb_dim=PINNED_EMB_DIM, hidden_dim=PINNED_HIDDEN_DIM,
        seed=PINNED_POS_SEED)
    ner_m = BiLSTMTaggerModel.create_pinned(
        vocab, NER_TAGS, emb_dim=PINNED_EMB_DIM, hidden_dim=PINNED_HIDDEN_DIM,
        seed=PINNED_NER_SEED)
    return pos_m, ner_m
