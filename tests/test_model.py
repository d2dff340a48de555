"""Model-layer tests: vocab layout, BiLSTM determinism/batching/chunking
(per SURVEY.md §5.2 tagger-parity strategy), lexicon tagger, triple templates."""

import numpy as np

from lingvo_spark_kg.fixtures.corpus import gazetteer_from_aliases, make_aliases
from lingvo_spark_kg.model.bilstm import BiLSTMTaggerModel
from lingvo_spark_kg.model.lexicon import LexiconNer, pos_tag_word, tag_sentence
from lingvo_spark_kg.model.triples import extract_triples, merge_bio_spans
from lingvo_spark_kg.model.vocab import BOS_ID, EOS_ID, UNK_ID, Vocab
from lingvo_spark_kg.tokenizer import run_simple_sents_allocate


def small_model(depth=1, seed=42, tags=("A", "B", "C")):
    v = Vocab(["ав", "бс", "_кий", "_ние", "вд"])
    return BiLSTMTaggerModel.create_pinned(v, list(tags), emb_dim=8, hidden_dim=8,
                                           depth=depth, seed=seed)


def test_vocab_reserved_ids():
    v = Vocab(["x", "y"])
    assert v.word2id["</s>"] == EOS_ID == 0
    assert v.word2id["<s>"] == BOS_ID == 1
    assert v.word2id["<unk>"] == UNK_ID == 2
    assert v.word2id["x"] == 3  # START_MEANING_INDEX (Vocab.cs:14-19)
    assert v.get_indices(["x", "zzz"]) == [3, UNK_ID]


def test_vocab_build_freq_desc_cap():
    v = Vocab.build([["a", "a", "b"], ["a", "c", "b"]], cap=2)
    assert v.word2id["a"] == 3 and v.word2id["b"] == 4 and "c" not in v.word2id


def test_determinism_and_serialization_roundtrip():
    m1, m2 = small_model(), small_model()
    s = [["ав", "бс", "_кий"]]
    assert m1.predict_tags(s) == m2.predict_tags(s)
    m3 = BiLSTMTaggerModel.from_bytes(m1.to_bytes())
    assert m3.predict_tags(s) == m1.predict_tags(s)
    assert m3.src_vocab.word2id == m1.src_vocab.word2id


def test_batch_invariance():
    # equal-length bucketing makes decode independent of batch composition
    m = small_model(depth=2)
    a = ["ав", "бс", "_кий"]
    b = ["бс", "вд", "ав"]
    c = ["ав", "вд"]
    singles = [m.predict_tags([s])[0] for s in (a, b, c)]
    batched = m.predict_tags([a, b, c])
    assert batched == singles


def test_chunking_boundaries():
    # SeqLabel.cs:259-311: ≤220 direct; 221..242 (≤10% overflow) truncate+extend;
    # >242 chunked by 220
    m = small_model()
    for n in (219, 220, 221, 242, 243, 440, 441):
        tags = m.predict_tags([["ав"] * n])[0]
        assert len(tags) == n, n
    # truncated region repeats the last predicted tag
    t221 = m.predict_tags([["ав"] * 221])[0]
    t220 = m.predict_tags([["ав"] * 220])[0]
    assert t221[:220] == t220 and t221[220] == t220[-1]
    # chunked region = independent chunk predictions concatenated
    t443 = m.predict_tags([["ав"] * 443])[0]
    assert t443[:220] == t220
    assert t443[220:440] == t220
    assert t443[440:] == m.predict_tags([["ав"] * 3])[0]


def test_logits_shape_and_finite():
    m = small_model(depth=2)
    ids = np.array([[3, 4, 5, 0], [4, 5, 0, 0]])
    lg = m.logits(ids)
    assert lg.shape == (2, 4, 3)
    assert np.isfinite(lg).all()


def test_lexicon_pos_rules():
    gaz = gazetteer_from_aliases(make_aliases(10))
    ner = LexiconNer(gaz)
    text = "Сергей Козлов возглавлял управление Генштаба в Москве."
    (sent, words), = run_simple_sents_allocate(text)
    pos, nert = tag_sentence(words, ner)
    d = dict(zip([w.value for w in words], zip(pos, nert)))
    assert d["возглавлял"][0] == "Verb"
    assert d["в"][0] == "Preposition"
    assert d["."][0] == "Punctuation"
    assert d["Сергей"][1] == "B-PER" and d["Козлов"][1] == "I-PER"
    assert d["Генштаба"][1] == "B-ORG"
    assert d["Москве"][1] == "B-LOC"


def test_bio_merge_and_triples():
    gaz = gazetteer_from_aliases(make_aliases(10))
    ner = LexiconNer(gaz)
    text = "Минобороны направило иск против компании Транзас."
    (sent, words), = run_simple_sents_allocate(text)
    pos, nert = tag_sentence(words, ner)
    spans = merge_bio_spans(words, nert)
    assert [s.surface for s in spans] == ["Минобороны", "Транзас"]
    tr = extract_triples(words, pos, nert)
    assert len(tr) == 1
    assert (tr[0].subj, tr[0].pred, tr[0].obj) == ("Минобороны", "направило", "Транзас")
    assert tr[0].subj_type == "ORG" and tr[0].obj_type == "ORG"


def test_triples_deterministic():
    gaz = gazetteer_from_aliases(make_aliases(10))
    ner = LexiconNer(gaz)
    text = "Суд Москвы рассмотрел дело Козлова о квартире в Истре."
    (s1, w1), = run_simple_sents_allocate(text)
    (s2, w2), = run_simple_sents_allocate(text)
    assert extract_triples(w1, *tag_sentence(w1, ner)) == extract_triples(w2, *tag_sentence(w2, ner))


def test_output_type_correction_semantics():
    # Num→Numeral, Url→Other, punctuation-flag→Punctuation (PosTaggerExtensions.cs:16-59)
    (sent, words), = run_simple_sents_allocate("Ущерб 27 млн руб. на www.example.ru составил!")
    gaz = gazetteer_from_aliases(make_aliases(10))
    pos, _ = tag_sentence(words, LexiconNer(gaz))
    by_val = dict(zip([w.value for w in words], pos))
    assert by_val["[%NUM%]"] == "Numeral"
    assert by_val["www.example.ru"] == "Other"
    assert by_val["!"] == "Punctuation"


def test_viterbi_zero_transitions_equals_argmax():
    import numpy as np

    from lingvo_spark_kg.model.viterbi import viterbi_decode

    rng = np.random.default_rng(3)
    em = rng.standard_normal((4, 7, 5)).astype(np.float32)
    lens = np.array([7, 3, 5, 1])
    out = viterbi_decode(em, np.zeros((5, 5), dtype=np.float32), lens)
    for b in range(4):
        for t in range(int(lens[b])):
            assert out[b, t] == int(np.argmax(em[b, t]))


def test_viterbi_transitions_change_path():
    import numpy as np

    from lingvo_spark_kg.model.viterbi import viterbi_decode

    # emissions slightly prefer tag 1 at t=1, but transition 0->0 is strongly
    # rewarded and 0->1 forbidden → path stays at 0
    em = np.zeros((1, 2, 2), dtype=np.float32)
    em[0, 0, 0] = 5.0
    em[0, 1, 1] = 0.1
    trans = np.array([[3.0, -1e9], [0.0, 0.0]], dtype=np.float32)
    out = viterbi_decode(em, trans)
    assert out[0].tolist() == [0, 0]


def test_bio_mask_forbids_illformed_sequences():
    import numpy as np

    from lingvo_spark_kg.model.lexicon import NER_TAGS
    from lingvo_spark_kg.model.viterbi import bio_start_mask, bio_transition_mask, viterbi_decode

    rng = np.random.default_rng(11)
    em = rng.standard_normal((8, 12, len(NER_TAGS))).astype(np.float32) * 3
    out = viterbi_decode(em, bio_transition_mask(NER_TAGS),
                         start_mask=bio_start_mask(NER_TAGS))
    for b in range(8):
        prev = "O"
        for t in range(12):
            tag = NER_TAGS[out[b, t]]
            if tag.startswith("I-"):
                assert prev in (f"B-{tag[2:]}", f"I-{tag[2:]}"), (b, t, prev, tag)
            prev = tag


def test_bilstm_crf_decode_well_formed_and_deterministic():
    from lingvo_spark_kg.model.lexicon import NER_TAGS
    from lingvo_spark_kg.model.vocab import Vocab

    v = Vocab(list("абвгде"))
    m1 = BiLSTMTaggerModel.create_pinned(v, NER_TAGS, emb_dim=8, hidden_dim=8).with_crf(bio=True)
    m2 = BiLSTMTaggerModel.create_pinned(v, NER_TAGS, emb_dim=8, hidden_dim=8).with_crf(bio=True)
    sents = [["а", "б", "в", "г"], ["д", "е"], ["а"] * 230]
    t1, t2 = m1.predict_tags(sents), m2.predict_tags(sents)
    assert t1 == t2
    for tags in t1:
        prev = "O"
        for tag in tags:
            if tag.startswith("I-"):
                assert prev in (f"B-{tag[2:]}", f"I-{tag[2:]}")
            prev = tag
