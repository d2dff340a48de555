"""Property-based robustness tests (hypothesis): the text stack must never crash,
never emit out-of-bounds or overlapping spans, and must be deterministic on ANY input
— the 100 TB corpus will contain everything."""

from hypothesis import given, settings, strategies as st

from lingvo_spark_kg.sentsplit import split_sentences_simple
from lingvo_spark_kg.tokenizer import ending_token, run_no_sents_allocate, run_simple_sents_allocate
from lingvo_spark_kg.urldetect import allocate_urls

# mix of scripts/classes the corpus will actually contain + nasties
_ALPHABETS = [
    st.characters(min_codepoint=0x20, max_codepoint=0x7E),          # ascii
    st.characters(min_codepoint=0x400, max_codepoint=0x4FF),        # cyrillic
    st.sampled_from(list(".,:;!?…«»\"'()-–—[]{}/\\@%№ \t\n\r ­")),
    st.sampled_from(list("0123456789")),
    st.characters(min_codepoint=0x300, max_codepoint=0x36F),        # combining marks
    st.characters(),                                                # anything
]
TEXT = st.text(alphabet=st.one_of(*_ALPHABETS), max_size=400)

SETTINGS = settings(max_examples=150, deadline=None)


@given(TEXT)
@SETTINGS
def test_urldetect_spans_valid(text):
    spans = allocate_urls(text)
    prev_end = 0
    for u in spans:
        assert 0 <= u.start and u.length > 0
        assert u.start + u.length <= len(text)
        assert u.start >= prev_end  # ascending, non-overlapping
        prev_end = u.start + u.length


@given(TEXT)
@SETTINGS
def test_sentences_valid_and_gaps_are_skippable(text):
    sents = split_sentences_simple(text)
    prev_end = 0
    for s in sents:
        assert 0 <= s.start and s.length > 0
        assert s.start + s.length <= len(text)
        assert s.start >= prev_end
        prev_end = s.start + s.length


@given(TEXT)
@SETTINGS
def test_tokens_valid_ordered_nonoverlapping(text):
    for sent, words in run_simple_sents_allocate(text):
        prev_end = sent.start
        for w in words:
            assert w.length > 0
            assert w.start >= prev_end
            assert w.start + w.length <= len(text)
            prev_end = w.start + w.length
            assert w.value  # never empty


@given(TEXT)
@SETTINGS
def test_full_mode_deterministic(text):
    a = [(w.start, w.length, w.value, w.input_type) for w in run_no_sents_allocate(text)]
    b = [(w.start, w.length, w.value, w.input_type) for w in run_no_sents_allocate(text)]
    assert a == b


@given(st.text(max_size=50), st.integers(min_value=1, max_value=20))
@SETTINGS
def test_ending_token_bounds(token, mel):
    out = ending_token(token, mel)
    # lowered, marks stripped; '_'-prefixed when truncated
    assert len(out) <= max(len(token), mel + 1)
    if len(out) == mel + 1 and len(token) > mel:
        assert out[0] == "_" or len([c for c in token]) <= mel + 1


@given(TEXT)
@SETTINGS
def test_full_mode_splitter_valid_spans(text):
    from lingvo_spark_kg.sentsplit_full import split_sentences_full

    prev_end = 0
    for s in split_sentences_full(text):
        assert 0 <= s.start and s.length > 0
        assert s.start + s.length <= len(text)
        assert s.start >= prev_end
        prev_end = s.start + s.length


# ---------------------------------------------------------------- s2s wire format

_WORD = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x21, max_codepoint=0x7E),
        st.characters(min_codepoint=0x400, max_codepoint=0x4FF),
    ),
    min_size=1, max_size=12,
)


@given(
    weights=st.dictionaries(_WORD, st.lists(
        st.floats(width=32, allow_nan=False, allow_infinity=False),
        max_size=20), max_size=6),
    dims=st.tuples(st.integers(0, 4096), st.integers(0, 8), st.integers(0, 1),
                   st.integers(0, 4096), st.integers(0, 64)),
    vocab=st.dictionaries(_WORD, st.integers(0, 2**31 - 1), max_size=30),
    scores=st.dictionaries(st.text(max_size=8), st.floats(allow_nan=False), max_size=3),
)
@settings(max_examples=60, deadline=None)
def test_s2s_wire_roundtrip(weights, dims, vocab, scores):
    """Arbitrary models survive write_s2s → read_s2s byte-exactly: names (unicode),
    flat float32 weights, varint hyperparams, both vocab dicts, double scores."""
    import numpy as np

    from lingvo_spark_kg.sources.s2s import S2SModel, read_s2s, write_s2s

    m = S2SModel(
        name2weights={k: np.asarray(v, dtype=np.float32) for k, v in weights.items()},
        encoder_embedding_dim=dims[0], encoder_layer_depth=dims[1],
        encoder_type=dims[2], hidden_dim=dims[3], multi_head_num=dims[4],
        src_word2id=dict(vocab), tgt_word2id=dict(vocab),
        best_primary_scores=dict(scores),
    )
    p = read_s2s(write_s2s(m))
    assert set(p.name2weights) == set(m.name2weights)
    for k, w in m.name2weights.items():
        assert np.array_equal(p.name2weights[k], w, equal_nan=True), k
    assert (p.encoder_embedding_dim, p.encoder_layer_depth, p.encoder_type,
            p.hidden_dim, p.multi_head_num) == dims
    assert p.src_word2id == vocab and p.tgt_word2id == vocab
    assert p.best_primary_scores == scores


@given(TEXT)
@SETTINGS
def test_redact_text_no_residual_pii_and_deterministic(text):
    """Redaction properties on ANY input: no ≥min_digits digit run survives, the
    URL/Email counts match the detector, and the kernel is deterministic."""
    import re

    from lingvo_spark_kg.urldetect import allocate_urls, redact_text

    red, n_urls, n_emails, n_runs = redact_text(text, 4)
    assert (red, n_urls, n_emails, n_runs) == redact_text(text, 4)
    assert not re.search(r"[0-9]{4,}", red)
    spans = allocate_urls(text)
    assert n_urls == sum(1 for s in spans if s.type == "Url")
    assert n_emails == sum(1 for s in spans if s.type == "Email")
    assert n_runs >= 0


@given(TEXT)
@SETTINGS
def test_redact_text_idempotent(text):
    """A redacted text redacts to itself: placeholders contain no digits and are not
    detectable as URLs/Emails, so a second pass is the identity."""
    from lingvo_spark_kg.urldetect import redact_text

    red, _u, _e, _n = redact_text(text, 4)
    red2, u2, e2, n2 = redact_text(red, 4)
    assert red2 == red and u2 == 0 and e2 == 0 and n2 == 0
