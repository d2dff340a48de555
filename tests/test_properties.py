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
