"""Tokenizer: char-class state machine, NUM/URL placeholders, graphemic classification,
punctuation canonicalization, and the word-ending model feature.

Semantic re-implementation (not a translation) of the reference tokenizer
(reference: PosTagger/Lingvo.PosTagger.Tokenizing/Tokenizing/Tokenizer.cs:421-1354;
graphemic classifier PosTaggerInputTypeProcessor.cs:90-319; umlauts
UmlautesNormalizer.cs:16-85). Two modes mirror the two reference callbacks:

 * ``mode='full'``   — SentSplitterProcessSentCallback (Tokenizer.cs:421-658): a dot
   followed by an uppercase letter flushes the word with the dot attached ("С.Козлов" →
   "С." + "Козлов"); other dots glue into the current word ("2010г." stays one token).
 * ``mode='simple'`` — SentSplitterProcessSentCallback_Simple (Tokenizer.cs:662-885):
   dots always unstick from token ends unless followed by a digit.

Shared machinery: whitespace / between-letter-or-digit / between-digit /
tokenize-separately / interprete-as-whitespace dispatch over SPEC_CHARTYPE_MAP;
same-char punctuation-run merge (MergePunctuation, Tokenizer.cs:1131-1171); trailing
non-letter/digit handled in a tail pass after ``SkipNonLetterAndNonDigitToTheEnd``
(Tokenizer.cs:985-1012); URL spans skipped then merged back sorted by start
(Tokenizer.cs:341-351); consecutive number tokens collapsed into one ``[%NUM%]``
placeholder with length extension (Tokenizer.cs:897-983).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from .chartypes import (
    BMP,
    CTM,
    CTM_LIST,
    SCTM_LIST,
    IS_DIGIT,
    IS_HYPHEN,
    IS_LETTER,
    IS_LOWER,
    IS_PUNCTUATION,
    IS_QUOTE,
    IS_UPPER,
    IS_WHITESPACE,
    SCTM,
    SCT_BETWEEN_DIGIT,
    SCT_BETWEEN_LETTER_OR_DIGIT,
    SCT_DOT_CHAR,
    SCT_INTERPRETE_AS_WHITESPACE,
    SCT_TOKENIZE_DIFFERENT_SEPARATELY,
    to_lower_invariant,
    to_upper_invariant,
)
from .resources import DIGITS_SPEC_ENDS, NUM_PLACEHOLDER, URL_PLACEHOLDER
from .sentsplit import Sentence, split_sentences_simple
from .urldetect import UrlSpan, allocate_urls

# --- PosTaggerInputType (Type's/PosTaggerInputType.cs) ---
IT_OTHER = "Other"
IT_ALL_CAPITAL = "AllCapital"
IT_LATIN_CAPITAL = "LatinCapital"
IT_MIX_CAPITAL = "MixCapital"
IT_MIX_CAPITAL_WITH_DOT = "MixCapitalWithDot"
IT_NUM_CAPITAL = "NumCapital"
IT_ONE_CAPITAL = "OneCapital"
IT_ONE_CAPITAL_WITH_DOT = "OneCapitalWithDot"
IT_FIRST_LOWER_WITH_UPPER = "FirstLowerWithUpper"
IT_QUOTE = "Quote"
IT_NUM = "Num"
IT_ALL_CAPITAL_WITH_DOT = "AllCapitalWithDot"
IT_LATIN_FIRST_CAPITAL = "LatinFirstCapital"
IT_EMAIL = "Email"
IT_URL = "Url"

# --- ExtraWordType flags (Type's/ExtraWordType.cs) ---
EWT_OTHER = 0
EWT_COMMA = 1
EWT_DASH = 1 << 1
EWT_COLON = 1 << 2
EWT_INTEGER_NUMBER = 1 << 3
EWT_PUNCTUATION = 1 << 4
EWT_HAS_UMLAUTES = 1 << 5

_UMLAUTE_CHARS = set("äöüÄÖÜß")
_UMLAUT_UPPER = {"ä": "AE", "ö": "OE", "ü": "UE", "Ä": "AE", "Ö": "OE", "Ü": "UE", "ß": "SS"}
_ROMAN = set("IVXLCDM")


class Word:
    """word_t analog (reference: Tokenizing/word_t.cs:9-44)."""

    __slots__ = ("start", "length", "value", "value_upper", "input_type", "extra")

    def __init__(self, start: int, length: int, value: str, value_upper: str,
                 input_type: str, extra: int):
        self.start = start
        self.length = length
        self.value = value
        self.value_upper = value_upper
        self.input_type = input_type
        self.extra = extra

    def __repr__(self) -> str:  # pragma: no cover
        return f"Word({self.value!r}@{self.start}+{self.length},{self.input_type},{self.extra})"


def _ctm(ch: str) -> int:
    cp = ord(ch)
    return CTM_LIST[cp] if cp < BMP else 0


def _sctm(ch: str) -> int:
    cp = ord(ch)
    return SCTM_LIST[cp] if cp < BMP else 0


@lru_cache(maxsize=1 << 16)
def get_input_type(value: str) -> tuple[str, int]:
    """PosTaggerInputTypeProcessor_En.GetPosTaggerInputType
    (PosTaggerInputTypeProcessor.cs:90-312) — rule cascade over per-token char counts."""
    digit = upper = hyphen = punct = lower = dot = roman = 0
    has_umlautes = 0
    for ch in value:
        c = _ctm(ch)
        if c & IS_DIGIT:
            digit += 1
        elif c & IS_LOWER:
            lower += 1
            if ch in _UMLAUTE_CHARS:
                has_umlautes = EWT_HAS_UMLAUTES
        elif c & IS_UPPER:
            upper += 1
            if ch in _UMLAUTE_CHARS:
                has_umlautes = EWT_HAS_UMLAUTES
            elif ch in _ROMAN:
                roman += 1
        elif c & IS_HYPHEN:
            hyphen += 1
            punct += 1
        elif ch == ".":
            dot += 1
            punct += 1
        elif c & IS_PUNCTUATION:
            punct += 1

    length = len(value)
    first = value[0]
    first_ct = _ctm(first)

    is_first_upper = (length > 1) and bool(first_ct & IS_UPPER)
    if dot == 0 and digit != 0:
        if is_first_upper:
            return IT_NUM_CAPITAL, has_umlautes
        if length > 1 and upper != 0:
            for ch in value[1:]:
                c = _ctm(ch)
                if c & IS_UPPER:
                    return IT_NUM_CAPITAL, has_umlautes
                if c & IS_LOWER:
                    break

    if upper != 0:
        if upper > 1:
            if dot == 0:
                if roman == length or roman + hyphen == length:
                    return IT_LATIN_CAPITAL, has_umlautes
                if upper == length or upper + hyphen == length:
                    return IT_ALL_CAPITAL, has_umlautes
            else:
                if upper + dot == length and hyphen == 0:
                    return IT_ALL_CAPITAL_WITH_DOT, has_umlautes
                if upper + dot == length or upper + dot + hyphen == length:
                    return IT_MIX_CAPITAL_WITH_DOT, has_umlautes

        if dot == 0 and (roman == length or roman + hyphen == length):
            return IT_LATIN_CAPITAL, has_umlautes

        if upper == 1 and length == 1:
            return IT_ONE_CAPITAL, has_umlautes

        if dot == 1:
            if length == 2 and (first_ct & IS_UPPER):
                return IT_ONE_CAPITAL_WITH_DOT, has_umlautes
            if length == 3 and (first_ct & IS_HYPHEN) and (_ctm(value[1]) & IS_UPPER):
                return IT_ONE_CAPITAL_WITH_DOT, has_umlautes

        if first_ct & IS_UPPER:
            if upper == 1 and lower + 1 == length:
                return IT_LATIN_FIRST_CAPITAL, has_umlautes
            return IT_MIX_CAPITAL, has_umlautes

        if (first_ct & IS_LOWER) and digit == 0 and dot == 0:
            return IT_FIRST_LOWER_WITH_UPPER, has_umlautes

    if (first_ct & IS_QUOTE) == IS_QUOTE:
        return IT_QUOTE, EWT_PUNCTUATION | has_umlautes

    if lower == 0 and upper == 0 and digit != 0:
        extra = EWT_INTEGER_NUMBER if length == digit else EWT_OTHER
        return IT_NUM, extra | has_umlautes

    if punct != 0:
        if length == 1:
            if first_ct & IS_HYPHEN:
                extra = EWT_DASH
            elif first == ":":
                extra = EWT_COLON
            elif first == ",":
                extra = EWT_COMMA
            else:
                extra = EWT_OTHER
        elif lower != 0 or upper != 0:
            return IT_OTHER, EWT_OTHER | has_umlautes
        else:
            extra = EWT_OTHER
        return IT_OTHER, extra | EWT_PUNCTUATION | has_umlautes

    return IT_OTHER, has_umlautes


def normalize_umlautes_upper(value: str) -> str:
    """UmlautesNormalizer.Normalize_ToUpper (UmlautesNormalizer.cs:50-69)."""
    return "".join(_UMLAUT_UPPER.get(ch, ch) for ch in value)


def _clear_value_original(value: str, extra: int) -> str:
    """Punct canonicalization (Clear_valueOriginal, Tokenizer.cs:1213-1278)."""
    if not (extra & EWT_PUNCTUATION):
        return value
    if len(value) == 1:
        ch = value[0]
        if ch in ":.,;?!()/%&…":
            return value
        c = _ctm(ch)
        if c & IS_HYPHEN:
            return "-" if ch != "-" else value
        if (c & IS_QUOTE) == IS_QUOTE:
            if ch in "\"'[]":
                return value
            return '"'
        return value
    if value == "''":
        return '"'
    if value == ",,":
        return ","
    if value == "--":
        return "-"
    return value


def _is_digits_with_punct_spec_ends(value: str) -> bool:
    """IsDigits_WithPunctuations_WithSpecEnds (Tokenizer.cs:1193-1211)."""
    has_digits = False
    for i, ch in enumerate(value):
        c = _ctm(ch)
        if c & IS_DIGIT:
            has_digits = True
            continue
        if not (c & IS_PUNCTUATION):
            if has_digits:
                return value[i:].casefold() in DIGITS_SPEC_ENDS
            return False
    return has_digits


def to_pos_tagger_token(word: Word, max_ending_length: int) -> str:
    """Word-ending model feature (ToPosTaggerToken, Tokenizer.cs:1282-1334): lowercase
    via the invariant map (ё→е), strip combining marks, keep the last
    ``max_ending_length`` chars prefixed '_' when longer."""
    if word.input_type == IT_NUM:
        return NUM_PLACEHOLDER
    if word.input_type in (IT_URL, IT_EMAIL):
        return URL_PLACEHOLDER
    return ending_token(word.value, max_ending_length)


@lru_cache(maxsize=1 << 16)
def ending_token(token: str, max_ending_length: int) -> str:
    if token == NUM_PLACEHOLDER:
        return NUM_PLACEHOLDER
    lowered = to_lower_invariant(token)
    chars = [ch for ch in lowered if unicodedata.category(ch) != "Mn"]
    d = len(chars) - max_ending_length - 1
    if d >= 0:
        return "_" + "".join(chars[d + 1 :])
    return "".join(chars)


class _SentTokenizer:
    """One reference-callback invocation: tokenize a single sentence span."""

    __slots__ = ("text", "mode", "replace_nums", "words", "start_index", "length",
                 "start_ptr", "end_ptr", "is_prev_num", "last_word_number")

    def __init__(self, text: str, mode: str, replace_nums: bool):
        self.text = text
        self.mode = mode
        self.replace_nums = replace_nums
        self.words: list[Word] = []

    # ---- helpers over the sentence window [start_ptr, end_ptr] ----
    def _is_between_letter_or_digit(self, i: int) -> bool:
        if i <= self.start_ptr:
            return False
        if not (_ctm(self.text[i - 1]) & (IS_LETTER | IS_DIGIT)):
            return False
        p = i + 1
        if p > self.end_ptr:
            return False
        return bool(_ctm(self.text[p]) & (IS_LETTER | IS_DIGIT))

    def _is_between_digit(self, i: int) -> bool:
        if i <= self.start_ptr:
            return False
        if not (_ctm(self.text[i - 1]) & IS_DIGIT):
            return False
        p = i + 1
        if p > self.end_ptr:
            return False
        return bool(_ctm(self.text[p]) & IS_DIGIT)

    def _is_upper_next(self, i: int) -> bool:
        p = i + 1
        if p > self.end_ptr:
            return False
        return bool(_ctm(self.text[p]) & IS_UPPER)

    def _is_digit_next(self, i: int) -> bool:
        p = i + 1
        if p > self.end_ptr:
            return False
        return bool(_ctm(self.text[p]) & IS_DIGIT)

    def _skip_non_letter_digit_to_end(self) -> int:
        """SkipNonLetterAndNonDigitToTheEnd (Tokenizer.cs:985-1012)."""
        text = self.text
        ptr = self.end_ptr
        while ptr >= self.start_ptr:
            c = _ctm(text[ptr])
            if c & (IS_LETTER | IS_DIGIT):
                if c & IS_UPPER:
                    p = ptr - 1
                    if p == self.start_ptr or (
                        self.start_ptr < p and (_ctm(text[p]) & IS_WHITESPACE)
                    ):
                        p = ptr + 1
                        if p == self.end_ptr or (
                            p < self.end_ptr and (_ctm(text[p + 1]) & IS_WHITESPACE)
                        ):
                            if p <= self.end_ptr and text[p] == ".":
                                return p
                return ptr
            ptr -= 1
        return self.start_ptr - 1

    def _merge_punctuation(self, begin_ch: str, i: int) -> tuple[bool, int]:
        """MergePunctuation (Tokenizer.cs:1131-1171): merge same-char runs across
        whitespace; sets self.length; returns (still-inside, new position)."""
        text = self.text
        self.length = 1
        i += 1
        ws_len = 0
        while i <= self.end_ptr:
            ch_next = text[i]
            if _ctm(ch_next) & IS_WHITESPACE:
                ws_len += 1
                i += 1
                continue
            if _sctm(ch_next) & SCT_INTERPRETE_AS_WHITESPACE:
                ws_len += 1
                i += 1
                continue
            if ch_next == begin_ch:
                self.length += ws_len + 1
                ws_len = 0
                i += 1
                continue
            break
        if i > self.end_ptr:
            return False, i
        return True, i - ws_len - 1

    def _try_create_word(self) -> None:
        """TryCreateWordAndPut2List (Tokenizer.cs:897-983)."""
        if self.length == 0:
            return
        text = self.text
        start, length = self.start_index, self.length
        value = text[start : start + length]

        if self.replace_nums:
            if _is_digits_with_punct_spec_ends(value):
                if not self.is_prev_num:
                    self.is_prev_num = True
                    w = Word(start, length, NUM_PLACEHOLDER, NUM_PLACEHOLDER,
                             IT_NUM, EWT_INTEGER_NUMBER)
                    self.last_word_number = w
                    self.words.append(w)
                self.start_index += length
                self.length = 0
                return
            elif self.last_word_number is not None:
                i = 1
                ln = start - self.last_word_number.start
                while i < ln and (_ctm(text[start - i]) & IS_WHITESPACE):
                    i += 1
                self.last_word_number.length = start - self.last_word_number.start - i + 1
                self.last_word_number = None
            self.is_prev_num = False

        value_upper = to_upper_invariant(value)
        input_type, extra = get_input_type(value)
        value = _clear_value_original(value, extra)
        self.words.append(Word(start, length, value, value_upper, input_type, extra))
        self.start_index += length
        self.length = 0

    def run(self, sent_start: int, sent_length: int, urls: tuple[UrlSpan, ...]) -> list[Word]:
        text = self.text
        self.words = []
        self.is_prev_num = False
        self.last_word_number = None
        self.start_index = sent_start
        self.length = 0
        self.start_ptr = sent_start
        self.end_ptr = sent_start + sent_length - 1

        url_idx = 0
        next_url = urls[0].start if urls else len(text) + 1

        really_end = self.end_ptr
        self.end_ptr = self._skip_non_letter_digit_to_end()
        full = self.mode == "full"

        i = self.start_ptr
        while i <= self.end_ptr:
            if next_url <= i:
                self._try_create_word()
                u = urls[url_idx]
                i = u.start + u.length - 1
                url_idx += 1
                next_url = urls[url_idx].start if url_idx < len(urls) else len(text) + 1
                self.start_index = i + 1
                self.length = 0
                i += 1
                continue

            ch = text[i]
            c = _ctm(ch)
            if c & IS_WHITESPACE:
                self._try_create_word()
                self.start_index += 1
                i += 1
                continue

            pct = _sctm(ch)
            if pct & SCT_DOT_CHAR:
                if full:
                    if self._is_upper_next(i):
                        self.length += 1
                        self._try_create_word()
                        i += 1
                        continue
                    # falls through to plain accumulate (dot glues into the word)
                else:
                    if not self._is_digit_next(i):
                        self._try_create_word()
                        ok, i = self._merge_punctuation(ch, i)
                        if not ok:
                            break
                        self._try_create_word()
                        i += 1
                        continue
                    # dot between digits: accumulate
                self.length += 1
                i += 1
                continue

            if pct & SCT_BETWEEN_LETTER_OR_DIGIT:
                if not (c & IS_HYPHEN) and self._is_between_letter_or_digit(i):
                    self.length += 1
                else:
                    self._try_create_word()
                    ok, i = self._merge_punctuation(ch, i)
                    if not ok:
                        break
                    self._try_create_word()
                i += 1
                continue
            elif pct & SCT_BETWEEN_DIGIT:
                if self._is_between_digit(i):
                    self.length += 1
                else:
                    self._try_create_word()
                    ok, i = self._merge_punctuation(ch, i)
                    if not ok:
                        break
                    self._try_create_word()
                i += 1
                continue

            if pct & SCT_TOKENIZE_DIFFERENT_SEPARATELY:
                self._try_create_word()
                ok, i = self._merge_punctuation(ch, i)
                if not ok:
                    break
                self._try_create_word()
                i += 1
                continue

            if pct & SCT_INTERPRETE_AS_WHITESPACE:
                self._try_create_word()
                self.start_index += 1
                i += 1
                continue

            self.length += 1
            i += 1

        self._try_create_word()

        # tail punctuation pass (Tokenizer.cs:604-650)
        self.end_ptr = really_end
        while i <= self.end_ptr:
            ch = text[i]
            if _ctm(ch) & IS_WHITESPACE:
                self._try_create_word()
                self.start_index += 1
                i += 1
                continue
            nct = _sctm(ch)
            if nct & SCT_TOKENIZE_DIFFERENT_SEPARATELY:
                self._try_create_word()
                ok, i = self._merge_punctuation(ch, i)
                if not ok:
                    break
                self._try_create_word()
                i += 1
                continue
            if nct & SCT_INTERPRETE_AS_WHITESPACE:
                self._try_create_word()
                self.start_index += 1
                i += 1
                continue
            self.length += 1
            i += 1

        self._try_create_word()

        # merge url words back, sorted by start (MergeUrlsToWords, Tokenizer.cs:341-351)
        if urls:
            for u in urls:
                v = u.value(text)
                self.words.append(
                    Word(u.start, u.length, v, v,
                         IT_EMAIL if u.type == "Email" else IT_URL, EWT_OTHER)
                )
            self.words.sort(key=lambda w: w.start)
        return self.words


def tokenize_sent(text: str, sent: Sentence, mode: str = "simple",
                  replace_nums: bool = True) -> list[Word]:
    return _SentTokenizer(text, mode, replace_nums).run(sent.start, sent.length, sent.urls)


def run_no_sents_allocate(text: str, replace_nums: bool = True) -> list[Word]:
    """Tokenizer.Run_NoSentsAllocate (Tokenizer.cs:368-383): whole text as one pseudo
    sentence, full-mode dot handling, URLs detected."""
    urls = tuple(allocate_urls(text))
    return _SentTokenizer(text, "full", replace_nums).run(0, len(text), urls)


def run_full_sents_allocate(text: str, replace_nums: bool = True) -> list[tuple[Sentence, list[Word]]]:
    """Tokenizer.___Run___v0___ analog (Tokenizer.cs:385-411): FULL-mode sentence
    split (rule-cascade dot disambiguation, sentsplit_full.py) + full-mode
    tokenization per sentence. Not used by any live reference path; provided for
    inventory completeness (SURVEY.md §2.2 T2)."""
    from .sentsplit_full import split_sentences_full

    out = []
    for sent in split_sentences_full(text):
        words = tokenize_sent(text, sent, mode="full", replace_nums=replace_nums)
        if words:
            out.append((sent, words))
    return out


def run_simple_sents_allocate(text: str, replace_nums: bool = True) -> list[tuple[Sentence, list[Word]]]:
    """Tokenizer.Run_SimpleSentsAllocate (Tokenizer.cs:395-417): simple sentence split,
    then simple-mode tokenization per sentence; empty sentences dropped
    (PosTaggerExtensions.TryTokenizeBySents filters 0-word sentences)."""
    out = []
    for sent in split_sentences_simple(text):
        words = tokenize_sent(text, sent, mode="simple", replace_nums=replace_nums)
        if words:
            out.append((sent, words))
    return out
