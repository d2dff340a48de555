"""Sentence splitter — "simple" mode.

Semantic re-implementation of the reference splitter's simple mode, which is the mode its
own service pipeline uses (reference: sentSplitting/SentSplitter.cs:532-819
``AllocateSents_Simple`` — "split only by '. \\r\\n'"; selection:
Tokenizing/PosTaggerExtensions.cs:61-79 ``TryTokenizeBySents`` → ``Run_SimpleSentsAllocate``).

Rules reproduced:
 * detected URL/Email spans are skipped (never split inside) and attached to the sentence
   (SentSplitter.cs:549-558);
 * '.' ends a sentence only when followed by whitespace-only up to a newline or end-of-text
   (``TrySkipWhiteSpacesUntilCRLForEOF`` SentSplitter.cs:1566-1582), unless the word before
   the dot is a street-end abbreviation (-Allee./-Str./-Platz., SentSplitter.cs:576-583,
   2422-2443);
 * '…' / '!' / '?' end a sentence per ``IsEndOfSentTDQMEP`` (SentSplitter.cs:1240-1327;
   bracket/quote counters are never incremented in simple mode — SentSplitter.cs:601-632
   is commented out — so they are 0 here), with trailing punctuation absorbed
   (``SkipFollowPunctuation`` SentSplitter.cs:1552-1564);
 * sentences consisting entirely of whitespace/punctuation are dropped
   (``IsCurrentSentContainsPunctuationOrWhitespace`` SentSplitter.cs:2741-2861).
"""

from __future__ import annotations

from typing import NamedTuple

from .chartypes import (
    CTM,
    CTM_LIST,
    SENT_CTM_LIST,
    BMP,
    IS_BRACKET_LEFT,
    IS_BRACKET_RIGHT,
    IS_LOWER,
    IS_PUNCTUATION,
    IS_WHITESPACE,
    SENT_AFTER_BRACKET_ALLOWED_PUNCT_4QMEP,
    SENT_AFTER_THREE_DOT_ALLOWED_PUNCT,
    SENT_CTM,
    SENT_DOT,
    SENT_EXCLUDE_IN_BRACKET_AND_QUOTE,
    SENT_THREE_DOT,
    SENT_UNCONDITIONAL,
)
from .resources import STREETS_ENDS_COMPLEX, STREETS_ENDS_SEPARATE
from .urldetect import UrlSpan, allocate_urls


class Sentence(NamedTuple):
    start: int
    length: int
    urls: tuple[UrlSpan, ...]

    def value(self, text: str) -> str:
        return text[self.start : self.start + self.length]


def _ct(text: str, i: int) -> int:
    if 0 <= i < len(text):
        cp = ord(text[i])
        return CTM_LIST[cp] if cp < BMP else 0
    return 0


def _sct(text: str, i: int) -> int:
    if 0 <= i < len(text):
        cp = ord(text[i])
        return SENT_CTM_LIST[cp] if cp < BMP else 0
    return 0


def _is_all_punct_or_ws(text: str, start: int, length: int) -> bool:
    for k in range(start, start + length):
        c = _ct(text, k)
        if not (c & (IS_WHITESPACE | IS_PUNCTUATION)):
            return False
    return True


def _left_word_before(text: str, dot_pos: int, sent_start: int) -> str:
    """The word ending at ``dot_pos`` (dot inclusive), bounded left by whitespace /
    non-hyphen punctuation / an inner dot — the left-word ``TokenizeVicinityOfDot``
    builds (SentSplitter.cs:1600-1809), sufficient for the street-ends check."""
    j = dot_pos - 1
    while j >= sent_start:
        ch = text[j]
        c = _ct(text, j)
        if ch == "." or (c & IS_WHITESPACE):
            break
        if (c & IS_PUNCTUATION) and ch not in "-—–":
            break
        j -= 1
    return text[j + 1 : dot_pos + 1]


def _is_street_end(word: str) -> bool:
    if word in STREETS_ENDS_SEPARATE:
        return True
    return any(word.endswith(s) for s in STREETS_ENDS_COMPLEX)


def _is_end_of_sent_tdqmep(text: str, i: int, sct: int) -> bool:
    """IsEndOfSentTDQMEP with _OpenBrakets/_OpenQuotas == 0 (simple mode)."""
    n = len(text)
    if sct & SENT_THREE_DOT:
        was_some_punct = False
        c = 0
        p = i + 1
        while True:
            if p >= n:
                return True
            c = _ct(text, p)
            if (c & IS_BRACKET_RIGHT) == IS_BRACKET_RIGHT:
                return True  # wasSomePunctuation or _OpenBrakets <= 0 — both true here
            if _sct(text, p) & SENT_AFTER_THREE_DOT_ALLOWED_PUNCT:
                was_some_punct = True
            elif not (c & IS_WHITESPACE):
                break
            p += 1
        if c & IS_LOWER:
            return False
        return True
    # '!' / '?'
    p = i + 1
    while p < n:
        c = _ct(text, p)
        if (c & IS_BRACKET_LEFT) == IS_BRACKET_LEFT or (c & IS_BRACKET_RIGHT) == IS_BRACKET_RIGHT:
            p += 1
            while True:
                if p >= n:
                    return False
                if _sct(text, p) & SENT_AFTER_BRACKET_ALLOWED_PUNCT_4QMEP:
                    return False
                c = _ct(text, p)
                if not (c & IS_WHITESPACE) and not (c & IS_PUNCTUATION):
                    return True
                p += 1
        if not (c & IS_WHITESPACE) and not (c & IS_PUNCTUATION):
            break
        p += 1
    return True


def split_sentences_simple(text: str) -> list[Sentence]:
    """AllocateSents_Simple over the whole text; returns char-offset sentence spans with
    their contained URL spans."""
    n = len(text)
    urls = allocate_urls(text)
    sents: list[Sentence] = []

    cur_start = 0
    cur_urls: list[UrlSpan] = []
    url_idx = 0
    next_url_start = urls[0].start if urls else n + 1

    def emit(end: int) -> None:
        nonlocal cur_start, cur_urls
        length = end - cur_start
        if length <= 0:
            return
        if not _is_all_punct_or_ws(text, cur_start, length):
            sents.append(Sentence(cur_start, length, tuple(cur_urls)))
        cur_start = end
        cur_urls = []

    i = 0
    while True:
        if url_idx < len(urls) and next_url_start <= i:
            u = urls[url_idx]
            cur_urls.append(u)
            i = u.start + u.length
            url_idx += 1
            next_url_start = urls[url_idx].start if url_idx < len(urls) else n + 1
            continue
        if i >= n:
            break
        sct = _sct(text, i)
        if sct & SENT_DOT:
            # TrySkipWhiteSpacesUntilCRLForEOF — always advances past the dot
            j = i + 1
            hit = False
            while True:
                if j >= n or (_sct(text, j) & SENT_UNCONDITIONAL):
                    hit = True
                    break
                if not (_ct(text, j) & IS_WHITESPACE):
                    break
                j += 1
            if hit:
                i_dot = i
                i = j
                word = _left_word_before(text, i_dot, cur_start)
                if word and _is_street_end(word):
                    i += 1  # sent-not-end (SentSplitter.cs:576-583)
                    continue
                emit(i)
                continue
            # not a sentence end: resume after the stop char (C# falls through to _Ptr++)
            i = j + 1
            continue
        if sct & SENT_EXCLUDE_IN_BRACKET_AND_QUOTE:
            if _is_end_of_sent_tdqmep(text, i, sct):
                # SkipFollowPunctuation
                i += 1
                while i < n:
                    c = _ct(text, i)
                    if not (c & IS_PUNCTUATION) or (_sct(text, i) & SENT_UNCONDITIONAL):
                        break
                    i += 1
                emit(i)
                continue
            i += 1
            continue
        i += 1

    emit(n)
    return sents
