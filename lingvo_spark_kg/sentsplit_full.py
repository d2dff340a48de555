"""Sentence splitter — FULL mode (rule-cascade dot disambiguation).

Semantic re-implementation of the reference's full splitter
(reference: sentSplitting/SentSplitter.cs:254-528 ``AllocateSents``): newline is an
unconditional end; bracket/quote nesting counters gate '…'/'!'/'?' ends
(IsEndOfSentTDQMEP, SentSplitter.cs:1240-1327); a '.' runs the decision cascade —
digit-adjacency → dot-vicinity tokenization (SentSplitter.cs:1600-1920) →
before-proper-or-number / before-no-proper abbreviation n-grams
(SentSplitter.cs:2011-2092) → three-dots (1953-2009) → single-upper-char (2093-2212)
→ file extensions (2333-2367) → street-ends (2444-2481) → other-situation (2213-2302)
→ end-of-quoting (2368-2408) → numbered-list items (2409-2421) → default end.

NOTE: no live code path in the reference reaches this mode (its console demo uses
Run_NoSentsAllocate, its web service uses AllocateSents_Simple; AllocateSents is only
reachable via the unused ``___Run___v0___`` API — Tokenizer.cs:385-411). It is
implemented here for inventory completeness (SURVEY.md §2.2 T2); the pipeline default
remains the simple mode the reference actually runs.

Resource tables (file extensions, abbreviation lists) are loaded from
``sentsplit_tables.json.gz``, generated from the reference's public
sent-splitter-resources.xml. None of the shipped abbreviation entries set the
digits-before/slash-before/digits-after/unstick-from-digits attributes, so those
exception branches (SentSplitter.cs:2024-2046,1756-1799) are statically false and
omitted here.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import NamedTuple

from .chartypes import (
    BMP,
    CTM_LIST,
    SENT_AFTER_BRACKET_ALLOWED_PUNCT_4QMEP,
    SENT_AFTER_THREE_DOT_ALLOWED_PUNCT,
    IS_BRACKET,
    IS_BRACKET_LEFT,
    IS_BRACKET_RIGHT,
    IS_DIGIT,
    IS_HYPHEN,
    IS_LETTER,
    IS_PUNCTUATION,
    IS_QUOTE,
    IS_QUOTE_DOUBLE_SIDED,
    IS_QUOTE_LEFT,
    IS_QUOTE_RIGHT,
    IS_UPPER,
    IS_WHITESPACE,
    SENT_CTM_LIST,
    SENT_DOT,
    SENT_EXCLUDE_IN_BRACKET_AND_QUOTE,
    SENT_THREE_DOT,
    SENT_UNCONDITIONAL,
    UIM,
    to_upper_invariant,
)
from .resources import STREETS_ENDS_COMPLEX

_STREETS_ENDS_COMPLEX_MIN_LEN = min(map(len, STREETS_ENDS_COMPLEX))
from .sentsplit import Sentence, _is_all_punct_or_ws
from .urldetect import UrlSpan, allocate_urls

_TABLES_PATH = os.path.join(os.path.dirname(__file__), "sentsplit_tables.json.gz")
with gzip.open(_TABLES_PATH, "rt", encoding="utf-8") as _f:
    _T = json.load(_f)

FILE_EXTENSIONS = frozenset(_T["file_extensions"])
FILE_EXTENSIONS_MAX_LENGTH = max(map(len, FILE_EXTENSIONS))
def _ngram_words(entry: str) -> tuple[str, ...]:
    """GetWordsArray (Infrastructure/Extensions.cs:104-147): split the entry by dots,
    then each dot-segment by spaces; the last space-word of each segment gets the dot
    re-appended ("i.e." → ["i.","e."]; "et al." → ["et","al."]; "lb. av." →
    ["lb.","av."])."""
    out: list[str] = []
    for seg in entry.split("."):
        seg = seg.strip()
        if not seg:
            continue
        parts = seg.split()
        if len(parts) == 1:
            out.append(parts[0] + ".")
        else:
            out.extend(parts[:-1])
            out.append(parts[-1] + ".")
    return tuple(out)


BEFORE_NO_PROPER = [_ngram_words(e) for e in _T["before_no_proper"]]
BEFORE_PROPER_OR_NUMBER = [_ngram_words(e) for e in _T["before_proper_or_number"]]
NGRAM_MAX = max(len(w) for w in BEFORE_NO_PROPER + BEFORE_PROPER_OR_NUMBER)
NGRAM_MAX_LENGTH_2_LEFT = 3   # SentSplitter.cs:183
NGRAM_MAX_LENGTH_2_RIGHT = NGRAM_MAX - 1  # SentSplitter.cs:224


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


class SSWord(NamedTuple):
    start: int
    end: int  # exclusive

    def value(self, text: str) -> str:
        return text[self.start : self.end]


class _Vicinity:
    """dot_vicinity_t analog: words around the dot as one left-to-right list.
    left_idx = index of _LeftWord (closest word left of the dot); words[left_idx+1:]
    are the right words; words[:left_idx] the further-left words."""

    __slots__ = ("words", "left_idx")

    def __init__(self, words: list[SSWord], left_idx: int):
        self.words = words
        self.left_idx = left_idx

    @property
    def has_words(self) -> bool:
        return bool(self.words)

    def left(self) -> SSWord | None:
        return self.words[self.left_idx] if self.left_idx >= 0 else None

    def right(self) -> SSWord | None:
        k = self.left_idx + 1
        return self.words[k] if k < len(self.words) else None

    def prev_of_left(self) -> SSWord | None:
        return self.words[self.left_idx - 1] if self.left_idx >= 1 else None

    def after(self, idx: int) -> SSWord | None:
        return self.words[idx + 1] if idx + 1 < len(self.words) else None


def _is_degree(ch: str) -> bool:
    return ch in "°º"


def tokenize_vicinity_of_dot(text: str, dot: int, left_border: int) -> _Vicinity:
    """TokenizeVicinityOfDot (SentSplitter.cs:1600-1920): up to 3 words to the left
    (split at dots / whitespace / degree signs / non-hyphen punctuation; dots glue to
    the word on their left), up to NGRAM_MAX_LENGTH_2_RIGHT words to the right."""
    n = len(text)
    left_words: list[SSWord] = []  # built rightmost-first, reversed at the end

    if left_border < dot:
        start = dot
        lp = dot - 1
        while True:
            if lp <= left_border:
                c0 = _ct(text, lp)
                lp2 = lp
                if c0 & IS_WHITESPACE:
                    lp2 += 1
                length = start - lp2
                if length > 0:
                    if (c0 & IS_PUNCTUATION) and not (c0 & IS_WHITESPACE):
                        left_words.append(SSWord(lp2 + 1, lp2 + 1 + length))
                        left_words.append(SSWord(lp2, lp2 + 1))
                    else:
                        # includes the dot at `start` (ss_word_t(left_ptr, length+1),
                        # SentSplitter.cs:1640)
                        left_words.append(SSWord(lp2, lp2 + length + 1))
                break
            ch = text[lp]
            c = _ct(text, lp)
            if ch == ".":
                length = start - lp
                if length > 0:
                    left_words.append(SSWord(lp + 1, lp + 1 + length))
                    if len(left_words) >= NGRAM_MAX_LENGTH_2_LEFT:
                        break
                    start = lp
            elif c & IS_WHITESPACE:
                length = start - lp
                if length > 0:
                    left_words.append(SSWord(lp + 1, lp + 1 + length))
                    if len(left_words) >= NGRAM_MAX_LENGTH_2_LEFT:
                        break
                    start = lp - 1
                else:
                    start = lp
            elif _is_degree(ch):
                length = start - lp
                if length > 0:
                    left_words.append(SSWord(lp + 1, lp + 1 + length))
                    if len(left_words) >= NGRAM_MAX_LENGTH_2_LEFT:
                        break
                    start = lp - 1
                else:
                    start = lp
                left_words.append(SSWord(lp, lp + 1))
                if len(left_words) >= NGRAM_MAX_LENGTH_2_LEFT:
                    break
            elif (c & IS_PUNCTUATION) and not (c & IS_HYPHEN):
                length = start - lp
                if length > 0:
                    left_words.append(SSWord(lp + 1, lp + 1 + length))
                    if len(left_words) >= NGRAM_MAX_LENGTH_2_LEFT:
                        break
                    start = lp
            # digits: UnstickFromDigits set is empty in the shipped tables → no-op
            lp -= 1

    words = list(reversed(left_words))
    left_idx = len(words) - 1

    # right scan (SentSplitter.cs:1811-1915)
    start = dot + 1
    rp = start
    n_right = 0
    while True:
        if rp >= n:
            if rp - start > 0:
                words.append(SSWord(start, rp))
            break
        ch = text[rp]
        c = _ct(text, rp)
        if ch == ".":
            length = rp - start
            if length > 0:
                if text[start] == ".":
                    # run of dots + following punct/ws absorbed (SentSplitter.cs:1843-1856)
                    rp += 1
                    while rp < n:
                        c2 = _ct(text, rp)
                        if (not (c2 & IS_PUNCTUATION) and not (c2 & IS_WHITESPACE)) or (
                            _sct(text, rp) & SENT_UNCONDITIONAL
                        ):
                            break
                        rp += 1
                    rp -= 1
                words.append(SSWord(start, rp + 1))
                n_right += 1
                if n_right >= NGRAM_MAX_LENGTH_2_RIGHT:
                    break
                start = rp + 1
            else:
                start = rp
        elif c & IS_WHITESPACE:
            length = rp - start
            if length > 0:
                words.append(SSWord(start, rp))
                n_right += 1
                if n_right >= NGRAM_MAX_LENGTH_2_RIGHT:
                    break
            start = rp + 1
        elif (c & IS_PUNCTUATION) and not (c & IS_HYPHEN):
            length = rp - start
            if length > 0:
                words.append(SSWord(start, rp))
                n_right += 1
                if n_right >= NGRAM_MAX_LENGTH_2_RIGHT:
                    break
                start = rp
        rp += 1

    return _Vicinity(words, left_idx)


def _find_head2left(vic: _Vicinity, text: str, table: list[tuple[str, ...]]):
    """Searcher.FindOfHead2Left(_LeftWord) analog (Searcher.cs:441-473): longest ngram
    whose word sequence matches [left word, right words...]; returns
    (last matched word, length) or None. Word comparison is case-sensitive exact
    (the trie stores the raw entry words)."""
    if vic.left_idx < 0:
        return None
    chain = vic.words[vic.left_idx :]
    best = None
    for entry in table:
        k = len(entry)
        if k > len(chain):
            continue
        if all(chain[i].value(text) == entry[i] for i in range(k)):
            if best is None or k > best[1]:
                best = (chain[k - 1], k)
    return best


def _try_before_lists(vic: _Vicinity, text: str, dot: int) -> int | None:
    """Try_BeforeProperOrNumber_BeforeNoProper (SentSplitter.cs:2011-2092), with the
    attribute-driven exception branches omitted (no shipped entry sets them).
    Positive return = sentence end at dot+offset; negative = not-end, skip |offset|."""
    pon = _find_head2left(vic, text, BEFORE_PROPER_OR_NUMBER)
    np = _find_head2left(vic, text, BEFORE_NO_PROPER)
    if np is not None:
        if pon is not None and np[1] < pon[1]:
            return -(pon[0].end - dot)
        last = np[0]
        idx = vic.words.index(last)
        nxt = vic.after(idx)
        if nxt is not None and (_ct(text, nxt.start) & IS_UPPER):
            return last.end - dot
        return -(last.end - dot)
    if pon is not None:
        return -(pon[0].end - dot)
    return None


def _try_three_dots(vic: _Vicinity, text: str, dot: int) -> int | None:
    """TryGetThreeDotsLength (SentSplitter.cs:1953-2009)."""
    right = vic.right()
    if right is None:
        return None
    rv = right.value(text)
    if len(rv) == 1:
        if _sct(text, right.start) & SENT_DOT:
            idx = vic.left_idx + 1
            nxt = vic.after(idx)
            if nxt is not None and (_sct(text, nxt.start) & SENT_DOT):
                offset = nxt.end - dot
                nxt2 = vic.after(idx + 1)
                if nxt2 is not None and (_ct(text, nxt2.start) & 0x2):  # IS_LOWER
                    return -offset
                return offset
    elif (_sct(text, right.start) & SENT_DOT) and (_sct(text, right.start + 1) & SENT_DOT):
        offset = right.end - dot
        nxt = vic.after(vic.left_idx + 1)
        if nxt is not None and (_ct(text, nxt.start) & 0x2):
            return -offset
        return offset
    return None


def _chars_set_type(value: str) -> str:
    """GetCharsSetType (SentSplitter.cs:2697-2721): '', 'lat', 'cyr', or 'mixed'."""
    lat = cyr = False
    for ch in value:
        if not (_ctv(ch) & IS_LETTER):
            continue
        if ord(ch) <= 127:
            lat = True
        elif "А" <= ch <= "я":
            cyr = True
    if lat and cyr:
        return "mixed"
    if lat:
        return "lat"
    if cyr:
        return "cyr"
    return ""


def _ctv(ch: str) -> int:
    cp = ord(ch)
    return CTM_LIST[cp] if cp < BMP else 0


def _is_first_word_in_sent(vic: _Vicinity, text: str, idx: int, left_border: int) -> bool:
    """IsFirstWordInSent (SentSplitter.cs:2862-2881): no letter/digit between the
    left border (sentence start or end of the last URL, GetMaxPtr) and this word."""
    if idx >= 1:
        w = vic.words[idx]
        for p in range(w.start - 1, left_border - 1, -1):
            c = _ct(text, p)
            if c & (IS_LETTER | IS_DIGIT):
                return False
    return True


def _try_single_upper_char(vic: _Vicinity, text: str, left_border: int) -> int | None:
    """TryGetSingleUpperChar (SentSplitter.cs:2093-2212)."""
    left = vic.left()
    if left is None or (left.end - left.start) != 2:
        return None
    first = text[left.start]
    if not (_ctv(first) & IS_UPPER):
        return None
    right = vic.right()
    rv = right.value(text) if right is not None else ""
    r_upper = bool(rv) and bool(_ctv(rv[0]) & IS_UPPER)

    if r_upper:
        lcst = _chars_set_type(left.value(text))
        rcst = _chars_set_type(rv)
        if (lcst == "cyr" and rcst == "lat") or (lcst == "lat" and rcst == "cyr"):
            return 1

    prev = vic.prev_of_left()
    pv = prev.value(text) if prev is not None else ""
    p_upper = bool(pv) and bool(_ctv(pv[0]) & IS_UPPER)

    if (len(pv) > 3 and p_upper and len(rv) >= 3 and r_upper
            and not _is_first_word_in_sent(vic, text, vic.left_idx - 1, left_border)):
        return 1
    if r_upper and first in "IVX" and len(rv) >= 3:
        return 1
    if pv and first in "CFСФ" and _is_degree(pv[0]):
        return 1
    return -1


def _try_file_extension(vic: _Vicinity, text: str, dot: int) -> int:
    """TryGetFileExtensionLength (SentSplitter.cs:2333-2367): the word glued to the
    right of the dot is a known extension → not an end."""
    right = vic.right()
    if right is not None and right.start - dot == 1:
        rv = right.value(text)
        if len(rv) <= FILE_EXTENSIONS_MAX_LENGTH:
            if to_upper_invariant(rv) in FILE_EXTENSIONS:
                return len(rv) + 1
    return 0


def _try_streets_ends_complex(vic: _Vicinity, text: str) -> int:
    """TryGetStreetsEndsAsEndComplexWordLength (SentSplitter.cs:2444-2457): left word
    (skipping whitespace-valued) suffix-matches a complex street end; the match must be
    longer than the shortest entry (StreetsEnds.cs HasStreetEnds min-length guard)."""
    min_len = _STREETS_ENDS_COMPLEX_MIN_LEN
    for k in range(vic.left_idx, -1, -1):
        v = vic.words[k].value(text)
        if not v.strip():
            continue
        if len(v) > min_len and any(v.endswith(s) for s in STREETS_ENDS_COMPLEX):
            return 1
        break
    return 0


def _length_without_edge_punct(value: str) -> int:
    i, j = 0, len(value) - 1
    while i < len(value) and (_ctv(value[i]) & IS_PUNCTUATION):
        i += 1
    while j > i and (_ctv(value[j]) & IS_PUNCTUATION):
        j -= 1
    return j + 1 - i


def _is_letters_ends_with_digit(value: str) -> bool:
    j = len(value) - 1
    while j >= 0 and (_ctv(value[j]) & IS_PUNCTUATION):
        j -= 1
    if j < 0:
        return False
    return bool(_ctv(value[j]) & IS_DIGIT) and bool(_ctv(value[0]) & IS_LETTER)


def _is_upper_after_first(value: str) -> bool:
    """IsUpperCharsAfterFirstChar: punctuation chars are skipped
    (SentSplitter.cs:2615-2621), so the glued trailing dot does not fail the check."""
    for ch in value[1:]:
        c = _ctv(ch)
        if c & IS_PUNCTUATION:
            continue
        if not (c & IS_UPPER):
            return False
    return True


def _try_other_situation(vic: _Vicinity, text: str) -> int | None:
    """TryOtherSituation (SentSplitter.cs:2213-2302)."""
    left, right = vic.left(), vic.right()
    if left is None or right is None:
        return None
    lv, rv = left.value(text), right.value(text)
    if len(lv) <= 1:
        return None
    if _is_letters_ends_with_digit(lv):
        return 1 if (_ctv(rv[0]) & IS_UPPER) else -1
    if _ctv(lv[0]) & IS_UPPER:
        if len(rv) >= 3:
            r_upper = bool(_ctv(rv[0]) & IS_UPPER)
            if _is_upper_after_first(lv):
                return 1 if r_upper else -1
            if r_upper and _length_without_edge_punct(lv) <= 2:
                lcst, rcst = _chars_set_type(lv), _chars_set_type(rv)
                if (lcst == "cyr" and rcst == "lat") or (lcst == "lat" and rcst == "cyr"):
                    return 1
                return -1
    return None


def _try_end_of_quoting(vic: _Vicinity, text: str, dot: int) -> int:
    """TryEndOfQuotingLength (SentSplitter.cs:2368-2408)."""
    right = vic.right()
    if right is None:
        return 0
    rv = right.value(text)
    if rv[0] in ",;:":
        return 1
    if len(rv) == 1:
        if (_ctv(rv[0]) & IS_QUOTE) == IS_QUOTE:
            idx = vic.left_idx + 1
            nxt = vic.after(idx)
            if nxt is not None and (_ctv(text[nxt.start]) & IS_HYPHEN):
                return nxt.end - dot
    elif (_ctv(rv[0]) & IS_QUOTE) == IS_QUOTE and (_ctv(rv[1]) & IS_HYPHEN):
        return right.end - dot
    return 0


def _try_list_item(vic: _Vicinity, text: str) -> int:
    """TryListLength (SentSplitter.cs:2409-2421): a sentence that is just digits+dot
    attaches to the next one."""
    left = vic.left()
    if left is not None and vic.left_idx == 0:
        v = left.value(text)
        if all(_ctv(ch) & IS_DIGIT for ch in v[:-1]) and len(v) >= 1:
            return 1
    return 0


class _FullSplitter:
    def __init__(self, text: str):
        self.text = text
        self.n = len(text)
        self.sents: list[Sentence] = []
        self.cur_start = 0
        self.cur_urls: list[UrlSpan] = []
        self.open_brackets = 0
        self.open_quotas = 0
        self.open_quota_ds = False
        self.end_url = -1

    def _emit(self, end: int) -> None:
        length = end - self.cur_start
        if length > 0:
            if not _is_all_punct_or_ws(self.text, self.cur_start, length):
                self.sents.append(Sentence(self.cur_start, length, tuple(self.cur_urls)))
            self.cur_start = end
            self.cur_urls = []
        self.open_brackets = 0
        self.open_quotas = 0
        self.open_quota_ds = False

    def _is_end_tdqmep(self, i: int, sct: int) -> bool:
        """IsEndOfSentTDQMEP with live bracket/quote counters (full mode)."""
        text, n = self.text, self.n
        if sct & SENT_THREE_DOT:
            was_punct = False
            c = 0
            p = i + 1
            while True:
                if p >= n:
                    return True
                c = _ct(text, p)
                if (c & IS_BRACKET_RIGHT) == IS_BRACKET_RIGHT:
                    if was_punct:
                        return True
                    return self.open_brackets <= 0
                if _sct(text, p) & SENT_AFTER_THREE_DOT_ALLOWED_PUNCT:
                    was_punct = True
                elif not (c & IS_WHITESPACE):
                    break
                p += 1
            if c & 0x2:  # IS_LOWER
                return False
            return True
        if self.open_brackets == 1 or self.open_quotas == 1 or self.open_quota_ds:
            return False
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

    def run(self) -> list[Sentence]:
        text, n = self.text, self.n
        urls = allocate_urls(text)
        url_idx = 0
        next_url = urls[0].start if urls else n + 1
        i = 0
        while True:
            if url_idx < len(urls) and next_url <= i:
                u = urls[url_idx]
                self.cur_urls.append(u)
                i = self.end_url = u.start + u.length
                url_idx += 1
                next_url = urls[url_idx].start if url_idx < len(urls) else n + 1
                continue
            if i >= n:
                break
            sct = _sct(text, i)
            if sct == SENT_UNCONDITIONAL:
                i += 1
                self._emit(i)
                continue
            c = _ct(text, i)
            # bracket/quote nesting counters (SentSplitter.cs:304-334)
            if c & (IS_QUOTE | IS_BRACKET):
                if (c & IS_BRACKET_LEFT) == IS_BRACKET_LEFT:
                    self.open_brackets += 1
                elif (c & IS_BRACKET_RIGHT) == IS_BRACKET_RIGHT:
                    self.open_brackets -= 1
                elif (c & IS_QUOTE_LEFT) == IS_QUOTE_LEFT:
                    if (c & IS_QUOTE_DOUBLE_SIDED) == IS_QUOTE_DOUBLE_SIDED:
                        self.open_quota_ds = not self.open_quota_ds
                    else:
                        self.open_quotas += 1
                elif (c & IS_QUOTE_RIGHT) == IS_QUOTE_RIGHT:
                    if (c & IS_QUOTE_DOUBLE_SIDED) == IS_QUOTE_DOUBLE_SIDED:
                        self.open_quota_ds = not self.open_quota_ds
                    else:
                        self.open_quotas -= 1
            if sct & SENT_EXCLUDE_IN_BRACKET_AND_QUOTE:
                if self._is_end_tdqmep(i, sct):
                    # SkipFollowPunctuation
                    i += 1
                    while i < n:
                        c2 = _ct(text, i)
                        if not (c2 & IS_PUNCTUATION) or (_sct(text, i) & SENT_UNCONDITIONAL):
                            break
                        i += 1
                    self._emit(i)
                    continue
                i += 1
                continue
            if sct & SENT_DOT:
                # digit on both sides (no space) → not an end (SentSplitter.cs:1584-1598)
                if (_ct(text, i + 1) & IS_DIGIT) and (i == 0 or (_ct(text, i - 1) & IS_DIGIT)):
                    i += 1
                    continue
                left_border = max(self.cur_start, self.end_url)
                vic = tokenize_vicinity_of_dot(text, i, left_border)
                if not vic.has_words:
                    i += 1
                    continue
                off = _try_before_lists(vic, text, i)
                if off is not None:
                    if off < 0:
                        i += -off
                    else:
                        i += off
                        self._emit(i)
                    continue
                off = _try_three_dots(vic, text, i)
                if off is not None:
                    if off < 0:
                        i += -off
                    else:
                        i += off
                        self._emit(i)
                    continue
                off = _try_single_upper_char(vic, text, left_border)
                if off is not None:
                    if off < 0:
                        i += -off
                    else:
                        i += off
                        self._emit(i)
                    continue
                ln = _try_file_extension(vic, text, i)
                if ln > 0:
                    i += ln
                    continue
                ln = _try_streets_ends_complex(vic, text)
                if ln > 0:
                    i += ln
                    continue
                off = _try_other_situation(vic, text)
                if off is not None:
                    if off < 0:
                        i += -off
                    else:
                        i += off
                        self._emit(i)
                    continue
                ln = _try_end_of_quoting(vic, text, i)
                if ln > 0:
                    i += ln
                    continue
                ln = _try_list_item(vic, text)
                if ln > 0:
                    i += ln
                    continue
                i += 1
                self._emit(i)
                continue
            i += 1
        # last sentence (no counter reset — SetLastSentAndCallback)
        length = n - self.cur_start
        if length > 0 and not _is_all_punct_or_ws(text, self.cur_start, length):
            self.sents.append(Sentence(self.cur_start, length, tuple(self.cur_urls)))
        return self.sents


def split_sentences_full(text: str) -> list[Sentence]:
    """AllocateSents over the whole text (full rule cascade)."""
    return _FullSplitter(text).run()
