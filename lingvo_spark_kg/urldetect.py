"""URL / e-mail span detector.

Semantic re-implementation of the reference's table-driven detector
(reference: PosTagger/Lingvo.PosTagger.Tokenizing/sentSplitting/UrlDetector/UrlDetector.cs:234-687):
scan for '.' and ':' trigger chars; at '.', try a "www." match then a first-level-domain
table match (with recursion across dotted labels); at ':', try a URI-scheme table match.
Spans grow left/right to IsUrlBreak boundaries with punctuation back-off; '@' (incl. the
"(at)"/"[at]" obfuscations) marks Email.

Pure-Python core; the Spark layer calls it per sentence inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from typing import NamedTuple

from .chartypes import (
    CTM,
    CTM_LIST,
    UIM,
    BMP,
    IS_LETTER,
    IS_PUNCTUATION,
    IS_URI_SCHEMES_CHAR,
    IS_URL_BREAK,
    IS_WHITESPACE,
)
from .resources import (
    FIRST_LEVEL_DOMAINS,
    FIRST_LEVEL_DOMAINS_MAX_LENGTH,
    URI_SCHEMES,
    URI_SCHEMES_MAX_LENGTH,
)

URL_TYPE_URL = "Url"
URL_TYPE_EMAIL = "Email"


class UrlSpan(NamedTuple):
    start: int
    length: int
    type: str

    def value(self, text: str) -> str:
        return text[self.start : self.start + self.length]


def _ct(text: str, i: int) -> int:
    """CHARTYPE_MAP lookup with the C# '\\0'-terminator convention: out-of-range reads
    behave like '\\0' (which is flagged IsUrlBreak, nothing else)."""
    if 0 <= i < len(text):
        cp = ord(text[i])
        return CTM_LIST[cp] if cp < BMP else 0
    return IS_URL_BREAK


def _upper(text: str, i: int) -> str:
    cp = ord(text[i])
    return chr(UIM[cp]) if cp < BMP else text[i]


class _Detector:
    __slots__ = ("text", "n", "i", "urls")

    def __init__(self, text: str):
        self.text = text
        self.n = len(text)
        self.i = 0
        self.urls: list[UrlSpan] = []

    # UrlDetector.cs:523-564
    def _find_url_end_on_the_right(self, offset: int) -> int:
        text, n, i = self.text, self.n, self.i
        right_len = offset
        while True:
            j = i + right_len
            ctj = _ct(text, j)
            if ctj & IS_URL_BREAK:
                right_len -= 1
                while right_len >= 0:
                    ch = text[i + right_len]
                    if ch == "/":
                        break
                    if not (_ct(text, i + right_len) & IS_PUNCTUATION):
                        break
                    right_len -= 1
                break
            right_len += 1
        return right_len if right_len > 0 else 0

    # UrlDetector.cs:568-626
    def _find_url_end_on_the_left(self, offset: int) -> tuple[int, str]:
        text, i = self.text, self.i
        left_len = offset
        url_type = URL_TYPE_URL

        def back_off(ll: int) -> tuple[int, str]:
            ut = URL_TYPE_URL
            while ll >= 0:
                ch = text[i - ll]
                if ch == "/":
                    break
                c = _ct(text, i - ll)
                if c & IS_WHITESPACE:
                    ll -= 1
                    continue
                if not (c & IS_PUNCTUATION):
                    if self._is_email(ll):
                        ut = URL_TYPE_EMAIL
                    break
                ll -= 1
            return ll, ut

        while True:
            p = i - left_len
            if p <= 0:
                if p < 0:
                    left_len += p  # clamp to start of text
                left_len, url_type = back_off(left_len)
                break
            if _ct(text, p) & IS_URL_BREAK:
                left_len, url_type = back_off(left_len - 1)
                break
            left_len += 1
        return (left_len if left_len > 0 else 0), url_type

    # UrlDetector.cs:628-671
    def _is_email(self, start_back: int) -> bool:
        text, i, n = self.text, self.i, self.n
        for back in range(start_back, -1, -1):
            p = i - back
            ch = text[p]
            if ch == "@":
                return True
            if ch == "(" and p + 3 < n:
                if _upper(text, p + 1) == "A" and _upper(text, p + 2) == "T" and text[p + 3] == ")":
                    return True
            elif ch == "[" and p + 3 < n:
                if _upper(text, p + 1) == "A" and _upper(text, p + 2) == "T" and text[p + 3] == "]":
                    return True
        return False

    # UrlDetector.cs:316-354
    def _try_www(self) -> UrlSpan | None:
        text, i = self.text, self.i
        if i - 3 < 0:
            return None
        if not (_upper(text, i - 1) == "W" and _upper(text, i - 2) == "W" and _upper(text, i - 3) == "W"):
            return None
        right_len = self._find_url_end_on_the_right(0)
        start = i - 3
        length = 3 + 1 + right_len
        self.i += 1 + right_len
        return UrlSpan(start, length, URL_TYPE_URL)

    # UrlDetector.cs:359-453
    def _try_first_level_domain(self) -> UrlSpan | None:
        text, n = self.text, self.n
        self.i += 1
        i = self.i
        right_len = 0
        while True:
            j = i + right_len
            if j >= n or not (_ct(text, j) & IS_LETTER):
                break
            if FIRST_LEVEL_DOMAINS_MAX_LENGTH < right_len:
                return None
            right_len += 1
        if right_len == 0:
            return None
        label = "".join(_upper(text, i + k) for k in range(right_len))
        if label not in FIRST_LEVEL_DOMAINS:
            return None

        ch_after = text[i + right_len] if i + right_len < n else "\0"
        if ch_after == ".":
            save = self.i
            self.i += right_len
            inner = self._try_first_level_domain()
            if inner is not None:
                return inner
            self.i = save

        self.i -= 1
        i = self.i
        if ch_after in "/\\":
            right_len = self._find_url_end_on_the_right(right_len)

        left_len, url_type = self._find_url_end_on_the_left(1)
        if left_len == 0:
            return None
        start = i - left_len
        length = left_len + 1 + right_len
        self.i += 1 + right_len
        return UrlSpan(start, length, url_type)

    # UrlDetector.cs:458-518
    def _try_uri_schemes(self) -> UrlSpan | None:
        text, i = self.text, self.i
        left_len = 0
        while True:
            p = i - left_len - 1
            if p < 0:
                break
            if not (_ct(text, p) & IS_URI_SCHEMES_CHAR):
                break
            if URI_SCHEMES_MAX_LENGTH < left_len:
                return None
            left_len += 1
        if left_len == 0:
            return None
        scheme = "".join(_upper(text, k) for k in range(i - left_len, i))
        if scheme not in URI_SCHEMES:
            self.i += 1
            return None
        right_len = self._find_url_end_on_the_right(0)
        start = i - left_len
        length = left_len + 1 + right_len
        value = text[start : start + length]
        is_email = "@" in value and "/" not in value and "\\" not in value
        self.i += 1 + right_len
        return UrlSpan(start, length, URL_TYPE_EMAIL if is_email else URL_TYPE_URL)

    def run(self) -> list[UrlSpan]:
        text, n = self.text, self.n
        while self.i < n:
            ch = text[self.i]
            if ch == ".":
                u = self._try_www()
                if u is None:
                    save = self.i
                    u = self._try_first_level_domain()
                    if u is None:
                        # C# leaves _Ptr moved on some failure paths; net effect per
                        # AllocateUrls loop: resume at (moved ptr + 1)
                        self.i = self.i + 1 if self.i != save else save + 1
                        continue
                self.urls.append(u)
                self.i += 1
            elif ch == ":":
                u = self._try_uri_schemes()
                if u is None:
                    self.i += 1
                    continue
                self.urls.append(u)
                self.i += 1
            else:
                self.i += 1
        return self.urls


def allocate_urls(text: str) -> list[UrlSpan]:
    """Detect URL/Email spans over the whole text (UrlDetector.AllocateUrls)."""
    if "." not in text and ":" not in text:
        return []
    return _Detector(text).run()


def url_domain(value: str, url_type: str) -> str:
    """Host part of a detected span — the blocklist/aggregation key of domain-based
    curation. Email → after the last '@' (or the '(at)'/'[at]' obfuscations the
    detector also types as Email); Url → strip scheme/userinfo, cut at the first
    path separator ('/' or '\\\\' — the detector treats both as path starts), drop
    the port; 'mailto:' re-dispatches to the Email rule. Lowercased, trailing dot
    removed. Pure function shared by the Spark operator and its golden mirror."""
    v = value.strip()
    low = v.lower()
    if url_type == "Email":
        best, cut = -1, 0
        for sep in ("@", "(at)", "[at]"):
            i = low.rfind(sep)
            if i > best:
                best, cut = i, i + len(sep)
        host = v[cut:] if best != -1 else v
    else:
        if low.startswith("mailto:"):
            return url_domain(v[len("mailto:"):], "Email")
        host = v.split("://", 1)[1] if "://" in v else v
        host = host.split("/", 1)[0].split("\\", 1)[0]
        host = host.rsplit("@", 1)[-1]
        host = host.split(":", 1)[0]
    return host.lower().rstrip(".")


_PII_PLACEHOLDERS = {URL_TYPE_URL: "<URL>", URL_TYPE_EMAIL: "<EMAIL>"}


def redact_text(text: str, min_digits: int = 4) -> tuple[str, int, int, int]:
    """PII redaction kernel → (redacted_text, n_urls, n_emails, n_digit_runs).

    URL/Email spans come from the reference's detector state machine
    (``allocate_urls``, UrlDetector.cs) and are replaced right-to-left with
    placeholder tokens; remaining digit runs of ≥ ``min_digits`` (phone / account /
    id-number shaped) become ``<NUM>``. Placeholders contain no digits, so the two
    passes cannot interact. Pure function — ONE definition shared by the Spark
    operator (textstats.redact_pii) and its golden mirror (golden._redact_rows)."""
    import re

    spans = allocate_urls(text)
    n_urls = sum(1 for s in spans if s.type == URL_TYPE_URL)
    n_emails = sum(1 for s in spans if s.type == URL_TYPE_EMAIL)
    out = text
    for s in sorted(spans, key=lambda sp: sp.start, reverse=True):
        out = out[: s.start] + _PII_PLACEHOLDERS[s.type] + out[s.start + s.length :]
    out, n_digit_runs = re.subn(r"[0-9]{%d,}" % min_digits, "<NUM>", out)
    return out, n_urls, n_emails, n_digit_runs
