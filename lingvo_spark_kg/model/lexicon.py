"""Deterministic lexicon/suffix tagger — the pipeline's default tagging "regimen".

The reference ships trained .s2s models that are not in its repository (only a
.gitignore under [resources]/models), so the pinned correctness oracle for the KG
pipeline is this deterministic tagger: closed-class word lists + suffix rules emit the
reference's POS label set (Type's/PosTaggerOutputType.cs:9-36), and a gazetteer +
graphemic patterns emit BIO NER labels over the classes the reference NER models use
(B/I × PER/ORG/LOC, README.md:75-87). It is pure-Python/portable so the single-node
golden generator and the distributed Spark operator provably compute the same function
(triple P/R gate, BASELINE.md).

The output-type correction table is applied exactly as the reference does after any
model decode (SetPosTaggerOutputType, Tokenizing/PosTaggerExtensions.cs:16-59):
Num → Numeral, Url/Email → Other, Punctuation-flagged → Punctuation.
"""

from __future__ import annotations

from functools import lru_cache

from ..chartypes import to_lower_invariant
from ..tokenizer import (
    EWT_PUNCTUATION,
    IT_EMAIL,
    IT_FIRST_LOWER_WITH_UPPER,
    IT_LATIN_FIRST_CAPITAL,
    IT_MIX_CAPITAL,
    IT_NUM,
    IT_ONE_CAPITAL,
    IT_ONE_CAPITAL_WITH_DOT,
    IT_ALL_CAPITAL,
    IT_URL,
    Word,
    ending_token,
)

# --- POS label set (PosTaggerOutputType.cs) ---
POS_TAGS = [
    "Other", "Noun", "Adjective", "AdjectivePronoun", "PossessivePronoun", "Pronoun",
    "Numeral", "Verb", "Infinitive", "Adverb", "AdverbialParticiple", "AdverbialPronoun",
    "Participle", "Conjunction", "Preposition", "Interjection", "Particle", "Article",
    "AuxiliaryVerb", "Predicative", "Punctuation", "Email", "Url",
]

NER_TAGS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC"]

_PREPOSITIONS = frozenset(
    "в на с к по из у о об от до для при про без под над через между перед около возле "
    "среди против вдоль вокруг согласно благодаря вопреки из-за из-под со ко во обо".split()
)
_CONJUNCTIONS = frozenset(
    "и а но или либо что чтобы как когда если хотя пока ибо зато однако причем притом "
    "также тоже".split()
)
_PARTICLES = frozenset("бы же ли не ни пусть давай вот вон даже уж ведь лишь только именно".split())
_PRONOUNS = frozenset(
    "я ты он она оно мы вы они себя меня тебя его ее её их нас вас мне тебе ему ей нам "
    "вам им мной тобой нем ней них кто кого кому кем ком это этот эта эти тот та те то "
    "весь вся все всё сам сама сами".split()
)
_ADJ_PRONOUNS = frozenset("который которая которое которые твой мой наш ваш свой чей какой такой".split())
_PREDICATIVES = frozenset("жаль хорошо пора можно нельзя надо нужно".split())
_INTERJECTIONS = frozenset("увы ах ох эй ура батюшки".split())

_VERB_SUFFIXES = (
    "ует", "уют", "ился", "алась", "ались", "ется", "ится", "ются", "ятся", "ался",
    "лись", "лась", "ла", "ли", "ло", "ет", "ит", "ют", "ят", "ешь", "ишь", "ем",
    "им", "ете", "ите", "ал", "ил", "ял", "ел", "енно",
)
_INFINITIVE_SUFFIXES = ("ть", "ти", "чь", "ться")
_PARTICIPLE_SUFFIXES = ("щий", "щая", "щее", "щие", "вший", "вшая", "вшее", "вшие",
                        "нный", "нная", "нное", "нные", "емый", "имый", "анный", "енный",
                        "нных", "нным", "вшихся", "щихся", "щего", "вшего")
_ADJ_SUFFIXES = ("ый", "ий", "ой", "ая", "яя", "ое", "ее", "ые", "ие", "ого", "его",
                 "ому", "ему", "ыми", "ими", "ых", "ою", "ею", "ным", "ной", "ств")
_ADVERB_SUFFIXES = ("ственно",)


def normalize_surface(value: str) -> str:
    """Normalization shared by the NER gazetteer and the entity-linking alias keys:
    invariant lowercase with ё→е plus combining-mark strip — the same transform as the
    full-length ending token (Tokenizer.ToPosTaggerToken with NER's
    MaxEndingLength=10000, ConsoleDemo/predict_ner.json:7)."""
    return ending_token(value, 1_000_000)


@lru_cache(maxsize=1 << 16)
def _pos_tag_cached(value: str, input_type: str, extra: int) -> str:
    return _pos_tag_impl(value, input_type, extra)


def pos_tag_word(word: Word) -> str:
    return _pos_tag_cached(word.value, word.input_type, word.extra)


def _pos_tag_impl(value_str: str, it: str, extra: int) -> str:
    """Deterministic POS decision for one token (correction table semantics included)."""
    if it == IT_NUM:
        return "Numeral"
    if it in (IT_URL, IT_EMAIL):
        return "Other"
    if extra & EWT_PUNCTUATION:
        return "Punctuation"
    v = normalize_surface(value_str)
    if not v:
        return "Other"
    if v in _PREPOSITIONS:
        return "Preposition"
    if v in _CONJUNCTIONS:
        return "Conjunction"
    if v in _PARTICLES:
        return "Particle"
    if v in _PRONOUNS:
        return "Pronoun"
    if v in _ADJ_PRONOUNS:
        return "AdjectivePronoun"
    if v in _PREDICATIVES:
        return "Predicative"
    if v in _INTERJECTIONS:
        return "Interjection"
    if len(v) >= 4:
        if v.endswith(_INFINITIVE_SUFFIXES):
            return "Infinitive"
        if v.endswith(_PARTICIPLE_SUFFIXES):
            return "Participle"
        if v.endswith(("вшись", "учи", "ючи")):
            return "AdverbialParticiple"
        if v.endswith(_ADJ_SUFFIXES):
            return "Adjective"
        if v.endswith(_VERB_SUFFIXES):
            return "Verb"
        if v.endswith("о") and len(v) >= 5 and v[-2] not in "аеиоуыэюя":
            return "Adverb"
    return "Noun"


class LexiconNer:
    """Greedy longest-match gazetteer NER with graphemic fallbacks.

    gazetteer: normalized multi-token surface (space-joined) → PER|ORG|LOC.
    """

    def __init__(self, gazetteer: dict[str, str], max_ngram: int = 4):
        self.gaz = gazetteer
        self.max_ngram = max_ngram

    def tag(self, words: list[Word]) -> list[str]:
        n = len(words)
        tags = ["O"] * n
        norms = [normalize_surface(w.value) for w in words]
        i = 0
        while i < n:
            matched = False
            hi = min(self.max_ngram, n - i)
            for k in range(hi, 0, -1):
                key = " ".join(norms[i : i + k])
                etype = self.gaz.get(key)
                if etype is not None:
                    tags[i] = f"B-{etype}"
                    for j in range(i + 1, i + k):
                        tags[j] = f"I-{etype}"
                    i += k
                    matched = True
                    break
            if matched:
                continue
            # graphemic fallback: initials + capitalized word → PER. Simple-mode
            # tokenization unsticks the dot ("С.Козлов" → "С", ".", "Козлов" —
            # Tokenizer.cs:662 "always unstick dot from end of tokens"), so match both
            # the 3-token and the fused OneCapitalWithDot shapes.
            w = words[i]
            if (w.input_type == IT_ONE_CAPITAL and i + 2 < n and words[i + 1].value == "."
                    and words[i + 2].input_type in (IT_LATIN_FIRST_CAPITAL, IT_MIX_CAPITAL)):
                tags[i] = "B-PER"
                tags[i + 1] = "I-PER"
                tags[i + 2] = "I-PER"
                i += 3
                continue
            if w.input_type == IT_ONE_CAPITAL_WITH_DOT and i + 1 < n and words[i + 1].input_type in (
                IT_LATIN_FIRST_CAPITAL, IT_MIX_CAPITAL
            ):
                tags[i] = "B-PER"
                tags[i + 1] = "I-PER"
                i += 2
                continue
            # capitalized mid-sentence unknown word → PER-ish mention
            if i > 0 and w.input_type in (IT_LATIN_FIRST_CAPITAL, IT_MIX_CAPITAL) and len(w.value) > 2:
                prev = words[i - 1]
                if not (prev.extra & EWT_PUNCTUATION and prev.value in ".!?"):
                    tags[i] = "B-PER"
            elif w.input_type == IT_ALL_CAPITAL and len(w.value) >= 2:
                tags[i] = "B-ORG"
            i += 1
        return tags


def tag_sentence(words: list[Word], ner: LexiconNer) -> tuple[list[str], list[str]]:
    """(pos_tags, ner_tags) for one tokenized sentence."""
    return [pos_tag_word(w) for w in words], ner.tag(words)
