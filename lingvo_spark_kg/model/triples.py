"""POS-pattern triple extraction: NER-subject / verb-predicate / NER-object.

[KG-new] operator — no reference implementation; mandated by the north-star spec
(BASELINE.json: "apply POS-pattern relation templates (NER-subject / verb-predicate /
NER-object) to emit (subj, pred, obj) triples"). Pure per-sentence function so the
single-node golden generator and the Spark pandas-UDF operator share one definition.

Template: merge BIO NER tags into entity spans; for each ordered pair of adjacent
entity spans (A, B) in token order, if at least one Verb/Infinitive/Participle token
lies strictly between them, emit (A.surface, first-such-verb normalized form,
B.surface) with the span types and a distance-decay confidence.
"""

from __future__ import annotations

from typing import NamedTuple

from ..tokenizer import Word
from .lexicon import normalize_surface

_PRED_POS = ("Verb", "Infinitive", "Participle")


class EntitySpan(NamedTuple):
    start_tok: int
    end_tok: int  # inclusive
    surface: str
    norm: str
    etype: str


class Triple(NamedTuple):
    subj: str
    pred: str
    obj: str
    subj_type: str
    obj_type: str
    subj_norm: str
    obj_norm: str
    confidence: float


def merge_bio_spans(words: list[Word], ner_tags: list[str]) -> list[EntitySpan]:
    spans: list[EntitySpan] = []
    i, n = 0, len(words)
    while i < n:
        tag = ner_tags[i]
        if tag.startswith("B-"):
            etype = tag[2:]
            j = i + 1
            while j < n and ner_tags[j] == f"I-{etype}":
                j += 1
            toks = [w.value for w in words[i:j]]
            surface = " ".join(toks)
            spans.append(EntitySpan(i, j - 1, surface,
                                    " ".join(normalize_surface(t) for t in toks), etype))
            i = j
        else:
            i += 1
    return spans


def extract_triples(words: list[Word], pos_tags: list[str],
                    ner_tags: list[str]) -> list[Triple]:
    spans = merge_bio_spans(words, ner_tags)
    if len(spans) < 2:
        return []
    triples: list[Triple] = []
    for a, b in zip(spans, spans[1:]):
        lo, hi = a.end_tok + 1, b.start_tok
        pred = None
        pred_pos_idx = None
        for t in range(lo, hi):
            if pos_tags[t] in _PRED_POS:
                pred = normalize_surface(words[t].value)
                pred_pos_idx = t
                break
        if pred is None:
            continue
        dist = hi - lo
        conf = 1.0 / (1.0 + dist)
        triples.append(Triple(a.surface, pred, b.surface, a.etype, b.etype,
                              a.norm, b.norm, round(conf, 6)))
    return triples
