"""Tokenizer snapshot golden over the reference's own demo input file
([resources]/input-text/input_pos_tagger_ru.txt — 18 lines covering abbreviations
"2010г.", quoted company names, "кв. м", statute refs "ч.4 ст.159").

The snapshot (tests/golden_tokenizer_snapshot.json) pins the CURRENT behavior of both
tokenizer modes, token offsets, graphemic input types, extra flags and both ending
features (mel=4 POS / whole-word NER) — any semantic drift in the text stack fails
loudly and must be justified against the reference semantics."""

import json
import os

from lingvo_spark_kg.tokenizer import (
    run_no_sents_allocate,
    run_simple_sents_allocate,
    to_pos_tagger_token,
)

SNAP = os.path.join(os.path.dirname(__file__), "golden_tokenizer_snapshot.json")


def test_tokenizer_matches_snapshot():
    snap = json.load(open(SNAP, encoding="utf-8"))
    assert len(snap) == 15
    for entry in snap:
        line = entry["line"]
        full = [[w.value, w.start, w.length, w.input_type, w.extra,
                 to_pos_tagger_token(w, 4), to_pos_tagger_token(w, 1_000_000)]
                for w in run_no_sents_allocate(line)]
        assert full == entry["full"], line
        simple = [[w.value, w.start, w.length, w.input_type, w.extra]
                  for _, ws in run_simple_sents_allocate(line) for w in ws]
        assert simple == entry["simple"], line
