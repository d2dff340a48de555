"""Triple extraction operator + the fused docs→triples fast path.

``extract_triples_df`` maps tagged sentences to triple rows (narrow, shuffle-free).

``docs_to_triples_fused`` runs sentence-split → tokenize → tag → extract in ONE Python
pass per Arrow batch: at 100 TB the dominant cost of a chained-UDF plan is the extra
JVM↔Python Arrow round-trips per stage, so the bench path fuses them (the relational
plan around it is unchanged; checkpointed runs use the staged operators instead).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..model.lexicon import LexiconNer, tag_sentence
from ..model.triples import extract_triples
from ..tokenizer import Word, run_simple_sents_allocate
from .schemas import TRIPLES_SCHEMA
from .tag import _MODEL_CACHE, _words_from_tokens

_COLS = ("doc_id", "span_idx", "sent_idx", "subj", "pred", "obj",
         "subj_type", "obj_type", "subj_norm", "obj_norm", "confidence")


def extract_triples_df(tagged: DataFrame) -> DataFrame:
    """tagged sentences → triples_raw rows (POS-pattern templates, model/triples.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in _COLS}
            for doc_id, span_idx, sent_idx, tokens, pos_tags, ner_tags in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["sent_idx"], pdf["tokens"],
                pdf["pos_tags"], pdf["ner_tags"],
            ):
                words = _words_from_tokens(tokens)
                for tr in extract_triples(words, list(pos_tags), list(ner_tags)):
                    rows["doc_id"].append(doc_id)
                    rows["span_idx"].append(span_idx)
                    rows["sent_idx"].append(sent_idx)
                    rows["subj"].append(tr.subj)
                    rows["pred"].append(tr.pred)
                    rows["obj"].append(tr.obj)
                    rows["subj_type"].append(tr.subj_type)
                    rows["obj_type"].append(tr.obj_type)
                    rows["subj_norm"].append(tr.subj_norm)
                    rows["obj_norm"].append(tr.obj_norm)
                    rows["confidence"].append(tr.confidence)
            yield pd.DataFrame(rows)

    return tagged.mapInPandas(run, schema=TRIPLES_SCHEMA)


def docs_to_triples_fused(docs: DataFrame, gazetteer_bc,
                          replace_nums: bool = True) -> DataFrame:
    """docs(doc_id, spans) → triples_raw in one Python pass (lexicon regimen).

    Media spans are filtered out JVM-side (codegen'd ``filter`` higher-order function)
    before the Arrow hop, so only text payloads cross the JVM↔Python boundary — at
    interleaved-corpus ratios that is ~30% less serialization on the critical path."""
    from pyspark.sql import functions as F

    docs = docs.select(
        "doc_id",
        F.expr("filter(spans, s -> s.kind = 'text' AND s.text IS NOT NULL)").alias("spans"),
    ).where(F.size("spans") > 0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        key = id(gazetteer_bc)
        ner = _MODEL_CACHE.get(key)
        if ner is None:
            ner = LexiconNer(gazetteer_bc.value)
            _MODEL_CACHE[key] = ner
        for pdf in batches:
            memo: dict[str, list] = {}
            rows: dict[str, list] = {k: [] for k in _COLS}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                if spans is None:
                    continue
                for span in spans:
                    if span["kind"] != "text" or not span["text"]:
                        continue
                    text = span["text"]
                    per_text = memo.get(text)
                    if per_text is None:
                        per_text = []
                        for sent_idx, (sent, words) in enumerate(
                            run_simple_sents_allocate(text, replace_nums)
                        ):
                            pos, nert = tag_sentence(words, ner)
                            per_text.append((sent_idx, extract_triples(words, pos, nert)))
                        memo[text] = per_text
                    for sent_idx, triples in per_text:
                        for tr in triples:
                            rows["doc_id"].append(doc_id)
                            rows["span_idx"].append(span["offset"])
                            rows["sent_idx"].append(sent_idx)
                            rows["subj"].append(tr.subj)
                            rows["pred"].append(tr.pred)
                            rows["obj"].append(tr.obj)
                            rows["subj_type"].append(tr.subj_type)
                            rows["obj_type"].append(tr.obj_type)
                            rows["subj_norm"].append(tr.subj_norm)
                            rows["obj_norm"].append(tr.obj_norm)
                            rows["confidence"].append(tr.confidence)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(run, schema=TRIPLES_SCHEMA)
