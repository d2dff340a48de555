"""Tokenize operator: docs → sentences (narrow, shuffle-free).

Spark shape (SURVEY.md §2.8): ``mapInPandas`` over docs explodes text spans into
sentence rows with per-sentence token arrays, so each whole sentence rides one Arrow
row into downstream model UDFs (the reference's per-thread Tokenizer
ConsoleDemo/Program.cs:254-256 becomes partition parallelism). Media spans are not
routed through Python at all — ``media_spans()`` is a pure column projection
(posexplode + filter), which Catalyst prunes to the columns it needs.

Within one Arrow batch, identical span texts are tokenized once (dict memo) — the
batch-local analog of the reference's thread-local tokenizer buffer reuse
(Tokenizer.cs:276-284); cross-batch state is deliberately avoided to keep the operator
deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import run_simple_sents_allocate, to_pos_tagger_token
from .schemas import SENTENCES_SCHEMA

POS_MAX_ENDING_LENGTH = 4        # ConsoleDemo/predict.json:7
NER_MAX_ENDING_LENGTH = 1_000_000  # predict_ner.json:7 (10000 ≈ whole word)


def _tokenize_text(text: str, replace_nums: bool) -> list[tuple[int, int, int, list[dict]]]:
    """→ [(sent_idx, sent_start, sent_len, tokens)] for one span text."""
    out = []
    for sent_idx, (sent, words) in enumerate(run_simple_sents_allocate(text, replace_nums)):
        toks = [
            {
                "tok_idx": t,
                "start": w.start,
                "length": w.length,
                "value": w.value,
                "input_type": w.input_type,
                "extra": w.extra,
                "ending_pos": to_pos_tagger_token(w, POS_MAX_ENDING_LENGTH),
                "ending_ner": to_pos_tagger_token(w, NER_MAX_ENDING_LENGTH),
            }
            for t, w in enumerate(words)
        ]
        out.append((sent_idx, sent.start, sent.length, toks))
    return out


def tokenize_docs(docs: DataFrame, replace_nums: bool = True) -> DataFrame:
    """docs(doc_id, spans) → sentences(doc_id, span_idx, sent_idx, sent_start,
    sent_len, tokens)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[str, list] = {}
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", "span_idx", "sent_idx", "sent_start",
                                      "sent_len", "tokens")}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                if spans is None:
                    continue
                for span in spans:
                    if span["kind"] != "text" or not span["text"]:
                        continue
                    text = span["text"]
                    sents = memo.get(text)
                    if sents is None:
                        sents = _tokenize_text(text, replace_nums)
                        memo[text] = sents
                    for sent_idx, start, length, toks in sents:
                        rows["doc_id"].append(doc_id)
                        rows["span_idx"].append(span["offset"])
                        rows["sent_idx"].append(sent_idx)
                        rows["sent_start"].append(start)
                        rows["sent_len"].append(length)
                        rows["tokens"].append(toks)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(run, schema=SENTENCES_SCHEMA)


def media_spans(docs: DataFrame) -> DataFrame:
    """Media passthrough — pure relational projection, no Python. Order preserved via
    (doc_id, span_idx); the per-row invariant checks reconstruct the original span
    sequence from this plus the text spans."""
    s = docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
    return s.where(F.col("span.kind") != "text").select(
        "doc_id",
        F.col("span.offset").alias("span_idx"),
        F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
    )


def text_spans(docs: DataFrame) -> DataFrame:
    s = docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
    return s.where(F.col("span.kind") == "text").select(
        "doc_id",
        F.col("span.offset").alias("span_idx"),
        F.col("span.text").alias("text"),
    )
