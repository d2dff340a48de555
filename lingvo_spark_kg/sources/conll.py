"""CoNLL-style corpus source (S2) and fixture writer (R7 analog).

The reference's training/validation corpora are ``token<TAB|SPACE>label`` lines with a
blank line between sentences (reference: PosTagger/Lingvo.PosTagger/Corpus/
Corpus.cs:528-553 ConvertTrainFile2SeqLabelFormat; the reference rewrites them into
parallel src/tgt temp files with a byte-offset map — unnecessary on Spark, where the
grouped DataFrame IS the random-access shuffled corpus, SURVEY.md §2.1 S2-S4).

``read_conll`` distributes per file: each input file is one task (files are
training-artifact sized — the reference treats them the same way, one sequential pass);
sentences never straddle task boundaries, so reassembly is local and order-stable.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CONLL_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("sent_id", T.IntegerType()),
    T.StructField("tokens", T.ArrayType(T.StringType())),
    T.StructField("labels", T.ArrayType(T.StringType())),
])


def _parse_lines(lines: Iterator[str], fname: str):
    sent_id = 0
    toks: list[str] = []
    labs: list[str] = []
    for line in lines:
        line = line.rstrip("\n\r")
        if not line.strip():
            if toks:
                yield (fname, sent_id, toks, labs)
                sent_id += 1
                toks, labs = [], []
            continue
        # token<TAB>label, with single-space fallback (Corpus.cs:528-553);
        # a separator-less line is a token with an empty label (not the reverse)
        if "\t" in line:
            tok, _, lab = line.partition("\t")
        elif " " in line:
            tok, _, lab = line.rpartition(" ")
        else:
            tok, lab = line, ""
        toks.append(tok)
        labs.append(lab)
    if toks:
        yield (fname, sent_id, toks, labs)


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """path: file or directory of CoNLL files → (file, sent_id, tokens, labels).

    Content ships through the engine (``wholeTextFiles``), so executors never need
    driver-filesystem access — works on a real cluster against any Hadoop-compatible
    store, one task per file; sentences never straddle task boundaries, so reassembly
    is local and order-stable."""

    def parse_file(kv):
        fname, content = kv
        return _parse_lines(iter(content.splitlines()), os.path.basename(fname))

    # Hadoop's hidden-file filter silently drops '_'-prefixed files (not just '.');
    # corpus files named '_train.conll' are legitimate, so enumerate local dirs
    # explicitly (driver-side listing is fine — only the OPEN must happen in-engine)
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if not f.startswith(".")
        )
        src = ",".join(files) if files else path
    else:
        src = path
    rdd = spark.sparkContext.wholeTextFiles(src).flatMap(parse_file)
    return spark.createDataFrame(rdd, schema=CONLL_SCHEMA)


def exploded_tokens(conll: DataFrame) -> DataFrame:
    """→ (doc_id=file, sent_key=sent_id, tok_idx, token, label) — the shape the metric
    aggregates join on (operators/metrics.py)."""
    from pyspark.sql import functions as F

    z = conll.select(
        F.col("file").alias("doc_id"),
        F.col("sent_id").alias("sent_key"),
        F.posexplode(F.arrays_zip("tokens", "labels")).alias("tok_idx", "tl"),
    )
    return z.select("doc_id", "sent_key", "tok_idx",
                    F.col("tl.tokens").alias("token"), F.col("tl.labels").alias("label"))


def conll_fixture_lines(n_sentences: int = 200, seed: int = 42) -> list[str]:
    """The deterministic CoNLL fixture as a list of lines (no trailing newlines):
    token<TAB>label lines with one '' element per sentence separator — the SINGLE
    source both ``write_conll_fixture`` (the .conll file Spark reads) and the
    golden line-table parquet (the DuckDB oracle's input) derive from, so the two
    engines reshape byte-identical content."""
    import numpy as np

    from ..fixtures.corpus import SENTENCE_POOL, gazetteer_from_aliases, make_aliases
    from ..model.lexicon import LexiconNer, tag_sentence
    from ..tokenizer import run_simple_sents_allocate

    ner = LexiconNer(gazetteer_from_aliases(make_aliases(seed=seed)))
    rng = np.random.default_rng([seed, 555])
    lines: list[str] = []
    for _ in range(n_sentences):
        text = SENTENCE_POOL[int(rng.integers(0, len(SENTENCE_POOL)))]
        for _sent, words in run_simple_sents_allocate(text):
            pos, _nert = tag_sentence(words, ner)
            lines.extend(f"{w.value}\t{p}" for w, p in zip(words, pos))
            lines.append("")
    return lines


def write_conll_fixture(path: str, n_sentences: int = 200, seed: int = 42) -> str:
    """FIXTURES.md §5: ~n_sentences pool sentences with deterministic golden labels
    (the lexicon regimen), CoNLL format. The single-node analog of the reference's
    CorpusCorrector fixture generation (ModelBuilding/.../CorpusCorrector/Program.cs)."""
    lines = conll_fixture_lines(n_sentences, seed)
    with open(path, "w", encoding="utf-8") as f:
        if lines:
            f.write("\n".join(lines) + "\n")
    return path
