"""Streaming ingestion + CoNLL source tests."""

import os

from pyspark.sql import functions as F

from lingvo_spark_kg.operators.docsgen import generate_docs
from lingvo_spark_kg.operators.streaming import stream_docs_to_triples
from lingvo_spark_kg.operators.triples import docs_to_triples_fused
from lingvo_spark_kg.sources.conll import exploded_tokens, read_conll, write_conll_fixture


def test_streaming_matches_batch(spark, gaz_bc, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    docs = generate_docs(spark, 150).cache()
    # land the corpus as two separate file drops
    docs.where(F.col("doc_id") < "doc-00000075").write.mode("overwrite").parquet(in_dir)
    q = stream_docs_to_triples(spark, in_dir, out_dir, ckpt, gaz_bc)
    q.awaitTermination(120)

    docs.where(F.col("doc_id") >= "doc-00000075").write.mode("append").parquet(in_dir)
    q2 = stream_docs_to_triples(spark, in_dir, out_dir, ckpt, gaz_bc)
    q2.awaitTermination(120)

    keys = ["doc_id", "span_idx", "sent_idx", "subj", "pred", "obj"]
    streamed = sorted(tuple(r) for r in spark.read.parquet(out_dir).select(keys).collect())
    batch = sorted(tuple(r) for r in docs_to_triples_fused(docs, gaz_bc).select(keys).collect())
    assert streamed == batch  # multiplicity-preserving: no drift between the two paths
    assert len(streamed) > 0


def test_conll_roundtrip_and_metric_shape(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("conll")
    path = str(base / "valid.conll")
    write_conll_fixture(path, n_sentences=50)

    df = read_conll(spark, path)
    rows = df.collect()
    assert rows, "fixture should contain sentences"
    for r in rows:
        assert len(r["tokens"]) == len(r["labels"]) > 0
        assert all(lab for lab in r["labels"])

    toks = exploded_tokens(df)
    # A1 self-comparison: P = R = F1 = 1.0 for every label
    from lingvo_spark_kg.operators.metrics import macro_f1, per_label_prf

    prf = per_label_prf(toks, toks)
    assert all(r["f1"] == 1.0 for r in prf.collect())
    m = macro_f1(prf).collect()[0]
    assert m["macro_f1"] == 1.0


def test_conll_deterministic_fixture(tmp_path_factory):
    base = tmp_path_factory.mktemp("conll2")
    p1 = write_conll_fixture(str(base / "a.conll"), n_sentences=20)
    p2 = write_conll_fixture(str(base / "b.conll"), n_sentences=20)
    assert open(p1).read() == open(p2).read()


def test_corpus_ops(spark, gaz_bc):
    from lingvo_spark_kg.operators.corpus_ops import (
        filter_too_long,
        length_histogram,
        shuffle_corpus,
        train_valid_split,
    )
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    docs = generate_docs(spark, 300)
    sents = tokenize_docs(docs).cache()
    n_all = sents.count()

    capped = filter_too_long(sents, max_len=220)
    assert capped.count() < n_all  # the corpus contains >220-token chunking sentences
    assert capped.where(F.size("tokens") > 220).count() == 0

    hist = length_histogram(sents, bucket_size=100).collect()
    assert sum(r["n_sentences"] for r in hist) == n_all
    assert any(r["len_bucket"] >= 2 for r in hist)  # long sentences bucket

    sh1 = [r["doc_id"] for r in shuffle_corpus(docs, seed=7).select("doc_id").collect()]
    sh2 = [r["doc_id"] for r in shuffle_corpus(docs, seed=7).select("doc_id").collect()]
    assert sh1 == sh2  # deterministic
    assert sh1 != sorted(sh1)  # actually shuffled

    train, valid = train_valid_split(docs, 0.2)
    nt, nv = train.count(), valid.count()
    assert nt + nv == 300 and 20 <= nv <= 100
    # stable under recomputation
    assert valid.count() == nv
