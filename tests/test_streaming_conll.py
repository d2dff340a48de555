"""Streaming ingestion + CoNLL source tests."""

import os

from pyspark.sql import functions as F

from lingvo_spark_kg.operators.docsgen import generate_docs
from lingvo_spark_kg.operators.streaming import (read_streamed_triples,
                                                 stream_docs_to_triples)
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
    streamed = sorted(tuple(r) for r in read_streamed_triples(spark, out_dir).select(keys).collect())
    batch = sorted(tuple(r) for r in docs_to_triples_fused(docs, gaz_bc).select(keys).collect())
    assert streamed == batch  # multiplicity-preserving: no drift between the two paths
    assert len(streamed) > 0


def test_streaming_stateful_mention_counts(spark, gaz_bc, tmp_path_factory):
    """applyInPandasWithState: running per-mention totals ACCUMULATE across separate
    availableNow runs (state survives in the checkpointed state store), and the final
    totals equal the batch-computed mention counts."""
    from lingvo_spark_kg.operators.linking import mentions_from_triples
    from lingvo_spark_kg.operators.streaming import streaming_mention_counts

    base = tmp_path_factory.mktemp("stateful")
    in_dir, ckpt = str(base / "in"), str(base / "ckpt")

    docs = generate_docs(spark, 120).cache()
    half = "doc-00000060"

    def run_once(_name: str) -> dict:
        rows = []

        def sink(bdf, _bid):  # memory sink can't recover from a checkpoint; foreachBatch can
            rows.extend(bdf.collect())

        q = (
            streaming_mention_counts(spark, in_dir, gaz_bc)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["mention_norm"], r["mention_type"]): r["n_total"] for r in rows}

    docs.where(F.col("doc_id") < half).write.mode("overwrite").parquet(in_dir)
    first = run_once("mc_run1")
    assert first and all(v > 0 for v in first.values())

    docs.where(F.col("doc_id") >= half).write.mode("append").parquet(in_dir)
    second = run_once("mc_run2")

    batch = {
        (r["mention_norm"], r["mention_type"]): r["n_mentions"]
        for r in mentions_from_triples(docs_to_triples_fused(docs, gaz_bc)).collect()
    }
    # run-2 emits totals for mentions touched by batch 2 — every emitted total must
    # equal the full-corpus batch count (i.e. run-1 state accumulated, not reset)
    assert second, "second run should emit updated totals"
    for k, v in second.items():
        assert v == batch[k], (k, v, batch[k])
    # and at least one mention grew across the two runs
    assert any(second[k] > first.get(k, 0) for k in second)


def test_streaming_windowed_watermark_late_data(spark, tmp_path_factory):
    """Watermark semantics: a late event within the watermark updates its window; an
    event older than the watermark horizon is dropped."""
    import pandas as pd
    from lingvo_spark_kg.operators.streaming import windowed_event_counts

    base = tmp_path_factory.mktemp("watermark")
    in_dir, ckpt = str(base / "in"), str(base / "ckpt")

    schema = "ts timestamp, event_type string, value double"

    def write_batch(rows, mode):
        pdf = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema=schema).write.mode(mode).parquet(in_dir)

    def run_once(_name: str) -> dict:
        rows = []

        def sink(bdf, _bid):
            rows.extend(bdf.collect())

        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            windowed_event_counts(stream, watermark="10 minutes", window="5 minutes")
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(str(r["win_start"]), r["event_type"]): r["n_events"] for r in rows}

    # batch 1: events up to 12:00 → watermark advances to 11:50
    write_batch([("2026-01-01 11:00:00", "click", 1.0),
                 ("2026-01-01 11:02:00", "click", 1.0),
                 ("2026-01-01 12:00:00", "view", 1.0)], "overwrite")
    run_once("wm_run1")

    # batch 2: one late-but-inside-watermark event (11:57 ≥ 11:50) and one too-late
    # event (11:01 < 11:50, its 11:00 window state already evicted)
    write_batch([("2026-01-01 11:57:00", "click", 1.0),
                 ("2026-01-01 11:01:00", "click", 1.0)], "append")
    out2 = run_once("wm_run2")

    assert out2.get(("2026-01-01 11:55:00", "click")) == 1  # accepted late event
    assert ("2026-01-01 11:00:00", "click") not in out2  # dropped: beyond watermark


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
