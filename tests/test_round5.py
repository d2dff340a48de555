"""Round-5 additions: pack_contexts key handling + auto-shard, deterministic
treeReduce training parity, probs/CoNLL oracle plumbing, threshold hoist."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_hash_sample_threshold_is_shared():
    """ADVICE r4: the oracle's _mix_thresh must delegate to the one module-level
    formula (corpus_ops.hash_sample_threshold) instead of duplicating it."""
    import __spark_entry__ as e
    from lingvo_spark_kg.operators.corpus_ops import hash_sample_threshold

    for rate in (0.0, 0.05, 0.2, 0.5, 0.999999, 1.0):
        assert e._mix_thresh(rate) == hash_sample_threshold(rate)
    assert hash_sample_threshold(1.0) == "g"  # sentinel above every hex prefix


def test_pack_contexts_string_key_portable_hash(spark):
    """A string doc_id (the shape most operators emit) shards via the engine-portable
    md5-prefix hash instead of failing analysis / silently nulling."""
    import pandas as pd

    from lingvo_spark_kg.operators.corpus_ops import pack_contexts

    ids = [f"doc-{i:08d}" for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ids, "n_tokens": [7] * 40,
    }))
    out = {r["doc_id"]: r for r in pack_contexts(
        df, budget=16, n_shards=4, n_tokens_col=F.col("n_tokens")).collect()}
    assert len(out) == 40
    for did, r in out.items():
        expect = int(hashlib.md5(did.encode()).hexdigest()[:15], 16) % 4
        assert r["shard"] == expect, did
    # per-shard offsets are still one contiguous cumsum stream
    by_shard: dict[int, list] = {}
    for r in out.values():
        by_shard.setdefault(r["shard"], []).append(r["ctx_offset"])
    for offs in by_shard.values():
        assert sorted(offs) == [7 * i for i in range(len(offs))]


def test_pack_contexts_rejects_non_integral_non_string_key(spark):
    import pandas as pd

    from lingvo_spark_kg.operators.corpus_ops import pack_contexts

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1.5, 2.5], "n_tokens": [3, 4],
    }))
    with pytest.raises(TypeError, match="integral or string"):
        pack_contexts(df, budget=16, n_shards=2, n_tokens_col=F.col("n_tokens"))


def test_tag_probs_operator_invariants(spark):
    """M9/M11 operator: per token the class list covers ALL model classes exactly
    once, sorted by (-prob, class), probabilities sum to 1 (softmax), and
    words_in_dict_ratio is the in-vocab share of the sentence's feature tokens."""
    from lingvo_spark_kg.model.lexicon import POS_TAGS
    from lingvo_spark_kg.model.pinned import pinned_tagger_models
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.tag import tag_sentences_probs
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    pos_m, _ = pinned_tagger_models()
    bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    docs = docs_from_documents_table(spark, SF_DIR).limit(5)
    rows = tag_sentences_probs(tokenize_docs(docs), bc).collect()
    assert rows
    w2i = pos_m.src_vocab.word2id
    for r in rows:
        feats = [t["ending_pos"] for t in r["tokens"]]
        assert len(r["probs"]) == len(feats)
        for ranked in r["probs"]:
            labels = [lp["label"] for lp in ranked]
            assert sorted(labels) == sorted(POS_TAGS)
            probs = [lp["prob"] for lp in ranked]
            assert probs == sorted(probs, reverse=True)
            assert abs(sum(probs) - 1.0) < 1e-4  # rounded to 6 digits per class
        if feats:
            expect = round(sum(1 for t in feats if t in w2i) / len(feats), 6)
            assert r["words_in_dict_ratio"] == expect


def test_demo_models_reproduce_lexicon_regimen():
    """model/demo.py: the TRAINED demo pair (the DNN the pipeline bench runs) must
    reproduce the lexicon regimen on held-out corpus sentences — token agreement 1.0
    for POS (pos_tag_word targets) and NER (gazetteer BIO targets), including the
    >220-token chunk-decode path. A retrain that degrades this fails here, not
    silently in the pipeline bench."""
    from lingvo_spark_kg.fixtures.corpus import (gazetteer_from_aliases,
                                                 make_aliases, make_docs)
    from lingvo_spark_kg.model.demo import demo_tagger_models
    from lingvo_spark_kg.model.lexicon import LexiconNer, pos_tag_word
    from lingvo_spark_kg.operators.tag import _words_from_tokens
    from lingvo_spark_kg.operators.tokenize import _tokenize_text

    pos_m, ner_m = demo_tagger_models()
    ner = LexiconNer(gazetteer_from_aliases(make_aliases(seed=42)))
    pos_test: dict = {}
    ner_test: dict = {}
    # docs far outside the training range (demo trains on make_docs(1500))
    for _did, spans in make_docs(150, start=900_000):
        for s in spans:
            if s["kind"] != "text" or not s["text"]:
                continue
            for _si, _st, _ln, toks in _tokenize_text(s["text"], True):
                words = _words_from_tokens(toks)
                pk = tuple(t["ending_pos"] for t in toks)
                nk = tuple(t["ending_ner"] for t in toks)
                pos_test.setdefault(pk, [pos_tag_word(w) for w in words])
                ner_test.setdefault(nk, ner.tag(words))
    assert len(pos_test) > 50
    for model, test in ((pos_m, pos_test), (ner_m, ner_test)):
        preds = model.predict_tags([list(k) for k in test])
        assert all(p == gold for p, gold in zip(preds, test.values()))


def test_dnn_pipeline_edges_match_lexicon_mirror(spark, tmp_path):
    """VERDICT r4 item 1 oracle-consistency: the full 9-stage pipeline run with the
    DNN regimen (trained demo models) produces edge rows BIT-IDENTICAL to the
    single-node lexicon golden mirror — tagging, triples, linking, CC and the edge
    aggregation all agree end-to-end across the two regimens and the two execution
    models (distributed vs flat driver loop)."""
    from lingvo_spark_kg import golden
    from lingvo_spark_kg.pipeline import KgPipeline

    # no dnn_models arg — this also covers the pipeline's default (the demo pair)
    p = KgPipeline(spark, str(tmp_path / "wd"), n_docs=250, tagger="dnn")
    counts = p.run(resume=False)
    assert counts["triples_raw"] > 100  # non-trivial volume through every stage
    got = sorted(
        tuple(r) for r in p._read("edges").select(
            "src_id", "pred", "dst_id", "n_occurrences", "avg_confidence",
            "n_docs", "example_doc_id").collect())
    tr = golden._triples_rows(250)
    want = sorted(golden._edges_rows(tr, golden._canonical_rows(golden._links_rows(tr))))
    assert got == want


def test_dedup_tagging_identical_to_plain(spark):
    """tag_sentences_bilstm_dedup (corpus-global distinct-sentence decode + join
    back) must be row-identical to the plain per-instance decode — the dedup is an
    execution-cost change only (deterministic, batch-invariant decode; exact
    tokens-array join key)."""
    from lingvo_spark_kg.model.demo import demo_tagger_models
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.operators.tag import (tag_sentences_bilstm,
                                               tag_sentences_bilstm_dedup)
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    pos_m, ner_m = demo_tagger_models()
    pos_bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    ner_bc = spark.sparkContext.broadcast(ner_m.to_bytes())
    sents = tokenize_docs(generate_docs(spark, 150, seed=7)).localCheckpoint()

    def rows(df):
        return sorted(
            (r["doc_id"], r["span_idx"], r["sent_idx"],
             tuple(r["pos_tags"]), tuple(r["ner_tags"]))
            for r in df.select("doc_id", "span_idx", "sent_idx",
                               "pos_tags", "ner_tags").collect())

    plain = rows(tag_sentences_bilstm(sents, pos_bc, ner_bc))
    dedup = rows(tag_sentences_bilstm_dedup(sents, pos_bc, ner_bc))
    assert len(plain) > 100
    assert plain == dedup


def test_onnx_predict_probs_bit_identical():
    """The probability path through the exported-ONNX seam: OnnxTagBackend.
    predict_probs (session logits + shared probs_from_logits) must equal the NumPy
    model's predict_probs BIT-FOR-BIT — closes the 'probability output is
    NumPy-only' production-activation note for the BiLSTM path."""
    from lingvo_spark_kg.fixtures.corpus import make_docs
    from lingvo_spark_kg.model.backend import OnnxTagBackend
    from lingvo_spark_kg.model.onnx_export import to_onnx_bundle
    from lingvo_spark_kg.model.onnx_numpy import numpy_session_factory
    from lingvo_spark_kg.model.pinned import pinned_tagger_models
    from lingvo_spark_kg.operators.tokenize import _tokenize_text

    pos_m, _ = pinned_tagger_models()
    onnx = OnnxTagBackend.from_bytes(to_onnx_bundle(pos_m),
                                     session_factory=numpy_session_factory)
    n_checked = 0
    for _did, spans in make_docs(12, start=500_000):
        for s in spans:
            if s["kind"] != "text" or not s["text"]:
                continue
            for _si, _st, _ln, toks in _tokenize_text(s["text"], True):
                feats = [t["ending_pos"] for t in toks]
                if len(feats) > 220:
                    continue  # probs is the batch-1 ≤220 API, as in the reference
                assert onnx.predict_probs(feats) == pos_m.predict_probs(feats)
                n_checked += 1
    assert n_checked > 20


def test_streaming_dnn_equals_batch(spark, tmp_path):
    """The DNN regimen through the streaming seam (dnn_batch_extractor →
    stream_docs_to_triples foreachBatch) produces the SAME triples as the batch
    extraction over the same input — one extraction code path, no semantic drift
    between batch and streaming for the production tagger."""
    from lingvo_spark_kg.model.demo import demo_tagger_models
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.operators.streaming import (dnn_batch_extractor,
                                                     read_streamed_triples,
                                                     stream_docs_to_triples)

    pos_m, ner_m = demo_tagger_models()
    pos_bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    ner_bc = spark.sparkContext.broadcast(ner_m.to_bytes())
    docs = generate_docs(spark, 120, seed=11)
    in_dir = str(tmp_path / "docs")
    docs.write.parquet(in_dir)

    extract = dnn_batch_extractor(pos_bc, ner_bc)
    q = stream_docs_to_triples(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        max_files_per_trigger=2, extract_fn=extract)
    q.awaitTermination()

    def rows(df):
        return sorted((r["doc_id"], r["span_idx"], r["sent_idx"], r["subj"],
                       r["pred"], r["obj"]) for r in df.collect())

    streamed = rows(read_streamed_triples(spark, str(tmp_path / "out")))
    batch = rows(extract(spark.read.parquet(in_dir)))
    assert len(batch) > 50
    assert streamed == batch


def test_pack_contexts_auto_shards_scale_with_corpus(spark, monkeypatch):
    """n_shards=None derives the shard count from the corpus size (the 'shards scale
    with the corpus, not the cores' rule enforced by code, not docstring)."""
    import pandas as pd

    from lingvo_spark_kg.operators import corpus_ops
    from lingvo_spark_kg.operators.corpus_ops import pack_contexts

    monkeypatch.setattr(corpus_ops, "ROWS_PER_PACK_SHARD", 10)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(35)), "n_tokens": [5] * 35,
    }))
    out = pack_contexts(df, budget=16, n_shards=None,
                        n_tokens_col=F.col("n_tokens")).collect()
    # ceil(35 / 10) = 4 shards; pmod(doc_id, 4)
    assert {r["shard"] for r in out} == {0, 1, 2, 3}
    for r in out:
        assert r["shard"] == r["doc_id"] % 4
