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
