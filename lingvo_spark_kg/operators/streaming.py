"""Structured Streaming: incremental docs → triples, stateful mention counts,
watermarked windowed aggregation.

The reference is a batch/offline system (no streaming constructs — SURVEY.md §2.7), so
the batch pipeline is the primary shape. This module adds the incremental shapes a
production triple factory needs:

 * ``stream_docs_to_triples`` — file-source ``readStream`` through the SAME fused
   extraction operator via ``foreachBatch`` (one code path for batch and streaming —
   no semantic drift, including duplicate multiplicity). foreachBatch is
   at-least-once, so the write is made idempotent by keying each micro-batch to its
   own partition directory (``batch_id=N``) written with overwrite — a retried batch
   replaces its own output instead of appending twice. Combined with the file-source
   checkpoint this yields effective exactly-once.
 * ``streaming_mention_counts`` — custom stateful operator via
   ``applyInPandasWithState``: cumulative per-mention occurrence counts across
   micro-batches, state in the checkpointed state store (survives restarts).
 * ``windowed_event_counts`` — watermark + tumbling-window aggregation over an event
   stream: late events within the watermark still update their window; events later
   than the watermark are dropped (bounded state at 100 TB/day event volumes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import DOCS_SCHEMA
from .triples import docs_to_triples_fused


def dnn_batch_extractor(pos_model_bc, ner_model_bc, backend_loader=None,
                        dedup: bool = True):
    """docs-frame → triples-frame extractor for the DNN regimen — the streaming
    counterpart of the pipeline's staged dnn path (tokenize → BiLSTM POS+NER →
    triple templates), pass as ``extract_fn`` to ``stream_docs_to_triples``. The
    per-micro-batch dedup (``dedup=True``) amortizes duplicate sentences within
    each batch exactly like the batch pipeline's corpus-global pass does; the
    tokenized micro-batch is localCheckpointed first so the dedup join's two sides
    read the materialization instead of re-running the tokenizer (the batch
    pipeline gets the same from its written sentences stage)."""
    from .tag import tag_sentences_bilstm, tag_sentences_bilstm_dedup
    from .tokenize import tokenize_docs
    from .triples import extract_triples_df

    def extract(docs_df: DataFrame) -> DataFrame:
        sentences = tokenize_docs(docs_df)
        if dedup:
            tagged = tag_sentences_bilstm_dedup(
                sentences.localCheckpoint(), pos_model_bc, ner_model_bc,
                backend_loader=backend_loader)
        else:
            tagged = tag_sentences_bilstm(sentences, pos_model_bc, ner_model_bc,
                                          backend_loader=backend_loader)
        return extract_triples_df(tagged)

    return extract


def stream_docs_to_triples(spark: SparkSession, input_dir: str, output_dir: str,
                           checkpoint_dir: str, gazetteer_bc=None,
                           max_files_per_trigger: int = 16, extract_fn=None):
    """Start the incremental extraction; returns the StreamingQuery.

    input_dir: parquet files with the docs schema (doc_id, spans).
    output_dir: append-mode parquet triples table.
    extract_fn: docs-frame → triples-frame override (default: the fused lexicon
    extraction with ``gazetteer_bc``; use ``dnn_batch_extractor(...)`` for the DNN
    regimen — one seam, so batch and streaming can never drift).
    """
    if extract_fn is None:
        if gazetteer_bc is None:
            raise ValueError("stream_docs_to_triples needs gazetteer_bc or extract_fn")
        def extract_fn(batch_df):  # noqa: E306
            return docs_to_triples_fused(batch_df, gazetteer_bc)
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = extract_fn(batch_df)
        # idempotent sink: one directory per micro-batch, overwritten on retry
        triples.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_docs_to_kg(spark: SparkSession, input_dir: str, pipeline,
                      checkpoint_dir: str, max_files_per_trigger: int = 16):
    """A continuously MAINTAINED knowledge graph: file-source ``readStream`` of
    docs → ``KgPipeline.ingest_delta`` per micro-batch — each trigger merges its
    documents into the graph layer with delta+vocabulary work
    (operators/incremental.py), never a base re-scan. Returns the StreamingQuery.

    Exactly-once composition: foreachBatch is at-least-once, but the streaming
    batch id is stable across replays and the file-source checkpoint replays the
    SAME files — so mapping spark's batch id onto the ingest batch id and passing
    ``if_committed='skip'`` makes a replayed trigger a no-op against the already
    ATOMICALLY committed ``ingest_log.json`` generation. Empty triggers are
    skipped without consuming an ingest generation.

    The pipeline's workdir must be dedicated to this stream (its base ``run()``
    done, ``edge_doc_sketch=True``): interleaving manual ``ingest_delta`` calls
    with a live stream would collide with the spark-batch-id → ingest-id mapping
    (same single-writer rule Iceberg imposes on compacting committers)."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipeline.ingest_delta(batch_df, batch_id=batch_id + 1,
                              if_committed="skip")

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_triples(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read the streaming sink back in the BATCH triples_raw shape: partition
    discovery adds an int ``batch_id`` column (the per-micro-batch directory key)
    that ``docs_to_triples_fused`` output does not have, so a raw
    ``spark.read.parquet(output_dir)`` is NOT schema-compatible with the batch
    table — this helper drops the partition column so the two paths union/compare
    cleanly (tests/test_streaming_conll.py uses it for the streamed≡batch check)."""
    return spark.read.parquet(output_dir).drop("batch_id")


MENTION_COUNTS_SCHEMA = T.StructType([
    T.StructField("mention_norm", T.StringType()),
    T.StructField("mention_type", T.StringType()),
    T.StructField("n_total", T.LongType()),
])

_MENTION_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def streaming_mention_counts(spark: SparkSession, input_dir: str, gazetteer_bc) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): docs file-stream →
    fused triple extraction (stateless mapInArrow works unchanged on streaming frames)
    → explode subject/object mentions → per-(norm, type) CUMULATIVE occurrence counts.
    Running totals live in the state store under the query's checkpoint, so counts
    keep accumulating across restarts; emit mode is 'update' (one row per touched
    mention per micro-batch)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .linking import mention_pairs

    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    mentions = mention_pairs(docs_to_triples_fused(docs, gazetteer_bc))

    def update_counts(key, pdfs, state):
        n_new = sum(len(pdf) for pdf in pdfs)
        n_old = state.get[0] if state.exists else 0
        total = n_old + n_new
        state.update((total,))
        yield pd.DataFrame({
            "mention_norm": [key[0]], "mention_type": [key[1]], "n_total": [total],
        })

    return mentions.groupBy("mention_norm", "mention_type").applyInPandasWithState(
        update_counts,
        outputStructType=MENTION_COUNTS_SCHEMA,
        stateStructType=_MENTION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(events: DataFrame, watermark: str = "10 minutes",
                          window: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation for late data: events carry an event-
    time ``ts``; a late event inside the watermark still updates its window, one
    beyond it is dropped and its window's state evicted — state stays bounded by
    (watermark horizon / window size) × key cardinality regardless of stream length.
    Works on both streaming and batch frames (same plan)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "event_type", "n_events", "sum_value")
    )
