"""Structured Streaming ingestion: incremental docs → triples.

The reference is a batch/offline system (no streaming constructs — SURVEY.md §2.7), so
the batch pipeline is the primary shape. This module adds the incremental-ingest
variant a production triple factory needs: new doc files landing in a directory are
picked up by a file-source ``readStream``, run through the SAME fused extraction
operator via ``foreachBatch`` (one code path for batch and streaming — no semantic
drift), deduplicated per micro-batch against the sink, and appended to the triples
table. Checkpointing = Spark streaming checkpoint (exactly-once file-source progress)
on top of the pipeline's own stage checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import DOCS_SCHEMA
from .triples import docs_to_triples_fused


def stream_docs_to_triples(spark: SparkSession, input_dir: str, output_dir: str,
                           checkpoint_dir: str, gazetteer_bc,
                           max_files_per_trigger: int = 16):
    """Start the incremental extraction; returns the StreamingQuery.

    input_dir: parquet files with the docs schema (doc_id, spans).
    output_dir: append-mode parquet triples table.
    """
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = docs_to_triples_fused(batch_df, gazetteer_bc)
        # J5 dedup within the micro-batch; cross-batch exactly-once comes from the
        # file-source checkpoint (each input file processed once)
        triples = triples.dropDuplicates(
            ["doc_id", "span_idx", "sent_idx", "subj", "pred", "obj"]
        )
        triples.write.mode("append").parquet(output_dir)

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
