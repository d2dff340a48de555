"""Structured Streaming ingestion: incremental docs → triples.

The reference is a batch/offline system (no streaming constructs — SURVEY.md §2.7), so
the batch pipeline is the primary shape. This module adds the incremental-ingest
variant a production triple factory needs: new doc files landing in a directory are
picked up by a file-source ``readStream``, run through the SAME fused extraction
operator via ``foreachBatch`` (one code path for batch and streaming — no semantic
drift, including duplicate multiplicity). foreachBatch is at-least-once, so the write
is made idempotent by keying each micro-batch to its own partition directory
(``batch_id=N``) written with overwrite — a retried batch replaces its own output
instead of appending twice. Combined with the file-source checkpoint this yields
effective exactly-once.
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
        # idempotent sink: one directory per micro-batch, overwritten on retry
        triples.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
