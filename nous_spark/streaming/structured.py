"""Structured Streaming form of the ingestion pipeline (SURVEY.md §2.9).

The reference's "streaming" is a driver for-loop over batch files; the
batch-driver form (batch_driver.py / plans/pipeline.py) matches those
semantics exactly and is what the parity tests exercise. This module is
the real-streaming capability: a file-source readStream over the source
table directory, per-microbatch triple extraction via foreachBatch (reusing
the SAME extraction + StateStore code, so checkpoints/lineage are shared
with the batch pipeline), and a windowed watermark aggregation for
triple-rate monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nous_spark.operators.extraction import extract_triples_normalized
from nous_spark.schemas import SOURCE_SCHEMA
from nous_spark.sources.sinks import write_triples


def stream_source(spark: SparkSession, source_dir: str,
                  max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream over the (repo, path, commit, lang, content)
    table directory — each new parquet file becomes part of a microbatch."""
    return (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def start_extraction_stream(
    spark: SparkSession,
    source_dir: str,
    out_root: str,
    checkpoint_dir: str | None = None,
):
    """readStream → foreachBatch(extract + salted append) → exactly-once
    via the streaming checkpoint. Returns the StreamingQuery."""
    checkpoint_dir = checkpoint_dir or f"{out_root}/_stream_checkpoint"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples, docs = extract_triples_normalized(batch_df)
        write_triples(triples, f"{out_root}/triples/batch={batch_id}",
                      mode="overwrite")
        docs.write.mode("overwrite").parquet(f"{out_root}/docs/batch={batch_id}")

    return (
        stream_source(spark, source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming-compatible windowed aggregation with late-data watermark:
    works identically on a static frame (tests) and a readStream frame."""
    # watermarks require TIMESTAMP (tz) — parquet event times are often NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "cnt", "sum_value")
    )
