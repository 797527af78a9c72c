"""Structured Streaming capability tests: file-source stream →
foreachBatch extraction with exactly-once checkpointing; watermarked
windowed aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nous_spark.corpus import corpus_df
from nous_spark.streaming.structured import (
    start_extraction_stream,
    windowed_event_counts,
)


def test_extraction_stream_available_now(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    corpus_df(spark, n_files=30, seed=9).repartition(3).write.parquet(src_dir)

    out = str(tmp_path / "out")
    q = start_extraction_stream(spark, src_dir, out)
    q.awaitTermination(120)
    assert not q.isActive

    triples = spark.read.parquet(f"{out}/triples/batch=*")
    docs = spark.read.parquet(f"{out}/docs/batch=*")
    assert triples.count() > 0
    assert docs.count() == 30
    # restart with same checkpoint: no new data → no duplicate output
    n_before = triples.count()
    q2 = start_extraction_stream(spark, src_dir, out)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/triples/batch=*").count() == n_before


def test_windowed_event_counts_static(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev)
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r.cnt for r in rows)
    assert total == ev.count()


def test_windowed_event_counts_streaming(spark, tmp_path, sf_dir):
    """Same aggregation over an actual readStream (memory sink)."""
    src = str(tmp_path / "ev")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; the final
    # windows stay open, so assert a prefix of the static result appeared
    got = spark.sql("select * from win_counts").collect()
    static = windowed_event_counts(
        spark.read.parquet(src)
    ).collect()
    assert len(got) <= len(static)
    static_keys = {(r.window_start, r.event_type, r.cnt) for r in static}
    assert all((r.window_start, r.event_type, r.cnt) in static_keys for r in got)
