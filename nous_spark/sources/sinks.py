"""Sinks (S13-S15): partitioned triple tables + checkpoint dumps.

The head-predicate/head-entity skew problem (a handful of predicates like
rdf:type / imports carry most rows) is handled with an explicit salt
column so each predicate partition's files are written by many tasks, and
downstream repartitions can use (pred, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 64


def write_triples(
    triples: DataFrame,
    path: str,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """S13: parquet partitioned by pred with subject-hash salt. The
    pre-write repartition on (pred, salt) gives each partition dir
    multiple evenly-sized files instead of one skewed writer task per
    predicate."""
    salted = triples.withColumn(
        "salt", F.pmod(F.xxhash64("subj"), F.lit(salt_buckets)).cast("int")
    )
    (
        salted.repartition(F.col("pred"), F.col("salt"))
        .write.mode(mode)
        .partitionBy("pred")
        .parquet(path)
    )


def read_triples(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_triples_bucketed(
    triples: DataFrame,
    table_name: str,
    buckets: int = 64,
    key: str = "subj",
    mode: str = "overwrite",
) -> None:
    """S13 co-location variant: a bucketed + sorted triple TABLE for
    workloads that repeatedly join on the subject key (alias resolution,
    degree joins, path expansion). ``bucketBy(subj) + sortBy(subj)``
    pre-shuffles and pre-sorts at write time, so every later
    bucketed⋈bucketed subj-join runs with NO Exchange and NO Sort on
    either side — at 100 TB that converts the dominant repeated shuffle
    of the linking stage into a one-time write cost. Plan-verified in
    tests (SortMergeJoin with zero Exchange nodes).

    Bucketed tables must go through the session catalog (saveAsTable) —
    a bare parquet path cannot carry bucket metadata."""
    (
        triples.write.mode(mode).format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table_name)
    )


def write_pattern_outputs(frequent: DataFrame, per_batch: DataFrame,
                          dep_edges: DataFrame, root: str) -> None:
    """S14 (DatatoPatternGraph.scala:493-506): frequent patterns, per-batch
    log (partitioned by batch), dependency edges."""
    frequent.write.mode("overwrite").parquet(f"{root}/frequent_patterns")
    per_batch.write.mode("overwrite").partitionBy("batch_id").parquet(
        f"{root}/frequent_patterns_per_batch"
    )
    dep_edges.write.mode("overwrite").parquet(f"{root}/dependency_graph")


def dump_graph(vertices: DataFrame, edges: DataFrame, root: str) -> None:
    """S15 (dumpGraphObj :625-676): parquet checkpoint of a graph —
    also the resume format."""
    vertices.write.mode("overwrite").parquet(f"{root}/vertices")
    edges.write.mode("overwrite").parquet(f"{root}/edges")


def load_graph(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{root}/vertices"),
        spark.read.parquet(f"{root}/edges"),
    )


def write_training_shards(
    packed: DataFrame,
    path: str,
    mode: str = "overwrite",
    source_col: str = "source",
) -> None:
    """Materialize a packed training set (the output of
    ``datasets.prepare_training_set`` / ``pack_into_shards``) as parquet
    partitioned by (split, source): the loader reads one split by
    partition pruning alone, and per-source mixture adjustments at load
    time stay file-level operations.

    The pre-write repartition on (split, source, shard_id) lines writer
    tasks up with shards — each shard's rows land together instead of
    being scattered across whichever tasks held them, so a data loader
    streaming shard files in shard_id order sees contiguous token
    streams. Same skew logic as ``write_triples``: the shard id is
    already a balanced key (shards are token-budget-equal by
    construction), so no extra salt is needed."""
    (
        packed.repartition(F.col("split"), F.col(source_col),
                           F.col("shard_id"))
        .write.mode(mode)
        .partitionBy("split", source_col)
        .parquet(path)
    )
