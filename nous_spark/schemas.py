"""Engine-wide StructType schemas (SURVEY.md §1, FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import types as T

# North-rule input table (BASELINE.json input_hint)
SOURCE_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), False),
])

# Triple record (TripleParser.scala:28-38) + provenance + invariant carry
TRIPLE_SCHEMA = T.StructType([
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("conf", T.DoubleType(), False),
    T.StructField("kind", T.StringType(), False),  # 'rel' | 'type'
    T.StructField("repo", T.StringType(), True),
    T.StructField("path", T.StringType(), True),
    T.StructField("commit", T.StringType(), True),
    T.StructField("src", T.StringType(), True),
    T.StructField("content_sha", T.StringType(), True),
])

MENTION_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("mention", T.StringType(), False),
    T.StructField("ner_type", T.StringType(), False),
])

EDGE_SCHEMA = T.StructType([
    T.StructField("src", T.LongType(), False),
    T.StructField("dst", T.LongType(), False),
    T.StructField("pred", T.StringType(), False),
])

VERTEX_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("label", T.StringType(), False),
])

LINEAGE_SCHEMA = T.StructType([
    T.StructField("stage", T.StringType(), False),
    T.StructField("batch_id", T.IntegerType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("rows_in", T.LongType(), False),
    T.StructField("rows_out", T.LongType(), False),
    T.StructField("sha_ok", T.BooleanType(), False),
    T.StructField("wall_ms", T.DoubleType(), False),
])
