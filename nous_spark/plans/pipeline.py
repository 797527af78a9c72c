"""End-to-end KG-construction pipeline (the north rule):

    source table (repo, path, commit, lang, content)
      → [extract]      triples per batch          (mapInPandas, no shuffle)
      → [link]         mention → entity per batch (blocked join + per-doc solve)
      → [canonicalize] alias collapse, global     (hash-to-min CC)
      → [materialize]  triple tables partitionBy(pred) + salt

Batching: batch_id = pmod(xxhash64(repo, path), n_batches) — deterministic,
so resume recomputes identical batches. Every stage goes through
StateStore.run_stage (checkpoint + per-partition lineage + sha invariant),
so a killed run resumes exactly where it stopped and produces identical
output (tests/test_pipeline_resume.py proves byte-equality of values).

Scale notes: extraction is embarrassingly parallel per input split; the
only global barriers are the CC fixpoint (bounded rounds, one shuffle each)
and the final write. At 10^12 files n_batches becomes date/prefix
partitions of the Iceberg table instead of a hash — the protocol is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nous_spark.operators.canonicalize import canonicalize
from nous_spark.operators.extraction import extract_triples, with_content_sha
from nous_spark.operators.linking import link_entities
from nous_spark.plans.lineage import StateStore

SALT_BUCKETS = 64


def _sha_check(source_sha: DataFrame):
    """Returns a checker verifying every (repo, path) in the stage output
    carries exactly the source's sha256(content)."""

    def check(out: DataFrame) -> bool:
        got = out.select("repo", "path", "content_sha").distinct()
        bad = (
            got.join(source_sha, ["repo", "path"], "left")
            .filter(
                F.col("content_sha").isNull()
                | (F.col("content_sha") != F.col("src_sha"))
            )
            .limit(1)
            .count()
        )
        return bad == 0

    return check


def run_pipeline(
    spark: SparkSession,
    source: DataFrame,
    out_root: str,
    n_batches: int = 4,
    fancy: bool = False,
    link: bool = True,
) -> DataFrame:
    """Run (or resume) the full pipeline; returns the canonical triple DF."""
    store = StateStore(spark, out_root)
    src = with_content_sha(source).withColumn(
        "batch_id", F.pmod(F.xxhash64("repo", "path"), F.lit(n_batches)).cast("int")
    )
    src.persist()
    source_sha = src.select(
        "repo", "path", F.col("content_sha").alias("src_sha")
    ).persist()

    # -------- stage 1+2 per batch: extract, link
    for b in range(n_batches):
        batch = src.filter(F.col("batch_id") == b).drop("batch_id")
        triples = store.run_stage(
            "extract",
            b,
            lambda batch=batch: extract_triples(batch, fancy=fancy),
            rows_in=batch.count(),
            sha_check=_sha_check(source_sha),
        )
        if link:
            mentions = (
                triples.filter(F.col("pred") == "calls")
                .select(
                    F.col("src").alias("doc_id"),
                    F.col("obj").alias("mention"),
                    F.col("repo"),
                )
                .distinct()
            )
            kg = triples.select("subj", "pred", "obj")
            store.run_stage(
                "link",
                b,
                lambda mentions=mentions, kg=kg: link_entities(
                    mentions.drop("repo"), kg
                ),
                rows_in=mentions.count(),
            )

    # -------- stage 3 global: canonicalize
    all_triples = store.read_all_batches("extract")

    def _canon() -> DataFrame:
        canon, mapping = canonicalize(all_triples.drop("batch"))
        mapping.write.mode("overwrite").parquet(f"{out_root}/state/canonical_map")
        return canon

    canon = store.run_stage(
        "canonicalize", 0, _canon, rows_in=all_triples.count(),
        sha_check=_sha_check(source_sha),
    )

    # -------- stage 4 global: materialize partitioned by pred with salt
    def _materialize() -> DataFrame:
        return canon.withColumn(
            "salt", F.pmod(F.xxhash64("subj"), F.lit(SALT_BUCKETS)).cast("int")
        )

    final = store.run_stage(
        "materialize", 0, _materialize,
        rows_in=canon.count(),
        sha_check=_sha_check(source_sha),
        partition_cols=["pred"],
    )
    src.unpersist()
    source_sha.unpersist()
    return final


def pipeline_metrics(spark: SparkSession, out_root: str) -> DataFrame:
    """Lineage/metrics table for a pipeline run."""
    return StateStore(spark, out_root).lineage()
