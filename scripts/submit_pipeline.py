#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

    spark-submit --py-files dist/nous_spark.zip scripts/submit_pipeline.py \
        --source /data/source_table --out /data/kg --batches 64 [--no-link]

On a cluster the SparkSession comes from spark-submit's conf; locally this
falls back to local[*]. The job is fully resumable: re-submitting after a
failure skips completed (stage, batch) checkpoints.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True,
                    help="source table: parquet dir, Iceberg identifier, or catalog table name (see read_source_table)")
    ap.add_argument("--out", required=True, help="output/state root")
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--no-link", action="store_true")
    ap.add_argument("--fancy", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("nous_kg_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from nous_spark.plans.pipeline import pipeline_metrics, run_pipeline

    from nous_spark.sources.readers import read_source_table

    source = read_source_table(spark, args.source)
    final = run_pipeline(
        spark, source, args.out,
        n_batches=args.batches, fancy=args.fancy, link=not args.no_link,
    )
    n = final.count()
    print(f"pipeline complete: {n} canonical triples at {args.out}")
    pipeline_metrics(spark, args.out).groupBy("stage").sum("rows_out").show()


if __name__ == "__main__":
    main()
