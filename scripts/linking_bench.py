#!/usr/bin/env python
"""Linking-at-KG-scale bench (round-1 roadmap #4 / VERDICT next-round #10).

Generates an N-file synthetic code corpus, extracts a KG (code mode), then
runs the full collective-linking path over every `calls` mention with the
candidate universe restricted to typed code entities
(candidate_types=["FUNCTION","CLASS","MODULE"]) — the blocked J2 join plus
the per-doc referent-graph solve.

Usage: python scripts/linking_bench.py [n_files] [cpus]
Prints one JSON line: mentions/sec for candidate generation and full link.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
    )
    from pyspark.sql import functions as F

    from nous_spark.corpus import corpus_df
    from nous_spark.operators.extraction import extract_triples
    from nous_spark.operators.linking import candidate_pairs, link_entities, vertices_with_alias
    from nous_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="linking_bench")
    src = corpus_df(spark, n_files=n_files, seed=42)
    kg = extract_triples(src, code_mode=True).persist()
    n_triples = kg.count()

    mentions = (
        kg.filter(F.col("pred") == "calls")
        .select(F.col("src").alias("doc_id"), F.col("obj").alias("mention"))
        .dropDuplicates()
        .persist()
    )
    n_mentions = mentions.count()

    typed = (
        kg.filter((F.col("pred") == "rdf:type")
                  & F.col("obj").isin(["FUNCTION", "CLASS", "MODULE"]))
        .select(F.xxhash64("subj").alias("id")).distinct()
    )
    ents = vertices_with_alias(kg).join(typed, "id", "left_semi").withColumn(
        "names",
        F.array_union(
            "names", F.array(F.element_at(F.split(F.col("label"), "::"), -1))
        ),
    ).persist()
    n_entities = ents.count()

    t0 = time.perf_counter()
    n_cands = candidate_pairs(mentions, ents, 0.7).count()
    t_cand = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_linked = link_entities(
        mentions, kg, candidate_types=["FUNCTION", "CLASS", "MODULE"]
    ).count()
    t_link = time.perf_counter() - t0

    print(json.dumps({
        "metric": "linking_bench",
        "n_files": n_files,
        "cpus": cpus,
        "n_triples": n_triples,
        "n_mentions": n_mentions,
        "n_entities": n_entities,
        "n_candidates": n_cands,
        "candidate_gen_sec": round(t_cand, 3),
        "candidate_mentions_per_sec": round(n_mentions / max(t_cand, 1e-9), 1),
        "full_link_sec": round(t_link, 3),
        "link_mentions_per_sec": round(n_mentions / max(t_link, 1e-9), 1),
        "n_linked": n_linked,
    }))


if __name__ == "__main__":
    main()
