"""Larger-scale bench point for the pair-blowup-prone operators
(dedup/ANN/graph-relatedness): run each at sf0.1 and at a 10x synthetic
amplification of the same tables, and report the wall-time growth factor.
A quadratic candidate generator shows up here as growth >> 10x — sf0.1
alone cannot see it.

Amplification is deterministic and blowup-honest: each of the 10 copies
word-rotates the document text (changes nearly all shingles, so copies
are NOT near-duplicates of each other — pair counts grow ~linearly, like
a real corpus) and array-rotates the embeddings; graph keys are offset
per copy (10 disjoint isomorphic subgraphs).

Usage: python scripts/scale_probe.py [sf_dir] [factor]
Writes BENCH_scale_probe.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def amplified_documents(spark, sf, factor):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n = docs.count()
    copies = []
    for k in range(factor):
        words = F.split(F.trim(F.lower("text")), r"\s+")
        rot = 1 + 7 * k
        rotated = F.concat(
            F.slice(words, rot + 1, 1_000_000),
            F.slice(words, 1, rot),
        )
        copies.append(
            docs.select(
                (F.col("doc_id") + k * n * 10).alias("doc_id"),
                "lang",
                F.array_join(rotated, " ").alias("text"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def amplified_embeddings(spark, sf, factor):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n = emb.count()
    copies = []
    for k in range(factor):
        rot = 1 + k
        e = F.col("embedding")
        rotated = F.concat(F.slice(e, rot + 1, 100_000), F.slice(e, 1, rot))
        copies.append(
            emb.select(
                (F.col("vec_id") + k * n * 10).alias("vec_id"),
                rotated.alias("embedding"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def amplified_lineitem(spark, sf, factor):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    copies = [
        li.select(
            (F.col("l_orderkey") + k * 10_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + k * 10_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + k * 10_000_000).alias("l_suppkey"),
            "l_quantity",
        )
        for k in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from nous_spark.operators.ann import lsh_topk
    from nous_spark.operators.dedup import (
        minhash_near_duplicates,
        simhash_near_duplicates,
    )
    from nous_spark.operators.linking import semantic_relatedness_pairs
    from nous_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    def probes(docs, emb, li):
        dim = len(emb.select("embedding").first()[0])
        q = emb.orderBy("vec_id").limit(3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        edges = li.select(
            F.col("l_suppkey").cast("long").alias("src"),
            (F.col("l_partkey") + 20_000_000).cast("long").alias("dst"),
        )
        return {
            "dd_minhash_pairs": lambda: minhash_near_duplicates(
                docs, threshold=0.8),
            "dd_simhash_pairs": lambda: simhash_near_duplicates(
                docs, max_hamming=3),
            "ann_lsh_topk": lambda: lsh_topk(
                emb, q, dim=dim, k=10, n_bits=8, n_tables=3),
            "a9_semantic_relatedness": lambda: semantic_relatedness_pairs(
                edges, min_common=2),
        }

    results = {}
    for scale, load in (
        ("1x", lambda: (
            spark.read.parquet(f"{sf}/documents.parquet"),
            spark.read.parquet(f"{sf}/embeddings.parquet"),
            spark.read.parquet(f"{sf}/lineitem.parquet"),
        )),
        (f"{factor}x", lambda: (
            amplified_documents(spark, sf, factor),
            amplified_embeddings(spark, sf, factor),
            amplified_lineitem(spark, sf, factor),
        )),
    ):
        docs, emb, li = load()
        docs = docs.persist()
        emb = emb.persist()
        li = li.persist()
        print(f"[{scale}] docs={docs.count()} emb={emb.count()} li={li.count()}")
        for name, thunk in probes(docs, emb, li).items():
            t0 = time.time()
            rows = thunk().count()
            dt = time.time() - t0
            results.setdefault(name, {})[scale] = {
                "sec": round(dt, 3), "rows": rows}
            print(f"[{scale}] {name}: {rows} rows in {dt:.1f}s")
        docs.unpersist()
        emb.unpersist()
        li.unpersist()

    for name, r in results.items():
        g = r[f"{factor}x"]["sec"] / max(r["1x"]["sec"], 1e-9)
        r["growth"] = round(g, 2)
        # n log n at 10x input ≈ 12x; flag anything materially beyond it
        r["verdict"] = "ok" if g <= factor * 1.6 else "SUPERLINEAR"
        print(f"{name}: {r['1x']['sec']}s -> {r[f'{factor}x']['sec']}s "
              f"({g:.1f}x, {r['verdict']})")

    out = {"metric": "scale_probe_growth", "sf": sf, "factor": factor,
           "results": results}
    with open(os.path.join(REPO, "BENCH_scale_probe.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
