"""Larger-scale bench point for the pair-blowup-prone operators
(dedup/ANN/graph-relatedness): run each at sf0.1 and at a 10x synthetic
amplification of the same tables, and report the wall-time growth factor.
A quadratic candidate generator shows up here as growth >> 10x — sf0.1
alone cannot see it.

Amplification is deterministic and blowup-honest: each of the 10 copies
prefixes every word of the document text with a copy tag (every shingle
and every hashed word feature changes, so copies are NOT near-duplicates
of each other — candidate pairs grow ~linearly, like a real corpus) and
array-rotates the embeddings; graph keys are offset per copy (10
disjoint isomorphic subgraphs).

A probe is SUPERLINEAR only if wall time grows materially beyond BOTH
the input factor and the output-row growth: an operator whose OUTPUT
legitimately grows (a9's Milne-Witten sr>0 cutoff keeps more pairs as
the label universe N grows) is time-linear per emitted row, which is the
property that survives 100 TB.

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
        if k == 0:
            text = F.col("text")
        else:
            # per-copy word tag: every shingle and hashed word feature
            # differs across copies → no cross-copy near-duplicates.
            # Factory closure, NOT a default arg (a 2-arg lambda would
            # receive the array index as the "constant")
            def tag_factory(kk):
                return lambda w: F.concat(F.lit(f"c{kk}_"), w)

            text = F.array_join(F.transform(words, tag_factory(k)), " ")
        copies.append(
            docs.select(
                (F.col("doc_id") + k * n * 10).alias("doc_id"),
                "lang",
                text.alias("text"),
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
        nbrs = li.select(
            F.col("l_suppkey").cast("long").alias("entity_id"),
            F.col("l_partkey").cast("string").alias("nbr_label"),
        )
        n_labels = li.select("l_partkey").distinct().count()
        return {
            "dd_minhash_pairs": lambda: minhash_near_duplicates(
                docs, threshold=0.8),
            "dd_simhash_pairs": lambda: simhash_near_duplicates(
                docs, max_hamming=3),
            "ann_lsh_topk": lambda: lsh_topk(
                emb, q, dim=dim, k=10, n_bits=8, n_tables=3),
            "a9_semantic_relatedness": lambda: semantic_relatedness_pairs(
                nbrs, n_labels),
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
        gr = r[f"{factor}x"]["rows"] / max(r["1x"]["rows"], 1)
        r["growth"] = round(g, 2)
        r["rows_growth"] = round(gr, 2)
        # n log n at 10x input ≈ 12x; an output-bound op is entitled to
        # its output growth. Flag only time beyond BOTH allowances.
        allowance = 1.6 * max(factor, gr)
        r["verdict"] = "ok" if g <= allowance else "SUPERLINEAR"
        print(f"{name}: {r['1x']['sec']}s -> {r[f'{factor}x']['sec']}s "
              f"({g:.1f}x time, {gr:.1f}x rows, {r['verdict']})")

    out = {"metric": "scale_probe_growth", "sf": sf, "factor": factor,
           "results": results}
    with open(os.path.join(REPO, "BENCH_scale_probe.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
