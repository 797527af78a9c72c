"""Materialize a deterministic 10x amplification of sf0.1 ("sf1-like") to
a local directory, TPC-H-style: fact tables scale 10x with per-copy key
offsets (joins stay consistent across tables), dimension tables
nation/region stay fixed (as in real TPC-H scale factors). Documents get
per-copy word tags (copies are NOT near-duplicates of each other — the
honest corpus-growth model, same as scripts/scale_probe.py); embeddings
are per-copy array-rotated.

Usage: python scripts/make_sf1.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OFF = 100_000_000  # per-copy key offset, far above any sf0.1 key space


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from nous_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    materialize(spark, src, out, factor)


def materialize(spark, src: str, out: str, factor: int = 10) -> None:
    """Amplify ``src`` into ``out`` (callable form — bench.py uses it to
    materialize the sf1 pass on demand)."""
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    os.makedirs(out, exist_ok=True)

    for t in ["region", "nation"]:  # fixed dims
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet")
        print(f"{t}: copied")

    for t, keys in key_cols.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for k in range(factor):
            c = df
            for col in keys:
                c = c.withColumn(col, F.col(col) + F.lit(k * OFF))
            copies.append(c)
        outdf = copies[0]
        for c in copies[1:]:
            outdf = outdf.unionByName(c)
        outdf.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{factor}")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.count()
    copies = []
    for k in range(factor):
        words = F.split(F.trim(F.lower("text")), r"\s+")
        if k == 0:
            text = F.col("text")
        else:
            def tag_factory(kk):
                return lambda w: F.concat(F.lit(f"c{kk}_"), w)

            text = F.array_join(F.transform(words, tag_factory(k)), " ")
        copies.append(docs.select(
            (F.col("doc_id") + k * OFF).alias("doc_id"),
            text.alias("text"), "lang", "source",
            F.length(text).alias("n_chars"),
        ))
    outdf = copies[0]
    for c in copies[1:]:
        outdf = outdf.unionByName(c)
    outdf.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"documents: x{factor} ({n} -> {n * factor})")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    copies = []
    for k in range(factor):
        rot = 1 + k
        e = F.col("embedding")
        rotated = (F.concat(F.slice(e, rot + 1, 100_000), F.slice(e, 1, rot))
                   if k else e)
        copies.append(emb.select(
            (F.col("vec_id") + k * OFF).alias("vec_id"),
            rotated.alias("embedding"),
        ))
    outdf = copies[0]
    for c in copies[1:]:
        outdf = outdf.unionByName(c)
    outdf.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"embeddings: x{factor}")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
