"""Delta-cost evidence for the incremental MIS store: folding a crawl
increment must cost ~∝ the delta, not the corpus, and far less than
the full re-mine the reference's loop performs per batch
(DatatoPatternGraph.scala:513-588).

Protocol (sf0.1 by default): build the store from has_brand + ~97% of
the distinct supplies edges, then time (a) a ~1% delta fold, (b) a ~2%
delta fold (fresh store each time so the prior fold doesn't help), and
(c) the full from-scratch rebuild over base+delta — the cost the
incremental path replaces. Reports best-of-NOUS_BENCH_REPS (default 2,
host noise is ±30%: never trust a single run).

Usage: python scripts/mis_inc_bench.py [sf_dir] [cpus]
Prints one JSON line; redirect to BENCH_mis_inc.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nous_spark.session import get_spark  # noqa: E402
from nous_spark.operators.mining_inc import (  # noqa: E402
    build_mis_store,
    read_mis_support,
    update_mis_store,
)

PAIRS = [("supplies", "has_brand")]


def _triples(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supplies = li.select(
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("subj"),
        F.lit("supplies").alias("pred"),
        F.concat(F.lit("P"), F.col("l_partkey")).alias("obj"),
    ).distinct().withColumn(
        "slot", F.pmod(F.xxhash64("subj", "obj"), F.lit(100)))
    has_brand = part.select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("subj"),
        F.lit("has_brand").alias("pred"),
        F.col("p_brand").alias("obj"),
    )
    return supplies, has_brand


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("NOUS_BENCH_REPS", "2"))
    spark = get_spark(cores=int(cpus))

    supplies, has_brand = _triples(spark, sf_dir)
    base = supplies.filter(F.col("slot") >= 3).drop("slot") \
        .unionByName(has_brand).localCheckpoint(eager=True)
    d_small = supplies.filter(F.col("slot") == 0).drop("slot") \
        .localCheckpoint(eager=True)
    d_big = supplies.filter(F.col("slot") < 2).drop("slot") \
        .localCheckpoint(eager=True)
    n_base, n_small, n_big = base.count(), d_small.count(), d_big.count()

    def _fresh_store() -> str:
        root = tempfile.mkdtemp(prefix="misbench_")
        path = f"{root}/store"
        build_mis_store(base, path, pair_patterns=PAIRS, buckets=32)
        return path

    results: dict[str, float] = {}
    for rep in range(reps):
        for name, delta in (("update_small", d_small),
                            ("update_big", d_big)):
            path = _fresh_store()
            t0 = time.monotonic()
            update_mis_store(spark, delta, path, update_id=1)
            read_mis_support(spark, path).collect()
            w = time.monotonic() - t0
            results[name] = min(results.get(name, 1e9), w)
            shutil.rmtree(os.path.dirname(path), ignore_errors=True)
        root = tempfile.mkdtemp(prefix="misbench_")
        t0 = time.monotonic()
        build_mis_store(base.unionByName(d_small), f"{root}/store",
                        pair_patterns=PAIRS, buckets=32)
        read_mis_support(spark, f"{root}/store").collect()
        w = time.monotonic() - t0
        results["full_rebuild"] = min(results.get("full_rebuild", 1e9), w)
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({
        "metric": "mis_store_delta_fold_sec",
        "value": round(results["update_small"], 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "reps": reps,
        "n_base_edges": n_base,
        "n_delta_small": n_small,
        "n_delta_big": n_big,
        "update_small_sec": round(results["update_small"], 3),
        "update_big_sec": round(results["update_big"], 3),
        "full_rebuild_sec": round(results["full_rebuild"], 3),
        "speedup_vs_rebuild": round(
            results["full_rebuild"] / results["update_small"], 2),
    }))


if __name__ == "__main__":
    main()
