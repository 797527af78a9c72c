#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1) — bench.py is FROZEN.

Times any subset of declared queries with the same methodology as bench.py
(df.count(), best-of-REPS, clearCache between queries) at any SF dir, and
optionally dumps .explain("formatted") per query to plans/r09/.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
  python bench_extra.py --explain suffix q1 q2      # also write plans
  python bench_extra.py --all-groups                # every timed group
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
REPS = int(os.environ.get("NOUS_BENCH_REPS", "2"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r09")


def main() -> None:
    args = sys.argv[1:]
    explain_suffix = None
    if args and args[0] == "--explain":
        explain_suffix = args[1]
        args = args[2:]

    import __spark_entry__ as entrymod
    from nous_spark.session import get_spark

    spark = get_spark(cores=CPUS, app_name="nous_bench_extra")
    queries = entrymod.queries()
    if args and args[0] == "--all-groups":
        args = [
            "kg_store_query", "str_mis_ingest", "kg_mis_update",
            "str_cc_ingest", "kg_triple_store", "g_cc_update",
            "kg_canonical_update", "str_ivf_ingest", "dd_semantic_dedup",
            "str_asof_enrich", "g7_pic", "a9_semantic_relatedness",
            "dd_simhash_pairs", "ds_prepare_training_set",
            "g_label_propagation", "str_corpus_report", "str_funnel_counts",
            "str_index_dedup",
        ]

    # warm the JVM/Arrow paths (same as bench.py)
    queries["s7_lang_histogram"](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in args:
        fn = queries[name]
        if explain_suffix is not None:
            os.makedirs(PLANS_DIR, exist_ok=True)
            try:
                plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
                with open(f"{PLANS_DIR}/{name}_{explain_suffix}.txt", "w") as fh:
                    fh.write(plan)
            except Exception as exc:
                print(f"# explain failed for {name}: {exc}", file=sys.stderr)
            spark.catalog.clearCache()
        best, n = float("inf"), 0
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        df = None
        spark.catalog.clearCache()
        gc.collect()
        print(f"# {name}: {n} rows in {best:.2f}s (best of {REPS})",
              file=sys.stderr)

    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
