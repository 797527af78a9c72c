#!/usr/bin/env python
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys (throughput_docs_per_sec) are informational.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from nous_spark.session import get_spark

    spark = get_spark(cores=CPUS, app_name="nous_bench")

    queries = entrymod.queries()
    headline = [
        "kg_extract_triples",
        "a1_mis_support",
        "a10_degree",
        "j1_agg_join",
        "j7_semi_join",
        "n6_purge_longest",
        "w2_topk_per_group",
        "str_windowed_agg",
        "txt_quality_score",
        "txt_language_id",
        "dd_exact_dedup",
        "dd_minhash_pairs",
        "ann_cosine_topk",
        "g8_connected_components",
        "a6_two_edge_signatures",
    ]
    # round-2 additions: SF-scaling queries for the newly gated operators.
    # Kept OUT of the headline metric so headline_queries_wall stays
    # comparable round-over-round; timings are recorded alongside.
    extended = [
        "j6_grow_patterns",
        "a9_semantic_relatedness",
        "g9_sample_v1",
        "dd_simhash_pairs",
        "g7_pic",
    ]
    # round-6 additions: timed and recorded in their own group so the
    # headline/extended walls stay comparable round-over-round
    assembly = [
        "ds_prepare_training_set",
        "ds_split",
        "ds_pack_shards",
        "txt_tfidf_keywords",
        "g_triangle_counts",
        "g_adamic_adar",
        "g_k_core",
        "g_label_propagation",
        "ev_session_stats",
        "dd_embedding_pairs",
        "dd_substring_spans",
        "ev_funnel_counts",
        "ev_retention_cohorts",
        "txt_collocations",
        "ds_corpus_diff",
    ]
    # round-7 additions: own group so the three earlier walls stay
    # comparable round-over-round
    r7 = [
        "ds_token_budget",
        "ds_sample_token_budget",
        "dd_cross_source",
        "dd_boilerplate_ngrams",
        "dd_index_dedup",
        "str_index_dedup",
        "str_funnel_counts",
        "str_corpus_report",
    ]
    # round-8 additions: own group, same rationale
    r8 = [
        "ev_asof_join",
        "ev_range_join",
        "kg_bgp_match",
        "dd_semantic_dedup",
        "str_ivf_ingest",
        "str_asof_enrich",
        "g_cc_update",
        "str_cc_ingest",
        "kg_bgp_optional",
        "kg_path_reach",
        "kg_canonical_update",
        "kg_triple_store",
        "kg_store_query",
        "kg_mis_update",
        "str_mis_ingest",
        "kg_construct",
        # str_triple_ingest / str_pattern_watch deliberately NOT timed
        # here: their walls are the same store builds kg_triple_store /
        # kg_mis_update already pay, plus streaming checkpoint
        # machinery — both correctness-gated instead
    ]
    timings: dict[str, float] = {}
    ext_timings: dict[str, float] = {}
    asm_timings: dict[str, float] = {}
    r7_timings: dict[str, float] = {}
    r8_timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    # warm the JVM/Arrow paths once so timings measure the engine, not init
    queries["s7_lang_histogram"](spark, SF_DIR).collect()

    # this sandbox's host throughput swings up to 4x over minutes (shared
    # tenancy: a 1M-row count job measured 0.12s and 0.48s half an hour
    # apart) — a single timing is noise. Best-of-REPS per query (default
    # 2) is recorded explicitly in the output ("reps"/"agg").
    reps = int(os.environ.get("NOUS_BENCH_REPS", "2"))
    # PER-QUERY bandwidth probe (round-4 lesson: a clean run-start probe
    # does not clear a query that ran minutes later in a contended
    # window — r4's dd_simhash 5.7 s had a 0.10 s run probe). ~0.1 s per
    # probe on a clean host; read any slow query against ITS probe.
    from scripts.scaling_bench import (host_bandwidth_probe,
                                       host_health_probe,
                                       host_parallel_probe)

    bw_per_query: dict[str, float] = {}
    # 16-thread probe: catches partial-core steal that single-core
    # probes cannot see (round-5: 13 s -> 48 s rep swing, both
    # single-core probes clean)
    par_per_query: dict[str, float] = {}
    for name, sink in [(n, timings) for n in headline] + [
        (n, ext_timings) for n in extended
    ] + [(n, asm_timings) for n in assembly] + [
        (n, r7_timings) for n in r7
    ] + [(n, r8_timings) for n in r8]:
        fn = queries[name]
        best, n = float("inf"), 0
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        sink[name] = round(best, 3)
        # release this query's persisted/checkpointed blocks before the
        # next one: several operators legitimately materialize shared
        # subtrees (localCheckpoint/persist); left referenced, their
        # storage blocks accumulate across 30+ queries and the eviction
        # churn showed up as an 18x outlier on a later query (j6 at sf1,
        # 17.6 s in-bench vs 1.3 s standalone)
        import gc

        df = None
        spark.catalog.clearCache()
        gc.collect()
        bw_per_query[name] = round(host_bandwidth_probe(), 4)
        par_per_query[name] = round(host_parallel_probe(), 4)
        print(f"# {name}: {n} rows in {best:.2f}s (best of {reps}, "
              f"bw_probe {bw_per_query[name]:.2f}s, "
              f"par_probe {par_per_query[name]:.2f}s)",
              file=sys.stderr)

    total = round(sum(timings.values()), 3)
    extract_tput = round(n_docs / max(timings["kg_extract_triples"], 1e-9), 1)
    # host-tenancy context (see scripts/scaling_bench.py): cpu ~0.05s and
    # bw ~0.13s on a clean window; multiples mean the wall numbers above
    # were taken on a contended host, not a slower engine
    probes = {
        "host_cpu_probe_sec": host_health_probe(),
        "host_bw_probe_sec": host_bandwidth_probe(),
        "host_par_probe_sec": host_parallel_probe(),
    }
    # The driver tails stdout and parses the LAST line as JSON, so the
    # stdout line must stay compact (round-6 lesson: the 35-entry probe
    # dicts overflowed the driver's tail buffer and round 6 recorded
    # "parsed": null). Everything bulky — per-query extended/assembly
    # timings and the per-query tenancy probes — goes to a side file.
    out = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        "extract_docs_per_sec": extract_tput,
        "extended_wall": round(sum(ext_timings.values()), 3),
        "assembly_wall": round(sum(asm_timings.values()), 3),
        "r7_wall": round(sum(r7_timings.values()), 3),
        "r8_wall": round(sum(r8_timings.values()), 3),
        "reps": reps,
        "agg": "min",
        **probes,
    }
    # sf1 pass (VERDICT r7 #8: the sf1 story was builder-control only —
    # this puts driver-invoked sf1 walls in the parsed artifact). The
    # 10x amplification is materialized once to NOUS_BENCH_SF1_DIR
    # (default /tmp/sf1x, reused across runs) and the HEADLINE set runs
    # there; failures or NOUS_BENCH_SF1=0 skip the pass without touching
    # the main artifact.
    sf1_timings: dict[str, float] = {}
    if os.environ.get("NOUS_BENCH_SF1", "1") != "0" and _sf_from_dir(
            SF_DIR) == 0.1:
        try:
            sf1_dir = os.environ.get("NOUS_BENCH_SF1_DIR", "/tmp/sf1x")
            if not os.path.exists(f"{sf1_dir}/documents.parquet"):
                from scripts.make_sf1 import materialize
                materialize(spark, SF_DIR, sf1_dir, 10)
            sf1_reps = int(os.environ.get("NOUS_BENCH_SF1_REPS", "2"))
            for name in headline:
                fn, best = queries[name], float("inf")
                for _ in range(sf1_reps):
                    t0 = time.perf_counter()
                    fn(spark, sf1_dir).count()
                    best = min(best, time.perf_counter() - t0)
                sf1_timings[name] = round(best, 3)
                spark.catalog.clearCache()
                print(f"# sf1 {name}: {best:.2f}s", file=sys.stderr)
            out["sf1_wall"] = round(sum(sf1_timings.values()), 3)
            out["sf1_reps"] = sf1_reps
        except Exception as exc:  # sf1 is supplementary, never fatal
            print(f"# sf1 pass skipped: {exc}", file=sys.stderr)

    side = {
        "extended_queries": ext_timings,
        "assembly_queries": asm_timings,
        "r7_queries": r7_timings,
        "r8_queries": r8_timings,
        "sf1_queries": sf1_timings,
        "query_bw_probe_sec": bw_per_query,
        "query_par_probe_sec": par_per_query,
        "headline": out,
    }
    side_path = os.environ.get(
        "NOUS_BENCH_PROBES",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_probes.json"),
    )
    with open(side_path, "w") as fh:
        json.dump(side, fh, indent=1, sort_keys=True)
    print(f"# per-query probes + group timings -> {side_path}",
          file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
