#!/usr/bin/env python
"""Standalone clean-window timing for the str_minhash_cands gate
(VERDICT r5 nit #3): round 5's per-round bench recorded ~120 s for this
query inside a contended window; this script produces the clean-host
baseline so future readings are attributable (tenancy vs regression).

Runs the gate's exact query body at sf0.01 and sf0.1, best-of-REPS
(default 3), with the single-core / bandwidth / 16-thread host probes
sampled around every rep. Writes BENCH_str_minhash_clean.json.

Usage: python scripts/str_minhash_clean.py  (from /root/repo, idle host)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entrymod
    from nous_spark.session import get_spark
    from scripts.scaling_bench import (host_bandwidth_probe,
                                       host_health_probe,
                                       host_parallel_probe)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    reps = int(os.environ.get("NOUS_BENCH_REPS", "3"))
    spark = get_spark(cores=cpus, app_name="str_minhash_clean")
    q = entrymod.queries()["str_minhash_cands"]

    out: dict = {"metric": "str_minhash_cands_clean_wall", "unit": "sec",
                 "cpus": cpus, "reps": reps, "agg": "best", "sf": {}}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        # warm the streaming/state machinery once so rep 1 isn't init-bound
        q(spark, sf_dir).count()
        times, probes = [], []
        for _ in range(reps):
            pre = {"cpu": host_health_probe(),
                   "bw": host_bandwidth_probe(),
                   "par": host_parallel_probe()}
            t0 = time.monotonic()
            rows = q(spark, sf_dir).count()
            wall = round(time.monotonic() - t0, 3)
            post = {"cpu": host_health_probe(),
                    "bw": host_bandwidth_probe(),
                    "par": host_parallel_probe()}
            times.append(wall)
            probes.append({"pre": {k: round(v, 4) for k, v in pre.items()},
                           "post": {k: round(v, 4) for k, v in post.items()},
                           "wall": wall, "rows": rows})
        out["sf"][sf_dir.rsplit("/", 1)[-1]] = {
            "best_sec": min(times), "all_sec": times, "probes": probes}
    out["value"] = out["sf"]["sf0.1"]["best_sec"]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_str_minhash_clean.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("STRMH_CLEAN " + json.dumps(out))


if __name__ == "__main__":
    main()
