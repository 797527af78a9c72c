#!/usr/bin/env python
"""Write-phase decomposition probe (VERDICT r7 #4: the fused 2→8 scaling
number fails the north rule because the shuffle+write phase barely scales
on this box — 18.4 s at local[2] vs 11.7 s at local[8] in r7 — and four
rounds of attribution notes deserve a design answer).

Stages the flagship extraction's triple frame ONCE (parquet in /dev/shm),
then times sink variants in fresh JVMs at two core counts:

  salted64      status quo: repartition(pred, salt=64) partitionBy(pred)
  salted8       same, salt_buckets=8 → ~8x fewer output files
  salted8_zstd  + zstd compression (trade scalable CPU for bus bytes)
  flat          repartition(cores) plain parquet — no partition dirs,
                the engine-side upper bound for this box
  encoded       dictionary-encode subj/obj to int ids (j10 operator),
                write dict + int triples — the narrow-encoding sink

Each variant reports wall, bytes written, file count, and the bandwidth
probe, so 'bus-saturated even single-threaded' is checkable from the
artifact: bytes/wall vs the measured copy bandwidth.

Usage: python scripts/write_phase_probe.py [n_files] [cores ...]
Writes BENCH_write_phase.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGE_JOB = """
import sys
sys.path.insert(0, {repo!r})
from nous_spark.session import get_spark
from nous_spark.corpus import corpus_df
from nous_spark.operators.extraction import extract_triples_normalized

n_files, src, staged = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(cores=8, app_name="stage", shuffle_partitions=64)
corpus_df(spark, n_files=n_files, seed=42).write.mode("overwrite").parquet(src)
triples, _ = extract_triples_normalized(spark.read.parquet(src).repartition(64))
triples.repartition(64).write.mode("overwrite").parquet(staged)
print("STAGED", spark.read.parquet(staged).count())
"""

VARIANT_JOB = """
import sys, time, json, os
sys.path.insert(0, {repo!r})
from nous_spark.session import get_spark
from pyspark.sql import functions as F

cores, staged, out, variant = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                               sys.argv[4])
local_dir = os.environ.get("NOUS_LOCAL_DIR", "/dev/shm/nous_spark_local")
spark = get_spark(cores=cores, app_name=f"wp_{{variant}}_{{cores}}",
                  shuffle_partitions=64,
                  extra_conf={{"spark.local.dir": local_dir}})
t = spark.read.parquet(staged)
t = t.persist(); n = t.count()  # warm: read off the clock
t0 = time.perf_counter()
if variant in ("salted64", "salted8", "salted8_zstd"):
    from nous_spark.sources.sinks import write_triples
    buckets = 64 if variant == "salted64" else 8
    codec = "zstd" if variant.endswith("zstd") else None
    write_triples(t, out, salt_buckets=buckets, compression=codec)
elif variant == "flat":
    t.repartition(cores).write.mode("overwrite").parquet(out)
elif variant == "encoded":
    from nous_spark.sources.sinks import write_triples_encoded
    write_triples_encoded(t, out)
else:
    raise SystemExit(f"unknown variant {{variant}}")
wall = time.perf_counter() - t0
nbytes = nfiles = 0
for root, _, files in os.walk(out):
    for f in files:
        if not f.startswith("_") and not f.endswith(".crc"):
            nbytes += os.path.getsize(os.path.join(root, f)); nfiles += 1
print(json.dumps({{"variant": variant, "cores": cores, "rows": n,
                  "wall_sec": round(wall, 3), "bytes": nbytes,
                  "files": nfiles,
                  "mb_per_sec": round(nbytes / wall / 1e6, 1)}}))
"""


def run(job: str, *args: str) -> dict | None:
    r = subprocess.run([sys.executable, "-c", job.format(repo=REPO), *args],
                       capture_output=True, text=True, timeout=1200)
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
        if line.startswith("STAGED"):
            return {"rows": int(line.split()[1])}
    print(r.stdout[-2000:], r.stderr[-2000:])
    return None


def main() -> None:
    sys.path.insert(0, REPO)
    from scripts.scaling_bench import host_bandwidth_probe

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 128000
    cores_list = [int(c) for c in sys.argv[2:]] or [2, 8]
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="nous_wp_", dir=base)
    src, staged = f"{work}/source", f"{work}/triples_staged"
    print(f"staging {n_files} docs ...", flush=True)
    staged_info = run(STAGE_JOB, str(n_files), src, staged)
    print("staged:", staged_info, flush=True)
    shutil.rmtree(src, ignore_errors=True)

    reps = int(os.environ.get("NOUS_WP_REPS", "2"))
    results = []
    for variant in ["salted64", "salted8", "salted8_zstd", "flat",
                    "encoded"]:
        for cores in cores_list:
            best = None
            for _ in range(reps):
                out = f"{work}/out_{variant}_{cores}"
                bw = host_bandwidth_probe()
                r = run(VARIANT_JOB, str(cores), staged, out, variant)
                shutil.rmtree(out, ignore_errors=True)
                if r is None:
                    continue
                r["bw_probe_sec"] = bw
                if best is None or r["wall_sec"] < best["wall_sec"]:
                    best = r
            if best:
                results.append(best)
                print(json.dumps(best), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    art = {"metric": "write_phase_probe", "n_files": n_files,
           "rows": staged_info["rows"], "reps": reps, "results": results}
    with open(os.path.join(REPO, "BENCH_write_phase.json"), "w") as f:
        json.dump(art, f, indent=1)
    print("wrote BENCH_write_phase.json")


if __name__ == "__main__":
    main()
