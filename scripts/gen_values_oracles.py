"""Generate VALUES-table oracles for the gates whose inputs are built from
seeded RNGs driver-side (mm_image/audio/video stats, g7_pic, lp_bpr_metrics):
their outputs are fully deterministic, so the DuckDB oracle is just the
expected rows as a typed VALUES table — no blob parsing in SQL.

Run from /root/repo:  python scripts/gen_values_oracles.py
Writes fixtures/values_oracles.json ({gate: sql}); __spark_entry__.oracle_sql()
merges it over the handwritten oracles. After writing, every SQL is
cross-checked against a FRESH run of the Spark gate the same way the
driver compares (columns sorted by name, row multisets equal) — a
determinism failure or codegen bug fails loudly here, not in the driver.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

GATES = [
    "g7_pic",
    "lp_bpr_metrics",
    "mm_image_stats",
    "mm_audio_stats",
    "mm_video_stats",
]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_SQLT = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        return repr(v)  # shortest round-trip literal → identical double
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(df) -> str:
    cols = df.columns
    types = [_SQLT[f.dataType.simpleString()] for f in df.schema.fields]
    rows = df.collect()
    if not rows:
        raise SystemExit(f"gate returned 0 rows — vacuous oracle refused")
    body = ",\n".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    sel = ", ".join(
        f"CAST(v{i} AS {t}) AS {c}" for i, (c, t) in enumerate(zip(cols, types))
    )
    alias = ", ".join(f"v{i}" for i in range(len(cols)))
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({alias})"


def driver_style_compare(spark_df, sql: str) -> None:
    cols = sorted(spark_df.columns)
    got = sorted(
        tuple(row[c] for c in cols) for row in spark_df.collect()
    )
    rel = duckdb.sql(sql)
    names = rel.columns
    want = sorted(
        tuple(r[names.index(c)] for c in cols) for r in rel.fetchall()
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"row mismatch:\n spark={g}\n duck ={w}"


def main() -> None:
    from nous_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(cores=8)
    qs = entry.queries()
    out = {}
    for g in GATES:
        df = qs[g](spark, SF)
        out[g] = values_sql(df)
        print(f"{g}: {df.count()} rows -> VALUES oracle")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fixtures", "values_oracles.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")

    # cross-check each oracle against a FRESH run of the gate (catches
    # run-to-run nondeterminism, the thing that would flap in the driver)
    for g in GATES:
        driver_style_compare(qs[g](spark, SF), out[g])
        print(f"{g}: fresh-run cross-check OK")

    # g7_pic is additionally verified against an INDEPENDENT dense-NumPy
    # PIC on the same sim graph (the VALUES rows must not merely be a
    # replay of our own Spark output): cluster PARTITIONS must agree up
    # to label permutation.
    verify_g7_against_numpy(spark)
    print("g7_pic: independent NumPy partition check OK")


def verify_g7_against_numpy(spark) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    sim = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(F.col("a.l_suppkey").alias("src"),
                 F.col("b.l_suppkey").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )
    edges = [(int(r.src), int(r.dst), float(r.weight)) for r in sim.collect()]
    ids = sorted({v for e in edges for v in e[:2]})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] = max(W[idx[s], idx[d]], w)
        W[idx[d], idx[s]] = max(W[idx[d], idx[s]], w)
    deg = W.sum(axis=1)
    # same seeded-hash init as the operator (xxhash64 folded to [0,1)) —
    # fetch it from Spark so both engines iterate the same vector
    init = {
        int(r.id): float(r.v)
        for r in spark.createDataFrame([(i,) for i in ids], ["id"]).select(
            "id",
            (F.pmod(F.xxhash64("id", F.lit(42)), F.lit(1 << 30))
             .cast("double") / float(1 << 30)).alias("v"),
        ).collect()
    }
    v = np.array([init[i] for i in ids])
    for _ in range(6):  # gate uses max_iter=6
        v = (W @ v) / np.where(deg > 0, deg, 1.0)
    v = v / np.abs(v).sum()
    k = 4
    qs_ = np.quantile(v, [(i + 0.5) / k for i in range(k)])
    cents = sorted(set(float(c) for c in qs_))
    while len(cents) < k:
        cents.append(cents[-1] + 1e-9 * (len(cents) + 1))
    for _ in range(10):
        assign = np.argmin(np.abs(v[:, None] - np.array(cents)[None, :]), axis=1)
        new = [float(v[assign == i].mean()) if (assign == i).any() else cents[i]
               for i in range(len(cents))]
        if new == cents:
            break
        cents = new
    assign = np.argmin(np.abs(v[:, None] - np.array(cents)[None, :]), axis=1)
    np_groups = {}
    for vid, c in zip(ids, assign):
        np_groups.setdefault(int(c), set()).add(vid)

    rel = duckdb.sql(json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "values_oracles.json")))["g7_pic"])
    oracle_groups = {}
    for vid, c in rel.fetchall():
        oracle_groups.setdefault(int(c), set()).add(int(vid))
    got = sorted(sorted(g) for g in oracle_groups.values())
    want = sorted(sorted(g) for g in np_groups.values())
    assert got == want, (
        f"g7 VALUES oracle partition != independent NumPy PIC:\n"
        f" oracle={got}\n numpy ={want}")


if __name__ == "__main__":
    main()
