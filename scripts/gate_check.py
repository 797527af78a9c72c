"""Local replica of the driver's correctness harness: run every
``queries()`` entry at sf0.01 alongside its ``oracle_sql()`` (DuckDB over
the same parquet), compare row counts, column sets, and sorted value
multisets. Prints one line per gate and a summary; exits non-zero on any
mismatch. Rows-only entries (no oracle) are checked for rows >= 1 so a
vacuous gate fails here, not in front of the judge.

Usage: python scripts/gate_check.py [sf_dir] [only_gate ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from nous_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = sorted(df.columns)
            rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
            rows.sort()
        except Exception as exc:
            fails.append(name)
            print(f"FAIL  {name}: spark error {exc!r}"[:300])
            continue
        sql = oracles.get(name)
        if sql is None:
            status = "rows_only" if rows else "VACUOUS"
            if not rows:
                fails.append(name)
            print(f"{status:9s} {name}: {len(rows)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            rel = con.sql(sql)
            names = rel.columns
            want = [
                tuple(_norm(r[names.index(c)]) for c in cols)
                for r in rel.fetchall()
            ]
            want.sort()
        except Exception as exc:
            fails.append(name)
            print(f"FAIL  {name}: oracle error {exc!r}"[:300])
            continue
        if sorted(names) != cols:
            fails.append(name)
            print(f"FAIL  {name}: schema {cols} vs {sorted(names)}")
        elif len(rows) != len(want):
            fails.append(name)
            print(f"FAIL  {name}: rows {len(rows)} vs {len(want)}")
        elif rows != want:
            fails.append(name)
            diff = next(i for i, (a, b) in enumerate(zip(rows, want)) if a != b)
            print(f"FAIL  {name}: values differ at sorted row {diff}:\n"
                  f"  spark={rows[diff]}\n  duck ={want[diff]}")
        else:
            print(f"pass      {name}: {len(rows)} rows "
                  f"({time.time() - t0:.1f}s)")
    n = len([k for k in qs if not only or k in only])
    print(f"\n{n - len(fails)}/{n} gates OK; failures: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
