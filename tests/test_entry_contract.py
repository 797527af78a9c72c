"""Simulates the driver's correctness gate: run each __spark_entry__
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row count + schema (column names) + values.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}: col {c} row {i}: {a!r} != {b!r}"
                )
            else:
                assert str(a) == str(b), f"{name}: col {c} row {i}: {a!r} != {b!r}"


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = _duck(ORACLES[name])
    _compare(spark_pdf, duck_pdf, name)


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_oracled_keys_precede_rows_only():
    # the driver may truncate the registry (round 2 capped at 50 keys):
    # every oracled entry must come before every rows-only entry so a cap
    # drops the weakest signal first
    keys = list(QUERIES)
    rows_only = set(QUERIES) - set(ORACLES)
    if rows_only:
        last_oracled = max(keys.index(k) for k in ORACLES)
        first_rows_only = min(keys.index(k) for k in rows_only)
        assert last_oracled < first_rows_only


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
