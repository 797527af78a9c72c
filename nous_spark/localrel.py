"""Arrow-backed local relations for small driver-side row sets.

A plain python-list ``createDataFrame`` produces a pickled local
relation: every job that executes it (including a 20-row parquet write)
spins up Python workers in the executor — measured 4-6 s per write at
local[32], the same runner spin-up previously documented as the
"coalesce tax" (operators/ann.py). Converting the rows through pandas
first makes the relation Arrow-backed, so execution stays JVM-side:
the same 20-row write measures ~0.2 s warm.

Use for every driver-side key/remap/patch/meta row set the store
machinery materializes. Row sets here are delta-bounded by contract
(remap logs, patch chains, probe key sets) — never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``createDataFrame`` over ``rows`` (iterable of tuples) with an
    explicit DDL ``schema`` ("name type, ..."), routed through pandas so
    the relation is Arrow-backed (JVM-side at execution, no Python
    worker in consuming jobs)."""
    import pandas as pd

    names = [f.strip().split()[0] for f in schema.split(",")]
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema=schema)
    pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, schema=schema)
