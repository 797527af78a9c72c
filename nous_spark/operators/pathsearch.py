"""Path enumeration between entity pairs (SURVEY.md §2.8 G3/G5).

The reference collects the adjacency map to the driver and runs recursive
DFS (PathSearch.scala:50,70-107) or a GraphX Pregel
(PathSearchPregel.scala:96-187). Here: iterative DataFrame frontier
expansion — paths ⋈ edges per hop in a bounded driver loop,
``array_contains`` cycle check, optional degree / topic-coherence filters
(F9 Jensen-Shannon via SQL aggregate over zipped arrays). All pairs are
searched in one pass (the frontier carries pair_id), not per-pair loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nous_spark.operators.graph import degrees


def find_paths(
    edges: DataFrame,
    pairs: DataFrame,
    max_hops: int = 3,
    bidirectional: bool = True,
    max_degree: int | None = None,
    topics: DataFrame | None = None,
    max_js_div: float | None = None,
) -> DataFrame:
    """All simple paths (≤ max_hops) for pairs(pair_id, src_id, dst_id).

    Returns (pair_id, path ARRAY<BIGINT>, preds ARRAY<STRING>, hops).
    ``max_degree`` drops hub intermediate nodes (reference's degree filter
    PathSearch.scala:61); ``max_js_div`` prunes hops whose topic vectors
    diverge from the path's start (MathUtils.jensenShannonDiv).
    """
    e = edges.select(
        F.col("src").cast("long").alias("from"),
        F.col("dst").cast("long").alias("to"),
        F.col("pred").cast("string").alias("pred"),
    )
    if bidirectional:
        e = e.unionByName(
            edges.select(
                F.col("dst").cast("long").alias("from"),
                F.col("src").cast("long").alias("to"),
                F.concat(F.lit("~"), F.col("pred")).alias("pred"),
            )
        )
    if max_degree is not None:
        deg = degrees(edges)
        hubs = deg.filter(F.col("degree") > max_degree).select(
            F.col("id").alias("to")
        )
        # hub nodes may terminate a path (be the target) but not be expanded
        e = e.join(hubs.withColumnRenamed("to", "from"), "from", "left_anti")
    if topics is not None and max_js_div is not None:
        from pyspark.sql import types as T
        import pandas as pd

        @F.pandas_udf(T.DoubleType())
        def js_div(a: pd.Series, b: pd.Series) -> pd.Series:
            from nous_spark.functions.similarity import js_divergence

            return pd.Series([
                js_divergence(list(x), list(y))
                if x is not None and y is not None else 0.0
                for x, y in zip(a, b)
            ])

        t_from = topics.select(F.col("vid").alias("from"), F.col("topic").alias("t_from"))
        t_to = topics.select(F.col("vid").alias("to"), F.col("topic").alias("t_to"))
        e = (
            e.join(F.broadcast(t_from), "from", "left")
            .join(F.broadcast(t_to), "to", "left")
            .withColumn("__js", js_div("t_from", "t_to"))
            .filter(F.col("__js") <= max_js_div)
            .drop("t_from", "t_to", "__js")
        )

    frontier = pairs.select(
        "pair_id",
        F.col("dst_id").cast("long").alias("target"),
        F.array(F.col("src_id").cast("long")).alias("path"),
        F.array().cast("array<string>").alias("preds"),
    )
    results = None
    for _hop in range(max_hops):
        expanded = (
            frontier.join(
                e, frontier.path[F.size("path") - 1] == e["from"]
            )
            .filter(~F.array_contains("path", F.col("to")))  # simple paths
            .select(
                "pair_id",
                "target",
                F.concat("path", F.array(F.col("to"))).alias("path"),
                F.concat("preds", F.array(F.col("pred"))).alias("preds"),
            )
        )
        expanded = expanded.localCheckpoint(eager=True)
        done = expanded.filter(
            F.col("path")[F.size("path") - 1] == F.col("target")
        ).select("pair_id", "path", "preds", (F.size("path") - 1).alias("hops"))
        results = done if results is None else results.unionByName(done)
        frontier = expanded.filter(
            F.col("path")[F.size("path") - 1] != F.col("target")
        )
        if frontier.limit(1).count() == 0:
            break
    return results if results is not None else frontier.select(
        "pair_id", "path", "preds", F.lit(0).alias("hops")
    ).limit(0)
