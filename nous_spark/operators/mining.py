"""Frequent-subgraph mining as DataFrame aggregations (SURVEY.md §2.4-2.5).

The reference's Mining module (DatatoPatternGraph.scala) maintains a
"pattern-instance graph" in GraphX and re-mines it with Pregel + broadcast
loops. Here a pattern instance is a row:

    instances(pattern_key STRING, binding ARRAY<BIGINT>, batch_id INT,
              endpoints ARRAY<BIGINT>)

pattern growth is a bounded self-equi-join, support is a two-level
aggregation, and the closed/redundant marking is a single join — no Pregel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_image_support(instances: DataFrame, binding_cols: list[str]) -> DataFrame:
    """A1 (computeMinImageSupport, DatatoPatternGraph.scala:1237-1298):
    per pattern, for each variable position count distinct bound data
    nodes; support = min over positions.

    Implemented as one melt + two aggregations — distinct-per-position via
    explode, not a driver loop.
    """
    pos_cols = F.array(
        *[
            F.struct(F.lit(i).alias("var_pos"), F.col(c).cast("long").alias("node"))
            for i, c in enumerate(binding_cols)
        ]
    )
    melted = instances.select("pattern_key", F.explode(pos_cols).alias("pv")).select(
        "pattern_key", F.col("pv.var_pos").alias("var_pos"), F.col("pv.node").alias("node")
    )
    per_pos = melted.groupBy("pattern_key", "var_pos").agg(
        F.countDistinct("node").alias("n_distinct")
    )
    return per_pos.groupBy("pattern_key").agg(F.min("n_distinct").alias("support"))


def min_image_support_arr(instances: DataFrame) -> DataFrame:
    """A1 for array-typed bindings: instances(pattern_key, binding ARRAY<BIGINT>)."""
    melted = instances.select(
        "pattern_key", F.posexplode("binding").alias("var_pos", "node")
    )
    per_pos = melted.groupBy("pattern_key", "var_pos").agg(
        F.countDistinct("node").alias("n_distinct")
    )
    return per_pos.groupBy("pattern_key").agg(F.min("n_distinct").alias("support"))


def split_frequent(supports: DataFrame, mis_support: int) -> tuple[DataFrame, DataFrame]:
    """A2 (getFrequentPatterns/getInfrequentPatterns, :566-578)."""
    freq = supports.filter(F.col("support") >= mis_support)
    infreq = supports.filter(F.col("support") < mis_support)
    return freq, infreq


def window_support_union(per_batch_supports: list[DataFrame]) -> DataFrame:
    """A3 (:513-522): merge per-batch supports into window totals."""
    out = per_batch_supports[0]
    for df in per_batch_supports[1:]:
        out = out.unionByName(df)
    return out.groupBy("pattern_key").agg(F.sum("support").alias("support"))


def cumulative_pattern_count(per_batch: DataFrame) -> DataFrame:
    """A5 (:580-588): sum supports across batches."""
    return per_batch.groupBy("pattern_key").agg(F.sum("support").alias("support"))


def filter_frequent_instances(instances: DataFrame, frequent: DataFrame) -> DataFrame:
    """J7 (getMISFrequentGraph :1205-1236): left-semi against the frequent
    pattern set — small side auto-broadcast, replaces the reference's
    explicit sc.broadcast."""
    return instances.join(
        F.broadcast(frequent.select("pattern_key")), "pattern_key", "left_semi"
    )


def remove_redundant(frequent: DataFrame, redundant: DataFrame) -> DataFrame:
    """J9/SO4 (:460): frequent minus redundant — left-anti join."""
    return frequent.join(
        redundant.select("pattern_key"), "pattern_key", "left_anti"
    )


def grow_patterns(instances: DataFrame, cur_batch: int | None = None,
                  per_key_cap: int | None = 1000) -> DataFrame:
    """J6 (getUpdateWindowPatternGraph :744-879): join adjacent pattern
    instances sharing a data vertex into doubled patterns.

    instances must carry: pattern_key, binding ARRAY<BIGINT>,
    endpoints ARRAY<BIGINT>, batch_id, inst_id.

    One self-equi-join on exploded endpoints. The batch-recency predicate
    (left or right side touches the current batch, :778-779) keeps
    incremental growth incremental. ``per_key_cap`` is the skew guard
    analogous to the reference's edgeLimit=2 (:839-859) but per *endpoint
    key* and far looser: hub vertices cap their expansion fan-out instead
    of exploding quadratically.
    """
    pts = instances.select(
        "inst_id", "pattern_key", "binding", "batch_id",
        F.explode("endpoints").alias("endpoint"),
    )
    if per_key_cap is not None:
        # skew guard, hash-sample form (same pattern as the token cap in
        # linking.py): a per-endpoint row_number window lands deg(hub)
        # rows in ONE task for a 10^6-degree hub — the count-aggregate +
        # modulo filter below is an ordinary shuffle agg plus a map-side
        # filter, so no single task ever sees a whole hub. Endpoints at
        # or under the cap keep every instance (bit-identical to the
        # uncapped join); hubs keep a deterministic ~cap-sized sample
        # that is a pure function of (inst_id, endpoint), not of layout.
        ep_counts = pts.groupBy("endpoint").agg(F.count("*").alias("__ec"))
        pts = (
            pts.join(ep_counts, "endpoint")
            .filter(
                (F.col("__ec") <= per_key_cap)
                | (
                    F.pmod(
                        F.xxhash64("inst_id", "endpoint"),
                        F.ceil(F.col("__ec") / F.lit(per_key_cap)).cast("long"),
                    )
                    == 0
                )
            )
            .drop("__ec")
        )
    left = pts.alias("l")
    right = pts.alias("r")
    cond = (F.col("l.endpoint") == F.col("r.endpoint")) & (
        F.col("l.inst_id") < F.col("r.inst_id")
    )
    if cur_batch is not None:
        cond = cond & (
            (F.col("l.batch_id") == cur_batch) | (F.col("r.batch_id") == cur_batch)
        )
    joined = left.join(right, cond)
    grown = joined.select(
        F.concat_ws("+", F.col("l.pattern_key"), F.col("r.pattern_key")).alias(
            "pattern_key"
        ),
        F.concat(F.col("l.binding"), F.col("r.binding")).alias("binding"),
        F.greatest(F.col("l.batch_id"), F.col("r.batch_id")).alias("batch_id"),
        F.array_union(
            F.array(F.col("l.endpoint")), F.array(F.col("r.endpoint"))
        ).alias("endpoints"),
        F.xxhash64(
            F.concat_ws("+", F.col("l.pattern_key"), F.col("r.pattern_key")),
            F.concat_ws(",", F.col("l.binding")),
            F.concat_ws(",", F.col("r.binding")),
        ).alias("inst_id"),
    )
    return grown.dropDuplicates(["pattern_key", "binding"])


def mark_redundant(dep_edges: DataFrame, supports: DataFrame) -> DataFrame:
    """G4 (updateGDepStatus Pregel :600-680) as one join: a parent pattern
    is redundant if some child (superpattern) has equal support; closed if
    all children have strictly lower support.

    dep_edges(parent_pattern_key, child_pattern_key).
    Returns (pattern_key, is_redundant, is_closed)."""
    ps = supports.select(
        F.col("pattern_key").alias("parent_pattern_key"),
        F.col("support").alias("parent_support"),
    )
    cs = supports.select(
        F.col("pattern_key").alias("child_pattern_key"),
        F.col("support").alias("child_support"),
    )
    j = dep_edges.join(ps, "parent_pattern_key").join(cs, "child_pattern_key")
    return (
        j.groupBy("parent_pattern_key")
        .agg(
            F.max((F.col("child_support") == F.col("parent_support")).cast("int"))
            .alias("any_equal"),
            F.max((F.col("child_support") >= F.col("parent_support")).cast("int"))
            .alias("any_ge"),
        )
        .select(
            F.col("parent_pattern_key").alias("pattern_key"),
            (F.col("any_equal") == 1).alias("is_redundant"),
            (F.col("any_equal") == 0).alias("is_closed"),
        )
    )
