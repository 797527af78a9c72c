"""Graph operators over edge DataFrames (SURVEY.md §2.8).

The reference uses GraphX (`Graph[VD,ED]`, aggregateMessages, Pregel,
subgraph). Here a graph is two DataFrames — edges(src, dst, pred) and
optionally vertices(id, label) — and every graph op is a join/agg plan
Catalyst can optimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """A10: vertex degree (both directions). Map-side partial aggregation
    makes this one shuffle of pre-aggregated counts."""
    pts = edges.select(F.col(src).alias("id")).unionAll(
        edges.select(F.col(dst).alias("id"))
    )
    return pts.groupBy("id").agg(F.count("*").alias("degree"))


def neighbor_labels(
    edges: DataFrame, vertices: DataFrame, both_directions: bool = True
) -> DataFrame:
    """A12/J3 (NodeProp.getOneHopNbrIdsLabels, NodeProp.scala:7-22):
    per vertex, the set of one-hop neighbor labels."""
    v = vertices.select(F.col("id").alias("nbr_id"), F.col("label").alias("nbr_label"))
    fwd = edges.join(v, edges.dst == v.nbr_id).select(
        F.col("src").alias("id"), "nbr_id", "nbr_label"
    )
    if both_directions:
        rev = edges.join(v, edges.src == v.nbr_id).select(
            F.col("dst").alias("id"), "nbr_id", "nbr_label"
        )
        fwd = fwd.unionByName(rev)
    return fwd.groupBy("id").agg(
        F.collect_set("nbr_label").alias("nbr_labels"),
        F.count("*").alias("n_nbrs"),
    )


def subgraph_by_vertices(
    edges: DataFrame, keep_vertices: DataFrame, vid_col: str = "id"
) -> DataFrame:
    """G2 (GraphX subgraph): keep edges whose BOTH endpoints survive.
    Two semi-joins — broadcast when the vertex set is small."""
    kv = keep_vertices.select(F.col(vid_col).alias("__kv"))
    out = edges.join(kv, edges.src == F.col("__kv"), "left_semi")
    return out.join(kv, out.dst == F.col("__kv"), "left_semi")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """G8: hash-to-min connected components over an undirected edge list.

    Returns (id, component) where component = min vertex id reachable.
    The reference has no alias-collapse; the north rule requires a
    GraphFrames-style label propagation — this is the standard
    small-star/large-star-flavored hash-to-min fixpoint:

        comp(v) ← min(comp(v), min over neighbors comp(u))

    iterated to fixpoint. Each round is one shuffle (groupBy id); lineage
    is truncated every round via localCheckpoint (or parquet round-trip if
    ``checkpoint_dir`` given) so plans stay bounded — essential for 100 TB
    inputs where 20 chained joins would blow up the plan.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    comp = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    comp.count()
    for _ in range(max_iter):
        # candidate components: my own, plus each neighbor's current component
        nbr = (
            sym.join(comp.withColumnRenamed("id", "b"), "b")
            .select(F.col("a").alias("id"), "component")
        )
        new_comp = (
            comp.select("id", "component")
            .unionAll(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        new_comp = new_comp.localCheckpoint(eager=True)
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp.unpersist()
        comp = new_comp
        if changed == 0:
            break
    sym.unpersist()
    return comp
