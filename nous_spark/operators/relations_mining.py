"""Bootstrap relation mining (N9/J12/A15 — RelationMiner.scala:8-63).

Seed-driven pattern harvesting: given seed (subj, obj) pairs (or seed
predicates), find corpus triples connecting them and count rule support.
The reference scans the corpus per seed with driver contains() filters;
here it's one broadcast join over all seeds at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_rules_from_seed_pairs(
    triples: DataFrame, seed_pairs: DataFrame, min_support: int = 1
) -> DataFrame:
    """seed_pairs(seed_subj, seed_obj) → (pred, support) for predicates
    connecting any seed pair (either direction), with support counts
    (RelationMiner.bootstrapRules + checkBootstrapFilter)."""
    s = F.broadcast(seed_pairs.select(
        F.lower("seed_subj").alias("ss"), F.lower("seed_obj").alias("so")
    ))
    t = triples.select(
        F.lower("subj").alias("subj"), "pred", F.lower("obj").alias("obj")
    )
    fwd = t.join(s, (t.subj.contains(F.col("ss")) & t.obj.contains(F.col("so"))))
    rev = t.join(s, (t.subj.contains(F.col("so")) & t.obj.contains(F.col("ss"))))
    hits = fwd.select("pred").unionAll(rev.select("pred"))
    return (
        hits.groupBy("pred")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def mine_pairs_from_seed_predicates(
    triples: DataFrame, seed_preds: list[str], min_support: int = 1
) -> DataFrame:
    """RelationMiner.minePredicateRules: harvest (subj, obj) pairs for
    seed predicates, with per-pair occurrence counts."""
    hits = triples.filter(F.lower(F.col("pred")).isin([p.lower() for p in seed_preds]))
    return (
        hits.groupBy(F.lower("subj").alias("subj"), F.lower("obj").alias("obj"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def edge_label_multiset(edges: DataFrame) -> DataFrame:
    """A11 (PathFeatureGenerator.saveEdgeRankPerVertex, :124-150): per
    vertex, MAP<label, count> of incident edge labels."""
    counts = edges.select(F.col("src").alias("id"), "pred").groupBy(
        "id", "pred"
    ).agg(F.count("*").alias("cnt"))
    return counts.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("pred", "cnt"))
        ).alias("label_counts")
    )


def two_edge_signatures(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """A6 (getGraphDistributions.scala:69-120): typed 2-edge signature
    histogram — A→B→C chains and A←B→C forks via one self-join on the
    shared vertex."""
    v = vertices.select(F.col("id"), F.col("label").alias("vlabel"))
    typed = (
        edges.join(v.withColumnRenamed("id", "src").withColumnRenamed("vlabel", "src_t"), "src")
        .join(v.withColumnRenamed("id", "dst").withColumnRenamed("vlabel", "dst_t"), "dst")
        .select("src", "dst", "pred", "src_t", "dst_t")
    )
    a = typed.alias("a")
    b = typed.alias("b")
    chains = (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .select(
            F.concat_ws(
                ">", F.col("a.src_t"), F.col("a.pred"), F.col("a.dst_t"),
                F.col("b.pred"), F.col("b.dst_t"),
            ).alias("sig")
        )
        .withColumn("shape", F.lit("chain"))
    )
    # each unordered fork {e_i, e_j} is emitted exactly once: strict order
    # on (pred, dst) so equal-pred forks aren't double-counted relative to
    # distinct-pred ones (the reference pairs incident edges once per i<j)
    forks = (
        a.join(b, (F.col("a.src") == F.col("b.src"))
               & ((F.col("a.pred") < F.col("b.pred"))
                  | ((F.col("a.pred") == F.col("b.pred"))
                     & (F.col("a.dst") < F.col("b.dst")))))
        .select(
            F.concat_ws(
                "<", F.col("a.dst_t"), F.col("a.pred"), F.col("a.src_t"),
                F.col("b.pred"), F.col("b.dst_t"),
            ).alias("sig")
        )
        .withColumn("shape", F.lit("fork"))
    )
    return chains.unionByName(forks).groupBy("shape", "sig").agg(
        F.count("*").alias("cnt")
    )
