"""Canonicalization (G8): collapse alias/same-as clusters to canonical ids.

The reference never collapses aliases — it carries alias strings (J1) and
mints 'nous: X' vertices. The north rule requires connected-components-based
canonicalization over an alias-edge DataFrame; we build the edges from

  * explicit alias predicates (rdfs:label, skos:prefLabel,
    isPreferredMeaningOf, owl:sameAs)
  * entity-linking results (mention → linked entity)
  * code-graph short-name edges (callee name → fully-qualified def)

run hash-to-min CC, and rewrite subj/obj through the resulting mapping.
Head-entity skew (a name linked from everywhere) is handled by salting the
rewrite join key — see ``materialize.write_triples``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nous_spark.operators.graph import connected_components

SAMEAS_PREDICATES = ["owl:sameas", "sameas", "rdfs:label", "skos:preflabel",
                     "ispreferredmeaningof"]


def alias_edges_from_triples(triples: DataFrame) -> DataFrame:
    """(a, b) label-pair edges from same-as/alias predicates."""
    return (
        triples.filter(F.lower(F.col("pred")).isin(SAMEAS_PREDICATES))
        .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
    )


def alias_edges_from_links(links: DataFrame, min_score: float = 0.0) -> DataFrame:
    """(mention, entity_label) pairs from the linking stage."""
    return (
        links.filter(F.col("score") >= min_score)
        .select(F.col("mention").alias("a"), F.col("entity_label").alias("b"))
    )


def alias_edges_from_code(triples: DataFrame, docs: DataFrame | None = None) -> DataFrame:
    """callee short name → fully-qualified def it resolves to, when the
    resolution is unambiguous within a repo (same-repo def with matching
    trailing ::name). Ambiguous names stay unlinked — canonicalization must
    not merge distinct functions that merely share a name.

    Normalized-provenance triples don't carry ``repo``; pass ``docs`` to
    attach it via doc_id (broadcast — docs ≪ triples)."""
    if "repo" not in triples.columns:
        if docs is None:
            return triples.limit(0).select(
                F.col("subj").alias("a"), F.col("obj").alias("b")
            )
        triples = triples.join(
            F.broadcast(docs.select("doc_id", "repo")), "doc_id", "left"
        )
    defs = (
        triples.filter(F.col("pred").isin("defines_function", "defines_class"))
        .select(
            F.col("repo"),
            F.col("obj").alias("fq"),
            F.element_at(F.split(F.col("obj"), "::"), -1).alias("short"),
        )
    )
    calls = (
        triples.filter(F.col("pred") == "calls")
        .select(F.col("repo"), F.col("obj").alias("callee"))
        .distinct()
    )
    resolved = (
        calls.join(defs, (calls.repo == defs.repo) & (calls.callee == defs.short))
        .groupBy(calls.repo, "callee")
        .agg(
            F.count("*").alias("n_defs"),
            F.min("fq").alias("fq"),
        )
        .filter(F.col("n_defs") == 1)
    )
    return resolved.select(F.col("callee").alias("a"), F.col("fq").alias("b"))


def canonical_mapping(alias_edges: DataFrame) -> DataFrame:
    """label → canonical_label via hash-to-min connected components.
    Canonical representative = longest label in the component (ties →
    lexicographically smallest): fully-qualified names beat short names,
    full names beat aliases. Deterministic → resume-stable."""
    ids = (
        alias_edges.select(F.col("a").alias("label"))
        .unionAll(alias_edges.select(F.col("b").alias("label")))
        .distinct()
        .select(F.xxhash64("label").alias("id"), "label")
    )
    edges = alias_edges.select(
        F.xxhash64("a").alias("src"), F.xxhash64("b").alias("dst")
    )
    comp = connected_components(edges)
    labeled = ids.join(comp, "id", "left").withColumn(
        "component", F.coalesce("component", F.col("id"))
    )
    reps = labeled.groupBy("component").agg(
        F.min(
            F.struct(
                (-F.length("label")).alias("neg_len"), F.col("label")
            )
        )["label"].alias("canonical_label")
    )
    return (
        labeled.join(reps, "component")
        .select("label", "canonical_label",
                F.xxhash64("canonical_label").alias("canonical_id"))
    )


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical mapping (left joins; unmapped
    labels stay as-is). The mapping is usually small relative to the triple
    table → broadcast."""
    m_subj = F.broadcast(mapping.select(
        F.col("label").alias("subj"), F.col("canonical_label").alias("__cs")
    ))
    m_obj = F.broadcast(mapping.select(
        F.col("label").alias("obj"), F.col("canonical_label").alias("__co")
    ))
    out = (
        triples.join(m_subj, "subj", "left")
        .join(m_obj, "obj", "left")
        .withColumn("subj", F.coalesce("__cs", F.col("subj")))
        .withColumn("obj", F.coalesce("__co", F.col("obj")))
        .drop("__cs", "__co")
    )
    return out.select(triples.columns)


def canonicalize(
    triples: DataFrame,
    links: DataFrame | None = None,
    docs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full G8 stage: returns (canonical_triples, mapping)."""
    edges = alias_edges_from_triples(triples).unionByName(
        alias_edges_from_code(triples, docs)
    )
    if links is not None:
        edges = edges.unionByName(alias_edges_from_links(links))
    edges = edges.filter(
        F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    )
    mapping = canonical_mapping(edges)
    return rewrite_triples(triples, mapping), mapping
