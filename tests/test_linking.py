"""Entity linking + canonicalization tests.

Scenario modeled on the reference's EntityDisambiguation example: a small
KG with alias edges and typed neighborhoods, ambiguous mentions resolved
collectively (context decides), unmatched mentions minted as 'nous: X'.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nous_spark.functions.similarity import js_divergence, string_sim
from nous_spark.operators.canonicalize import canonicalize, canonical_mapping
from nous_spark.operators.graph import connected_components, degrees
from nous_spark.operators.linking import (
    candidate_pairs,
    link_entities,
    vertices_with_alias,
)


def test_string_sim_reference_semantics():
    # exact word-set Dice when above threshold
    assert string_sim("united states", "united states") == 1.0
    assert abs(string_sim("world congress", "world congress centre") - 0.8) < 1e-9
    # below-threshold falls back to merge alignment; typos still align
    assert string_sim("atlanta", "atlanta georgia", 0.7) >= 2 / 3 - 1e-9
    assert string_sim("mikrosoft", "microsoft", 0.7) > 0.9
    assert string_sim("apple", "orange", 0.7) < 0.5


def test_string_sim_empty_tokens_never_match():
    # _split_words keeps internal empty tokens ('a, b' → ['a','','b']);
    # in the Scala reference d/0.0 is NaN which never satisfies
    # `>= min_word`, so empty-vs-empty must NOT count as a +2.0 match —
    # disjoint words with matching separators stay dissimilar
    assert string_sim("a, b", "x, y", 0.7) < 0.4
    # and empty tokens don't inflate genuinely similar phrases either
    s = string_sim("world, congress", "world, kongress", 0.7)
    assert 0.4 < s < 1.0


def test_js_divergence():
    assert js_divergence([0.5, 0.5], [0.5, 0.5]) == pytest.approx(0.0)
    assert js_divergence([1.0, 0.0], [0.0, 1.0]) > 0.3


KG = [
    # two 'Paris' entities with different neighborhoods
    ("paris_france", "rdfs:label", "Paris"),
    ("paris_france", "in_country", "france"),
    ("paris_france", "near", "versailles"),
    ("paris_texas", "rdfs:label", "Paris"),
    ("paris_texas", "in_state", "texas"),
    ("paris_texas", "near", "dallas"),
    ("france", "rdfs:label", "France"),
    ("versailles", "rdfs:label", "Versailles"),
    ("texas", "rdfs:label", "Texas"),
    ("dallas", "rdfs:label", "Dallas"),
]


@pytest.fixture(scope="module")
def kg(spark):
    return spark.createDataFrame(KG, ["subj", "pred", "obj"])


def test_vertices_with_alias(kg):
    v = vertices_with_alias(kg)
    row = v.filter(F.col("label") == "paris_france").collect()[0]
    assert "Paris" in row.names and "paris_france" in row.names


def test_candidate_pairs_blocked(spark, kg):
    mentions = spark.createDataFrame(
        [("d1", "Paris"), ("d1", "Dallas"), ("d1", "zzz_nothing")],
        ["doc_id", "mention"],
    )
    ents = vertices_with_alias(kg)
    cands = candidate_pairs(mentions, ents, 0.7).collect()
    paris = {r.entity_label for r in cands if r.mention == "Paris"}
    assert {"paris_france", "paris_texas"} <= paris
    assert not any(r.mention == "zzz_nothing" for r in cands)


def test_collective_linking_context_decides(spark, kg):
    """'Paris' alongside 'Dallas' should resolve to paris_texas (shared
    neighborhood), alongside 'Versailles' to paris_france."""
    mentions = spark.createDataFrame(
        [("texas_doc", "Paris"), ("texas_doc", "Dallas"),
         ("france_doc", "Paris"), ("france_doc", "Versailles"),
         ("france_doc", "unseen_widget_xyz")],
        ["doc_id", "mention"],
    )
    links = link_entities(mentions, kg, phrase_match_threshold=0.6).collect()
    by_key = {(r.doc_id, r.mention): r for r in links}
    assert by_key[("texas_doc", "Paris")].entity_label == "paris_texas"
    assert by_key[("france_doc", "Paris")].entity_label == "paris_france"
    # unmatched mention → nous: entity (reference :101-109)
    assert by_key[("france_doc", "unseen_widget_xyz")].entity_label == \
        "nous: unseen_widget_xyz"
    assert by_key[("france_doc", "unseen_widget_xyz")].score == 0.0


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["src", "dst"]
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3]
    assert comp[10] == comp[11]
    assert comp[1] != comp[10]


def test_degrees(spark):
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["src", "dst"])
    d = {r.id: r.degree for r in degrees(edges).collect()}
    assert d == {1: 2, 2: 2, 3: 2}


def test_canonicalize_collapses_aliases(spark):
    triples = spark.createDataFrame(
        [
            ("acme corp", "rdfs:label", "ACME"),
            ("ACME", "owl:sameAs", "acme incorporated"),
            ("acme corp", "makes", "widgets"),
            ("acme incorporated", "employs", "alice"),
            ("other co", "makes", "gadgets"),
        ],
        ["subj", "pred", "obj"],
    ).withColumn("repo", F.lit("r")).withColumn("path", F.lit("p"))
    canon, mapping = canonicalize(triples)
    m = {r.label: r.canonical_label for r in mapping.collect()}
    # canonical = longest label in the component (most specific)
    assert m["acme corp"] == m["ACME"] == m["acme incorporated"] == "acme incorporated"
    rows = canon.collect()
    subs = {r.subj for r in rows}
    assert "acme corp" not in subs and "ACME" not in subs
    assert ("other co") in subs  # untouched


def test_canonicalize_code_short_names(spark):
    triples = spark.createDataFrame(
        [
            ("r1/a.py", "defines_function", "r1/a.py::load_data", "r1", "a.py"),
            ("r1/b.py", "calls", "load_data", "r1", "b.py"),
            # ambiguous in r2: two defs with same short name → must NOT merge
            ("r2/x.py", "defines_function", "r2/x.py::run", "r2", "x.py"),
            ("r2/y.py", "defines_function", "r2/y.py::run", "r2", "y.py"),
            ("r2/z.py", "calls", "run", "r2", "z.py"),
        ],
        ["subj", "pred", "obj", "repo", "path"],
    )
    canon, mapping = canonicalize(triples)
    m = {r.label: r.canonical_label for r in mapping.collect()}
    assert m["load_data"] == "r1/a.py::load_data"
    # the call edge now points at the fully-qualified def
    call_objs = {r.obj for r in canon.filter(F.col("pred") == "calls").collect()}
    assert "r1/a.py::load_data" in call_objs
    # ambiguous short name must stay unresolved (no merge of distinct fns)
    assert "run" in call_objs


def test_candidate_types_restriction(spark):
    """candidate_types restricts the candidate universe to typed entities;
    other mentions fall back to nous: minting."""
    kg = spark.createDataFrame(
        [
            ("r/a.py::run", "rdf:type", "FUNCTION"),
            ("r/a.py", "defines_function", "r/a.py::run"),
            ("run club", "rdf:type", "O"),      # prose entity sharing token
            ("run club", "is in", "berlin"),
        ],
        ["subj", "pred", "obj"],
    )
    mentions = spark.createDataFrame([("d1", "run")], ["doc_id", "mention"])
    links = link_entities(
        mentions, kg, phrase_match_threshold=0.4,
        candidate_types=["FUNCTION", "CLASS", "MODULE"],
    ).collect()
    by = {(r.doc_id, r.mention): r.entity_label for r in links}
    # prose 'run club' must not be a candidate; FUNCTION entity wins
    assert by[("d1", "run")] == "r/a.py::run"
