"""Parity with the reference's EntityDisambiguation example run.

The golden transcript (EntityDisambiguation/examples/disambiguation_output:8-9)
records the base-KG load: 2,721 distinct edges / 1,055 vertices from
triplesTotal.txt after the reference's normalization (strip <>, lowercase,
trailing-dot removal, distinct — ReadGraph.scala:13-47). Our S8 reader +
vertex/edge builders must reproduce those counts exactly, and the alias
dictionary (J1) must pick up the <represents>-style alias edges.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nous_spark.operators.linking import kg_edges, kg_vertices, vertices_with_alias
from nous_spark.sources.readers import read_triples_tsv

KG = "/root/reference/EntityDisambiguation/examples/triplesTotal.txt"


@pytest.mark.skipif(not os.path.exists(KG), reason="reference not mounted")
def test_example_kg_load_counts(spark):
    triples = read_triples_tsv(spark, KG)
    assert kg_edges(triples).count() == 2721
    assert kg_vertices(triples).count() == 1055


@pytest.mark.skipif(not os.path.exists(KG), reason="reference not mounted")
def test_example_kg_candidate_linking(spark):
    """Mentions from the example input (disambiguation_input shape) link to
    the expected KG entities: 'ARM' resolves among the acronym entities."""
    triples = read_triples_tsv(spark, KG)
    ents = vertices_with_alias(triples)
    from nous_spark.operators.linking import candidate_pairs

    mentions = spark.createDataFrame(
        [("d1", "arm"), ("d1", "arm aerial facility")], ["doc_id", "mention"]
    )
    cands = candidate_pairs(mentions, ents, 0.7).collect()
    labels = {r.mention: set() for r in cands}
    for r in cands:
        labels[r.mention].add(r.entity_label)
    assert "arm" in labels and any("arm" == x for x in labels["arm"])
    assert any("aaf" == x or "arm aerial facility" in x
               for x in labels.get("arm aerial facility", set()))


@pytest.mark.skipif(not os.path.exists(KG), reason="reference not mounted")
def test_example_parser_parity(spark):
    """The example transcript (disambiguation_output:3) shows
    'No of unique triple blocks =0': Main.scala:39 parses the input with
    the 5-col WithTimeWithUrl reader, and disambiguation_input is 3-col —
    zero rows. The 3-col readTriples path ALSO yields zero blocks (the
    file has no ';' block terminator, NLPTripleParser.scala:97-101). Both
    zero-behaviors are golden."""
    from nous_spark.sources.readers import (
        read_nlp_triple_blocks,
        read_nlp_triples_with_time_url,
    )

    ex = os.path.dirname(KG)
    assert read_nlp_triples_with_time_url(
        spark, f"{ex}/disambiguation_input"
    ).count() == 0
    assert read_nlp_triple_blocks(spark, f"{ex}/disambiguation_input").count() == 0


@pytest.mark.skipif(not os.path.exists(KG), reason="reference not mounted")
def test_example_end_to_end_disambiguation(spark, tmp_path):
    """End-to-end link_entities over the example input as ONE properly
    ';'-terminated block (what Main.scala's loop would process had the
    input carried its terminator) against triplesTotal.txt with the
    reference defaults (phrase 0.65 / entity 0.3 / lambda 1e-5).
    The transcript itself records no mention output (blocks=0), so the
    assertions pin the stable resolution our collective solver produces:
    every mention gets exactly one row, the ozone mentions resolve into
    the KG's ozone entity, and out-of-KG locations fall back to the
    reference's 'nous: <mention>' convention (ColEntityDisamb:101-109)."""
    from nous_spark.operators.linking import link_entities
    from nous_spark.sources.readers import (
        nlp_block_mentions,
        read_nlp_triple_blocks,
    )

    ex = os.path.dirname(KG)
    raw = open(f"{ex}/disambiguation_input").read() + "\n;\n"
    p = tmp_path / "block_in.txt"
    p.write_text(raw)
    blocks = read_nlp_triple_blocks(spark, str(p))
    assert blocks.select("block_id").distinct().count() == 1
    ments = (
        nlp_block_mentions(blocks)
        .select(
            F.col("block_id").cast("string").alias("doc_id"),
            F.lower("mention").alias("mention"),
            "evidence_wt",
        )
    )
    # 15 mentions; the 'LOCATION'/'O' rdf:type objects count as mentions in
    # the reference (only LOC/ORG/PER/MISC/NONE are tag-filtered) and the
    # evidence weight is 1/15 for every one
    got_m = {r.mention: r.evidence_wt for r in ments.collect()}
    assert len(got_m) == 15 and "location" in got_m and "o" in got_m
    assert all(abs(w - 1 / 15) < 1e-12 for w in got_m.values())

    kg = read_triples_tsv(spark, KG)
    out = link_entities(ments, kg, phrase_match_threshold=0.65,
                        mention_entity_threshold=0.3, lam=1e-5)
    rows = out.collect()
    assert len(rows) == 15  # one resolution per mention
    by_m = {r.mention: r for r in rows}
    # in-KG resolutions (stable across runs — seeded, deterministic plan)
    assert by_m["ozone concentration"].entity_label == "ozone"
    assert by_m["ozone concentrations"].entity_label == "ozone"
    assert by_m["boundary layer"].entity_label == "planetary boundary layer height"
    # out-of-KG mentions take the reference's unmatched convention
    for m in ("papua new guinea", "manus island", "west pacic"):
        assert by_m[m].entity_label == f"nous: {m}"
    # determinism: a second full run resolves identically
    again = {r.mention: r.entity_label for r in link_entities(
        ments, kg, phrase_match_threshold=0.65,
        mention_entity_threshold=0.3, lam=1e-5).collect()}
    assert again == {m: r.entity_label for m, r in by_m.items()}
