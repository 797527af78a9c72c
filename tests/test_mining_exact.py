"""Exact-semantics miner unit tests (small, truncation-free graphs) +
the WSJ batch-40 golden check (1-edge stage is deterministic and must
match the reference output exactly)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nous_spark.operators.mining_exact import (
    ExactPatternMiner,
    first_types,
    min_image_support_exact,
    one_edge_instances_exact,
    read_int_quads,
)

INT = "/root/reference/Mining/examples/wsj/intGraphOri"


def _quads(spark, rows):
    return spark.createDataFrame(rows, ["src", "pred", "dst", "batch_id"])


def test_type_keyed_mis_support(spark):
    """MIS counts distinct nodes per TYPE VALUE, not per position: pattern
    (1,7,1) with bindings (10,11) and (11,12) has nodes {10,11,12} under
    type 1 → support 3 (position-keyed would give 2)."""
    quads = _quads(spark, [
        (10, 0, 1, 0), (11, 0, 1, 0), (12, 0, 1, 0),
        (10, 7, 11, 0), (11, 7, 12, 0),
    ])
    inst = one_edge_instances_exact(quads, first_types(quads))
    sup = {r.pat_str: r.support for r in min_image_support_exact(inst).collect()}
    assert sup == {"(1,7,1)": 3}


def test_miner_window_and_growth(spark):
    """Two batches sharing a motif: 2-edge pattern found with the
    reference's bookkeeping (per-batch pre-join log + window totals)."""
    def batch(b):
        rows = [(n, 0, 1, b) for n in (10, 11, 12, 13)]
        rows += [(10, 7, 11, b), (11, 8, 12, b), (12, 7, 13, b), (13, 8, 10, b)]
        return _quads(spark, rows)

    miner = ExactPatternMiner(spark, mis_support=2, window_batches=3,
                              max_pattern_size=2, edge_limit=None)
    f0 = {r.pat_str: r.support for r in miner.process_batch(batch(0), 0).collect()}
    # (1,7,1) binds nodes {10,11,12,13} under type 1 → support 4
    assert f0["(1,7,1)"] == 4 and f0["(1,8,1)"] == 4  # 1-edge pre-join
    window = {r.pat_str: r.support for r in miner.frequent_patterns().collect()}
    # post-join window totals include 2-edge patterns
    assert any(", " in p for p in window), window
    pb = miner.per_batch_frequent().collect()
    assert all(r.batch_id == 0 for r in pb)


@pytest.mark.skipif(not os.path.isdir(INT), reason="reference not mounted")
def test_wsj_batch40_exact_golden(spark):
    """The 1-edge stage (no joins yet → no order-dependent truncation) must
    reproduce ALL 507 golden (pattern, support) rows for batch 40."""
    entities = read_int_quads(spark, f"{INT}/wsj_entities.txt")
    facts = read_int_quads(spark, f"{INT}/wsj_facts_2010.txt")
    quads = entities.unionByName(facts)
    inst = one_edge_instances_exact(quads, first_types(quads, 0), 0)
    sup = min_image_support_exact(inst).filter(F.col("support") >= 2)
    got = {(r.pat_str, r.support) for r in sup.collect()}
    gold = set()
    for line in open("/root/reference/Mining/output/frequentPatternsPerBatch.tsv"):
        b, pat, s = line.rstrip("\n").split("\t")
        if b == "40":
            gold.add((pat, int(s)))
    assert got == gold
    assert len(got) == 507
