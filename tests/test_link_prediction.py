"""BPR link prediction: metric-threshold tests on synthetic preference
data + the reference's own example files (social_BPR.py, examples/)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nous_spark.operators.link_prediction import (
    bpr_evaluate,
    bpr_train,
    read_bpr_matlab,
    read_social_graph,
)

REF_EXAMPLES = "/root/reference/LinkPrediction/examples"


@pytest.fixture(scope="module")
def block_data(spark):
    """Two user groups with disjoint preferred item blocks: group A users
    buy items 0-9, group B users buy 10-19. Hold out 2 items per user."""
    train_rows, test_rows = [], []
    for u in range(30):
        block = range(0, 10) if u < 15 else range(10, 20)
        items = [(u * 7 + j) % 10 + (0 if u < 15 else 10) for j in range(8)]
        items = sorted(set(items))
        held = items[-2:]
        for it in items[:-2]:
            train_rows.append((u, it))
        for it in held:
            test_rows.append((u, it))
    train = spark.createDataFrame(train_rows, ["user", "item"])
    test = spark.createDataFrame(test_rows, ["user", "item"])
    return train, test


def test_bpr_learns_block_structure(spark, block_data):
    train, test = block_data
    P0, Q0, B0 = bpr_train(spark, train, n_items=20, epochs=0, k=8, seed=5)
    m0 = bpr_evaluate(P0, Q0, B0, train, test, top_n=5)
    P, Q, B = bpr_train(
        spark, train, n_items=20, epochs=8, steps_per_user=150, k=8,
        n_blocks=4, seed=5,
    )
    m = bpr_evaluate(P, Q, B, train, test, top_n=5)
    # untrained ranking is bias-dominated noise; trained must rank the
    # held-out block items far above random
    assert m["AUC"] > 0.75, f"AUC {m['AUC']} (init {m0['AUC']})"
    assert m["AUC"] > m0["AUC"] + 0.2
    assert m["HR"] > 0.5


def test_bpr_social_update_runs(spark, block_data):
    train, test = block_data
    # friends within the same group: social updates must not hurt AUC
    social = spark.createDataFrame(
        [(u, (u + 1) % 15) for u in range(15)]
        + [(u, 15 + (u - 15 + 1) % 15) for u in range(15, 30)],
        ["user", "friend"],
    )
    P, Q, B = bpr_train(
        spark, train, n_items=20, social=social, epochs=8,
        steps_per_user=150, k=8, n_blocks=4, seed=5,
    )
    m = bpr_evaluate(P, Q, B, train, test, top_n=5)
    assert m["AUC"] > 0.75


def test_bpr_deterministic(spark, block_data):
    """Training must be a pure function of (data, seed) — in particular
    independent of partition LAYOUT: the two runs use different
    spark.sql.shuffle.partitions, which changes applyInPandas group row
    order and toPandas delta arrival order (the round-3 driver failure
    mode for lp_bpr_metrics)."""
    train, _ = block_data
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        P1, Q1, B1 = bpr_train(spark, train.repartition(3), n_items=20,
                               epochs=1, steps_per_user=20, k=4, seed=9)
        f1 = {r.user: tuple(r.factors) for r in P1.collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        P2, Q2, B2 = bpr_train(spark, train.repartition(13), n_items=20,
                               epochs=1, steps_per_user=20, k=4, seed=9)
        f2 = {r.user: tuple(r.factors) for r in P2.collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert (Q1 == Q2).all() and (B1 == B2).all()
    assert f1 == f2


@pytest.mark.skipif(
    not os.path.exists(f"{REF_EXAMPLES}/train.txt"),
    reason="reference examples not available",
)
def test_bpr_reference_examples(spark):
    """Parity-of-capability on the reference's own example dataset
    (131 users / 124 items, dealsWith social graph): trained AUC must be
    far above random and above the untrained baseline."""
    meta, train = read_bpr_matlab(spark, f"{REF_EXAMPLES}/train.txt")
    _, test = read_bpr_matlab(spark, f"{REF_EXAMPLES}/test.txt")
    social = read_social_graph(
        spark,
        f"{REF_EXAMPLES}/graph_dealsWith.txt",
        f"{REF_EXAMPLES}/subj_entity.txt",
    )
    assert meta["num_user"] == 131 and meta["num_item"] == 124
    P0, Q0, B0 = bpr_train(spark, train, meta["num_item"], epochs=0, k=16, seed=1)
    m0 = bpr_evaluate(P0, Q0, B0, train, test, top_n=10)
    P, Q, B = bpr_train(
        spark, train, meta["num_item"], social=social, epochs=5,
        steps_per_user=200, k=16, n_blocks=4, seed=1,
    )
    m = bpr_evaluate(P, Q, B, train, test, top_n=10)
    assert m["AUC"] > 0.65, f"AUC {m['AUC']} vs init {m0['AUC']}"
    assert m["AUC"] > m0["AUC"]
    assert m["HR"] >= m0["HR"]
    # sampled-negative evaluation (the 100M-item-catalog path) must agree
    # with exact AUC within sampling noise on the reference example
    ms = bpr_evaluate(P, Q, B, train, test, top_n=10,
                      sampled_negatives=60, seed=7)
    assert abs(ms["AUC"] - m["AUC"]) < 0.06, f"{ms['AUC']} vs {m['AUC']}"
    # deterministic under the same seed
    ms2 = bpr_evaluate(P, Q, B, train, test, top_n=10,
                       sampled_negatives=60, seed=7)
    assert ms == ms2


def test_bpr_sampled_eval_agrees_with_exact(spark, block_data):
    train, test = block_data
    P, Q, B = bpr_train(
        spark, train, n_items=20, epochs=8, steps_per_user=150, k=8,
        n_blocks=4, seed=5,
    )
    exact = bpr_evaluate(P, Q, B, train, test, top_n=5)
    # K=12 negatives on a 20-item catalog ≈ the full complement set
    sampled = bpr_evaluate(P, Q, B, train, test, top_n=5,
                           sampled_negatives=12, seed=11)
    assert abs(sampled["AUC"] - exact["AUC"]) < 0.08
    assert sampled["HR"] >= exact["HR"] - 0.15  # K+1 ranking is easier


def test_bpr_distributed_learns_and_matches_broadcast(spark, block_data):
    """Item factors as a DataFrame (no broadcast catalog): must learn the
    block structure and land within tolerance of the broadcast path's AUC
    (the two paths draw negatives differently — rejection vs setdiff — so
    parity is metric-level, not bitwise)."""
    from nous_spark.operators.link_prediction import (
        bpr_evaluate_distributed,
        bpr_train_distributed,
    )

    train, test = block_data
    P, items = bpr_train_distributed(
        spark, train, n_items=20, epochs=8, steps_per_user=150, k=8,
        n_blocks=4, seed=5,
    )
    assert items.count() == 20
    # on this 20-item toy catalog rejection sampling draws duplicate
    # negatives (complement ~10 items), so distributed converges slightly
    # below the setdiff-based broadcast path (exact AUC 0.77 vs 0.83) —
    # an artifact that vanishes at real catalog sizes
    m = bpr_evaluate_distributed(
        P, items, train, test, n_items=20, top_n=5,
        sampled_negatives=12, seed=11,
    )
    assert m["AUC"] > 0.70, m
    assert m["HR"] > 0.5, m
    Pb, Qb, Bb = bpr_train(
        spark, train, n_items=20, epochs=8, steps_per_user=150, k=8,
        n_blocks=4, seed=5,
    )
    mb = bpr_evaluate(Pb, Qb, Bb, train, test, top_n=5)
    assert abs(m["AUC"] - mb["AUC"]) < 0.15, (m, mb)


def test_bpr_distributed_layout_independent(spark, block_data):
    """Same (data, seed) at different shuffle-partition counts must give
    bitwise-identical item factors and metrics — the ordered delta fold
    and sorted group frames are what make this hold."""
    from nous_spark.operators.link_prediction import (
        bpr_evaluate_distributed,
        bpr_train_distributed,
    )

    train, test = block_data
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        P1, i1 = bpr_train_distributed(
            spark, train.repartition(3), n_items=20, epochs=2,
            steps_per_user=30, k=4, n_blocks=3, seed=9,
        )
        f1 = {r.item: (tuple(r.qf), r.b) for r in i1.collect()}
        m1 = bpr_evaluate_distributed(P1, i1, train, test, n_items=20,
                                      sampled_negatives=6, seed=13)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        P2, i2 = bpr_train_distributed(
            spark, train.repartition(11), n_items=20, epochs=2,
            steps_per_user=30, k=4, n_blocks=3, seed=9,
        )
        f2 = {r.item: (tuple(r.qf), r.b) for r in i2.collect()}
        m2 = bpr_evaluate_distributed(P2, i2, train, test, n_items=20,
                                      sampled_negatives=6, seed=13)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert f1 == f2
    assert m1 == m2


def test_bpr_distributed_large_catalog_touches_sparsely(spark):
    """n_items far beyond the interaction support: the epoch must only
    move factor rows for TOUCHED items (#touched <= 3*steps*users), the
    rest keep their seeded init — the property that makes the DataFrame
    path viable for 100M-item catalogs."""
    from nous_spark.operators.link_prediction import bpr_train_distributed

    train = spark.createDataFrame(
        [(u, (u * 3 + j) % 40) for u in range(8) for j in range(4)],
        ["user", "item"],
    )
    P, items = bpr_train_distributed(
        spark, train, n_items=5000, epochs=1, steps_per_user=10, k=4,
        n_blocks=2, seed=21,
    )
    assert items.count() == 5000
    # untouched rows must equal a fresh init (epochs=0 run)
    _, init_items = bpr_train_distributed(
        spark, train, n_items=5000, epochs=0, steps_per_user=10, k=4,
        n_blocks=2, seed=21,
    )
    a = {r.item: (tuple(r.qf), r.b) for r in items.collect()}
    b = {r.item: (tuple(r.qf), r.b) for r in init_items.collect()}
    changed = [i for i in a if a[i] != b[i]]
    # 2 blocks * 8 users * 10 steps * 3 items max per step = 480 bound
    assert 0 < len(changed) <= 480


def test_bpr_distributed_social_runs(spark, block_data):
    """Distributed path with the social extension: friend-purchased items
    rank between own purchases and negatives; must stay deterministic and
    not hurt AUC on the block fixture."""
    from nous_spark.operators.link_prediction import (
        bpr_evaluate_distributed,
        bpr_train_distributed,
    )

    train, test = block_data
    social = spark.createDataFrame(
        [(u, (u + 1) % 15) for u in range(15)]
        + [(u, 15 + (u - 15 + 1) % 15) for u in range(15, 30)],
        ["user", "friend"],
    )
    P, items = bpr_train_distributed(
        spark, train, n_items=20, social=social, epochs=6,
        steps_per_user=120, k=8, n_blocks=3, seed=5,
    )
    m = bpr_evaluate_distributed(P, items, train, test, n_items=20,
                                 top_n=5, sampled_negatives=12, seed=11)
    assert m["AUC"] > 0.65, m
