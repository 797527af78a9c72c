"""Candidate-generation blowup regression gate (promoted from
scripts/scale_probe.py): a quadratic candidate generator grows candidate
PAIR COUNTS ~K^2 under a K-fold blowup-honest amplification, a blocked one
grows ~K. Counting pairs instead of timing keeps the gate deterministic on
a host whose throughput swings 4x (NOTES_ROUND3)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
FACTOR = 6
C = 3  # slack over perfectly-linear growth (cross-copy hash collisions)


def test_minhash_candidates_stay_linear(spark):
    from nous_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )
    from scripts.scale_probe import amplified_documents

    def cand(docs):
        return lsh_candidate_pairs(
            minhash_signatures(shingles(docs))
        ).count()

    c1 = cand(spark.read.parquet(f"{SF}/documents.parquet"))
    cK = cand(amplified_documents(spark, SF, FACTOR))
    assert c1 > 0
    assert cK <= c1 * FACTOR * C, (c1, cK)


def test_simhash_candidates_stay_linear(spark):
    from nous_spark.operators.dedup import simhash
    from scripts.scale_probe import amplified_documents

    def cand(docs):
        sh = simhash(docs)
        width = 16
        banded = sh.select(
            "id",
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * width)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk"),
                )
                for b in range(4)
            ])).alias("bc"),
        ).select("id", "bc.band", "bc.chunk")
        l, r = banded.alias("l"), banded.alias("r")
        return (
            l.join(r, ["band", "chunk"])
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .dropDuplicates(["a", "b"]).count()
        )

    c1 = cand(spark.read.parquet(f"{SF}/documents.parquet"))
    cK = cand(amplified_documents(spark, SF, FACTOR))
    assert c1 > 0
    assert cK <= c1 * FACTOR * C, (c1, cK)


def test_srp_embedding_candidates_stay_linear(spark):
    """At FIXED n_bits, SRP bucket collisions are O(n²/2^bits) — the
    operator must auto-scale bits with log2(n) (round-4 fix) to keep
    candidate work linear."""
    from nous_spark.operators.dedup import srp_candidate_pairs
    from scripts.scale_probe import amplified_embeddings

    emb1 = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb1.select("embedding").first()[0])

    c1 = srp_candidate_pairs(emb1, dim).count()
    cK = srp_candidate_pairs(
        amplified_embeddings(spark, SF, FACTOR), dim
    ).count()
    assert c1 > 0
    assert cK <= c1 * FACTOR * C, (c1, cK)


def test_ngram_prefix_block_candidates_stay_linear(spark):
    """Prefix-filter blocking (2 smallest shingle hashes) must also grow
    candidates ~linearly: copies share no shingles with each other, so
    cross-copy blocking collisions stay negligible."""
    from nous_spark.operators.dedup import shingles
    from scripts.scale_probe import amplified_documents

    def cand(docs):
        sh = shingles(docs)
        blocked = sh.select(
            "id",
            F.explode(
                F.slice(F.array_sort("shingle_hashes"), 1, 2)
            ).alias("blk"),
        )
        l, r = blocked.alias("l"), blocked.alias("r")
        return (
            l.join(r, "blk")
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .dropDuplicates(["a", "b"]).count()
        )

    c1 = cand(spark.read.parquet(f"{SF}/documents.parquet"))
    cK = cand(amplified_documents(spark, SF, FACTOR))
    assert c1 > 0
    assert cK <= c1 * FACTOR * C, (c1, cK)


def test_grow_patterns_hub_cap_bounds_pairs(spark):
    """grow_patterns' per_key_cap must bound the self-join fan-out of a
    hub endpoint WITHOUT a per-key window (a row_number over a 10^6-degree
    hub would land the whole hub in one task). A 40k-instance hub with
    cap=100 must emit O(cap^2) pairs, not O(deg^2)/2 = 8*10^8; endpoints
    at or under the cap must keep the exact uncapped result."""
    from nous_spark.operators.mining import grow_patterns

    hub = spark.range(40_000).select(
        F.lit("p").alias("pattern_key"),
        F.array(F.col("id")).alias("binding"),
        F.array(F.lit(7).cast("long")).alias("endpoints"),
        F.lit(0).cast("long").alias("batch_id"),
        F.col("id").alias("inst_id"),
    )
    n = grow_patterns(hub, per_key_cap=100).count()
    # divisor = ceil(40000/100) = 400 -> E[kept] = 100; allow 4x slack on
    # the binomial tail squared
    assert 0 < n <= (4 * 100) ** 2 / 2, n

    small = spark.range(40).select(
        F.lit("p").alias("pattern_key"),
        F.array(F.col("id")).alias("binding"),
        F.pmod(F.col("id"), F.lit(5)).alias("ep"),
    ).select(
        "pattern_key", "binding",
        F.array(F.col("ep").cast("long")).alias("endpoints"),
        F.lit(0).cast("long").alias("batch_id"),
        F.col("binding").getItem(0).alias("inst_id"),
    )
    capped = {tuple(r) for r in grow_patterns(small, per_key_cap=100)
              .select("pattern_key", "inst_id").collect()}
    free = {tuple(r) for r in grow_patterns(small, per_key_cap=None)
            .select("pattern_key", "inst_id").collect()}
    assert capped == free and len(free) > 0


def test_duplicate_span_rows_stay_linear(spark):
    """duplicate_spans: span rows and duplicated-position hits grow ~K
    under K-fold amplification (shingle-vocab blocking, never doc-pair).
    The planted header is deliberately NOT copy-tagged, so its shingle
    hash becomes a K*n/4-doc hub key — the worst case the join-back must
    stay linear through."""
    from nous_spark.operators.dedup import duplicate_spans
    from scripts.scale_probe import amplified_documents

    header = ("this site uses cookies to improve your experience accept"
              " our terms to continue reading more")

    def plant(docs):
        return docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit(header + " "), F.col("text")))
            .otherwise(F.col("text")),
        )

    def spans(docs):
        return duplicate_spans(plant(docs), k=13).count()

    c1 = spans(spark.read.parquet(f"{SF}/documents.parquet"))
    cK = spans(amplified_documents(spark, SF, FACTOR))
    assert c1 > 0
    assert cK <= c1 * FACTOR * C, (c1, cK)


def test_triangle_orientation_bounds_hub_wedges(spark):
    """Degree-ordered orientation must keep wedge generation linear on a
    hub graph: a 20k-leaf star generates ZERO oriented wedges at the hub
    (every leaf points AT the hub — the highest-rank endpoint — so the
    hub has no out-neighbors to pair), where the naive centered form
    would enumerate deg^2/2 = 2*10^8 pairs. Pinned by replicating the
    operator's own orientation and counting wedge rows, then by the
    operator finishing with the exact (empty) triangle answer."""
    from pyspark.sql import functions as F

    from nous_spark.operators.graph import degrees, triangle_counts

    hub = spark.range(1, 20_001).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    # replicate the orientation: rank = (degree, id)
    e = hub.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    deg = degrees(e, "a", "b")
    ra = deg.select(F.col("id").alias("a"), F.col("degree").alias("da"))
    rb = deg.select(F.col("id").alias("b"), F.col("degree").alias("db"))
    ed = e.join(ra, "a").join(rb, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    o2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    n_wedges = oriented.join(o2, "u").filter(F.col("v") < F.col("w")).count()
    assert n_wedges == 0, n_wedges
    out = triangle_counts(hub)
    assert out.filter(F.col("n_triangles") > 0).count() == 0
    assert out.count() == 20_001


def test_adamic_adar_cap_bounds_hub_pairs(spark):
    """max_neighbor_degree must bound common-neighbor pair generation:
    a 20k-leaf hub yields deg^2/2 = 2*10^8 wedge pairs uncapped; with the
    hub dropped as an intermediate the scored-pair count collapses to the
    side structure only."""
    from pyspark.sql import functions as F

    from nous_spark.operators.graph import adamic_adar_scores

    hub = spark.range(1, 20_001).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    side = spark.createDataFrame(
        [(100_001, 100_002), (100_002, 100_003)], ["src", "dst"]
    )
    e = hub.unionByName(side)
    out = adamic_adar_scores(e, max_neighbor_degree=1000)
    rows = out.collect()
    # only the side wedge survives: (100001, 100003) through 100002
    assert {(r.x, r.y) for r in rows} == {(100_001, 100_003)}, rows


def test_semantic_relatedness_label_df_cap_bounds_pairs(spark):
    """max_label_df must bound the label-keyed self-join's candidate
    generation: a hub label shared by 200 entities yields C(200,2) ≈
    2*10^4 pairs uncapped (10^12 on a real KG's "person" label); with
    the hub label pruned at df > cap, only pairs through informative
    (low-df) labels survive — and their scores are computed on the
    pruned index, so the hub contributes neither pairs nor |A| mass."""
    from pyspark.sql import functions as F

    from nous_spark.operators.linking import semantic_relatedness_pairs

    hub = spark.range(1, 201).select(
        F.col("id").alias("entity_id"), F.lit("HUB").alias("nbr_label"))
    # entities 1..4 also share two informative labels pairwise
    side = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (1, "c"), (2, "c")],
        ["entity_id", "nbr_label"],
    ).select("entity_id", "nbr_label")
    nbrs = hub.unionByName(side)
    capped = semantic_relatedness_pairs(nbrs, 1000, max_label_df=10)
    rows = capped.collect()
    # only the informative-label pairs remain: (1,2) via {a,c}, (3,4)
    # via {b}; the 19.9k hub-only pairs are never generated
    assert {(r.e1, r.e2) for r in rows} == {(1, 2), (3, 4)}, rows
    uncapped = semantic_relatedness_pairs(nbrs, 1000)
    assert uncapped.count() > 15_000  # the blowup the cap exists to kill


def test_triple_store_patch_cost_independent_of_members(spark, tmp_path):
    """A canonicalization merge costs the triple store one patch row per
    DETHRONED REP — the same cost at 6x the component's member/triple
    count. This is the property that lets a 100 TB store absorb alias
    merges without rewriting stored segments."""
    from nous_spark.operators.triple_store import (
        build_triple_store,
        update_triple_store,
    )

    def n_patches(n, path):
        members = spark.range(n).select(
            F.concat(F.lit("m"), F.col("id").cast("string")).alias("a"),
            F.lit("hub-entity-long-name").alias("b"))
        triples = spark.range(n).select(
            F.concat(F.lit("m"), F.col("id").cast("string")).alias("subj"),
            F.lit("mentions").alias("pred"),
            F.concat(F.lit("m"),
                     ((F.col("id") + 1) % n).cast("string")).alias("obj"))
        other = spark.createDataFrame(
            [("x1", "an-even-longer-canonical-entity-name")], ["a", "b"])
        build_triple_store(triples, members.unionByName(other), path,
                           buckets=8, salt_buckets=4)
        stats = update_triple_store(
            spark, triples.limit(0),
            spark.createDataFrame([("hub-entity-long-name", "x1")],
                                  ["a", "b"]),
            path, update_id=1, salt_buckets=4)
        return stats["n_patches"]

    assert n_patches(300, str(tmp_path / "small")) == 1
    assert n_patches(300 * FACTOR, str(tmp_path / "big")) == 1
