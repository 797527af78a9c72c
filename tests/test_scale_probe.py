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
