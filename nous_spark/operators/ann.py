"""Similarity search over embedding columns (ARRAY<FLOAT/DOUBLE>).

Baseline: brute-force cosine top-k — one broadcast of the query vectors,
JVM-side dot products, per-query top-k via window. Scale path: LSH-bucketed
(random signed projections → bit signature → bucket join) so a 100 TB
embedding table only compares within buckets; recall is tunable with
``n_tables`` (OR-amplification).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nous_spark.functions.similarity import cosine_col


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: crossJoin(broadcast(queries)) + window.
    queries(query_id, embedding). Returns (query_id, vec_id, cosine, rank)."""
    from nous_spark.operators.dedup import _spread

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
    )
    # the per-row cosine is a non-codegen higher-order aggregate (~µs per
    # vector·query) — a single-file embedding table otherwise runs the
    # whole scoring pass in one scan task (guide §2: spread before
    # expression-heavy per-row work; no-op at cluster file counts)
    v = _spread(vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v_emb"),
    ))
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("v_emb").cast("array<double>"),
                           F.col("q_emb").cast("array<double>")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _projection_planes(dim: int, n_bits: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def lsh_signatures(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "pandas",
) -> DataFrame:
    """Signed-random-projection signatures: (id, table, bucket).

    ``impl="pandas"`` (default): ONE Arrow-batched matmul per batch —
    the (batch × dim) embedding block times the (dim × n_bits·n_tables)
    plane matrix, signs packed into per-table bucket ints in NumPy.
    This is the documented Pandas-UDF exception to the built-ins-first
    rule: the expression-tree form below runs n_bits·n_tables sequential
    ``aggregate`` lambda chains per row (measured 40× slower at
    dim=64, 17 bits × 8 tables — Catalyst does not codegen higher-order
    aggregates into anything near a BLAS call).

    ``impl="expr"``: the original pure-column form (zero Python), kept
    for environments where Arrow is unavailable and as the semantic
    reference. Both use the same planes and the same sign rule
    (dot > 0); summation ORDER differs (sequential vs pairwise), which
    can only flip a bucket bit for |dot| at float-ulp scale — the
    regenerated VALUES oracles pin the shipped default end to end.

    Rows with a NULL embedding produce no signature rows (they are
    filtered before the projection in both impls — a null vector has no
    meaningful bucket, and one bad row must not fail the batch).
    """
    planes = _projection_planes(dim, n_bits, n_tables, seed)
    from nous_spark.operators.dedup import _spread

    vectors = _spread(vectors.filter(F.col(vec_col).isNotNull()))
    if impl == "pandas":
        from pyspark.sql.types import ArrayType, LongType

        # (dim, n_tables*n_bits), column-major by table
        pmat = np.array(
            [plane for table in planes for plane in table], dtype=np.float64
        ).T
        weights = np.array([1 << b for b in range(n_bits)], dtype=np.int64)
        nt = n_tables

        @F.pandas_udf(ArrayType(LongType()))
        def _buckets(col: pd.Series) -> pd.Series:
            if len(col) == 0:
                # Arrow can hand the UDF an empty batch (e.g. a
                # filtered-out partition) — np.stack([]) raises
                return pd.Series([], dtype=object)
            m = np.stack(col.to_numpy()).astype(np.float64)  # (n, dim)
            signs = (m @ pmat) > 0                           # (n, nt*nb)
            per_table = signs.reshape(len(m), nt, -1)        # (n, nt, nb)
            buckets = per_table @ weights                    # (n, nt)
            return pd.Series(list(buckets))

        return vectors.select(
            F.col(id_col).alias("vec_id"),
            F.posexplode(_buckets(F.col(vec_col))).alias("table", "bucket"),
        )
    v = F.col(vec_col).cast("array<double>")
    rows = []
    for t, table in enumerate(planes):
        bucket = F.lit(0).cast("long")
        for b, plane in enumerate(table):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            dot = F.aggregate(
                F.zip_with(v, lit_plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        rows.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.explode(F.array(*rows)).alias("tb")
    ).select("vec_id", "tb.table", "tb.bucket")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: candidates = ids sharing any (table,
    bucket) with the query, exact cosine on candidates only."""
    sig_v = lsh_signatures(vectors, dim, n_bits, n_tables, seed, id_col, vec_col)
    sig_q = lsh_signatures(
        queries, dim, n_bits, n_tables, seed, query_id_col, vec_col
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        sig_v.join(sig_q, ["table", "bucket"])
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v_emb"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    )
    scored = (
        cand.join(v, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("v_emb"), F.col("q_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_train_centroids(
    vectors: DataFrame,
    dim: int,
    n_cells: int = 16,
    kmeans_iter: int = 5,
    seed: int = 7,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means refine for IVF centroids: seeded random init, then
    ``kmeans_iter`` bounded Lloyd rounds — assignment is a JVM-side argmax
    over literal centroids, the new means are one aggregation (posexplode +
    groupBy), so each round is a single pass regardless of table size."""
    rng = random.Random(seed)
    cents = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_cells)]

    def normalize(cs):
        out = []
        for c in cs:
            n = math.sqrt(sum(x * x for x in c)) or 1.0
            out.append([x / n for x in c])
        return out

    cents = normalize(cents)
    v = vectors.select(F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(kmeans_iter):
        def cell_of(col):
            scores = F.array(*[
                F.aggregate(
                    F.zip_with(col, F.array(*[F.lit(x) for x in c]),
                               lambda a, b: a * b),
                    F.lit(0.0), lambda acc, x: acc + x,
                )
                for c in cents
            ])
            return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")

        assigned = v.withColumn("cell", cell_of(F.col("v")))
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = [list(c) for c in cents]
        acc: dict[int, list[float]] = {}
        for r in sums:
            acc.setdefault(r.cell, [0.0] * dim)[r.pos] = r.s / r.n
        for cell, mean in acc.items():
            new[cell] = mean
        new = normalize(new)
        if new == cents:
            break
        cents = new
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat: k-means-refined centroids (``ivf_train_centroids``; pass
    kmeans_iter=0 for the old seeded-random cells), vectors assigned to
    nearest cell, queries probe the ``n_probe`` nearest cells."""
    if kmeans_iter > 0:
        cents = ivf_train_centroids(
            vectors, dim, n_cells, kmeans_iter, seed, vec_col
        )
    else:
        rng = random.Random(seed)
        cents = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_cells)]
        norms = [math.sqrt(sum(x * x for x in c)) or 1.0 for c in cents]
        cents = [[x / n for x in c] for c, n in zip(cents, norms)]

    def cell_scores(col):
        v = col.cast("array<double>")
        return F.array(*[
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in c]), lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            for c in cents
        ])

    def top_cells(col, n):
        scores = cell_scores(col)
        idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
        pairs = F.zip_with(scores, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        return F.transform(
            F.slice(F.reverse(F.array_sort(pairs)), 1, n), lambda p: p["i"]
        )

    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v_emb"),
    ).withColumn("cell", top_cells(F.col("v_emb"), 1)[0])
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    ).withColumn("cells", top_cells(F.col("q_emb"), n_probe))
    q_cells = q.select("query_id", "q_emb", F.explode("cells").alias("cell"))
    scored = (
        v.join(F.broadcast(q_cells), "cell")
        .select(
            "query_id", "vec_id",
            F.round(cosine_col(F.col("v_emb"), F.col("q_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_build_index(
    vectors: DataFrame,
    dim: int,
    n_cells: int = 16,
    kmeans_iter: int = 5,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Build an IVF index once: trained centroids + the cell-assigned
    vector table. ``ivf_topk`` retrains and reassigns on every call —
    fine for one-shot analytics, wasteful for a serving workflow where
    one index answers many query batches. Returns (centroids,
    assigned(vec_id, v_emb, cell))."""
    cents = ivf_train_centroids(vectors, dim, n_cells, kmeans_iter, seed,
                                vec_col)
    return cents, _assign_cells(vectors, cents, id_col, vec_col)


def _assign_cells(vectors: DataFrame, cents: list[list[float]],
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid — the SAME top-1
    dot-product scoring and score-tie break as ivf_topk/ivf_query, so
    build-time, add-time, and query-time cell choices can never drift."""
    n_cells = len(cents)

    def cell_scores(col):
        v = col.cast("array<double>")
        return F.array(*[
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in c]),
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            for c in cents
        ])

    def top1(col):
        scores = cell_scores(col)
        idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
        pairs = F.zip_with(scores, idx,
                           lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        return F.slice(F.reverse(F.array_sort(pairs)), 1, 1)[0]["i"]

    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v_emb"),
    ).withColumn("cell", top1(F.col("v_emb")).cast("int"))


def ivf_add_vectors(new_vectors: DataFrame, path: str,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    seg: str | None = None) -> dict:
    """Fold a new vector batch into a SAVED IVF index without
    retraining — the embedding-side twin of ``update_minhash_index``:
    at 100 TB a daily embedding delta must not re-run kmeans or rewrite
    the store. New vectors are assigned to the EXISTING centroids (the
    shared ``_assign_cells`` scoring, so an added vector lands in
    exactly the cell a query probe will look in) and appended to the
    by-cell partitioned store, repartitioned onto the cell key first so
    each delta adds one file per cell instead of tasks×cells fragments.

    Centroid drift is the caller's trade: periodically rebuild with
    ``ivf_build_index`` when recall degrades (the standard IVF
    operational pattern). To give that trade a MEASUREMENT, the return
    value reports post-add cell-occupancy skew — the operational drift
    signal: a delta whose distribution has moved away from the trained
    centroids piles into few cells, max/mean rises, and the biggest
    probe stops pruning (one cell of an n_cells index at skew s holds
    s/n_cells of the data, so probe cost degrades by the same factor).
    The stats cost one count aggregate over the store's cell partition
    column (column-pruned scan, no vector bytes read).

    Returns {"n_cells", "n_vectors", "max_cell", "mean_cell",
    "cell_skew" (max/mean), "empty_cells"}. Caller guarantees ids are
    new.

    ``seg`` names the delta's segment partition (same idempotency
    contract as ``update_minhash_index``): a caller that supplies a
    STABLE id for the delta gets a retry-safe fold — the write replaces
    ``seg=<id>`` with dynamic partition overwrite instead of
    blind-appending. Default (None) generates a fresh segment, i.e.
    plain append semantics."""
    import uuid

    spark = new_vectors.sparkSession
    cents, _ = ivf_load_index(spark, path)
    seg = seg if seg is not None else f"u{uuid.uuid4().hex[:12]}"
    _assign_cells(new_vectors, cents, id_col, vec_col).withColumn(
        "seg", F.lit(seg)).repartition(
        len(cents), "cell").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic").partitionBy(
        "cell", "seg").parquet(f"{path}/vectors")
    occ = (
        spark.read.parquet(f"{path}/vectors")
        .groupBy("cell").agg(F.count("*").alias("n"))
        .agg(F.sum("n").alias("total"), F.max("n").alias("mx"),
             F.count("*").alias("occupied"))
        .collect()[0]
    )
    n_cells = len(cents)
    mean = occ.total / n_cells
    return {
        "n_cells": n_cells,
        "n_vectors": int(occ.total),
        "max_cell": int(occ.mx),
        "mean_cell": round(mean, 3),
        "cell_skew": round(occ.mx / mean, 3) if mean else 0.0,
        "empty_cells": n_cells - int(occ.occupied),
    }


def ivf_save_index(cents: list[list[float]], assigned: DataFrame,
                   path: str) -> None:
    """Persist an IVF index: centroids as a tiny parquet (cell, centroid),
    assignments partitioned BY CELL so a query probing n_probe cells
    prunes to n_probe/n_cells of the data at the file level, with a
    second ``seg`` level (``seg=base`` here, one seg per incremental
    add) so delta folds can be replaced idempotently — the same layout
    contract as the MinHash index."""
    spark = assigned.sparkSession
    # single-slice parallelize: a default-sliced local frame fans out to
    # defaultParallelism Python workers whose spin-up costs ~5 s per
    # write regardless of row count (measured; one slice: ~0.3 s warm)
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, c) for i, c in enumerate(cents)], 1),
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned.withColumn("seg", F.lit("base")).write.mode(
        "overwrite").partitionBy("cell", "seg").parquet(f"{path}/vectors")


def ivf_load_index(spark: SparkSession,
                   path: str) -> tuple[list[list[float]], DataFrame]:
    rows = spark.read.parquet(f"{path}/centroids").collect()
    cents = [list(r.centroid) for r in sorted(rows, key=lambda r: r.cell)]
    assigned = spark.read.parquet(f"{path}/vectors")
    return cents, assigned


def ivf_query(
    cents: list[list[float]],
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a prebuilt IVF index (from ``ivf_build_index`` or
    ``ivf_load_index``): probe the n_probe nearest cells per query, exact
    cosine on the probed vectors only. The cell filter reaches the scan
    as partition pruning when the index was saved partitionBy(cell)."""
    n_cells = len(cents)

    def cell_scores(col):
        v = col.cast("array<double>")
        return F.array(*[
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in c]),
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            for c in cents
        ])

    def top_cells(col, n):
        scores = cell_scores(col)
        idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
        pairs = F.zip_with(scores, idx,
                           lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        return F.transform(
            F.slice(F.reverse(F.array_sort(pairs)), 1, n), lambda p: p["i"]
        )

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_emb"),
    ).withColumn("cells", top_cells(F.col("q_emb"), n_probe))
    q_cells = q.select("query_id", "q_emb",
                       F.explode("cells").alias("cell"))
    scored = assigned.join(F.broadcast(q_cells), "cell").select(
        "query_id", "vec_id",
        F.round(cosine_col(F.col("v_emb"), F.col("q_emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k)
