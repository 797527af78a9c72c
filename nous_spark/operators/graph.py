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


def pagerank(
    edges: DataFrame,
    reset_prob: float = 0.15,
    max_iter: int = 10,
    tol: float | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """G6 (PathFeatureGenerator.savePageRank, PathFeatureGenerator.scala:98-121):
    PageRank as a bounded driver loop of join+agg rounds (GraphX semantics:
    rank = resetProb + (1-resetProb) · Σ in-rank/out-degree; dangling mass
    is not redistributed, matching GraphX's pageRank).

    Each round: one join (ranks ⋈ out-edges) + one aggregation; lineage is
    truncated per round. Returns (id, rank)."""
    e = edges.select(F.col(src).alias("from"), F.col(dst).alias("to"))
    out_deg = e.groupBy("from").agg(F.count("*").alias("out_deg"))
    vertices = (
        e.select(F.col("from").alias("id"))
        .unionAll(e.select(F.col("to").alias("id")))
        .distinct()
        .persist()
    )
    ranks = vertices.withColumn("rank", F.lit(1.0))
    for _ in range(max_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("id", "from"), "from")
            .join(out_deg, "from")
            .select(
                F.col("to").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        new_ranks = (
            vertices.join(contribs, "id", "left")
            .select(
                "id",
                (F.lit(reset_prob)
                 + F.lit(1 - reset_prob) * F.coalesce("in_sum", F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.alias("n").join(ranks.alias("o"), "id")
                .select(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .collect()[0].d
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    vertices.unpersist()
    return ranks


def dictionary_encode(
    df: DataFrame, cols: list[str], start_id: int = 0
) -> tuple[DataFrame, DataFrame]:
    """J10 (Mining/scripts/getIntGraph.py:22-55 — offline in the reference):
    label → dense int id. Returns (encoded_df, dictionary(label, id)).

    Dense ids = global rank of the label in sorted order — deterministic and
    resume-stable — but computed WITHOUT a global single-partition window:
    distinct labels are range-partitioned by label, each partition numbers
    its rows locally, and tiny per-partition counts (one row per partition)
    are cumsum'd on the driver into offsets. Identical ids to
    ``row_number().over(Window.orderBy(label))`` at any scale, with no
    single-task sort of the whole dictionary."""
    from pyspark.sql import Window

    labels = df.select(F.col(cols[0]).alias("label"))
    for c in cols[1:]:
        labels = labels.unionAll(df.select(F.col(c).alias("label")))
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        labels.distinct()
        .repartitionByRange(n_parts, "label")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    # one row per partition — safe to collect at any dictionary size
    part_counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in range(max(part_counts, default=-1) + 1):
        offsets.append((pid, acc))
        acc += part_counts.get(pid, 0)
    offsets_df = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], ["__pid", "__offset"])
    )
    local_w = Window.partitionBy("__pid").orderBy("label")
    dictionary = (
        ranged.withColumn("__rn", F.row_number().over(local_w))
        .join(offsets_df, "__pid")
        .select(
            "label",
            (F.col("__rn") + F.col("__offset") + F.lit(start_id - 1)).alias("id"),
        )
    )
    # materialize the dictionary (its storage is tied to the returned
    # frame's lifetime) so the cached distinct-label table can be released
    # now instead of leaking for the life of the session
    dictionary = dictionary.localCheckpoint(eager=True)
    ranged.unpersist()
    out = df
    for c in cols:
        m = dictionary.select(
            F.col("label").alias(c), F.col("id").alias(f"{c}_id")
        )
        out = out.join(F.broadcast(m), c, "left")
    return out, dictionary


def bin_weights(
    edges: DataFrame, weight_col: str, n_bins: int = 10,
    bin_col: str = "bin",
) -> DataFrame:
    """W6/A14 (binning + min-max normalization,
    DatatoPatternGraph.scala:923-924): normalize ``weight_col`` to [0,1]
    over its global min/max and bucket to ``floor(w·n_bins)`` with the
    top edge clamped into the last bin. Two jobs: one min/max aggregate,
    one map-side projection."""
    stats = edges.agg(
        F.min(weight_col).alias("mn"), F.max(weight_col).alias("mx")
    ).collect()[0]
    span = (stats.mx - stats.mn) or 1.0
    return edges.withColumn(
        bin_col,
        F.least(
            F.floor((F.col(weight_col) - F.lit(stats.mn)) / F.lit(span)
                    * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
    )


def stratified_sample_edges(
    edges: DataFrame, weight_col: str, fractions: dict[int, float] | None = None,
    n_bins: int = 10, seed: int = 42,
) -> DataFrame:
    """G9/W6 (sampleByKey design at DatatoPatternGraph.scala:890-972,
    binning :923-924): normalize a weight column to [0,1], bin to
    floor(w·10), stratified-sample by bin."""
    binned = bin_weights(edges, weight_col, n_bins, bin_col="__bin")
    if fractions is None:
        fractions = {b: max(0.1, (b + 1) / n_bins) for b in range(n_bins)}
    return binned.sampleBy("__bin", fractions, seed).drop("__bin")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """G8: connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — the two-phase algorithm). Pass ``stats={}`` to receive
    ``stats["rounds"]`` — the executed round count (the chain-stress gate
    pins it ~log2(diameter)).

    Returns (id, component) where component = min vertex id reachable.
    Each round rewires the edge set itself (not a label table):

        large-star: every node u hooks its strictly-larger neighbors to
                    m = min(Γ(u) ∪ {u})            — halves long chains
        small-star: every node u hooks its ≤ neighbors (and itself) to
                    m = min(Γ≤(u) ∪ {u})           — flattens local stars

    until the edge set is a fixed point, at which time each component is
    a star centered on its minimum vertex id. This is the proven
    O(log² n)-round (observed ~log₂ diameter) formulation; the previous
    hash-to-min + single-pointer-jump version measured O(diameter) rounds
    on a label-scrambled 2048-path (>200 rounds — the chain-stress test
    caught it), which at 100 TB alias-graph scale is the difference
    between ~12 and ~20 000 shuffles. Works for numeric or string vertex
    ids (min = lexicographic for strings, matching F.min). Lineage is
    truncated every round via localCheckpoint so plans stay bounded.
    """
    # canonical orientation (a > b), self-loops dropped; vertex universe
    # is fixed from the input so star-rewiring can't lose isolated-after-
    # filter vertices
    e0 = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
    )
    verts = (
        e0.select(F.col("x").alias("id"))
        .unionAll(e0.select(F.col("y").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = (
        e0.select(
            F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b")
        )
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )

    # fixed-point detection: a cheap one-row signature scan per round
    # (count + overflow-safe decimal hash-sum — ANSI mode errors on LONG
    # sum overflow); only when signatures collide do the two exact
    # anti-join probes, so the exact set-compare shuffles are paid once,
    # at convergence, not every round
    def _sig(df: DataFrame):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(28,0)")).alias("h"),
        ).first()

    prev_sig = _sig(cur)
    _round = -1
    for _round in range(max_iter):
        # large-star over the symmetric view: m(u) = min(Γ(u) ∪ {u});
        # emit (v, m) for neighbors v > u. No dedup here — duplicate
        # (v, m) rows don't change any min and are collapsed at nxt,
        # saving one (a, b) shuffle per round
        sym = cur.unionAll(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # small-star on the (a > b)-oriented edges: m(u) = min of u's
        # smaller neighbors; emit (v, m) for v ≠ m plus (u, m)
        smins = large.groupBy("a").agg(F.min("b").alias("m"))
        nxt = (
            large.join(smins, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionAll(smins.select(F.col("a"), F.col("m").alias("b")))
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        sig = _sig(nxt)
        if sig == prev_sig:
            # fixed point ⇔ identical canonical edge sets (both distinct,
            # both (a > b)-oriented) — confirm the signature exactly
            changed = (
                nxt.exceptAll(cur).limit(1).count()
                + cur.exceptAll(nxt).limit(1).count()
            )
            cur = nxt
            if changed == 0:
                break
        else:
            cur = nxt
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = _round + 1
    # at the fixed point every non-root vertex has exactly the edge
    # (v, component-min); roots (and any vertex star-rewired away) map to
    # themselves
    return verts.join(
        cur.select(F.col("a").alias("id"), F.col("b").alias("__root")),
        "id",
        "left",
    ).select("id", F.coalesce("__root", "id").alias("component"))
