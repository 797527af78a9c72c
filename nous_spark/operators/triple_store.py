"""Incremental triple store: the materialize-side payoff of the
incremental canonical store (operators/canonicalize.py).

The north rule's final stage materializes (subj, pred, obj) triple
tables partitioned by predicate with head-entity salting
(sources/sinks.py:17, SURVEY.md S13). Batch canonicalization makes that
a full rewrite per crawl increment: fold new alias edges, re-resolve,
re-rewrite 10^12 files' triples. This module makes the materialized
table itself incremental, completing the extract → link → canonicalize
→ materialize chain at delta cost:

- ``{path}/triples`` — parquet partitioned by ``(pred, seg)``:
  ``seg=base`` from the build/compaction, ``seg=u<k>`` per update.
  Each segment's rows are canonical AS OF ITS WRITE; segments are
  never edited afterwards.
- ``{path}/patches`` — the rep-supersession log: when an update's
  alias delta merges components or crowns a longer label,
  ``canonicalize.rep_changes`` emits one ``(old_rep -> new_rep)`` row
  per DETHRONED REPRESENTATIVE — bounded by components touched, never
  by their member or triple counts. Readers fold the (path-compressed,
  broadcast) patch chain over subj/obj; a merge therefore costs one
  tiny log write, not a corpus rewrite. The rep rule's monotonicity
  (see ``rep_changes``) makes the chain acyclic and each key
  single-writer, so logs from any number of updates compose.
- ``{path}/canon`` — the canonical store the above derives from.

Idempotency: every update's writes are keyed by ``seg``/``batch``
partition with dynamic overwrite, and the rewrite/patch computation
depends only on the store state EXCLUDING the update's own segments —
a torn attempt (writes landed, caller's commit lost) is replaced
byte-for-byte by the replay, the same contract as the component store
(operators/graph_inc.py:273) and the MinHash index (operators/
dedup.py:779). Compaction folds patches and segments into ``seg=base``
off the read path via sibling-dir + rename swap.

Reference: the NOUS pipeline re-materializes its graph per batch
(Mining/.../DatatoPatternGraph.scala:212-216 drives whole-file
re-reads); there is no incremental store to cite — this is the Spark
re-architecture the 10^12-file scale forces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nous_spark.operators.canonicalize import (
    build_canonical_store,
    rep_changes,
    resolve_canonical_store,
    rewrite_triples,
    update_canonical_store,
)

DEFAULT_SALT_BUCKETS = 16


def _write_segment(triples: DataFrame, path: str, seg: str,
                   salt_buckets: int, dynamic: bool) -> None:
    salted = (
        triples.withColumn(
            "salt",
            F.pmod(F.xxhash64("subj"), F.lit(salt_buckets)).cast("int"))
        .withColumn("seg", F.lit(seg))
    )
    w = (
        salted.repartition(F.col("pred"), F.col("salt"))
        .write.mode("overwrite")
    )
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.partitionBy("pred", "seg").parquet(f"{path}/triples")


def build_triple_store(
    triples: DataFrame,
    alias_edges: DataFrame,
    path: str,
    buckets: int = 64,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> None:
    """Build the store: canonical store from the alias edges, then the
    triples rewritten through the full mapping into ``seg=base``."""
    spark = triples.sparkSession
    build_canonical_store(alias_edges, f"{path}/canon", buckets=buckets)
    mapping = resolve_canonical_store(spark, f"{path}/canon")
    _write_segment(rewrite_triples(triples, mapping), path, "base",
                   salt_buckets, dynamic=False)


def update_triple_store(
    spark: SparkSession,
    new_triples: DataFrame,
    alias_delta: DataFrame,
    path: str,
    update_id: int,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> dict:
    """Fold one increment — new triples plus the alias edges the same
    crawl batch produced — under segment ``u<update_id>``:

    1. the alias delta folds into the canonical store (cost ∝ delta,
       ``update_canonical_store``);
    2. ``rep_changes`` derives the dethroned-rep patch set from the
       update's own log segments (∝ components touched) and writes it
       under ``patches/seg=u<k>`` — this is the ENTIRE cost of the
       merge to the existing corpus;
    3. the new triples rewrite through the post-update mapping, probed
       on their own labels (bucket-pruned read), and land under
       ``seg=u<k>``.

    Replay-safe: all three writes are segment-keyed overwrites derived
    deterministically from pre-update state + the delta."""
    seg = f"u{update_id}"
    cpath = f"{path}/canon"
    stats = update_canonical_store(spark, alias_delta, cpath, update_id)
    patches = rep_changes(spark, cpath, update_id)
    meta = spark.read.parquet(f"{cpath}/cc/meta").collect()[0]
    if patches:
        from nous_spark.localrel import local_df

        (
            local_df(
                spark, sorted(patches.items()),
                schema=f"old {meta.id_type}, new {meta.id_type}")
            .withColumn("seg", F.lit(seg))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("seg")
            .parquet(f"{path}/patches")
        )
    labels = (
        new_triples.select(F.col("subj").alias("id"))
        .unionAll(new_triples.select(F.col("obj").alias("id")))
        .distinct()
    )
    mapping = resolve_canonical_store(spark, cpath, labels=labels)
    _write_segment(rewrite_triples(new_triples, mapping), path, seg,
                   salt_buckets, dynamic=True)
    return {**stats, "n_patches": len(patches)}


def _patch_map(spark: SparkSession, path: str,
               exclude_segs: tuple[str, ...]) -> list[tuple]:
    from nous_spark.operators.graph_inc import (
        _flatten_remap,
        _fs_exists,
    )

    if not _fs_exists(spark, f"{path}/patches"):
        return []
    meta = spark.read.parquet(f"{path}/canon/cc/meta").collect()[0]
    p = spark.read.schema(
        f"old {meta.id_type}, new {meta.id_type}, seg STRING"
    ).parquet(f"{path}/patches")
    if exclude_segs:
        p = p.filter(~F.col("seg").isin(*exclude_segs))
    return _flatten_remap([(r.old, r.new) for r in p.collect()])


def read_triple_store(
    spark: SparkSession,
    path: str,
    preds: list[str] | None = None,
    exclude_segs: tuple[str, ...] = (),
) -> DataFrame:
    """Current canonical view of the store. ``preds`` pushes into the
    partitioned scan (file-level pruning on the ``pred`` dirs); the
    patch chain (tiny by contract) applies as one broadcast join per
    endpoint column. Segment/salt bookkeeping columns are dropped."""
    t = spark.read.parquet(f"{path}/triples")
    if exclude_segs:
        t = t.filter(~F.col("seg").isin(*exclude_segs))
    if preds is not None:
        t = t.filter(F.col("pred").isin(*preds))
    cols = [c for c in t.columns if c not in ("seg", "salt")]
    t = t.select(cols)
    flat = _patch_map(spark, path, exclude_segs)
    if not flat:
        return t
    from nous_spark.localrel import local_df

    typ = dict(t.dtypes)["subj"]
    rmap = local_df(spark, flat, schema=f"old {typ}, new {typ}")
    for col in ("subj", "obj"):
        m = F.broadcast(rmap.select(F.col("old").alias(col),
                                    F.col("new").alias(f"__p_{col}")))
        t = (
            t.join(m, col, "left")
            .withColumn(col, F.coalesce(f"__p_{col}", F.col(col)))
            .drop(f"__p_{col}")
        )
    return t.select(cols)


def compact_triple_store(
    spark: SparkSession,
    path: str,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> dict:
    """Fold every segment, with patches applied, into ``seg=base`` via
    a sibling temp dir + rename swap (the live table survives a
    mid-rewrite crash), then drop the patch log. A crash between the
    swap and the patch-log delete is harmless: re-applying a patch to
    an already-patched table is a no-op (the superseded labels are no
    longer present), and the next compaction removes the log. The
    canonical store compacts separately (``compact_canonical_store``) —
    its remap log is still needed by future ``rep_changes`` calls only
    for their own segments, so either order is safe."""
    full = read_triple_store(spark, path)
    n_files_before = len(spark.read.parquet(f"{path}/triples").inputFiles())
    salted = (
        full.withColumn(
            "salt",
            F.pmod(F.xxhash64("subj"), F.lit(salt_buckets)).cast("int"))
        .withColumn("seg", F.lit("base"))
    )
    (
        salted.repartition(F.col("pred"), F.col("salt"))
        .write.mode("overwrite").partitionBy("pred", "seg")
        .parquet(f"{path}/triples_compact_tmp")
    )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def swap(tmp: str, live: str) -> None:
        p_live = jvm.org.apache.hadoop.fs.Path(live)
        p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
        fs = p_live.getFileSystem(conf)
        fs.delete(p_live, True)
        if not fs.rename(p_tmp, p_live):
            raise IOError(f"compaction swap failed: {tmp} -> {live}")

    swap(f"{path}/triples_compact_tmp", f"{path}/triples")
    p_patches = jvm.org.apache.hadoop.fs.Path(f"{path}/patches")
    p_patches.getFileSystem(conf).delete(p_patches, True)
    n_files_after = len(spark.read.parquet(f"{path}/triples").inputFiles())
    return {"files_before": n_files_before, "files_after": n_files_after}
