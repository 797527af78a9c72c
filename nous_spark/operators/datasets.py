"""Training-set assembly operators: deterministic splits, shard packing,
and source-mixture rebalancing.

These sit downstream of the curation funnel (curation.py): once a corpus
is cleaned, a training pipeline still has to (a) carve out train/val/test
splits that are stable under re-runs and repartitioning, (b) pack
documents into fixed-token-budget shards for the data loader, and (c)
resample sources toward a target mixture (e.g. 60% web / 30% code /
10% reference). All three are pure Catalyst column expressions or
partitioned window aggregations — no UDFs, no driver loops.

Determinism contract: every random-looking decision is keyed on
``md5(content key)`` so the same row lands in the same split/sample on
every run, on any cluster layout, at any parallelism. At 100 TB swap
``F.md5`` for ``F.xxhash64`` (cheaper, same stability) — md5 is used here
so the DuckDB oracle can run the byte-identical chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 60-bit bucket hash: conv(first 15 hex chars of md5, 16, 10). Fits a
# signed long; DuckDB twin is ('0x' || substr(md5(x),1,15))::UBIGINT.
_PPM = 1_000_000


def _hash_ppm(col, salt: str):
    """Deterministic per-row draw in [0, 1e6): md5-bucket the salted key.

    The salt namespaces independent decisions (split vs sample) so they
    are uncorrelated even on the same key column.
    """
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), col)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(_PPM))


def split_dataset(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign each row a deterministic split label ('train'/'val'/...).

    ``weights`` maps split name -> share (must sum to ~1; the last split
    absorbs rounding). Assignment is content-keyed (hash of ``id_col``),
    so it is stable under re-runs, repartitioning, and row order — the
    property a partition-index-based randomSplit does NOT have. Zero
    shuffle: one projection over the scan.

    100 TB: each row is one md5 + one comparison chain; splits can be
    written out with partitionBy("split") so the loader prunes files.
    """
    names = list(weights)
    if not names:
        raise ValueError("weights must name at least one split")
    # integer ppm thresholds; last split takes the remainder to 1e6
    cum, bounds = 0, []
    for name in names[:-1]:
        cum += int(round(weights[name] * _PPM))
        bounds.append((name, cum))
    draw = _hash_ppm(F.col(id_col).cast("string"), salt)
    expr = F.lit(names[-1])
    for name, bound in reversed(bounds):
        expr = F.when(draw < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def pack_into_shards(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    partition_col: str | list[str] | None = "source",
) -> DataFrame:
    """Assign each document a shard id by cumulative token offset.

    Within each ``partition_col`` group, documents are laid out in
    ``order_col`` order and ``shard_id = floor(offset / budget)`` where
    ``offset`` is the token count of everything before the document. A
    document whose span crosses a budget boundary belongs to the shard it
    starts in, so a shard may exceed the budget by at most one document —
    the standard contract for sequence-packing writers (the loader packs
    greedily and lets the final sequence of a shard truncate).

    One partitioned window aggregation: shuffles once on
    ``partition_col`` and sorts within partitions — no global sort, so
    the plan parallelizes across sources. With ``partition_col=None`` the
    window is global (single-task sort): correct, but only for small
    frames — at 100 TB always pack per source/date bucket.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if partition_col is None:
        w = Window.orderBy(order_col)
    else:
        parts = [partition_col] if isinstance(partition_col, str) \
            else list(partition_col)
        w = Window.partitionBy(*parts).orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(F.col(token_col)).over(w).cast("long")
    offset = (cum - F.col(token_col)).cast("long")
    return (
        df.withColumn("token_offset", offset)
        .withColumn(
            "shard_id", F.floor(offset / F.lit(budget_tokens)).cast("long")
        )
    )


def mixture_sample(
    df: DataFrame,
    target_shares_ppm: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Downsample sources toward a target mixture, deterministically.

    ``target_shares_ppm`` maps source value -> target share in parts per
    million (integers, summing to <= 1e6; exact integers keep the Spark
    plan and the SQL oracle bit-identical — no float thresholds).
    Sources absent from the map are dropped.

    The largest feasible output size ``T`` keeps every source at or
    below its available count: ``T = min_s floor(n_s * 1e6 / share_s)``.
    Each source then accepts rows whose content-keyed draw falls under
    ``thr_s = floor(share_s * T / n_s)`` per million — i.e. sampling is a
    pure filter keyed on md5(id), reproducible on any cluster.

    Plan shape: one groupBy(source) count (tiny — one row per source),
    broadcast back as a literal-free join, then a column filter. The
    count aggregate is the only shuffle, and it is map-side combined.
    Expected output share of source s is share_s/sum(shares) with
    per-source error < 1/1e6 + sampling noise.
    """
    if not target_shares_ppm:
        raise ValueError("target_shares_ppm must name at least one source")
    shares = F.create_map(
        *[x for k, v in sorted(target_shares_ppm.items())
          for x in (F.lit(k), F.lit(int(v)))]
    )
    counts = (
        df.filter(F.col(source_col).isin(*target_shares_ppm))
        .groupBy(source_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__share", shares[F.col(source_col)])
        .withColumn(
            # decimal product: bigint n * 1e6 wraps silently past ~9.2e12
            # rows (see token_budget_plan — same ppm-arithmetic hazard)
            "__t_cap",
            F.floor(F.col("__n").cast("decimal(38,0)") * F.lit(_PPM)
                    / F.col("__share")).cast("decimal(38,0)"),
        )
    )
    # T = min cap over sources; keep the per-source rows via a windowless
    # cross-join against the 1-row min aggregate (broadcast, no shuffle)
    t_total = counts.agg(F.min("__t_cap").alias("__t"))
    rates = (
        counts.crossJoin(F.broadcast(t_total))
        .withColumn(
            "accept_ppm",
            F.floor(F.col("__share").cast("decimal(38,0)") * F.col("__t")
                    / F.col("__n"))
            .cast("long"),
        )
        .select(source_col, "accept_ppm")
    )
    draw = _hash_ppm(F.col(id_col).cast("string"), salt)
    return (
        df.withColumn("__draw", draw)
        .join(F.broadcast(rates), source_col)
        .filter(F.col("__draw") < F.col("accept_ppm"))
        .drop("__draw", "accept_ppm")
    )


def prepare_training_set(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_dup_line_frac: float = 0.5,
    max_top_bigram_frac: float = 0.5,
    near_dup_pairs: DataFrame | None = None,
    split_weights: dict[str, float] | None = None,
    budget_tokens: int = 1_000_000,
    salt: str = "split-v1",
) -> DataFrame:
    """The full corpus-to-training-set path as one composition:
    curation funnel (lang/quality/repetition filters + exact and
    near-dup keepers) → PII masking → deterministic split assignment →
    token-budget shard packing per (source, split).

    This is the operator a user actually runs end-to-end: everything
    upstream is the individually-gated pieces (``clean_corpus``,
    ``mask_pii``, ``split_dataset``, ``pack_into_shards``) composed in
    the order a 100 TB run wants — filters and dedup shrink the corpus
    BEFORE the masking regexes touch any text, the split label is a
    zero-shuffle projection, and packing is the only window (partitioned
    by (source, split), so shards never mix splits and the window
    parallelizes across both). Token counts are of the MASKED text —
    what the loader will actually tokenize.

    Emits one row per kept doc: (id, source, split, masked, n_pii,
    n_tokens, token_offset, shard_id).
    """
    from nous_spark.operators.curation import clean_corpus, mask_pii

    kept = clean_corpus(
        docs, text_col=text_col, id_col=id_col, langs=langs,
        min_tokens=min_tokens, max_dup_line_frac=max_dup_line_frac,
        max_top_bigram_frac=max_top_bigram_frac,
        near_dup_pairs=near_dup_pairs,
    )
    masked = mask_pii(kept, text_col)
    mtoks = F.filter(F.split(F.trim(F.col("masked")), r"\s+"),
                     lambda x: F.length(x) > 0)
    counted = masked.withColumn("n_tokens", F.size(mtoks).cast("long"))
    labeled = split_dataset(
        counted, split_weights or {"train": 0.9, "val": 0.05, "test": 0.05},
        id_col=id_col, salt=salt,
    )
    packed = pack_into_shards(
        labeled, budget_tokens, token_col="n_tokens", order_col=id_col,
        partition_col=[source_col, "split"],
    )
    return packed.select(
        id_col, source_col, "split", "masked", "n_pii", "n_tokens",
        "token_offset", "shard_id",
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Diff two corpus snapshots for dataset versioning: every doc id is
    labeled ``added`` (only in new), ``removed`` (only in old),
    ``changed`` (both, content hash differs) or ``unchanged`` — the
    audit table behind "what moved between v1 and v2 of the training
    set" and the input to incremental re-processing (re-extract only
    added+changed).

    One full-outer join keyed on the id, comparing md5 content hashes —
    document text never shuffles, so the diff of two 100 TB snapshots
    moves only (id, 32-byte hash) pairs. Emits (id, status, old_hash,
    new_hash).
    """
    o = old.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("old_hash")
    )
    n = new.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("new_hash")
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("id", status.alias("status"), "old_hash", "new_hash")


def token_budget_plan(
    df: DataFrame,
    target_shares_ppm: dict[str, int],
    token_budget: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Solve a TOKEN-budget data-mixing plan: given per-source token
    inventories and target token shares, emit the per-source sampling
    plan a training run publishes before materializing anything — the
    static-weights step of standard mixture tuning (the weights
    themselves come from upstream, e.g. a DoReMi-style proxy run or a
    hand-set recipe; this operator turns weights + a budget into
    feasible, reproducible accept rates).

    Feasibility: a source cannot contribute more tokens than it has, so
    the realized budget is ``B = min(token_budget, min_s floor(avail_s *
    1e6 / share_s))`` — the binding source (or the requested budget)
    caps the whole mixture, preserving the SHARES rather than silently
    skewing toward abundant sources. All arithmetic is integer, with
    the two ppm PRODUCTS computed in decimal(38,0): avail * 1e6 wraps
    silently in (non-ANSI) bigint once a source holds > ~9.2e12 tokens
    — squarely below the 100 TB design point — and a wrapped __b_cap
    corrupts B and every accept_ppm downstream. Decimal keeps the plan
    and the DuckDB oracle (int128 there) bit-identical at any scale.

    Emits one row per target source: (source, available_tokens,
    target_share_ppm, target_tokens, accept_ppm, binding). ``binding``
    marks the constraint that set B. ``accept_ppm`` feeds
    ``sample_token_budget`` (or any md5-keyed Bernoulli filter):
    accepting docs with draw < accept_ppm yields expected accepted
    tokens = available * accept_ppm / 1e6 ≈ target_tokens, because the
    draw is keyed on the doc id, independent of doc length.

    Plan shape: one groupBy(source) sum (tiny — a row per source), one
    1-row min aggregate broadcast back. Nothing scales with the corpus
    except the first sum scan.
    """
    if not target_shares_ppm:
        raise ValueError("target_shares_ppm must name at least one source")
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    shares = F.create_map(
        *[x for k, v in sorted(target_shares_ppm.items())
          for x in (F.lit(k), F.lit(int(v)))]
    )
    inv = (
        df.filter(F.col(source_col).isin(*target_shares_ppm))
        .groupBy(source_col)
        .agg(F.sum(token_col).cast("long").alias("available_tokens"))
        .withColumn("target_share_ppm",
                    shares[F.col(source_col)].cast("long"))
        .withColumn(
            "__b_cap",
            F.floor(F.col("available_tokens").cast("decimal(38,0)")
                    * F.lit(_PPM) / F.col("target_share_ppm"))
            .cast("decimal(38,0)"),
        )
    )
    b = inv.agg(
        F.least(F.min("__b_cap"),
                F.lit(int(token_budget)).cast("decimal(38,0)"))
        .alias("__b")
    )
    return (
        inv.crossJoin(F.broadcast(b))
        .withColumn(
            "target_tokens",
            F.floor(F.col("__b") * F.col("target_share_ppm") / F.lit(_PPM))
            .cast("long"),
        )
        .withColumn(
            "accept_ppm",
            F.least(
                F.floor(F.col("target_tokens").cast("decimal(38,0)")
                        * F.lit(_PPM) / F.col("available_tokens")),
                F.lit(_PPM).cast("decimal(38,0)"),
            ).cast("long"),
        )
        .withColumn("binding", F.col("__b_cap") == F.col("__b"))
        .select(source_col, "available_tokens", "target_share_ppm",
                "target_tokens", "accept_ppm", "binding")
    )


def sample_token_budget(
    df: DataFrame,
    target_shares_ppm: dict[str, int],
    token_budget: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "tokmix-v1",
) -> DataFrame:
    """Apply a ``token_budget_plan``: keep rows whose md5-keyed draw
    falls under their source's accept rate — a pure filter, reproducible
    on any cluster layout, expected accepted tokens per source ≈ the
    plan's ``target_tokens``. Sources absent from the plan are dropped.
    """
    plan = token_budget_plan(
        df, target_shares_ppm, token_budget, source_col, token_col
    ).select(source_col, "accept_ppm")
    draw = _hash_ppm(F.col(id_col).cast("string"), salt)
    return (
        df.withColumn("__draw", draw)
        .join(F.broadcast(plan), source_col)
        .filter(F.col("__draw") < F.col("accept_ppm"))
        .drop("__draw", "accept_ppm")
    )
