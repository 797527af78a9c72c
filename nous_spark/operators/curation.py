"""End-to-end training-corpus curation as ONE declarative plan.

Composes the individually-gated signals (language ID, quality scores,
Gopher repetition fractions, exact-dedup keeper, near-dup cluster keeper)
into a single keep/drop decision per document — the standard cleaning
funnel in front of LLM pretraining (filter → dedup → near-dedup).

Everything stays a Catalyst plan: the scalar signals are pure column
expressions computed in the SAME scan (no second pass over the text),
and the two dedup stages are the existing groupBy / connected-components
operators joined back by key. Plan shape (audited): the keeper
group-and-join references the filtered subtree on both sides — the
standard shape for a self-aggregation join (a per-hash window would be
one scan but lands whole duplicate groups in single tasks; wrong at web
scale) — so by default the filtered-survivor frame is materialized once
(localCheckpoint) and every dedup arm reads the checkpointed blocks
instead of re-running the regex-heavy signal subtree per arm
(``materialize=False`` restores the fully-lazy single plan for callers
composing the funnel into a larger one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_dup_line_frac: float = 0.5,
    max_top_bigram_frac: float = 0.5,
    near_dup_pairs: DataFrame | None = None,
    min_quality_prob: float | None = None,
    quality_weights: tuple[float, ...] | None = None,
    quality_bias: float | None = None,
    materialize: bool = True,
    min_parallelism: int | str | None = "auto",
) -> DataFrame:
    """Return the KEPT documents (original columns) plus a ``keep_reason``
    trail of which filters passed; dropped docs are simply absent.

    Stages, in the order a 100 TB run wants them (cheap column filters
    first so the shuffle stages see only survivors):

    1. language: ``language_id`` prediction must be in ``langs``
    2. quality: ``min_tokens`` whitespace tokens or more
    3. repetition: Gopher dup-line and top-bigram fractions under caps
    3b. model quality (optional, ``min_quality_prob``): the broadcast
        linear classifier (``model_quality_scores`` — literal-weight
        dot product, still a column filter in the SAME scan) must score
        the doc at or above the threshold
    4. exact dedup: keep only each text_hash group's min-id row
    5. near-dup (optional): given a candidate PAIR frame (a, b) — from
       MinHash/SimHash/embedding candidates — keep each connected
       component's min-id representative AMONG THE FILTER SURVIVORS.
       The keeper is recomputed over the rows that reached this stage
       (components joined to the filtered frame, min surviving id per
       component), so a cluster whose global min-id member was already
       dropped by language/quality/exact-dedup still keeps exactly one
       representative — the component never silently vanishes.
    """
    from nous_spark.operators.dedup import near_duplicate_clusters
    from nous_spark.operators.textstats import (
        DEFAULT_QUALITY_BIAS,
        DEFAULT_QUALITY_WEIGHTS,
        language_id,
        quality_logit_expr,
        quality_scores,
        repetition_scores,
        token_counts,
    )

    base_cols = docs.columns
    # the per-doc signal expressions are regex-heavy (ms per document);
    # a small parquet input arrives as 1-2 scan partitions and would run
    # them single-core (measured: 16 s single-partition vs ~1 s spread at
    # sf0.1). Spread BELOW-parallelism inputs once, before the signal
    # scan; a web-scale input already has >= cluster-parallelism
    # partitions, so this is a no-op there and costs nothing
    # (checkpoint, not just repartition: Catalyst pushes projections
    # below a round-robin exchange, so a bare repartition still runs
    # the signal expressions in the pre-shuffle single task — measured
    # 19 s vs 3 s at sf0.1; _spread pins the barrier and probes the
    # partition count via inputFiles(), never an RDD conversion)
    from nous_spark.operators.dedup import _spread
    docs = _spread(docs, min_parallelism)
    src = quality_scores(docs, text_col) if min_quality_prob is not None \
        else docs
    d = token_counts(
        repetition_scores(language_id(src, text_col), text_col), text_col
    )
    keep_cond = (
        F.col("lang_pred").isin(*langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    if min_quality_prob is not None:
        z = quality_logit_expr(
            quality_weights or DEFAULT_QUALITY_WEIGHTS,
            DEFAULT_QUALITY_BIAS if quality_bias is None else quality_bias,
        )
        prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        keep_cond = keep_cond & (prob >= F.lit(float(min_quality_prob)))
    kept = d.filter(keep_cond)
    # the filtered-survivor frame feeds every dedup arm below (keeper
    # aggregation, keeper join, near-dup survivor join, final anti-join)
    # — without a barrier Catalyst re-executes the regex-heavy signal
    # subtree once PER ARM (audited: 6 source scans / 16 Exchanges on
    # the gate). Materializing survivors once turns that into one
    # signal pass + block reads; set materialize=False to keep the
    # fully-lazy plan for composition into a larger one
    if materialize:
        kept = kept.localCheckpoint(eager=True)

    # exact dedup: min-id keeper per md5(text), survivors only — a
    # window would single-task giant duplicate groups; the groupBy+join
    # form shuffles once on the hash and keeps the plan skew-safe
    kept = kept.withColumn("__th", F.md5(F.col(text_col)))
    keepers = kept.groupBy("__th").agg(F.min(id_col).alias("__keep_id"))
    kept = (
        kept.join(keepers, "__th")
        .filter(F.col(id_col) == F.col("__keep_id"))
        .drop("__th", "__keep_id")
    )

    if near_dup_pairs is not None and materialize:
        # same reasoning one stage later: the exact-dedup join feeds the
        # near-dup survivor join AND the main anti-join path
        kept = kept.localCheckpoint(eager=True)
    if near_dup_pairs is not None:
        # keeper_id from near_duplicate_clusters is the component label
        # (global min id); re-pick the keeper among rows that SURVIVED
        # the upstream filters so every component keeps one survivor.
        comp = near_duplicate_clusters(near_dup_pairs)
        surv = comp.join(
            kept.select(F.col(id_col).alias("id")), "id"
        )
        surv_keep = surv.groupBy("keeper_id").agg(
            F.min("id").alias("__nd_keep")
        )
        drops = (
            surv.join(surv_keep, "keeper_id")
            .filter(F.col("id") != F.col("__nd_keep"))
            .select(F.col("id").alias("__drop_id"))
        )
        kept = kept.join(
            drops, kept[id_col] == F.col("__drop_id"), "left_anti"
        )

    return kept.select(
        *base_cols,
        F.concat_ws(
            "+",
            F.lit("lang"), F.lit("quality"), F.lit("repetition"),
            *( [F.lit("model_quality")] if min_quality_prob is not None
               else [] ),
            F.lit("exact_keeper"),
            *( [F.lit("near_dup_keeper")] if near_dup_pairs is not None else [] ),
        ).alias("keep_reason"),
    )


_TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid)="


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL canonicalization for crawl dedup: two crawls of the same page
    usually differ only in case, fragment, default port, or tracking
    params — normalizing BEFORE url-level dedup collapses them without
    touching content.

    Steps (all column expressions): strip the #fragment; lowercase the
    scheme://host head (path/query case is significant and preserved);
    drop the DEFAULT port only — :80 for http and :443 for https
    (https://host:80 is a different resource and is preserved); rebuild
    the query string with
    utm_*/fbclid/gclid params filtered out via split + array filter
    (regex-replace chains mis-handle consecutive params — the array form
    is exact for any count). Scheme-less strings pass through minus
    fragment/tracking only. Emits ``url_norm``."""
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    head = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    rest = F.substring(u, F.length(head) + 1, 1 << 30)
    head = F.lower(head)
    head = (
        F.when(head.startswith("http://"),
               F.regexp_replace(head, ":80$", ""))
        .when(head.startswith("https://"),
              F.regexp_replace(head, ":443$", ""))
        .otherwise(head)
    )
    u2 = F.concat(head, rest)
    base = F.substring_index(u2, "?", 1)
    qs = F.substring(u2, F.instr(u2, "?") + 1, 1 << 30)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(_TRACKING_PARAM_RE),
    )
    rebuilt = F.when(
        (F.instr(u2, "?") > 0) & (F.size(params) > 0),
        F.concat(base, F.lit("?"), F.array_join(params, "&")),
    ).otherwise(base)
    return df.withColumn("url_norm", rebuilt)


def corpus_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source corpus health report — the dashboard table a curation
    run publishes next to its outputs: volume, mean quality signals,
    language mix, and exact-duplicate rate per origin (crawl, dump,
    partner feed, ...). One scan computes every scalar signal; the whole
    report is a single groupBy shuffle on the source key.

    Emits per group: ``n_docs``, ``n_chars_total``, ``mean_tokens``,
    ``mean_top_bigram_frac``, ``pct_en``, ``dup_rate`` (1 − distinct
    hashes / docs — the fraction of rows that are redundant copies)."""
    from nous_spark.operators.textstats import (
        language_id,
        repetition_scores,
        token_counts,
    )

    d = token_counts(
        repetition_scores(language_id(df, text_col), text_col), text_col
    ).withColumn("__th", F.md5(F.col(text_col)))
    return (
        d.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(text_col)).alias("n_chars_total"),
            F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
            # exact interpolated percentiles (Spark percentile ==
            # DuckDB quantile_cont; cross-checked) — the doc-length
            # DISTRIBUTION catches truncation/boilerplate regressions
            # a mean hides. Exact-with-sort per group; at extreme group
            # sizes swap for percentile_approx and drop the oracle match
            F.round(F.percentile("n_tokens", F.lit(0.5)), 6)
            .alias("p50_tokens"),
            F.round(F.percentile("n_tokens", F.lit(0.95)), 6)
            .alias("p95_tokens"),
            F.round(F.avg("top_bigram_frac"), 6).alias("mean_top_bigram_frac"),
            F.round(
                F.avg(F.when(F.col("lang_pred") == "en", 1.0).otherwise(0.0)),
                6,
            ).alias("pct_en"),
            F.round(
                1.0 - F.count_distinct("__th") / F.count("*").cast("double"),
                6,
            ).alias("dup_rate"),
        )
    )


_PII_PATTERNS = [
    # order matters: longer/more-specific first so a credit card is not
    # half-eaten by the phone pattern. Patterns avoid lookarounds so the
    # same regex runs identically on Java (Spark) and RE2 (DuckDB).
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    # optional '+' sits OUTSIDE the word boundary: \b\+? can never
    # consume a '+' after whitespace (both sides non-word), which left
    # '+1 (555) ...' masked as '+<PII:phone>' with a dangling plus
    ("phone", r"\+?\b\d{1,2}[- ]\(?\d{3}\)?[- ]\d{3}[- ]\d{4}\b"),
]


def mask_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII masking for training corpora: emails, credit-card/SSN-shaped
    numbers, IPv4 addresses and phone numbers are replaced with typed
    sentinels (``<PII:email>`` etc.) — the standard pre-release scrub so
    a model cannot memorize contact data verbatim.

    Pure chained ``regexp_replace`` column expressions (JVM regex, one
    scan, no UDF); patterns are lookaround-free so the DuckDB oracle
    runs the byte-identical chain. Emits ``masked`` plus ``n_pii`` (total
    sentinels inserted), so a pipeline can also FILTER on PII density
    rather than mask (docs that are mostly PII are usually directories —
    drop, don't scrub)."""
    masked = F.col(text_col)
    for kind, pat in _PII_PATTERNS:
        masked = F.regexp_replace(masked, pat, f"<PII:{kind}>")
    out = df.withColumn("masked", masked)
    return out.withColumn(
        "n_pii", F.regexp_count(F.col("masked"), F.lit(r"<PII:[a-z0-9]+>"))
        .cast("long"),
    )


def clean_corpus_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_dup_line_frac: float = 0.5,
    max_top_bigram_frac: float = 0.5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The curation funnel on a document STREAM (a live crawl): the
    scalar signals are stateless column expressions — literally the same
    Catalyst code as the batch form, applied per microbatch — and exact
    dedup becomes first-arrival-wins state via
    ``dropDuplicatesWithinWatermark`` on the content hash (hash-only
    state, evicted by the watermark; the batch min-id keeper is
    meaningless on an unbounded stream, so survivor identity is
    arrival-order defined — downstream consumers key on ``text_hash``).
    Near-dup streaming composes downstream via
    ``streaming_minhash_candidates``.
    """
    from nous_spark.operators.textstats import (
        language_id,
        repetition_scores,
        token_counts,
    )

    d = token_counts(
        repetition_scores(language_id(stream, text_col), text_col), text_col
    )
    kept = d.filter(
        F.col("lang_pred").isin(*langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    return (
        kept.withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
