"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no Python in the hot path): token counting,
quality scoring, language ID (n-gram heuristic), document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# must match the oracle SQL list exactly
STOPWORDS = ["the", "a", "an", "of", "in", "on", "and", "or", "to", "is",
             "was", "for", "with", "that", "it"]


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def _n_tokens(col):
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(_tokens(col))
    ).cast("long")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count (BPE-ish regex count available via
    ``regex_token_counts``)."""
    return df.withColumn("n_tokens", _n_tokens(F.col(text_col)))


def regex_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token count (BPE proxy for training-cost estimation):
    letter runs, digit runs and punctuation runs count as one token each —
    one JVM-side regexp_count, no UDF."""
    return df.withColumn(
        "n_subword_tokens",
        F.regexp_count(
            F.col(text_col), F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
        ).cast("long"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality features,
    rounded to 6dp for cross-engine stability."""
    c = F.col(text_col)
    toks = _tokens(c)
    n = _n_tokens(c)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    non_space_len = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    return (
        df.withColumn("n_chars_obs", F.length(c).cast("long"))
        .withColumn(
            "stopword_ratio",
            F.round(n_stop / F.greatest(n, F.lit(1)).cast("double"), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(non_space_len / F.greatest(n, F.lit(1)).cast("double"), 6),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """S6-style language ID via stopword-profile voting (deterministic
    n-gram/stopword heuristic — no external lib). Emits ``lang_pred``."""
    profiles = {
        "en": ["the", "and", "of", "to", "is", "was", "with"],
        "de": ["der", "die", "und", "das", "ist", "mit", "von"],
        "fr": ["le", "la", "et", "les", "des", "est", "avec"],
        "es": ["el", "la", "los", "las", "es", "con", "por"],
    }
    toks = _tokens(F.lower(F.col(text_col)))

    def member_of(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda x: F.array_contains(arr, x)

    scores = [
        F.size(F.filter(toks, member_of(words))).alias(f"score_{lang}")
        for lang, words in profiles.items()
    ]
    langs = list(profiles)
    df2 = df.select("*", *scores)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for l in langs:
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return df2.withColumn("lang_pred", pred).drop(*[f"score_{l}" for l in langs])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: xxhash64 of the normalized token stream —
    whitespace/case-insensitive rolling-hash analog, JVM-side."""
    norm = F.concat_ws(" ", _tokens(F.lower(F.col(text_col))))
    return df.withColumn("fingerprint", F.xxhash64(norm))


def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals — the standard
    filters for boilerplate/spam in training corpora — as pure column
    expressions (no UDFs):

    - ``dup_line_frac``: fraction of non-empty lines that are repeats of
      an earlier line
    - ``dup_para_frac``: same over blank-line-separated paragraphs
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams (a high value marks mantra-like repetition even when
      no full line repeats)

    The bigram mode count is computed per row inside one ``aggregate``
    over the SORTED bigram-hash array (longest equal run == highest
    multiplicity) — no explode/groupBy shuffle, so the operator stays a
    single scan at any corpus size."""
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0)
    paras = F.filter(F.split(c, r"\n\s*\n"), lambda x: F.length(F.trim(x)) > 0)

    def dup_frac(arr):
        n = F.size(arr)
        return F.when(
            n > 0,
            F.round((n - F.size(F.array_distinct(arr)))
                    / n.cast("double"), 6),
        ).otherwise(F.lit(0.0))

    # _tokens keeps empty tokens from leading/trailing whitespace — drop
    # them so bigrams pair real words only
    toks = F.filter(_tokens(c), lambda x: F.length(x) > 0)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, 2)))
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    acc0 = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    mode_cnt = F.aggregate(
        F.array_sort(grams), acc0, step, lambda acc: acc["best"]
    )
    top_bigram = F.when(
        F.size(grams) > 0,
        F.round(mode_cnt / F.size(grams).cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("dup_line_frac", dup_frac(lines))
        .withColumn("dup_para_frac", dup_frac(paras))
        .withColumn("top_bigram_frac", top_bigram)
    )


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram token entropy per document (nats): H = ln N − (1/N)·Σ c·ln c
    over token multiplicities c. Low entropy marks template/repetitive
    text that the dup-fraction signals can miss (every line distinct but
    drawn from a tiny vocabulary).

    Single pass, no shuffle: one ``aggregate`` over the SORTED token-hash
    array accumulates Σ c·ln c at run boundaries — the token histogram is
    never materialized."""
    c = F.col(text_col)
    toks = F.filter(_tokens(c), lambda x: F.length(x) > 0)
    hashes = F.array_sort(F.transform(toks, lambda t: F.xxhash64(t)))
    n = F.size(hashes)
    acc0 = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0.0).alias("run"),
        F.lit(0.0).alias("s"),
    )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1.0).otherwise(F.lit(1.0))
        closed = F.when(
            same | acc["prev"].isNull(), F.lit(0.0)
        ).otherwise(acc["run"] * F.log(acc["run"]))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            (acc["s"] + closed).alias("s"),
        )

    s = F.aggregate(
        hashes, acc0, step,
        lambda acc: acc["s"] + F.when(
            acc["run"] > 0, acc["run"] * F.log(acc["run"])
        ).otherwise(F.lit(0.0)),
    )
    ent = F.when(
        n > 0, F.round(F.log(n.cast("double")) - s / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return df.withColumn("token_entropy", ent)


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """CCNet-style perplexity proxy: score each document by the average
    log-probability of its tokens under the corpus's own unigram LM —
    the standard cheap quality signal for ranking/filtering pretraining
    text (odd documents score far below the corpus mode).

    Two aggregations, both standard shuffles: (1) token -> count over
    the corpus (the LM), (2) per-doc mean of ln(c_t / total) via an
    explode + join + groupBy. The vocabulary TOTAL is derived inside the
    plan (a broadcast cross-join of the 1-row sum over the count table),
    so the operator stays fully lazy/composable — no eager collect, and
    Spark's ReuseExchange dedupes the shared count aggregation between
    the total and the join side. ``broadcast_vocab`` broadcasts the count
    table into the join (right for vocabularies that fit an executor —
    tens of millions of distinct tokens); at a 100 TB corpus with a
    larger vocabulary set it False and AQE's skew-join handles the
    stop-word keys. Docs with no tokens score 0.0.
    Emits ``avg_logprob`` (<= 0; higher = more typical text)."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = df.select(id_col, toks.alias("__toks"))
    e = base.select(id_col, F.explode("__toks").alias("__tok"))
    counts = e.groupBy("__tok").agg(F.count("*").cast("double").alias("__c"))
    total = counts.agg(
        F.coalesce(F.sum("__c"), F.lit(1.0)).alias("__total")
    )
    lm = counts.crossJoin(F.broadcast(total))
    rhs = F.broadcast(lm) if broadcast_vocab else lm
    scored = (
        e.join(rhs, "__tok")
        .groupBy(id_col)
        .agg(F.avg(F.log(F.col("__c") / F.col("__total"))).alias("__lp"))
    )
    return (
        df.join(scored, id_col, "left")
        .withColumn(
            "avg_logprob",
            F.round(F.coalesce(F.col("__lp"), F.lit(0.0)), 6),
        )
        .drop("__lp")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard packing prep for long documents before tokenization (a
    100k-token file becomes ~1.6k training rows; the overlap keeps
    context across cut points).

    Pure column expressions: one ``sequence`` of window starts, one
    ``transform`` + ``posexplode`` — no UDF, no shuffle; the operator is
    a flatMap-shaped projection that scales with the scan. Emits
    (id, chunk_id, chunk, n_chunk_tokens); docs with no tokens emit no
    rows."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(_tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step)
    )
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s + 1, chunk_tokens)
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(n > 0, chunks).otherwise(
                F.array().cast("array<array<string>>")
            )
        ).alias("chunk_id", "__ct"),
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", "__ct").alias("chunk"),
        F.size("__ct").cast("long").alias("n_chunk_tokens"),
    )


_SUBWORD_RE = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+"


def chunk_documents_subword(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_subwords: int = 64,
) -> DataFrame:
    """Token-AWARE chunking: pack whitespace words into chunks whose size
    tracks MODEL (subword) tokens, not word counts — a 100k-char legal
    doc of long words and a chat log of short ones land chunks of equal
    training cost. The per-word cost is the same BPE-proxy tokenizer as
    ``regex_token_counts`` (letter runs / digit runs / punctuation runs),
    so budgets line up with the corpus-level subword accounting.

    Boundary rule (deterministic, prefix-expressible): word i goes to
    chunk ``floor(subword_cost_before_i / chunk_subwords)`` — chunks fill
    to ~chunk_subwords model tokens, a boundary-straddling word stays
    with its left chunk (cost overshoot < that word's own cost), and
    word order/content is exactly preserved (chunks re-concatenate to
    the whitespace-normalized doc).

    Plan shape: posexplode words -> per-doc running cost (window sum
    partitioned by doc — each task holds one doc's words, no global
    ordering) -> groupBy (doc, chunk). Emits (id, chunk_id, chunk,
    n_chunk_words, n_chunk_subwords)."""
    from pyspark.sql.window import Window

    words = F.filter(_tokens(F.trim(F.col(text_col))),
                     lambda x: F.length(x) > 0)
    e = df.select(F.col(id_col), F.posexplode(words).alias("pos", "w"))
    e = e.withColumn(
        "__cost", F.regexp_count(F.col("w"), F.lit(_SUBWORD_RE)).cast("long")
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn(
        "__pre", F.coalesce(F.sum("__cost").over(win), F.lit(0))
    ).withColumn(
        "chunk_id",
        F.floor(F.col("__pre") / F.lit(chunk_subwords)).cast("long"),
    )
    return (
        e.groupBy(id_col, "chunk_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "w"))
                    ),
                    lambda s: s["w"],
                ),
            ).alias("chunk"),
            F.count("*").alias("n_chunk_words"),
            F.sum("__cost").alias("n_chunk_subwords"),
        )
    )


# CCNet-style second stage: a tiny broadcast linear model over the scalar
# quality signals. Weights are LITERALS compiled into the plan (the model
# is a handful of floats — never a join), so scoring stays one scan of
# whole-stage-codegen column arithmetic. Feature order is part of the
# contract; all ratio features are the 6dp-rounded columns the individual
# operators emit, so the model scores exactly what the gates verify.
QUALITY_MODEL_FEATURES = (
    "log1p_tokens",        # ln(1 + n_tokens)
    "stopword_ratio",
    "mean_token_len",
    "dup_line_frac",
    "top_bigram_frac",
)
DEFAULT_QUALITY_WEIGHTS = (0.35, 2.0, -0.15, -3.0, -4.0)
DEFAULT_QUALITY_BIAS = -1.0


def model_quality_scores(
    df: DataFrame,
    text_col: str = "text",
    weights: tuple[float, ...] = DEFAULT_QUALITY_WEIGHTS,
    bias: float = DEFAULT_QUALITY_BIAS,
) -> DataFrame:
    """Model-based quality scoring: logistic regression over the
    repo's own quality signals (the fastText/CCNet second stage next to
    ``unigram_logprob_scores``) as a pure column dot product — weights
    land in the plan as literals, so there is no UDF, no join, no
    broadcast table, and the score costs one scan.

    Emits ``quality_logit`` (w·x + b) and ``quality_prob``
    (sigmoid, rounded 6dp). Train the weights offline however you like;
    the engine only needs the float vector."""
    base_cols = df.columns
    d = token_counts(
        repetition_scores(quality_scores(df, text_col), text_col), text_col
    )
    z = quality_logit_expr(weights, bias)
    return d.select(
        *base_cols,
        z.alias("quality_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        .alias("quality_prob"),
    )


def quality_logit_expr(
    weights: tuple[float, ...] = DEFAULT_QUALITY_WEIGHTS,
    bias: float = DEFAULT_QUALITY_BIAS,
):
    """The linear-model logit as a reusable column expression over the
    signal columns (``n_tokens``, ``stopword_ratio``, ``mean_token_len``,
    ``dup_line_frac``, ``top_bigram_frac`` must already be present).
    Left-associated literal arithmetic, so an oracle writing the same
    order is bit-identical."""
    if len(weights) != len(QUALITY_MODEL_FEATURES):
        raise ValueError(
            f"expected {len(QUALITY_MODEL_FEATURES)} weights "
            f"(order {QUALITY_MODEL_FEATURES}), got {len(weights)}"
        )
    feats = {
        "log1p_tokens": F.log1p(F.col("n_tokens").cast("double")),
        "stopword_ratio": F.col("stopword_ratio"),
        "mean_token_len": F.col("mean_token_len"),
        "dup_line_frac": F.col("dup_line_frac"),
        "top_bigram_frac": F.col("top_bigram_frac"),
    }
    z = F.lit(float(bias))
    for w, name in zip(weights, QUALITY_MODEL_FEATURES):
        z = z + F.lit(float(w)) * feats[name]
    return z


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords — the cheap per-doc topical
    summary used for corpus exploration, domain tagging, and as blocking
    keys for topical dedup.

    tf is the in-doc term count, idf = ln(N / df) over the corpus (plain
    log ratio: corpus-wide terms score ~0 and drop out of the top-k
    naturally). N is derived inside the plan (1-row count aggregate,
    broadcast cross-join — same lazy idiom as unigram_logprob_scores).

    Plan shape: explode -> per-(doc,term) count -> term df aggregate
    (map-side combined, broadcast back when the vocabulary fits an
    executor; set ``broadcast_vocab=False`` past that and AQE handles the
    stop-word skew) -> per-doc top-k window. The window partitions by
    doc id — thousands of tiny sorts in parallel, no global ordering.
    Ranking is (rounded score desc, term asc): fully deterministic and
    stable across engines. Emits (id, rank, term, tf, score).
    """
    from pyspark.sql.window import Window

    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    e = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = e.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("__df")
    )
    n_docs = df.agg(F.count("*").cast("double").alias("__n"))
    idf = dfreq.crossJoin(F.broadcast(n_docs))
    rhs = F.broadcast(idf) if broadcast_vocab else idf
    scored = tf.join(rhs, "term").withColumn(
        "score",
        F.round(F.col("tf") * F.log(F.col("__n") / F.col("__df")), 6),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("long").alias("rank"),
                "term", F.col("tf").cast("long").alias("tf"), "score")
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Corpus-level collocation extraction: adjacent word pairs ranked
    by pointwise mutual information, pmi = ln(p(w1,w2) / (p(w1)p(w2)))
    with p over unigram/bigram totals — the classic phrase-mining signal
    ("new york" scores high, "of the" scores ~0) feeding tokenizer
    merges and KG mention gazetteers.

    Plan: one explode for bigram counts, one for unigram counts, totals
    derived in-plan (1-row aggregates, broadcast cross-join — the lazy
    idiom of unigram_logprob_scores), unigram table broadcast into the
    join (pass ``broadcast_vocab=False`` when the unigram vocabulary is
    too large to broadcast — the join then shuffles on the word and AQE
    picks the strategy). ``min_count`` prunes the hapax tail BEFORE the
    join (PMI is degenerate at count 1 anyway), which keeps the ranked
    candidate set tiny next to the corpus. The top-k itself is
    ``orderBy(...).limit(k)`` — TakeOrderedAndProject, i.e. a per-
    partition partial top-k merged on the driver, NOT a global sort or
    a single-partition window — followed by a rank assignment done as
    one k-row collect_list/array_sort/posexplode aggregate, so no
    WindowExec ever sees more than ``k`` rows. Ranking is (rounded pmi
    desc, w1, w2) — deterministic. Returns (rank, w1, w2, n_pair, pmi).
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = df.select(toks.alias("__t")).filter(F.size("__t") >= 2)
    grams = base.select(
        F.explode(
            F.expr("transform(slice(__t, 1, size(__t) - 1), "
                   "(x, i) -> struct(x as w1, __t[i + 1] as w2))")
        ).alias("g")
    ).select("g.w1", "g.w2")
    uni = df.select(F.explode(toks).alias("w")).groupBy("w").agg(
        F.count("*").cast("double").alias("c")
    )
    n_uni = uni.agg(F.sum("c").alias("n1"))
    n_bi = grams.agg(F.count("*").cast("double").alias("n2"))
    pairs = (
        grams.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    if broadcast_vocab:
        u1, u2 = F.broadcast(u1), F.broadcast(u2)
    scored = (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n2"))
                    / ((F.col("c1") / F.col("n1"))
                       * (F.col("c2") / F.col("n1")))
                ),
                6,
            ),
        )
    )
    # distributed top-k: TakeOrderedAndProject (each partition keeps k,
    # driver merges) — the candidate set never funnels through one task
    topk = scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(k)
    # rank the surviving <=k rows without a WindowExec: pack into one
    # sorted array (struct sort is lexicographic; -pmi gives desc) and
    # posexplode — the aggregate only ever sees k rows
    packed = topk.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("pmi")).alias("o"),
                    F.col("w1").alias("w1"),
                    F.col("w2").alias("w2"),
                    F.col("n_pair").alias("n_pair"),
                    F.col("pmi").alias("pmi"),
                )
            )
        ).alias("t")
    )
    return (
        packed.select(F.posexplode("t").alias("i", "r"))
        .select(
            (F.col("i") + 1).cast("long").alias("rank"),
            "r.w1", "r.w2",
            F.col("r.n_pair").cast("long").alias("n_pair"),
            "r.pmi",
        )
    )
