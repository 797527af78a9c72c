"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-extraction over sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2),
each runnable at any sf dir.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query;
non-SQL ops (extraction pipeline, connected components, LSH) omit the
oracle and get the driver's rows-only check.

Column names are aliased identically on both sides; float aggregates are
rounded on both sides so value hashes are stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triple extraction over the sf0.001 documents table
    (documents mapped onto the source-table shape), purged + typed."""
    from nous_spark.operators.extraction import extract_triples

    docs = _read(spark, "/root/testdata/sf0.001", "documents")
    src = docs.select(
        F.lit("corpus").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
    )
    return extract_triples(src, code_mode=False)


# ---------------------------------------------------------------- queries
def _q_lang_histogram(spark, sf):  # S7
    return (
        _read(spark, sf, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
    )


def _q_valid_lines(spark, sf):  # F1
    from nous_spark.operators.filters import valid_lines

    d = _read(spark, sf, "documents").withColumnRenamed("text", "line")
    return valid_lines(d).select("doc_id", "line")


def _q_normalize_fields(spark, sf):  # F2
    from nous_spark.operators.filters import normalize_fields

    d = _read(spark, sf, "documents").select(
        "doc_id", F.col("text").alias("norm")
    )
    return normalize_fields(d, ["norm"]).select("doc_id", "norm")


def _q_purge_longest(spark, sf):  # N6/W1
    from nous_spark.operators.filters import purge_longest_object

    e = _read(spark, sf, "events").select(
        F.col("user_id").alias("src"),
        F.col("event_type").alias("subj"),
        F.lit("p").alias("pred"),
        F.col("props").alias("obj"),
        "event_id",
    )
    return purge_longest_object(e).select("src", "subj", "obj")


def _q_topk_per_group(spark, sf):  # W2/W5
    from nous_spark.operators.filters import top_k_per_group

    li = _read(spark, sf, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    # strict unique order: price desc, then orderkey/linenumber
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    )


def _q_degree(spark, sf):  # A10
    from nous_spark.operators.graph import degrees

    e = _read(spark, sf, "lineitem").select(
        F.col("l_suppkey").cast("long").alias("src"),
        F.col("l_partkey").cast("long").alias("dst"),
    )
    return degrees(e).select(F.col("id").alias("node_id"), "degree")


def _q_mis_support(spark, sf):  # A1
    from nous_spark.operators.mining import min_image_support

    inst = _read(spark, sf, "lineitem").select(
        F.concat_ws("|", "l_returnflag", "l_linestatus").alias("pattern_key"),
        F.col("l_suppkey").cast("long").alias("b0"),
        F.col("l_partkey").cast("long").alias("b1"),
    )
    return min_image_support(inst, ["b0", "b1"]).select("pattern_key", "support")


def _q_agg_join(spark, sf):  # J1-shaped left-outer aggregation join
    c = _read(spark, sf, "customer")
    o = _read(spark, sf, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )
    return (
        c.join(agg, c.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
        )
    )


def _q_semi_join(spark, sf):  # J7
    li = _read(spark, sf, "lineitem")
    p = _read(spark, sf, "part").filter(F.col("p_size") > 40)
    return (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


def _q_anti_join(spark, sf):  # J9
    c = _read(spark, sf, "customer")
    o = _read(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_windowed_agg(spark, sf):  # streaming-shaped batch agg
    e = _read(spark, sf, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def _q_token_count(spark, sf):  # text analysis: token counting
    from nous_spark.operators.textstats import token_counts

    return token_counts(_read(spark, sf, "documents")).select("doc_id", "n_tokens")


def _q_quality_score(spark, sf):  # text analysis: quality scoring
    from nous_spark.operators.textstats import quality_scores

    return quality_scores(_read(spark, sf, "documents")).select(
        "doc_id", "n_chars_obs", "stopword_ratio", "mean_token_len"
    )


def _q_dedup_exact(spark, sf):  # dedup: exact hash-groupBy
    from nous_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_read(spark, sf, "documents"), "text", "doc_id").select(
        "text_hash", "keeper_id", "n_dups"
    )


def _q_edge_signatures(spark, sf):  # A6 1-edge signature histogram
    li = _read(spark, sf, "lineitem")
    return (
        li.select(
            F.concat_ws("->", "l_returnflag", "l_linestatus").alias("sig")
        )
        .groupBy("sig")
        .agg(F.count("*").alias("cnt"))
    )


def _q_type_cooccurrence(spark, sf):  # A13 pairs sharing a data node
    li = _read(spark, sf, "lineitem").select("l_orderkey", "l_returnflag").distinct()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_returnflag") < F.col("b.l_returnflag"))
        .groupBy(
            F.col("a.l_returnflag").alias("t1"),
            F.col("b.l_returnflag").alias("t2"),
        )
        .agg(F.count("*").alias("weight"))
    )


def _q_ann_cosine_topk(spark, sf):  # similarity search: exact top-k
    from nous_spark.operators.ann import brute_force_topk

    emb = _read(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, q, k=10).select(
        "query_id", "vec_id", "cosine", "rank"
    )


def _q_language_id(spark, sf):  # text analysis: n-gram/stopword lang ID
    from nous_spark.operators.textstats import language_id

    return language_id(_read(spark, sf, "documents")).select("doc_id", "lang_pred")


def _q_fingerprint_stats(spark, sf):  # document fingerprinting
    from nous_spark.operators.textstats import fingerprint

    fp = fingerprint(_read(spark, sf, "documents"))
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_unique"),
    )


def _q_token_jaccard(spark, sf):  # F10 jaccard over token sets
    d = _read(spark, sf, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+")).alias("toks"),
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.size(F.array_intersect("a.toks", "b.toks"))
                / F.size(F.array_union("a.toks", "b.toks")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def _q_minhash_pairs(spark, sf):  # dedup: MinHash+LSH (rows-only)
    from nous_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(
        _read(spark, sf, "documents"), threshold=0.8
    )


def _q_simhash_pairs(spark, sf):  # dedup: SimHash (rows-only)
    from nous_spark.operators.dedup import simhash_near_duplicates

    return simhash_near_duplicates(
        _read(spark, sf, "documents"), max_hamming=3
    )


def _q_connected_components(spark, sf):  # G8 (rows-only: iterative fixpoint)
    from nous_spark.operators.graph import connected_components

    e = _read(spark, sf, "orders").select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey") + F.lit(1_000_000)).cast("long").alias("dst"),
    )
    return connected_components(e)


def _q_path_search(spark, sf):  # G3/G5 (rows-only: iterative frontier)
    from nous_spark.operators.pathsearch import find_paths

    n = _read(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.col("n_regionkey") + 100).cast("long").alias("dst"),
        F.lit("in_region").alias("pred"),
    )
    pairs = spark.createDataFrame(
        [(1, 0, 1), (2, 2, 3)], ["pair_id", "src_id", "dst_id"]
    )
    res = find_paths(n, pairs, max_hops=3, bidirectional=True)
    return res.select(
        "pair_id", F.col("hops"), F.concat_ws("->", "preds").alias("pred_chain")
    )


def _q_dictionary_encode(spark, sf):  # J10
    from nous_spark.operators.graph import dictionary_encode

    n = _read(spark, sf, "nation").select("n_name", "n_regionkey")
    enc, _ = dictionary_encode(n, ["n_name"])
    return enc.select("n_name", "n_regionkey", "n_name_id")


def _q_edge_label_multiset(spark, sf):  # A11 (map column → sorted entries)
    from nous_spark.operators.relations_mining import edge_label_multiset

    e = _read(spark, sf, "lineitem").select(
        F.col("l_suppkey").cast("long").alias("src"),
        F.col("l_partkey").cast("long").alias("dst"),
        F.col("l_returnflag").alias("pred"),
    )
    m = edge_label_multiset(e)
    return m.select(
        F.col("id").alias("node_id"),
        F.explode("label_counts").alias("label", "cnt"),
    )


def _q_two_edge_signatures(spark, sf):  # A6 (2-edge chains)
    from nous_spark.operators.relations_mining import two_edge_signatures

    v = _read(spark, sf, "supplier").select(
        (F.col("s_suppkey") + 1000).cast("long").alias("id"),
        F.col("s_name").alias("label"),
    ).unionByName(_read(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("id"),
        F.col("n_name").alias("label"),
    )).unionByName(_read(spark, sf, "region").select(
        (F.col("r_regionkey") + 100).cast("long").alias("id"),
        F.col("r_name").alias("label"),
    ))
    e = _read(spark, sf, "supplier").select(
        (F.col("s_suppkey") + 1000).cast("long").alias("src"),
        F.col("s_nationkey").cast("long").alias("dst"),
        F.lit("in_nation").alias("pred"),
    ).unionByName(_read(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.col("n_regionkey") + 100).cast("long").alias("dst"),
        F.lit("in_region").alias("pred"),
    ))
    return two_edge_signatures(e, v).filter(F.col("shape") == "chain")


def _q_a3_window_support(spark, sf):  # A3/A5 cumulative pattern counts
    from nous_spark.operators.mining import cumulative_pattern_count

    per_batch = _read(spark, sf, "events").select(
        F.col("event_type").alias("pattern_key"),
        F.lit(1).alias("support"),
    )
    return cumulative_pattern_count(per_batch).withColumn(
        "support", F.col("support").cast("long")
    )


def _q_pagerank(spark, sf):  # G6 (rows-only: iterative)
    from nous_spark.operators.graph import pagerank

    e = _read(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.col("n_regionkey") + 100).cast("long").alias("dst"),
    )
    return pagerank(e, max_iter=5).select(
        "id", F.round("rank", 6).alias("rank")
    )


def _q_mis_exact(spark, sf):  # A1 type-keyed variant (reference-exact)
    from nous_spark.operators.mining_exact import (
        first_types,
        min_image_support_exact,
        one_edge_instances_exact,
    )

    orders = _read(spark, sf, "orders")
    # synthetic typed graph: customers typed by mktsegment-ish hash bucket
    quads = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.pmod(F.col("o_orderkey"), F.lit(3)) + 1).cast("long").alias("pred"),
        (F.col("o_orderkey") + 1_000_000).cast("long").alias("dst"),
        F.lit(0).cast("long").alias("batch_id"),
    ).unionByName(
        orders.select(
            F.col("o_custkey").cast("long").alias("src"),
            F.lit(0).cast("long").alias("pred"),
            F.pmod(F.col("o_custkey"), F.lit(5)).cast("long").alias("dst"),
            F.lit(0).cast("long").alias("batch_id"),
        )
    ).unionByName(
        orders.select(
            (F.col("o_orderkey") + 1_000_000).cast("long").alias("src"),
            F.lit(0).cast("long").alias("pred"),
            F.lit(99).cast("long").alias("dst"),
            F.lit(0).cast("long").alias("batch_id"),
        )
    )
    inst = one_edge_instances_exact(quads, first_types(quads, 0), 0)
    return min_image_support_exact(inst).select("pat_str", "support")


def _q_extract_triples(spark, sf):  # flagship, rows-only check
    from nous_spark.operators.extraction import extract_triples

    docs = _read(spark, sf, "documents")
    src = docs.select(
        F.lit("corpus").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0" * 40).alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )
    return extract_triples(src, code_mode=False).select(
        "subj", "pred", "obj", "conf", "src", "content_sha"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s7_lang_histogram": _q_lang_histogram,
        "f1_valid_lines": _q_valid_lines,
        "f2_normalize_fields": _q_normalize_fields,
        "n6_purge_longest": _q_purge_longest,
        "w2_topk_per_group": _q_topk_per_group,
        "a10_degree": _q_degree,
        "a1_mis_support": _q_mis_support,
        "j1_agg_join": _q_agg_join,
        "j7_semi_join": _q_semi_join,
        "j9_anti_join": _q_anti_join,
        "str_windowed_agg": _q_windowed_agg,
        "txt_token_count": _q_token_count,
        "txt_quality_score": _q_quality_score,
        "dd_exact_dedup": _q_dedup_exact,
        "a6_edge_signatures": _q_edge_signatures,
        "a13_type_cooccurrence": _q_type_cooccurrence,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "txt_language_id": _q_language_id,
        "txt_fingerprint_stats": _q_fingerprint_stats,
        "f10_token_jaccard": _q_token_jaccard,
        "dd_minhash_pairs": _q_minhash_pairs,
        "dd_simhash_pairs": _q_simhash_pairs,
        "g8_connected_components": _q_connected_components,
        "g3_path_search": _q_path_search,
        "j10_dictionary_encode": _q_dictionary_encode,
        "a11_edge_label_multiset": _q_edge_label_multiset,
        "a6_two_edge_signatures": _q_two_edge_signatures,
        "a3_window_support": _q_a3_window_support,
        "g6_pagerank": _q_pagerank,
        "a1_mis_exact": _q_mis_exact,
        "kg_extract_triples": _q_extract_triples,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "s7_lang_histogram": "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
        "f1_valid_lines": """
            SELECT doc_id, text AS line FROM documents
            WHERE length(text) > 0 AND text NOT LIKE '#%'
              AND text NOT LIKE '@%' AND text NOT LIKE '3210#%'
        """,
        "f2_normalize_fields": """
            SELECT doc_id,
                   trim(regexp_replace(lower(regexp_replace(text, '[<>]', '', 'g')),
                        '\\s*\\.\\s*$', '')) AS norm
            FROM documents
        """,
        "n6_purge_longest": """
            SELECT user_id AS src, event_type AS subj, props AS obj
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY length(props) DESC, props DESC) = 1
        """,
        "w2_topk_per_group": """
            SELECT * FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
              FROM lineitem) WHERE rk <= 10
        """,
        "a10_degree": """
            SELECT node_id, count(*)::BIGINT AS degree FROM (
              SELECT l_suppkey::BIGINT AS node_id FROM lineitem
              UNION ALL
              SELECT l_partkey::BIGINT AS node_id FROM lineitem)
            GROUP BY node_id
        """,
        "a1_mis_support": """
            SELECT pattern_key,
                   least(count(DISTINCT b0), count(DISTINCT b1))::BIGINT AS support
            FROM (SELECT l_returnflag || '|' || l_linestatus AS pattern_key,
                         l_suppkey::BIGINT AS b0, l_partkey::BIGINT AS b1
                  FROM lineitem)
            GROUP BY pattern_key
        """,
        "j1_agg_join": """
            SELECT c_custkey,
                   coalesce(n_orders, 0)::BIGINT AS n_orders,
                   coalesce(total_spend, 0.0) AS total_spend
            FROM customer LEFT JOIN (
              SELECT o_custkey, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total_spend
              FROM orders GROUP BY o_custkey) agg
            ON c_custkey = agg.o_custkey
        """,
        "j7_semi_join": """
            SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
        """,
        "j9_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "str_windowed_agg": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS cnt, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "txt_token_count": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT
                   AS n_tokens
            FROM documents
        """,
        "txt_quality_score": """
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars_obs,
                   round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> list_contains(['the','a','an','of','in','on','and','or',
                                             'to','is','was','for','with','that','it'], t)))
                         / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1)::DOUBLE,
                         6) AS stopword_ratio,
                   round(length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE
                         / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6)
                   AS mean_token_len
            FROM documents
        """,
        "dd_exact_dedup": """
            SELECT md5(text) AS text_hash, min(doc_id)::BIGINT AS keeper_id,
                   count(*)::BIGINT AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "a6_edge_signatures": """
            SELECT l_returnflag || '->' || l_linestatus AS sig, count(*) AS cnt
            FROM lineitem GROUP BY 1
        """,
        "a13_type_cooccurrence": """
            SELECT a.l_returnflag AS t1, b.l_returnflag AS t2, count(*) AS weight
            FROM (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem) b
            USING (l_orderkey)
            WHERE a.l_returnflag < b.l_returnflag
            GROUP BY 1, 2
        """,
        "ann_cosine_topk": """
            SELECT query_id, vec_id, cosine, rank FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                round(list_dot_product(b.embedding::DOUBLE[], a.embedding::DOUBLE[])
                  / greatest(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                           * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])),
                           1e-12), 6) AS cosine,
                row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY round(list_dot_product(b.embedding::DOUBLE[], a.embedding::DOUBLE[])
                      / greatest(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                               * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])),
                               1e-12), 6) DESC, b.vec_id) AS rank
              FROM embeddings a, embeddings b
              WHERE a.vec_id < 3)
            WHERE rank <= 10
        """,
        "txt_language_id": """
            WITH t AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM documents),
            s AS (SELECT doc_id,
              len(list_filter(toks, x -> list_contains(
                ['the','and','of','to','is','was','with'], x))) AS s_en,
              len(list_filter(toks, x -> list_contains(
                ['der','die','und','das','ist','mit','von'], x))) AS s_de,
              len(list_filter(toks, x -> list_contains(
                ['le','la','et','les','des','est','avec'], x))) AS s_fr,
              len(list_filter(toks, x -> list_contains(
                ['el','la','los','las','es','con','por'], x))) AS s_es
              FROM t)
            SELECT doc_id,
              CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                   WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                   WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                   WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                   ELSE 'es' END AS lang_pred
            FROM s
        """,
        "txt_fingerprint_stats": """
            SELECT count(*)::BIGINT AS n_docs,
                   count(DISTINCT array_to_string(
                     regexp_split_to_array(trim(lower(text)), '\\s+'), ' '))::BIGINT
                   AS n_unique
            FROM documents
        """,
        "f10_token_jaccard": """
            WITH t AS (SELECT doc_id,
                list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
              FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.toks, b.toks))::DOUBLE
                         / (len(a.toks) + len(b.toks)
                            - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
            FROM t a JOIN t b ON a.doc_id + 1 = b.doc_id
        """,
        "j10_dictionary_encode": """
            SELECT n_name, n_regionkey,
                   (row_number() OVER (ORDER BY n_name)) - 1 AS n_name_id
            FROM nation
        """,
        "a11_edge_label_multiset": """
            SELECT l_suppkey::BIGINT AS node_id, l_returnflag AS label,
                   count(*)::BIGINT AS cnt
            FROM lineitem GROUP BY 1, 2
        """,
        "a6_two_edge_signatures": """
            SELECT 'chain' AS shape,
                   s.s_name || '>in_nation>' || n.n_name
                            || '>in_region>' || r.r_name AS sig,
                   count(*)::BIGINT AS cnt
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        """,
        "a3_window_support": """
            SELECT event_type AS pattern_key, count(*)::BIGINT AS support
            FROM events GROUP BY event_type
        """,
        # rows-only (non-SQL-expressible): kg_extract_triples (NLP pipeline),
        # dd_minhash_pairs / dd_simhash_pairs (hash-family specific),
        # g8_connected_components / g3_path_search / g6_pagerank (iterative),
        # a1_mis_exact (reference-exact type-keyed MIS; covered by the WSJ
        # batch-40 golden test), a6_two_edge_signatures (graph-shape op)
    }
