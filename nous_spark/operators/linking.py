"""Collective entity linking (SURVEY.md §3.2; reference
colEntityDisambiguation.scala, Han et al. SIGIR'11).

Set-based re-design of the reference's per-document driver loop:

  1. alias dictionary (J1)           — one aggregation over KG edges
  2. candidate generation (J2)       — token-blocked equi-join + exact
                                       StringSim on survivors, computed on
                                       the DISTINCT mention-string domain
                                       and fanned back to docs (the
                                       reference scores every vertex
                                       against every mention per doc; ours
                                       is blocked and dedup-verified — the
                                       north-rule "LSH-blocked candidate
                                       generation")
  3. neighborhood features (J3)      — one aggregation join for ALL
                                       candidates of ALL docs at once
  4. scoring + collective inference  — applyInPandas per doc_id: the exact
     (A7-A9, W3)                       reference formulas + the
                                       λ(I−(1−λ)T)⁻¹e solve (EvidenceProp
                                       .scala:107-118) in NumPy; thousands
                                       of independent tiny problems
  5. unmatched mentions → "nous: X" entities (colEntityDisambiguation
     .scala:101-109,186-192)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALIAS_PREDICATES = ["rdfs:label", "skos:preflabel", "ispreferredmeaningof"]
ALIAS_SEP = " <Alias> "


def kg_vertices(kg_triples: DataFrame) -> DataFrame:
    """Vertices (id, label) from a triple table; id = xxhash64(label)
    (64-bit, vs the reference's 32-bit label.hashCode — ReadGraph.scala:37)."""
    labels = (
        kg_triples.select(F.col("subj").alias("label"))
        .unionAll(kg_triples.select(F.col("obj").alias("label")))
        .distinct()
    )
    return labels.select(F.xxhash64("label").alias("id"), "label")


def kg_edges(kg_triples: DataFrame) -> DataFrame:
    """Edges (src, dst, pred) with xxhash64 endpoint ids."""
    return kg_triples.select(
        F.xxhash64("subj").alias("src"),
        F.xxhash64("obj").alias("dst"),
        F.col("pred"),
    ).dropDuplicates(["src", "dst", "pred"])


def vertices_with_alias(kg_triples: DataFrame) -> DataFrame:
    """J1 (NodeProp.constructVertexRDDWithAlias, NodeProp.scala:80-108):
    attach alias names from alias-predicate edges. Returns
    (id, label, names ARRAY<STRING>) where names[0] = label."""
    v = kg_vertices(kg_triples)
    aliases = (
        kg_triples.filter(F.lower(F.col("pred")).isin(ALIAS_PREDICATES))
        .select(F.xxhash64("subj").alias("id"), F.col("obj").alias("alias"))
        .groupBy("id")
        .agg(F.collect_set("alias").alias("aliases"))
    )
    return (
        v.join(aliases, "id", "left")
        .select(
            "id",
            "label",
            F.concat(
                F.array(F.col("label")),
                F.coalesce(F.col("aliases"), F.array().cast("array<string>")),
            ).alias("names"),
        )
    )


_TOKEN_SPLIT = r"[\s_,$/:.()\[\]]+"


def candidate_pairs(
    mentions: DataFrame,
    entities: DataFrame,
    phrase_match_threshold: float = 0.7,
    max_candidates_per_token: int = 2000,
    sim_mode: str = "stringsim",
    max_candidates_per_mention: int | None = None,
) -> DataFrame:
    """J2: token-blocked candidate generation + exact StringSim verify.

    mentions(doc_id, mention, evidence_wt?) × entities(id, label, names)
    → (doc_id, mention, entity_id, entity_label, name_sim).

    Blocking: both sides explode lowercase name tokens; equi-join on token.
    Skew guard: a token blocking to more than ``max_candidates_per_token``
    entities (ubiquitous identifiers — every repo defines `connect`) keeps
    a deterministic hash-sample of ~cap entities instead of being dropped:
    single-token hub mentions still get candidates (dropping the token
    starves them entirely — measured at 10k files: 0 candidates), and the
    join stays skew-bounded. Same role as the reference's edgeLimit
    (reference instead does a full V×M cross product, NodeProp.scala:25-78).

    ``sim_mode``: "stringsim" (default) verifies with the full reference
    StringSim (Dice + merge alignment) in an Arrow-batched pandas UDF;
    "dice" verifies with the Dice stage only, entirely JVM-side — the fast
    path when labels are multi-word and the alignment stage rarely decides
    (also the DuckDB-oracle-gated mode).

    name_sim depends only on the (mention STRING, entity) pair, never on
    doc_id — blocking and verification run on the distinct-mention domain
    and doc_ids are joined back at the end. On a 10k-file corpus this cut
    28M per-doc verifications to ~60k distinct-pair ones.
    """
    m_distinct = mentions.select("mention").distinct()
    m_tok = m_distinct.select(
        "mention",
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("mention")), _TOKEN_SPLIT))
        ).alias("token"),
    ).filter(F.length("token") > 0)

    e_tok = (
        entities.select(
            F.col("id").alias("entity_id"),
            F.col("label").alias("entity_label"),
            "names",
            F.explode(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            "names", lambda n: F.split(F.lower(n), _TOKEN_SPLIT)
                        )
                    )
                )
            ).alias("token"),
        )
        .filter(F.length("token") > 0)
    )
    # skew guard: hash-downsample hub tokens to ~cap entities (no window —
    # a per-token row_number would single-task the hottest token)
    tok_counts = e_tok.groupBy("token").agg(F.count("*").alias("tc"))
    e_tok = (
        e_tok.join(tok_counts, "token")
        .filter(
            (F.col("tc") <= max_candidates_per_token)
            | (
                F.pmod(
                    F.xxhash64("entity_id", "token"),
                    F.ceil(F.col("tc") / F.lit(max_candidates_per_token)).cast("long"),
                )
                == 0
            )
        )
        .drop("tc")
    )

    blocked = (
        m_tok.join(e_tok, "token")
        .select("mention", "entity_id", "entity_label", "names")
        .dropDuplicates(["mention", "entity_id"])
    )

    if sim_mode == "dice":
        from nous_spark.functions.similarity import dice_sim_col, split_words_col

        m_words = split_words_col(F.col("mention"))
        sim = F.array_max(
            F.transform(
                "names", lambda nm: dice_sim_col(m_words, split_words_col(nm))
            )
        )
        verified = (
            blocked.withColumn("name_sim", F.round(sim, 6))
            .filter(F.col("name_sim") >= phrase_match_threshold)
            .drop("names")
        )
    else:

        @F.pandas_udf(T.DoubleType())
        def best_name_sim(mention: pd.Series, names: pd.Series) -> pd.Series:
            from nous_spark.functions.similarity import string_sim

            out = []
            for m, ns in zip(mention, names):
                best = 0.0
                for n in ns if ns is not None else []:
                    s = string_sim(m, n, phrase_match_threshold,
                                   decision_only=True)
                    if s > best:
                        best = s
                out.append(best)
            return pd.Series(out)

        verified = (
            blocked.withColumn("name_sim", best_name_sim("mention", "names"))
            .filter(F.col("name_sim") >= phrase_match_threshold)
            .drop("names")
        )

    if max_candidates_per_mention is not None:
        # top-C per mention STRING (the reference's edgeLimit analog),
        # applied on the distinct domain BEFORE the doc fan-out so the
        # window never shuffles doc-multiplied rows; partitioned per
        # mention, never global
        from pyspark.sql import Window

        w = Window.partitionBy("mention").orderBy(
            F.col("name_sim").desc(), F.col("entity_id")
        )
        verified = (
            verified.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_candidates_per_mention)
            .drop("__rk")
        )

    # fan the per-mention-string verdicts back out to (doc_id, mention)
    return mentions.select("doc_id", "mention").dropDuplicates().join(
        verified, "mention"
    ).select("doc_id", "mention", "entity_id", "entity_label", "name_sim")


def best_prefix_match(targets: DataFrame, labels: DataFrame,
                      target_col: str = "query", label_col: str = "label") -> DataFrame:
    """J11 (PathSearchUtils.getBestStringMatch, PathSearchUtils.scala:17-38):
    for each query string, the lexicographically smallest label it is a
    prefix of (min_by over startswith-join)."""
    t = targets.select(F.col(target_col).alias("query")).distinct()
    l = labels.select(F.col(label_col).alias("label")).distinct()
    j = t.join(l, F.col("label").startswith(F.col("query")))
    return j.groupBy("query").agg(F.min("label").alias("best_match"))


def candidate_neighborhoods(edges: DataFrame, vertices: DataFrame,
                            candidate_ids: DataFrame) -> DataFrame:
    """J3 (NodeProp.getOneHopNbrIdsLabels, NodeProp.scala:7-22): one-hop
    neighbor label sets for candidate vertices, both directions, computed
    for all docs in one pass (reference collects per doc block)."""
    cand = candidate_ids.select(F.col("entity_id").alias("id")).distinct()
    v = vertices.select(F.col("id").alias("nid"), F.col("label").alias("nbr_label"))
    fwd = edges.join(v, edges.dst == v.nid).select(
        F.col("src").alias("id"), "nbr_label"
    )
    rev = edges.join(v, edges.src == v.nid).select(
        F.col("dst").alias("id"), "nbr_label"
    )
    return (
        fwd.unionByName(rev)
        .join(cand, "id", "left_semi")
        .groupBy("id")
        .agg(F.collect_set("nbr_label").alias("nbr_labels"))
        .withColumnRenamed("id", "entity_id")
    )


def popularity_scores(candidates: DataFrame, nbr_counts: DataFrame) -> DataFrame:
    """A7 (CollectiveEntityDisScores.getPopularityScore, reference
    CollectiveEntityDisScores.scala:103-123) as a distributed op:
    pop(m, e) = |nbrs(e)| / Σ_{e' ∈ cand(m)} |nbrs(e')|, windowed per
    (doc_id, mention) — never a global window.

    candidates(doc_id, mention, entity_id) × nbr_counts(entity_id, n_nbrs)
    → + pop_score."""
    from pyspark.sql import Window

    j = candidates.join(nbr_counts, "entity_id")
    w = Window.partitionBy("doc_id", "mention")
    return j.withColumn(
        "pop_score",
        F.round(
            F.col("n_nbrs")
            / F.greatest(F.sum("n_nbrs").over(w), F.lit(1)).cast("double"),
            6,
        ),
    )


def context_scores(
    candidates: DataFrame, mentions: DataFrame, nbrs: DataFrame
) -> DataFrame:
    """A8 (getMentionEntityScore context half,
    CollectiveEntityDisScores.scala:124-147) with the exact-match matcher:
    sim(m, e) = 2·|{ctx mention equal (lowercase) to some nbr label}|
                / (|ctx(m)| · |nbrs(e)|).

    The full-StringSim matcher runs inside the per-doc solve
    (``_solve_doc``); this distributed variant trades the fuzzy matcher for
    a pure join plan that covers the whole corpus in one pass.

    candidates(doc_id, mention, entity_id), mentions(doc_id, mention),
    nbrs(entity_id, nbr_label) → (doc_id, mention, entity_id, ctx_score).

    The deduplicated mention/neighbor/candidate frames each feed two or
    three join arms, and the caller's frames are often themselves
    join-built — left lazy, Catalyst re-executes that construction per
    arm (audited: 12 redundant scans / 18 Exchanges on the gate). Each
    is materialized once via localCheckpoint; the context self-join
    stays lazy (it re-derives from the checkpointed mention frame, so
    its re-execution is a cheap block-read self-join, while
    materializing the |mentions|²-per-doc expansion itself would cost
    more than it saves)."""
    m = mentions.select("doc_id", "mention").distinct() \
        .localCheckpoint(eager=True)
    ctx = (
        m.alias("a")
        .join(m.alias("b"), "doc_id")
        .filter(F.col("a.mention") != F.col("b.mention"))
        .select(
            "doc_id",
            F.col("a.mention").alias("mention"),
            F.lower(F.col("b.mention")).alias("ctx_mention"),
        )
    )
    n_ctx = ctx.groupBy("doc_id", "mention").agg(
        F.countDistinct("ctx_mention").alias("n_ctx")
    )
    nbr_l = nbrs.select(
        F.col("entity_id").alias("__eid"), F.lower(F.col("nbr_label")).alias("nl")
    ).distinct().localCheckpoint(eager=True)
    n_nbr = nbr_l.groupBy("__eid").agg(F.count("*").alias("n_nbrs"))
    cand = candidates.select("doc_id", "mention", "entity_id").distinct() \
        .localCheckpoint(eager=True)
    matched = (
        cand.join(ctx, ["doc_id", "mention"])
        .join(
            nbr_l,
            (F.col("entity_id") == F.col("__eid"))
            & (F.col("ctx_mention") == F.col("nl")),
        )
        .groupBy("doc_id", "mention", "entity_id")
        .agg(F.countDistinct("ctx_mention").alias("common"))
    )
    return (
        cand.join(matched, ["doc_id", "mention", "entity_id"], "left")
        .join(n_ctx, ["doc_id", "mention"], "left")
        .join(n_nbr, cand.entity_id == n_nbr["__eid"], "left")
        .select(
            "doc_id",
            "mention",
            "entity_id",
            F.round(
                F.lit(2.0)
                * F.coalesce("common", F.lit(0))
                / F.greatest(
                    F.coalesce("n_ctx", F.lit(0)) * F.coalesce("n_nbrs", F.lit(0)),
                    F.lit(1),
                ).cast("double"),
                6,
            ).alias("ctx_score"),
        )
    )


def semantic_relatedness_pairs(
    nbrs: DataFrame, n_graph_vertices: int,
    max_label_df: int | None = None,
) -> DataFrame:
    """A9 (getSemanticRelatedness, CollectiveEntityDisScores.scala:60-101;
    Milne-Witten) as a distributed inverted-index plan — never all-pairs:
    entities sharing a neighbor label meet in the label-keyed self-join.

        sr(a,b) = 1 − (ln max(|A|,|B|) − ln |A∩B|)
                     / (ln max(N,2) − ln max(min(|A|,|B|), 1))

    for entity pairs a < b with |A∩B| > 0 and sr > 0 (same guards as the
    per-doc solve in ``_solve_doc``).

    nbrs(entity_id, nbr_label) → (e1, e2, relatedness).

    Scale shape: a label shared by k entities generates k·(k-1)/2
    candidate pairs in the label-keyed self-join BEFORE any score filter
    can discard them — the same hub hazard as any common-neighbor method
    (a real KG's head label, "person"/"USA", is shared by millions of
    entities → a 10¹²-pair skewed stage). ``max_label_df`` drops labels
    with document frequency above the cap before the join, exactly as
    ``adamic_adar_scores``'s ``max_neighbor_degree``: a label shared by
    k of N entities carries ln(N/k) bits of association evidence — the
    idf argument every inverted-index relatedness system applies — so
    past the cap it contributes ~zero Milne-Witten signal at quadratic
    cost. Sizes |A| and the pair counts are both computed on the pruned
    index (relatedness over the informative-label sub-bipartite-graph),
    keeping the measure internally consistent; candidate volume becomes
    Σ_label min(df, cap)² — linear in the index for fixed cap.

    The deduplicated index feeds three join arms (both self-join sides +
    the size aggregate), so it is materialized once — same audit finding
    as context_scores; output volume (common-neighbor pairs) remains the
    honest cost driver."""
    import math

    n = nbrs.select("entity_id", "nbr_label").distinct()
    if max_label_df is not None:
        keep = (
            n.groupBy("nbr_label")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_label_df)
            .select("nbr_label")
        )
        n = n.join(keep, "nbr_label", "left_semi")
    n = n.localCheckpoint(eager=True)
    sizes = n.groupBy("entity_id").agg(F.count("*").alias("sz"))
    common = (
        n.alias("x")
        .join(n.alias("y"), "nbr_label")
        .filter(F.col("x.entity_id") < F.col("y.entity_id"))
        .groupBy(
            F.col("x.entity_id").alias("e1"), F.col("y.entity_id").alias("e2")
        )
        .agg(F.count("*").alias("common"))
    )
    j = (
        common.join(
            sizes.select(F.col("entity_id").alias("e1"), F.col("sz").alias("sz1")),
            "e1",
        )
        .join(
            sizes.select(F.col("entity_id").alias("e2"), F.col("sz").alias("sz2")),
            "e2",
        )
    )
    mx = F.greatest("sz1", "sz2").cast("double")
    mn = F.greatest(F.least("sz1", "sz2"), F.lit(1)).cast("double")
    log_n = math.log(max(n_graph_vertices, 2))
    denom = F.lit(log_n) - F.log(mn)
    sr = F.lit(1.0) - (F.log(mx) - F.log(F.col("common").cast("double"))) / denom
    return (
        j.filter(denom > 0)
        .select("e1", "e2", F.round(sr, 6).alias("relatedness"))
        .filter(F.col("relatedness") > 0)
    )


_LINK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("mention", T.StringType()),
    T.StructField("entity_id", T.LongType()),
    T.StructField("entity_label", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def _solve_doc(pdf: pd.DataFrame, lam: float, phrase_threshold: float,
               mention_entity_threshold: float, n_graph_vertices: int) -> pd.DataFrame:
    """Per-document referent-graph inference — exact reference math:
    scores (CollectiveEntityDisScores.scala:103-147), normalized referent
    graph (ReferentGraph.scala:9-83), solve + argmax
    (EvidenceProp.scala:36-50,107-118)."""
    import numpy as np

    from nous_spark.functions.similarity import string_sim

    doc_id = pdf["doc_id"].iloc[0]
    mentions = sorted(pdf["mention"].unique())
    m_index = {m: i for i, m in enumerate(mentions)}
    n_m = len(mentions)
    evid = dict(zip(pdf["mention"], pdf["evidence_wt"]))

    # neighborhood labels repeat massively across candidates of one doc —
    # memoize the (label, mention) decision instead of re-running the
    # Levenshtein merge per candidate
    _sim_cache: dict[tuple[str, str], bool] = {}

    def _matches(nl: str, cm: str) -> bool:
        key = (nl, cm)
        hit = _sim_cache.get(key)
        if hit is None:
            hit = string_sim(nl, cm, phrase_threshold,
                             decision_only=True) > phrase_threshold
            _sim_cache[key] = hit
        return hit

    # candidate set per mention; neighborhood per entity
    ent_info: dict[int, tuple[str, list[str]]] = {}
    cand: dict[str, list[tuple[int, float]]] = {m: [] for m in mentions}
    for r in pdf.itertuples(index=False):
        nbrs = list(r.nbr_labels) if r.nbr_labels is not None else []
        ent_info[r.entity_id] = (r.entity_label, nbrs)
        cand[r.mention].append((r.entity_id, r.name_sim))

    # A7+A8 combined mention→entity score (getMentionEntityScore)
    ment_ent_score: dict[tuple[str, int], float] = {}
    for m in mentions:
        ctx = [x for x in mentions if x != m]
        total_nbrs = sum(len(ent_info[eid][1]) for eid, _ in cand[m])
        for eid, _ in cand[m]:
            nbrs = ent_info[eid][1]
            common = 0
            for cm in ctx:
                if any(_matches(nl, cm) for nl in nbrs):
                    common += 1
            denom = max(len(ctx) * len(nbrs), 1)
            sim = 2.0 * common / denom
            pop = len(nbrs) / max(total_nbrs, 1)
            score = 0.5 * pop + 0.5 * sim
            if score >= mention_entity_threshold:
                ment_ent_score[(m, eid)] = score

    kept_entities = sorted({eid for (_, eid) in ment_ent_score})
    e_index = {e: n_m + i for i, e in enumerate(kept_entities)}
    n = n_m + len(kept_entities)
    if not kept_entities:
        return pd.DataFrame(columns=[f.name for f in _LINK_SCHEMA.fields])

    # A9 semantic relatedness between candidates of different mentions
    sem: dict[tuple[int, int], float] = {}
    ml = list(mentions)
    for i in range(len(ml)):
        for j in range(i + 1, len(ml)):
            for e1 in [e for (mm, e) in ment_ent_score if mm == ml[i]]:
                for e2 in [e for (mm, e) in ment_ent_score if mm == ml[j]]:
                    n1, n2 = set(ent_info[e1][1]), set(ent_info[e2][1])
                    if not n1 and not n2:
                        continue
                    common = len(n1 & n2)
                    if common == 0:
                        continue
                    mx, mn = max(len(n1), len(n2)), min(len(n1), len(n2))
                    denom = np.log(max(n_graph_vertices, 2)) - np.log(max(mn, 1))
                    if denom <= 0:
                        continue
                    sr = 1 - (np.log(mx) - np.log(common)) / denom
                    if sr > 0:
                        sem[(e1, e2)] = sr

    # referent graph: per-source normalized weights; T[dst, src] = w
    edges: dict[int, list[tuple[int, float]]] = {}
    for (m, eid), s in ment_ent_score.items():
        edges.setdefault(m_index[m], []).append((e_index[eid], s))
    for (e1, e2), s in sem.items():
        edges.setdefault(e_index[e1], []).append((e_index[e2], s))
        edges.setdefault(e_index[e2], []).append((e_index[e1], s))

    Tm = np.zeros((n, n))
    for src, outs in edges.items():
        tot = sum(w for _, w in outs)
        if tot <= 0:
            continue
        for dst, w in outs:
            Tm[dst, src] = w / tot

    e_vec = np.zeros((n, 1))
    for m, i in m_index.items():
        e_vec[i, 0] = evid.get(m, 0.0)

    r_vec = lam * np.linalg.inv(np.eye(n) - (1 - lam) * Tm) @ e_vec

    # argmax per mention of M[i, j] * r[j]  (M = T.T rows 0..n_m-1)
    Mt = Tm.T[:n_m, :]
    out_rows = []
    for m, i in m_index.items():
        best_j, best_score = -1, -np.inf
        for j in range(n_m, n):
            sc = Mt[i, j] * r_vec[j, 0]
            if sc > best_score:
                best_score, best_j = sc, j
        if best_j >= 0:
            eid = kept_entities[best_j - n_m]
            out_rows.append((doc_id, m, eid, ent_info[eid][0], float(best_score)))
    return pd.DataFrame(out_rows, columns=[f.name for f in _LINK_SCHEMA.fields])


def link_entities(
    mentions: DataFrame,
    kg_triples: DataFrame,
    phrase_match_threshold: float = 0.7,
    mention_entity_threshold: float = 0.0,
    lam: float = 0.00001,
    candidate_types: list[str] | None = None,
    max_candidates_per_mention: int | None = 50,
) -> DataFrame:
    """Full collective linking: returns (doc_id, mention, entity_id,
    entity_label, score). Unmatched mentions become 'nous: <mention>'
    entities (reference :101-109). mentions must carry doc_id, mention;
    evidence_wt defaults to 1/#mentions-in-doc (NLPTripleParser.scala:79).

    ``candidate_types``: restrict the candidate universe to entities with
    an rdf:type in the list (e.g. ["FUNCTION", "CLASS", "MODULE"] for code
    identifier mentions) — candidates stay typed-correct and the blocked
    join shrinks by the prose share of the KG. Neighborhood/context
    features still use the FULL graph."""
    if "evidence_wt" not in mentions.columns:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id")
        mentions = mentions.withColumn(
            "evidence_wt",
            1.0 / F.size(F.collect_set("mention").over(w)).cast("double"),
        )
    # referenced by the candidate join, the scored join and the unmatched
    # anti-join — persist once instead of recomputing the upstream thrice
    mentions = mentions.select(
        F.col("doc_id").cast("string").alias("doc_id"), "mention", "evidence_wt"
    ).dropDuplicates(["doc_id", "mention"]).persist()

    ents = vertices_with_alias(kg_triples)
    if candidate_types is not None:
        typed = (
            kg_triples.filter(
                (F.col("pred") == "rdf:type")
                & F.col("obj").isin(candidate_types)
            )
            .select(F.xxhash64("subj").alias("id"))
            .distinct()
        )
        # code entities are fully qualified ("repo/path::name"); the short
        # trailing segment is the alias a callee mention uses
        ents = ents.join(typed, "id", "left_semi").withColumn(
            "names",
            F.array_union(
                "names",
                F.array(F.element_at(F.split(F.col("label"), "::"), -1)),
            ),
        )
    edges = kg_edges(kg_triples)
    verts = kg_vertices(kg_triples)
    n_vertices = verts.count()

    # max_candidates_per_mention bounds the per-doc solve at O(mentions·C)
    # on hub names ("connect", "utils") that would otherwise match
    # thousands of entities; applied pre-fan-out inside candidate_pairs
    cands = candidate_pairs(
        mentions, ents, phrase_match_threshold,
        max_candidates_per_mention=max_candidates_per_mention,
    )
    nbrs = candidate_neighborhoods(edges, verts, cands)
    scored_input = (
        cands.join(nbrs, "entity_id", "left")
        .join(mentions, ["doc_id", "mention"])
        .withColumn("nbr_labels", F.coalesce(
            "nbr_labels", F.array().cast("array<string>")))
    )

    linked = scored_input.groupBy("doc_id").applyInPandas(
        lambda pdf: _solve_doc(
            pdf, lam, phrase_match_threshold, mention_entity_threshold, n_vertices
        ),
        schema=_LINK_SCHEMA,
    ).persist()  # read twice: result union + unmatched anti-join

    unmatched = (
        mentions.join(linked.select("doc_id", "mention"), ["doc_id", "mention"],
                      "left_anti")
        .select(
            "doc_id",
            "mention",
            F.xxhash64(F.concat(F.lit("nous: "), F.col("mention"))).alias("entity_id"),
            F.concat(F.lit("nous: "), F.col("mention")).alias("entity_label"),
            F.lit(0.0).alias("score"),
        )
    )
    return linked.unionByName(unmatched)
