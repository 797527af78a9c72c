"""Generate VALUES-table oracles for the gates whose inputs are built from
seeded RNGs driver-side (mm_image/audio/video stats, g7_pic, lp_bpr_metrics):
their outputs are fully deterministic, so the DuckDB oracle is just the
expected rows as a typed VALUES table — no blob parsing in SQL.

Run from /root/repo:  python scripts/gen_values_oracles.py
Writes fixtures/values_oracles.json ({gate: sql}); __spark_entry__.oracle_sql()
merges it over the handwritten oracles. After writing, every SQL is
cross-checked against a FRESH run of the Spark gate the same way the
driver compares (columns sorted by name, row multisets equal) — a
determinism failure or codegen bug fails loudly here, not in the driver.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

GATES = [
    "g7_pic",
    "lp_bpr_metrics",
    "mm_image_stats",
    "mm_audio_stats",
    "mm_video_stats",
    # hash-family gates over the deterministic sf tables: the SQL can't
    # express xxhash64, but the OUTPUT is a small deterministic pair table
    "dd_minhash_pairs",
    "dd_simhash_pairs",
    "ann_lsh_topk",
    "dd_embedding_pairs",
    # the last three formerly-rows-only gates: semantics are pinned by
    # golden tests (extraction P/R=1.0 vs the reference corpus, StringSim
    # merge-alignment goldens in test_linking); the VALUES oracle adds
    # cross-session determinism + regression pinning, with independent
    # invariant checks below (sha256 lineage, token-blocking, bounds)
    "kg_extract_triples",
    "j2_candidate_pairs_stringsim",
    "f8_string_sim",
    # round-5: IVF serve-path query (NumPy cosine + self-recovery checks)
    # and the streaming cross-batch LSH candidates (batch state-machine
    # re-derivation from the signatures, which are themselves pinned by
    # the dd_minhash true-Jaccard verifier)
    "ann_ivf_query",
    "str_minhash_cands",
    # exact n-gram Jaccard with prefix blocking: VALUES oracle verified
    # below against a full O(n^2) brute-force gram-set Jaccard (exactness
    # + subset-of-true-pairs + guaranteed planted-pair recall)
    "dd_ngram_pairs",
    # round-6: the streaming near-dup KEEP/DROP loop (greedy
    # first-arrival keeper over the minhash frontier) — verified below by
    # a plain-Python re-derivation of the full two-batch decision
    # sequence from the batch signatures, plus a planted-drop recall
    # check
    "str_near_dup_drop",
    # round-6 batch 2: the k-core peel is iterative-until-fixpoint
    # (inexpressible in one SQL pass); VALUES rows verified below by an
    # independent plain-Python peel straight from the parquet
    "g_k_core",
    # deterministic sync label propagation (iterative, capped) —
    # verified below by an independent plain-Python sync-LPA from the
    # parquet with the identical tie-break and cap
    "g_label_propagation",
    # round-7: incremental dedup against the persisted minhash index —
    # verified below by exact equivalence to the batch pipeline's cross
    # pairs on the union corpus (same banding, same verification)
    "dd_index_dedup",
    # round-7: the streaming twin — two mtime-ordered microbatches
    # foreachBatch-deduped against the index with fold-in between
    # triggers; verified below by a pure-Python brute force over true
    # string-shingle sets with the gate's exact batch/replica
    # construction and arrival-orientation rules, plus planted recall
    "str_index_dedup",
    # round-7: incremental IVF add — verified below like ann_ivf_query
    # (NumPy cosines, dense rank order, self-recovery of an ADDED query
    # vector) plus delta-membership checks
    "ann_ivf_add",
    # round-8: the streaming ingest twin — the same %4==0 delta folded
    # in two microbatches must leave an index identical to the batch
    # fold's, so its probe rows are REQUIRED to equal ann_ivf_add's
    # exactly (cross-gate equality verified below) on top of the NumPy
    # invariants
    "str_ivf_ingest",
    # round-8: SemDeDup semantic dedup — k-means cells aren't SQL, so
    # the verdict table is a VALUES oracle, verified below by a full
    # NumPy re-derivation of the within-cell τ-components GIVEN the
    # gate's cell assignment, plus planted transitive-chain recall
    "dd_semantic_dedup",
]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_SQLT = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        return repr(v)  # shortest round-trip literal → identical double
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(df) -> str:
    cols = df.columns
    types = [_SQLT[f.dataType.simpleString()] for f in df.schema.fields]
    rows = df.collect()
    if not rows:
        raise SystemExit(f"gate returned 0 rows — vacuous oracle refused")
    body = ",\n".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    sel = ", ".join(
        f"CAST(v{i} AS {t}) AS {c}" for i, (c, t) in enumerate(zip(cols, types))
    )
    alias = ", ".join(f"v{i}" for i in range(len(cols)))
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({alias})"


def driver_style_compare(spark_df, sql: str) -> None:
    cols = sorted(spark_df.columns)
    got = sorted(
        tuple(row[c] for c in cols) for row in spark_df.collect()
    )
    rel = duckdb.sql(sql)
    names = rel.columns
    want = sorted(
        tuple(r[names.index(c)] for c in cols) for r in rel.fetchall()
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"row mismatch:\n spark={g}\n duck ={w}"


def main() -> None:
    from nous_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(cores=8)
    qs = entry.queries()
    out = {}
    for g in GATES:
        df = qs[g](spark, SF)
        out[g] = values_sql(df)
        print(f"{g}: {df.count()} rows -> VALUES oracle")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fixtures", "values_oracles.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")

    # cross-check each oracle against a FRESH run of the gate (catches
    # run-to-run nondeterminism, the thing that would flap in the driver)
    for g in GATES:
        driver_style_compare(qs[g](spark, SF), out[g])
        print(f"{g}: fresh-run cross-check OK")

    # g7_pic is additionally verified against an INDEPENDENT dense-NumPy
    # PIC on the same sim graph (the VALUES rows must not merely be a
    # replay of our own Spark output): cluster PARTITIONS must agree up
    # to label permutation.
    verify_g7_against_numpy(spark)
    print("g7_pic: independent NumPy partition check OK")

    # mm_* oracles are verified straight from the seeded SOURCE arrays —
    # no encoder or decoder in the loop (only the documented 16-bit PCM
    # quantization formula for audio) — so a decode bug present at
    # generation time cannot become golden.
    verify_mm_against_source()
    print("mm_image/audio/video_stats: independent source-array check OK")

    # lp_bpr_metrics: re-execute the training SEQUENTIALLY on the driver
    # (same seeds, block partition fetched from Spark's xxhash64) and
    # recompute the sampled metrics in plain NumPy — verifies that the
    # distributed orchestration (applyInPandas grouping, delta averaging
    # order) didn't shape the golden numbers.
    verify_lp_sequential(spark)
    print("lp_bpr_metrics: sequential re-execution check OK")

    verify_minhash_against_text(spark)
    print("dd_minhash_pairs: independent text-Jaccard check OK")
    verify_simhash_against_numpy(spark)
    print("dd_simhash_pairs: independent NumPy re-derivation OK")
    verify_ann_lsh_cosines(spark)
    print("ann_lsh_topk: independent cosine/ordering check OK")
    verify_embedding_pairs(spark)
    print("dd_embedding_pairs: independent cosine + planted-recall check OK")

    verify_extract_invariants(spark)
    print("kg_extract_triples: independent sha256-lineage check OK")
    verify_stringsim_invariants(spark)
    print("j2/f8 stringsim: independent blocking/bounds checks OK")

    verify_ann_ivf(spark)
    print("ann_ivf_query: independent cosine/self-recovery check OK")
    verify_streaming_minhash(spark)
    print("str_minhash_cands: batch state-machine re-derivation OK")
    verify_ngram_pairs()
    print("dd_ngram_pairs: brute-force gram-set Jaccard check OK")
    verify_streaming_near_dup(spark)
    print("str_near_dup_drop: greedy two-batch re-derivation + planted "
          "recall OK")
    verify_k_core()
    print("g_k_core: independent Python peel check OK")
    verify_label_propagation()
    print("g_label_propagation: independent Python sync-LPA check OK")
    verify_index_dedup()
    print("dd_index_dedup: brute-force cross-split text-Jaccard check OK")
    verify_streaming_index_dedup()
    print("str_index_dedup: two-batch brute-force re-derivation + "
          "planted recall OK")
    verify_ann_ivf_add()
    print("ann_ivf_add: NumPy cosine/self-recovery + delta-membership "
          "check OK")
    verify_str_ivf_ingest()
    print("str_ivf_ingest: row-for-row equality with ann_ivf_add + "
          "NumPy checks OK")
    verify_semantic_dedup()
    print("dd_semantic_dedup: NumPy within-cell component re-derivation "
          "+ transitive-chain recall OK")


def _cooccur_adj_mod20():
    """Adjacency of the mod-20 part co-occurrence graph, straight from
    the parquet (shared by the k-core and LPA verifiers)."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(
        tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()
    ):
        if ok % 20 == 0:
            by_order[ok].add(pk)
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                adj[u].add(v)
                adj[v].add(u)
    return adj


def verify_label_propagation() -> None:
    """Re-run the capped sync LPA in plain Python (same min-label
    tie-break, same 10-round cap, same stability stop) and require the
    oracle rows to match exactly."""
    from collections import Counter

    adj = _cooccur_adj_mod20()
    label = {v: v for v in adj}
    for _ in range(10):
        nxt = {}
        for v in adj:
            cnt = Counter(label[n] for n in adj[v])
            nxt[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        if nxt == label:
            break
        label = nxt
    want = sorted(label.items())
    got = sorted(
        (int(r[0]), int(r[1]))
        for r in duckdb.sql(
            json.load(open(os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "fixtures", "values_oracles.json")))["g_label_propagation"]
        ).fetchall()
    )
    assert got == want, (
        f"LPA mismatch: {len(got)} oracle vs {len(want)} python rows; "
        f"first diff "
        f"{next((p for p in zip(got, want) if p[0] != p[1]), None)}"
    )


def verify_k_core() -> None:
    """Re-derive the 6-core of the mod-20 part-co-occurrence graph with a
    plain-Python peel straight from the parquet (no Spark in the loop)
    and require the oracle's (id, core_degree) rows to match exactly."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(
        tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()
    ):
        if ok % 20 == 0:
            by_order[ok].add(pk)
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                adj[u].add(v)
                adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < 6:
                for n in adj[v]:
                    adj[n].discard(v)
                del adj[v]
                changed = True
    want = sorted((v, len(ns)) for v, ns in adj.items())
    got = sorted(
        (int(r[0]), int(r[1]))
        for r in duckdb.sql(
            json.load(open(os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "fixtures", "values_oracles.json")))["g_k_core"]
        ).fetchall()
    )
    assert got == want, (
        f"k-core mismatch: {len(got)} oracle rows vs {len(want)} python "
        f"rows; first diff "
        f"{next((p for p in zip(got, want) if p[0] != p[1]), None)}"
    )


def verify_ngram_pairs() -> None:
    """Every oracle pair's jaccard recomputed from gram-STRING sets in
    plain Python (no xxhash in the loop); pairs must be a subset of the
    true >=0.5 set; all 10 planted one-token-appended copies recovered."""
    import re

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    for i in range(10):
        texts[i + 1_000_000] = texts[i] + " zyxtoken"

    def grams(text: str) -> frozenset:
        # mirrors shingles(): F.trim strips SPACES only, split on \s+,
        # windows i..i+2 for i in 0..max(T-3,0), array_distinct
        toks = re.split(r"\s+", text.lower().strip(" "))
        return frozenset(
            " ".join(toks[i:i + 3])
            for i in range(max(len(toks) - 3, 0) + 1)
        )

    gsets = {i: grams(t) for i, t in texts.items()}
    names, rows = _oracle_rows("dd_ngram_pairs")
    got = {}
    for r in rows:
        a, b, j = (int(r[names.index("a")]), int(r[names.index("b")]),
                   float(r[names.index("jaccard")]))
        inter = len(gsets[a] & gsets[b])
        union = max(len(gsets[a] | gsets[b]), 1)
        assert abs(inter / union - j) <= 1.5e-6, (a, b, j, inter / union)
        assert j >= 0.5
        got[(a, b)] = j
    ids = sorted(gsets)
    true_pairs = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(gsets[a] & gsets[b])
            if inter and inter / max(len(gsets[a] | gsets[b]), 1) >= 0.5:
                true_pairs.add((a, b))
    assert set(got) <= true_pairs, set(got) - true_pairs
    for i in range(10):
        assert (i, i + 1_000_000) in got, f"planted pair {i} not recovered"


def verify_ann_ivf(spark) -> None:
    """Every oracle row's cosine must equal the NumPy cosine of the
    (query, vector) pair; ranks dense + ordered by (cosine desc, vec_id);
    and since each query vector IS a corpus member whose own cell is its
    top-1 probe, the query itself (cosine 1.0) must come back at rank 1."""
    emb = _load_embeddings()
    names, rows = _oracle_rows("ann_ivf_query")
    per_q: dict[int, list] = {}
    for r in rows:
        q, vid, cos, rank = (
            int(r[names.index("query_id")]), int(r[names.index("vec_id")]),
            float(r[names.index("cosine")]), int(r[names.index("rank")]))
        assert abs(_cos(emb[q], emb[vid]) - cos) <= 1.5e-6, (q, vid, cos)
        per_q.setdefault(q, []).append((rank, cos, vid))
    assert set(per_q) == {0, 1, 2}
    for q, lst in per_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 10
        keys = [(-c, v) for _, c, v in lst]
        assert keys == sorted(keys), f"rank order broken for query {q}"
        assert lst[0][2] == q and abs(lst[0][1] - 1.0) <= 1.5e-6, (
            f"query {q} did not recover itself at rank 1: {lst[0]}")


def verify_ann_ivf_add() -> None:
    """Same invariants as verify_ann_ivf — NumPy-exact cosines, dense
    ranks ordered by (cosine desc, vec_id), rank-1 self-recovery — for
    the add-path gate, where query 0 is an ADDED (%4==0) vector: its
    self-recovery proves the delta was assigned to the cell its own
    query probe looks in. Also requires results to mix added and
    original vectors (the probe scans one merged store)."""
    emb = _load_embeddings()
    names, rows = _oracle_rows("ann_ivf_add")
    per_q: dict[int, list] = {}
    for r in rows:
        q, vid, cos, rank = (
            int(r[names.index("query_id")]), int(r[names.index("vec_id")]),
            float(r[names.index("cosine")]), int(r[names.index("rank")]))
        assert abs(_cos(emb[q], emb[vid]) - cos) <= 1.5e-6, (q, vid, cos)
        per_q.setdefault(q, []).append((rank, cos, vid))
    assert set(per_q) == {0, 1, 2}
    all_vids = set()
    for q, lst in per_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 10
        keys = [(-c, v) for _, c, v in lst]
        assert keys == sorted(keys), f"rank order broken for query {q}"
        assert lst[0][2] == q and abs(lst[0][1] - 1.0) <= 1.5e-6, (
            f"query {q} did not recover itself at rank 1: {lst[0]}")
        all_vids.update(v for _, _, v in lst)
    assert any(v % 4 == 0 for v in all_vids), "no added vectors returned"
    assert any(v % 4 != 0 for v in all_vids), "no original vectors returned"


def verify_str_ivf_ingest() -> None:
    """The streamed fold must be observationally identical to the batch
    fold: the str_ivf_ingest oracle rows must equal ann_ivf_add's as
    multisets (same index content => same probe), and carry the same
    NumPy-exact cosines."""
    emb = _load_embeddings()
    names_a, rows_a = _oracle_rows("ann_ivf_add")
    names_s, rows_s = _oracle_rows("str_ivf_ingest")
    assert names_a == names_s
    assert sorted(map(tuple, rows_a)) == sorted(map(tuple, rows_s)), \
        "streaming fold diverged from the batch fold"
    for r in rows_s:
        q, vid, cos = (int(r[names_s.index("query_id")]),
                       int(r[names_s.index("vec_id")]),
                       float(r[names_s.index("cosine")]))
        assert abs(_cos(emb[q], emb[vid]) - cos) <= 1.5e-6, (q, vid, cos)


def verify_semantic_dedup() -> None:
    """Full NumPy re-derivation of the SemDeDup verdict GIVEN the
    gate's cell assignment: rebuild the planted corpus (+0.02 copies of
    vec_id<12, +0.04 copies of vec_id<6), union-find over the true
    cosine graph restricted to same-cell pairs at τ=0.97, and require
    the oracle's (group_id, keep) to match exactly. Then planted
    recall: each source/near-copy/far-copy triple must share one group
    (reachable only transitively — the far copy's cosine to the source
    is ~0.95 < τ, asserted), and keepers must be group minima."""
    import numpy as np

    emb = _load_embeddings()
    corpus = dict(emb)
    for i in range(12):
        corpus[1_000_000 + i] = emb[i] + 0.02
    for i in range(6):
        corpus[2_000_000 + i] = emb[i] + 0.04

    names, rows = _oracle_rows("dd_semantic_dedup")
    cell_of, group_of, keep_of = {}, {}, {}
    for r in rows:
        vid = int(r[names.index("vec_id")])
        cell_of[vid] = int(r[names.index("cell")])
        group_of[vid] = int(r[names.index("group_id")])
        keep_of[vid] = int(r[names.index("keep")])
    assert set(cell_of) == set(corpus), "verdict must cover every doc"

    by_cell: dict[int, list[int]] = {}
    for vid, c in cell_of.items():
        by_cell.setdefault(c, []).append(vid)
    parent = {v: v for v in corpus}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in by_cell.values():
        members.sort()
        m = np.array([corpus[v] for v in members], dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if sims[i, j] >= 0.97:
                    a, b = find(members[i]), find(members[j])
                    if a != b:
                        lo, hi = min(a, b), max(a, b)
                        parent[hi] = lo
    for vid in corpus:
        assert group_of[vid] == find(vid), (
            f"group mismatch for {vid}: {group_of[vid]} vs {find(vid)}")
        assert keep_of[vid] == int(vid == group_of[vid]), vid

    for i in range(6):
        assert group_of[i] == group_of[1_000_000 + i] \
            == group_of[2_000_000 + i] == i, f"chain {i} split"
        far = _cos(emb[i], corpus[2_000_000 + i])
        assert far < 0.97, (
            f"chain {i} is not transitive-only (cos {far:.4f})")
    for i in range(6, 12):
        assert group_of[1_000_000 + i] == group_of[i] == i


def verify_streaming_minhash(spark) -> None:
    """Re-derive the expected candidate set from the BATCH signature
    operator in plain Python: bucket docs per band by the TUPLE of the
    band's signature slice (bucket equality == band-hash equality modulo
    xxhash collisions), emit every intra-bucket pair whose equal-component
    fraction >= threshold. The streaming state machine must produce
    exactly this set regardless of microbatch boundaries."""
    from pyspark.sql import functions as F

    from nous_spark.operators.dedup import minhash_signatures, shingles

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 250)
    )
    sig_rows = minhash_signatures(shingles(docs)).collect()
    sigs = {int(r.id): list(r.signature) for r in sig_rows}
    bands, rpb, thr = 8, 4, 0.8
    want = set()
    for band in range(bands):
        buckets: dict[tuple, list[int]] = {}
        for i, s in sigs.items():
            buckets.setdefault(tuple(s[band * rpb:(band + 1) * rpb]), []).append(i)
        for ids in buckets.values():
            ids.sort()
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    a, b = ids[x], ids[y]
                    est = sum(
                        u == v for u, v in zip(sigs[a], sigs[b])
                    ) / len(sigs[a])
                    if est >= thr:
                        want.add((band, a, b, round(est, 6)))
    names, rows = _oracle_rows("str_minhash_cands")
    got = {
        (int(r[names.index("band")]), int(r[names.index("a")]),
         int(r[names.index("b")]), round(float(r[names.index("est_jaccard")]), 6))
        for r in rows
    }
    assert got == want, (
        f"streaming minhash oracle != batch re-derivation: "
        f"only-oracle={got - want} only-batch={want - got}")


def verify_streaming_near_dup(spark) -> None:
    """Re-derive the gate's two-batch keep/drop sequence in plain Python
    from the BATCH signature operator: batch-1 keepers = min-id per
    union-find component over band-bucket candidates; batch-2 docs
    est-matching any batch-1 KEPT signature are dropped first, survivors
    get the same within-batch keeper pass. The filter's distributed
    joins must reproduce this exactly, and the planted trailing-token
    replicas must actually be dropped (recall check)."""
    from pyspark.sql import functions as F

    from nous_spark.operators.dedup import minhash_signatures, shingles

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 160).select("doc_id", "text")
    )
    rows = {int(r.doc_id): r.text for r in docs.collect()}
    b1 = {i: t for i, t in rows.items() if i < 80}
    rep = {}
    for i, t in rows.items():
        if i < 26:
            ws = [w for w in t.strip().split() if w]
            rep[i + 20_000] = " ".join(ws[:max(len(ws) - 1, 1)]) if ws else ""
    b2 = {i: t for i, t in rows.items() if i >= 80}
    b2.update(rep)

    def sig_map(batch: dict) -> dict:
        df = spark.createDataFrame(
            sorted(batch.items()), ["doc_id", "text"])
        return {int(r.id): list(r.signature)
                for r in minhash_signatures(shingles(df)).collect()}

    bands, rpb, thr = 8, 4, 0.7

    def est(a, b):
        return sum(x == y for x, y in zip(a, b)) / len(a)

    def bucket_pairs(sigs):
        pairs = set()
        for band in range(bands):
            buckets: dict[tuple, list[int]] = {}
            for i, s in sigs.items():
                buckets.setdefault(
                    tuple(s[band * rpb:(band + 1) * rpb]), []).append(i)
            for ids in buckets.values():
                for x in range(len(ids)):
                    for y in range(x + 1, len(ids)):
                        a, b = sorted((ids[x], ids[y]))
                        if est(sigs[a], sigs[b]) >= thr:
                            pairs.add((a, b))
        return pairs

    def keepers(sigs):
        parent = {i: i for i in sigs}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in bucket_pairs(sigs):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min id per component
        by_root: dict[int, int] = {}
        for i in sigs:
            r = find(i)
            by_root[r] = min(by_root.get(r, i), i)
        return {i for i in sigs if by_root[find(i)] == i}

    sig1, sig2 = sig_map(b1), sig_map(b2)
    kept0 = keepers(sig1)
    frontier = {i: sig1[i] for i in kept0}
    dropped_cross = set()
    for band in range(bands):
        fb: dict[tuple, list[int]] = {}
        for i, s in frontier.items():
            fb.setdefault(tuple(s[band * rpb:(band + 1) * rpb]), []).append(i)
        for i, s in sig2.items():
            for j in fb.get(tuple(s[band * rpb:(band + 1) * rpb]), []):
                if est(s, frontier[j]) >= thr:
                    dropped_cross.add(i)
    surv = {i: s for i, s in sig2.items() if i not in dropped_cross}
    kept1 = keepers(surv)

    want = {(i, 0) for i in kept0} | {(i, 1) for i in kept1}
    names, orows = _oracle_rows("str_near_dup_drop")
    got = {(int(r[names.index("doc_id")]), int(r[names.index("batch")]))
           for r in orows}
    assert got == want, (
        f"str_near_dup_drop oracle != re-derivation: "
        f"only-oracle={got - want} only-derived={want - got}")
    planted = set(rep)
    dropped_planted = planted - kept1
    assert len(dropped_planted) >= 0.8 * len(planted), (
        f"planted cross-batch near-dups mostly survived: "
        f"{len(dropped_planted)}/{len(planted)} dropped")


def verify_g7_against_numpy(spark) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    sim = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(F.col("a.l_suppkey").alias("src"),
                 F.col("b.l_suppkey").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )
    edges = [(int(r.src), int(r.dst), float(r.weight)) for r in sim.collect()]
    ids = sorted({v for e in edges for v in e[:2]})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] = max(W[idx[s], idx[d]], w)
        W[idx[d], idx[s]] = max(W[idx[d], idx[s]], w)
    deg = W.sum(axis=1)
    # same seeded-hash init as the operator (xxhash64 folded to [0,1)) —
    # fetch it from Spark so both engines iterate the same vector
    init = {
        int(r.id): float(r.v)
        for r in spark.createDataFrame([(i,) for i in ids], ["id"]).select(
            "id",
            (F.pmod(F.xxhash64("id", F.lit(42)), F.lit(1 << 30))
             .cast("double") / float(1 << 30)).alias("v"),
        ).collect()
    }
    v = np.array([init[i] for i in ids])
    for _ in range(6):  # gate uses max_iter=6
        v = (W @ v) / np.where(deg > 0, deg, 1.0)
    v = v / np.abs(v).sum()
    k = 4
    qs_ = np.quantile(v, [(i + 0.5) / k for i in range(k)])
    cents = sorted(set(float(c) for c in qs_))
    while len(cents) < k:
        cents.append(cents[-1] + 1e-9 * (len(cents) + 1))
    for _ in range(10):
        assign = np.argmin(np.abs(v[:, None] - np.array(cents)[None, :]), axis=1)
        new = [float(v[assign == i].mean()) if (assign == i).any() else cents[i]
               for i in range(len(cents))]
        if new == cents:
            break
        cents = new
    assign = np.argmin(np.abs(v[:, None] - np.array(cents)[None, :]), axis=1)
    np_groups = {}
    for vid, c in zip(ids, assign):
        np_groups.setdefault(int(c), set()).add(vid)

    rel = duckdb.sql(json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "values_oracles.json")))["g7_pic"])
    oracle_groups = {}
    for vid, c in rel.fetchall():
        oracle_groups.setdefault(int(c), set()).add(int(vid))
    got = sorted(sorted(g) for g in oracle_groups.values())
    want = sorted(sorted(g) for g in np_groups.values())
    assert got == want, (
        f"g7 VALUES oracle partition != independent NumPy PIC:\n"
        f" oracle={got}\n numpy ={want}")


def _oracle_rows(gate: str):
    sql = json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "values_oracles.json")))[gate]
    rel = duckdb.sql(sql)
    return rel.columns, rel.fetchall()


def _close(a, b, tol=1.5e-6) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        return a is not None and b is not None and abs(a - b) <= tol
    return a == b


def verify_mm_against_source() -> None:
    """Expected stats computed from the seeded source arrays directly."""
    import hashlib

    import numpy as np

    # image gate: 16 seeded RGB arrays, stats must round-trip exactly
    names, rows = _oracle_rows("mm_image_stats")
    got = {r[names.index("media_id")]: r for r in rows}
    for i in range(16):
        img = np.random.default_rng(i).integers(
            0, 256, (8 + i % 5, 12 + i % 3, 3), dtype=np.uint8
        )
        want = (i, 12 + i % 3, 8 + i % 5, 3, round(float(img.mean()), 6),
                hashlib.sha256(img.tobytes()).hexdigest())
        r = got[i]
        g = tuple(r[names.index(c)] for c in
                  ("media_id", "width", "height", "channels",
                   "mean_intensity", "pixel_sha"))
        assert all(_close(a, b) for a, b in zip(g, want)), (g, want)

    # audio gate: source floats → documented 16-bit PCM quantization
    names, rows = _oracle_rows("mm_audio_stats")
    got = {r[names.index("media_id")]: r for r in rows}
    for i in range(12):
        rng = np.random.default_rng(100 + i)
        x = rng.uniform(-0.7, 0.7, (500 + 50 * i, 1 + i % 2))
        q = np.clip(x * 32768.0, -32768, 32767).astype("<i2") / 32768.0
        rate = 8000 * (1 + i % 2)
        want = (i, rate, 1 + i % 2, 500 + 50 * i,
                round(1000.0 * (500 + 50 * i) / rate, 6),
                round(float(np.sqrt((q ** 2).mean())), 6),
                round(float(np.abs(q).max()), 6))
        r = got[i]
        g = tuple(r[names.index(c)] for c in
                  ("media_id", "sample_rate", "n_channels", "n_frames",
                   "duration_ms", "rms", "peak"))
        assert all(_close(a, b) for a, b in zip(g, want)), (g, want)

    # video gate: luma planes are the source array itself
    names, rows = _oracle_rows("mm_video_stats")
    got = {r[names.index("media_id")]: r for r in rows}
    for i in range(10):
        rng = np.random.default_rng(200 + i)
        frames = rng.integers(
            0, 256, (3 + i % 4, 6 + i % 3, 8 + i % 5), dtype=np.uint8
        )
        want = (i, 8 + i % 5, 6 + i % 3, 3 + i % 4, 10.0,
                round(1000.0 * (3 + i % 4) / 10.0, 6),
                round(float(frames.mean()), 6),
                hashlib.sha256(frames.tobytes()).hexdigest())
        r = got[i]
        g = tuple(r[names.index(c)] for c in
                  ("media_id", "width", "height", "n_frames", "fps",
                   "duration_ms", "mean_luma", "luma_sha"))
        assert all(_close(a, b) for a, b in zip(g, want)), (g, want)


def verify_lp_sequential(spark) -> None:
    """Sequential driver-side re-execution of the lp gate's training
    (same block partition + seeds, no applyInPandas / toPandas in the
    loop) + plain-NumPy sampled evaluation; metrics must equal the
    VALUES oracle to the gate's 9-dp rounding."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from nous_spark.operators.link_prediction import _init_factors, _sgd_block

    n_items, k, epochs, steps, n_blocks, seed = 24, 6, 2, 30, 4, 3
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(F.col("o_custkey") < 60)
    inter = o.select(
        F.col("o_custkey").cast("long").alias("user"),
        F.pmod(F.col("o_orderkey"), F.lit(24)).cast("long").alias("item"),
    ).dropDuplicates()
    test_df = inter.filter(F.pmod(F.col("user") + F.col("item"), F.lit(5)) == 0)
    train_df = inter.subtract(test_df)
    train = sorted((int(r.user), int(r.item)) for r in train_df.collect())
    test = sorted((int(r.user), int(r.item)) for r in test_df.collect())

    users = sorted({u for u, _ in train})
    items_of: dict[int, list[int]] = {}
    for u, it in train:
        items_of.setdefault(u, []).append(it)
    # block ids per epoch come from Spark's xxhash64, fetched once
    u_df = spark.createDataFrame([(u,) for u in users], ["user"])
    blocks = {}
    for ep in range(epochs):
        blocks[ep] = {
            int(r.user): int(r.b)
            for r in u_df.select(
                "user",
                F.pmod(F.xxhash64("user", F.lit(ep)), F.lit(n_blocks)).alias("b"),
            ).collect()
        }

    P = {
        u: np.random.default_rng(seed * 100003 + u).normal(0.0, 0.1, k)
        for u in users
    }
    Q = _init_factors(n_items, k, seed + 1)
    B = _init_factors(n_items, 1, seed + 2)[:, 0]
    for ep in range(epochs):
        ep_seed = seed + 7919 * (ep + 1)
        all_deltas = []
        newP = {}
        for b in range(n_blocks):
            bu = [u for u in users if blocks[ep][u] == b]
            if not bu:
                continue
            pdf = pd.DataFrame({
                "user": bu,
                "items": [sorted(set(items_of[u])) for u in bu],
                "friend_items": [None] * len(bu),
                "factors": [P[u].tolist() for u in bu],
            })
            out = _sgd_block(pdf, Q, B, n_items, 0.02, 0.005, steps, ep_seed)
            for r in out.itertuples():
                if r.kind == 0:
                    newP[int(r.idx)] = np.array(r.vec)
                else:
                    all_deltas.append((r.kind, int(r.idx), tuple(r.vec)))
        P = newP
        for kind, idx, vec in sorted(all_deltas):
            if kind == 1:
                Q[idx] += np.array(vec) / n_blocks
            else:
                B[idx] += vec[0] / n_blocks

    # sampled evaluation, plain NumPy (top_n=5, K=12, seed=17)
    K, top_n, eseed = 12, 5, 17
    test_of: dict[int, list[int]] = {}
    for u, it in test:
        test_of.setdefault(u, []).append(it)
    hr, rr, auc, active = 0, 0.0, 0.0, 0
    for u in sorted(test_of):
        pu = P.get(u)
        if pu is None:
            continue
        excl = set(items_of.get(u, ())) | set(test_of[u])
        for t in sorted(test_of[u]):
            rng = np.random.default_rng((eseed, u, t))
            negs: list[int] = []
            while len(negs) < K:
                cand = rng.integers(0, n_items, 4 * K)
                negs.extend(int(c) for c in cand if int(c) not in excl)
                if len(excl) >= n_items:
                    break
            if not negs:
                continue
            na = np.array(negs[:K], dtype=np.int64)
            st = float(Q[t] @ pu + B[t])
            sn = Q[na] @ pu + B[na]
            below = (sn < st) | ((sn == st) & (na > t))
            active += 1
            auc += float(below.sum()) / len(na)
            rank = 1 + int((~below).sum())
            if rank <= top_n:
                hr += 1
                rr += 1.0 / rank
    want = (round(hr / max(len(test), 1), 9),
            round(rr / max(len(test), 1), 9),
            round(auc / max(active, 1), 9))
    names, rows = _oracle_rows("lp_bpr_metrics")
    got = tuple(rows[0][names.index(c)] for c in ("hr", "arhr", "auc"))
    assert all(_close(a, b, 1e-9) for a, b in zip(got, want)), (got, want)


def _doc_shingle_sets() -> dict[int, frozenset]:
    """True word-3-gram STRING shingle sets per doc, pure Python (no
    Spark, no hashing) — mirrors shingles()'s gram definition: lowercase,
    trim, split on whitespace, grams at i=0..max(len-3,0)."""
    import re

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = {}
    for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = re.split(r"\s+", (text or "").strip().lower())
        grams = {
            " ".join(toks[i:i + 3]) for i in range(max(len(toks) - 3, 0) + 1)
        }
        out[int(did)] = frozenset(grams)
    return out


def verify_minhash_against_text(spark) -> None:
    """Full brute-force verification: the oracle pair set must EQUAL the
    set of all O(n²) document pairs whose TRUE string-shingle Jaccard is
    >= 0.8 (pure Python, no Spark, no hashing — hash-set Jaccard differs
    only on 64-bit collisions), with matching jaccard values."""
    sets = _doc_shingle_sets()
    names, rows = _oracle_rows("dd_minhash_pairs")
    got = {}
    for r in rows:
        a, b, j = (r[names.index(c)] for c in ("a", "b", "jaccard"))
        got[(int(a), int(b))] = float(j)
    assert got, "empty minhash oracle"
    ids = sorted(sets)
    want = {}
    for i in range(len(ids)):
        for k in range(i + 1, len(ids)):
            sa, sb = sets[ids[i]], sets[ids[k]]
            inter = len(sa & sb)
            if not inter:
                continue
            j = inter / len(sa | sb)
            if j >= 0.8:
                want[(ids[i], ids[k])] = j
    assert set(got) == set(want), (
        f"only-oracle={set(got) - set(want)} only-brute={set(want) - set(got)}")
    for p, j in got.items():
        assert abs(want[p] - j) <= 1e-4, (p, j, want[p])


def verify_index_dedup() -> None:
    """Brute-force verification of the incremental path: the oracle's
    (new_id, index_id) pairs must EQUAL every cross-split pair (new =
    doc_id %% 3 == 0 vs corpus = the rest) whose TRUE string-shingle
    Jaccard is >= 0.7 — pure Python, no Spark, no hashing. At the
    corpus's dup rates every such pair collides in at least one band
    (all observed pairs sit >= 0.9), so LSH recall is exact here and
    set EQUALITY is the right assertion, not subset."""
    sets = _doc_shingle_sets()
    names, rows = _oracle_rows("dd_index_dedup")
    got = {}
    for r in rows:
        a, b, j = (r[names.index(c)]
                   for c in ("new_id", "index_id", "jaccard"))
        got[(int(a), int(b))] = float(j)
    assert got, "empty index-dedup oracle"
    want = {}
    ids = sorted(sets)
    for a in ids:
        if a % 3 != 0:
            continue
        for b in ids:
            if b % 3 == 0:
                continue
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            if not inter:
                continue
            j = inter / len(sa | sb)
            if j >= 0.7:
                want[(a, b)] = j
    assert set(got) == set(want), (
        f"only-oracle={set(got) - set(want)} "
        f"only-brute={set(want) - set(got)}")
    for p, j in got.items():
        assert abs(want[p] - j) <= 1e-4, (p, j, want[p])


def verify_streaming_index_dedup() -> None:
    """Pure-Python re-derivation of the whole streaming run: rebuild the
    gate's batches (index = %3==1; batch 1 = %3==0; batch 2 = %3==2 plus
    +10M drop-last replicas of the two smallest batch-1 docs and +20M
    replicas of its own two smallest), then enumerate every pair (new,
    pred) with TRUE string-shingle Jaccard >= 0.7 where pred precedes
    new — in the index, an earlier batch, or the same batch with a
    smaller id (the operator's greatest/least arrival convention). The
    oracle pair set must EQUAL that; same exact-recall argument as
    verify_index_dedup (all observed pairs sit >= 0.9). Also asserts the
    planted replicas were each caught against their source doc."""
    import re

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    texts = {int(d): (t or "") for d, t in
             zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())}

    def shingle_set(text: str) -> frozenset:
        toks = re.split(r"\s+", text.strip().lower())
        return frozenset(
            " ".join(toks[i:i + 3])
            for i in range(max(len(toks) - 3, 0) + 1))

    def drop_last(text: str) -> str:
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        return " ".join(toks[:-1] if len(toks) > 1 else toks[:1])

    index_ids = sorted(i for i in texts if i % 3 == 1)
    b1_ids = sorted(i for i in texts if i % 3 == 0)
    b2n_ids = sorted(i for i in texts if i % 3 == 2)
    all_texts = dict(texts)
    for s in b1_ids[:2]:
        all_texts[s + 10_000_000] = drop_last(texts[s])
    for s in b2n_ids[:2]:
        all_texts[s + 20_000_000] = drop_last(texts[s])
    b2_ids = sorted(b2n_ids + [s + 10_000_000 for s in b1_ids[:2]]
                    + [s + 20_000_000 for s in b2n_ids[:2]])
    sets = {i: shingle_set(t) for i, t in all_texts.items()}

    def jac(a, b):
        inter = len(sets[a] & sets[b])
        return inter / len(sets[a] | sets[b]) if inter else 0.0

    want = {}
    for batch, preds in ((b1_ids, index_ids),
                         (b2_ids, index_ids + b1_ids)):
        for x in batch:
            for p in preds:
                j = jac(x, p)
                if j >= 0.7:
                    want[(x, p)] = j
            for y in batch:
                if y < x:
                    j = jac(x, y)
                    if j >= 0.7:
                        want[(x, y)] = j

    names, rows = _oracle_rows("str_index_dedup")
    got = {}
    for r in rows:
        a, b, j = (r[names.index(c)]
                   for c in ("new_id", "index_id", "jaccard"))
        got[(int(a), int(b))] = float(j)
    assert set(got) == set(want), (
        f"only-oracle={set(got) - set(want)} "
        f"only-brute={set(want) - set(got)}")
    for p, j in got.items():
        assert abs(want[p] - j) <= 1e-4, (p, j, want[p])
    for s in b1_ids[:2]:
        assert (s + 10_000_000, s) in got, f"cross-batch replica {s} missed"
    for s in b2n_ids[:2]:
        assert (s + 20_000_000, s) in got, f"within-batch replica {s} missed"


def verify_simhash_against_numpy(spark) -> None:
    """Full pair-set equality vs a NumPy re-derivation of the banded
    SimHash pipeline. Spark supplies only the primitive per-token
    xxhash64 values; sign-sum packing, banding, candidate generation and
    hamming verify are all recomputed in NumPy."""
    import numpy as np
    import re

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    all_toks = set()
    doc_toks = {}
    for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = re.split(r"\s+", (text or "").strip().lower())
        doc_toks[int(did)] = toks
        all_toks.update(toks)
    tok_list = sorted(all_toks)
    h = {
        r.t: int(r.h)
        for r in spark.createDataFrame([(t,) for t in tok_list], ["t"])
        .select("t", F.xxhash64("t").alias("h")).collect()
    }
    tok_bits = {
        t: np.array([(h[t] >> b) & 1 for b in range(64)], dtype=np.int64) * 2 - 1
        for t in tok_list
    }
    sim = {}
    for did, toks in doc_toks.items():
        sums = np.zeros(64, dtype=np.int64)
        for t in toks:
            sums += tok_bits[t]
        val = 0
        for b in range(64):
            if sums[b] > 0:
                val |= 1 << b
        sim[did] = val
    width = 64 // 4
    buckets: dict[tuple, list[int]] = {}
    for did, s in sim.items():
        for b in range(4):
            buckets.setdefault((b, (s >> (b * width)) & ((1 << width) - 1)),
                               []).append(did)
    want = {}
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                a, b = ids[i], ids[k]
                ham = bin(sim[a] ^ sim[b]).count("1")
                if ham <= 3:
                    want[(a, b)] = ham
    names, rows = _oracle_rows("dd_simhash_pairs")
    got = {
        (int(r[names.index("a")]), int(r[names.index("b")])):
            int(r[names.index("hamming")])
        for r in rows
    }
    assert got == want, (
        f"simhash oracle != NumPy: only-oracle={set(got) - set(want)} "
        f"only-numpy={set(want) - set(got)}")


def _load_embeddings():
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    return {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist())
    }


def _cos(u, v) -> float:
    import numpy as np

    nu, nv = np.linalg.norm(u), np.linalg.norm(v)
    if nu == 0 or nv == 0:
        return 0.0
    return float(u @ v / (nu * nv))


def verify_ann_lsh_cosines(spark) -> None:
    """Every oracle row's cosine must equal the NumPy cosine of that
    (query, vector) pair; ranks must be dense and ordered by
    (cosine desc, vec_id) within each query, at most k=10 per query."""
    emb = _load_embeddings()
    names, rows = _oracle_rows("ann_lsh_topk")
    per_q: dict[int, list] = {}
    for r in rows:
        q, vid, cos, rank = (
            int(r[names.index("query_id")]), int(r[names.index("vec_id")]),
            float(r[names.index("cosine")]), int(r[names.index("rank")]))
        assert abs(_cos(emb[q], emb[vid]) - cos) <= 1.5e-6, (q, vid, cos)
        per_q.setdefault(q, []).append((rank, cos, vid))
    assert set(per_q) == {0, 1, 2}
    for q, lst in per_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 10
        keys = [(-c, v) for _, c, v in lst]
        assert keys == sorted(keys), f"rank order broken for query {q}"


def verify_embedding_pairs(spark) -> None:
    """Every oracle pair's cosine recomputed in NumPy (>= 0.9), and all
    10 planted near-dup pairs (vec_id+1e6 shifted copies, the gate's
    construction) recovered."""
    import numpy as np

    emb = _load_embeddings()
    planted = {
        i + 1_000_000: emb[i] + 0.02 for i in range(10)
    }
    allv = dict(emb)
    allv.update(planted)
    names, rows = _oracle_rows("dd_embedding_pairs")
    got = {}
    for r in rows:
        a, b, cos = (int(r[names.index("a")]), int(r[names.index("b")]),
                     float(r[names.index("cosine")]))
        got[(a, b)] = cos
        assert abs(_cos(allv[a], allv[b]) - cos) <= 1.5e-6, (a, b, cos)
        assert cos >= 0.9
    for i in range(10):
        assert (i, i + 1_000_000) in got, f"planted pair {i} not recovered"


def verify_extract_invariants(spark) -> None:
    """The north rule's per-row lineage invariant, checked from the SOURCE
    table with no engine code: every oracle row's content_sha must equal
    hashlib.sha256 of the doc text it cites (src = 'corpus/<doc_id>'),
    and every source doc must be accounted for (its sha appears or it
    legitimately produced no triples — bounded by the doc count)."""
    import hashlib

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sha_of = {
        str(did): hashlib.sha256((text or "").encode()).hexdigest()
        for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    names, rows = _oracle_rows("kg_extract_triples")
    assert rows, "empty extraction oracle"
    i_src = names.index("src")
    i_sha = names.index("content_sha")
    seen_docs = set()
    for r in rows:
        doc = r[i_src].split("/", 1)[1]
        assert sha_of[doc] == r[i_sha], (r[i_src], r[i_sha])
        seen_docs.add(doc)
    assert len(seen_docs) > len(sha_of) * 0.5, "most docs produced nothing"


def verify_stringsim_invariants(spark) -> None:
    """Engine-free invariants: every J2 candidate's mention must share a
    lowercase token with its entity label (the blocking contract), sims
    and confs lie in [0, 1], and F8 pairs consecutive part keys."""
    import re

    names, rows = _oracle_rows("j2_candidate_pairs_stringsim")
    assert rows
    i_m, i_l, i_s = (names.index(c) for c in
                     ("mention", "entity_label", "name_sim"))
    for r in rows:
        toks_m = set(re.split(r"[ _,$]", r[i_m].lower())) - {""}
        toks_l = set(re.split(r"[ _,$]", r[i_l].lower())) - {""}
        assert toks_m & toks_l, (r[i_m], r[i_l])
        assert 0.0 <= r[i_s] <= 1.0
    names, rows = _oracle_rows("f8_string_sim")
    assert rows
    i_a, i_b, i_s = (names.index(c) for c in ("id_a", "id_b", "sim"))
    for r in rows:
        assert r[i_b] == r[i_a] + 1
        assert 0.0 <= r[i_s] <= 1.0


if __name__ == "__main__":
    main()
