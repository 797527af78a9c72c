"""Triple extraction as a Spark operator (flagship stage, SURVEY.md §3.1).

Replaces the reference's per-file CoreNLP flatMap (GraphBuilder.scala:34-57,
TripleParser.scala:339-402) with one ``mapInPandas`` pass: Arrow batches of
content blobs in, exploded triple rows out. No per-row Python, no JVM NLP
dependency, no double file read.

Scale notes:
  * sha256 is computed JVM-side (``F.sha2``) before the UDF — the invariant
    column is born at the scan and carried through, never recomputed in Python.
  * The longest-object purge (N6) is applied inside the UDF per document —
    its grouping keys (doc, subj, pred) never span documents, so doing it
    map-side removes an entire shuffle of the triples table. A DataFrame
    window variant is exposed in operators/filters.py for generic use.
  * Output is partition-preserving: a 100 TB scan fans out to triples with
    zero shuffles before the write.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nous_spark.schemas import TRIPLE_SCHEMA

PROSE_LANGS = {"markdown", "md", "text", "txt", "rst", "html", "en"}


def _extract_batches(
    batches: Iterator[pd.DataFrame], fancy: bool, code_mode: bool
) -> Iterator[pd.DataFrame]:
    # imports inside the worker function: ship only stdlib + our package
    from nous_spark.nlp.code_extract import extract_code_document
    from nous_spark.nlp.relations import extract_document

    cols = ["subj", "pred", "obj", "conf", "kind",
            "repo", "path", "commit", "src", "content_sha"]
    for pdf in batches:
        out: list[tuple] = []
        for row in pdf.itertuples(index=False):
            repo = getattr(row, "repo", "")
            path = getattr(row, "path", "")
            commit = getattr(row, "commit", "")
            lang = (getattr(row, "lang", "") or "").lower()
            content = getattr(row, "content", "") or ""
            sha = getattr(row, "content_sha", "")
            src = f"{repo}/{path}" if repo or path else str(getattr(row, "doc_id", ""))
            if code_mode:
                # prose langs fall through to extract_code_document's prose
                # branch, so every file still gets its file-entity triples
                mentions, triples = extract_code_document(repo, path, lang, content, fancy)
            else:
                mentions, triples = extract_document(content, fancy=fancy)
            for tag, phrase in mentions:
                out.append((phrase, "rdf:type", tag, 1.0, "type",
                            repo, path, commit, src, sha))
            for t in triples:
                out.append((t.subj, t.pred, t.obj, t.conf, "rel",
                            repo, path, commit, src, sha))
        yield pd.DataFrame(out, columns=cols)


def with_content_sha(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach the per-row invariant column sha256(content), JVM-side."""
    return df.withColumn("content_sha", F.sha2(F.col(content_col), 256))


def extract_triples(
    source: DataFrame,
    fancy: bool = False,
    code_mode: bool = True,
    lang_filter: str | list[str] | None = None,
) -> DataFrame:
    """source(repo,path,commit,lang,content[,content_sha]) → triples DF.

    ``lang_filter`` applies the S6 language filter declaratively (pushed to
    the parquet scan by Catalyst).
    """
    df = source
    if lang_filter is not None:
        langs = [lang_filter] if isinstance(lang_filter, str) else list(lang_filter)
        df = df.filter(F.col("lang").isin(langs))
    if "content_sha" not in df.columns:
        df = with_content_sha(df)
    return df.mapInPandas(
        lambda it: _extract_batches(it, fancy, code_mode), schema=TRIPLE_SCHEMA
    )


def type_triples(triples: DataFrame) -> DataFrame:
    """N7 view: the rdf:type rows (TripleParser.scala:331-337)."""
    return triples.filter(F.col("pred") == "rdf:type")


def relation_triples(triples: DataFrame) -> DataFrame:
    return triples.filter(F.col("kind") == "rel")
