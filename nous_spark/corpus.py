"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the north-rule input table
``(repo, path, commit, lang, content)`` with a fixed seed: code files
(python/java/scala/go) built from templates — imports, defs, calls — whose
docstrings/comments carry English sentences in the extractor's grammar, plus
markdown files of pure prose. Used by unit tests, the correctness gate and
the bench harness (scaled by ``n_files``).
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

_MODULES = ["os", "sys", "json", "numpy", "pandas", "requests", "logging",
            "collections", "itertools", "pathlib", "hashlib", "re"]
_JVM_PKGS = ["java.util.List", "java.io.File", "scala.collection.Map",
             "org.apache.spark.sql.DataFrame", "com.example.core.Engine"]
_GO_PKGS = ["fmt", "os", "strings", "net/http", "encoding/json"]
_FUNCS = ["load_data", "parse_row", "build_index", "run_query", "merge_parts",
          "emit_metrics", "hash_key", "scan_table", "write_shard", "plan_join"]
_CLASSES = ["Engine", "Parser", "Indexer", "Planner", "Catalog", "Shard"]
_CALLEES = ["connect", "flush", "validate", "serialize", "compact", "rebalance"]

_ORGS = ["Aerialtronics", "Google", "Microsoft", "Boeing", "DroneWorks",
         "SkyData", "Cloudline"]
_PLACES = ["Atlanta", "Europe", "United States", "Seattle", "London", "Tokyo",
           "Berlin", "California", "Hawaii"]
_PEOPLE = ["Obama", "Alice", "Bob", "Mary", "John", "Sarah", "David"]
_MONTHS = ["April", "May", "January", "October"]
_THINGS = ["tour", "exhibitions", "conference", "workshop", "summit",
           "trade show", "product launch", "field test"]

_SENT_TEMPLATES = [
    "{org} is back on {thing} with four {thing2} in the {place} in {month}.",
    "{person} was born in {place}.",
    "{org} was founded in {place} in {month}.",
    "The {thing} is in {place} with the {org} team.",
    "{org} is based in {place}.",
    "The {org} office is in {place}.",
    "{person} is with {org} in {place}.",
    "The {thing} in {place} is on schedule in {month}.",
]


def _sentence(rng: random.Random) -> str:
    t = rng.choice(_SENT_TEMPLATES)
    return t.format(
        org=rng.choice(_ORGS), person=rng.choice(_PEOPLE),
        place=rng.choice(_PLACES), month=rng.choice(_MONTHS),
        thing=rng.choice(_THINGS), thing2=rng.choice(_THINGS),
    )


def _python_file(rng: random.Random) -> str:
    """~2-6 KB file: realistic size for source corpora (imports, multiple
    defs with bodies, classes, docstring + comment prose)."""
    mods = rng.sample(_MODULES, rng.randint(2, 6))
    funcs = rng.sample(_FUNCS, rng.randint(3, 8))
    classes = rng.sample(_CLASSES, rng.randint(1, 3))
    lines = [f'"""{_sentence(rng)} {_sentence(rng)}"""', ""]
    lines += [f"import {m}" for m in mods]
    lines.append("")
    for fn in funcs:
        lines.append(f"def {fn}(x, limit={rng.randint(1, 99)}):")
        lines.append(f"    # {_sentence(rng)}")
        lines.append(f"    acc = []")
        for _ in range(rng.randint(2, 6)):
            lines.append(f"    acc.append({rng.choice(_CALLEES + _FUNCS)}(x, limit))")
        lines.append(f"    total = sum(len(str(a)) for a in acc)")
        lines.append(f"    if total > limit:")
        lines.append(f"        return {rng.choice(_CALLEES)}(acc)")
        lines.append(f"    return acc")
        lines.append("")
    for cls in classes:
        lines.append(f"class {cls}:")
        lines.append(f'    """{_sentence(rng)}"""')
        lines.append(f"    def run(self, n={rng.randint(1, 9)}):")
        lines.append(f"        return {funcs[0]}(n)")
        lines.append(f"    def close(self):")
        lines.append(f"        # {_sentence(rng)}")
        lines.append(f"        return {rng.choice(_CALLEES)}(self)")
        lines.append("")
    return "\n".join(lines)


def _scala_file(rng: random.Random) -> str:
    pkgs = rng.sample(_JVM_PKGS, rng.randint(2, 4))
    classes = rng.sample(_CLASSES, rng.randint(1, 3))
    funcs = rng.sample(_FUNCS, rng.randint(3, 7))
    lines = [f"// {_sentence(rng)}"] + [f"import {p}" for p in pkgs] + [""]
    for cls in classes:
        lines.append(f"object {cls} {{")
        for fn in funcs:
            lines.append(f"  // {_sentence(rng)}")
            lines.append(f"  def {fn}(n: Int): Int = {{")
            lines.append(f"    val parts = (0 until n).map(i => {rng.choice(_CALLEES)}(i))")
            lines.append(f"    parts.foldLeft({rng.randint(0, 9)})(_ + _)")
            lines.append("  }")
        lines.append("}")
        lines.append("")
    return "\n".join(lines)


def _go_file(rng: random.Random) -> str:
    funcs = [f.title().replace("_", "") for f in rng.sample(_FUNCS, rng.randint(3, 7))]
    lines = ["package main", ""]
    lines += [f'import "{p}"' for p in rng.sample(_GO_PKGS, rng.randint(2, 4))]
    lines.append("")
    for fn in funcs:
        lines.append(f"// {_sentence(rng)}")
        lines.append(f"func {fn}(n int) int {{")
        lines.append(f"\tacc := {rng.randint(0, 9)}")
        lines.append(f"\tfor i := 0; i < n; i++ {{")
        lines.append(f"\t\tacc += {rng.choice(_CALLEES + _FUNCS)}(i)")
        lines.append("\t}")
        lines.append("\treturn acc")
        lines.append("}")
        lines.append("")
    return "\n".join(lines)


def _markdown_file(rng: random.Random) -> str:
    paras = []
    for _ in range(rng.randint(4, 10)):
        paras.append(" ".join(_sentence(rng) for _ in range(rng.randint(1, 3))))
    return "\n\n".join(paras)


def generate_corpus(n_files: int = 500, seed: int = 42) -> pd.DataFrame:
    """Deterministic (repo, path, commit, lang, content) pandas frame."""
    rng = random.Random(seed)
    rows = []
    gens = [("python", "py", _python_file), ("scala", "scala", _scala_file),
            ("go", "go", _go_file), ("markdown", "md", _markdown_file)]
    for i in range(n_files):
        repo = f"org/proj{i % max(1, n_files // 20)}"
        lang, ext, gen = gens[rng.randint(0, len(gens) - 1)]
        path = f"src/{rng.choice(['main', 'lib', 'util', 'core'])}/f{i}.{ext}"
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, gen(rng)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_df(spark, n_files: int = 500, seed: int = 42, partitions: int | None = None):
    """Spark DataFrame of the synthetic corpus (Arrow-converted)."""
    from nous_spark.schemas import SOURCE_SCHEMA

    df = spark.createDataFrame(generate_corpus(n_files, seed), schema=SOURCE_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df
