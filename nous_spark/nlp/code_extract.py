"""Deterministic triple extraction from source-code blobs.

The north-rule input is a table of source-code files
(repo, path, commit, lang, content). For code payloads the "sentences"
are import/def/call sites and prose comments/docstrings (SURVEY.md §7 step 2):
structural relations come from per-language regexes, prose relations from the
same grammar as the English extractor (relations.py).

Emitted relations (all deterministic):
    (file, in_repo, repo)            file = "<repo>/<path>"
    (file, written_in, <lang>)
    (file, imports, <module>)        + (<module>, rdf:type, MODULE)
    (file, defines_function, <fq>)   fq = "<file>::<name>", + rdf:type FUNCTION
    (file, defines_class, <fq>)      + rdf:type CLASS
    (<fq>, calls, <callee>)          callee left unqualified → resolved by
                                     the entity-linking stage
plus prose triples from comments/docstrings.
"""

from __future__ import annotations

import re

from .relations import RawTriple, extract_document

_PY_IMPORT = re.compile(r"^\s*(?:import\s+([\w.]+)|from\s+([\w.]+)\s+import\b)", re.M)
_PY_DEF = re.compile(r"^(\s*)def\s+(\w+)\s*\(", re.M)
_PY_CLASS = re.compile(r"^\s*class\s+(\w+)\s*[(:]", re.M)
_JVM_IMPORT = re.compile(r"^\s*import\s+([\w.]+?)(?:\._|\.\*)?\s*;?\s*$", re.M)
_JAVA_CLASS = re.compile(r"\b(?:class|interface|enum)\s+(\w+)", re.M)
_SCALA_CLASS = re.compile(r"\b(?:class|object|trait)\s+(\w+)", re.M)
_SCALA_DEF = re.compile(r"\bdef\s+(\w+)\s*[\[(:=]", re.M)
_JAVA_METHOD = re.compile(
    r"^\s*(?:public|private|protected|static|final|\s)+[\w<>\[\]]+\s+(\w+)\s*\(", re.M
)
_JS_IMPORT = re.compile(r"""(?:from\s+|require\s*\(\s*)['"]([\w@./-]+)['"]""")
_JS_FUNC = re.compile(r"\bfunction\s+(\w+)\s*\(|(?:const|let)\s+(\w+)\s*=\s*(?:async\s*)?\(")
_GO_IMPORT = re.compile(r'^\s*(?:import\s+)?"([\w./-]+)"\s*$', re.M)
_GO_FUNC = re.compile(r"^func\s+(?:\([^)]*\)\s*)?(\w+)\s*\(", re.M)
_CALL = re.compile(r"\b([a-zA-Z_]\w*)\s*\(")

_PY_COMMENT = re.compile(r"#\s*(.+)$", re.M)
_PY_DOCSTR = re.compile(r'"""(.*?)"""', re.S)
_C_COMMENT = re.compile(r"//\s*(.+)$|/\*(.*?)\*/", re.M | re.S)

_KEYWORDS = {
    "if", "for", "while", "return", "switch", "catch", "super", "print",
    "println", "len", "range", "str", "int", "float", "list", "dict",
    "set", "tuple", "type", "isinstance", "require", "function", "main",
}


def _prose_triples(texts: list[str], fancy: bool = False) -> tuple[list, list]:
    mentions, triples = [], []
    seen = set()
    for t in texts:
        m, r = extract_document(t, fancy=fancy)
        for tag, phrase in m:
            if phrase not in seen:
                seen.add(phrase)
                mentions.append((tag, phrase))
        triples.extend(r)
    return mentions, triples


def extract_code_document(
    repo: str, path: str, lang: str, content: str, fancy: bool = False
) -> tuple[list[tuple[str, str]], list[RawTriple]]:
    """Return (mentions, triples) for one source file. Mentions carry the
    rdf:type payload (tag, phrase); triples carry relations with conf=1.0
    for structural facts, extractor confidence for prose facts."""
    file_ent = f"{repo}/{path}"
    lang = (lang or "").lower()
    mentions: list[tuple[str, str]] = [("FILE", file_ent)]
    triples: list[RawTriple] = [
        RawTriple(file_ent, "in_repo", repo, 1.0),
        RawTriple(file_ent, "written_in", lang, 1.0),
    ]
    content = content or ""

    imports: list[str] = []
    defs: list[tuple[str, str]] = []  # (kind, name)
    prose: list[str] = []

    if lang == "python":
        imports = [a or b for a, b in _PY_IMPORT.findall(content)]
        defs = [("defines_function", m[1]) for m in _PY_DEF.findall(content)]
        defs += [("defines_class", c) for c in _PY_CLASS.findall(content)]
        prose = _PY_COMMENT.findall(content) + _PY_DOCSTR.findall(content)
    elif lang in ("java", "scala", "kotlin"):
        imports = _JVM_IMPORT.findall(content)
        if lang == "java":
            defs = [("defines_class", c) for c in _JAVA_CLASS.findall(content)]
            defs += [("defines_function", m) for m in _JAVA_METHOD.findall(content)]
        else:
            defs = [("defines_class", c) for c in _SCALA_CLASS.findall(content)]
            defs += [("defines_function", m) for m in _SCALA_DEF.findall(content)]
        prose = [a or b for a, b in _C_COMMENT.findall(content)]
    elif lang in ("javascript", "typescript", "js", "ts"):
        imports = _JS_IMPORT.findall(content)
        defs = [("defines_function", a or b) for a, b in _JS_FUNC.findall(content)]
        prose = [a or b for a, b in _C_COMMENT.findall(content)]
    elif lang == "go":
        imports = _GO_IMPORT.findall(content)
        defs = [("defines_function", f) for f in _GO_FUNC.findall(content)]
        prose = [a or b for a, b in _C_COMMENT.findall(content)]
    else:
        # markdown / prose payloads: whole content is prose
        prose = [content]

    seen_imp = set()
    for mod in imports:
        if mod and mod not in seen_imp:
            seen_imp.add(mod)
            triples.append(RawTriple(file_ent, "imports", mod, 1.0))
            mentions.append(("MODULE", mod))

    def_names = set()
    for kind, name in defs:
        if not name:
            continue
        fq = f"{file_ent}::{name}"
        if fq in def_names:
            continue
        def_names.add(fq)
        triples.append(RawTriple(file_ent, kind, fq, 1.0))
        mentions.append(("FUNCTION" if kind == "defines_function" else "CLASS", fq))

    if lang in ("python", "java", "scala", "go", "javascript", "typescript"):
        local_defs = {n for _, n in defs}
        callees = set()
        for callee in _CALL.findall(content):
            if callee in _KEYWORDS or callee in local_defs or callee in seen_imp:
                continue
            callees.add(callee)
        for callee in sorted(callees):
            triples.append(RawTriple(file_ent, "calls", callee, 1.0))

    pm, pt = _prose_triples([p for p in prose if p and len(p.split()) >= 3], fancy)
    mentions.extend(pm)
    triples.extend(pt)
    return mentions, triples
