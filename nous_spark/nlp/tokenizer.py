"""Deterministic tokenizer + closed-class tagger.

Token classes (coarse POS): DET, PREP, CONJ, COP (copula/aux), PART
(past participle after a copula), ADV, NUM, PUNCT, NOUN (default), PROPN
(capitalized default). Replaces CoreNLP's tokenize+pos stages
(reference: TripleParser.scala:42-60) with a closed-class lexicon: in the
fixture grammar every open-class non-verb word is a noun, which is exactly
the population mention detection cares about (noun runs, TripleParser.scala:122-170).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from . import lexicon as lx

# [^\W\d_] = any unicode letter — identifiers and prose in non-ASCII
# scripts must tokenize as words, not per-character noise
_TOKEN_RE = re.compile(r"[^\W\d_][\w'&-]*[^\W\d_]|[^\W\d_]|\d+(?:[.,]\d+)*|[,;:.!?()]")

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=\S)")


@dataclass
class Token:
    text: str
    pos: str      # DET PREP CONJ COP PART ADV NUM PUNCT NOUN PROPN
    idx: int

    @property
    def is_noun(self) -> bool:
        return self.pos in ("NOUN", "PROPN")

    @property
    def is_propn(self) -> bool:
        return self.pos == "PROPN"


def split_sentences(text: str) -> list[str]:
    """Split a text blob into sentences (ssplit analog)."""
    parts = [s.strip() for s in _SENT_SPLIT_RE.split(text or "")]
    return [p for p in parts if p]


def tokenize(sentence: str) -> list[Token]:
    toks: list[Token] = []
    prev_cop = False
    for i, raw in enumerate(_TOKEN_RE.findall(sentence)):
        low = raw.lower().rstrip(".") if raw not in (".",) else raw
        if re.fullmatch(r"\d+(?:[.,]\d+)*", raw):
            pos = "NUM"
        elif raw in ",;:.!?()":
            pos = "PUNCT"
        elif low in lx.DETERMINERS:
            pos = "DET"
        elif low in lx.DATE_WORDS and raw[0].isupper() and i > 0:
            # capitalized month/day mid-sentence, e.g. "May" ≠ modal "may"
            pos = "PROPN"
        elif low in lx.COPULAS:
            pos = "COP"
        elif low in lx.PARTICIPLES and prev_cop:
            pos = "PART"
        elif low in lx.PREPOSITIONS:
            pos = "PREP"
        elif low in lx.CONJUNCTIONS:
            pos = "CONJ"
        elif low in lx.ADVERBS:
            pos = "ADV"
        elif low in lx.NUMBER_WORDS:
            pos = "NUM"
        elif low in lx.PRONOUNS:
            pos = "PRON"
        elif low in lx.DATE_WORDS:
            # month/day names are proper nouns (DATE NER later)
            pos = "PROPN" if raw[0].isupper() else "NOUN"
        elif raw[0].isupper():
            pos = "PROPN"
        else:
            pos = "NOUN"
        toks.append(Token(raw, pos, i))
        prev_cop = pos in ("COP", "PART", "ADV") if pos != "PUNCT" else False
    return toks
