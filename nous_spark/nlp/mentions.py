"""Mention detection (noun runs) + NER typing.

Standard mode = NamedPhraseExtractor.extract (reference
TripleParser.scala:122-170): maximal contiguous runs of noun tokens,
split where capitalization flips or a number intervenes, each tagged
``NERTAG:phrase``. Fancy mode = NamedPhraseExtractor.fancyextract
(TripleParser.scala:174-239): proper-noun runs immediately preceded by a
determiner, tagged O.
"""

from __future__ import annotations

from functools import lru_cache

from . import lexicon as lx
from .tokenizer import Token, tokenize


@lru_cache(maxsize=1 << 16)
def _ner_tag_memo(words: tuple[str, ...], any_propn: bool) -> str:
    """Pure NER decision on (texts, has-proper-noun) — memoized: mention
    phrases repeat heavily across a corpus. Identical to the inline logic."""
    if not any_propn:
        return "O"
    if any(w.lower() in lx.DATE_WORDS for w in words):
        return "DATE"
    if " ".join(w.lower() for w in words) in lx.LOCATIONS:
        return "LOCATION"
    if words[-1].lower() in lx.ORG_SUFFIXES:
        return "ORGANIZATION"
    if all(w.lower() in lx.ORG_NAMES for w in words):
        return "ORGANIZATION"
    if words[0].lower() in lx.PERSON_TITLES or (
        len(words) <= 2 and words[0].lower() in lx.PERSON_FIRST_NAMES
    ):
        return "PERSON"
    return "MISC"


def _ner_tag(phrase_tokens: list[Token]) -> str:
    return _ner_tag_memo(
        tuple(t.text for t in phrase_tokens),
        any(t.is_propn for t in phrase_tokens),
    )


def noun_runs(tokens: list[Token]) -> list[list[Token]]:
    """Maximal runs of noun tokens with uniform capitalization."""
    runs: list[list[Token]] = []
    cur: list[Token] = []
    for t in tokens:
        if t.is_noun:
            if cur and cur[-1].is_propn != t.is_propn:
                runs.append(cur)
                cur = []
            cur.append(t)
        else:
            if cur:
                runs.append(cur)
            cur = []
    if cur:
        runs.append(cur)
    return runs


def extract_mentions(sentence_tokens: list[Token]) -> list[tuple[str, str]]:
    """Standard mode: [(tag, phrase)] de-duplicated, order of first occurrence."""
    seen: dict[str, str] = {}
    for run in noun_runs(sentence_tokens):
        phrase = " ".join(t.text for t in run)
        if phrase.lower() in lx.NER_BLACKLIST or len(phrase) < 2:
            continue
        if phrase not in seen:
            seen[phrase] = _ner_tag(run)
    return [(tag, phrase) for phrase, tag in seen.items()]


def extract_mentions_fancy(sentence_tokens: list[Token]) -> list[tuple[str, str]]:
    """Fancy mode: proper-noun runs preceded by a determiner, tagged O."""
    out: dict[str, str] = {}
    runs = noun_runs(sentence_tokens)
    for run in runs:
        if not all(t.is_propn for t in run):
            continue
        first_idx = run[0].idx
        prev = next((t for t in sentence_tokens if t.idx == first_idx - 1), None)
        if prev is not None and prev.pos == "DET":
            phrase = " ".join(t.text for t in run)
            out.setdefault(phrase, "O")
    return [(tag, phrase) for phrase, tag in out.items()]


def mentions_for_sentence(sentence: str, fancy: bool = False) -> list[tuple[str, str]]:
    toks = tokenize(sentence)
    return extract_mentions_fancy(toks) if fancy else extract_mentions(toks)
