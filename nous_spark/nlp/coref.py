"""N2: coreference substitution (CorefTransform.transform,
TripleParser.scala:68-120).

The reference replaces pronominal mentions with the representative mention
from CoreNLP coref chains. Deterministic analog: a sentence-initial (or
post-comma) third-person pronoun is replaced with the most recent
PERSON/ORGANIZATION/MISC mention from earlier sentences ('he/she' → last
PERSON; 'it/they' → last non-person entity, falling back to any).
"""

from __future__ import annotations

import re

from .mentions import mentions_for_sentence
from .tokenizer import split_sentences

_PERSON_PRONOUNS = {"he", "she"}
_THING_PRONOUNS = {"it", "they", "its", "their"}
_PRONOUN_RE = re.compile(
    r"\b(he|she|it|they|its|their)\b", re.IGNORECASE
)


def resolve_pronouns(text: str) -> str:
    """Rewrite pronouns to their antecedent mentions, sentence by sentence."""
    last_person: str | None = None
    last_entity: str | None = None
    out = []
    for sent in split_sentences(text):
        def repl(m: re.Match) -> str:
            w = m.group(1).lower()
            if w in _PERSON_PRONOUNS and last_person:
                return last_person
            if w in _THING_PRONOUNS and last_entity:
                return last_entity
            return m.group(0)

        out.append(_PRONOUN_RE.sub(repl, sent))
        ments = mentions_for_sentence(sent)
        for tag, phrase in ments:
            if tag == "PERSON":
                last_person = phrase
        # antecedent for it/they = the sentence's first entity mention
        # (the subject), matching the representative-mention idea
        for tag, phrase in ments:
            if tag in ("ORGANIZATION", "MISC", "LOCATION"):
                last_entity = phrase
                break
    return " ".join(out)
