"""OpenIE-style relation extraction (deterministic).

Reproduces the *semantics* of the reference's OpenIE extraction + filtering
chain (OpenIEExtractor.extract/extractFiltered TripleParser.scala:242-296;
TripleFilter.scala:6-42; conf>0.98 cut TripleParser.scala:362) with a
deterministic grammar over copula sentences:

    NP0 COP [ADV]* [PART]* (PREP item)*     e.g.
    "Aerialtronics is back on tour with four exhibitions in the United
     States and Europe in April and May, including the AUVSI ..."

Relation generation mirrors CoreNLP OpenIE's maximal-span behavior:
  * depth 0: (NP0, "<cop> [part] <prep1>", everything after prep1)
  * depth 1: (first NP after prep1, "is <prep2>", everything after prep2)
  * depth>=2: adjacent (NPgroup, prep, NPgroup) pairs with single-NP objects
Conjunction groups collapse to their first conjunct in rendered spans;
determiners are stripped; the longest-object purge (TripleParser.scala:321-329)
then deduplicates per (subj, pred).

Confidence model calibrated to the reference's post-filter golden outputs
(examples/triple-extractor/output1): high-confidence prepositions score
0.99 (> the 0.98 cut), DATE objects and low-signal preps score below it.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import lexicon as lx
from .mentions import _ner_tag, extract_mentions, extract_mentions_fancy
from .tokenizer import Token, split_sentences, tokenize

NP_POS = {"DET", "NUM", "NOUN", "PROPN"}


@dataclass
class RawTriple:
    subj: str
    pred: str
    obj: str
    conf: float


def _parse_np_groups(tokens: list[Token]) -> list[object]:
    """Parse a token span into a sequence of 'PREP:<word>' markers and
    NP conjunction groups (list of NPs; NP = list of Tokens)."""
    items: list[object] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t.pos == "PREP":
            items.append(("PREP", t.text.lower()))
            i += 1
        elif t.pos in NP_POS:
            group: list[list[Token]] = []
            cur: list[Token] = []
            while i < n:
                tt = tokens[i]
                if tt.pos in NP_POS:
                    cur.append(tt)
                    i += 1
                elif tt.pos == "CONJ" and cur and i + 1 < n and tokens[i + 1].pos in NP_POS:
                    group.append(cur)
                    cur = []
                    i += 1
                else:
                    break
            if cur:
                group.append(cur)
            items.append(("NPG", group))
        else:
            # punctuation / adverbs inside the tail are span boundaries only
            i += 1
    return items


def _render_np(np: list[Token]) -> str:
    return " ".join(t.text for t in np if t.pos != "DET")


def _first_np(group: list[list[Token]]) -> list[Token]:
    return group[0]


def _render_tail(items: list[object], start: int, prefix: str = "") -> str:
    """Render items[start:] — first conjunct of each NP group, preps kept."""
    parts: list[str] = []
    for kind, val in items[start:]:
        if kind == "PREP":
            parts.append(val)
        else:
            parts.append(_render_np(_first_np(val)))
    out = " ".join(p for p in parts if p)
    return (prefix + " " + out).strip() if prefix else out


def _np_is_date(np: list[Token]) -> bool:
    return _ner_tag([t for t in np if t.is_noun] or np) == "DATE"


def _conf(prep: str, obj_np: list[Token], subj_np: list[Token] | None = None) -> float:
    # DATE endpoints are temporal modifiers, not entity relations — the
    # reference's post-filter outputs never keep them (output1 drops the
    # 'in April'/'in May' attachments).
    if _np_is_date(obj_np) or (subj_np is not None and _np_is_date(subj_np)):
        return 0.50
    if prep in lx.HIGH_CONF_PREPS:
        return 0.99
    return 0.90


def extract_relations(tokens: list[Token]) -> list[RawTriple]:
    """All candidate relations for one sentence (pre-filter, with conf)."""
    out: list[RawTriple] = []
    cop_idx = next((i for i, t in enumerate(tokens) if t.pos == "COP"), None)
    if cop_idx is None:
        return out
    # subject = first contiguous NP run before the copula (a subject with an
    # embedded PP, "the test in Texas is ...", keeps only its head NP)
    subj_tokens: list[Token] = []
    for t in tokens[:cop_idx]:
        if t.pos in NP_POS:
            subj_tokens.append(t)
        elif subj_tokens:
            break
    if not subj_tokens:
        return out
    subj = _render_np(subj_tokens)
    subj_np = subj_tokens
    cop = tokens[cop_idx].text.lower()

    # copula chain: participles merge into the predicate, adverbs shift
    # into the object ("is back on tour" → pred "is on", obj "back tour ...")
    j = cop_idx + 1
    participles: list[str] = []
    adv_prefix: list[str] = []
    while j < len(tokens) and tokens[j].pos in ("PART", "ADV"):
        if tokens[j].pos == "PART":
            participles.append(tokens[j].text.lower())
        else:
            adv_prefix.append(tokens[j].text.lower())
        j += 1

    items = _parse_np_groups(tokens[j:])
    np_groups = [(k, v) for k, (kind, v) in enumerate(items) if kind == "NPG"]
    preps = [(k, v) for k, (kind, v) in enumerate(items) if kind == "PREP"]

    if not preps:
        if np_groups:
            k0, g0 = np_groups[0]
            obj = _render_tail(items, k0, " ".join(adv_prefix))
            pred = " ".join([cop] + participles)
            out.append(RawTriple(subj, pred, obj, _conf("of", _first_np(g0), subj_np)))
        return out

    # depth 0: subject vs everything after the first preposition
    p0_idx, p0 = preps[0]
    after0 = [g for g in np_groups if g[0] > p0_idx]
    if after0:
        pred = " ".join([cop] + participles + [p0])
        obj = _render_tail(items, p0_idx + 1, " ".join(adv_prefix))
        out.append(RawTriple(subj, pred, obj, _conf(p0, _first_np(after0[0][1]), subj_np)))

    # depth 1: first NP after prep0 vs everything after the second prep
    if after0 and len(preps) >= 2:
        d1_subj = _render_np(_first_np(after0[0][1]))
        p1_idx, p1 = preps[1]
        after1 = [g for g in np_groups if g[0] > p1_idx]
        if after1:
            obj = _render_tail(items, p1_idx + 1)
            out.append(RawTriple(d1_subj, "is " + p1, obj,
                                 _conf(p1, _first_np(after1[0][1]),
                                       _first_np(after0[0][1]))))

    # depth >= 2: adjacent NPG-prep-NPG pairs, single-NP objects
    for gi in range(1, len(np_groups)):
        lk, lg = np_groups[gi - 1]
        rk, rg = np_groups[gi]
        between = [p for p in preps if lk < p[0] < rk]
        if len(between) != 1:
            continue
        prep = between[0][1]
        l_np, r_np = _first_np(lg), _first_np(rg)
        out.append(RawTriple(_render_np(l_np), "is " + prep,
                             _render_np(r_np), _conf(prep, r_np, l_np)))
    return out


def filter_relations(
    triples: list[RawTriple],
    mentions: list[tuple[str, str]],
    conf_threshold: float = 0.98,
    fancy: bool = False,
) -> list[RawTriple]:
    """TripleFilter F4-F7 + conf cut F3 (reference TripleFilter.scala:34-42,
    TripleParser.scala:362). In fancy mode the subject must be a fancy
    mention phrase exactly (TripleParser.scala:372-402)."""
    phrases = [p for _, p in mentions]
    kept = []
    for t in triples:
        if t.conf <= conf_threshold:
            continue
        if t.pred.startswith("'s"):  # F4
            continue
        if fancy:
            # fancy mode: subject must be a fancy mention phrase exactly;
            # the common-verb object check (F6) uses standard-mode mentions
            # upstream, so it is not re-applied here (TripleParser.scala:372-402)
            if t.subj not in phrases:
                continue
        else:
            if not any(p in t.subj for p in phrases):  # F5
                continue
            first_word = t.pred.split(" ", 1)[0]
            if first_word in lx.COMMON_VERBS and not any(p in t.obj for p in phrases):
                continue  # F6
        kept.append(t)
    return kept


def purge_longest_object(triples: list[RawTriple]) -> list[RawTriple]:
    """N6: per (subj, pred) keep the triple with the longest object
    (reference reduceGroup TripleParser.scala:321-329)."""
    best: dict[tuple[str, str], RawTriple] = {}
    for t in triples:
        k = (t.subj, t.pred)
        if k not in best or len(t.obj) > len(best[k].obj):
            best[k] = t
    return list(best.values())


# sentence → (mentions, triples) memo. Boilerplate repeats enormously in
# real corpora (license headers, doc templates, generated comments), so
# identical sentences are the common case, not the exception. The cached
# lists and RawTriples are treated as immutable by every consumer
# (extract_document copies refs via extend; purge builds a new list).
# Bounded per worker process; perf-only — decisions are unchanged.
_SENT_CACHE: dict[tuple[str, bool], tuple[list, list]] = {}
_SENT_CACHE_MAX = 1 << 16


def _extract_sentence(
    sent: str, fancy: bool
) -> tuple[list[tuple[str, str]], list[RawTriple]]:
    key = (sent, fancy)
    hit = _SENT_CACHE.get(key)
    if hit is None:
        toks = tokenize(sent)
        ments = extract_mentions_fancy(toks) if fancy else extract_mentions(toks)
        rels = filter_relations(extract_relations(toks), ments, fancy=fancy)
        hit = (ments, rels)
        if len(_SENT_CACHE) < _SENT_CACHE_MAX:
            _SENT_CACHE[key] = hit
    return hit


def extract_document(
    text: str, fancy: bool = False, purge: bool = True, coref: bool = False
) -> tuple[list[tuple[str, str]], list[RawTriple]]:
    """Full doc → (mentions, relation triples). Mirrors getTriples /
    getFancyTriples (TripleParser.scala:339-402): [coref N2] → sentence
    split → mentions → OpenIE → filters → (optional) purge. rdf:type
    triples are added downstream from the mention list (N7)."""
    if coref:
        from .coref import resolve_pronouns

        text = resolve_pronouns(text)
    all_mentions: list[tuple[str, str]] = []
    seen_m: set[str] = set()
    all_triples: list[RawTriple] = []
    for sent in split_sentences(text):
        ments, rels = _extract_sentence(sent, fancy)
        for tag, phrase in ments:
            if phrase not in seen_m:
                seen_m.add(phrase)
                all_mentions.append((tag, phrase))
        all_triples.extend(rels)
    if purge:
        all_triples = purge_longest_object(all_triples)
    return all_mentions, all_triples
