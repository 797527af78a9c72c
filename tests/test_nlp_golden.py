"""Golden-parity gate: extraction must reproduce the reference outputs.

Reference corpus: TripleExtractor/examples/triple-extractor/{input,output1,output2}
and the unit expectation of TestTripleParser.scala:28-37. P/R ≥ 0.95 required
by BASELINE.json; we assert exact set equality (P = R = 1.0).
"""

from __future__ import annotations

import os

import pytest

from nous_spark.nlp.relations import extract_document

REF = "/root/reference/TripleExtractor/examples/triple-extractor"
FIXT = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def _triple_set(mentions, triples):
    return {(p, "rdf:type", t) for t, p in mentions} | {
        (t.subj, t.pred, t.obj) for t in triples
    }


def _load_golden(path):
    with open(path) as f:
        return {tuple(line.split("\t")) for line in f.read().strip().split("\n")}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
class TestReferenceGolden:
    def test_standard_mode_exact(self):
        sent = open(f"{REF}/triple-extractor.input").read().strip()
        got = _triple_set(*extract_document(sent))
        golden = _load_golden(f"{REF}/output1")
        assert got == golden

    def test_fancy_mode_exact(self):
        sent = open(f"{REF}/triple-extractor.input").read().strip()
        got = _triple_set(*extract_document(sent, fancy=True))
        golden = _load_golden(f"{REF}/output2")
        assert got == golden

    def test_obama_unit(self):
        # TestTripleParser.scala:28-37
        _, triples = extract_document("Obama was born in Hawaii.")
        assert {(t.subj, t.pred, t.obj) for t in triples} == {
            ("Obama", "was born in", "Hawaii")
        }


def test_fixture_corpus_pr():
    """Hand-derived fixture sentences: precision/recall ≥ 0.95 overall."""
    golden = []
    with open(os.path.join(FIXT, "extract_golden.tsv")) as f:
        for line in f.read().strip().split("\n"):
            doc_id, subj, pred, obj = line.split("\t")
            golden.append((int(doc_id), subj, pred, obj))
    docs = {}
    with open(os.path.join(FIXT, "extract_input.tsv")) as f:
        for line in f.read().strip().split("\n"):
            doc_id, text = line.split("\t")
            docs[int(doc_id)] = text

    got = set()
    for doc_id, text in docs.items():
        mentions, triples = extract_document(text)
        for tag, phrase in mentions:
            got.add((doc_id, phrase, "rdf:type", tag))
        for t in triples:
            got.add((doc_id, t.subj, t.pred, t.obj))
    golden_set = set(golden)
    tp = len(got & golden_set)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(golden_set))
    assert precision >= 0.95, f"precision {precision:.3f}; extra={sorted(got - golden_set)[:10]}"
    assert recall >= 0.95, f"recall {recall:.3f}; missing={sorted(golden_set - got)[:10]}"


def test_coref_substitution():
    """N2 (CorefTransform.transform, TripleParser.scala:68-120): pronouns
    resolve to the representative mention of the previous sentence."""
    _, t = extract_document(
        "Obama was born in Hawaii. He is with Google in Seattle.", coref=True
    )
    rels = {(x.subj, x.pred, x.obj) for x in t}
    assert ("Obama", "is with", "Google in Seattle") in rels
    _, t2 = extract_document(
        "Aerialtronics is a Dutch company. It is based in Amsterdam.", coref=True
    )
    rels2 = {(x.subj, x.pred, x.obj) for x in t2}
    assert ("Aerialtronics", "is based in", "Amsterdam") in rels2
