"""Deterministic, dependency-free NLP core.

Pure-Python sentence analysis used inside Arrow-batched pandas UDFs.
Reproduces the extraction *semantics* of the reference pipeline
(mention detection over noun runs, OpenIE-style copula/preposition
relations, NER typing) without the JVM CoreNLP dependency — see
``TripleExtractor/src/main/scala/gov/pnnl/aristotle/text/TripleParser.scala``
in the reference for the behavior being matched.
"""
