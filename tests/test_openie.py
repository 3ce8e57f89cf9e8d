"""ReVerb-lite open IE: extraction pins, constraint semantics, span
consumption, and a Python-regex replica parity check."""
from __future__ import annotations

import re

import pytest

from climatemind_ontology_processing_spark.operators.openie import (
    DEFAULT_DETS, DEFAULT_PREPS, open_triple_counts, reverb_matches,
    reverb_pattern)

VERBS = ("scans", "merges", "joins", "filters")

DOCS = [
    (1, "Spark scans the table and planner merges results"),
    (2, "engine joins with the index then worker filters rows"),
    (3, "scanner scans scans"),                 # verb in arg2 slot -> rejected
    (4, "alpha scans beta gamma merges delta"),  # two extractions, one doc
    (5, "alpha scans beta again and alpha scans beta"),  # repeat mention
    (6, None),                                   # null text survives
]


def _replica(docs, verbs):
    pat = reverb_pattern(verbs)
    stop = set(verbs) | set(DEFAULT_PREPS) | set(DEFAULT_DETS)
    out = []
    for i, t in docs:
        if t is None:
            continue
        for m in re.finditer(pat, t.lower()):
            a1, rel, a2 = m.group(1), m.group(2), m.group(3)
            if a1 not in stop and a2 not in stop and a1 and a2:
                out.append((i, a1, rel, a2))
    return sorted(out)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_matches_python_replica(spark, docs):
    got = sorted((r.doc_id, r.arg1, r.rel, r.arg2)
                 for r in reverb_matches(docs, VERBS).collect())
    assert got == _replica(DOCS, VERBS)
    # and the replica is non-trivial
    assert len(got) >= 5


def test_specific_extractions(spark, docs):
    got = {(r.doc_id, r.arg1, r.rel, r.arg2)
           for r in reverb_matches(docs, VERBS).collect()}
    # determiner absorbed into the pattern, not the argument
    assert (1, "spark", "scans", "table") in got
    # verb+prep relation phrase
    assert (2, "engine", "joins with", "index") in got
    # verb occupying an argument slot is rejected (ReVerb constraint)
    assert not any(r for r in got if r[0] == 3)


def test_counts_pool_mentions_and_docs(spark, docs):
    rows = {(r.arg1, r.rel, r.arg2): (r.n_mentions, r.n_docs)
            for r in open_triple_counts(docs, VERBS).collect()}
    assert rows[("alpha", "scans", "beta")] == (3, 2)  # docs 4 + 5 (x2)
    assert rows[("spark", "scans", "table")] == (1, 1)


def test_min_docs_threshold(spark, docs):
    rows = {(r.arg1, r.rel, r.arg2)
            for r in open_triple_counts(docs, VERBS, min_docs=2).collect()}
    assert rows == {("alpha", "scans", "beta")}


def test_empty_lexicon_rejected():
    with pytest.raises(ValueError):
        reverb_pattern(())
