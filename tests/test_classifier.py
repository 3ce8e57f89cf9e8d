"""Hashed linear quality scoring: replica parity, trained-weight path,
null/token-free coverage."""
from __future__ import annotations

import hashlib

import pytest

from climatemind_ontology_processing_spark.operators.classifier import (
    linear_quality_scores)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark spark spark shuffle"),
    (3, ""),            # token-free
    (4, None),          # NULL text
    (5, "quick brown"),
]
BUCKETS, SPAN, SEED = 64, 1000, "qlr"


def _h60(x):
    return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)


def _replica(docs):
    import re
    out = {}
    for i, t in docs:
        logit = 0
        if t:
            toks = [w for w in re.split(r"[^\w]+", t.lower()) if w]
            grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            for g in grams:
                b = _h60(g) % BUCKETS
                w = _h60(f"{SEED}|{b}") % (2 * SPAN + 1) - SPAN
                logit += w
        out[i] = (logit, int(logit > 0))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_matches_replica(spark, docs):
    got = {r.id: (r.logit, r.keep)
           for r in linear_quality_scores(
               docs, buckets=BUCKETS, span=SPAN, seed=SEED,
               hash_family="md5_60").collect()}
    assert got == _replica(DOCS)
    # every doc present, including empty/null text
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[3] == (0, 0) and got[4] == (0, 0)


def test_trained_weights_path(spark, docs):
    # a weight table that scores ONLY the bucket of unigram 'spark'
    b_spark = _h60("spark") % BUCKETS
    w = spark.createDataFrame([(b_spark, 7)], "bucket long, w int")
    got = {r.id: r.logit
           for r in linear_quality_scores(
               docs, buckets=BUCKETS, weights=w,
               hash_family="md5_60").collect()}
    assert got[2] == 21  # 'spark' x3 (bigram buckets differ w.h.p.)
    assert got[3] == 0 and got[4] == 0


def test_threshold_moves_labels(spark, docs):
    lo = {r.id: r.keep for r in linear_quality_scores(
        docs, buckets=BUCKETS, hash_family="md5_60",
        threshold=-10**9).collect()}
    # with a floor threshold every doc with any tokens is kept,
    # and the token-free docs (logit exactly 0) pass it too
    assert all(v == 1 for v in lo.values())
