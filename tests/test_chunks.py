"""Passage chunking: window/stride semantics, tails, empty docs, guards."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.chunks import (
    chunk_passages)

DOCS = [
    (1, "a b c d e f g h i j"),   # 10 tokens
    (2, "x y z"),                 # shorter than one chunk
    (3, ""),                      # token-free -> no chunks
    (4, None),                    # NULL -> no chunks
    (5, "  p   q  "),             # whitespace runs collapse
]


def _replica(docs, chunk, stride):
    out = []
    for i, t in docs:
        toks = (t or "").split()
        n = len(toks)
        if n == 0:
            continue
        k, start = 0, 0
        while True:
            piece = toks[start:start + chunk]
            out.append((i, k, start, len(piece), " ".join(piece)))
            if start + chunk >= n:
                break
            k += 1
            start += stride
    return sorted(out)


@pytest.mark.parametrize("chunk,stride", [(4, 2), (4, 4), (3, 1), (64, 32)])
def test_matches_replica(spark, chunk, stride):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = sorted((r.doc_id, r.chunk_id, r.start_token, r.n_tokens, r.chunk)
                 for r in chunk_passages(df, chunk, stride).collect())
    assert got == _replica(DOCS, chunk, stride)


def test_overlap_and_tail(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = {r.chunk_id: (r.start_token, r.n_tokens, r.chunk)
            for r in chunk_passages(df, 4, 2).collect() if r.doc_id == 1}
    assert rows[0] == (0, 4, "a b c d")
    assert rows[1] == (2, 4, "c d e f")          # stride-2 overlap
    assert rows[3] == (6, 4, "g h i j")          # final window covers tail
    assert max(rows) == 3
    # no chunk for empty/null docs
    df2 = chunk_passages(df, 4, 2)
    assert df2.filter("doc_id in (3, 4)").count() == 0


def test_guards(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_passages(df, 0, 1)
    with pytest.raises(ValueError):
        chunk_passages(df, 4, 5)
