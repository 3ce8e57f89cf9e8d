"""RAKE keyphrases: segmentation pins + full replica parity."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.keyphrases import (
    MICRO, candidate_phrases, rake_keyphrases)

STOP = ("the", "a", "and", "of", "in")
DOCS = [
    (1, "deep learning of the neural network and the deep network"),
    (2, "neural network training in a deep learning stack"),
    (3, "the of and"),          # all stopwords -> no phrases
    (4, None),
]


def _phrases(docs):
    out = []
    for i, t in docs:
        toks = (t or "").lower().split()
        cur = []
        for tok in toks + ["<END>"]:
            if tok in STOP or tok == "<END>":
                if cur:
                    out.append((i, " ".join(cur)))
                cur = []
            else:
                cur.append(tok)
    return out


def _replica_topk(docs, k):
    ph = _phrases(docs)
    freq, deg = {}, {}
    for _, p in ph:
        ws = p.split()
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ws)
    ws_score = {w: (deg[w] * MICRO) // freq[w] for w in freq}
    agg = {}
    for _, p in ph:
        s = sum(ws_score[w] for w in p.split())
        n, _ = agg.get(p, (0, s))
        agg[p] = (n + 1, s)
    rows = sorted(((p, n, s) for p, (n, s) in agg.items()),
                  key=lambda r: (-r[2], r[0]))[:k]
    return rows


def test_segmentation(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = sorted((r.id, r.phrase)
                 for r in candidate_phrases(df, STOP).collect())
    assert got == sorted(_phrases(DOCS))
    # leading/trailing/mid stopword boundaries all respected
    assert (1, "deep learning") in got and (1, "neural network") in got


def test_topk_matches_replica(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = [(r.phrase, r.n_occurrences, r.score_micro)
           for r in rake_keyphrases(df, STOP, top_k=10).collect()]
    assert got == _replica_topk(DOCS, 10)
    # multi-word phrases outrank their constituent single words (RAKE's
    # signature behavior)
    assert got[0][0].count(" ") >= 1


def test_empty_stopwords_rejected(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        candidate_phrases(df, ())


# ---------------------------------------------------------------------------
# textrank_scores — integer-micro weighted PageRank over co-occurrence
# ---------------------------------------------------------------------------
def _textrank_reference(doc_tokens, window, iters, micro=10 ** 6):
    """Pure-Python replica of textrank_scores' integer recurrence."""
    from collections import defaultdict
    w = defaultdict(int)
    for toks in doc_tokens:
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                if toks[i] != toks[j]:
                    w[tuple(sorted((toks[i], toks[j])))] += 1
    nbrs = defaultdict(dict)
    for (a, b), c in w.items():
        nbrs[a][b] = c
        nbrs[b][a] = c
    strength = {n: sum(d.values()) for n, d in nbrs.items()}
    s = {n: micro for n in nbrs}
    for _ in range(iters):
        flow = {n: 0 for n in nbrs}
        for u, d in nbrs.items():
            for v, c in d.items():
                flow[v] += (s[u] * c) // strength[u]
        s = {n: 15 * micro // 100 + (85 * flow[n]) // 100 for n in nbrs}
    return s


def test_textrank_matches_reference(spark):
    from climatemind_ontology_processing_spark.operators.keyphrases import (
        textrank_scores)
    texts = [
        "spark shuffles data between executors and spark schedules tasks",
        "executors run tasks and tasks shuffle data",
        "the scheduler assigns tasks to executors",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r.tok: r.score
           for r in textrank_scores(docs, window=2, iters=3).collect()}
    want = _textrank_reference([t.split() for t in texts], 2, 3)
    assert got == want


def test_textrank_repeated_token_gets_higher_score(spark):
    """A token with more (and stronger) co-occurrence mass outranks a
    peripheral one."""
    from climatemind_ontology_processing_spark.operators.keyphrases import (
        textrank_scores)
    docs = spark.createDataFrame(
        [(0, "graph node graph edge graph weight rare")],
        "doc_id long, text string")
    got = {r.tok: r.score
           for r in textrank_scores(docs, window=2, iters=3).collect()}
    assert got["graph"] > got["rare"]
