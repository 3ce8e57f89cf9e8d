"""Entity alignment: replica equality, hub guard, recovery accuracy."""
from __future__ import annotations

import hashlib

import pytest

from climatemind_ontology_processing_spark.operators.align import (
    MICRO, align_entities)

LEFT = [
    ("a1", "born", "1912"), ("a1", "field", "cs"), ("a1", "country", "uk"),
    ("a2", "born", "1879"), ("a2", "field", "physics"),
    ("a2", "country", "de"),
    ("a3", "born", "1912"), ("a3", "field", "physics"),
    ("a3", "country", "uk"),
]
RIGHT = [
    ("b1", "born", "1912"), ("b1", "field", "cs"), ("b1", "country", "uk"),
    ("b2", "born", "1879"), ("b2", "field", "physics"),
    ("b2", "country", "de"),
]


def _replica(left, right, max_holders, min_shared=1):
    l = sorted(set(left))
    r = sorted(set(right))
    holders = {}
    for s, p, o in set(l) | set(r):
        holders.setdefault((p, o), set()).add(s)
    w = {k: MICRO // len(v) for k, v in holders.items()
         if len(v) <= max_holders}
    pairs = {}
    for s1, p1, o1 in l:
        if (p1, o1) not in w:
            continue
        for s2, p2, o2 in r:
            if (p1, o1) == (p2, o2):
                n, sc = pairs.get((s1, s2), (0, 0))
                pairs[(s1, s2)] = (n + 1, sc + w[(p1, o1)])
    pairs = {k: v for k, v in pairs.items() if v[0] >= min_shared}
    ranks = {}
    by_x = {}
    for (x, y), (n, sc) in pairs.items():
        by_x.setdefault(x, []).append((-sc, y))
    for x, lst in by_x.items():
        for i, (_, y) in enumerate(sorted(lst), 1):
            ranks[(x, y)] = i
    return {k: (*v, ranks[k]) for k, v in pairs.items()}


@pytest.fixture(scope="module")
def kgs(spark):
    l = spark.createDataFrame(LEFT, "subj string, pred string, obj string")
    r = spark.createDataFrame(RIGHT, "subj string, pred string, obj string")
    return l, r


@pytest.mark.parametrize("max_holders,min_shared", [(10, 1), (10, 2),
                                                    (2, 1)])
def test_matches_replica(spark, kgs, max_holders, min_shared):
    l, r = kgs
    got = {(x["x"], x["y"]): (x["n_shared"], x["score_micro"], x["rank"])
           for x in align_entities(l, r, max_holders=max_holders,
                                   min_shared=min_shared).collect()}
    assert got == _replica(LEFT, RIGHT, max_holders, min_shared)


def test_true_matches_rank_first(spark, kgs):
    l, r = kgs
    top = {x["x"]: x["y"] for x in
           align_entities(l, r, top_k=1).collect()}
    assert top["a1"] == "b1" and top["a2"] == "b2"
    # a3 shares 2 facts with b1 ((born,1912),(country,uk)) and 1 with b2,
    # but born/country are less identifying than a full profile match
    assert top["a3"] == "b1"


def test_hub_guard_drops_hot_facts(spark):
    # everyone shares (lang, en): with max_holders=3 the hub fact emits
    # nothing and no candidates survive
    l = [(f"x{i}", "lang", "en") for i in range(4)]
    r = [(f"y{i}", "lang", "en") for i in range(4)]
    ldf = spark.createDataFrame(l, "subj string, pred string, obj string")
    rdf = spark.createDataFrame(r, "subj string, pred string, obj string")
    assert align_entities(ldf, rdf, max_holders=3).count() == 0
    assert align_entities(ldf, rdf, max_holders=8).count() == 16


def test_recovery_on_seeded_corruption(spark):
    """200 entities, 12 discriminative facts each; the right KG renames
    ids and drops ~1/3 of facts — top-1 must recover >= 95%."""
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    left, right = [], []
    for i in range(200):
        for j in range(12):
            o = f"v{h(f'f|{i}|{j}') % 800}"
            left.append((f"L{i}", f"p{j % 4}", o))
            if h(f"keep|{i}|{j}") % 3:
                right.append((f"R{i}", f"p{j % 4}", o))
    ldf = spark.createDataFrame(left,
                                "subj string, pred string, obj string")
    rdf = spark.createDataFrame(right,
                                "subj string, pred string, obj string")
    top = {x["x"]: x["y"] for x in
           align_entities(ldf, rdf, top_k=1, min_shared=2).collect()}
    hits = sum(top.get(f"L{i}") == f"R{i}" for i in range(200))
    assert hits >= 190
