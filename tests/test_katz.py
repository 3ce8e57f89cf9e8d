"""Katz centrality: integer replica parity, cycle handling, overflow guard."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.pagerank import (
    katz_centrality)

# directed graph with a hub, a chain and a 2-cycle (walks revisit nodes)
EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 3), (5, 1), (5, 3)]


def _replica(edges, rounds, a):
    nodes = {x for e in edges for x in e}
    inn = {}
    for u, v in edges:
        inn.setdefault(v, []).append(u)
    w = {v: 1 for v in nodes}
    acc = {v: 0 for v in nodes}
    for k in range(1, rounds + 1):
        w = {v: sum(w.get(u, 0) for u in inn.get(v, [])) for v in nodes}
        for v in nodes:
            acc[v] += (w[v] * 10 ** 6) // a ** k
    return acc


@pytest.mark.parametrize("rounds,a", [(1, 4), (3, 4), (5, 2)])
def test_matches_replica(spark, rounds, a):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    got = {r.id: r.katz_micro
           for r in katz_centrality(df, rounds=rounds,
                                    atten_denom=a).collect()}
    assert got == _replica(EDGES, rounds, a)


def test_overflow_guard_raises(spark):
    # complete digraph on 50 nodes: length-8 walk counts ~ 49^8 > 2^63/1e6
    edges = [(i, j) for i in range(50) for j in range(50) if i != j]
    df = spark.createDataFrame(edges, "src int, dst int")
    with pytest.raises(RuntimeError, match="overflows"):
        katz_centrality(df, rounds=8, atten_denom=4)


def test_param_validation(spark):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    with pytest.raises(ValueError):
        katz_centrality(df, rounds=0)
    with pytest.raises(ValueError):
        katz_centrality(df, atten_denom=1)
