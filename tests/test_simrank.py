"""SimRank: integer replica parity, symmetry, guards."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.simrank import (
    MICRO, simrank)

# two "parent" nodes pointing at shared children (the canonical SimRank
# shape), plus a chain and a node with no in-edges
EDGES = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 5), (5, 6), (7, 1)]


def _replica(edges, rounds, cn, cd):
    E = {tuple(e) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in E for x in e})
    inn = {v: sorted(i for i, w in E if w == v) for v in nodes}
    s = {(v, v): MICRO for v in nodes}
    for _ in range(rounds):
        new = {(v, v): MICRO for v in nodes}
        for a in nodes:
            for b in nodes:
                if a == b or not inn[a] or not inn[b]:
                    continue
                tot = sum(s.get((i, j), 0) for i in inn[a] for j in inn[b])
                val = (cn * tot) // (cd * len(inn[a]) * len(inn[b]))
                if val > 0:
                    new[(a, b)] = val
        s = new
    return {k: v for k, v in s.items() if k[0] != k[1]}


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_matches_replica(spark, rounds):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    got = {(r.a, r.b): r.s_micro
           for r in simrank(df, rounds=rounds).collect()}
    assert got == _replica(EDGES, rounds, 4, 5)
    assert got  # non-trivial


def test_symmetry_and_canonical_pair(spark):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    got = {(r.a, r.b): r.s_micro for r in simrank(df, rounds=3).collect()}
    for (a, b), v in got.items():
        assert got[(b, a)] == v
    # nodes 3 and 4 share identical in-neighborhoods {1, 2}: only the two
    # diagonal terms contribute -> C * 2 / 4 = 0.4 (and stays there: 1 and
    # 2 never become similar, node 2 has no in-edges)
    assert got[(3, 4)] == (4 * 2 * MICRO) // (5 * 4)


def test_guards(spark):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    with pytest.raises(ValueError, match="rounds"):
        simrank(df, rounds=0)
    with pytest.raises(ValueError, match="c_num"):
        simrank(df, c_num=5, c_den=5)
    with pytest.raises(ValueError, match="max_edges"):
        simrank(df, max_edges=3)
