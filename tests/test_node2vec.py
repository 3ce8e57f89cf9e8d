"""node2vec_walks: pure-Python md5 replica + p/q bias behavioral pins."""
from __future__ import annotations

import hashlib

import pytest

from climatemind_ontology_processing_spark.operators.graphstats import (
    node2vec_walks)

# path + triangle + sink: 0->1->2, 2->{0,3}, 3->{4,5}, 4->2, 5 sink; plus
# undirected-adjacency asymmetry (edge 1->3 makes 3 a distance-1 hop from 2
# when prev=1)
EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (3, 5), (4, 2), (1, 3),
         (0, 0)]  # self-loop dropped


def _h40(seed, step, prev, cur, nxt):
    key = f"{seed}|{step}|{'-' if prev is None else prev}|{cur}|{nxt}"
    return int(hashlib.md5(key.encode()).hexdigest()[:10], 16)


def _replica(edges, length, p_micro, q_micro, seed="n2v"):
    adj = {}
    und = set()
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        und.add((a, b))
        und.add((b, a))
    rows = []
    for start in sorted(adj):
        prev, cur = None, start
        rows.append((start, 0, start))
        for t in range(1, length + 1):
            if cur not in adj:
                break
            best = None
            for n in sorted(adj[cur]):
                if prev is None:
                    mult = 1_000_000
                elif n == prev:
                    mult = p_micro
                elif (prev, n) in und:
                    mult = 1_000_000
                else:
                    mult = q_micro
                s = _h40(seed, t, prev, cur, n) * mult
                if best is None or (s, n) < best:
                    best = (s, n)
            prev, cur = cur, best[1]
            rows.append((start, t, cur))
    return sorted(rows)


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src int, dst int")


@pytest.mark.parametrize("p_micro,q_micro", [
    (1_000_000, 1_000_000), (8_000_000, 1_000_000),
    (1_000_000, 200_000), (3_000_000, 4_000_000)])
def test_matches_python_replica(spark, edges_df, p_micro, q_micro):
    got = sorted(tuple(r) for r in
                 node2vec_walks(edges_df, length=5, p_micro=p_micro,
                                q_micro=q_micro).collect())
    assert got == _replica(EDGES, 5, p_micro, q_micro)


def test_walk_structure(spark, edges_df):
    # bias arithmetic is pinned by the replica test; here pin structure:
    # no walk starts at a sink, forced hops are taken, step-0 rows exist
    # for exactly the nodes with out-edges.
    rows = {(r["start"], r["step"]): r["node"]
            for r in node2vec_walks(edges_df, length=2,
                                    p_micro=8_000_000).collect()}
    assert (5, 0) not in rows          # 5 has no out-edges: no walk
    assert rows[(4, 1)] == 2           # forced hop
    starts = {s for s, _ in rows}
    assert starts == {0, 1, 2, 3, 4}


def test_sink_truncates_walk(spark, edges_df):
    out = node2vec_walks(edges_df, length=4, q_micro=200_000).collect()
    by_start = {}
    for r in out:
        by_start.setdefault(r["start"], []).append((r["step"], r["node"]))
    # any walk that reaches 5 stops there (5 is a sink)
    for start, steps in by_start.items():
        steps.sort()
        for i, (t, node) in enumerate(steps):
            if node == 5:
                assert i == len(steps) - 1
