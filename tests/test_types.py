"""Label spreading type inference: integer replica + clamping pins."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.types import (
    MICRO, assign_types, spread_types)

# two seed islands joined by a path: 0(typeA) - 1 - 2 - 3(typeB), plus a
# triangle hanging off node 1 and an isolated edge pair with no seed
EDGES = [(0, 1), (1, 2), (2, 3), (1, 4), (4, 5), (5, 1), (8, 9)]
SEEDS = [(0, "A"), (3, "B"), (5, "A")]


def _replica(edges, seeds, rounds):
    und = {}
    for a, b in edges:
        if a == b:
            continue
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    clamp = {v: t for v, t in seeds}
    state = {v: {t: MICRO} for v, t in seeds}
    for _ in range(rounds):
        new = {}
        for v in und:
            g = {}
            for w in und[v]:
                for t, s in state.get(w, {}).items():
                    g[t] = g.get(t, 0) + s
            if g:
                tot = sum(g.values())
                new[v] = {t: (s * MICRO) // tot for t, s in g.items()}
        for v, t in clamp.items():
            new[v] = {t: MICRO}
        state = new
    return {(v, t): s for v, d in state.items() for t, s in d.items()}


@pytest.fixture(scope="module")
def dfs(spark):
    e = spark.createDataFrame(EDGES, "src int, dst int")
    s = spark.createDataFrame(SEEDS, "id int, type string")
    return e, s


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_matches_replica(spark, dfs, rounds):
    e, s = dfs
    got = {(r["id"], r["type"]): r["score_micro"]
           for r in spread_types(e, s, rounds=rounds).collect()}
    assert got == _replica(EDGES, SEEDS, rounds)


def test_assignment_and_clamping(spark, dfs):
    e, s = dfs
    rows = {r["id"]: (r["type"], r["score_micro"], r["is_seed"])
            for r in assign_types(e, s, rounds=3).collect()}
    # seeds clamped exactly
    assert rows[0] == ("A", MICRO, 1)
    assert rows[3] == ("B", MICRO, 1)
    assert rows[5] == ("A", MICRO, 1)
    # node 4 sits between two A-seeds' influence (1 and 5): pure A
    assert rows[4][0] == "A"
    # node 2 borders the B seed: mixed but present
    assert rows[2][2] == 0 and rows[2][1] > 0
    # the seedless component never acquires mass
    assert 8 not in rows and 9 not in rows


def test_duplicate_seed_raises(spark, dfs):
    e, _ = dfs
    bad = spark.createDataFrame([(0, "A"), (0, "B")], "id int, type string")
    with pytest.raises(Exception, match="seeded twice"):
        spread_types(e, bad, rounds=1).collect()
