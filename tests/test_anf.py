"""HyperBall ANF: exact register replica, estimate accuracy, diameter."""
from __future__ import annotations

import hashlib
import math

import pytest

from climatemind_ontology_processing_spark.operators.anf import (
    effective_diameter, exact_neighborhood_function, hyperball)

HASH_BITS = 60


def _h60(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def _reg_rho(x, p):
    h = _h60(x)
    rem_bits = HASH_BITS - p
    reg = h >> rem_bits
    rem = h & ((1 << rem_bits) - 1)
    rho = rem_bits + 1 - rem.bit_length() if rem else rem_bits + 1
    return reg, rho


def _balls(edges, rounds):
    adj = {}
    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        nodes.update((a, b))
    balls = {v: {v} for v in nodes}
    yield 0, {v: set(b) for v, b in balls.items()}
    for t in range(1, rounds + 1):
        balls = {v: b | set().union(*(balls[w] for w in adj.get(v, ())))
                 if adj.get(v) else set(b)
                 for v, b in ((v, balls[v]) for v in nodes)}
        yield t, {v: set(b) for v, b in balls.items()}


def _summary(ball, p):
    regs = {}
    for x in ball:
        r, rho = _reg_rho(x, p)
        regs[r] = max(regs.get(r, 0), rho)
    m = 2 ** p
    s = HASH_BITS - p + 1
    total = sum(2 ** (s - rho) for rho in regs.values()) \
        + (m - len(regs)) * 2 ** s
    return len(regs), total


# path + triangle + a sink, directed
EDGES = [(0, 1), (1, 2), (2, 3), (3, 1), (0, 4), (4, 5), (2, 6)]


@pytest.mark.parametrize("p", [4, 6])
def test_registers_equal_exact_ball_sketch(spark, p):
    """The HyperBall invariant: state at (v, t) IS the HLL sketch of the
    exact ball — integer summaries must match the replica bit-for-bit."""
    e = spark.createDataFrame(EDGES, "src int, dst int")
    got = {(r["id"], r["step"]): (r["n_registers"], r["harm_total"])
           for r in hyperball(e, rounds=4, p=p).collect()}
    exp = {}
    for t, balls in _balls(EDGES, 4):
        for v, ball in balls.items():
            exp[(v, t)] = _summary(ball, p)
    assert got == exp


def test_estimate_accuracy_seeded_graph(spark):
    """p=8 on a 150-node seeded graph: HLL std error is ~6.5%; pin the
    median relative error under 10% and the worst under 30%."""
    n = 150
    edges = [(i, (_h60(f"e|{i}|{j}") % n))
             for i in range(n) for j in range(3)]
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "src int, dst int")
    est = {(r["id"], r["step"]): r["est"]
           for r in hyperball(e, rounds=3, p=8).collect()}
    exact = {(r["id"], r["step"]): r["n_ball"]
             for r in exact_neighborhood_function(e, rounds=3).collect()}
    assert set(est) == set(exact)
    rel = sorted(abs(est[k] - exact[k]) / exact[k] for k in exact)
    assert rel[len(rel) // 2] < 0.10
    assert rel[-1] < 0.30


def test_effective_diameter_star(spark):
    center_out = [(0, i) for i in range(1, 20)]
    e = spark.createDataFrame(center_out, "src int, dst int")
    anf = hyperball(e, rounds=3, p=6)
    row = effective_diameter(anf, q=0.9).collect()[0]
    assert row["eff_diameter"] == 1      # center reaches everything in 1
    assert row["final_mass"] >= row["q_mass"]


def test_exact_nf_matches_python(spark):
    e = spark.createDataFrame(EDGES, "src int, dst int")
    got = {(r["id"], r["step"]): r["n_ball"]
           for r in exact_neighborhood_function(e, rounds=3).collect()}
    exp = {}
    for t, balls in _balls(EDGES, 3):
        for v, b in balls.items():
            exp[(v, t)] = len(b)
    assert got == exp
