"""Landmark distance index (operators/paths.py — Potamias et al. 2009)."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.paths import (
    landmark_distances, landmark_estimate, pick_landmarks, shortest_paths)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def test_pick_landmarks_degree_then_id(spark):
    # node 1 touches 4 others; node 2 touches 2; ties 3/4/5 break by id
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)])
    got = [r.id for r in pick_landmarks(e, 3).collect()]
    assert got[0] == 1
    assert set(got) == {1, 2, 3}  # deg: 1->4, 2->2, 3->2; tie 2<3 by id


def test_landmark_distances_match_per_seed_sssp(spark):
    # path graph 0-1-2-3-4 with a shortcut 0-3
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)])
    lms = pick_landmarks(e, 2)
    idx = landmark_distances(e, landmarks=lms)
    got = {(r.landmark, r.id): r.dist for r in idx.collect()}
    # every landmark's slice equals an independent single-seed SSSP over
    # the symmetrized graph
    sym = e.unionByName(e.selectExpr("dst as src", "src as dst"))
    for lm in [r.id for r in lms.collect()]:
        want = {r.id: r.dist for r in shortest_paths(sym, [lm]).collect()}
        assert {i: d for (l, i), d in got.items() if l == lm} == want


def test_estimate_upper_bound_and_landmark_exactness(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    # landmark = 3 (given explicitly): estimates are exact whenever one
    # endpoint IS the landmark, and an upper bound everywhere else
    lms = spark.createDataFrame([(3,)], "id int")
    idx = landmark_distances(e, landmarks=lms)
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (0, 5), (1, 2)], "a int, b int")
    est = {(r.a, r.b): r.est for r in landmark_estimate(idx, pairs).collect()}
    assert est[(0, 3)] == 3 and est[(3, 5)] == 2      # endpoint == landmark
    assert est[(0, 5)] == 5                            # path passes landmark
    assert est[(1, 2)] == 3                            # 1-3 + 3-2 > true 1
    sym = e.unionByName(e.selectExpr("dst as src", "src as dst"))
    true_12 = {r.id: r.dist for r in shortest_paths(sym, [1]).collect()}[2]
    assert est[(1, 2)] >= true_12


def test_estimate_null_for_unreachable_pair(spark):
    # two components; landmark lives in the first
    e = _edges(spark, [(0, 1), (5, 6)])
    idx = landmark_distances(
        e, landmarks=spark.createDataFrame([(0,)], "id int"))
    pairs = spark.createDataFrame([(1, 6)], "a int, b int")
    rows = landmark_estimate(idx, pairs).collect()
    assert len(rows) == 1 and rows[0].est is None


def test_landmark_distances_loud_on_round_cap(spark):
    e = _edges(spark, [(i, i + 1) for i in range(12)])
    with pytest.raises(RuntimeError, match="did not converge"):
        landmark_distances(
            e, landmarks=spark.createDataFrame([(0,)], "id int"),
            max_rounds=3)
