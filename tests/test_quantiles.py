"""Exact distributed quantiles."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.quantiles import (
    exact_quantiles)


def test_exact_quantiles_matches_sorted_selection(spark):
    vals = [((i * 7919) % 1000) for i in range(500)] + [None] * 10
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    clean = sorted(v for v in vals if v is not None)
    n = len(clean)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    got = {r.q_micro: (r.value, r.target_rank, r.n)
           for r in exact_quantiles(df, "x", qs).collect()}
    for q in qs:
        t = (round(q * 10 ** 6) * n + 10 ** 6 - 1) // 10 ** 6
        assert got[round(q * 10 ** 6)] == (clean[t - 1], t, n)


def test_exact_quantiles_duplicates_and_min_q(spark):
    df = spark.createDataFrame([(5,)] * 9 + [(7,)], "x long")
    got = {r.q_micro: r.value
           for r in exact_quantiles(df, "x", (0.1, 0.9, 0.95, 1.0)).collect()}
    assert got[100000] == 5 and got[900000] == 5
    assert got[950000] == 7 and got[1000000] == 7


def test_exact_quantiles_guards(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", ())
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", (0.0,))
