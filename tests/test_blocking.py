"""Sorted-neighborhood blocking: replica parity, bucket-boundary pairs,
rank correctness, guards."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from climatemind_ontology_processing_spark.operators.blocking import (
    snm_pairs, snm_ranks)

# keys chosen so first-char buckets split mid-neighborhood: boundary
# pairs (e.g. 'az..' x 'ba..') MUST still be produced
RECORDS = [
    (1, "alpha"), (2, "apple"), (3, "azure"),
    (4, "bane"), (5, "bare"), (6, "beta"),
    (7, "cane"), (8, "alpha"),          # duplicate key: id tie-break
]


def _replica(records, window):
    order = sorted(records, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (aid, _) in enumerate(order):
        for j in range(i + 1, min(i + window, len(order))):
            out.add((aid, order[j][0], j - i))
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(RECORDS, "id int, key string")


@pytest.mark.parametrize("window", [2, 3, 5, 8])
def test_matches_replica(spark, df, window):
    got = {(r.a_id, r.b_id, r.rank_gap)
           for r in snm_pairs(df, "key", "id", window=window).collect()}
    assert got == _replica(RECORDS, window)


def test_cross_bucket_boundary_pairs_present(spark, df):
    got = {(r.a_id, r.b_id)
           for r in snm_pairs(df, "key", "id", window=3).collect()}
    # 'azure'(3) and 'bane'(4) are adjacent in global order but live in
    # different first-char buckets
    assert (3, 4) in got


def test_ranks_are_global_and_tie_broken(spark, df):
    ranks = {r.id: r.rank
             for r in snm_ranks(df, "key", "id",
                                F.substring("key", 1, 1)).collect()}
    order = sorted(RECORDS, key=lambda r: (r[1], r[0]))
    assert ranks == {rid: i for i, (rid, _) in enumerate(order)}
    # duplicate key 'alpha': id 1 before id 8
    assert ranks[1] < ranks[8]


def test_window_guard(spark, df):
    with pytest.raises(ValueError):
        snm_pairs(df, "key", "id", window=1)
