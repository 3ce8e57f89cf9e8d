"""Table profiling + k-anonymity census."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.profile import (
    k_anonymity_violations, profile_table)


def test_profile_table_one_row_per_column(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (2, None, None)],
        "x long, s string, z string")
    got = {r.column: (r.n_rows, r.n_nulls, r.n_distinct, r.min_str,
                      r.max_str)
           for r in profile_table(df).collect()}
    assert got["x"] == (3, 0, 2, "1", "2")
    assert got["s"] == (3, 1, 2, "a", "b")
    assert got["z"] == (3, 3, 0, None, None)


def test_profile_table_single_job(spark):
    """The whole profile is ONE aggregate — no per-column jobs."""
    from climatemind_ontology_processing_spark.operators.skew import (
        explain_shuffle_partitions)
    df = spark.createDataFrame([(1, "a")], "x long, s string")
    # countDistinct per column expands but stays one logical aggregate;
    # assert the plan has a bounded number of exchanges (expand-based)
    assert explain_shuffle_partitions(profile_table(df)) <= 3


def test_k_anonymity_violations(spark):
    rows = [("33", "m")] * 5 + [("33", "f")] * 2 + [("44", None)]
    df = spark.createDataFrame(rows, "age string, sex string")
    got = {(r.age, r.sex): r.group_size
           for r in k_anonymity_violations(df, ("age", "sex"),
                                           k=5).collect()}
    assert got == {("33", "f"): 2, ("44", None): 1}
    with pytest.raises(ValueError):
        k_anonymity_violations(df, (), k=5)
