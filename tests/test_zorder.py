"""Z-order keys: replica parity, locality property, guards."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from climatemind_ontology_processing_spark.functions.zorder import zorder_key


def _morton(vals, bits):
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_matches_replica_2d_and_3d(spark):
    rows = [(x, y, z) for x in (0, 1, 5, 255) for y in (0, 3, 128)
            for z in (0, 7)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got2 = [r.k for r in df.select(zorder_key(
        [F.col("x"), F.col("y")], bits=9).alias("k")).collect()]
    assert got2 == [_morton((x, y), 9) for x, y, z in rows]
    got3 = [r.k for r in df.select(zorder_key(
        [F.col("x"), F.col("y"), F.col("z")], bits=9).alias("k")).collect()]
    assert got3 == [_morton((x, y, z), 9) for x, y, z in rows]


def test_locality_prefix_property(spark):
    # identical high bits across all dims => identical zkey high bits:
    # points in the same 2^b-aligned box share the zkey prefix
    a = _morton((0b1100, 0b1010), 4)
    b = _morton((0b1101, 0b1011), 4)
    assert a >> 4 == b >> 4


def test_out_of_range_raises(spark):
    df = spark.createDataFrame([(1, -1)], "x long, y long")
    with pytest.raises(Exception, match="out of"):
        df.select(zorder_key([F.col("x"), F.col("y")], 8)).collect()
    df2 = spark.createDataFrame([(1, 256)], "x long, y long")
    with pytest.raises(Exception, match="out of"):
        df2.select(zorder_key([F.col("x"), F.col("y")], 8)).collect()


def test_param_guards(spark):
    with pytest.raises(ValueError):
        zorder_key([F.lit(1)], 8)
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2)], 32)
