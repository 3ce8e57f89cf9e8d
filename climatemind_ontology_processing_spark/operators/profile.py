"""Table profiling and privacy-risk census.

The two table-level reports a data platform runs before publishing a
dataset: per-column statistics (the ANALYZE TABLE shape — null rates,
distinct counts, extrema) and a k-anonymity census over quasi-identifier
columns (how many rows sit in groups small enough to re-identify).

Both are pure aggregates: the profile is ONE pass computing every
column's stats in a single agg (no per-column jobs), melted to one row
per column; the k-anonymity census is one groupBy over the QI tuple.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: tuple[str, ...] | None = None
                  ) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str) — one row
    per profiled column, all values stringified so heterogeneous column
    types melt into one frame.  Extrema are computed on the native type
    (numeric min is numeric) and stringified AFTER; NULL-only columns
    report NULL extrema.  ONE aggregate pass for every column together —
    profiling a 400-column table is one job, not 400."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nul_{c}"),
            F.countDistinct(c).alias(f"_dis_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(F.lit(c).alias("column"), F.col("_n").alias("n_rows"),
                 F.col(f"_nul_{c}").alias("n_nulls"),
                 F.col(f"_dis_{c}").alias("n_distinct"),
                 F.col(f"_min_{c}").alias("min_str"),
                 F.col(f"_max_{c}").alias("max_str"))
        for c in cols
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def k_anonymity_violations(df: DataFrame, qi_cols: tuple[str, ...],
                           k: int = 5) -> DataFrame:
    """(qi..., group_size) for every quasi-identifier combination whose
    group holds FEWER than ``k`` rows — the re-identification risk list
    a privacy review reads before release (rows in such groups are
    distinguishable by their QI tuple alone).  NULLs group together
    (SQL GROUP BY semantics — a shared null is still a linkable value).
    One keys-only aggregate."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2")
    return (df.groupBy(*qi_cols)
            .agg(F.count("*").alias("group_size"))
            .filter(F.col("group_size") < k))
