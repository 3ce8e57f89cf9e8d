"""Explicit skew handling (north_rule: "partitioning / shuffle / skew handled
explicitly").

Common-Crawl-style corpora are head-domain skewed: a handful of domains
contribute a large fraction of pages (the synthetic pages table reproduces
this — ~20% of rows on one domain, sources/pages.py).  Aggregations and joins
keyed by domain (or by hot concept labels) would put one whole key's data in
one shuffle partition.  Two standard remedies, both as reusable operators:

* salted two-phase aggregation — groupBy (key, salt) partial-aggregate, then
  groupBy key final-merge.  The salt spreads each hot key over N partitions;
  the second phase aggregates only N rows per key.
* salted broadcast-replicated join — replicate the small side N ways (one per
  salt value) and salt the big side, so one hot key's probe rows land on N
  partitions instead of one.

AQE's skew-join splitting stays on as belt-and-braces
(spark.sql.adaptive.skewJoin.enabled, session.py), but explicit salting also
covers aggregations, which AQE's skew handling does not.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_SALT_BUCKETS


def domain_of(url: Column) -> Column:
    """Registrable host of a URL — the natural partition key for crawl data."""
    return F.parse_url(url, F.lit("HOST"))


def with_salt(df: DataFrame, key: str | Column, buckets: int = DEFAULT_SALT_BUCKETS,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a row-unique hash (never rand(): retry
    of a failed task must produce the same salt or shuffles go inconsistent).

    Uses xxhash64 over ALL columns so rows of the same hot key spread evenly.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
         .cast("int"))


def salted_count_by_key(df: DataFrame, key: str,
                        buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Skew-safe ``groupBy(key).count()``: (key, salt) partial counts, then a
    tiny final merge.  Returns (key, n)."""
    salted = with_salt(df, key, buckets)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def salted_agg(df: DataFrame, key: str, aggs: dict[str, tuple],
               buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Skew-safe two-phase aggregation for decomposable aggregates.

    ``aggs`` maps output column -> (input column, op) with op in
    {"sum", "count", "min", "max"}; each is algebraic (partial+merge).
    """
    salted = with_salt(df, key, buckets)
    partial_exprs = []
    merge_exprs = []
    for out, (col, op) in aggs.items():
        p = f"_p_{out}"
        if op == "count":
            partial_exprs.append(F.count(col).alias(p))
            merge_exprs.append(F.sum(p).alias(out))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            merge_exprs.append(F.sum(p).alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(p))
            merge_exprs.append(F.min(p).alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(p))
            merge_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable op {op!r}")
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*merge_exprs)


def salted_join_small(big: DataFrame, small: DataFrame, key: str,
                      buckets: int = DEFAULT_SALT_BUCKETS,
                      how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side once
    per salt value, join on (key, salt).  Output columns = big ∪ small minus
    the duplicate key.

    Use when the small side is too big to broadcast outright but small enough
    to replicate ``buckets`` times across the shuffle.

    Only inner/left are correct: the small side is cross-joined with every
    salt value before the join, so right/outer would emit each unmatched
    small-side row once PER SALT REPLICA (``buckets`` duplicates).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join_small supports how='inner'|'left', got {how!r}: "
            "replicated small-side rows would duplicate under outer semantics")
    big_s = with_salt(big, key, buckets)
    salts = big.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_r, [key, "_salt"], how).drop("_salt")


def explain_shuffle_partitions(df: DataFrame) -> int:
    """Introspection helper for tests: number of exchanges in the plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def skew_report(df: DataFrame, key: str,
                share_threshold_micro: int = 10_000,
                target_rows_per_task: int = 1_000_000) -> DataFrame:
    """Pre-shuffle skew diagnostic: one row per HOT key — keys carrying
    more than ``share_threshold_micro``/10^6 of all rows (default 1%) —
    with (key, n, share_micro, salt_factor), where ``salt_factor`` =
    ceil(n / target_rows_per_task) is the bucket count ``with_salt``
    would need so no single task holds more than the target.

    Run it BEFORE a big join/groupBy on a suspect key: an empty result
    means plain hash partitioning is fine; any row names the keys to
    salt and by how much.  One keys-only census + a broadcast 1-row
    total — the report itself never shuffles row data.  All integer
    micro arithmetic (engine-exact)."""
    if not (0 < share_threshold_micro <= 10 ** 6):
        raise ValueError("share_threshold_micro must be in (0, 10^6]")
    if target_rows_per_task <= 0:
        raise ValueError("target_rows_per_task must be positive")
    census = df.groupBy(F.col(key).alias("key")) \
        .agg(F.count("*").alias("n"))
    total = census.agg(F.sum("n").alias("_tot"))
    return (census.crossJoin(F.broadcast(total))
            .withColumn("share_micro",
                        F.expr("(n * 1000000) div _tot"))
            .filter(F.col("share_micro") >= share_threshold_micro)
            .withColumn("salt_factor",
                        F.expr(f"(n + {target_rows_per_task - 1}) div "
                               f"{target_rows_per_task}").cast("int"))
            .select("key", "n", "share_micro", "salt_factor"))
